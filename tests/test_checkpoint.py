"""Checkpoint contract tests (SURVEY.md §3.4: naming + roundtrip).

Verifies the reference naming scheme `{epoch}_net_{name}.pth` +
`latest` alias, that the files are REAL torch state dicts, and that
the orbax full-state tier roundtrips (continue_train path).
"""

import os

import jax
import numpy as np
import torch

from tests.test_train_step import TINY_CFG, _tiny_models, _wav
from viai_tpu.io import (
    available_epochs,
    load_networks,
    load_train_state,
    save_networks,
    save_train_state,
)
from viai_tpu.train import adam, init_state, make_train_step

import jax.numpy as jnp


def _state(seed=0):
    G, D, V = _tiny_models(seed=seed)
    g_tx, d_tx = adam(2e-4), adam(2e-4)
    defs, state = init_state(G, D, V, g_tx, d_tx)
    return defs, state, (g_tx, d_tx)


def test_save_load_networks_roundtrip(tmp_path):
    _, state, _ = _state(seed=0)
    expr = str(tmp_path / "exp")
    save_networks({"G": state["g"], "D": state["d"]}, 7, expr)
    # Reference naming contract.
    assert os.path.exists(f"{expr}/7_net_G.pth")
    assert os.path.exists(f"{expr}/7_net_D.pth")
    assert os.path.exists(f"{expr}/latest_net_G.pth")
    assert available_epochs(expr) == ["7", "latest"]
    # Files are genuine torch state dicts.
    sd = torch.load(f"{expr}/7_net_G.pth", weights_only=True)
    assert all(isinstance(v, torch.Tensor) for v in sd.values())
    # Roundtrip into a differently-initialized model.
    _, other, _ = _state(seed=99)
    loaded = load_networks({"G": other["g"], "D": other["d"]}, 7, expr)
    for a, b in zip(jax.tree.leaves(loaded["G"]), jax.tree.leaves(state["g"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_state_resume(tmp_path):
    (g_def, d_def, v_def), state, (g_tx, d_tx) = _state()
    step = make_train_step(g_def, d_def, v_def, g_tx, d_tx, TINY_CFG)
    wav = jnp.asarray(_wav(2))
    state, _ = step(state, wav, None, jax.random.key(0))
    expr = str(tmp_path / "exp")
    save_train_state(state, 1, expr)
    # Fresh template (as a new process would build it), then restore.
    _, template, _ = _state(seed=123)
    restored = load_train_state(template, 1, expr)
    assert int(restored["step"]) == 1
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Resumed training continues without error and matches the
    # continued original exactly (deterministic step).
    s_cont, m1 = step(state, wav, None, jax.random.key(1))
    s_res, m2 = step(restored, wav, None, jax.random.key(1))
    np.testing.assert_allclose(
        float(m1["loss_G"]), float(m2["loss_G"]), rtol=1e-6
    )
    del s_cont, s_res


def test_load_missing_checkpoint_raises(tmp_path):
    _, state, _ = _state()
    import pytest

    with pytest.raises(FileNotFoundError):
        load_networks({"G": state["g"]}, "nope", str(tmp_path / "void"))
