"""remat (jax.checkpoint) train-step option: same losses, runs green."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from viai_tpu.testing import TINY_CFG, tiny_models, tone_batch
from viai_tpu.train import adam, init_state, make_train_step


def test_remat_matches_plain():
    wav = jnp.asarray(tone_batch(4))
    results = {}
    for remat in (False, True):
        cfg = dataclasses.replace(TINY_CFG, remat=remat)
        G, D, V = tiny_models(seed=0)
        g_tx, d_tx = adam(2e-4), adam(2e-4)
        (g_def, d_def, v_def), state = init_state(G, D, V, g_tx, d_tx)
        step = make_train_step(g_def, d_def, v_def, g_tx, d_tx, cfg)
        state, metrics = step(state, wav, None, jax.random.key(0))
        results[remat] = (
            {k: float(v) for k, v in metrics.items()},
            jax.tree.leaves(state["g"])[0],
        )
    m0, g0 = results[False]
    m1, g1 = results[True]
    for k in m0:
        np.testing.assert_allclose(m0[k], m1[k], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g0), np.asarray(g1), rtol=1e-4, atol=1e-6
    )
