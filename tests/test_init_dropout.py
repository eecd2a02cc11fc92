"""--init_type + U-Net decoder dropout (VERDICT.md round-1 item #3,
ADVICE.md medium #2): the two pix2pix training-dynamics knobs.

Pins: the init distributions actually land on the weights, the flag
changes behavior, dropout is stochastic in training and OFF at
inference, and a dropout train step still optimizes.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from viai_tpu.nn import define_D, define_G
from viai_tpu.nn.generator import GeneratorConfig, UNetGenerator
from viai_tpu.nn.initializers import kernel_init_for
from flax import nnx

from viai_tpu.testing import TINY_CFG, tone_batch
from viai_tpu.train import adam, init_state, make_train_step


def _g_kernel(G):
    return np.asarray(G.downs[1].conv.kernel[...])


def test_normal_init_is_the_default_and_hits_002_std():
    G = define_G()
    k = _g_kernel(G)   # (4, 4, 64, 128): plenty of samples
    assert abs(float(k.mean())) < 2e-3
    assert 0.018 < float(k.std()) < 0.022, k.std()
    D = define_D()
    kd = np.asarray(D.convs[1].kernel[...])
    assert 0.018 < float(kd.std()) < 0.022, kd.std()


def test_init_types_change_the_distribution():
    stds = {}
    for it in ("normal", "kaiming", "lecun", "xavier"):
        G = define_G(init_type=it)
        stds[it] = float(_g_kernel(G).std())
    fan_in = 4 * 4 * 64
    # kaiming: sqrt(2/fan_in); lecun: sqrt(1/fan_in).
    assert abs(stds["kaiming"] - np.sqrt(2 / fan_in)) < 0.1 * stds["kaiming"]
    assert abs(stds["lecun"] - np.sqrt(1 / fan_in)) < 0.15 * stds["lecun"]
    # xavier with gain 0.02 is tiny: 0.02·sqrt(2/(fan_in+fan_out)).
    assert stds["xavier"] < 0.002
    assert stds["kaiming"] > 2 * stds["normal"]


def test_orthogonal_init_rows_are_orthogonal():
    init = kernel_init_for("orthogonal", gain=1.0)
    k = np.asarray(init(jax.random.key(0), (4, 4, 8, 64), jnp.float32))
    m = k.reshape(-1, 64)    # (128, 64): columns orthonormal
    gram = m.T @ m
    np.testing.assert_allclose(gram, np.eye(64), atol=1e-4)


def _tiny_g(dropout):
    cfg = GeneratorConfig(ngf=8, strides=((2, 2), (2, 2), (2, 1)),
                          mults=(1, 2, 4), dropout=dropout)
    return UNetGenerator(cfg, nnx.Rngs(0))


def test_dropout_stochastic_in_train_deterministic_in_eval():
    G = _tiny_g(0.5)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 64, 64, 2)).astype(np.float32))
    y1 = G(x, dropout_key=jax.random.key(1))
    y2 = G(x, dropout_key=jax.random.key(2))
    assert not np.allclose(np.asarray(y1), np.asarray(y2)), \
        "different dropout keys must give different outputs"
    # No key → deterministic (inference path), and equal to rate=0.
    e1, e2 = G(x), G(x)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    G0 = _tiny_g(0.0)
    y0 = G0(x, dropout_key=jax.random.key(1))
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(G0(x)))
    # Same seed → same weights, so rate-0 and no-key outputs agree.
    np.testing.assert_allclose(np.asarray(e1), np.asarray(y0), atol=1e-6)


def test_train_step_with_dropout_optimizes():
    from viai_tpu.nn import DiscriminatorConfig, PatchDiscriminator

    G = _tiny_g(0.5)
    D = PatchDiscriminator(
        DiscriminatorConfig(in_channels=3, ndf=8, n_layers=2), nnx.Rngs(1)
    )
    g_tx, d_tx = adam(2e-4), adam(2e-4)
    (g_def, d_def, v_def), state = init_state(G, D, None, g_tx, d_tx)
    step = make_train_step(g_def, d_def, v_def, g_tx, d_tx, TINY_CFG)
    wav = jnp.asarray(tone_batch(2))
    key = jax.random.key(0)
    first = None
    for _ in range(6):
        key, sub = jax.random.split(key)
        state, metrics = step(state, wav, None, sub)
        assert np.isfinite(float(metrics["loss_G"]))
        if first is None:
            first = float(metrics["loss_G_L1"])
    assert float(metrics["loss_G_L1"]) < first


def test_cli_flags_reach_the_networks(tmp_path):
    from viai_tpu.config.options import TrainOptions
    from viai_tpu.model import create_model

    base = ["--checkpoints_dir", str(tmp_path), "--dataset_mode",
            "synthetic", "--ngf", "8", "--ndf", "8"]
    opt = TrainOptions().parse(base + ["--name", "a"], save=False)
    m = create_model(opt)
    g_def, g_state = m.g_def, m.state["g"]
    G = nnx.merge(g_def, g_state)
    assert G.cfg.dropout == 0.5
    assert G.cfg.init_type == "normal"
    k = np.asarray(G.downs[1].conv.kernel[...])
    assert 0.015 < float(k.std()) < 0.025

    opt2 = TrainOptions().parse(
        base + ["--name", "b", "--no_dropout", "--init_type", "kaiming"],
        save=False,
    )
    m2 = create_model(opt2)
    G2 = nnx.merge(m2.g_def, m2.state["g"])
    assert G2.cfg.dropout == 0.0
    k2 = np.asarray(G2.downs[1].conv.kernel[...])
    assert float(k2.std()) > 2 * float(k.std())
