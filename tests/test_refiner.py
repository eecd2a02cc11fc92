"""Diffusion refiner (nn/refiner.py + train/diffusion.py).

The stage-2 generative objective for hole magnitudes — the round-3
answer to the measured notes-corpus limiter (objective family). These
tests pin the schedule algebra, the zero-init contract (the refiner is
an exact no-op on the image at init), the train step, the DDIM
refinement semantics, and the CLI integration.
"""

import numpy as np
import pytest
from flax import nnx

import jax
import jax.numpy as jnp

from viai_tpu.nn import define_R
from viai_tpu.testing import TINY_CFG, tiny_models, tone_batch
from viai_tpu.train.diffusion import (
    ab_coeffs,
    alpha_bar,
    ddim_refine,
    make_refiner_train_step,
    q_sample,
    refiner_cond,
    x0_eps_from_v,
)
from viai_tpu.train.step import _g_input, preprocess


def test_schedule_endpoints_and_monotonicity():
    t = jnp.linspace(0.0, 1.0, 101)
    ab = alpha_bar(t)
    assert float(ab[0]) == pytest.approx(1.0, abs=1e-6)
    assert float(ab[-1]) == pytest.approx(0.0, abs=1e-3)
    assert bool(jnp.all(jnp.diff(ab) < 0.0))  # strictly decreasing


def test_v_parameterization_roundtrip():
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x0 = jax.random.normal(k1, (4, 8, 8, 1))
    eps = jax.random.normal(k2, (4, 8, 8, 1))
    t = jax.random.uniform(k3, (4,), minval=0.05, maxval=0.95)
    x_t, v = q_sample(x0, t, eps)
    x0_hat, eps_hat = x0_eps_from_v(x_t, v, t)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(eps_hat), np.asarray(eps),
                               atol=1e-5)


def _tiny_refiner(seed=0):
    # 64x64 tiny images; default 4 stride-2 levels → 4x4 bottleneck.
    return define_R(4, ngf=8, seed=seed)


def test_refiner_zero_init_contract():
    """Zero-init head → v̂ ≡ 0; zero-init FiLM → t-independent at init."""
    R = _tiny_refiner()
    x = jax.random.normal(jax.random.key(1), (2, 64, 64, 4))
    out_a = R(x, jnp.full((2,), 0.1))
    out_b = R(x, jnp.full((2,), 0.9))
    assert out_a.shape == (2, 64, 64, 1)
    np.testing.assert_array_equal(np.asarray(out_a), 0.0)
    np.testing.assert_array_equal(np.asarray(out_b), 0.0)


def _tiny_setup(batch=4):
    G, D, V = tiny_models()
    g_def, g_state = nnx.split(G)
    wav = jnp.asarray(tone_batch(batch))
    batch_d = preprocess(wav, jax.random.key(3), TINY_CFG)
    fake = nnx.merge(g_def, g_state)(_g_input(batch_d), None)
    return g_def, g_state, wav, batch_d, fake


def test_refiner_train_step_learns():
    import optax

    g_def, g_state, wav, _, _ = _tiny_setup()
    R = _tiny_refiner()
    r_def, r_state = nnx.split(R)
    r_ema = jax.tree.map(jnp.copy, r_state)  # fresh buffers: r_state is donated
    r_tx = optax.adam(1e-3)
    r_opt = r_tx.init(r_state)
    step = make_refiner_train_step(g_def, None, r_def, r_tx, TINY_CFG)
    key = jax.random.key(7)
    losses = []
    for i in range(50):
        key, sub = jax.random.split(key)
        r_state, r_opt, r_ema, m = step(
            r_state, r_opt, r_ema, g_state, None, wav, sub
        )
        losses.append(float(m["loss_R"]))
    assert np.isfinite(losses).all()
    # v-MSE should drop early and stay below the zero-prediction level.
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    # EMA lags the live params but has moved off init.
    diffs = jax.tree.leaves(jax.tree.map(
        lambda e, p: float(jnp.max(jnp.abs(e - p))), r_ema, r_state))
    assert max(diffs) > 0.0


def test_ddim_refine_near_identity_at_small_t():
    """Zero-init R (v̂=0) + tiny t_start → output ≈ G's image in the
    hole, exactly the observed image outside (clamped every step)."""
    g_def, g_state, wav, batch_d, fake = _tiny_setup()
    R = _tiny_refiner()
    r_def, r_state = nnx.split(R)
    g_img = fake[..., :1]
    out = ddim_refine(r_def, r_state, g_img, batch_d, jax.random.key(5),
                      steps=4, t_start=1e-3)
    m = np.asarray(batch_d["mask_img"])
    obs = np.asarray(batch_d["masked_img"])
    out = np.asarray(out)
    np.testing.assert_allclose(out * m, obs * m, atol=1e-5)
    hole = (1.0 - m)
    np.testing.assert_allclose(out * hole, np.asarray(g_img) * hole,
                               atol=0.15)


def test_ddim_refine_full_generation_shape_and_clamp():
    """t_start=1 (pure generation): finite output, observed clamp holds."""
    g_def, g_state, wav, batch_d, fake = _tiny_setup()
    R = _tiny_refiner()
    r_def, r_state = nnx.split(R)
    out = ddim_refine(r_def, r_state, fake[..., :1], batch_d,
                      jax.random.key(6), steps=4, t_start=1.0)
    assert np.isfinite(np.asarray(out)).all()
    m = np.asarray(batch_d["mask_img"])
    np.testing.assert_allclose(np.asarray(out) * m,
                               np.asarray(batch_d["masked_img"]) * m,
                               atol=1e-5)


def test_ddim_refine_noise_scale_zero_is_deterministic():
    """noise_scale=0: the key is irrelevant — a pure learned corrector."""
    g_def, g_state, wav, batch_d, fake = _tiny_setup()
    R = _tiny_refiner()
    r_def, r_state = nnx.split(R)
    g_img = fake[..., :1]
    out_a = ddim_refine(r_def, r_state, g_img, batch_d, jax.random.key(1),
                        steps=3, t_start=0.4, noise_scale=0.0)
    out_b = ddim_refine(r_def, r_state, g_img, batch_d, jax.random.key(2),
                        steps=3, t_start=0.4, noise_scale=0.0)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_infer_fn_with_refiner_runs():
    from viai_tpu.train.step import make_infer_fn

    g_def, g_state, wav, _, _ = _tiny_setup()
    R = _tiny_refiner()
    r_def, r_state = nnx.split(R)
    infer = make_infer_fn(g_def, None, TINY_CFG, n_gl_iter=2,
                          refiner=(r_def, r_state), refine_steps=2,
                          refine_t=0.3)
    out = infer(g_state, None, wav, jax.random.key(9), None)
    assert out.shape == wav.shape
    assert np.isfinite(np.asarray(out)).all()


def test_refiner_cli_roundtrip(tmp_path):
    """train.py tiny → save an R checkpoint → test.py --refiner."""
    import os

    from viai_tpu.cli.test import main as infer_main
    from viai_tpu.cli.train import main as train_main
    from viai_tpu.io import save_networks

    TINY = [
        "--dataset_mode", "synthetic", "--model", "audio",
        "--batchSize", "2", "--nThreads", "0",
        "--clip_seconds", "0.252", "--n_fft", "126",
        "--hop_length", "64", "--image_frames", "64",
        "--ngf", "8", "--ndf", "8",
        "--min_gap_frames", "8", "--max_gap_frames", "16",
        "--gl_iters", "2", "--n_data_devices", "2",
    ]
    ckpt = str(tmp_path / "ckpts")
    train_main(TINY + [
        "--name", "ref", "--checkpoints_dir", ckpt,
        "--niter", "1", "--niter_decay", "0", "--steps_per_epoch", "2",
        "--save_epoch_freq", "1", "--lr_policy", "constant",
        "--print_freq", "1",
    ])
    # Init-weight R checkpoint (zero-init head → near-identity refine).
    R = define_R(4, ngf=8, seed=3)
    _, r_state = nnx.split(R)
    expr = os.path.join(ckpt, "ref")
    save_networks({"R": r_state}, "latest", expr, also_latest=False)

    summary = infer_main(TINY + [
        "--name", "ref", "--checkpoints_dir", ckpt,
        "--results_dir", str(tmp_path / "res"),
        "--which_epoch", "latest", "--how_many", "2",
        "--refiner", "--rngf", "8", "--refine_steps", "2",
        "--refine_t", "0.2",
    ])
    assert summary["n"] == 2
    assert np.isfinite(summary["psnr_mean"])
