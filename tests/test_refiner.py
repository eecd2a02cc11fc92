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


def test_infer_fn_refine_avg_posterior_mean():
    """refine_avg semantics: K=2 with noise_scale=0 is EXACTLY the
    single-sample chain (all samples identical → mean is the sample);
    K=2 with noise runs finite, same shape, and differs from K=1
    (distinct noise folds actually contribute)."""
    from viai_tpu.train.step import make_infer_fn

    g_def, g_state, wav, _, _ = _tiny_setup()
    R = _tiny_refiner()
    r_def, r_state = nnx.split(R)
    kw = dict(n_gl_iter=2, refiner=(r_def, r_state), refine_steps=2,
              refine_t=0.3)
    det1 = make_infer_fn(g_def, None, TINY_CFG, refine_noise=0.0, **kw)
    det2 = make_infer_fn(g_def, None, TINY_CFG, refine_noise=0.0,
                         refine_avg=2, **kw)
    k = jax.random.key(9)
    np.testing.assert_allclose(np.asarray(det1(g_state, None, wav, k, None)),
                               np.asarray(det2(g_state, None, wav, k, None)),
                               atol=1e-6)
    s1 = make_infer_fn(g_def, None, TINY_CFG, **kw)
    s2 = make_infer_fn(g_def, None, TINY_CFG, refine_avg=2, **kw)
    o1 = np.asarray(s1(g_state, None, wav, k, None))
    o2 = np.asarray(s2(g_state, None, wav, k, None))
    assert o2.shape == wav.shape and np.isfinite(o2).all()
    assert np.abs(o1 - o2).max() > 0


def test_infer_fn_refine_mix_endpoints():
    """refine_mix semantics: mix=1.0 collapses to the pure-regression
    chain (bitwise equal to no-refiner — the G hole passes through
    verbatim and GL is deterministic given the same magnitudes);
    mix=0.5 differs from both endpoints."""
    from viai_tpu.train.step import make_infer_fn

    g_def, g_state, wav, _, _ = _tiny_setup()
    R = _tiny_refiner()
    r_def, r_state = nnx.split(R)
    kw = dict(n_gl_iter=2, refiner=(r_def, r_state), refine_steps=2,
              refine_t=0.3)
    k = jax.random.key(11)
    plain = make_infer_fn(g_def, None, TINY_CFG, n_gl_iter=2)
    mix1 = make_infer_fn(g_def, None, TINY_CFG, refine_mix=1.0, **kw)
    np.testing.assert_array_equal(
        np.asarray(plain(g_state, None, wav, k, None)),
        np.asarray(mix1(g_state, None, wav, k, None)))
    mix0 = make_infer_fn(g_def, None, TINY_CFG, **kw)
    half = make_infer_fn(g_def, None, TINY_CFG, refine_mix=0.5, **kw)
    o0 = np.asarray(mix0(g_state, None, wav, k, None))
    oh = np.asarray(half(g_state, None, wav, k, None))
    o1 = np.asarray(mix1(g_state, None, wav, k, None))
    assert np.isfinite(oh).all()
    assert np.abs(oh - o0).max() > 0 and np.abs(oh - o1).max() > 0


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

    # Best-of-K posterior sampling (+ resample). Round-5 (ADVICE r4
    # #1): the oracle best-of-K pick lives in *_bok_* fields and must
    # dominate the headline (first-sample, non-oracle) value by
    # construction; the headline fields stay non-oracle, and every
    # metric carries a SEM error bar (VERDICT r4 weak #4).
    summary_k = infer_main(TINY + [
        "--name", "ref", "--checkpoints_dir", ckpt,
        "--results_dir", str(tmp_path / "res2"),
        "--which_epoch", "latest", "--how_many", "2",
        "--refiner", "--rngf", "8", "--refine_steps", "2",
        "--refine_t", "0.2", "--eval_samples", "2",
        "--refine_resample", "1",
    ])
    assert summary_k["n"] == 2
    assert summary_k["eval_samples"] == 2
    assert (summary_k["hole_psnr_bok_mean"]
            >= summary_k["hole_psnr_mean"] - 1e-6)
    assert summary_k["hole_psnr_s1_mean"] == summary_k["hole_psnr_mean"]
    for f in ("psnr_sem", "hole_psnr_sem", "snr_sem", "spec_conv_sem",
              "hole_psnr_bok_sem"):
        assert np.isfinite(summary_k[f])


# ---------------------------------------------------------------------------
# Round 4 (VERDICT r3 next-round #1/#7): hole-only loss, CFG, clamp
# modes, and the audio-visual stage-2 arm.
# ---------------------------------------------------------------------------

def test_refiner_train_step_hole_only_and_cond_drop():
    """observed_weight=0 + cond_drop>0: step runs, loss finite and
    decreasing; gradients exist (params move off init)."""
    import optax

    g_def, g_state, wav, _, _ = _tiny_setup()
    R = _tiny_refiner()
    r_def, r_state = nnx.split(R)
    init_leaves = jax.tree.map(jnp.copy, r_state)
    r_ema = jax.tree.map(jnp.copy, r_state)
    r_tx = optax.adam(1e-3)
    r_opt = r_tx.init(r_state)
    step = make_refiner_train_step(
        g_def, None, r_def, r_tx, TINY_CFG,
        observed_weight=0.0, cond_drop=0.15,
    )
    key = jax.random.key(11)
    losses = []
    for _ in range(30):
        key, sub = jax.random.split(key)
        r_state, r_opt, r_ema, m = step(
            r_state, r_opt, r_ema, g_state, None, wav, sub
        )
        losses.append(float(m["loss_R"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    moved = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), init_leaves, r_state))
    assert max(moved) > 0.0


def test_ddim_refine_guidance_zero_init_matches_unguided():
    """With the zero-init R, v̂_cond = v̂_uncond = 0, so CFG at any scale
    must reproduce the unguided trajectory exactly."""
    g_def, g_state, wav, batch_d, fake = _tiny_setup()
    R = _tiny_refiner()
    r_def, r_state = nnx.split(R)
    g_img = fake[..., :1]
    base = ddim_refine(r_def, r_state, g_img, batch_d, jax.random.key(4),
                       steps=3, t_start=0.4)
    guided = ddim_refine(r_def, r_state, g_img, batch_d, jax.random.key(4),
                         steps=3, t_start=0.4, guidance=2.0)
    np.testing.assert_allclose(np.asarray(guided), np.asarray(base),
                               atol=1e-6)


def test_ddim_refine_clamp_q_semantics():
    """'q' clamp: final output observed region is exactly the known
    image; deterministic at noise_scale=0; finite at full generation."""
    g_def, g_state, wav, batch_d, fake = _tiny_setup()
    R = _tiny_refiner()
    r_def, r_state = nnx.split(R)
    g_img = fake[..., :1]
    out = ddim_refine(r_def, r_state, g_img, batch_d, jax.random.key(8),
                      steps=4, t_start=1.0, clamp_mode="q")
    m = np.asarray(batch_d["mask_img"])
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out) * m,
                               np.asarray(batch_d["masked_img"]) * m,
                               atol=1e-5)
    a = ddim_refine(r_def, r_state, g_img, batch_d, jax.random.key(1),
                    steps=3, t_start=0.4, clamp_mode="q", noise_scale=0.0)
    b = ddim_refine(r_def, r_state, g_img, batch_d, jax.random.key(2),
                    steps=3, t_start=0.4, clamp_mode="q", noise_scale=0.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ddim_refine_resample_semantics():
    """RePaint time-travel (resample > 0): observed region exact in
    both clamp modes, finite, deterministic at noise_scale=0, and
    near-identity for the zero-init R at small t_start (each travel
    round contracts x by √(ᾱt/ᾱu) then re-noises — at v̂≡0 and tiny t
    the composite stays within the same tolerance as plain DDIM)."""
    g_def, g_state, wav, batch_d, fake = _tiny_setup()
    R = _tiny_refiner()
    r_def, r_state = nnx.split(R)
    g_img = fake[..., :1]
    m = np.asarray(batch_d["mask_img"])
    obs = np.asarray(batch_d["masked_img"])
    for clamp in ("x0", "q"):
        out = ddim_refine(r_def, r_state, g_img, batch_d,
                          jax.random.key(11), steps=4, t_start=1.0,
                          clamp_mode=clamp, resample=2)
        assert np.isfinite(np.asarray(out)).all()
        np.testing.assert_allclose(np.asarray(out) * m, obs * m,
                                   atol=1e-5)
    # Determinism: with noise_scale=0 the travel ε is zeroed too.
    a = ddim_refine(r_def, r_state, g_img, batch_d, jax.random.key(1),
                    steps=3, t_start=0.4, noise_scale=0.0, resample=2)
    b = ddim_refine(r_def, r_state, g_img, batch_d, jax.random.key(2),
                    steps=3, t_start=0.4, noise_scale=0.0, resample=2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Near-identity at tiny t_start (same contract as plain DDIM).
    out = ddim_refine(r_def, r_state, g_img, batch_d, jax.random.key(5),
                      steps=4, t_start=1e-3, resample=1)
    np.testing.assert_allclose(np.asarray(out) * (1.0 - m),
                               np.asarray(g_img) * (1.0 - m), atol=0.15)


def test_infer_fn_with_refiner_resample_runs():
    from viai_tpu.train.step import make_infer_fn

    g_def, g_state, wav, _, _ = _tiny_setup()
    R = _tiny_refiner()
    r_def, r_state = nnx.split(R)
    infer = make_infer_fn(g_def, None, TINY_CFG, n_gl_iter=2,
                          refiner=(r_def, r_state), refine_steps=2,
                          refine_t=0.3, refine_clamp="q",
                          refine_resample=2)
    out = infer(g_state, None, wav, jax.random.key(9), None)
    assert out.shape == wav.shape
    assert np.isfinite(np.asarray(out)).all()


def test_refiner_train_step_av():
    """VERDICT r3 #7: the stage-2 refiner trains against a frozen
    AUDIO-VISUAL (G, V) pair — V's features feed G inside the step."""
    import optax

    from viai_tpu.testing import tiny_models
    from viai_tpu.train.step import TrainConfig

    G, D, V = tiny_models(use_video=True)
    cfg = TrainConfig(**{**TINY_CFG.__dict__, "use_video": True})
    g_def, g_state = nnx.split(G)
    v_def, v_state = nnx.split(V)
    wav = jnp.asarray(tone_batch(2))
    frames = jax.random.normal(jax.random.key(7), (2, 8, 16, 16, 3))
    R = _tiny_refiner()
    r_def, r_state = nnx.split(R)
    r_ema = jax.tree.map(jnp.copy, r_state)
    r_tx = optax.adam(1e-3)
    r_opt = r_tx.init(r_state)
    step = make_refiner_train_step(g_def, v_def, r_def, r_tx, cfg)
    key = jax.random.key(13)
    losses = []
    for _ in range(10):
        key, sub = jax.random.split(key)
        r_state, r_opt, r_ema, m = step(
            r_state, r_opt, r_ema, g_state, v_state, wav, sub, frames
        )
        losses.append(float(m["loss_R"]))
    assert np.isfinite(losses).all()


# ---------------------------------------------------------------------------
# Round 4 (VERDICT r3 next-round #6): complex-domain refiner — the
# long-gap phase attack (hole (re, im) via DDIM, GL-free iSTFT decode).
# ---------------------------------------------------------------------------

def test_complex_compress_roundtrip():
    from viai_tpu.signal.mel import complex_compress, complex_decompress

    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    re = jax.random.normal(k1, (2, 16, 16)) * 50.0
    im = jax.random.normal(k2, (2, 16, 16)) * 50.0
    cre, cim = complex_compress(re, im)
    assert float(jnp.max(jnp.sqrt(cre**2 + cim**2))) <= 1.0 + 1e-6
    re2, im2 = complex_decompress(cre, cim)
    np.testing.assert_allclose(np.asarray(re2), np.asarray(re),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(im2), np.asarray(im),
                               rtol=1e-4, atol=1e-3)


def test_complex_image_istft_roundtrip():
    """complex_image → decompress → iSTFT reconstructs the waveform
    (STFT consistency; interior samples, librosa-style edge effects)."""
    from viai_tpu.signal.mel import complex_decompress
    from viai_tpu.signal.stft import istft
    from viai_tpu.train.diffusion import complex_image

    wav = jnp.asarray(tone_batch(2))
    img = complex_image(wav, TINY_CFG)
    assert img.shape == (2, 64, 64, 2)
    n_fr = TINY_CFG.stft.num_frames(wav.shape[-1])
    re, im = complex_decompress(img[..., 0], img[..., 1],
                                TINY_CFG.compress_ceiling)
    re = jnp.swapaxes(re[..., :n_fr], -1, -2)
    im = jnp.swapaxes(im[..., :n_fr], -1, -2)
    out = istft(re, im, TINY_CFG.stft, length=wav.shape[-1])
    a, b = np.asarray(out)[:, 200:-200], np.asarray(wav)[:, 200:-200]
    rel = np.abs(a - b).max() / np.abs(b).max()
    assert rel < 5e-3, rel


def test_complex_refiner_train_step_learns():
    import optax

    from viai_tpu.train.diffusion import (complex_refiner_channels,
                                          make_complex_refiner_train_step)

    g_def, g_state, wav, _, _ = _tiny_setup()
    r_in, r_out = complex_refiner_channels(2)
    R = define_R(r_in, ngf=8, out_channels=r_out)
    r_def, r_state = nnx.split(R)
    r_ema = jax.tree.map(jnp.copy, r_state)
    r_tx = optax.adam(1e-3)
    r_opt = r_tx.init(r_state)
    step = make_complex_refiner_train_step(
        g_def, None, r_def, r_tx, TINY_CFG, observed_weight=0.0)
    key = jax.random.key(17)
    losses = []
    for _ in range(40):
        key, sub = jax.random.split(key)
        r_state, r_opt, r_ema, m = step(
            r_state, r_opt, r_ema, g_state, None, wav, sub
        )
        losses.append(float(m["loss_R"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_complex_infer_fn_observed_region_exact():
    """GL-free chain with the zero-init R: the OBSERVED region decodes
    from its exact complex STFT — interior observed samples must match
    the input waveform to high accuracy (the property GL can only
    approximate), regardless of what the hole contains."""
    from viai_tpu.train.diffusion import (complex_refiner_channels,
                                          make_complex_refiner_infer_fn)
    from viai_tpu.train.step import preprocess

    g_def, g_state, wav, _, _ = _tiny_setup(batch=2)
    wav = wav[:2]
    r_in, r_out = complex_refiner_channels(2)
    R = define_R(r_in, ngf=8, out_channels=r_out)
    r_def, r_state = nnx.split(R)
    infer = make_complex_refiner_infer_fn(
        g_def, None, r_def, r_state, TINY_CFG, steps=3, t_start=1.0)
    key = jax.random.key(21)
    out = infer(g_state, None, wav, key, None)
    assert out.shape == wav.shape
    assert np.isfinite(np.asarray(out)).all()
    # Recover the exact mask the infer used (preprocess folds the key).
    pre = preprocess(wav, key, TINY_CFG)
    tmask = np.asarray(pre["mask_img"][:, 0, :, 0])  # (B, T_img)
    hop, nfft = TINY_CFG.stft.hop_length, TINY_CFG.stft.n_fft
    out_np, wav_np = np.asarray(out), np.asarray(wav)
    for b in range(2):
        holes = np.where(tmask[b] == 0.0)[0]
        lo = max(int(holes.min() * hop - nfft), 300)
        hi = min(int((holes.max() + 1) * hop + nfft), wav.shape[-1] - 300)
        obs = np.r_[300:lo, hi:wav.shape[-1] - 300]
        err = np.abs(out_np[b, obs] - wav_np[b, obs]).max()
        assert err < 5e-3 * np.abs(wav_np[b]).max(), err


def test_complex_infer_fn_refine_avg_runs():
    """Posterior-mean (refine_avg) on the GL-free complex chain: iSTFT
    is linear, so the K-sample average decodes finite with the observed
    region still exact (each sample composites observed verbatim and
    the mean of identical observed regions is itself)."""
    from viai_tpu.train.diffusion import (complex_refiner_channels,
                                          make_complex_refiner_infer_fn)

    g_def, g_state, wav, _, _ = _tiny_setup(batch=2)
    wav = wav[:2]
    r_in, r_out = complex_refiner_channels(2)
    R = define_R(r_in, ngf=8, out_channels=r_out)
    r_def, r_state = nnx.split(R)
    one = make_complex_refiner_infer_fn(
        g_def, None, r_def, r_state, TINY_CFG, steps=2, t_start=1.0)
    avg = make_complex_refiner_infer_fn(
        g_def, None, r_def, r_state, TINY_CFG, steps=2, t_start=1.0,
        refine_avg=3)
    key = jax.random.key(33)
    o1 = np.asarray(one(g_state, None, wav, key, None))
    o3 = np.asarray(avg(g_state, None, wav, key, None))
    assert o3.shape == wav.shape and np.isfinite(o3).all()
    assert np.abs(o1 - o3).max() > 0      # extra folds contributed


def test_complex_refiner_cli_roundtrip(tmp_path):
    """The queue-3 product chain end-to-end at tiny scale: train.py →
    hand-saved complex R checkpoint → test.py --refiner
    --refiner_domain complex (GL-free decode) with resample +
    best-of-K. Pins the CLI-side R channel construction against
    complex_refiner_channels."""
    import os

    from viai_tpu.cli.test import main as infer_main
    from viai_tpu.cli.train import main as train_main
    from viai_tpu.io import save_networks
    from viai_tpu.train.diffusion import complex_refiner_channels

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
        "--name", "cref", "--checkpoints_dir", ckpt,
        "--niter", "1", "--niter_decay", "0", "--steps_per_epoch", "2",
        "--save_epoch_freq", "1", "--lr_policy", "constant",
        "--print_freq", "1",
    ])
    r_in, r_out = complex_refiner_channels(2)
    R = define_R(r_in, ngf=8, seed=3, out_channels=r_out)
    _, r_state = nnx.split(R)
    save_networks({"R": r_state}, "latest", os.path.join(ckpt, "cref"),
                  also_latest=False)

    summary = infer_main(TINY + [
        "--name", "cref", "--checkpoints_dir", ckpt,
        "--results_dir", str(tmp_path / "res"),
        "--which_epoch", "latest", "--how_many", "2",
        "--refiner", "--refiner_domain", "complex", "--rngf", "8",
        "--refine_steps", "2", "--refine_t", "1.0",
        "--refine_clamp", "q", "--refine_resample", "1",
        "--eval_samples", "2",
    ])
    assert summary["n"] == 2
    assert np.isfinite(summary["psnr_mean"])
    assert summary["eval_samples"] == 2


def test_complex_ddim_resample_runs():
    """Complex-domain DDIM with RePaint resampling: finite, observed
    complex channels exact after compositing."""
    from viai_tpu.train.diffusion import (complex_image,
                                          complex_refiner_channels,
                                          ddim_refine_complex)

    g_def, g_state, wav, batch_d, fake = _tiny_setup(batch=2)
    wav = wav[:2]
    batch_d = {k: v[:2] for k, v in batch_d.items()}
    r_in, r_out = complex_refiner_channels(2)
    R = define_R(r_in, ngf=8, out_channels=r_out)
    r_def, r_state = nnx.split(R)
    cplx = complex_image(wav, TINY_CFG)
    out = ddim_refine_complex(r_def, r_state, fake[:2, ..., :1], batch_d,
                              cplx, jax.random.key(3), steps=3,
                              t_start=1.0, clamp_mode="q", resample=2)
    assert np.isfinite(np.asarray(out)).all()
    m = np.asarray(batch_d["mask_img"])
    np.testing.assert_allclose(np.asarray(out) * m,
                               np.asarray(cplx) * m, atol=1e-5)


# ---------------------------------------------------------------------------
# Round 5: chunked posterior mean (refine_chunk — the round-4 K=32 HBM
# OOM fix), the hybrid complex decode (complex_mag), and the runtime
# noise fold (one compile for all --eval_samples streams).
# VERDICT r4 next-round #1/#2, ADVICE r4 #1/#3.
# ---------------------------------------------------------------------------


def test_chunked_mean_matches_full_vmap():
    """chunked_mean == full-vmap mean for every chunk size: chunk=1
    (pure scan), chunk dividing K, chunk NOT dividing K (remainder
    path), chunk>=K (single vmap — the round-4 code path), and pytree
    outputs. Exactness up to float summation order is the property the
    OOM fix rides on."""
    from viai_tpu.train.diffusion import avg_keys, chunked_mean

    keys = avg_keys(jax.random.key(7), 5)

    def stats(k):
        x = jax.random.normal(k, (3, 4))
        return {"a": x, "b": jnp.sum(x**2)}

    full = jax.tree.map(lambda x: jnp.mean(x, 0), jax.vmap(stats)(keys))
    for chunk in (1, 2, 3, 5, 8):
        got = chunked_mean(stats, keys, chunk)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5), full, got)


def test_avg_keys_base_stream_is_key_zero():
    """avg_keys row 0 IS the base stream (avg1 == single-sample run) —
    the invariant that keeps round-4 quality_results comparable."""
    from viai_tpu.train.diffusion import avg_keys

    k = jax.random.key(123)
    ks = avg_keys(k, 3)
    assert ks.shape[0] == 3
    np.testing.assert_array_equal(jax.random.key_data(ks[0]),
                                  jax.random.key_data(k))


def test_infer_fn_refine_chunk_invariance():
    """refine_avg=3 under chunk 1/2/3 is the same estimator — identical
    key folds, different summation batching. chunk=3 (single vmap) is
    the round-4 semantics; chunk 1 and 2 (scan + remainder) must match
    it through the full chain incl. GL decode."""
    from viai_tpu.train.step import make_infer_fn

    g_def, g_state, wav, _, _ = _tiny_setup()
    R = _tiny_refiner()
    r_def, r_state = nnx.split(R)
    kw = dict(n_gl_iter=2, refiner=(r_def, r_state), refine_steps=2,
              refine_t=0.3, refine_avg=3)
    k = jax.random.key(17)
    outs = [np.asarray(
        make_infer_fn(g_def, None, TINY_CFG, refine_chunk=c, **kw)(
            g_state, None, wav, k, None)) for c in (3, 2, 1)]
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-4)
    np.testing.assert_allclose(outs[0], outs[2], atol=1e-4)


def test_complex_infer_fn_refine_chunk_invariance():
    """Same invariance on the GL-free complex chain (the path whose
    K=32 arm OOM'd in round 4)."""
    from viai_tpu.train.diffusion import (complex_refiner_channels,
                                          make_complex_refiner_infer_fn)

    g_def, g_state, wav, _, _ = _tiny_setup(batch=2)
    wav = wav[:2]
    r_in, r_out = complex_refiner_channels(2)
    R = define_R(r_in, ngf=8, out_channels=r_out)
    r_def, r_state = nnx.split(R)
    kw = dict(steps=2, t_start=1.0, refine_avg=3)
    k = jax.random.key(29)
    outs = [np.asarray(
        make_complex_refiner_infer_fn(
            g_def, None, r_def, r_state, TINY_CFG, refine_chunk=c, **kw)(
                g_state, None, wav, k, None)) for c in (3, 2, 1)]
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-4)
    np.testing.assert_allclose(outs[0], outs[2], atol=1e-4)


def test_complex_mag_mean_k1_equals_sample():
    """complex_mag='mean' with refine_avg=1: E[|x|] over one sample is
    |x| itself, so the hybrid recomposition mag·e^{j∠x} reconstructs x
    exactly — bitwise-equivalent decode to complex_mag='sample'. Pins
    the phasor/magnitude algebra of the hybrid."""
    from viai_tpu.train.diffusion import (complex_refiner_channels,
                                          make_complex_refiner_infer_fn)

    g_def, g_state, wav, _, _ = _tiny_setup(batch=2)
    wav = wav[:2]
    r_in, r_out = complex_refiner_channels(2)
    R = define_R(r_in, ngf=8, out_channels=r_out)
    r_def, r_state = nnx.split(R)
    kw = dict(steps=2, t_start=1.0)
    k = jax.random.key(31)
    o_sample = np.asarray(make_complex_refiner_infer_fn(
        g_def, None, r_def, r_state, TINY_CFG, complex_mag="sample",
        **kw)(g_state, None, wav, k, None))
    o_mean = np.asarray(make_complex_refiner_infer_fn(
        g_def, None, r_def, r_state, TINY_CFG, complex_mag="mean",
        **kw)(g_state, None, wav, k, None))
    np.testing.assert_allclose(o_sample, o_mean,
                               atol=1e-5 * np.abs(o_sample).max())


def test_complex_mag_modes_observed_exact_and_distinct():
    """All three complex_mag modes keep the OBSERVED region verbatim
    (the hybrid only touches the hole), decode finite, and — with a
    posterior-mean average that shrinks hole magnitude — 'keep' and
    'mean' genuinely differ from 'sample'."""
    from viai_tpu.train.diffusion import (complex_refiner_channels,
                                          make_complex_refiner_infer_fn)
    from viai_tpu.train.step import preprocess

    g_def, g_state, wav, _, _ = _tiny_setup(batch=2)
    wav = wav[:2]
    r_in, r_out = complex_refiner_channels(2)
    R = define_R(r_in, ngf=8, out_channels=r_out)
    r_def, r_state = nnx.split(R)
    kw = dict(steps=2, t_start=1.0, refine_avg=2)
    key = jax.random.key(37)
    outs = {}
    for mode in ("sample", "keep", "mean"):
        out = np.asarray(make_complex_refiner_infer_fn(
            g_def, None, r_def, r_state, TINY_CFG, complex_mag=mode,
            **kw)(g_state, None, wav, key, None))
        assert out.shape == wav.shape and np.isfinite(out).all()
        outs[mode] = out
    assert np.abs(outs["keep"] - outs["sample"]).max() > 0
    assert np.abs(outs["mean"] - outs["sample"]).max() > 0

    # Observed-region exactness for the hybrid modes (same protocol as
    # test_complex_infer_fn_observed_region_exact).
    pre = preprocess(wav, key, TINY_CFG)
    tmask = np.asarray(pre["mask_img"][:, 0, :, 0])
    hop, nfft = TINY_CFG.stft.hop_length, TINY_CFG.stft.n_fft
    wav_np = np.asarray(wav)
    for mode in ("keep", "mean"):
        for b in range(2):
            holes = np.where(tmask[b] == 0.0)[0]
            lo = max(int(holes.min() * hop - nfft), 300)
            hi = min(int((holes.max() + 1) * hop + nfft),
                     wav.shape[-1] - 300)
            obs = np.r_[300:lo, hi:wav.shape[-1] - 300]
            err = np.abs(outs[mode][b, obs] - wav_np[b, obs]).max()
            assert err < 5e-3 * np.abs(wav_np[b]).max(), (mode, err)


def test_runtime_fold_matches_baked_fold():
    """runtime_fold: ONE compiled infer fn taking the fold as a traced
    argument must reproduce the K separately-compiled noise_fold
    variants bitwise-modulo-float, in both domains (ADVICE r4 #3: the
    K-compiles path cost minutes of XLA time per eval arm)."""
    from viai_tpu.train.diffusion import (complex_refiner_channels,
                                          make_complex_refiner_infer_fn)
    from viai_tpu.train.step import make_infer_fn

    g_def, g_state, wav, _, _ = _tiny_setup(batch=2)
    wav = wav[:2]
    k = jax.random.key(41)

    # Magnitude domain.
    R = _tiny_refiner()
    r_def, r_state = nnx.split(R)
    kw = dict(n_gl_iter=2, refiner=(r_def, r_state), refine_steps=2,
              refine_t=0.3)
    rt = make_infer_fn(g_def, None, TINY_CFG, runtime_fold=True, **kw)
    for s in (0, 2):
        baked = make_infer_fn(g_def, None, TINY_CFG,
                              noise_fold=0x5EED + s, **kw)
        np.testing.assert_allclose(
            np.asarray(rt(g_state, None, wav, k, None, jnp.int32(s))),
            np.asarray(baked(g_state, None, wav, k, None)), atol=1e-6)

    # Complex domain.
    r_in, r_out = complex_refiner_channels(2)
    Rc = define_R(r_in, ngf=8, out_channels=r_out)
    rc_def, rc_state = nnx.split(Rc)
    ckw = dict(steps=2, t_start=1.0)
    crt = make_complex_refiner_infer_fn(
        g_def, None, rc_def, rc_state, TINY_CFG, runtime_fold=True, **ckw)
    for s in (0, 1):
        cbaked = make_complex_refiner_infer_fn(
            g_def, None, rc_def, rc_state, TINY_CFG,
            noise_fold=0xC0 + s, **ckw)
        np.testing.assert_allclose(
            np.asarray(crt(g_state, None, wav, k, None, jnp.int32(s))),
            np.asarray(cbaked(g_state, None, wav, k, None)), atol=1e-6)


def test_refine_chunk_caps_compile_memory_in_k():
    """The round-4 OOM regression test: with chunking, XLA's compiled
    temp-buffer footprint must stay ~flat as refine_avg K grows (the
    unchunked round-4 code scaled it linearly in K — 17.31 G needed at
    K=32, batch 16, 256×256 complex, vs the chip's 15.75 G). Asserted
    via lowered-compile memory_analysis on the complex chain: K=32 at
    chunk=8 within 1.5× of K=8."""
    from viai_tpu.train.diffusion import (complex_refiner_channels,
                                          make_complex_refiner_infer_fn)

    g_def, g_state, wav, _, _ = _tiny_setup(batch=2)
    wav = wav[:2]
    r_in, r_out = complex_refiner_channels(2)
    R = define_R(r_in, ngf=8, out_channels=r_out)
    r_def, r_state = nnx.split(R)
    key = jax.random.key(5)

    def temp_bytes(avg):
        fn = make_complex_refiner_infer_fn(
            g_def, None, r_def, r_state, TINY_CFG, steps=2, t_start=1.0,
            refine_avg=avg, refine_chunk=8)
        stats = fn.lower(g_state, None, wav, key, None).compile(
        ).memory_analysis()
        if stats is None:           # backend without memory analysis
            pytest.skip("memory_analysis unavailable on this backend")
        return stats.temp_size_in_bytes

    t8, t32 = temp_bytes(8), temp_bytes(32)
    assert t32 <= 1.5 * t8, (t8, t32)


# ---------------------------------------------------------------------------
# Round 5: refiner self-conditioning (VERDICT r4 next-round #6b) — R
# carries its own previous x̂0 estimate as extra input channel(s);
# a posterior-QUALITY lever per the Bayes-ceiling attribution.
# ---------------------------------------------------------------------------


def test_selfcond_train_step_learns():
    """Self-cond training: R has in_channels+1; the v-MSE falls."""
    import optax

    g_def, g_state, wav, _, _ = _tiny_setup()
    R = define_R(5, ngf=8)    # 4 std channels + 1 self-cond
    r_def, r_state = nnx.split(R)
    r_ema = jax.tree.map(jnp.copy, r_state)
    r_tx = optax.adam(1e-3)
    r_opt = r_tx.init(r_state)
    step = make_refiner_train_step(g_def, None, r_def, r_tx, TINY_CFG,
                                   self_cond=True)
    losses = []
    key = jax.random.key(0)
    for i in range(30):
        r_state, r_opt, r_ema, aux = step(
            r_state, r_opt, r_ema, g_state, None, wav,
            jax.random.fold_in(key, i))
        losses.append(float(aux["loss_R"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_selfcond_ddim_refine_runs():
    """Self-cond DDIM sampler: finite, observed-region exact (the
    exact-equivalence property vs the plain sampler is pinned by
    test_selfcond_zero_weights_match_plain_refiner below)."""
    g_def, g_state, wav, batch_d, fake = _tiny_setup()
    R = define_R(5, ngf=8, seed=11)
    r_def, r_state = nnx.split(R)
    g_img = fake[..., :1]
    out = ddim_refine(r_def, r_state, g_img, batch_d, jax.random.key(2),
                      steps=3, t_start=0.6, self_cond=True)
    assert np.isfinite(np.asarray(out)).all()
    m = np.asarray(batch_d["mask_img"])
    np.testing.assert_allclose(
        np.asarray(out) * m, np.asarray(batch_d["masked_img"]) * m,
        atol=1e-5)


def test_selfcond_zero_weights_match_plain_refiner():
    """Exactness pin: an R whose FIRST-conv self-cond column is zero
    must produce the SAME ddim_refine output whether the self-cond
    channel carries x̂0 or anything else — the feature only enters
    through that column. Construct the 5-channel net by zero-padding a
    4-channel net's first conv; then selfcond chain == plain chain."""
    g_def, g_state, wav, batch_d, fake = _tiny_setup()
    R4 = _tiny_refiner(seed=5)
    R5 = define_R(5, ngf=8, seed=5)
    s4, s5 = nnx.state(R4), nnx.state(R5)
    # Copy every leaf from the 4-channel net (identical tree structure
    # and order); the widened first conv kernel (kh, kw, cin, cout)
    # gets its extra cin column zeroed.
    l4, _ = jax.tree.flatten(s4)
    l5, tdef5 = jax.tree.flatten(s5)
    assert len(l4) == len(l5)
    merged = []
    for v4, v5 in zip(l4, l5):
        if v4.shape != v5.shape:           # the widened first conv
            pad = np.zeros(v5.shape, np.asarray(v4).dtype)
            pad[tuple(slice(0, d) for d in v4.shape)] = np.asarray(v4)
            merged.append(jnp.asarray(pad))
        else:
            merged.append(v4)
    nnx.update(R5, jax.tree.unflatten(tdef5, merged))
    r4_def, r4_state = nnx.split(R4)
    r5_def, r5_state = nnx.split(R5)
    g_img = fake[..., :1]
    k = jax.random.key(9)
    out4 = ddim_refine(r4_def, r4_state, g_img, batch_d, k,
                       steps=3, t_start=0.5, self_cond=False)
    out5 = ddim_refine(r5_def, r5_state, g_img, batch_d, k,
                       steps=3, t_start=0.5, self_cond=True)
    np.testing.assert_allclose(np.asarray(out4), np.asarray(out5),
                               atol=1e-5)


def test_selfcond_complex_infer_observed_exact():
    """Complex-domain self-cond chain end-to-end: finite, observed
    region decodes exactly (same protocol as the non-SC test)."""
    from viai_tpu.train.diffusion import (complex_refiner_channels,
                                          make_complex_refiner_infer_fn)

    g_def, g_state, wav, _, _ = _tiny_setup(batch=2)
    wav = wav[:2]
    r_in, r_out = complex_refiner_channels(2, self_cond=True)
    R = define_R(r_in, ngf=8, out_channels=r_out)
    r_def, r_state = nnx.split(R)
    infer = make_complex_refiner_infer_fn(
        g_def, None, r_def, r_state, TINY_CFG, steps=3, t_start=1.0,
        self_cond=True, refine_avg=2, refine_chunk=1)
    out = np.asarray(infer(g_state, None, wav, jax.random.key(21), None))
    assert out.shape == wav.shape and np.isfinite(out).all()


def test_selfcond_cli_roundtrip(tmp_path):
    """test.py --refiner --refine_selfcond loads an R with the +1
    channel and runs the SC sampler."""
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
        "--name", "scref", "--checkpoints_dir", ckpt,
        "--niter", "1", "--niter_decay", "0", "--steps_per_epoch", "2",
        "--save_epoch_freq", "1", "--lr_policy", "constant",
        "--print_freq", "1",
    ])
    R = define_R(5, ngf=8, seed=3)
    _, r_state = nnx.split(R)
    save_networks({"R": r_state}, "latest", os.path.join(ckpt, "scref"),
                  also_latest=False)
    summary = infer_main(TINY + [
        "--name", "scref", "--checkpoints_dir", ckpt,
        "--results_dir", str(tmp_path / "res"),
        "--which_epoch", "latest", "--how_many", "2",
        "--refiner", "--refine_selfcond", "--rngf", "8",
        "--refine_steps", "2", "--refine_t", "0.4",
    ])
    assert summary["n"] == 2
    assert np.isfinite(summary["psnr_mean"])
