"""Phase-aware Griffin-Lim (VERDICT.md round-1 item #2).

The inpainting chain knows the observed region's complex STFT; GL only
needs to recover phase inside the hole. These tests pin:
  * observed-region reconstruction error drops by ≥10x vs zero-phase GL
  * the Pallas kernel's observed path matches the jnp implementation
  * the full infer chain benefits end-to-end (both backends)
"""

import jax
import jax.numpy as jnp
import numpy as np

from viai_tpu.signal import STFTConfig, griffin_lim, stft
from viai_tpu.signal.pallas_gl import griffin_lim_pallas
from viai_tpu.signal.stft import stft_magnitude
from viai_tpu.testing import TINY_CFG, tiny_models, tone_batch
from viai_tpu.train import adam, init_state, make_infer_fn

CFG = STFTConfig(n_fft=126, hop_length=32)


def _setup(batch=2, n=2048, seed=0, hole=(30, 40)):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000
    f = rng.uniform(200, 800, (batch, 1))
    x = (0.4 * np.sin(2 * np.pi * f * t)).astype(np.float32)
    re, im = stft(x, CFG)
    mag = jnp.sqrt(re * re + im * im + 1e-12)
    n_frames = mag.shape[1]
    fmask = np.ones((batch, n_frames, 1), np.float32)
    fmask[:, hole[0]:hole[1]] = 0.0
    return x, mag, (jnp.asarray(fmask), re, im), n


def _obs_slice(hole, hop, n_fft, n):
    """Sample indices influenced ONLY by observed frames."""
    pad = n_fft // 2
    first_hole_sample = hole[0] * hop - pad
    last_hole_sample = (hole[1] - 1) * hop - pad + n_fft
    return slice(0, max(first_hole_sample - n_fft, 0)), slice(
        min(last_hole_sample + n_fft, n), n
    )


def test_observed_clamp_reconstructs_observed_region():
    hole = (30, 40)
    x, mag, observed, n = _setup(hole=hole)
    out_pa = np.asarray(
        griffin_lim(mag, CFG, n_iter=8, length=n, observed=observed)
    )
    out_zero = np.asarray(griffin_lim(mag, CFG, n_iter=8, length=n))
    s0, s1 = _obs_slice(hole, CFG.hop_length, CFG.n_fft, n)
    for s in (s0, s1):
        ref = x[:, s]
        err_pa = np.linalg.norm(out_pa[:, s] - ref) / np.linalg.norm(ref)
        err_zero = np.linalg.norm(out_zero[:, s] - ref) / np.linalg.norm(ref)
        # Observed bins held verbatim → the region inverts near-exactly.
        assert err_pa < 1e-3, err_pa
        assert err_pa < err_zero / 10.0, (err_pa, err_zero)


def test_phase_aware_is_noop_with_full_mask():
    """fmask all-zero (everything is hole) == plain GL."""
    x, mag, (fmask, re, im), n = _setup()
    allhole = (jnp.zeros_like(fmask), re, im)
    a = griffin_lim(mag, CFG, n_iter=3, length=n, observed=allhole)
    b = griffin_lim(mag, CFG, n_iter=3, length=n)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-6, rtol=1e-6)


def test_pallas_phase_aware_matches_jnp():
    x, mag, observed, n = _setup()
    ref = griffin_lim(mag, CFG, n_iter=2, length=n, observed=observed)
    out = griffin_lim_pallas(mag, CFG, n_iter=2, length=n, interpret=True,
                             observed=observed)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


def test_pallas_phase_aware_odd_batch():
    x, mag, observed, n = _setup(batch=3, seed=5)
    ref = griffin_lim(mag, CFG, n_iter=1, length=n, observed=observed)
    out = griffin_lim_pallas(mag, CFG, n_iter=1, length=n, interpret=True,
                             clips_per_block=2, observed=observed)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


def test_infer_chain_phase_aware_improves_observed_snr():
    """End-to-end: make_infer_fn(phase_aware=True) reconstructs the
    observed region an order of magnitude better than zero-phase GL."""
    G, D, V = tiny_models()
    g_tx, d_tx = adam(2e-4), adam(2e-4)
    (g_def, d_def, v_def), state = init_state(G, D, V, g_tx, d_tx)
    wav = jnp.asarray(tone_batch(2, seed=11))
    hole = (20, 36)
    tmask = jnp.ones((2, TINY_CFG.image_frames)).at[:, hole[0]:hole[1]].set(0.0)

    outs = {}
    for pa in (True, False):
        infer = make_infer_fn(g_def, v_def, TINY_CFG, n_gl_iter=8,
                              external_mask=True, phase_aware=pa)
        outs[pa] = np.asarray(infer(state["g"], state["v"], wav, tmask))

    x = np.asarray(wav)
    s0, s1 = _obs_slice(hole, TINY_CFG.stft.hop_length,
                        TINY_CFG.stft.n_fft, x.shape[-1])
    ref = x[:, s0]
    err_pa = np.linalg.norm(outs[True][:, s0] - ref) / np.linalg.norm(ref)
    err_zero = np.linalg.norm(outs[False][:, s0] - ref) / np.linalg.norm(ref)
    assert err_pa < err_zero / 10.0, (err_pa, err_zero)
    # The compress/decompress round-trip is not bit-exact, but observed
    # complex bins are verbatim → sub-percent waveform error.
    assert err_pa < 0.01, err_pa


def test_extrapolate_init_improves_hole_snr():
    """Phase-vocoder init: partials keep rotating through the gap, so a
    stationary tone's hole reconstructs ~40 dB better than the 0° restart
    (which GL×8 cannot undo — it converges to a consistent-but-shifted
    solution)."""
    hole = (30, 40)
    x, mag, observed, n = _setup(hole=hole)
    hop, n_fft = CFG.hop_length, CFG.n_fft
    pad = n_fft // 2
    sl = slice(hole[0] * hop - pad, (hole[1] - 1) * hop - pad + n_fft)

    def hole_snr(out):
        ref = x[:, sl]
        err = np.asarray(out)[:, sl] - ref
        return 10 * np.log10((ref ** 2).sum() / (err ** 2).sum())

    zero = griffin_lim(mag, CFG, n_iter=8, length=n, observed=observed)
    ext = griffin_lim(mag, CFG, n_iter=8, length=n, observed=observed,
                      phase_init="extrapolate")
    assert hole_snr(ext) > hole_snr(zero) + 10.0, (
        hole_snr(ext), hole_snr(zero))
    assert hole_snr(ext) > 25.0, hole_snr(ext)


def test_extrapolate_requires_observed():
    import pytest

    x, mag, observed, n = _setup()
    with pytest.raises(ValueError):
        griffin_lim(mag, CFG, n_iter=1, length=n, phase_init="extrapolate")
    with pytest.raises(ValueError):
        griffin_lim_pallas(mag, CFG, n_iter=1, length=n, interpret=True,
                           phase_init="extrapolate")


def test_extrapolate_hole_at_clip_start_falls_back():
    """Frames with no observed predecessor keep zero-phase init (no NaNs,
    output finite, observed region still clamps)."""
    x, mag, (fmask, re, im), n = _setup()
    fm = np.asarray(fmask).copy()
    fm[:, :10] = 0.0                     # hole at the very start
    obs = (jnp.asarray(fm), re, im)
    out = griffin_lim(mag, CFG, n_iter=4, length=n, observed=obs,
                      phase_init="extrapolate")
    assert np.isfinite(np.asarray(out)).all()


def test_pallas_extrapolate_matches_jnp():
    x, mag, observed, n = _setup(batch=3, seed=7)
    ref = griffin_lim(mag, CFG, n_iter=2, length=n, observed=observed,
                      phase_init="extrapolate")
    out = griffin_lim_pallas(mag, CFG, n_iter=2, length=n, interpret=True,
                             clips_per_block=2, observed=observed,
                             phase_init="extrapolate")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


def test_phase_init_auto_resolution():
    """auto → extrapolate under phase-aware GL, zero with
    phase_aware=False (must NOT raise)."""
    G, D, V = tiny_models()
    g_tx, d_tx = adam(2e-4), adam(2e-4)
    (g_def, d_def, v_def), state = init_state(G, D, V, g_tx, d_tx)
    wav = jnp.asarray(tone_batch(1, seed=3))
    key = jax.random.key(0)
    # phase_aware=False + auto: resolves to zero, runs fine.
    infer = make_infer_fn(g_def, v_def, TINY_CFG, n_gl_iter=2,
                          phase_aware=False, phase_init="auto")
    out = infer(state["g"], state["v"], wav, key)
    assert np.isfinite(np.asarray(out)).all()
    # phase_aware=True + auto == explicit extrapolate.
    a = make_infer_fn(g_def, v_def, TINY_CFG, n_gl_iter=2,
                      phase_init="auto")(state["g"], state["v"], wav, key)
    b = make_infer_fn(g_def, v_def, TINY_CFG, n_gl_iter=2,
                      phase_init="extrapolate")(state["g"], state["v"],
                                                wav, key)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_bidirectional_extrapolation_beats_forward():
    """Anchoring the hole's phase at BOTH boundaries removes the seam a
    forward-only extrapolation leaves at the right edge (measured
    +1.9 dB on the notes corpus at GL x32). Pinned on a slow chirp: the
    left-boundary rotor goes stale across the gap, the right anchor
    corrects it; on a pure tone the two are equivalent."""
    from viai_tpu.signal.griffin_lim import extrapolate_hole_phase

    hole = (30, 42)
    n = 2048
    t = np.arange(n) / 16000
    f_inst = 300.0 + 1500.0 * t                  # slow linear chirp
    phase = 2 * np.pi * np.cumsum(f_inst) / 16000
    x = (0.4 * np.sin(phase)).astype(np.float32)[None]
    re, im = stft(x, CFG)
    mag = jnp.sqrt(re * re + im * im + 1e-12)
    fmask = np.ones((1, mag.shape[1], 1), np.float32)
    fmask[:, hole[0]:hole[1]] = 0.0
    observed = (jnp.asarray(fmask), re, im)

    fwd = extrapolate_hole_phase(observed[0], re, im, mag.shape,
                                 bidirectional=False)
    bid = extrapolate_hole_phase(observed[0], re, im, mag.shape)

    hop, n_fft = CFG.hop_length, CFG.n_fft
    pad = n_fft // 2
    sl = slice(hole[0] * hop - pad, (hole[1] - 1) * hop - pad + n_fft)

    def hole_err(init):
        out = griffin_lim(mag, CFG, n_iter=4, length=n, observed=observed,
                          init=init)
        return float(np.linalg.norm(np.asarray(out)[:, sl] - x[:, sl]))

    assert hole_err(bid) < hole_err(fwd), (hole_err(bid), hole_err(fwd))
    # Unit phasors everywhere.
    nrm = np.asarray(bid[0]) ** 2 + np.asarray(bid[1]) ** 2
    np.testing.assert_allclose(nrm, 1.0, atol=1e-4)
