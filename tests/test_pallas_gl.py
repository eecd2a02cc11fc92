"""Pallas Griffin-Lim vs the jnp reference implementation.

Runs the kernel in interpreter mode on CPU (tests/conftest.py forces
the CPU backend); the compiled TPU path runs the identical kernel code.
"""

import dataclasses

import jax
import numpy as np
import pytest

from viai_tpu.signal import STFTConfig, griffin_lim, stft_magnitude
from viai_tpu.signal.pallas_gl import griffin_lim_pallas

CFG = STFTConfig(n_fft=126, hop_length=32)  # small → fast interpret runs


def _mag(batch=2, n=2048, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000
    f = rng.uniform(200, 800, (batch, 1))
    x = (0.4 * np.sin(2 * np.pi * f * t)).astype(np.float32)
    return stft_magnitude(x, CFG), n


@pytest.mark.parametrize("n_iter", [1, 4])
def test_pallas_gl_matches_jnp(n_iter):
    mag, n = _mag()
    ref = griffin_lim(mag, CFG, n_iter=n_iter, length=n)
    out = griffin_lim_pallas(mag, CFG, n_iter=n_iter, length=n,
                             interpret=True)
    assert out.shape == ref.shape
    # v3 computes OLA as an MXU matmul — summation order differs from
    # the jnp shifted-add version; clip edges (tiny window env) amplify
    # fp32 rounding, hence the 1e-3 atol (same scale as the torch-istft
    # parity tolerance in test_stft.py).
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-3, rtol=1e-3
    )


def test_pallas_gl_zero_iter_is_zero_phase_istft():
    mag, n = _mag(batch=1, seed=3)
    ref = griffin_lim(mag, CFG, n_iter=0, length=n)
    out = griffin_lim_pallas(mag, CFG, n_iter=0, length=n, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3
    )


def test_pallas_gl_odd_batch_blocks():
    """clips_per_block with a non-divisible batch (pads internally).

    n_iter=1 keeps the comparison in exact territory: GL is an iterated
    nonlinear map, so fp32 summation-order differences between the
    kernel and the jnp path grow chaotically with iteration count for
    unlucky clips (observed 2e-3 at n_iter=2) while both remain valid
    GL trajectories. Block-correctness (what this test pins) is
    iteration-independent — CB=1 and CB=2 outputs are bit-comparable.
    """
    mag, n = _mag(batch=3, seed=9)
    ref = griffin_lim(mag, CFG, n_iter=1, length=n)
    out = griffin_lim_pallas(mag, CFG, n_iter=1, length=n, interpret=True,
                             clips_per_block=2)
    assert out.shape == (3, n)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-4, rtol=1e-3
    )
    # Blocked and unblocked kernels agree exactly (same program order).
    out1 = griffin_lim_pallas(mag, CFG, n_iter=1, length=n, interpret=True,
                              clips_per_block=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out1),
                               atol=1e-6, rtol=1e-6)


def test_split_ola_matches_chain_exactly():
    """v6 split-OLA (disjoint-write accumulators) must be numerically
    indistinguishable from the v4 RMW chain: same matmuls, only the
    overlap-add summation is restructured (4-way tree vs sequential)."""
    # n_iter=1 keeps the comparison pre-chaos (GL is an iterated
    # nonlinear map; see test_pallas_gl_odd_batch_blocks).
    mag, n = _mag(batch=2, seed=4)
    a = griffin_lim_pallas(mag, CFG, n_iter=1, length=n, interpret=True,
                           ola_mode="chain")
    b = griffin_lim_pallas(mag, CFG, n_iter=1, length=n, interpret=True,
                           ola_mode="split")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-6, rtol=1e-6)


def test_split_ola_with_observed():
    from viai_tpu.signal import stft

    mag, n = _mag(batch=2, seed=6)
    rng = np.random.default_rng(6)
    t = np.arange(n) / 16000
    x = (0.4 * np.sin(2 * np.pi * rng.uniform(200, 800, (2, 1)) * t)
         ).astype(np.float32)
    re, im = stft(x, CFG)
    fmask = np.ones((2, mag.shape[1], 1), np.float32)
    fmask[:, 20:30] = 0.0
    obs = (np.asarray(fmask), re, im)
    a = griffin_lim_pallas(mag, CFG, n_iter=1, length=n, interpret=True,
                           ola_mode="chain", observed=obs)
    b = griffin_lim_pallas(mag, CFG, n_iter=1, length=n, interpret=True,
                           ola_mode="split", observed=obs)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("n_iter", [1, 4])
def test_fused_matches_jnp(n_iter):
    """v7 fused consistency vs the jnp reference (small config: hop=32
    exercises the UNALIGNED slab path and n_edge=2 per side)."""
    mag, n = _mag(batch=2, seed=11)
    ref = griffin_lim(mag, CFG, n_iter=n_iter, length=n)
    out = griffin_lim_pallas(mag, CFG, n_iter=n_iter, length=n,
                             interpret=True, ola_mode="fused")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-3, rtol=1e-3
    )


def test_fused_matches_chain_tight():
    mag, n = _mag(batch=2, seed=4)
    a = griffin_lim_pallas(mag, CFG, n_iter=1, length=n, interpret=True,
                           ola_mode="chain")
    b = griffin_lim_pallas(mag, CFG, n_iter=1, length=n, interpret=True,
                           ola_mode="fused")
    # Same matmuls; only the overlap-add/reframe summation order
    # differs (7-term slab tree vs sequential RMW) → fp32 rounding.
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=1e-5)


def test_fused_with_observed():
    from viai_tpu.signal import stft

    mag, n = _mag(batch=2, seed=6)
    rng = np.random.default_rng(6)
    t = np.arange(n) / 16000
    x = (0.4 * np.sin(2 * np.pi * rng.uniform(200, 800, (2, 1)) * t)
         ).astype(np.float32)
    re, im = stft(x, CFG)
    fmask = np.ones((2, mag.shape[1], 1), np.float32)
    fmask[:, 20:30] = 0.0
    obs = (np.asarray(fmask), re, im)
    a = griffin_lim_pallas(mag, CFG, n_iter=2, length=n, interpret=True,
                           ola_mode="chain", observed=obs)
    b = griffin_lim_pallas(mag, CFG, n_iter=2, length=n, interpret=True,
                           ola_mode="fused", observed=obs)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-4, rtol=1e-4)


def test_fused_product_config():
    """The real serving config (n_fft=510, hop=128): every fused slab
    bound is a multiple of 128 (the aligned fast path the TPU runs)."""
    cfg = STFTConfig(n_fft=510, hop_length=128)
    n = 128 * 10  # F = 11 > 2*n_edge+1 = 5
    rng = np.random.default_rng(7)
    t = np.arange(n) / 16000
    x = (0.4 * np.sin(2 * np.pi * rng.uniform(200, 800, (1, 1)) * t)
         ).astype(np.float32)
    mag = stft_magnitude(x, cfg)
    ref = griffin_lim(mag, cfg, n_iter=2, length=n)
    out = griffin_lim_pallas(mag, cfg, n_iter=2, length=n,
                             interpret=True, ola_mode="fused")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-3, rtol=1e-3
    )


def test_auto_mode_selection():
    """auto → fused when constraints hold, chain otherwise (tiny F)."""
    cfg = STFTConfig(n_fft=510, hop_length=128)
    rng = np.random.default_rng(3)
    # F = 5 == 2*ceil(pad/hop)+1 → constraint F > 5 fails → chain path
    # (exercised via interpret; output must still match the reference).
    n_small = 128 * 4
    x = (0.4 * np.sin(2 * np.pi * 440 *
                      np.arange(n_small)[None, :] / 16000)
         ).astype(np.float32)
    mag = stft_magnitude(x, cfg)
    ref = griffin_lim(mag, cfg, n_iter=1, length=n_small)
    out = griffin_lim_pallas(mag, cfg, n_iter=1, length=n_small,
                             interpret=True)  # ola_mode="auto"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


def test_final_ola_matmul_matches_loop():
    """v9 final OLA (frame-space emit + XLA reassembly) vs the v7
    per-frame loop — same phase loop, only the LAST synthesis differs,
    so agreement is fp32-summation-order tight."""
    mag, n = _mag(batch=3, seed=9)
    a = griffin_lim_pallas(mag, CFG, n_iter=2, length=n, interpret=True,
                           ola_mode="fused", final_ola="loop")
    b = griffin_lim_pallas(mag, CFG, n_iter=2, length=n, interpret=True,
                           ola_mode="fused", final_ola="matmul")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=1e-5)


def test_final_ola_matmul_product_config_with_observed():
    """v9 on the real serving config (n_fft=510, hop=128) with the
    phase-aware observed path, vs the jnp oracle."""
    from viai_tpu.signal import stft

    cfg = STFTConfig(n_fft=510, hop_length=128)
    n = 128 * 10
    rng = np.random.default_rng(12)
    t = np.arange(n) / 16000
    x = (0.4 * np.sin(2 * np.pi * rng.uniform(200, 800, (2, 1)) * t)
         ).astype(np.float32)
    mag = stft_magnitude(x, cfg)
    re, im = stft(x, cfg)
    fmask = np.ones((2, mag.shape[1], 1), np.float32)
    fmask[:, 4:7] = 0.0
    obs = (np.asarray(fmask), re, im)
    a = griffin_lim_pallas(mag, cfg, n_iter=2, length=n, interpret=True,
                           ola_mode="fused", final_ola="loop",
                           observed=obs)
    b = griffin_lim_pallas(mag, cfg, n_iter=2, length=n, interpret=True,
                           ola_mode="fused", final_ola="matmul",
                           observed=obs)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=1e-5)


def test_final_ola_matmul_rejects_unfused():
    mag, n = _mag(batch=1, seed=1)
    with pytest.raises(ValueError):
        griffin_lim_pallas(mag, CFG, n_iter=1, length=n, interpret=True,
                           ola_mode="chain", final_ola="matmul")
