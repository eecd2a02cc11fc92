"""STFT/ISTFT parity vs torch.stft (the CPU oracle, SURVEY.md §4).

torch.stft with center=True, pad_mode='reflect', hann window matches
librosa.stft — the reference's preprocessing (SURVEY.md §2.1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from viai_tpu.signal import (
    STFTConfig,
    griffin_lim,
    istft,
    overlap_add,
    stft,
    stft_magnitude,
)

CFGS = [
    STFTConfig(n_fft=510, hop_length=128),   # default: 256 bins (SURVEY §7.1)
    STFTConfig(n_fft=510, hop_length=256),   # long-gap multi-res hop [B:9]
    STFTConfig(n_fft=512, hop_length=128),
    STFTConfig(n_fft=256, hop_length=64, win_length=200),
]


def _torch_stft(x, cfg):
    w = torch.hann_window(cfg.win, periodic=True, dtype=torch.float64)
    S = torch.stft(
        torch.as_tensor(x, dtype=torch.float64),
        n_fft=cfg.n_fft,
        hop_length=cfg.hop_length,
        win_length=cfg.win,
        window=w,
        center=cfg.center,
        pad_mode="reflect",
        onesided=True,
        return_complex=True,
    )
    return S.numpy()  # (..., n_bins, n_frames)


def _rand_wave(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("cfg", CFGS)
def test_stft_matches_torch(cfg):
    x = _rand_wave((2, 8192))
    re, im = jax.jit(stft, static_argnums=1)(x, cfg)
    ref = _torch_stft(x, cfg)
    ref_re = np.swapaxes(ref.real, -1, -2)  # torch: (..., bins, frames)
    ref_im = np.swapaxes(ref.imag, -1, -2)
    assert re.shape == ref_re.shape
    np.testing.assert_allclose(np.asarray(re), ref_re, atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(im), ref_im, atol=2e-3, rtol=1e-4)


def test_default_shape_contract():
    """2 s @ 16 kHz with defaults → (256 frames? no: 251 frames, 256 bins)."""
    cfg = STFTConfig()
    x = _rand_wave((32000,))
    mag = stft_magnitude(x, cfg)
    assert cfg.n_bins == 256
    assert mag.shape == (cfg.num_frames(32000), 256) == (251, 256)


@pytest.mark.parametrize("cfg", CFGS[:3])
def test_istft_roundtrip(cfg):
    x = _rand_wave((3, 8192), seed=1)
    re, im = stft(x, cfg)
    y = jax.jit(istft, static_argnums=2)(re, im, cfg)
    assert y.shape == x.shape
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-3, rtol=1e-3)


def test_istft_matches_torch():
    cfg = STFTConfig(n_fft=512, hop_length=128)  # torch needs NOLA-friendly
    x = _rand_wave((8192,), seed=2)
    S = _torch_stft(x, cfg)
    w = torch.hann_window(cfg.win, periodic=True, dtype=torch.float64)
    y_ref = torch.istft(
        torch.as_tensor(S),
        n_fft=cfg.n_fft,
        hop_length=cfg.hop_length,
        win_length=cfg.win,
        window=w,
        center=True,
        length=8192,
    ).numpy()
    re = jnp.asarray(np.swapaxes(S.real, -1, -2).astype(np.float32))
    im = jnp.asarray(np.swapaxes(S.imag, -1, -2).astype(np.float32))
    y = istft(re, im, cfg, length=8192)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=2e-3, rtol=1e-3)


def test_overlap_add_basic():
    frames = jnp.ones((4, 6), jnp.float32)
    out = overlap_add(frames, hop=2)
    ref = np.zeros(2 * 3 + 6, np.float32)
    for f in range(4):
        ref[f * 2 : f * 2 + 6] += 1.0
    np.testing.assert_allclose(np.asarray(out), ref)


def test_griffin_lim_reconstructs_sine():
    """GL on a pure tone's magnitude should recover a high-SNR waveform."""
    cfg = STFTConfig()
    sr = 16000
    t = np.arange(32000) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    mag = stft_magnitude(x, cfg)
    # Random phase init (librosa default); matches the torch-projection
    # GL oracle to within ~0.003 spectral-convergence at 100 iters.
    y = griffin_lim(mag, cfg, n_iter=60, length=32000, key=jax.random.key(0))
    y = np.asarray(y)
    # GL phase is arbitrary — compare magnitude spectrograms instead.
    mag_y = np.asarray(stft_magnitude(jnp.asarray(y), cfg))
    mag_x = np.asarray(mag)
    err = np.linalg.norm(mag_y - mag_x) / np.linalg.norm(mag_x)
    assert err < 0.08, f"spectral convergence too poor: {err}"
    assert np.abs(y[2000:30000]).max() > 0.2  # signal actually present


def test_griffin_lim_batched():
    cfg = STFTConfig(n_fft=256, hop_length=64)
    x = _rand_wave((2, 4096), seed=3)
    mag = stft_magnitude(x, cfg)
    y = griffin_lim(mag, cfg, n_iter=4, length=4096)
    assert y.shape == (2, 4096)
    assert np.isfinite(np.asarray(y)).all()


def test_stft_no_center():
    cfg = STFTConfig(n_fft=256, hop_length=128, center=False)
    x = _rand_wave((4096,), seed=5)
    re, im = stft(x, cfg)
    assert re.shape == (cfg.num_frames(4096), cfg.n_bins)
    ref = _torch_stft(x, cfg)  # torch center=False path
    np.testing.assert_allclose(
        np.asarray(re), np.swapaxes(ref.real, -1, -2), atol=2e-3, rtol=1e-4
    )
