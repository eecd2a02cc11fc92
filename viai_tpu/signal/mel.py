"""Mel filterbank + log-compression / normalization.

Reference capability (SURVEY.md §2.1 / BASELINE.json north_star:
"STFT-mel-mask preprocessing"): librosa.filters.mel on CPU. Here the
filterbank is a precomputed (n_bins, n_mels) matrix applied as one
matmul on device; Slaney scaling matches librosa defaults so parity
tests can oracle against torch/librosa formulas.

Also hosts the magnitude <-> network-image compressions used by the
datasets: log1p compression and [-1, 1] normalization (pix2pix-style
network input range).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hz_to_mel(f, htk: bool = False):
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # Slaney: linear below 1 kHz, log above (librosa default).
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    # np.where evaluates both branches; clamp keeps log() off f=0
    # (silences the RuntimeWarning without changing any selected value).
    safe_f = np.maximum(f, 1e-10)
    return np.where(
        f >= min_log_hz,
        min_log_mel + np.log(safe_f / min_log_hz) / logstep,
        mels,
    )


def mel_to_hz(m, htk: bool = False):
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs
    )


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = False,
) -> np.ndarray:
    """(n_fft//2+1, n_mels) triangular filterbank, Slaney-normalized."""
    fmax = fmax or sr / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = mel_to_hz(
        np.linspace(hz_to_mel(fmin, htk), hz_to_mel(fmax, htk), n_mels + 2), htk
    )
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney area normalization.
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    fb *= enorm[:, None]
    return fb.T.astype(np.float32)


def apply_mel(mag: jax.Array, fb: jax.Array) -> jax.Array:
    """(..., n_frames, n_bins) magnitude → (..., n_frames, n_mels)."""
    return jnp.matmul(mag, fb, precision=jax.lax.Precision.HIGHEST)


# ---- network-image compressions (dataset contract) -----------------------

def compress(mag: jax.Array, ceiling: float = 6.0) -> jax.Array:
    """Magnitude → [-1, 1] image: log1p then affine. Invertible."""
    return jnp.clip(jnp.log1p(mag) / ceiling, 0.0, 1.0) * 2.0 - 1.0


def decompress(img: jax.Array, ceiling: float = 6.0) -> jax.Array:
    """[-1, 1] image → magnitude (inverse of `compress`)."""
    return jnp.expm1(jnp.clip((img + 1.0) * 0.5, 0.0, 1.0) * ceiling)


def complex_compress(re: jax.Array, im: jax.Array,
                     ceiling: float = 6.0) -> tuple[jax.Array, jax.Array]:
    """Complex STFT → magnitude-log-compressed complex image channels.

    Keeps the phase exactly and maps the magnitude through the SAME
    log1p/ceiling compression as `compress` (without the [-1,1] affine:
    silence sits at 0, the natural center for a diffusion prior over
    sparse spectra). |output| ∈ [0, 1]; invertible via
    `complex_decompress`. Used by the round-4 complex-domain refiner
    (train/diffusion.py) — the one lever that can move the long-gap
    GL phase-recovery ceiling (BENCHMARKS.md oracle row: 3.82 dB SNR
    with PERFECT magnitudes), because it predicts hole (re, im) — i.e.
    phase jointly with magnitude — instead of magnitudes for GL.
    """
    mag = jnp.sqrt(re * re + im * im)
    scale = jnp.clip(jnp.log1p(mag) / ceiling, 0.0, 1.0) / jnp.maximum(
        mag, 1e-12)
    return re * scale, im * scale


def complex_decompress(cre: jax.Array, cim: jax.Array,
                       ceiling: float = 6.0) -> tuple[jax.Array, jax.Array]:
    """Inverse of `complex_compress` (phase preserved exactly)."""
    cmag = jnp.sqrt(cre * cre + cim * cim)
    mag = jnp.expm1(jnp.clip(cmag, 0.0, 1.0) * ceiling)
    scale = mag / jnp.maximum(cmag, 1e-12)
    return cre * scale, cim * scale


def sharpen_mag(mag: jax.Array, gamma: float,
                axis: int = -2) -> jax.Array:
    """Energy-preserving spectral contrast sharpening.

    Raises each magnitude to ``gamma`` then rescales every frame (the
    ``axis`` dimension holds the frequency bins) so its L2 energy is
    unchanged. gamma > 1 grows the strong partials relative to the weak
    ones without altering loudness — a pre-Griffin-Lim conditioner for
    the over-smooth magnitudes G predicts inside LONG holes, where GL
    otherwise spreads phase across many near-equal smeared bins
    (SURVEY.md §3.5; the long-gap waveform-SNR lever from round-2
    VERDICT "what's weak" #2). gamma == 1 is the identity.
    """
    if gamma == 1.0:
        return mag
    p = jnp.power(jnp.maximum(mag, 0.0), gamma)
    e0 = jnp.sum(jnp.square(mag), axis=axis, keepdims=True)
    e1 = jnp.sum(jnp.square(p), axis=axis, keepdims=True)
    return p * jnp.sqrt(e0 / (e1 + 1e-12))
