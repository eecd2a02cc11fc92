"""STFT / ISTFT as MXU matmuls — TPU-native signal core.

Reference capability (SURVEY.md §2.1 "STFT/mel/mask preprocessing",
§3.5): librosa.stft / librosa.istft on CPU inside DataLoader workers.
Here the transform runs on-device as two DFT-basis matmuls so that it
fuses into the same XLA program as the generator and Griffin-Lim
(BASELINE.json north_star: "fused XLA/Pallas STFT-mel-mask
preprocessing ... waveform reconstruction never leaves HBM").

Why matmul instead of jnp.fft: frame counts (~128-256) and n_fft
(~512) are tiny; a dense (n_fft, n_bins) DFT basis keeps the work on
the MXU with perfectly static shapes, is exactly librosa-compatible,
and is differentiable for free. FLOP cost is ~0.13 GFLOP per 2 s clip
— noise on a TPU.

Semantics pinned for parity (SURVEY.md §7 "Hard part #1"):
  * center=True → reflect-pad by n_fft//2 (librosa/torch default)
  * periodic Hann window of win_length, zero-centered in n_fft
  * n_fft=510 → exactly 256 = n_fft//2 + 1 frequency bins
  * istft uses window-sum-square normalization (librosa semantics)
Oracle: torch.stft/istft on CPU (tests/test_stft.py).
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class STFTConfig:
    """Static STFT parameters. Hashable → usable as a jit static arg."""

    n_fft: int = 510          # 510 → n_fft//2 + 1 == 256 bins (SURVEY §7.1)
    hop_length: int = 128     # hop 128/256 multi-res (BASELINE.json config 3)
    win_length: int | None = None  # defaults to n_fft
    center: bool = True
    pad_mode: str = "reflect"
    # HIGHEST = full fp32 matmuls (parity/tests); "default" lets the MXU
    # use bf16 passes (fast path; ~1e-3 relative error).
    precision: str = "highest"

    @property
    def win(self) -> int:
        return self.win_length if self.win_length is not None else self.n_fft

    @property
    def n_bins(self) -> int:
        return self.n_fft // 2 + 1

    def num_frames(self, n_samples: int) -> int:
        if self.center:
            return 1 + n_samples // self.hop_length
        return 1 + (n_samples - self.n_fft) // self.hop_length

    @property
    def _precision(self):
        return (
            jax.lax.Precision.HIGHEST
            if self.precision == "highest"
            else jax.lax.Precision.DEFAULT
        )


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann, identical to torch.hann_window / librosa default."""
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))
    return w.astype(dtype)


def _padded_window(cfg: STFTConfig) -> np.ndarray:
    """Window of win_length zero-centered inside n_fft (librosa util.pad_center)."""
    w = hann_window(cfg.win)
    if cfg.win < cfg.n_fft:
        lpad = (cfg.n_fft - cfg.win) // 2
        w = np.pad(w, (lpad, cfg.n_fft - cfg.win - lpad))
    return w


@functools.lru_cache(maxsize=8)
def _dft_bases(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Forward rDFT bases: frames @ cos_b → Re, frames @ sin_b → Im.

    cos_b[n, k] =  cos(2π k n / N);  sin_b[n, k] = -sin(2π k n / N)
    so that S[k] = Σ_n x[n] e^{-2πikn/N} matches np.fft.rfft exactly.
    """
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _idft_bases(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse rDFT bases: Re @ icos + Im @ isin → frames (np.fft.irfft).

    Uses conjugate symmetry: x[n] = (1/N)[X₀ + (−1)ⁿ X_{N/2}
    + Σ_{k=1}^{N/2−1} 2(ReX_k cos(2πkn/N) − ImX_k sin(2πkn/N))].
    Imag parts of DC/Nyquist are discarded, exactly as np.fft.irfft does.
    """
    assert n_fft % 2 == 0, "n_fft must be even"
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins, dtype=np.float64)[:, None]
    n = np.arange(n_fft, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    coef = np.full((n_bins, 1), 2.0 / n_fft)
    coef[0] = coef[-1] = 1.0 / n_fft
    icos = coef * np.cos(ang)
    isin = -coef * np.sin(ang)
    isin[0] = 0.0   # DC imag ignored
    isin[-1] = 0.0  # Nyquist imag ignored
    return icos.astype(np.float32), isin.astype(np.float32)


def frame_signal(x: jax.Array, cfg: STFTConfig) -> jax.Array:
    """(..., T) → (..., F, n_fft) frames, with librosa center padding."""
    if cfg.center:
        pad = cfg.n_fft // 2
        pad_spec = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        x = jnp.pad(x, pad_spec, mode=cfg.pad_mode)
    n_frames = (x.shape[-1] - cfg.n_fft) // cfg.hop_length + 1
    # Gather frames with one strided slice per hop-offset — static shapes,
    # XLA lowers this to cheap reshapes/slices rather than a gather.
    idx = (
        np.arange(n_frames)[:, None] * cfg.hop_length
        + np.arange(cfg.n_fft)[None, :]
    )
    return x[..., idx]


def stft(x: jax.Array, cfg: STFTConfig) -> tuple[jax.Array, jax.Array]:
    """(..., T) float waveform → (Re, Im), each (..., F, n_bins).

    Matches torch.stft(x, n_fft, hop, win, hann, center=True,
    pad_mode='reflect', onesided=True) with frames on the -2 axis.
    """
    frames = frame_signal(x, cfg).astype(jnp.float32)
    w = jnp.asarray(_padded_window(cfg))
    cos_b, sin_b = map(jnp.asarray, _dft_bases(cfg.n_fft))
    fw = frames * w
    prec = cfg._precision
    re = jnp.matmul(fw, cos_b, precision=prec)
    im = jnp.matmul(fw, sin_b, precision=prec)
    return re, im


def stft_magnitude(x: jax.Array, cfg: STFTConfig, eps: float = 1e-9) -> jax.Array:
    re, im = stft(x, cfg)
    return jnp.sqrt(re * re + im * im + eps)


@functools.lru_cache(maxsize=8)
def _window_sumsquare(cfg: STFTConfig, n_frames: int) -> np.ndarray:
    """Σ_f w²[t − f·hop] envelope for ISTFT normalization (librosa)."""
    w2 = _padded_window(cfg) ** 2
    total = cfg.n_fft + cfg.hop_length * (n_frames - 1)
    env = np.zeros(total, dtype=np.float64)
    for f in range(n_frames):
        env[f * cfg.hop_length : f * cfg.hop_length + cfg.n_fft] += w2
    return env.astype(np.float32)


def overlap_add(frames: jax.Array, hop: int) -> jax.Array:
    """(..., F, n_fft) → (..., hop·(F−1) + n_fft) via K static shifted adds.

    K = ceil(n_fft / hop) is small and static, so this is pure VPU work
    with no scatter. Replaces the CPU loop in librosa.istft
    (SURVEY.md §3.5).
    """
    *lead, n_frames, n_fft = frames.shape
    k_chunks = math.ceil(n_fft / hop)
    padded = jnp.pad(
        frames, [(0, 0)] * (frames.ndim - 1) + [(0, k_chunks * hop - n_fft)]
    )
    # (..., F, K, hop): chunk c of frame f lands at output chunk f + c.
    chunks = padded.reshape(*lead, n_frames, k_chunks, hop)
    out_chunks = jnp.zeros((*lead, n_frames + k_chunks - 1, hop), frames.dtype)
    for c in range(k_chunks):
        out_chunks = out_chunks.at[..., c : c + n_frames, :].add(
            chunks[..., :, c, :]
        )
    out = out_chunks.reshape(*lead, (n_frames + k_chunks - 1) * hop)
    return out[..., : hop * (n_frames - 1) + n_fft]


def istft(
    re: jax.Array,
    im: jax.Array,
    cfg: STFTConfig,
    length: int | None = None,
) -> jax.Array:
    """(..., F, n_bins) Re/Im → (..., T) waveform (librosa.istft semantics)."""
    icos, isin = map(jnp.asarray, _idft_bases(cfg.n_fft))
    prec = cfg._precision
    frames = jnp.matmul(re, icos, precision=prec) + jnp.matmul(
        im, isin, precision=prec
    )
    w = jnp.asarray(_padded_window(cfg))
    y = overlap_add(frames * w, cfg.hop_length)
    n_frames = re.shape[-2]
    env = jnp.asarray(_window_sumsquare(cfg, n_frames))
    y = y / jnp.maximum(env, 1e-10)
    if cfg.center:
        y = y[..., cfg.n_fft // 2 :]
        expected = cfg.hop_length * (n_frames - 1) - 2 * (cfg.n_fft // 2) + cfg.n_fft
        if length is None:
            length = expected
    if length is not None:
        y = y[..., :length]
    return y
