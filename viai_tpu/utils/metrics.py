"""Evaluation metrics — spectrogram PSNR + waveform SNR.

Reference capability (SURVEY.md §3.2): test.py computes PSNR on the
inpainted spectrogram and SNR on the Griffin-Lim waveform vs ground
truth [B:2][P]. Pure jnp, jit-able, batch-leading.
"""

from __future__ import annotations

import jax.numpy as jnp


def psnr(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 2.0):
    """Peak SNR in dB. Default range 2.0 = the [-1, 1] image convention."""
    mse = jnp.mean((pred - target) ** 2, axis=tuple(range(1, pred.ndim)))
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def snr(pred: jnp.ndarray, target: jnp.ndarray):
    """Waveform SNR in dB over the batch's trailing axes."""
    axes = tuple(range(1, pred.ndim))
    sig = jnp.sum(target**2, axis=axes)
    err = jnp.sum((pred - target) ** 2, axis=axes)
    return 10.0 * jnp.log10(jnp.maximum(sig, 1e-12) /
                            jnp.maximum(err, 1e-12))


def masked_psnr(pred, target, keep_mask, data_range: float = 2.0):
    """PSNR restricted to the inpainted hole (keep_mask == 0)."""
    hole = 1.0 - keep_mask
    axes = tuple(range(1, pred.ndim))
    mse = jnp.sum(((pred - target) ** 2) * hole, axis=axes) / jnp.maximum(
        jnp.sum(hole, axis=axes), 1.0
    )
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def spectral_convergence(pred_wav, target_wav, stft_cfg):
    """Spectral convergence: ‖|S_pred| − |S_tgt|‖_F / ‖|S_tgt|‖_F.

    The standard Griffin-Lim reconstruction-quality metric (lower is
    better; 0 = magnitudes identical). Complements waveform SNR, which
    punishes phase differences the ear largely ignores.
    """
    from ..signal import stft_magnitude

    mp = stft_magnitude(pred_wav, stft_cfg)
    mt = stft_magnitude(target_wav, stft_cfg)
    axes = tuple(range(1, mp.ndim))
    num = jnp.sqrt(jnp.sum((mp - mt) ** 2, axis=axes))
    den = jnp.sqrt(jnp.sum(mt**2, axis=axes))
    return num / jnp.maximum(den, 1e-12)
