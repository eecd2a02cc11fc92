"""Griffin-Lim phase recovery — batched, on-device, HBM-resident.

Reference capability (SURVEY.md §2.1 / §3.5): librosa's CPU per-clip
loop `repeat n_iter: x ← istft(|S|·e^{jφ}); φ ← angle(stft(x))`, which
dominates the reference's test-time latency. Rebuild contract
(BASELINE.json north_star): "iterative on-device STFT/ISTFT loop so
waveform reconstruction never leaves HBM".

Design: phase is carried as a unit-norm (Re, Im) pair — no angle/exp
transcendentals in the loop, only the DFT matmuls (MXU) and a
normalization (VPU). `lax.fori_loop` keeps one compiled iteration body.
Momentum follows librosa.griffinlim (fast Griffin-Lim, momentum=0.99).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .stft import STFTConfig, istft, stft


def _project(mag, re, im, cfg, length):
    """One GL projection: mag∠(re,im) → wav → STFT → new (re, im)."""
    wav = istft(mag * re, mag * im, cfg, length=length)
    return stft(wav, cfg)


def _unit(re, im, eps=1e-16):
    inv = jax.lax.rsqrt(re * re + im * im + eps)
    return re * inv, im * inv


@functools.partial(
    jax.jit, static_argnames=("cfg", "n_iter", "length", "momentum")
)
def griffin_lim(
    mag: jax.Array,
    cfg: STFTConfig,
    n_iter: int = 32,
    length: int | None = None,
    momentum: float = 0.99,
    key: jax.Array | None = None,
) -> jax.Array:
    """(..., F, n_bins) magnitude → (..., T) waveform.

    `mag` has frames on axis -2 (the stft() layout). Zero-phase init by
    default; pass `key` for random phase init (librosa `init='random'`).
    """
    mag = mag.astype(jnp.float32)
    if key is None:
        re = jnp.ones_like(mag)
        im = jnp.zeros_like(mag)
    else:
        ang = jax.random.uniform(key, mag.shape, jnp.float32, 0.0, 2.0 * jnp.pi)
        re, im = jnp.cos(ang), jnp.sin(ang)

    def body(_, state):
        re, im, pre, pim = state
        nre, nim = _project(mag, re, im, cfg, length)
        # librosa.griffinlim fast-GL update:
        #   angles = rebuilt − (m / (1+m)) · rebuilt_prev, renormalized.
        beta = momentum / (1.0 + momentum)
        are = nre - beta * pre
        aim = nim - beta * pim
        ure, uim = _unit(are, aim)
        return ure, uim, nre, nim

    zero = jnp.zeros_like(mag)
    re, im, _, _ = jax.lax.fori_loop(
        0, n_iter, body, (re, im, zero, zero)
    )
    return istft(mag * re, mag * im, cfg, length=length)
