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

Phase-aware mode (`observed=`): for inpainting, the complex STFT of
the OBSERVED region is already known — only the hole's phase needs
recovery. Passing `observed=(frame_mask, re_in, im_in)` clamps
observed bins to their known complex values on every synthesis
(S = fmask·S_in + (1−fmask)·mag·e^{jφ}), so GL iterates only over the
hole and the observed region reconstructs near-exactly instead of from
zero phase. This is the reference test.py chain's biggest quality
leak (it Griffin-Lims the whole magnitude from scratch); fixing it is
nearly free on device — one extra fused multiply-add per projection.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .stft import STFTConfig, istft, stft


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
    observed: tuple[jax.Array, jax.Array, jax.Array] | None = None,
) -> jax.Array:
    """(..., F, n_bins) magnitude → (..., T) waveform.

    `mag` has frames on axis -2 (the stft() layout). Zero-phase init by
    default; pass `key` for random phase init (librosa `init='random'`).

    `observed`, if given, is `(fmask, re_in, im_in)`:
      * fmask: (..., F, 1) or broadcastable — 1 where the frame is
        observed (complex STFT known), 0 inside the hole.
      * re_in/im_in: the input signal's complex STFT, same shape as mag.
    Observed bins are held verbatim; only hole bins' phase is recovered.
    """
    mag = mag.astype(jnp.float32)
    if observed is not None:
        fmask, re_in, im_in = observed
        fmask = fmask.astype(jnp.float32)
        # Pre-fold: synthesis S = obs + mag_hole · e^{jφ}.
        obs_re = fmask * re_in.astype(jnp.float32)
        obs_im = fmask * im_in.astype(jnp.float32)
        mag = (1.0 - fmask) * mag
    if key is None:
        re = jnp.ones_like(mag)
        im = jnp.zeros_like(mag)
    else:
        ang = jax.random.uniform(key, mag.shape, jnp.float32, 0.0, 2.0 * jnp.pi)
        re, im = jnp.cos(ang), jnp.sin(ang)

    def synth(re, im):
        sre, sim = mag * re, mag * im
        if observed is not None:
            sre = sre + obs_re
            sim = sim + obs_im
        return sre, sim

    def body(_, state):
        re, im, pre, pim = state
        wav = istft(*synth(re, im), cfg, length=length)
        nre, nim = stft(wav, cfg)
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
    return istft(*synth(re, im), cfg, length=length)
