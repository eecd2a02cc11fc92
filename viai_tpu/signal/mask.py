"""Inpainting mask generation — on-device, static shapes.

Reference capability (SURVEY.md §2.1): the dataset __getitem__ samples
random time-gap masks on CPU; the long-gap config [B:9] uses larger
masks. Here masks are generated inside jit from a jax.random key so the
whole preprocessing chain stays on device, with static spectrogram
shapes (no data-dependent shapes — the gap is expressed as a boolean
column mask built by index comparison).

Mask convention: 1.0 = KEEP (observed), 0.0 = HOLE (to inpaint),
matching image-inpainting conventions; `apply_mask` zeroes the hole.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MaskConfig:
    """Gap sampling parameters, in spectrogram frames (time axis)."""

    min_gap_frames: int = 25    # ~0.2 s at hop 128 / 16 kHz
    max_gap_frames: int = 50    # ~0.4 s
    num_gaps: int = 1           # >1 → multiple disjointly-sampled gaps
    # Pin the gap START to a constant frame (gap length still sampled
    # in [min, max]); None = random position. Used by corpora whose
    # ground TRUTH depends on the hole location (e.g. the audio-
    # ambiguous 'av_cue' corpus, where the instrument-dropout event the
    # model must reconstruct lives at a known clip position and the
    # mask must cover it).
    fixed_start: int | None = None


def sample_time_mask(
    key: jax.Array, n_frames: int, cfg: MaskConfig
) -> jax.Array:
    """→ (n_frames,) float mask; 0 inside sampled gap(s), 1 elsewhere."""
    mask = jnp.ones((n_frames,), jnp.float32)
    keys = jax.random.split(key, cfg.num_gaps)
    t = jnp.arange(n_frames)
    for g in range(cfg.num_gaps):
        klen, kpos = jax.random.split(keys[g])
        gap = jax.random.randint(
            klen, (), cfg.min_gap_frames, cfg.max_gap_frames + 1
        )
        if cfg.fixed_start is not None:
            start = jnp.asarray(cfg.fixed_start)
        else:
            start = jax.random.randint(
                kpos, (), 0, jnp.maximum(n_frames - gap, 1)
            )
        mask = mask * jnp.where((t >= start) & (t < start + gap), 0.0, 1.0)
    return mask


def sample_batch_masks(
    key: jax.Array, batch: int, n_frames: int, cfg: MaskConfig
) -> jax.Array:
    """→ (batch, n_frames) float masks, one independent gap set per item."""
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: sample_time_mask(k, n_frames, cfg))(keys)


def apply_mask(spec: jax.Array, time_mask: jax.Array) -> jax.Array:
    """spec (..., n_bins, n_frames) × mask (..., n_frames) → masked spec."""
    return spec * time_mask[..., None, :]


def expand_to_image(time_mask: jax.Array, n_bins: int) -> jax.Array:
    """(..., n_frames) → (..., n_bins, n_frames) full-image mask channel."""
    return jnp.broadcast_to(
        time_mask[..., None, :],
        (*time_mask.shape[:-1], n_bins, time_mask.shape[-1]),
    )
