"""3D-conv video feature extractor for the vision-infused branch.

Reference capability (SURVEY.md §2.1 "Video feature extractor",
BASELINE.json north_star: "frame decode + 3D-conv feature extractor +
audio-visual fusion runs on-device"): a 3D conv net over the aligned
frame stack producing a temporal feature sequence matched to the
spectrogram bottleneck time axis.

TPU notes: NDHWC layout (T, H, W, C trailing); 3D convs lower to MXU
contractions in XLA. Spatial dims are collapsed by strides + global
mean pool; temporal dim is resampled to `out_time` (the generator
bottleneck time axis) by average pooling with a static factor or
linear interpolation — all static shapes.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp
from flax import nnx


@dataclasses.dataclass(frozen=True)
class VideoNetConfig:
    in_channels: int = 3
    base: int = 32
    # (t, h, w) strides per level; defaults eat 64x64 frames → 4x4.
    strides: tuple[tuple[int, int, int], ...] = (
        (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)
    )
    mults: tuple[int, ...] = (1, 2, 4, 8)
    out_features: int = 256   # fusion channel width
    out_time: int = 16        # generator bottleneck time axis
    dtype: tp.Any = jnp.float32
    init_type: str = "normal"   # pix2pix init recipe (nn/initializers.py)
    init_gain: float = 0.02


class VideoFeatureNet(nnx.Module):
    """(B, T, H, W, 3) frames → (B, out_time, out_features)."""

    def __init__(self, cfg: VideoNetConfig, rngs: nnx.Rngs):
        from .initializers import kernel_init_for

        self.cfg = cfg
        dt = cfg.dtype
        kinit = kernel_init_for(cfg.init_type, cfg.init_gain)
        chans = [cfg.in_channels] + [m * cfg.base for m in cfg.mults]
        self.convs = nnx.List([])
        self.norms = nnx.List([])
        for i, s in enumerate(cfg.strides):
            self.convs.append(
                nnx.Conv(chans[i], chans[i + 1], (3, 3, 3), strides=s,
                         padding="SAME", dtype=dt, param_dtype=jnp.float32,
                         rngs=rngs, kernel_init=kinit)
            )
            self.norms.append(
                nnx.GroupNorm(num_features=chans[i + 1],
                              num_groups=min(8, chans[i + 1]),
                              dtype=dt, param_dtype=jnp.float32, rngs=rngs)
            )
        self.proj = nnx.Linear(
            chans[-1], cfg.out_features, dtype=dt,
            param_dtype=jnp.float32, rngs=rngs, kernel_init=kinit,
        )

    def __call__(self, frames: jax.Array) -> jax.Array:
        h = frames.astype(self.cfg.dtype)
        for conv, norm in zip(self.convs, self.norms):
            h = nnx.relu(norm(conv(h)))
        # Collapse space: (B, T', H', W', C) → (B, T', C).
        h = h.mean(axis=(2, 3))
        # Resample time to out_time with static-shape linear interpolation.
        h = jax.image.resize(
            h, (h.shape[0], self.cfg.out_time, h.shape[2]), method="linear"
        )
        return self.proj(h).astype(jnp.float32)
