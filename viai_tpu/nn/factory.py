"""Network factories — the reference's `define_G` / `define_D` surface.

Reference capability (SURVEY.md §2.1, L3): pix2pix-style factory
functions keyed by option strings, so CLI options construct networks
without touching model code.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import nnx

from .discriminator import (
    DiscriminatorConfig,
    MultiScaleDiscriminator,
    PatchDiscriminator,
)
from .generator import GeneratorConfig, UNetGenerator
from .video import VideoFeatureNet, VideoNetConfig

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def define_G(
    input_nc: int = 2,
    output_nc: int = 1,
    ngf: int = 64,
    norm: str = "instance",
    dtype: str = "float32",
    fusion_channels: int = 0,
    seed: int = 0,
    upsample: str = "deconv",
    init_type: str = "normal",
    init_gain: float = 0.02,
    dropout: float = 0.0,
    bottleneck_dilation: tuple[int, ...] = (),
    bottleneck_attn: int = 0,
    attn_heads: int = 8,
    gated: bool = False,
) -> UNetGenerator:
    cfg = GeneratorConfig(
        in_channels=input_nc, out_channels=output_nc, ngf=ngf,
        norm=norm, dtype=_DTYPES[dtype], upsample=upsample,
        init_type=init_type, init_gain=init_gain, dropout=dropout,
        bottleneck_dilation=tuple(bottleneck_dilation),
        bottleneck_attn=bottleneck_attn, attn_heads=attn_heads,
        gated=gated,
    )
    return UNetGenerator(cfg, nnx.Rngs(seed), fusion_channels=fusion_channels)


def define_D(
    input_nc: int = 1,
    ndf: int = 64,
    n_layers_D: int = 3,
    norm: str = "instance",
    dtype: str = "float32",
    seed: int = 1,
    init_type: str = "normal",
    init_gain: float = 0.02,
    num_D: int = 1,
):
    """num_D > 1 → pix2pixHD-style multi-scale ensemble (2× avg-pooled
    pyramid); 1 keeps the single PatchGAN (reference default)."""
    cfg = DiscriminatorConfig(
        in_channels=input_nc, ndf=ndf, n_layers=n_layers_D,
        norm=norm, dtype=_DTYPES[dtype],
        init_type=init_type, init_gain=init_gain,
    )
    if num_D > 1:
        return MultiScaleDiscriminator(cfg, num_D, nnx.Rngs(seed))
    return PatchDiscriminator(cfg, nnx.Rngs(seed))


def define_V(
    out_features: int = 256,
    out_time: int = 16,
    base: int = 32,
    dtype: str = "float32",
    seed: int = 2,
    init_type: str = "normal",
    init_gain: float = 0.02,
) -> VideoFeatureNet:
    cfg = VideoNetConfig(
        base=base, out_features=out_features, out_time=out_time,
        dtype=_DTYPES[dtype], init_type=init_type, init_gain=init_gain,
    )
    return VideoFeatureNet(cfg, nnx.Rngs(seed))
