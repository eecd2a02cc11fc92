"""PatchGAN discriminator D on spectrograms.

Reference capability (SURVEY.md §2.1 "PatchGAN discriminator D",
[B:9] "full adversarial training with PatchGAN"): N-layer conv patch
discriminator (the pix2pix `NLayerDiscriminator` shape — 70x70
receptive field at n_layers=3).

TPU notes: NHWC, 4x4 stride-2 convs (MXU), InstanceNorm so DP needs no
batch-stat collectives, LeakyReLU(0.2), raw logits out (loss applies
sigmoid/MSE as configured).
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp
from flax import nnx

from .generator import _norm


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    in_channels: int = 1   # spectrogram image (optionally + mask channel)
    ndf: int = 64
    n_layers: int = 3
    norm: str = "instance"
    dtype: tp.Any = jnp.float32
    init_type: str = "normal"   # pix2pix init recipe (nn/initializers.py)
    init_gain: float = 0.02


class PatchDiscriminator(nnx.Module):
    """→ (B, H', W', 1) patch logits."""

    def __init__(self, cfg: DiscriminatorConfig, rngs: nnx.Rngs):
        from .initializers import kernel_init_for

        self.cfg = cfg
        dt = cfg.dtype
        kinit = kernel_init_for(cfg.init_type, cfg.init_gain)
        layers = nnx.List([])
        cin, cout = cfg.in_channels, cfg.ndf
        layers.append(
            nnx.Conv(cin, cout, (4, 4), strides=(2, 2), padding="SAME",
                     dtype=dt, param_dtype=jnp.float32, rngs=rngs,
                     kernel_init=kinit)
        )
        self.norms = nnx.List([_norm('none', 0, dt, rngs)])
        for n in range(1, cfg.n_layers + 1):
            cin = cout
            cout = cfg.ndf * min(2 ** n, 8)
            stride = (2, 2) if n < cfg.n_layers else (1, 1)
            layers.append(
                nnx.Conv(cin, cout, (4, 4), strides=stride, padding="SAME",
                         dtype=dt, param_dtype=jnp.float32, rngs=rngs,
                         kernel_init=kinit)
            )
            self.norms.append(_norm(cfg.norm, cout, dt, rngs))
        self.convs = layers
        self.head = nnx.Conv(
            cout, 1, (4, 4), strides=(1, 1), padding="SAME",
            dtype=dt, param_dtype=jnp.float32, rngs=rngs,
            kernel_init=kinit,
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        h = x.astype(self.cfg.dtype)
        for conv, norm in zip(self.convs, self.norms):
            h = conv(h)
            if norm is not None:
                h = norm(h)
            h = nnx.leaky_relu(h, 0.2)
        return self.head(h).astype(jnp.float32)
