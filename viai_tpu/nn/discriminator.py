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

    def __call__(self, x: jax.Array, return_features: bool = False):
        """Patch logits; with return_features, also the per-layer
        post-activation feature maps (for feature-matching loss)."""
        h = x.astype(self.cfg.dtype)
        feats = []
        for conv, norm in zip(self.convs, self.norms):
            h = conv(h)
            if norm is not None:
                h = norm(h)
            h = nnx.leaky_relu(h, 0.2)
            feats.append(h)
        logits = self.head(h).astype(jnp.float32)
        if return_features:
            return logits, feats
        return logits


class MultiScaleDiscriminator(nnx.Module):
    """num_D PatchDiscriminators over a 2× average-pooled pyramid.

    The pix2pixHD / MelGAN multi-scale recipe: D_0 sees the input at
    full resolution, D_i sees it avg-pooled i times (window 3,
    stride 2 — the pix2pixHD downsampler). Coarser scales widen the
    effective receptive field without deepening any single net, so the
    ensemble judges both local texture (comb sharpness) and longer
    structure (onset spacing) — an objective-family lever for
    onset-dense corpora (quality_results.jsonl
    notes_grid_attribution_corrected).

    Returns a LIST of per-scale patch logits (losses.gan_loss /
    generator_gan_loss average over it); with return_features, also the
    flat concatenation of every scale's per-layer features, directly
    consumable by losses.feature_matching_loss.

    TPU notes: each scale is an independent stack of stride-2 4x4 convs
    (MXU-friendly); XLA schedules the scales' convs concurrently since
    they share no data dependencies beyond the pooled input.
    """

    def __init__(self, cfg: DiscriminatorConfig, num_D: int,
                 rngs: nnx.Rngs):
        assert num_D >= 1
        self.cfg = cfg              # pool sizing reads .cfg.in_channels
        self.num_D = num_D
        self.nets = nnx.List(
            [PatchDiscriminator(cfg, rngs) for _ in range(num_D)]
        )

    def __call__(self, x: jax.Array, return_features: bool = False):
        h = x
        logits, feats = [], []
        for i, net in enumerate(self.nets):
            if i > 0:
                h = nnx.avg_pool(h, (3, 3), strides=(2, 2), padding="SAME")
            if return_features:
                lg, fs = net(h, return_features=True)
                feats.extend(fs)
            else:
                lg = net(h)
            logits.append(lg)
        if return_features:
            return logits, feats
        return logits
