"""Diffusion refiner R — generative objective for hole magnitudes.

Motivation (round-3 notes attribution, DESIGN.md addendum): on
onset-dense corpora the L1+GAN regression objective converges to
≈38–39 dB hole-PSNR with every architecture/receptive-field/capacity/
information lever individually refuted and a 58.5 dB oracle-magnitude
ceiling — the binding constraint is the OBJECTIVE FAMILY. This module
is the scope answer: a conditional denoising-diffusion model over the
same compressed magnitude image the regression G predicts, used as a
second-stage refiner (SDEdit-style truncated sampling from G's output)
or as a full generative inpainter (t_start = 1).

Relation to the reference (SURVEY.md §2.1 "Losses"): the reference
trains L1+GAN only; this is an optional extension, off by default —
`--refiner` at eval, `scripts/train_refiner.py` for stage-2 training.

TPU-first design notes:
  * Same NHWC 4x4/stride-2 conv vocabulary as the generator — every
    conv is an MXU matmul at 64..512 channels; no attention needed at
    256x256 (the bottleneck is 16x16x8·ngf).
  * Timestep conditioning via FiLM (per-channel scale/shift from a
    sinusoidal t-embedding MLP). FiLM projections are ZERO-initialized:
    at init the refiner is exactly its unconditioned U-Net, which keeps
    early training stable and costs one (temb, 2C) matmul per block.
  * Continuous time t ∈ [0, 1] with the cosine ᾱ schedule and
    v-prediction (train/diffusion.py) — the well-conditioned target at
    both ends of the schedule, so few-step DDIM refinement (the
    intended serving mode) samples the same parameterization it
    trained on.
  * fp32 params; compute dtype configurable like the other nets.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp
from flax import nnx

from .generator import _norm


@dataclasses.dataclass(frozen=True)
class RefinerConfig:
    # x_t + conditioning (masked_img, mask_img, g_pred, [masked_lo_img]).
    in_channels: int = 4
    out_channels: int = 1          # v-prediction
    ngf: int = 64
    strides: tuple[tuple[int, int], ...] = ((2, 2), (2, 2), (2, 2), (2, 2))
    mults: tuple[int, ...] = (1, 2, 4, 8)
    n_bottleneck: int = 2          # residual FiLM blocks at the bottom
    temb_dim: int = 256
    norm: str = "instance"
    dtype: tp.Any = jnp.float32
    init_type: str = "normal"
    init_gain: float = 0.02


def timestep_embedding(t: jax.Array, dim: int) -> jax.Array:
    """(B,) continuous t in [0, 1] → (B, dim) sinusoidal embedding.

    Frequencies span 1..10^4 like the transformer embedding; t is
    scaled by 1000 so the embedding resolves the fine end of the
    cosine schedule where ᾱ moves fastest.
    """
    half = dim // 2
    freqs = jnp.exp(
        -jnp.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    )
    ang = t.astype(jnp.float32)[:, None] * 1000.0 * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class FiLM(nnx.Module):
    """temb → per-channel (scale, shift); zero-init → identity at init."""

    def __init__(self, temb_dim: int, ch: int, dtype, rngs: nnx.Rngs):
        self.proj = nnx.Linear(
            temb_dim, 2 * ch, dtype=dtype, param_dtype=jnp.float32,
            rngs=rngs, kernel_init=nnx.initializers.zeros_init(),
        )
        self.dtype = dtype

    def __call__(self, h: jax.Array, temb: jax.Array) -> jax.Array:
        ss = self.proj(nnx.silu(temb.astype(self.dtype)))
        scale, shift = jnp.split(ss[:, None, None, :], 2, axis=-1)
        return h * (1.0 + scale) + shift


class RDown(nnx.Module):
    """conv(4x4, stride s) → norm → FiLM(t) → LeakyReLU(0.2)."""

    def __init__(self, cin, cout, stride, norm, temb_dim, dtype,
                 rngs: nnx.Rngs, kernel_init=None):
        kw = {"kernel_init": kernel_init} if kernel_init else {}
        self.conv = nnx.Conv(
            cin, cout, kernel_size=(4, 4), strides=stride, padding="SAME",
            dtype=dtype, param_dtype=jnp.float32, rngs=rngs, **kw,
        )
        self.norm = _norm(norm, cout, dtype, rngs)
        self.film = FiLM(temb_dim, cout, dtype, rngs)

    def __call__(self, x, temb):
        return nnx.leaky_relu(self.film(self.norm(self.conv(x)), temb), 0.2)


class RUp(nnx.Module):
    """deconv(4x4, stride s) → norm → FiLM(t) → ReLU (skip concat by caller)."""

    def __init__(self, cin, cout, stride, norm, temb_dim, dtype,
                 rngs: nnx.Rngs, kernel_init=None):
        kw = {"kernel_init": kernel_init} if kernel_init else {}
        self.conv = nnx.ConvTranspose(
            cin, cout, kernel_size=(4, 4), strides=stride, padding="SAME",
            dtype=dtype, param_dtype=jnp.float32, rngs=rngs, **kw,
        )
        self.norm = _norm(norm, cout, dtype, rngs)
        self.film = FiLM(temb_dim, cout, dtype, rngs)

    def __call__(self, x, temb):
        return nnx.relu(self.film(self.norm(self.conv(x)), temb))


class RBottleneck(nnx.Module):
    """Residual 3x3 conv block with FiLM — x + act(FiLM(norm(conv(x))))."""

    def __init__(self, ch, norm, temb_dim, dtype, rngs: nnx.Rngs,
                 kernel_init=None):
        kw = {"kernel_init": kernel_init} if kernel_init else {}
        self.conv = nnx.Conv(
            ch, ch, kernel_size=(3, 3), padding="SAME", dtype=dtype,
            param_dtype=jnp.float32, rngs=rngs, **kw,
        )
        self.norm = _norm(norm, ch, dtype, rngs)
        self.film = FiLM(temb_dim, ch, dtype, rngs)

    def __call__(self, x, temb):
        return x + nnx.relu(self.film(self.norm(self.conv(x)), temb))


class DiffusionRefiner(nnx.Module):
    """Time-conditioned U-Net: (x_t ‖ cond, t) → v̂.

    Input NHWC (B, bins, frames, in_channels); channel 0 is x_t, the
    rest are conditioning (masked_img, mask, g_pred, ...). Output is
    the v-prediction (linear head, no squashing — v is unbounded).
    """

    def __init__(self, cfg: RefinerConfig, rngs: nnx.Rngs):
        from .initializers import kernel_init_for

        self.cfg = cfg
        dt, norm, td = cfg.dtype, cfg.norm, cfg.temb_dim
        kinit = kernel_init_for(cfg.init_type, cfg.init_gain)
        self.temb_in = nnx.Linear(td, td, dtype=dt, param_dtype=jnp.float32,
                                  rngs=rngs, **{"kernel_init": kinit})
        self.temb_out = nnx.Linear(td, td, dtype=dt, param_dtype=jnp.float32,
                                   rngs=rngs, **{"kernel_init": kinit})
        chans = [cfg.in_channels] + [m * cfg.ngf for m in cfg.mults]
        self.downs = nnx.List([])
        for i, s in enumerate(cfg.strides):
            self.downs.append(RDown(
                chans[i], chans[i + 1], s, "none" if i == 0 else norm,
                td, dt, rngs, kernel_init=kinit,
            ))
        bott = chans[-1]
        self.mid = nnx.List([])
        for _ in range(cfg.n_bottleneck):
            self.mid.append(RBottleneck(bott, norm, td, dt, rngs,
                                        kernel_init=kinit))
        self.ups = nnx.List([])
        up_in = bott
        for i, s in reversed(list(enumerate(cfg.strides))):
            cout = chans[i] if i > 0 else cfg.ngf
            self.ups.append(RUp(up_in, cout, s, norm, td, dt, rngs,
                                kernel_init=kinit))
            up_in = cout + chans[i] if i > 0 else cout
        self.head = nnx.Conv(
            cfg.ngf + cfg.in_channels, cfg.out_channels, kernel_size=(3, 3),
            padding="SAME", dtype=dt, param_dtype=jnp.float32, rngs=rngs,
            kernel_init=nnx.initializers.zeros_init(),
        )

    def __call__(self, x: jax.Array, t: jax.Array) -> jax.Array:
        cfg = self.cfg
        x0 = x.astype(cfg.dtype)
        temb = timestep_embedding(t, cfg.temb_dim).astype(cfg.dtype)
        temb = self.temb_out(nnx.silu(self.temb_in(temb)))
        h = x0
        skips = []
        for blk in self.downs:
            skips.append(h)
            h = blk(h, temb)
        for blk in self.mid:
            h = blk(h, temb)
        for i, blk in enumerate(self.ups):
            h = blk(h, temb)
            h = jnp.concatenate([h, skips[len(self.ups) - 1 - i]], axis=-1)
        return self.head(h).astype(jnp.float32)


def define_R(in_channels: int, ngf: int = 64, norm: str = "instance",
             dtype=jnp.float32, seed: int = 0, init_type: str = "normal",
             init_gain: float = 0.02,
             out_channels: int = 1) -> DiffusionRefiner:
    """out_channels=1: magnitude-domain v̂; 2: complex-domain (re, im)
    v̂ for the round-4 long-gap phase refiner (train/diffusion.py)."""
    cfg = RefinerConfig(in_channels=in_channels, ngf=ngf, norm=norm,
                        dtype=dtype, init_type=init_type,
                        init_gain=init_gain, out_channels=out_channels)
    return DiffusionRefiner(cfg, nnx.Rngs(seed))
