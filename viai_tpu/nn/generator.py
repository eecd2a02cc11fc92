"""Inpainting generator G — U-Net encoder-decoder over spectrograms.

Reference capability (SURVEY.md §2.1 "Inpainting generator G",
BASELINE.json north_star: "conv encoder-decoder inpainting generator"):
a pix2pix-style U-Net on the masked magnitude spectrogram image
(+ mask channel), skip connections, outputting the completed
spectrogram.

TPU-first redesign (NOT a torch translation):
  * NHWC layout (XLA-preferred on TPU), 4x4 convs stride 2 → all conv
    work lands on the MXU with well-tiled channel dims (64..512).
  * ASYMMETRIC strides: frequency is downsampled harder than time
    (freq /64, time /16), so the bottleneck keeps a genuine time axis
    (B, 4, 16, 8·ngf). Vision features fuse there, aligned per time
    step — the paper's fusion concept — instead of pix2pix's 1x1
    bottleneck which would destroy temporal alignment.
  * InstanceNorm (GroupNorm with one channel per group): no cross-chip
    batch-stat sync needed under data parallelism (SURVEY.md §2.2).
  * Optional bf16 compute dtype; params stay fp32.
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp
from flax import nnx


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    in_channels: int = 2        # masked log-mag + mask channel
    out_channels: int = 1
    ngf: int = 64
    # (freq_stride, time_stride) per encoder level, shallow → deep.
    strides: tuple[tuple[int, int], ...] = (
        (2, 2), (2, 2), (2, 2), (2, 2), (2, 1), (2, 1)
    )
    # channel multiplier per level (×ngf), capped at 8 like pix2pix.
    mults: tuple[int, ...] = (1, 2, 4, 8, 8, 8)
    norm: str = "instance"      # instance | batch | none
    dtype: tp.Any = jnp.float32  # compute dtype (bf16 for speed)
    # Decoder upsampling: "deconv" = 4x4 transposed conv (pix2pix
    # parity); "resize" = nearest-resize + 3x3 conv (faster XLA
    # lowering on TPU, no checkerboard artifacts).
    upsample: str = "deconv"
    # pix2pix init recipe (VERDICT.md item #4): normal(0, 0.02) is the
    # reference default; see nn/initializers.py for the full menu.
    init_type: str = "normal"
    init_gain: float = 0.02
    # Decoder dropout in the 3 deepest up-blocks (pix2pix U-Net inner
    # decoder dropout, active unless the reference's --no_dropout).
    # Applied FUNCTIONALLY: only when __call__ receives dropout_key, so
    # inference stays deterministic and no RNG state enters the
    # optimizer-visible param pytree.
    dropout: float = 0.0
    # Temporal dilation rates for residual (1x3) convs at the bottleneck
    # (after fusion). () = off. E.g. (1, 2, 4) spans ±7 bottleneck steps
    # ≈ ±112 input frames — wide enough to see both gap edges of even a
    # long-gap hole, targeting onset placement inside the hole
    # (round-2 VERDICT next-round #2: the notes-corpus limiter).
    bottleneck_dilation: tuple[int, ...] = ()
    # Number of transformer blocks (self-attention + MLP, pre-norm,
    # residual) over the flattened (F, T) bottleneck grid. 0 = off.
    # Motivation (round-3 notes_grid attribution): holes whose content
    # is fully determined by observed long-range structure (a beat
    # grid, a repeating arpeggio) score 9.5 dB WORSE than random holes
    # under a pure conv U-Net — local convolution has no mechanism for
    # content-based copying (find the repetition period, copy the
    # matching observed frames). Self-attention is exactly that
    # mechanism, and at the bottleneck it is nearly free on the MXU:
    # 64 tokens x 512 channels = QKV/out matmuls of (64,512)x(512,512)
    # and a (64,64) score matrix per head.
    bottleneck_attn: int = 0
    attn_heads: int = 8
    # Gated convolutions (DeepFill-v2): every encoder/decoder conv
    # emits 2x channels, split into features and a per-pixel, per-
    # channel soft gate — out = act(norm(feat)) * sigmoid(gate). The
    # inpainting-specific motivation: a vanilla conv treats hole and
    # observed pixels identically (the mask is just another input
    # channel at layer 1); learned gates let every layer re-derive
    # soft validity for its own receptive field, which is the
    # architecture-family lever the round-3 notes attribution matrix
    # never covered. TPU cost: the doubled conv is one bigger MXU
    # matmul + a fused elementwise — no layout or fusion penalty.
    gated: bool = False


class InstanceNorm(nnx.Module):
    """Per-(sample, channel) spatial normalization with affine params.

    Hand-rolled instead of nnx.GroupNorm(groups=C): measured on v5e,
    the GroupNorm lowering costs ~65% of the whole generator forward
    (97 ms vs 33 ms norm-free, batch 128 — scripts/tpu_results.jsonl);
    a plain mean/var over the spatial axes fuses far better.
    Numerics are identical (eps inside the rsqrt, fp32 moments).
    """

    def __init__(self, features: int, dtype, rngs: nnx.Rngs,
                 epsilon: float = 1e-6):
        self.scale = nnx.Param(jnp.ones((features,), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((features,), jnp.float32))
        self.epsilon = epsilon
        self.dtype = dtype

    def __call__(self, x):
        axes = tuple(range(1, x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axes, keepdims=True)
        var = jnp.mean(jnp.square(xf), axes, keepdims=True) - jnp.square(mean)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * self.scale[...] + self.bias[...]
        return y.astype(self.dtype)


class BatchNorm(nnx.Module):
    """Per-channel batch normalization over (N, H, W) — stats-free.

    TPU-native design (VERDICT.md round-1 missing #8, resolving the
    round-1 refusal): inside the jit'd train step the batch axis is a
    GLOBAL logical axis even when sharded over the 'data' mesh axis —
    XLA lowers the jnp.mean to a per-shard reduction + psum over ICI
    automatically, so cross-chip stat sync needs no hand-written
    collectives (tests/test_init_dropout.py pins DP==single-device).

    No running averages are kept: that keeps every state leaf a real
    parameter (no optimizer-state hazard the round-1 refusal cited),
    and it MATCHES the reference's effective inference behavior — the
    pix2pix template's test.py defaults to eval=False, so reference
    BatchNorm uses live batch stats at test time too. The trade-off
    (batch-size-dependent inference, like the reference) is documented
    rather than hidden.
    """

    def __init__(self, features: int, dtype, rngs: nnx.Rngs,
                 epsilon: float = 1e-5):
        self.scale = nnx.Param(jnp.ones((features,), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((features,), jnp.float32))
        self.epsilon = epsilon
        self.dtype = dtype

    def __call__(self, x):
        axes = tuple(range(x.ndim - 1))        # (N, H, W): all but C
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axes, keepdims=True)
        var = jnp.mean(jnp.square(xf), axes, keepdims=True) - jnp.square(mean)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * self.scale[...] + self.bias[...]
        return y.astype(self.dtype)


def _norm(norm: str, features: int, dtype, rngs: nnx.Rngs):
    if norm == "instance":
        return InstanceNorm(features, dtype, rngs)
    if norm == "groupnorm_instance":  # the flax lowering, kept for A/B
        return nnx.GroupNorm(
            num_features=features,
            num_groups=features,
            use_bias=True,
            use_scale=True,
            dtype=dtype,
            param_dtype=jnp.float32,
            rngs=rngs,
        )
    if norm == "batch":
        return BatchNorm(features, dtype, rngs)
    return lambda x: x


class DownBlock(nnx.Module):
    """conv(4x4, stride s) → norm → LeakyReLU(0.2).

    gated=True (DeepFill-v2): the conv emits 2*cout channels; the
    second half is a per-pixel sigmoid gate multiplying the activated
    first half — soft validity propagated layer by layer.
    """

    def __init__(self, cin, cout, stride, norm, dtype, rngs: nnx.Rngs,
                 kernel_init=None, gated: bool = False):
        kw = {"kernel_init": kernel_init} if kernel_init else {}
        self.gated = gated
        self.conv = nnx.Conv(
            cin, 2 * cout if gated else cout, kernel_size=(4, 4),
            strides=stride, padding="SAME",
            dtype=dtype, param_dtype=jnp.float32, rngs=rngs, **kw,
        )
        self.norm = _norm(norm, cout, dtype, rngs)

    def __call__(self, x):
        h = self.conv(x)
        if self.gated:
            feat, gate = jnp.split(h, 2, axis=-1)
            return nnx.leaky_relu(self.norm(feat), 0.2) * nnx.sigmoid(gate)
        return nnx.leaky_relu(self.norm(h), 0.2)


class UpBlock(nnx.Module):
    """Upsample(stride) → norm → ReLU, with skip concat.

    mode="deconv": 4x4 transposed conv. mode="resize": nearest-resize
    then 3x3 conv (equivalent receptive field, TPU-friendlier lowering).
    """

    def __init__(self, cin, cout, stride, norm, dtype, rngs: nnx.Rngs,
                 mode: str = "deconv", kernel_init=None,
                 gated: bool = False):
        self.mode = mode
        self.stride = stride
        self.gated = gated
        c_out_conv = 2 * cout if gated else cout
        kw = {"kernel_init": kernel_init} if kernel_init else {}
        if mode == "resize":
            self.conv = nnx.Conv(
                cin, c_out_conv, kernel_size=(3, 3), padding="SAME",
                dtype=dtype, param_dtype=jnp.float32, rngs=rngs, **kw,
            )
        else:
            self.conv = nnx.ConvTranspose(
                cin, c_out_conv, kernel_size=(4, 4), strides=stride,
                padding="SAME", dtype=dtype, param_dtype=jnp.float32,
                rngs=rngs, **kw,
            )
        self.norm = _norm(norm, cout, dtype, rngs)

    def __call__(self, x):
        if self.mode == "resize":
            b, h, w, c = x.shape
            x = jax.image.resize(
                x, (b, h * self.stride[0], w * self.stride[1], c),
                method="nearest",
            )
        h = self.conv(x)
        if self.gated:
            feat, gate = jnp.split(h, 2, axis=-1)
            return nnx.relu(self.norm(feat)) * nnx.sigmoid(gate)
        return nnx.relu(self.norm(h))


class DilatedTimeBlock(nnx.Module):
    """Residual (1x3) conv dilated along TIME at the bottleneck.

    The encoder's 4x4/stride-2 stack gives the (B, 4, 16, 8·ngf)
    bottleneck only a modest temporal receptive field per position; a
    hole spanning many frames then gets filled from mostly-local
    context, which blurs onset timing. Dilation over the time axis
    widens the field exponentially with depth at negligible FLOPs
    (the (1,3) conv is 8·ngf x 8·ngf x 3 — MXU-friendly). Residual form
    keeps the block identity-initializable-safe for finetuning.
    """

    def __init__(self, ch, dilation, norm, dtype, rngs: nnx.Rngs,
                 kernel_init=None):
        kw = {"kernel_init": kernel_init} if kernel_init else {}
        self.conv = nnx.Conv(
            ch, ch, kernel_size=(1, 3), padding="SAME",
            kernel_dilation=(1, dilation), dtype=dtype,
            param_dtype=jnp.float32, rngs=rngs, **kw,
        )
        self.norm = _norm(norm, ch, dtype, rngs)

    def __call__(self, x):
        return x + nnx.relu(self.norm(self.conv(x)))


class ChannelLayerNorm(nnx.Module):
    """LayerNorm over the channel axis (per sample, per position)."""

    def __init__(self, features: int, dtype, epsilon: float = 1e-6):
        self.scale = nnx.Param(jnp.ones((features,), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((features,), jnp.float32))
        self.epsilon = epsilon
        self.dtype = dtype

    def __call__(self, x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, -1, keepdims=True)
        var = jnp.mean(jnp.square(xf), -1, keepdims=True) - jnp.square(mean)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * self.scale[...] + self.bias[...]).astype(self.dtype)


def _sincos_pos_embed(F: int, T: int, C: int) -> jnp.ndarray:
    """Fixed 2D sinusoidal position embedding, (F*T, C), fp32.

    Half the channels encode the time index, half the frequency index
    (standard transformer sinusoids). Computed from static shapes at
    trace time — no shape-dependent parameters, so the same checkpoint
    loads across bottleneck geometries (e.g. long-gap configs with a
    different n_frames).
    """
    def axis_embed(n: int, dim: int) -> jnp.ndarray:
        pos = jnp.arange(n, dtype=jnp.float32)[:, None]
        half = dim // 2
        freq = jnp.exp(-jnp.log(10000.0) * jnp.arange(half, dtype=jnp.float32)
                       / max(half, 1))
        ang = pos * freq[None, :]
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)

    ct = C // 2
    cf = C - ct
    t_emb = axis_embed(T, ct)                       # (T, ct)
    f_emb = axis_embed(F, cf)                       # (F, cf)
    grid = jnp.concatenate([
        jnp.broadcast_to(t_emb[None, :, :], (F, T, ct)),
        jnp.broadcast_to(f_emb[:, None, :], (F, T, cf)),
    ], axis=-1)
    return grid.reshape(F * T, C)


class AttentionBlock(nnx.Module):
    """Pre-norm transformer block over the flattened bottleneck grid.

    h: (B, F, T, C) → tokens (B, F·T, C) → MHSA → MLP → back to grid,
    both sublayers residual. Output projections are ZERO-initialized so
    the block is an exact identity at init — the GAN training dynamics
    and any pre-attention checkpoint finetune are undisturbed until the
    block learns to contribute. Softmax and moments run in fp32; the
    matmuls ride the MXU in the compute dtype.
    """

    def __init__(self, ch: int, heads: int, dtype, rngs: nnx.Rngs,
                 kernel_init=None):
        assert ch % heads == 0, (ch, heads)
        self.heads = heads
        self.head_dim = ch // heads
        self.dtype = dtype
        kw = {"kernel_init": kernel_init} if kernel_init else {}
        zero = nnx.initializers.zeros_init()
        self.norm1 = ChannelLayerNorm(ch, dtype)
        self.qkv = nnx.Linear(ch, 3 * ch, dtype=dtype,
                              param_dtype=jnp.float32, rngs=rngs, **kw)
        self.proj = nnx.Linear(ch, ch, dtype=dtype, param_dtype=jnp.float32,
                               rngs=rngs, kernel_init=zero)
        self.norm2 = ChannelLayerNorm(ch, dtype)
        self.mlp_in = nnx.Linear(ch, 2 * ch, dtype=dtype,
                                 param_dtype=jnp.float32, rngs=rngs, **kw)
        self.mlp_out = nnx.Linear(2 * ch, ch, dtype=dtype,
                                  param_dtype=jnp.float32, rngs=rngs,
                                  kernel_init=zero)

    def __call__(self, h: jax.Array) -> jax.Array:
        B, F, T, C = h.shape
        x = h.reshape(B, F * T, C)
        pe = _sincos_pos_embed(F, T, C).astype(self.dtype)
        y = self.norm1(x) + pe[None, :, :]
        qkv = self.qkv(y).reshape(B, F * T, 3, self.heads, self.head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        attn = jax.nn.softmax(scores / jnp.sqrt(float(self.head_dim)), -1)
        o = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(self.dtype), v)
        o = o.transpose(0, 2, 1, 3).reshape(B, F * T, C)
        x = x + self.proj(o)
        x = x + self.mlp_out(nnx.gelu(self.mlp_in(self.norm2(x))))
        return x.reshape(B, F, T, C)


class UNetGenerator(nnx.Module):
    """Spectrogram inpainting U-Net; bottleneck exposes a time axis.

    __call__(x) → completed spectrogram image in [-1, 1] (tanh).
    `x` is NHWC: (B, n_bins, n_frames, in_channels).
    `fusion_features`, if given, is (B, T_bottleneck, C_f) and is tiled
    over the frequency axis and concatenated at the bottleneck
    (SURVEY.md §2.1 "Audio-visual fusion").
    """

    def __init__(self, cfg: GeneratorConfig, rngs: nnx.Rngs,
                 fusion_channels: int = 0):
        from .initializers import kernel_init_for

        self.cfg = cfg
        ngf, dt, norm = cfg.ngf, cfg.dtype, cfg.norm
        kinit = kernel_init_for(cfg.init_type, cfg.init_gain)
        chans = [cfg.in_channels] + [m * ngf for m in cfg.mults]
        self.downs = nnx.List([])
        for i, s in enumerate(cfg.strides):
            # First block skips norm (pix2pix convention).
            blk = DownBlock(
                chans[i], chans[i + 1], s,
                "none" if i == 0 else norm, dt, rngs, kernel_init=kinit,
                gated=cfg.gated,
            )
            self.downs.append(blk)
        bott = chans[-1]
        self.fusion_channels = fusion_channels
        if fusion_channels:
            self.fuse = nnx.Conv(
                bott + fusion_channels, bott, kernel_size=(1, 1),
                dtype=dt, param_dtype=jnp.float32, rngs=rngs,
                kernel_init=kinit,
            )
        self.bott_blocks = nnx.List([])
        for d in cfg.bottleneck_dilation:
            self.bott_blocks.append(DilatedTimeBlock(
                bott, d, norm, dt, rngs, kernel_init=kinit,
            ))
        self.attn_blocks = nnx.List([])
        for _ in range(cfg.bottleneck_attn):
            self.attn_blocks.append(AttentionBlock(
                bott, cfg.attn_heads, dt, rngs, kernel_init=kinit,
            ))
        self.ups = nnx.List([])
        up_in = bott
        for i, s in reversed(list(enumerate(cfg.strides))):
            cout = chans[i] if i > 0 else ngf
            self.ups.append(UpBlock(up_in, cout, s, norm, dt, rngs,
                                    mode=cfg.upsample, kernel_init=kinit,
                                    gated=cfg.gated))
            # Next up-block consumes skip concat.
            up_in = cout + chans[i] if i > 0 else cout
        self.head = nnx.Conv(
            ngf + cfg.in_channels, cfg.out_channels, kernel_size=(3, 3),
            padding="SAME", dtype=dt, param_dtype=jnp.float32, rngs=rngs,
            kernel_init=kinit,
        )
        # Dropout in the N deepest decoder blocks (pix2pix applies it to
        # the inner up-blocks); self.ups is ordered deep → shallow.
        self._dropout_blocks = min(3, len(self.ups))

    def __call__(self, x: jax.Array,
                 fusion_features: jax.Array | None = None,
                 dropout_key: jax.Array | None = None) -> jax.Array:
        x0 = x.astype(self.cfg.dtype)
        h = x0
        skips = []
        for blk in self.downs:
            skips.append(h)
            h = blk(h)
        if self.fusion_channels:
            assert fusion_features is not None, "generator built with fusion"
            f = fusion_features.astype(self.cfg.dtype)
            # (B, T, C) → (B, F_bott, T, C): tile along frequency.
            f = jnp.broadcast_to(
                f[:, None, :, :], (f.shape[0], h.shape[1], *f.shape[1:])
            )
            h = self.fuse(jnp.concatenate([h, f], axis=-1))
        for blk in self.bott_blocks:
            h = blk(h)
        for blk in self.attn_blocks:
            h = blk(h)
        use_drop = self.cfg.dropout > 0.0 and dropout_key is not None
        for i, blk in enumerate(self.ups):
            h = blk(h)
            if use_drop and i < self._dropout_blocks:
                keep = 1.0 - self.cfg.dropout
                m = jax.random.bernoulli(
                    jax.random.fold_in(dropout_key, i), keep, h.shape
                )
                h = jnp.where(m, h / keep, 0.0).astype(h.dtype)
            skip = skips[len(self.ups) - 1 - i]
            h = jnp.concatenate([h, skip], axis=-1)
        out = self.head(h)
        return jnp.tanh(out.astype(jnp.float32))
