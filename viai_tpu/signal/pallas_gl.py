"""Pallas Griffin-Lim: the full iteration loop resident in VMEM.

Reference capability (SURVEY.md §3.5): librosa's CPU per-clip GL loop,
the reference's test-time bottleneck. BASELINE.json north_star:
"Griffin-Lim phase recovery rewritten as an iterative on-device
STFT/ISTFT Pallas loop so waveform reconstruction never leaves HBM".

This kernel goes further than the jnp version (griffin_lim.py, which
XLA already keeps on-device): ALL per-clip state — magnitude, phase,
frame buffers, the waveform — lives in VMEM across every iteration, so
the only HBM traffic for a whole 32-iteration reconstruction is one
read of the magnitude and one write of the waveform.

Kernel layout decisions (v2):
  * DFT/iDFT are dense-basis matmuls on the MXU, with frames padded to
    Npad = ceil(n_fft/hop)*hop columns (zero window/zero basis tail).
  * The waveform lives as a 2D (rows, hop) buffer. Overlap-add and
    framing are then K = Npad/hop STATIC block operations
    (wav2d[c:c+F] += frames[:, c*hop:(c+1)*hop]) instead of F
    sequential per-frame row ops — pure wide VPU work. (v1 looped all
    F frames per iteration; this was the kernel's bottleneck.)
  * librosa's trim+reflect-pad between iterations is reproduced
    in-kernel: edge rows are copied into a small flat scratch, the
    reflection is computed as an anti-diagonal reversal MATMUL
    (lane-reversal-free), and the rows are written back.
  * Grid = one clip per program; per-clip VMEM ~= 3 MB.

Semantics match griffin_lim.py exactly (librosa fast-GL): momentum
m/(1+m), window-sum-square normalization, zero-phase init.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stft import STFTConfig, _dft_bases, _idft_bases, _padded_window


@functools.lru_cache(maxsize=8)
def _reversal_matrix(n: int, padded: int, end_aligned: bool) -> np.ndarray:
    """Anti-diagonal (padded, padded) selector for vector reversal on MXU.

    start-aligned (end_aligned=False): (v @ J)[k] = v[n-1-k] for k < n.
    end-aligned  (end_aligned=True):   (v @ J)[k] = v[padded-1-k] for k < n.
    """
    J = np.zeros((padded, padded), np.float32)
    for k in range(n):
        i = (padded - 1 - k) if end_aligned else (n - 1 - k)
        J[i, k] = 1.0
    return J


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def griffin_lim_pallas(
    mag: jax.Array,
    cfg: STFTConfig,
    n_iter: int = 32,
    length: int | None = None,
    momentum: float = 0.99,
    interpret: bool = False,
) -> jax.Array:
    """(B, F, n_bins) magnitude → (B, length) waveform. Zero-phase init.

    Requires cfg.center=True and length == hop·(F−1) − 2·(n_fft//2)
    + n_fft (the exact inverse length), the shape produced by
    stft(wav, cfg) on fixed-size clips — i.e. the serving path.
    """
    assert cfg.center, "pallas GL implements the center=True layout"
    B, F, n_bins = mag.shape
    N = cfg.n_fft
    hop = cfg.hop_length
    pad = N // 2
    total = hop * (F - 1) + N          # true OLA output length
    T = total - 2 * pad                # trimmed waveform length
    if length is None:
        length = T
    assert length == T, f"length must be {T} for this frame count"
    beta = momentum / (1.0 + momentum)

    K = math.ceil(N / hop)             # frames overlapping any sample
    Npad = K * hop                     # frame width padded to hop grid
    n_rows = F + K - 1                 # wav2d rows; n_rows*hop >= total
    total_pad = n_rows * hop

    # Host-precomputed constants (HBM->VMEM inputs), padded to Npad.
    cos_b, sin_b = _dft_bases(N)                      # (N, n_bins)
    icos, isin = _idft_bases(N)                       # (n_bins, N)
    cos_p = np.zeros((Npad, n_bins), np.float32)
    sin_p = np.zeros((Npad, n_bins), np.float32)
    cos_p[:N], sin_p[:N] = cos_b, sin_b
    icos_p = np.zeros((n_bins, Npad), np.float32)
    isin_p = np.zeros((n_bins, Npad), np.float32)
    icos_p[:, :N], isin_p[:, :N] = icos, isin
    win = np.zeros(Npad, np.float32)
    win[:N] = _padded_window(cfg)
    w2 = win.astype(np.float64) ** 2
    env = np.zeros(total_pad, np.float64)
    for f in range(F):
        env[f * hop : f * hop + Npad] += w2
    inv_env = (1.0 / np.maximum(env, 1e-10)).astype(np.float32)
    inv_env2d = inv_env.reshape(n_rows, hop)

    Jpad = _round_up(pad, 128)
    assert pad + 1 + Jpad <= total, "clip too short for reflect windows"
    J_left = _reversal_matrix(pad, Jpad, end_aligned=False)
    J_right = _reversal_matrix(pad, Jpad, end_aligned=True)

    # Edge-scratch geometry (static): rows are staged into a flat buffer
    # so the reflection matmuls can address contiguous lanes.
    lrows = math.ceil((pad + 1 + Jpad) / hop)        # rows for left edge
    r_src_lo = (total - pad - 1 - Jpad) // hop       # first row, right edge
    r_rows = n_rows - r_src_lo
    r_base = r_src_lo * hop                          # flat offset of row 0'
    out_rows = math.ceil((pad + T) / hop)            # rows holding output
    ewidth = max(lrows, r_rows, out_rows) * hop      # one shared scratch

    def kernel(mag_ref, cos_ref, sin_ref, icos_ref, isin_ref, win_ref,
               env_ref, jl_ref, jr_ref, out_ref, re_s, im_s, pre_s,
               pim_s, fr_s, wav_s, edge_s):
        magv = mag_ref[0]                             # (F, n_bins)
        re_s[:] = jnp.ones_like(magv)                 # zero phase: e^{i0}
        im_s[:] = jnp.zeros_like(magv)
        pre_s[:] = jnp.zeros_like(magv)
        pim_s[:] = jnp.zeros_like(magv)
        winv = win_ref[0]                             # (Npad,)

        def istft_to_wav():
            """(re_s, im_s) phase + mag → normalized wav2d in wav_s."""
            fr_s[:] = (
                jnp.dot(magv * re_s[:], icos_ref[:],
                        preferred_element_type=jnp.float32)
                + jnp.dot(magv * im_s[:], isin_ref[:],
                          preferred_element_type=jnp.float32)
            ) * winv[None, :]
            # Chunked overlap-add: K static block read-modify-writes on
            # the scratch ref (scatter-add is not lowerable in Mosaic).
            wav_s[:] = jnp.zeros((n_rows, hop), jnp.float32)
            for c in range(K):
                wav_s[c : c + F, :] = (
                    wav_s[c : c + F, :] + fr_s[:, c * hop : (c + 1) * hop]
                )
            wav_s[:] = wav_s[:] * env_ref[:]          # env_ref is 1/env

        def project():
            """wav2d → new (re, im) into pre_s/pim_s (reflect + STFT)."""
            # --- left reflect: flat[k] ← flat[2p−k], k in [0, p) ---
            for r in range(lrows):
                edge_s[0, r * hop : (r + 1) * hop] = wav_s[r, :]
            lsrc = edge_s[0, pad + 1 : pad + 1 + Jpad].reshape(1, Jpad)
            lrev = jnp.dot(lsrc, jl_ref[:],
                           preferred_element_type=jnp.float32)
            edge_s[0, 0:pad] = lrev[0, 0:pad]
            for r in range(math.ceil(pad / hop)):
                wav_s[r, :] = edge_s[0, r * hop : (r + 1) * hop]
            # --- right reflect: flat[total−p+k] ← flat[total−p−2−k] ---
            for i in range(r_rows):
                edge_s[0, i * hop : (i + 1) * hop] = wav_s[r_src_lo + i, :]
            rsrc = edge_s[
                0, total - pad - 1 - Jpad - r_base : total - pad - 1 - r_base
            ].reshape(1, Jpad)
            rrev = jnp.dot(rsrc, jr_ref[:],
                           preferred_element_type=jnp.float32)
            edge_s[0, total - pad - r_base : total - r_base] = rrev[0, 0:pad]
            for i in range(r_rows):
                wav_s[r_src_lo + i, :] = edge_s[0, i * hop : (i + 1) * hop]
            # --- chunked framing + window + forward DFT ---
            for c in range(K):
                fr_s[:, c * hop : (c + 1) * hop] = (
                    wav_s[c : c + F, :]
                    * winv[c * hop : (c + 1) * hop][None, :]
                )
            pre_s[:] = jnp.dot(fr_s[:], cos_ref[:],
                               preferred_element_type=jnp.float32)
            pim_s[:] = jnp.dot(fr_s[:], sin_ref[:],
                               preferred_element_type=jnp.float32)

        def body(_, carry):
            istft_to_wav()
            # Momentum uses previous rebuilt (pre_s/pim_s hold it).
            old_re = pre_s[:]
            old_im = pim_s[:]
            project()                                  # writes new rebuilt
            are = pre_s[:] - beta * old_re
            aim = pim_s[:] - beta * old_im
            inv = jax.lax.rsqrt(are * are + aim * aim + 1e-16)
            re_s[:] = are * inv
            im_s[:] = aim * inv
            return carry

        jax.lax.fori_loop(0, n_iter, body, 0)
        istft_to_wav()
        # Emit trimmed waveform: flat[pad : pad+T], staged through the
        # edge scratch because pad is not hop-aligned.
        for r in range(out_rows):
            edge_s[0, r * hop : (r + 1) * hop] = wav_s[r, :]
        out_ref[0, 0, :] = edge_s[0, pad : pad + T]

    in_specs = [
        pl.BlockSpec((1, F, n_bins), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Npad, n_bins), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Npad, n_bins), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_bins, Npad), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_bins, Npad), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Npad), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_rows, hop), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Jpad, Jpad), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Jpad, Jpad), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    # Output is (B, 1, T) so each block's trailing two dims equal the
    # array dims (TPU block-shape rule); squeezed on return.
    out_specs = pl.BlockSpec((1, 1, T), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1, T), jnp.float32),
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((F, n_bins), jnp.float32),   # re
            pltpu.VMEM((F, n_bins), jnp.float32),   # im
            pltpu.VMEM((F, n_bins), jnp.float32),   # prev rebuilt re
            pltpu.VMEM((F, n_bins), jnp.float32),   # prev rebuilt im
            pltpu.VMEM((F, Npad), jnp.float32),     # frame buffer
            pltpu.VMEM((n_rows, hop), jnp.float32),  # waveform (2D rows)
            pltpu.VMEM((1, ewidth), jnp.float32),   # edge/staging scratch
        ],
        interpret=interpret,
    )(
        mag.astype(jnp.float32),
        jnp.asarray(cos_p), jnp.asarray(sin_p),
        jnp.asarray(icos_p), jnp.asarray(isin_p),
        jnp.asarray(win).reshape(1, Npad),
        jnp.asarray(inv_env2d),
        jnp.asarray(J_left),
        jnp.asarray(J_right),
    )
    return out.reshape(B, T)
