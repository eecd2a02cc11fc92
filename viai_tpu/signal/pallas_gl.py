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

Kernel evolution (kept honest by TPU measurements, scripts/tpu_results.jsonl):
  v1: per-frame fori_loop OLA/framing        →  94.8 ms / 128 clips
  v2: K chunked block RMWs (misaligned rows) → 110.2 ms (sublane-shift
      relayouts cost more than the loop they replaced)
  v3 (this): EVERYTHING on the MXU —
    * Hann window folded into the DFT bases (zero VPU window passes),
    * overlap-add as ONE matmul with a static 0/1 shift matrix S:
      wav2d(rows, hop) = S @ stack_of_frame_chunks,
    * framing as the transposed matmul S^T @ wav2d,
    * chunk (de)interleaving via 8-sublane-ALIGNED static copies
      (frame count padded to a multiple of 8),
    * reflect-padding as anti-diagonal reversal matmuls.
  The only remaining VPU work per iteration: the 1/env multiply and the
  momentum/phase-normalize — both dense and wide.

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
    F8 = _round_up(F, 8)               # sublane-aligned frame count
    n_rows = F + K - 1                 # true wav2d rows
    n_rows8 = _round_up(n_rows, 8)

    # ---- host-precomputed constants (HBM→VMEM inputs) --------------------
    win = np.zeros(Npad, np.float32)
    win[:N] = _padded_window(cfg)
    cos_b, sin_b = _dft_bases(N)                      # (N, n_bins)
    icos, isin = _idft_bases(N)                       # (n_bins, N)
    # Window folded into the bases: forward uses win*cos per row,
    # inverse applies win per output sample (column).
    cosw = np.zeros((Npad, n_bins), np.float32)
    sinw = np.zeros((Npad, n_bins), np.float32)
    cosw[:N] = win[:N, None] * cos_b
    sinw[:N] = win[:N, None] * sin_b
    icosw = np.zeros((n_bins, Npad), np.float32)
    isinw = np.zeros((n_bins, Npad), np.float32)
    icosw[:, :N] = icos * win[None, :N]
    isinw[:, :N] = isin * win[None, :N]

    # OLA shift matrix: out2d[r] = Σ_{c,f: f+c=r} chunks[c*F8 + f].
    S = np.zeros((n_rows8, K * F8), np.float32)
    for c in range(K):
        for f in range(F):
            S[f + c, c * F8 + f] = 1.0
    St = S.T.copy()                                   # framing matrix

    w2 = win.astype(np.float64) ** 2
    env = np.zeros(n_rows8 * hop, np.float64)
    for f in range(F):
        env[f * hop : f * hop + Npad] += w2
    inv_env2d = (
        (1.0 / np.maximum(env, 1e-10)).astype(np.float32)
        .reshape(n_rows8, hop)
    )

    Jpad = _round_up(pad, 128)
    assert pad + 1 + Jpad <= total, "clip too short for reflect windows"
    J_left = _reversal_matrix(pad, Jpad, end_aligned=False)
    J_right = _reversal_matrix(pad, Jpad, end_aligned=True)

    # Edge staging geometry (static).
    lrows = math.ceil((pad + 1 + Jpad) / hop)
    r_src_lo = (total - pad - 1 - Jpad) // hop
    r_rows = n_rows - r_src_lo
    r_base = r_src_lo * hop
    out_rows = math.ceil((pad + T) / hop)
    ewidth = max(lrows, r_rows, out_rows) * hop

    f32 = jnp.float32

    def kernel(mag_ref, cosw_ref, sinw_ref, icosw_ref, isinw_ref,
               s_ref, st_ref, env_ref, jl_ref, jr_ref, out_ref,
               re_s, im_s, pre_s, pim_s, fr_s, chunk_s, wav_s, edge_s):
        magv = mag_ref[0]                             # (F8, n_bins)
        re_s[:] = jnp.ones_like(magv)                 # zero phase: e^{i0}
        im_s[:] = jnp.zeros_like(magv)
        pre_s[:] = jnp.zeros_like(magv)
        pim_s[:] = jnp.zeros_like(magv)

        def istft_to_wav():
            """(re_s, im_s) phase + mag → normalized wav2d in wav_s."""
            fr_s[:] = (
                jnp.dot(magv * re_s[:], icosw_ref[:],
                        preferred_element_type=f32)
                + jnp.dot(magv * im_s[:], isinw_ref[:],
                          preferred_element_type=f32)
            )
            # Interleave frame chunks (aligned copies), then OLA = S @ C.
            for c in range(K):
                chunk_s[c * F8 : (c + 1) * F8, :] = (
                    fr_s[:, c * hop : (c + 1) * hop]
                )
            wav_s[:] = jnp.dot(
                s_ref[:], chunk_s[:], preferred_element_type=f32
            ) * env_ref[:]

        def project():
            """wav2d → new (re, im) into pre_s/pim_s (reflect + STFT)."""
            # --- left reflect: flat[k] ← flat[2p−k], k in [0, p) ---
            for r in range(lrows):
                edge_s[0, r * hop : (r + 1) * hop] = wav_s[r, :]
            lsrc = edge_s[0, pad + 1 : pad + 1 + Jpad].reshape(1, Jpad)
            lrev = jnp.dot(lsrc, jl_ref[:], preferred_element_type=f32)
            edge_s[0, 0:pad] = lrev[0, 0:pad]
            for r in range(math.ceil(pad / hop)):
                wav_s[r, :] = edge_s[0, r * hop : (r + 1) * hop]
            # --- right reflect: flat[total−p+k] ← flat[total−p−2−k] ---
            for i in range(r_rows):
                edge_s[0, i * hop : (i + 1) * hop] = wav_s[r_src_lo + i, :]
            rsrc = edge_s[
                0, total - pad - 1 - Jpad - r_base : total - pad - 1 - r_base
            ].reshape(1, Jpad)
            rrev = jnp.dot(rsrc, jr_ref[:], preferred_element_type=f32)
            edge_s[0, total - pad - r_base : total - r_base] = rrev[0, 0:pad]
            for i in range(r_rows):
                wav_s[r_src_lo + i, :] = edge_s[0, i * hop : (i + 1) * hop]
            # --- framing = S^T @ wav2d, de-interleave, forward DFT ---
            chunk_s[:] = jnp.dot(
                st_ref[:], wav_s[:], preferred_element_type=f32
            )
            for c in range(K):
                fr_s[:, c * hop : (c + 1) * hop] = (
                    chunk_s[c * F8 : (c + 1) * F8, :]
                )
            pre_s[:] = jnp.dot(fr_s[:], cosw_ref[:],
                               preferred_element_type=f32)
            pim_s[:] = jnp.dot(fr_s[:], sinw_ref[:],
                               preferred_element_type=f32)

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

    full = lambda shape: (lambda b: tuple(0 for _ in shape))  # noqa: E731

    def spec2(shape):
        return pl.BlockSpec(shape, full(shape), memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, F8, n_bins), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        spec2((Npad, n_bins)),       # cosw
        spec2((Npad, n_bins)),       # sinw
        spec2((n_bins, Npad)),       # icosw
        spec2((n_bins, Npad)),       # isinw
        spec2((n_rows8, K * F8)),    # S
        spec2((K * F8, n_rows8)),    # S^T
        spec2((n_rows8, hop)),       # 1/env
        spec2((Jpad, Jpad)),         # J_left
        spec2((Jpad, Jpad)),         # J_right
    ]
    out_specs = pl.BlockSpec((1, 1, T), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)

    mag8 = jnp.pad(mag.astype(jnp.float32), ((0, 0), (0, F8 - F), (0, 0)))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1, T), jnp.float32),
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((F8, n_bins), jnp.float32),    # re
            pltpu.VMEM((F8, n_bins), jnp.float32),    # im
            pltpu.VMEM((F8, n_bins), jnp.float32),    # prev rebuilt re
            pltpu.VMEM((F8, n_bins), jnp.float32),    # prev rebuilt im
            pltpu.VMEM((F8, Npad), jnp.float32),      # frame buffer
            pltpu.VMEM((K * F8, hop), jnp.float32),   # chunk stack
            pltpu.VMEM((n_rows8, hop), jnp.float32),  # waveform (2D rows)
            pltpu.VMEM((1, ewidth), jnp.float32),     # edge/staging
        ],
        interpret=interpret,
    )(
        mag8,
        jnp.asarray(cosw), jnp.asarray(sinw),
        jnp.asarray(icosw), jnp.asarray(isinw),
        jnp.asarray(S), jnp.asarray(St),
        jnp.asarray(inv_env2d),
        jnp.asarray(J_left),
        jnp.asarray(J_right),
    )
    return out.reshape(B, T)
