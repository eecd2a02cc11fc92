"""Pallas Griffin-Lim: the full iteration loop resident in VMEM.

Reference capability (SURVEY.md §3.5): librosa's CPU per-clip GL loop,
the reference's test-time bottleneck. BASELINE.json north_star:
"Griffin-Lim phase recovery rewritten as an iterative on-device
STFT/ISTFT Pallas loop so waveform reconstruction never leaves HBM".

This kernel goes further than the jnp version (griffin_lim.py, which
XLA already keeps on-device): ALL per-clip state — magnitude, phase,
frame buffers, the waveform — lives in VMEM across every iteration, so
the only HBM traffic for a whole 32-iteration reconstruction is one
read of the magnitude and one write of the waveform. DFT/iDFT are
dense-basis matmuls on the MXU (with the Hann window FOLDED INTO the
bases — no separate window passes); framing/overlap-add are VMEM
dynamic-slice row ops; reflect-padding is reproduced via anti-diagonal
reversal matmuls; one clip per grid program.

Kernel evolution, kept honest by TPU measurements
(scripts/tpu_results.jsonl; XLA-ops GL baseline: 125 ms / 128 clips):
  v1: per-frame fori_loop OLA/framing        →  94.8 ms / 128 clips
  v2: K chunked block RMWs (misaligned rows) → 110.2 ms — sublane-shift
      relayouts cost more than the loop they replaced; reverted
  v3: OLA/framing as shift-matrix MXU matmuls → Mosaic compile did not
      terminate in 40 min; abandoned (see git history for the kernel)
  v4 (this): v1 structure + window folded into the DFT bases.

Semantics match griffin_lim.py exactly (librosa fast-GL): momentum
m/(1+m), window-sum-square normalization, zero-phase init.
"""

from __future__ import annotations

import functools

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
    clips_per_block: int = 2,
    matmul_dtype=jnp.float32,
    observed: tuple[jax.Array, jax.Array, jax.Array] | None = None,
    ola_mode: str = "chain",
) -> jax.Array:
    """(B, F, n_bins) magnitude → (B, length) waveform. Zero-phase init.

    Requires cfg.center=True and length == hop·(F−1) − 2·(n_fft//2)
    + n_fft (the exact inverse length), the shape produced by
    stft(wav, cfg) on fixed-size clips — i.e. the serving path.

    clips_per_block (CB) processes several clips per grid program: the
    per-frame OLA/framing loops then move (CB, n_fft) slabs per step,
    amortizing loop overhead across clips (~8 MB VMEM at CB=2).

    matmul_dtype=jnp.bfloat16 runs the DFT matmuls with bf16 operands
    (fp32 accumulation, fp32 phase state) — faster MXU passes at a
    small spectral-convergence cost; fp32 is the parity default.

    `observed=(fmask, re_in, im_in)` enables phase-aware inpainting GL
    (see signal/griffin_lim.py): observed bins are synthesized from
    their known complex STFT verbatim and only the hole's phase is
    recovered. Pre-folded outside the kernel into a hole-masked
    magnitude plus an additive (obs_re, obs_im) pair — inside the loop
    it costs one extra VPU add per projection, no new matmuls.

    ola_mode: "chain" = the v4 per-frame read-modify-write loop;
    "split" = v6: K=ceil(n_fft/hop) accumulators where accumulator k
    takes frames k, k+K, k+2K, ... — within an accumulator the write
    regions are DISJOINT (stride K·hop ≥ n_fft), so overlap-add
    becomes pure stores with no serial RMW chain, plus one K-way VPU
    sum at the end. Attacks the structural floor identified in round 1
    (BENCHMARKS.md: the OLA RMW chain, 45 ms / 128 clips).
    """
    assert cfg.center, "pallas GL implements the center=True layout"
    B0, F, n_bins = mag.shape
    mag = mag.astype(jnp.float32)
    if observed is not None:
        fmask, re_in, im_in = observed
        fmask = jnp.broadcast_to(
            fmask.astype(jnp.float32), mag.shape
        )
        obs_re = fmask * re_in.astype(jnp.float32)
        obs_im = fmask * im_in.astype(jnp.float32)
        mag = (1.0 - fmask) * mag
    CB = max(min(clips_per_block, B0), 1)
    if B0 % CB:
        padb = CB - B0 % CB
        zpad = jnp.zeros((padb, F, n_bins), jnp.float32)
        mag = jnp.concatenate([mag, zpad], axis=0)
        if observed is not None:
            obs_re = jnp.concatenate([obs_re, zpad], axis=0)
            obs_im = jnp.concatenate([obs_im, zpad], axis=0)
    B = mag.shape[0]
    use_obs = observed is not None
    N = cfg.n_fft
    hop = cfg.hop_length
    pad = N // 2
    total = hop * (F - 1) + N          # OLA output length (= padded wav)
    T = total - 2 * pad                # trimmed waveform length
    if length is None:
        length = T
    assert length == T, f"length must be {T} for this frame count"
    beta = momentum / (1.0 + momentum)

    # Host-precomputed constants; the Hann window is folded into both
    # basis matrices (istft applies win per output sample = per column;
    # stft applies win per input sample = per row).
    win = _padded_window(cfg)                         # (N,)
    cos_b, sin_b = _dft_bases(N)                      # (N, n_bins)
    icos, isin = _idft_bases(N)                       # (n_bins, N)
    cosw = (win[:, None] * cos_b).astype(np.float32)
    sinw = (win[:, None] * sin_b).astype(np.float32)
    icosw = (icos * win[None, :]).astype(np.float32)
    isinw = (isin * win[None, :]).astype(np.float32)
    w2 = win.astype(np.float64) ** 2
    env = np.zeros(total, np.float64)
    for f in range(F):
        env[f * hop : f * hop + N] += w2
    inv_env = (1.0 / np.maximum(env, 1e-10)).astype(np.float32)
    Jpad = _round_up(pad, 128)
    assert pad + 1 + Jpad <= total, "clip too short for reflect windows"
    J_left = _reversal_matrix(pad, Jpad, end_aligned=False)
    J_right = _reversal_matrix(pad, Jpad, end_aligned=True)

    mm_dt = matmul_dtype

    use_split = ola_mode == "split"
    K_ola = -(-N // hop)                   # disjoint-write accumulators

    def kernel(*refs):
        acc_s = None
        if use_split:
            refs, acc_s = refs[:-1], refs[-1]
        if use_obs:
            (mag_ref, obsre_ref, obsim_ref, cosw_ref, sinw_ref,
             icosw_ref, isinw_ref, env_ref, jl_ref, jr_ref, out_ref,
             re_s, im_s, pre_s, pim_s, fr_s, wav_s) = refs
        else:
            (mag_ref, cosw_ref, sinw_ref, icosw_ref, isinw_ref,
             env_ref, jl_ref, jr_ref, out_ref, re_s, im_s, pre_s,
             pim_s, fr_s, wav_s) = refs
        magv = mag_ref[:]                             # (CB, F, n_bins)
        re_s[:] = jnp.ones_like(magv)                 # zero phase: e^{i0}
        im_s[:] = jnp.zeros_like(magv)
        pre_s[:] = jnp.zeros_like(magv)
        pim_s[:] = jnp.zeros_like(magv)

        def istft_to_wav():
            """(re_s, im_s) phase + mag → normalized padded wav in wav_s."""
            sre = magv * re_s[:]
            sim = magv * im_s[:]
            if use_obs:
                sre = sre + obsre_ref[:]
                sim = sim + obsim_ref[:]
            xre = sre.reshape(CB * F, n_bins).astype(mm_dt)
            xim = sim.reshape(CB * F, n_bins).astype(mm_dt)
            fr_s[:] = (
                jnp.dot(xre, icosw_ref[:],
                        preferred_element_type=jnp.float32)
                + jnp.dot(xim, isinw_ref[:],
                          preferred_element_type=jnp.float32)
            ).reshape(CB, F, N)
            if use_split:
                # v6: accumulator k gets frames k, k+K, ... — strides
                # K·hop ≥ n_fft keep each accumulator's writes disjoint,
                # so OLA is pure stores (no serial read-modify-write).
                acc_s[:] = jnp.zeros_like(acc_s)
                nj = -(-F // K_ola)

                def ola_body(j, _):
                    for k in range(K_ola):            # unrolled
                        f = j * K_ola + k

                        @pl.when(f < F)
                        def _():
                            acc_s[k, :, pl.ds(f * hop, N)] = fr_s[:, f, :]
                    return 0

                jax.lax.fori_loop(0, nj, ola_body, 0)
                acc = acc_s[0]
                for k in range(1, K_ola):
                    acc = acc + acc_s[k]
                wav_s[:] = acc * env_ref[:]           # env_ref is 1/env
            else:
                wav_s[:] = jnp.zeros_like(wav_s)

                def ola_body(f, _):
                    seg = wav_s[:, pl.ds(f * hop, N)]
                    wav_s[:, pl.ds(f * hop, N)] = seg + fr_s[:, f, :]
                    return 0

                jax.lax.fori_loop(0, F, ola_body, 0)
                wav_s[:] = wav_s[:] * env_ref[:]      # env_ref is 1/env

        def project():
            """wav_s (padded layout) → new (re, im) into pre_s/pim_s."""
            # librosa trims pad then reflect-pads again; reproduce the
            # edge correction with reversal matmuls (batched over CB).
            # J_left: (v @ J)[k] = v[pad-1-k] for k < pad.
            lsrc = wav_s[:, pad + 1 : pad + 1 + Jpad]
            lrev = jnp.dot(lsrc, jl_ref[:],
                           preferred_element_type=jnp.float32)
            # lrev[c, k] = wav[c, 2p-k] — reflected value for out[c, k].
            wav_s[:, 0:pad] = lrev[:, 0:pad]
            # J_right: (v @ J)[k] = v[Jpad-1-k] for k < pad, with the
            # source window end-anchored at total-pad-1.
            rsrc = wav_s[:, total - pad - 1 - Jpad : total - pad - 1]
            rrev = jnp.dot(rsrc, jr_ref[:],
                           preferred_element_type=jnp.float32)
            # rrev[c, k] = wav[c, total-p-2-k] → out[c, total-p+k].
            wav_s[:, total - pad : total] = rrev[:, 0:pad]

            def frame_body(f, _):
                fr_s[:, f, :] = wav_s[:, pl.ds(f * hop, N)]
                return 0

            jax.lax.fori_loop(0, F, frame_body, 0)
            xf = fr_s[:].reshape(CB * F, N).astype(mm_dt)
            pre_s[:] = jnp.dot(xf, cosw_ref[:],
                               preferred_element_type=jnp.float32
                               ).reshape(CB, F, n_bins)
            pim_s[:] = jnp.dot(xf, sinw_ref[:],
                               preferred_element_type=jnp.float32
                               ).reshape(CB, F, n_bins)

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
        out_ref[:, 0, :] = wav_s[:, pad : pad + T]

    clip_spec = pl.BlockSpec((CB, F, n_bins), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [clip_spec]
    if use_obs:
        in_specs += [clip_spec, clip_spec]
    in_specs += [
        pl.BlockSpec((N, n_bins), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((N, n_bins), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_bins, N), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_bins, N), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, total), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Jpad, Jpad), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Jpad, Jpad), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    # Output is (B, 1, T) so each block's trailing two dims equal the
    # array dims (TPU block-shape rule); squeezed on return.
    out_specs = pl.BlockSpec((CB, 1, T), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)

    operands = [mag]
    if use_obs:
        operands += [obs_re, obs_im]
    operands += [
        jnp.asarray(cosw, matmul_dtype), jnp.asarray(sinw, matmul_dtype),
        jnp.asarray(icosw, matmul_dtype), jnp.asarray(isinw, matmul_dtype),
        jnp.asarray(inv_env).reshape(1, total),
        jnp.asarray(J_left),
        jnp.asarray(J_right),
    ]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 1, T), jnp.float32),
        grid=(B // CB,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((CB, F, n_bins), jnp.float32),  # re
            pltpu.VMEM((CB, F, n_bins), jnp.float32),  # im
            pltpu.VMEM((CB, F, n_bins), jnp.float32),  # prev rebuilt re
            pltpu.VMEM((CB, F, n_bins), jnp.float32),  # prev rebuilt im
            pltpu.VMEM((CB, F, N), jnp.float32),       # frame buffer
            pltpu.VMEM((CB, total), jnp.float32),      # waveform buffer
        ] + (
            [pltpu.VMEM((K_ola, CB, total), jnp.float32)]  # split OLA acc
            if use_split else []
        ),
        interpret=interpret,
    )(*operands)
    return out.reshape(B, T)[:B0]
