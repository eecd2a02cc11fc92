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
  v4: v1 structure + window folded into the DFT bases
  v6: split-OLA (K disjoint accumulators)    → parity with v4; refuted
      the RMW-chain hypothesis (BENCHMARKS.md round 2)
  v7 (ola_mode="fused"): the OLA→trim→reflect-pad→reframe pipeline is
      one LINEAR operator on the frame array, so both per-frame loops
      vanish: fr'[t, j] = inv_env[t·hop+j] · Σ_d fr[t+d, j − d·hop].
      The frame-axis shifts ride the MXU (per-d 0/1 shift-matrix
      matmuls — sublane-offset slab adds relayout, the v2 lesson), the
      lane-axis shifts are whole-register moves when hop % 128 == 0,
      and the reflect-pad edge correction is two env-scaled selector
      matmuls + one rank-2·n_edge placement matmul (no single-row VMEM
      writes — those alone measured 27 ms/call). No waveform buffer in
      the loop at all; the waveform is synthesized once at the end.
      Measured 40.5 ms vs v4's 55.2 ms / 128 clips GL×32 (+36%).
  v8/v8b (round 3, REFUTED): merge the cos/sin DFT matmuls into
      combined-basis matmuls — v8 one (2·n_bins, NW) synthesis (needs a
      lane concat of the re|im operands) + one (NW, 2·n_bins) analysis;
      v8b the analysis merge alone (no new in-kernel ops, split = lane
      slice). Both passed interpret-mode parity but the TPU Mosaic
      compile DID NOT TERMINATE within 7 min (v7 compiles the same
      tiny shape in ~140 s, same session) — the v3 lesson again, now
      pinned to the wide (·, 2·n_bins=512) matmul with sliced
      consumers rather than to any layout op. Reverted; the working
      diff is archived in the round-3 notes. The per-iteration MXU
      dispatch count is therefore NOT the lever for the GL×64 floor.
  v9 (final_ola="matmul", round 3, REFUTED as default): replace the
      one final per-frame OLA loop with the in-loop shift-matrix
      accumulation, emitting the waveform in frame-space (F, Np)
      layout (XLA reassembles outside). Interpret-parity exact, but
      measured SLOWER on both counts — 42.6 vs 39.1 ms (GL×32) and
      54.9 vs 51.1 ms (GL×64) per 128 clips, a constant ≈ +3.6 ms:
      the F lane-aligned dynamic-slice RMWs of the final OLA cost
      LESS than 6 extra shift matmuls + the 4× larger output write.
      With v8 this closes VERDICT r2 #8: the ×64 chain's marginal
      per-iteration device cost is ~0.37 ms/128 clips (probe pair
      it32/it64), i.e. the loop body is already compute-floor-bound;
      the remaining per-call gap is relay dispatch, which the
      scan-fused bench methodology (bench.py --inner) already
      amortizes. Kept as an opt-in for regression tracking.

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
    ola_mode: str = "auto",
    phase_init: str = "zero",
    final_ola: str = "auto",
    init: tuple[jax.Array, jax.Array] | None = None,
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

    phase_init: "zero" (default) or "extrapolate" (requires
    `observed`): seed the hole's phase by phase-vocoder extrapolation
    from the boundary (signal/griffin_lim.py::extrapolate_hole_phase,
    computed in jnp outside the kernel — it runs once, not per
    iteration); the kernel then starts from (re0, im0) instead of e^{i0}.

    ola_mode: "chain" = the v4 per-frame read-modify-write loop;
    "split" = v6: K=ceil(n_fft/hop) accumulators where accumulator k
    takes frames k, k+K, k+2K, ... — within an accumulator the write
    regions are DISJOINT (stride K·hop ≥ n_fft), so overlap-add
    becomes pure stores with no serial RMW chain, plus one K-way VPU
    sum at the end. Attacks the structural floor identified in round 1
    (BENCHMARKS.md: the OLA RMW chain, 45 ms / 128 clips).
    "fused" = v7: eliminate the per-frame loops entirely by fusing
    OLA∘trim∘reflect-pad∘reframe into a frame-to-frame linear operator
    (see module docstring). Requires hop ≤ n_fft//2 (≥50% overlap) and
    F > 2·⌈pad/hop⌉ + 1.
    "auto" (default) = fused when those constraints hold, else chain.

    final_ola (fused mode only): how the ONE final waveform synthesis
    after the loop is produced. "loop" = the v7 per-frame dynamic-slice
    RMW OLA into a waveform scratch. "matmul" (v9) = reuse the in-loop
    shift-matrix accumulation: the un-normalized OLA waveform sampled
    at window positions IS the fused consistency sum (acc[t, j] =
    wav[t·hop + j]), so the kernel emits acc · inv_env in frame-space
    (F, Np) layout — zero per-frame loops — and XLA outside the kernel
    reassembles the (B, T) waveform with a free reshape/concat/slice.
    "auto" = "loop", the measured winner at both GL×32 and GL×64 (v9
    is ≈+3.6 ms/128 clips — module docstring refutation, round 3).
    """
    assert cfg.center, "pallas GL implements the center=True layout"
    B0, F, n_bins = mag.shape
    if ola_mode == "auto":
        ola_mode = ("fused"
                    if (cfg.hop_length <= cfg.n_fft // 2
                        and F > 2 * (-(-(cfg.n_fft // 2)
                                       // cfg.hop_length)) + 1)
                    else "chain")
    mag = mag.astype(jnp.float32)
    if observed is not None:
        fmask, re_in, im_in = observed
        fmask = jnp.broadcast_to(
            fmask.astype(jnp.float32), mag.shape
        )
        obs_re = fmask * re_in.astype(jnp.float32)
        obs_im = fmask * im_in.astype(jnp.float32)
        mag = (1.0 - fmask) * mag
    use_init = phase_init == "extrapolate" or init is not None
    if init is not None:
        # Explicit unit-phasor init (e.g. a model-predicted phase head,
        # mirroring griffin_lim(init=)); overrides phase_init.
        init_re = jnp.broadcast_to(init[0].astype(jnp.float32), mag.shape)
        init_im = jnp.broadcast_to(init[1].astype(jnp.float32), mag.shape)
    elif use_init:
        if observed is None:
            raise ValueError("phase_init='extrapolate' requires observed=")
        from .griffin_lim import extrapolate_hole_phase

        init_re, init_im = extrapolate_hole_phase(
            fmask, re_in, im_in, mag.shape
        )
    if ola_mode == "fused":
        # v7 keeps ~8 MB of host-folded operator constants resident;
        # one clip per program stays inside the ~16 MB VMEM budget
        # (measured: CB=2 is 9% SLOWER than CB=1 here, 45.0 vs 41.1 ms).
        clips_per_block = 1
    CB = max(min(clips_per_block, B0), 1)
    if B0 % CB:
        padb = CB - B0 % CB
        zpad = jnp.zeros((padb, F, n_bins), jnp.float32)
        mag = jnp.concatenate([mag, zpad], axis=0)
        if observed is not None:
            obs_re = jnp.concatenate([obs_re, zpad], axis=0)
            obs_im = jnp.concatenate([obs_im, zpad], axis=0)
        if use_init:
            # Pad clips get zero-phase (unit-real) init: mag is zero
            # there, so any unit phasor is fine — 1+0j keeps _unit sane.
            init_re = jnp.concatenate([init_re, jnp.ones_like(zpad)], 0)
            init_im = jnp.concatenate([init_im, zpad], axis=0)
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
    if ola_mode != "fused":
        assert pad + 1 + Jpad <= total, "clip too short for reflect windows"
    J_left = _reversal_matrix(pad, Jpad, end_aligned=False)
    J_right = _reversal_matrix(pad, Jpad, end_aligned=True)

    mm_dt = matmul_dtype

    use_split = ola_mode == "split"
    use_fused = ola_mode == "fused"
    if final_ola == "auto":
        final_ola = "loop"
    use_fout = use_fused and final_ola == "matmul"
    if final_ola == "matmul" and not use_fused:
        raise ValueError("final_ola='matmul' requires the fused OLA mode")
    K_ola = -(-N // hop)                   # overlapping-frame half-width

    # v7 fused-mode host constants. Frames are padded to Np lanes with a
    # structurally-zero tail [N, Np): the inverse bases have zero
    # columns there, the framed env has zeros there, and the edge
    # selector matrices have zero columns there, so the invariant holds
    # through every iteration without explicit masking.
    Np = _round_up(N, 128)
    if use_fused:
        assert hop <= pad, "fused GL requires >=50% overlap (hop <= pad)"
        n_edge = -(-pad // hop)            # reflect-touched frames/side
        assert F > 2 * n_edge + 1, "fused GL needs F > 2*ceil(pad/hop)+1"
        icosw_p = np.zeros((n_bins, Np), np.float32)
        icosw_p[:, :N] = icosw
        isinw_p = np.zeros((n_bins, Np), np.float32)
        isinw_p[:, :N] = isinw
        cosw_p = np.zeros((Np, n_bins), np.float32)
        cosw_p[:N] = cosw
        sinw_p = np.zeros((Np, n_bins), np.float32)
        sinw_p[:N] = sinw
        cosw, sinw, icosw, isinw = cosw_p, sinw_p, icosw_p, isinw_p
        # Per-frame 1/env with zero tail: E[t, j] = inv_env[t·hop + j],
        # with the reflect-CORRECTED spans zeroed so the edge-slab
        # matmul below can fill them additively (no masked row writes —
        # single-row VMEM updates measured ~27 ms/call, the dominant
        # cost of the first fused attempt).
        E_fr = np.zeros((F, Np), np.float32)
        for t in range(F):
            E_fr[t, :N] = inv_env[t * hop : t * hop + N]
        for t in range(n_edge):            # left corrected spans
            E_fr[t, : pad - t * hop] = 0.0
        for s in range(n_edge):            # right corrected spans
            E_fr[F - 1 - s, pad + s * hop :] = 0.0
        # Frame-shift matrices for the interior consistency sum: block
        # i maps fr[t] → fr[t + d_i] (zero outside [0, F)), one aligned
        # row-slab per nonzero d. Measured variants (128 clips, GL×32):
        # per-d (F8, F) matmuls = 41.1 ms; ONE stacked (7·F8, F) matmul
        # incl. d=0 = 48.7 ms; stacked + per-128-lane-chunk accumulation
        # = 46.4 ms → per-d small matmuls win, keep them.
        F8 = _round_up(F, 8)
        ds_nz = [d for d in range(-(K_ola - 1), K_ola) if d != 0]
        T_st = np.zeros((len(ds_nz) * F8, F), np.float32)
        for i, d in enumerate(ds_nz):
            for t in range(F):
                if 0 <= t + d < F:
                    T_st[i * F8 + t, t + d] = 1.0
        # Edge-slab selectors (frame-space reflect, derivation: the
        # reflected left-edge wav values wav'[j] = wav[2·pad − j]
        # (j < pad) all live inside frame 1 (covers [hop, hop+N) ⊇
        # [pad+1, 2·pad+1) since hop ≤ pad); in frame-1 coordinates the
        # source sample is (N − hop) − j. Right edge symmetrically from
        # frame F−2: wav'[total−pad+k] = wav[total−pad−2−k]; in
        # frame-(F−1) coordinates redge[j] (j ∈ [pad, N)) reads frame
        # F−2 sample (hop + N − 2) − j. The env normalization of the
        # SOURCE row and the per-target-frame lane shift + valid-span
        # mask are all folded in on the host, so at runtime each edge
        # row costs one matmul column-block, nothing else.
        e1 = E_fr[1].copy()                # env of source row 1
        e1[: pad - hop] = inv_env[hop : pad]  # unmasked (span disjoint)
        eF2 = np.zeros(Np, np.float32)
        eF2[:N] = inv_env[(F - 2) * hop : (F - 2) * hop + N]
        JL = np.zeros((Np, Np), np.float32)
        for j in range(pad):
            JL[(N - hop) - j, j] = e1[(N - hop) - j]
        JR = np.zeros((Np, Np), np.float32)
        for j in range(pad, N):
            JR[(hop + N - 2) - j, j] = eF2[(hop + N - 2) - j]
        # ledge[j] is the corrected wav'[j] (j < pad); target frame t
        # needs it lane-shifted by t·hop and clipped to its corrected
        # span. redge[j] (frame F−1 coords) shifts by s·hop for frame
        # F−1−s.
        jl_cat = np.zeros((Np, n_edge * Np), np.float32)
        for t in range(n_edge):
            w = pad - t * hop
            jl_cat[:, t * Np : t * Np + w] = JL[:, t * hop : t * hop + w]
        jr_cat = np.zeros((Np, n_edge * Np), np.float32)
        for s in range(n_edge):
            lo = pad + s * hop
            jr_cat[:, s * Np + lo : s * Np + N] = JR[:, lo - s * hop :
                                                     N - s * hop]
        # EC placement: column k of U_ec selects edge-slab row k into
        # its target frame (left t = k, then right F−1−s).
        U_ec = np.zeros((F, 2 * n_edge), np.float32)
        for t in range(n_edge):
            U_ec[t, t] = 1.0
        for s in range(n_edge):
            U_ec[F - 1 - s, n_edge + s] = 1.0
        total_w = total + (Np - N)         # OLA scratch fits Np windows
        # v9 final-OLA constant: plain per-position 1/env in frame-space
        # layout (no edge zeroing — the OUTPUT waveform needs no reflect
        # correction, only trim, which happens outside the kernel).
        E_out = np.zeros((F, Np), np.float32)
        for t in range(F):
            E_out[t, :N] = inv_env[t * hop : t * hop + N]

    def kernel(*refs):
        refs = list(refs)
        mag_ref = refs.pop(0)
        obsre_ref = obsim_ref = None
        if use_obs:
            obsre_ref = refs.pop(0)
            obsim_ref = refs.pop(0)
        initre_ref = initim_ref = None
        if use_init:
            initre_ref = refs.pop(0)
            initim_ref = refs.pop(0)
        cosw_ref, sinw_ref, icosw_ref, isinw_ref = refs[:4]
        env_ref, jl_ref, jr_ref = refs[4:7]
        del refs[:7]
        e_ref = t_ref = u_ref = eo_ref = None
        if use_fused:
            e_ref, t_ref, u_ref = refs[:3]
            del refs[:3]
        if use_fout:
            eo_ref = refs.pop(0)
        out_ref, re_s, im_s, pre_s, pim_s, fr_s, wav_s = refs[:7]
        acc_s = refs[7] if use_split else None
        magv = mag_ref[:]                             # (CB, F, n_bins)
        if use_init:
            re_s[:] = initre_ref[:]
            im_s[:] = initim_ref[:]
        else:
            re_s[:] = jnp.ones_like(magv)             # zero phase: e^{i0}
            im_s[:] = jnp.zeros_like(magv)
        pre_s[:] = jnp.zeros_like(magv)
        pim_s[:] = jnp.zeros_like(magv)

        NW = Np if use_fused else N        # frame width in VMEM

        def compute_frames():
            """(re_s, im_s) phase + mag → windowed synthesis frames."""
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
            ).reshape(CB, F, NW)

        def istft_to_wav():
            """Synthesis frames → normalized padded wav in wav_s."""
            compute_frames()
            if use_fused:
                # One-shot OLA for the FINAL waveform only (the loop
                # itself never materializes wav in fused mode). Windows
                # are Np wide; the zero tail lands in the wav scratch's
                # extra Np−N columns, past every sample that is read.
                wav_s[:] = jnp.zeros_like(wav_s)

                def ola_body(f, _):
                    seg = wav_s[:, pl.ds(f * hop, Np)]
                    wav_s[:, pl.ds(f * hop, Np)] = seg + fr_s[:, f, :]
                    return 0

                jax.lax.fori_loop(0, F, ola_body, 0)
                wav_s[:, 0:total] = wav_s[:, 0:total] * env_ref[:]
            elif use_split:
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

        def ola_acc(frc):
            """Un-normalized fused consistency sum for one clip:
            acc[t, j] = Σ_d fr[t+d, j − d·hop] = OLA wav at t·hop + j."""
            acc = frc                                  # the d = 0 term
            for i, d in enumerate(ds_nz):
                g = jnp.dot(t_ref[i * F8 : i * F8 + F8, :], frc,
                            preferred_element_type=jnp.float32)
                j0 = max(0, d * hop)
                j1 = min(Np, Np + d * hop)
                sl = g[0:F, j0 - d * hop : j1 - d * hop]
                z = jnp.zeros((F, Np - (j1 - j0)), jnp.float32)
                part = (jnp.concatenate([sl, z], axis=1)
                        if j0 == 0 else
                        jnp.concatenate([z, sl], axis=1))
                acc = acc + part
            return acc

        def fused_project():
            """v7: fr_s → consistent frames → (re, im) with ZERO loops
            and ZERO single-row VMEM writes.

            Interior: fr'[t, j] = E[t, j] · Σ_d fr[t+d, j − d·hop]. The
            frame-axis shift rides the MXU (T_d @ fr, a stacked 0/1
            operand) because a sublane-offset slab add costs a full
            relayout (the v2 lesson, re-measured for v7: 19 ms/call);
            the remaining lane-axis shifts are all multiples of 128
            when hop % 128 == 0 → pure register moves. Edges: the
            reflect-pad of the next analysis pass is applied IN FRAME
            SPACE — env-scaled, lane-shifted, span-masked selector
            blocks are folded into jl/jr on the host, every target
            span is pre-zeroed in E, and one rank-2·n_edge matmul
            (u_ref @ slabs) scatters the corrected rows additively.
            """
            for c in range(CB):
                frc = fr_s[c]                          # (F, Np)
                acc = ola_acc(frc)
                # Edge slabs from the UN-normalized accumulator rows
                # (env of the source rows lives inside jl/jr).
                r1 = acc[1:2, :]                       # (1, Np)
                rF = acc[F - 2 : F - 1, :]
                wl = jnp.dot(r1, jl_ref[:],
                             preferred_element_type=jnp.float32)
                wr = jnp.dot(rF, jr_ref[:],
                             preferred_element_type=jnp.float32)
                w = jnp.concatenate([wl, wr], axis=1
                                    ).reshape(2 * n_edge, Np)
                ec = jnp.dot(u_ref[:], w,
                             preferred_element_type=jnp.float32)
                fr_s[c] = acc * e_ref[:] + ec          # e_ref is 1/env
            xf = fr_s[:].reshape(CB * F, Np).astype(mm_dt)
            pre_s[:] = jnp.dot(xf, cosw_ref[:],
                               preferred_element_type=jnp.float32
                               ).reshape(CB, F, n_bins)
            pim_s[:] = jnp.dot(xf, sinw_ref[:],
                               preferred_element_type=jnp.float32
                               ).reshape(CB, F, n_bins)

        def body(_, carry):
            if use_fused:
                compute_frames()
            else:
                istft_to_wav()
            # Momentum uses previous rebuilt (pre_s/pim_s hold it).
            old_re = pre_s[:]
            old_im = pim_s[:]
            if use_fused:
                fused_project()
            else:
                project()                              # writes new rebuilt
            are = pre_s[:] - beta * old_re
            aim = pim_s[:] - beta * old_im
            inv = jax.lax.rsqrt(are * are + aim * aim + 1e-16)
            re_s[:] = are * inv
            im_s[:] = aim * inv
            return carry

        jax.lax.fori_loop(0, n_iter, body, 0)
        if use_fout:
            # v9: the final waveform never touches a per-frame loop —
            # emit the normalized OLA in frame-space layout; the caller
            # reassembles (B, T) with XLA reshape/concat (free, fused).
            compute_frames()
            for c in range(CB):
                out_ref[c] = ola_acc(fr_s[c]) * eo_ref[:]
        else:
            istft_to_wav()
            out_ref[:, 0, :] = wav_s[:, pad : pad + T]

    NW = Np if use_fused else N
    jl_shape = (Np, n_edge * Np) if use_fused else (Jpad, Jpad)
    clip_spec = pl.BlockSpec((CB, F, n_bins), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [clip_spec]
    if use_obs:
        in_specs += [clip_spec, clip_spec]
    if use_init:
        in_specs += [clip_spec, clip_spec]
    in_specs += [
        pl.BlockSpec((NW, n_bins), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((NW, n_bins), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_bins, NW), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_bins, NW), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, total), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(jl_shape, lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(jl_shape, lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if use_fused:
        in_specs += [
            pl.BlockSpec((F, Np), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(T_st.shape, lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(U_ec.shape, lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    if use_fout:
        in_specs += [pl.BlockSpec((F, Np), lambda b: (0, 0),
                                  memory_space=pltpu.VMEM)]
    # Output blocks keep the trailing dims equal to the array dims (TPU
    # block-shape rule): (B, 1, T) waveform layout, or (B, F, Np)
    # frame-space layout for the v9 final OLA.
    out_sh = (B, F, Np) if use_fout else (B, 1, T)
    out_specs = pl.BlockSpec((CB,) + out_sh[1:], lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)

    operands = [mag]
    if use_obs:
        operands += [obs_re, obs_im]
    if use_init:
        operands += [init_re.astype(jnp.float32),
                     init_im.astype(jnp.float32)]
    operands += [
        jnp.asarray(cosw, matmul_dtype), jnp.asarray(sinw, matmul_dtype),
        jnp.asarray(icosw, matmul_dtype), jnp.asarray(isinw, matmul_dtype),
        jnp.asarray(inv_env).reshape(1, total),
        jnp.asarray(jl_cat if use_fused else J_left),
        jnp.asarray(jr_cat if use_fused else J_right),
    ]
    if use_fused:
        operands += [jnp.asarray(E_fr), jnp.asarray(T_st),
                     jnp.asarray(U_ec)]
    if use_fout:
        operands += [jnp.asarray(E_out)]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_sh, jnp.float32),
        grid=(B // CB,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((CB, F, n_bins), jnp.float32),  # re
            pltpu.VMEM((CB, F, n_bins), jnp.float32),  # im
            pltpu.VMEM((CB, F, n_bins), jnp.float32),  # prev rebuilt re
            pltpu.VMEM((CB, F, n_bins), jnp.float32),  # prev rebuilt im
            pltpu.VMEM((CB, F, NW), jnp.float32),      # frame buffer
            pltpu.VMEM((CB, total_w if use_fused else total),
                       jnp.float32),                   # waveform buffer
        ] + (
            [pltpu.VMEM((K_ola, CB, total), jnp.float32)]  # split OLA acc
            if use_split else []
        ),
        interpret=interpret,
    )(*operands)
    if use_fout:
        # out[b, t, j] = wav_norm[t·hop + j]. Rows' first `hop` lanes
        # tile [0, F·hop); the last row's remaining lanes carry the
        # tail [F·hop, (F−1)·hop + Np) ⊇ [F·hop, total − pad). Trim to
        # [pad, pad + T). All ops here fuse into the surrounding jit.
        rows = out[:, :, :hop].reshape(B, F * hop)
        wav = jnp.concatenate([rows, out[:, F - 1, hop:]], axis=1)
        return wav[:, pad : pad + T][:B0]
    return out.reshape(B, T)[:B0]
