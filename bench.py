#!/usr/bin/env python
"""Benchmark: 2 s-clip spectrogram inpaint + Griffin-Lim throughput.

Metric (BASELINE.json line 2): clips/sec/chip over the full chain —
on-device STFT → mask → U-Net generator inpaint → composite →
32-iteration Griffin-Lim → waveform. North star [B:5]: >2000 clips/s
on v5e-8, i.e. >250 clips/s/chip.

Timing methodology: calls are CHAINED (each call consumes the previous
call's output waveform) and the result is fetched to host once at the
end — this is robust on remote-relay TPU backends where
block_until_ready alone can return before execution completes, and it
amortizes per-call dispatch latency the way a streaming service would.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/s/chip", "vs_baseline": N/250}
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128,
                    help="128 is the measured sweet spot (256 lost ~17% "
                         "per-clip on the same chain)")
    ap.add_argument("--iters", type=int, default=1,
                    help="dispatched calls per timed sample")
    ap.add_argument("--inner", type=int, default=64,
                    help="chain steps folded INSIDE one jit call via "
                         "lax.scan; one dispatch per sample measures "
                         "device throughput, not relay dispatch jitter "
                         "(measured: 30 dispatched calls/sample → 26.7% "
                         "spread, median 1759; 1 call × 64 inner → 13.8% "
                         "spread, median 2082, same day)")
    ap.add_argument("--gl_iters", type=int, default=32)
    ap.add_argument("--dtype", type=str, default="bfloat16",
                    choices=["float32", "bfloat16"],
                    help="generator compute dtype (GL stays fp32)")
    ap.add_argument("--gl_backend", type=str, default="pallas",
                    choices=["xla", "pallas"])
    ap.add_argument("--phase_init", type=str, default="auto",
                    choices=["auto", "zero", "extrapolate"],
                    help="GL hole-phase init (extrapolate: phase-vocoder "
                         "seeding, +1.7 dB hole-PSNR with a trained G, "
                         "~free; auto = product default)")
    ap.add_argument("--no_phase_aware", action="store_true",
                    help="ablation: zero-phase GL on the whole magnitude "
                         "(the reference chain / round-1 unit of work); "
                         "the default benchmarks the product default "
                         "(phase-aware), a strictly heavier chain")
    ap.add_argument("--refine_chunk", type=int, default=4,
                    help="refiner_complex/hybrid posterior-mean chunk "
                         "size: peak HBM scales with batch*chunk images "
                         "in flight through R (batch 32 x chunk 8 = 256 "
                         "needs ~14G temp and OOMs v5e's 15.75G next to "
                         "the program's constants; 32 x 4 fits)")
    ap.add_argument("--preset", type=str, default="default",
                    choices=["default", "refiner_mag", "refiner_complex",
                             "hybrid"],
                    help="quality-path chains (VERDICT r4 #7): "
                         "refiner_mag = +8-step DDIM magnitude refiner "
                         "before GL; refiner_complex = GL-free complex "
                         "decode, 16 steps + posterior mean over 8 "
                         "samples (chunked per --refine_chunk); hybrid = "
                         "refiner_complex + --complex_mag keep. The "
                         "driver headline stays preset=default")
    args = ap.parse_args()

    import dataclasses

    import jax

    from viai_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()
    from flax import nnx

    from viai_tpu.nn import define_G
    from viai_tpu.train import TrainConfig, make_infer_fn

    cfg = TrainConfig()  # flagship 256x256, n_fft=510, hop=128
    cfg = dataclasses.replace(cfg, gl_backend=args.gl_backend)
    G = define_G(dtype=args.dtype)
    g_def, g_state = nnx.split(G)
    if args.preset == "default":
        infer = make_infer_fn(g_def, None, cfg, n_gl_iter=args.gl_iters,
                              phase_aware=not args.no_phase_aware,
                              phase_init=args.phase_init)
    elif args.preset == "refiner_mag":
        # Throughput is weight-independent: a fresh-init R runs the
        # identical program the trained one does.
        from viai_tpu.nn import define_R

        R = define_R(4, dtype=args.dtype)
        infer = make_infer_fn(g_def, None, cfg, n_gl_iter=args.gl_iters,
                              phase_aware=not args.no_phase_aware,
                              phase_init=args.phase_init,
                              refiner=nnx.split(R), refine_steps=8,
                              refine_t=0.35)
    else:  # refiner_complex | hybrid — the GL-free decode chains
        from viai_tpu.nn import define_R
        from viai_tpu.train.diffusion import (
            complex_refiner_channels, make_complex_refiner_infer_fn)

        r_in, r_out = complex_refiner_channels(2)
        R = define_R(r_in, dtype=args.dtype, out_channels=r_out)
        r_def, r_state = nnx.split(R)
        infer = make_complex_refiner_infer_fn(
            g_def, None, r_def, r_state, cfg, steps=16, t_start=1.0,
            refine_avg=8, refine_chunk=args.refine_chunk,
            complex_mag="keep" if args.preset == "hybrid" else "sample")

    rng = np.random.default_rng(0)
    wav = jax.numpy.asarray(
        rng.standard_normal((args.batch, 32000)).astype(np.float32) * 0.1
    )
    key = jax.random.key(0)
    v_state = nnx.State({})

    # Fold `inner` chain steps into ONE dispatched program: each call's
    # output waveform feeds the next chain step inside a lax.scan, so a
    # single host→relay dispatch covers inner× the work. Round-2's
    # driver number (1787, one 39%-low cold sample) was dominated by
    # per-call relay jitter, not device time — this measures the chain
    # the way a deep-pipelined service would run it.
    if args.inner > 1:
        inner = args.inner

        @jax.jit
        def step_fn(g_state, v_state, wav, key):
            def body(w, _):
                return infer(g_state, v_state, w, key), None
            return jax.lax.scan(body, wav, None, length=inner)[0]
    else:
        step_fn = infer

    # Warmup/compile; fetch forces real completion.
    out = step_fn(g_state, v_state, wav, key)
    np.asarray(out)

    # Variance-proof sampling (round-2 VERDICT weak #1, tightened per
    # round-3 VERDICT weak #1 / next-round #4): the axon relay's
    # run-to-run variance is BIMODAL — a fast plateau plus occasional
    # ~45%-low relay-stall samples. A (max-min)/median convergence test
    # can therefore never converge no matter how many samples accrue
    # (BENCH_r03 capped at 12 with a 47% raw spread while 10/12 samples
    # sat within 4% of each other). Methodology:
    #   * the FIRST timed sample is always discarded (cold relay /
    #     residual compile state), on top of the untimed warmup above;
    #   * a sample is a STALL if it falls >15% below the running median
    #     (the observed stall mode is 40-45% low; plateau jitter is <5%)
    #     — stalls are disclosed and counted, never silently dropped;
    #   * sampling continues until the PLATEAU (non-stall samples) has
    #     >= 5 members with (max-min)/median < 5%, up to 12 total;
    #   * the reported value is the median of the plateau; the JSON
    #     carries plateau spread, stall count, and every raw sample, so
    #     the driver artifact owns its full error bar.
    import sys

    def one_sample() -> float:
        t0 = time.perf_counter()
        w = wav
        for _ in range(args.iters):
            w = step_fn(g_state, v_state, w, key)
        host = np.asarray(w)
        dt = time.perf_counter() - t0
        assert np.isfinite(host).all()
        return args.batch * args.iters * max(args.inner, 1) / dt

    cold = one_sample()  # discarded
    samples = [one_sample() for _ in range(5)]

    def split_plateau(xs):
        med = float(np.median(xs))
        plateau = [s for s in xs if s >= 0.85 * med]
        stalls = [s for s in xs if s < 0.85 * med]
        return plateau, stalls

    def spread(xs) -> float:
        return (max(xs) - min(xs)) / float(np.median(xs))

    while len(samples) < 12:
        plateau, _ = split_plateau(samples)
        if len(plateau) >= 5 and spread(plateau) < 0.05:
            break
        samples.append(one_sample())
    plateau, stalls = split_plateau(samples)
    print(f"cold (discarded): {cold:.1f}; samples (clips/s): "
          f"{[round(s, 1) for s in samples]}; "
          f"{len(stalls)} relay stall(s): {[round(s, 1) for s in stalls]}",
          file=sys.stderr)

    n_chips = jax.device_count()
    clips_per_sec = float(np.median(plateau))
    per_chip = clips_per_sec / n_chips
    chain = (f"2s inpaint + Griffin-Lim x{args.gl_iters}"
             if args.preset == "default" else
             "2s inpaint + 8-step DDIM refiner + Griffin-Lim x"
             f"{args.gl_iters}" if args.preset == "refiner_mag" else
             f"2s inpaint + complex DDIM x16 avg8 GL-free decode"
             + (" + mag-keep hybrid" if args.preset == "hybrid" else ""))
    print(json.dumps({
        "metric": f"clips_per_sec_per_chip ({chain})",
        "value": round(per_chip, 2),
        "unit": "clips/s/chip",
        "vs_baseline": round(per_chip / 250.0, 3),
        "n_samples": len(samples),
        "n_plateau": len(plateau),
        "n_stall_samples": len(stalls),
        "plateau_spread_pct": round(100.0 * spread(plateau), 1),
        "raw_spread_pct": round(100.0 * spread(samples), 1),
        "samples_clips_per_sec": [round(s, 1) for s in samples],
        "cold_discarded": round(cold, 1),
    }))


if __name__ == "__main__":
    main()
