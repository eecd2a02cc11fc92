#!/usr/bin/env python
"""Long quality run at device speed, saving test.py-compatible nets.

The CLI train loop ships a fresh host batch per step; through this
environment's TPU relay that is transfer/RTT-bound (~1 step/s), which
makes 10k+ step quality studies impractical. This script keeps the
exact CLI model construction (TrainOptions → VIAIModel, so the saved
`{epoch}_net_*.pth` load in test.py verbatim) but drives the jit'd
train step over a DEVICE-RESIDENT pool of synthetic clips: the pool is
uploaded once and every step picks a pool batch + a fresh mask/crop key
(mask sampling lives inside the step, so data diversity per step
matches the CLI path with a pool this large).

Usage:
  python scripts/quality_long.py --steps 15000 --batch 32 \
      --hole_weight 3.0 --name q15k --checkpoints_dir /tmp/q15k
Then:
  python test.py --name q15k --checkpoints_dir /tmp/q15k ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=15000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--pool_batches", type=int, default=64,
                    help="device-resident pool size, in batches")
    ap.add_argument("--hole_weight", type=float, default=3.0)
    ap.add_argument("--name", type=str, default="qlong")
    ap.add_argument("--checkpoints_dir", type=str, default="/tmp/qlong")
    ap.add_argument("--milestone", type=int, default=5000,
                    help="save nets every N steps (plus latest at end)")
    ap.add_argument("--long_gap", action="store_true",
                    help="long-gap config: multi-res input, 75-150 frame "
                         "masks (BASELINE config 3)")
    ap.add_argument("--model", type=str, default="audio",
                    choices=["audio", "av"],
                    help="av: vision-infused (synthetic AV pool with "
                         "frames; ~25 MB/batch of frames on device)")
    ap.add_argument("--notes", action="store_true",
                    help="polyphonic note-event corpus (onsets/decays/"
                         "chords) instead of the sustained-harmonic "
                         "default — the harder inpainting task")
    ap.add_argument("--notes_grid", action="store_true",
                    help="deterministic twin of --notes (beat grid + "
                         "repeating arpeggio): hole contents fully "
                         "inferable from context — the ambiguity-"
                         "ceiling attribution corpus")
    ap.add_argument("--cue", action="store_true",
                    help="vision-NECESSARY av_cue corpus: the hole is "
                         "audio-ambiguous (one of two instruments "
                         "continues) and only video disambiguates; "
                         "mask is pinned to the corpus gap. Use with "
                         "--model av vs --model audio for the fusion-"
                         "edge comparison")
    ap.add_argument("--resume_step", type=int, default=0,
                    help="resume from a {N}_state orbax checkpoint in "
                         "the experiment dir (full train state: params "
                         "+ optimizer + schedule); continues to "
                         "--steps. Added after a TPU-relay hang killed "
                         "a 40k run at 13.5k (ADVICE r3: no-resume "
                         "retries already burned queue19C/queue20)")
    ap.add_argument("--seed", type=int, default=0)
    # Onset-limiter levers (round-3): see nn/losses.py + generator.py.
    ap.add_argument("--lambda_sc", type=float, default=0.0)
    ap.add_argument("--lambda_onset", type=float, default=0.0)
    ap.add_argument("--lambda_fm", type=float, default=0.0)
    # Round-4 estimator arm: metric-matched MSE regression (posterior
    # mean) vs the default L1 (posterior median) — see nn/losses.py.
    ap.add_argument("--lambda_l1", type=float, default=100.0)
    ap.add_argument("--lambda_l2", type=float, default=0.0)
    ap.add_argument("--num_D", type=int, default=1)
    ap.add_argument("--gated", action="store_true")
    ap.add_argument("--phase_head", action="store_true")
    ap.add_argument("--lambda_phase", type=float, default=1.0)
    ap.add_argument("--bottleneck_dilation", type=str, default="")
    ap.add_argument("--bottleneck_attn", type=int, default=0)
    ap.add_argument("--ngf", type=int, default=64,
                    help="generator width (capacity arm of the round-3 "
                         "notes ladder); must be repeated at test time")
    args = ap.parse_args()

    import jax

    from viai_tpu.config.options import TrainOptions
    from viai_tpu.data.synthetic import SyntheticBatchIterator, SyntheticConfig
    from viai_tpu.model import VIAIModel
    from viai_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()

    # Exact CLI construction (same init/dropout/schedule semantics).
    epochs_total = max(args.steps // args.milestone, 1)
    opt = TrainOptions().parse([
        "--name", args.name,
        "--checkpoints_dir", args.checkpoints_dir,
        "--model", args.model,
        "--dataset_mode",
        ("synthetic_av_cue" if args.cue else
         ("synthetic_av" if args.model == "av" else "synthetic")
         + ("_notes_grid" if args.notes_grid else
            "_notes" if args.notes else "")),
        "--batchSize", str(args.batch),
        "--dtype", "bfloat16",
        "--hole_weight", str(args.hole_weight),
        "--lr_policy", "lambda",
        "--niter", str(max(epochs_total - 1, 1)),
        "--niter_decay", "1",
        "--steps_per_epoch", str(args.milestone),
        "--seed", str(args.seed),
        "--lambda_sc", str(args.lambda_sc),
        "--lambda_onset", str(args.lambda_onset),
        "--lambda_fm", str(args.lambda_fm),
        "--lambda_L1", str(args.lambda_l1),
        "--lambda_L2", str(args.lambda_l2),
        "--num_D", str(args.num_D),
        "--bottleneck_dilation", args.bottleneck_dilation,
        "--bottleneck_attn", str(args.bottleneck_attn),
        "--ngf", str(args.ngf),
        "--lambda_phase", str(args.lambda_phase),
    ] + (["--gated"] if args.gated else [])
      + (["--phase_head"] if args.phase_head else [])
      + (["--long_gap"] if args.long_gap else []))
    model = VIAIModel(opt)
    start = 0
    if args.resume_step:
        if args.resume_step >= args.steps:
            # ADVICE r4 #4: a completed run re-probed by a queue script
            # would otherwise skip the loop and KeyError on losses.
            print(f"resume_step {args.resume_step} >= steps "
                  f"{args.steps}: nothing to train", flush=True)
            sys.exit(0)
        model.load_networks(str(args.resume_step))
        start = args.resume_step
        print(f"resumed full train state @ {start}", flush=True)

    # Device-resident clip pool, uploaded once.
    use_av = args.model == "av"
    # NOTE: style must cover EVERY corpus flag. Round-3 post-mortem: the
    # original expression fell through to "harmonic" for --notes_grid,
    # so the first grid10 run trained on the WRONG corpus and its
    # attribution was retracted (scripts/quality_results.jsonl).
    it = SyntheticBatchIterator(
        SyntheticConfig(with_video=use_av,
                        style=("av_cue" if args.cue else
                               "notes_grid" if args.notes_grid else
                               "notes" if args.notes else "harmonic")),
        batch=args.batch, seed=args.seed + 1,
    )
    gen = iter(it)
    pool = []
    for _ in range(args.pool_batches):
        b = next(gen)
        item = (jax.device_put(np.asarray(b["wav"])),
                jax.device_put(np.asarray(b["frames"])) if use_av else None,
                jax.device_put(np.asarray(b["frames_valid"], np.float32))
                if use_av else None)
        pool.append(item)
    it.close()
    print(f"pool: {args.pool_batches} x {args.batch} clips on device"
          f"{' (+frames)' if use_av else ''}", flush=True)

    key = jax.random.key(args.seed + 2)
    if start:
        key = jax.random.fold_in(key, start)  # decorrelate resumed stream
    t0 = time.perf_counter()
    losses = {}
    for i in range(start, args.steps):
        key, sub = jax.random.split(key)
        wav_i, fr_i, fv_i = pool[i % args.pool_batches]
        model.state, losses = model.train_step(
            model.state, wav_i, fr_i, sub, fv_i
        )
        step = i + 1
        if step % 500 == 0:
            l1 = float(losses["loss_G_L1"])   # forces a sync point
            rate = (step - start) / (time.perf_counter() - t0)
            print(f"step {step}/{args.steps}  L1 {l1:.5f}  "
                  f"{rate:.1f} steps/s", flush=True)
        if step % args.milestone == 0:
            model.save_networks(str(step))
            print(f"saved nets @ {step}", flush=True)

    dt = time.perf_counter() - t0
    rec = {
        "exp": "quality_long", "steps": args.steps, "batch": args.batch,
        "hole_weight": args.hole_weight, "long_gap": args.long_gap,
        "model": args.model, "notes": args.notes,
        "notes_grid": args.notes_grid, "cue": args.cue,
        "lambda_sc": args.lambda_sc, "lambda_onset": args.lambda_onset,
        "lambda_fm": args.lambda_fm, "num_D": args.num_D,
        "lambda_l1": args.lambda_l1, "lambda_l2": args.lambda_l2,
        "gated": args.gated, "phase_head": args.phase_head,
        "lambda_phase": args.lambda_phase,
        "bottleneck_dilation": args.bottleneck_dilation,
        "bottleneck_attn": args.bottleneck_attn,
        "ngf": args.ngf,
        "pool_clips": args.pool_batches * args.batch,
        "resume_step": start,
        "final_l1": round(float(losses["loss_G_L1"]), 6),
        "train_clips_per_s": round((args.steps - start) * args.batch / dt, 1),
        "expr_dir": model.expr_dir, "t": time.time(),
    }
    out = os.path.join(os.path.dirname(__file__), "quality_results.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
