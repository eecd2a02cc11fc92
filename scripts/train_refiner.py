#!/usr/bin/env python
"""Stage-2 diffusion-refiner training against a frozen G checkpoint.

The round-3 notes attribution (DESIGN.md addendum) pinned the corpus
limiter on the L1+GAN objective family; this trains the generative
alternative (train/diffusion.py): a conditional v-prediction diffusion
model over the same compressed magnitude image, conditioned on
(masked, mask, G's output). Serving mode is SDEdit-style truncated
DDIM refinement via `test.py --refiner`.

Same device-resident-pool design as quality_long.py (the CLI loop is
relay-RTT-bound in this environment). The refiner checkpoint is saved
as `{step}_net_R.pth` (+ `latest_net_R.pth`) INTO THE G EXPERIMENT
DIR, so test.py finds both nets under one --name.

Usage:
  python scripts/train_refiner.py --steps 10000 --batch 32 --notes \
      --name dil20b --checkpoints_dir /tmp/r3_notes \
      --which_epoch 10000 --bottleneck_dilation 1,2,4
  python test.py --name dil20b --checkpoints_dir /tmp/r3_notes \
      --dataset_mode synthetic_notes --refiner --refine_steps 8 \
      --refine_t 0.35 --bottleneck_dilation 1,2,4 ...
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
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--pool_batches", type=int, default=64)
    ap.add_argument("--hole_weight", type=float, default=3.0)
    ap.add_argument("--name", type=str, required=True,
                    help="G experiment name (checkpoint to refine)")
    ap.add_argument("--checkpoints_dir", type=str, required=True)
    ap.add_argument("--which_epoch", type=str, default="latest",
                    help="G checkpoint tag to freeze")
    ap.add_argument("--milestone", type=int, default=5000)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--ema_decay", type=float, default=0.999)
    ap.add_argument("--domain", type=str, default="mag",
                    choices=["mag", "complex"],
                    help="mag: magnitude-image refiner (notes program). "
                         "complex: (re, im) compressed-complex refiner "
                         "— the round-4 long-gap phase attack; eval "
                         "with test.py --refiner --refiner_domain "
                         "complex")
    ap.add_argument("--observed_weight", type=float, default=1.0,
                    help="v-MSE weight on the observed region; 0 = "
                         "hole-only loss (VERDICT r3 #1; pair eval "
                         "with --refine_clamp q)")
    ap.add_argument("--cond_drop", type=float, default=0.0,
                    help="per-sample prob of zeroing the g_pred cond "
                         "channel (classifier-free-guidance training)")
    ap.add_argument("--self_cond", action="store_true",
                    help="self-conditioning (round 5, VERDICT r4 #6b): "
                         "R carries its own previous x̂0 as extra input "
                         "channel(s); eval with test.py "
                         "--refine_selfcond")
    ap.add_argument("--rngf", type=int, default=64, help="refiner width")
    ap.add_argument("--resume_step", type=int, default=0,
                    help="resume from the R{N}_state orbax checkpoint "
                         "(R + Adam + EMA); continues to --steps")
    ap.add_argument("--seed", type=int, default=0)
    # Corpus + G-architecture flags (must match the frozen G's training).
    ap.add_argument("--notes", action="store_true")
    ap.add_argument("--notes_grid", action="store_true")
    ap.add_argument("--long_gap", action="store_true")
    ap.add_argument("--bottleneck_dilation", type=str, default="")
    ap.add_argument("--bottleneck_attn", type=int, default=0)
    ap.add_argument("--gated", action="store_true")
    ap.add_argument("--phase_head", action="store_true")
    ap.add_argument("--ngf", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from flax import nnx

    from viai_tpu.config.options import TestOptions
    from viai_tpu.data.synthetic import (SyntheticBatchIterator,
                                         SyntheticConfig)
    from viai_tpu.io import save_networks
    from viai_tpu.model import VIAIModel
    from viai_tpu.nn import define_R
    from viai_tpu.train.diffusion import (complex_refiner_channels,
                                          make_complex_refiner_train_step,
                                          make_refiner_train_step)
    from viai_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()

    # Frozen G: exact test-time construction + checkpoint load.
    opt = TestOptions().parse([
        "--name", args.name,
        "--checkpoints_dir", args.checkpoints_dir,
        "--model", "audio",
        "--dataset_mode",
        "synthetic" + ("_notes_grid" if args.notes_grid else
                       "_notes" if args.notes else ""),
        "--batchSize", str(args.batch),
        "--dtype", "bfloat16",
        "--which_epoch", args.which_epoch,
        "--seed", str(args.seed),
        "--bottleneck_dilation", args.bottleneck_dilation,
        "--bottleneck_attn", str(args.bottleneck_attn),
        "--ngf", str(args.ngf),
    ] + (["--gated"] if args.gated else [])
      + (["--phase_head"] if args.phase_head else [])
      + (["--long_gap"] if args.long_gap else []))
    opt.isTrain = False
    model = VIAIModel(opt)
    model.load_networks(args.which_epoch)

    input_nc = 3 if model.cfg.multi_res else 2
    if args.domain == "complex":
        r_in, r_out = complex_refiner_channels(input_nc,
                                               self_cond=args.self_cond)
    else:
        r_in, r_out = input_nc + 2 + (1 if args.self_cond else 0), 1
    R = define_R(r_in, ngf=args.rngf, dtype=opt.dtype,
                 seed=args.seed + 3, out_channels=r_out)
    r_def, r_state = nnx.split(R)
    r_ema = jax.tree.map(jnp.copy, r_state)  # fresh buffers: r_state is donated
    r_tx = optax.adam(
        optax.cosine_decay_schedule(args.lr, args.steps, alpha=0.1),
        b1=0.9, b2=0.999,
    )
    r_opt = r_tx.init(r_state)
    start = 0
    if args.resume_step:
        if args.resume_step >= args.steps:
            # ADVICE r4 #4: guard the no-op-resume KeyError.
            print(f"resume_step {args.resume_step} >= steps "
                  f"{args.steps}: nothing to train", flush=True)
            sys.exit(0)
        from viai_tpu.io.checkpoint import load_train_state

        tpl = jax.device_get({"r": r_state, "opt": r_opt, "ema": r_ema})
        restored = load_train_state(tpl, f"R{args.resume_step}",
                                    model.expr_dir)
        r_state = jax.device_put(restored["r"])
        r_opt = jax.device_put(restored["opt"])
        r_ema = jax.device_put(restored["ema"])
        start = args.resume_step
        print(f"resumed refiner train state @ {start}", flush=True)

    make_step = (make_complex_refiner_train_step if args.domain == "complex"
                 else make_refiner_train_step)
    step_fn = make_step(
        model.g_def, model.v_def, r_def, r_tx, model.cfg,
        hole_weight=args.hole_weight,
        observed_weight=args.observed_weight,
        cond_drop=args.cond_drop, ema_decay=args.ema_decay,
        self_cond=args.self_cond,
    )

    it = SyntheticBatchIterator(
        SyntheticConfig(style=("notes_grid" if args.notes_grid else
                               "notes" if args.notes else "harmonic")),
        batch=args.batch, seed=args.seed + 1,
    )
    gen = iter(it)
    pool = [jax.device_put(np.asarray(next(gen)["wav"]))
            for _ in range(args.pool_batches)]
    it.close()
    print(f"pool: {args.pool_batches} x {args.batch} clips on device",
          flush=True)

    key = jax.random.key(args.seed + 2)
    if start:
        key = jax.random.fold_in(key, start)  # decorrelate resumed stream
    t0 = time.perf_counter()
    losses = {}
    for i in range(start, args.steps):
        key, sub = jax.random.split(key)
        r_state, r_opt, r_ema, losses = step_fn(
            r_state, r_opt, r_ema, model.state["g"], model.state["v"],
            pool[i % args.pool_batches], sub,
        )
        step = i + 1
        if step % 500 == 0:
            lr_ = float(losses["loss_R"])
            rate = (step - start) / (time.perf_counter() - t0)
            print(f"step {step}/{args.steps}  v-MSE {lr_:.5f}  "
                  f"{rate:.1f} steps/s", flush=True)
        if step % args.milestone == 0:
            # EMA is the default serving family (net_R); the raw weights
            # are saved alongside (net_Rraw) so eval can A/B them
            # (--refiner_net Rraw, VERDICT r3 #1 "EMA vs raw").
            save_networks({"R": r_ema, "Rraw": r_state}, str(step),
                          model.expr_dir)
            from viai_tpu.io.checkpoint import save_train_state

            save_train_state(
                jax.device_get({"r": r_state, "opt": r_opt, "ema": r_ema}),
                f"R{step}", model.expr_dir,
            )
            print(f"saved net_R/net_Rraw + R{step}_state @ {step}",
                  flush=True)
    save_networks({"R": r_ema, "Rraw": r_state}, "latest", model.expr_dir,
                  also_latest=False)

    dt = time.perf_counter() - t0
    rec = {
        "exp": "train_refiner", "steps": args.steps, "batch": args.batch,
        "hole_weight": args.hole_weight, "notes": args.notes,
        "notes_grid": args.notes_grid, "long_gap": args.long_gap,
        "g_epoch": args.which_epoch, "rngf": args.rngf, "lr": args.lr,
        "ema_decay": args.ema_decay,
        "observed_weight": args.observed_weight,
        "cond_drop": args.cond_drop, "domain": args.domain,
        "resume_step": start,
        "final_v_mse": round(float(losses["loss_R"]), 6),
        "train_clips_per_s": round((args.steps - start) * args.batch / dt, 1),
        "expr_dir": model.expr_dir, "t": time.time(),
    }
    out = os.path.join(os.path.dirname(__file__), "quality_results.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
