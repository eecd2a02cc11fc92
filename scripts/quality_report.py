#!/usr/bin/env python
"""Quality smoke report: train briefly, show inpainting quality improving.

SURVEY.md §4: the reference's quality control is PSNR/SNR vs ground
truth [B:2]. With no pretrained reference weights available
(SURVEY.md §0), this script demonstrates the training loop LEARNS:
hole-PSNR of the inpainted region on a held-out synthetic batch,
before vs after N train steps. Appends a JSON line to
scripts/quality_results.jsonl.

Usage: python scripts/quality_report.py [--steps 300] [--batch 32]
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
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--eval_batch", type=int, default=32)
    ap.add_argument("--dtype", type=str, default="bfloat16")
    ap.add_argument("--lambda_l1", type=float, default=100.0)
    ap.add_argument("--long_gap", action="store_true",
                    help="long-gap config: multi-res input, 75-150 frame "
                         "masks, 3-channel G (BASELINE config 3)")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from viai_tpu.data.synthetic import SyntheticAVDataset, SyntheticConfig
    from viai_tpu.nn import define_D, define_G
    from viai_tpu.signal import stft_magnitude
    from viai_tpu.signal.mel import compress
    from viai_tpu.train import TrainConfig, adam, init_state, \
        make_infer_fn, make_train_step
    from viai_tpu.train.step import preprocess
    from viai_tpu.utils.metrics import masked_psnr

    cfg = dataclasses.replace(TrainConfig(), lambda_l1=args.lambda_l1)
    if args.long_gap:
        from viai_tpu.signal import MaskConfig

        cfg = dataclasses.replace(
            cfg, multi_res=True,
            mask=MaskConfig(min_gap_frames=75, max_gap_frames=150),
        )
    g_in = 3 if args.long_gap else 2
    G = define_G(input_nc=g_in, dtype=args.dtype)
    D = define_D(input_nc=g_in + 1, dtype=args.dtype)
    g_tx, d_tx = adam(2e-4), adam(2e-4)
    (g_def, d_def, v_def), state = init_state(G, D, None, g_tx, d_tx, cfg)
    step = make_train_step(g_def, d_def, v_def, g_tx, d_tx, cfg)
    infer = make_infer_fn(g_def, v_def, cfg, n_gl_iter=8)

    ds = SyntheticAVDataset(SyntheticConfig())
    train_wavs = np.stack(
        [ds[i]["wav"] for i in range(args.batch * 4)]
    )
    eval_wav = jnp.asarray(
        np.stack([ds[100000 + i]["wav"] for i in range(args.eval_batch)])
    )

    def hole_psnr(g_state, key):
        """PSNR restricted to the masked gap, in the image domain."""
        pre = preprocess(eval_wav, key, cfg)
        out_wav = infer(g_state, state["v"], eval_wav, key)
        out_mag = stft_magnitude(out_wav, cfg.stft)
        img = compress(jnp.swapaxes(out_mag, -1, -2))[..., None]
        n_fr = img.shape[2]
        return float(jnp.mean(masked_psnr(
            img, pre["real_img"][:, :, :n_fr],
            pre["mask_img"][:, :, :n_fr],
        )))

    ekey = jax.random.key(7)
    p0 = hole_psnr(state["g"], ekey)
    print(f"hole-PSNR before training: {p0:.2f} dB", flush=True)

    key = jax.random.key(0)
    t0 = time.perf_counter()
    losses = {}
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        wav = jnp.asarray(
            train_wavs[(i * args.batch) % len(train_wavs) :][: args.batch]
            if (i * args.batch) % len(train_wavs) + args.batch
            <= len(train_wavs)
            else train_wavs[: args.batch]
        )
        state, losses = step(state, wav, None, sub)
    lg = float(losses["loss_G_L1"])
    dt = time.perf_counter() - t0
    p1 = hole_psnr(state["g"], ekey)
    print(f"hole-PSNR after {args.steps} steps: {p1:.2f} dB "
          f"(train {args.steps * args.batch / dt:.0f} clips/s)", flush=True)

    rec = {
        "steps": args.steps, "batch": args.batch,
        "long_gap": args.long_gap,
        "hole_psnr_before": round(p0, 3),
        "hole_psnr_after": round(p1, 3),
        "final_l1": round(lg, 5),
        "train_clips_per_s": round(args.steps * args.batch / dt, 1),
        "t": time.time(),
    }
    out = os.path.join(os.path.dirname(__file__), "quality_results.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
