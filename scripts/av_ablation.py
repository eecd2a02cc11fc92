#!/usr/bin/env python
"""Vision-infused vs audio-only ablation — the paper's core claim.

The ICCV 2019 paper's thesis is that visual information improves audio
inpainting. The synthetic AV dataset here encodes pitch/energy in the
video (a blob whose position tracks instantaneous pitch and envelope —
viai_tpu/data/synthetic.py), so a model that truly exploits fusion must
beat the audio-only model on hole-PSNR for LONG gaps, where audio
context alone underdetermines the missing content.

Trains both variants identically and reports hole-PSNR on held-out
clips. Appends JSON to scripts/quality_results.jsonl.

Usage: python scripts/av_ablation.py [--steps 600]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_variant(use_video: bool, steps: int, batch: int, cfg, ds,
                eval_wav, eval_frames):
    import jax
    import jax.numpy as jnp

    from viai_tpu.nn import define_D, define_G, define_V
    from viai_tpu.signal import stft_magnitude
    from viai_tpu.signal.mel import compress
    from viai_tpu.train import adam, init_state, make_infer_fn, \
        make_train_step
    from viai_tpu.train.step import preprocess
    from viai_tpu.utils.metrics import masked_psnr

    fusion = 128 if use_video else 0
    G = define_G(dtype="bfloat16", fusion_channels=fusion, seed=0)
    D = define_D(input_nc=3, dtype="bfloat16", seed=1)
    V = define_V(fusion, 16, dtype="bfloat16", seed=2) if use_video else None
    g_tx, d_tx = adam(2e-4), adam(2e-4)
    (g_def, d_def, v_def), state = init_state(G, D, V, g_tx, d_tx, cfg)
    step = make_train_step(g_def, d_def, v_def, g_tx, d_tx, cfg)
    infer = make_infer_fn(g_def, v_def, cfg, n_gl_iter=8)

    n_train = batch * 8
    wavs = np.stack([ds[i]["wav"] for i in range(n_train)])
    frames = (
        np.stack([ds[i]["frames"] for i in range(n_train)])
        if use_video else None
    )

    key = jax.random.key(0)
    t0 = time.perf_counter()
    for i in range(steps):
        key, sub = jax.random.split(key)
        lo = (i * batch) % n_train
        if lo + batch > n_train:
            lo = 0
        wb = jnp.asarray(wavs[lo : lo + batch])
        fb = jnp.asarray(frames[lo : lo + batch]) if use_video else None
        state, losses = step(state, wb, fb, sub)
    dt = time.perf_counter() - t0

    ekey = jax.random.key(7)
    pre = preprocess(eval_wav, ekey, cfg)
    out_wav = infer(state["g"], state["v"], eval_wav, ekey,
                    jnp.asarray(eval_frames) if use_video else None)
    out_mag = stft_magnitude(out_wav, cfg.stft)
    img = compress(jnp.swapaxes(out_mag, -1, -2))[..., None]
    n_fr = img.shape[2]
    hp = float(jnp.mean(masked_psnr(
        img, pre["real_img"][:, :, :n_fr], pre["mask_img"][:, :, :n_fr]
    )))
    return hp, float(losses["loss_G_L1"]), steps * batch / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import dataclasses

    import jax.numpy as jnp

    from viai_tpu.data.synthetic import SyntheticAVDataset, SyntheticConfig
    from viai_tpu.signal import MaskConfig
    from viai_tpu.train import TrainConfig

    # Long gaps (75-150 frames ≈ 0.6-1.2 s) — where fusion must matter.
    base = TrainConfig(
        mask=MaskConfig(min_gap_frames=75, max_gap_frames=150),
    )
    ds = SyntheticAVDataset(SyntheticConfig(with_video=True))
    eval_items = [ds[200000 + i] for i in range(32)]
    eval_wav = jnp.asarray(np.stack([e["wav"] for e in eval_items]))
    eval_frames = np.stack([e["frames"] for e in eval_items])

    results = {}
    for use_video in (False, True):
        cfg = dataclasses.replace(base, use_video=use_video)
        hp, l1, tput = run_variant(
            use_video, args.steps, args.batch, cfg, ds, eval_wav,
            eval_frames,
        )
        name = "av" if use_video else "audio"
        results[name] = {"hole_psnr": round(hp, 3), "final_l1": round(l1, 5),
                         "train_clips_per_s": round(tput, 1)}
        print(f"{name}: hole-PSNR {hp:.2f} dB  (L1 {l1:.4f}, "
              f"{tput:.0f} clips/s)", flush=True)

    rec = {"exp": "av_ablation", "steps": args.steps, "batch": args.batch,
           **{f"{k}_{m}": v for k, r in results.items()
              for m, v in r.items()},
           "t": time.time()}
    out = os.path.join(os.path.dirname(__file__), "quality_results.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
