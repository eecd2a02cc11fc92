#!/usr/bin/env python
"""Diagnose the notes_grid train/eval gap (round 3).

grid10 reads 28.7 dB post-GL hole-PSNR at eval with train L1 0.00165
and a 51.8 dB oracle ceiling. Two hypotheses:
  (a) GL amplification: G's PRE-GL magnitude prediction is good on the
      eval clips but the post-GL metric is not (phase interference
      between a new onset and the ringing tail of the same pitch one
      cycle earlier smears magnitudes when GL guesses hole phase).
  (b) pool memorization / distribution gap: G mispredicts UNSEEN clips
      (eval indices 0..15) but nails its 2048-clip training pool
      (indices 10000+).
Prints PRE-GL composite hole-PSNR (compressed-image domain, the same
masked_psnr the eval uses) on eval clips vs training-pool clips, with
the eval's exact mask key.

Usage: python scripts/grid_diag.py NAME CKPT_DIR EPOCH [DILATION] [STYLE]
       [ATTN_BLOCKS]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    name, ckpt_dir, epoch = sys.argv[1], sys.argv[2], sys.argv[3]
    dilation = sys.argv[4] if len(sys.argv) > 4 else "1,2,4"
    style = sys.argv[5] if len(sys.argv) > 5 else "notes_grid"
    attn = sys.argv[6] if len(sys.argv) > 6 else "0"

    from flax import nnx

    from viai_tpu.config.options import TestOptions
    from viai_tpu.data.synthetic import SyntheticAVDataset, SyntheticConfig
    from viai_tpu.model import create_model
    from viai_tpu.train.step import _g_input, preprocess
    from viai_tpu.utils.metrics import masked_psnr

    opt = TestOptions().parse([
        "--name", name, "--checkpoints_dir", ckpt_dir,
        "--dataset_mode", f"synthetic_{style}"
        if style != "harmonic" else "synthetic",
        "--bottleneck_dilation", dilation,
        "--bottleneck_attn", attn,
    ])
    opt.isTrain = False
    model = create_model(opt)
    model.load_networks(epoch)

    ds = SyntheticAVDataset(SyntheticConfig(style=style))
    # The eval's exact mask key (cli/test.py: split(key(seed), 3)[1]).
    kmask = jax.random.split(jax.random.key(opt.seed), 3)[1]

    @jax.jit
    def pre_gl(g_state, wav):
        pre = preprocess(wav, kmask, model.cfg)
        G = nnx.merge(model.g_def, g_state)
        fake = G(_g_input(pre))
        m = pre["mask_img"]
        comp = pre["real_img"] * m + fake * (1.0 - m)
        return masked_psnr(comp, pre["real_img"], m)

    for idx0, tag in [(0, "eval-unseen"), (10000, "train-pool")]:
        wav = jnp.asarray(np.stack(
            [ds[idx0 + i]["wav"] for i in range(16)]))
        val = float(np.mean(np.asarray(pre_gl(model.state["g"], wav))))
        print(f"pre-GL hole-PSNR [{tag}] (idx {idx0}..{idx0 + 15}): "
              f"{val:.2f} dB", flush=True)


if __name__ == "__main__":
    main()
