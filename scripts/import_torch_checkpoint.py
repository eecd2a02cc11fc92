#!/usr/bin/env python
"""Import a torch .pth state dict into a viai_tpu checkpoint.

The parity bridge for reference-era weights (SURVEY.md §3.4 "torch→flax
weight import shim"): once real reference checkpoints exist, map their
keys/layouts into our flat schema and save in our naming scheme so
test.py / serving can load them.

Built-in mappers:
  identity — keys already match our flat schema (e.g. files we wrote)
  pix2pix  — pix2pix-style torch Conv2d/GroupNorm naming → our UNet/
             PatchGAN schema (kernel layout permuted OIHW→HWIO); keys
             that cannot be matched are reported, not silently dropped.

Usage:
  python scripts/import_torch_checkpoint.py --src ref_net_G.pth \
      --net G --expr_dir checkpoints/imported --which_epoch ref \
      [--mapper pix2pix] [--ngf 64 ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def map_identity(sd, ours):
    return {k: np.asarray(v) for k, v in sd.items()}, []


def map_pix2pix(sd, ours):
    """Best-effort structural mapping from torch Conv/Norm modules.

    Matches by (shape after layout permutation) in declaration order —
    robust to module-name differences. Reports leftovers.
    """
    import torch

    theirs = []
    for k, v in sd.items():
        arr = v.numpy() if isinstance(v, torch.Tensor) else np.asarray(v)
        if arr.ndim == 4:      # OIHW → HWIO
            arr = arr.transpose(2, 3, 1, 0)
        elif arr.ndim == 5:    # OIDHW → DHWIO
            arr = arr.transpose(2, 3, 4, 1, 0)
        theirs.append((k, arr))
    out, unmatched = {}, []
    used = set()
    for ok, oshape in ours.items():
        hit = None
        for i, (tk, arr) in enumerate(theirs):
            if i in used:
                continue
            if arr.shape == oshape:
                hit = (i, tk, arr)
                break
        if hit is None:
            unmatched.append(ok)
        else:
            used.add(hit[0])
            out[ok] = hit[2]
    leftover = [tk for i, (tk, _) in enumerate(theirs) if i not in used]
    return out, unmatched + [f"(unused src) {k}" for k in leftover]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="torch .pth file")
    ap.add_argument("--net", default="G", choices=["G", "D", "V"])
    ap.add_argument("--expr_dir", required=True)
    ap.add_argument("--which_epoch", default="imported")
    ap.add_argument("--mapper", default="identity",
                    choices=["identity", "pix2pix"])
    ap.add_argument("--ngf", type=int, default=64)
    ap.add_argument("--ndf", type=int, default=64)
    ap.add_argument("--input_nc", type=int, default=2)
    ap.add_argument("--output_nc", type=int, default=1)
    ap.add_argument("--fusion_channels", type=int, default=0)
    args = ap.parse_args()

    import torch
    from flax import nnx

    from viai_tpu.io import flatten_state, save_networks, unflatten_into
    from viai_tpu.nn import define_D, define_G, define_V

    if args.net == "G":
        net = define_G(args.input_nc, args.output_nc, args.ngf,
                       fusion_channels=args.fusion_channels)
    elif args.net == "D":
        net = define_D(args.input_nc + args.output_nc, args.ndf)
    else:
        net = define_V(args.fusion_channels or 256, 16)
    _, state = nnx.split(net)
    ours = {k: v.shape for k, v in flatten_state(state).items()}

    sd = torch.load(args.src, map_location="cpu", weights_only=True)
    mapper = {"identity": map_identity, "pix2pix": map_pix2pix}[args.mapper]
    flat, problems = mapper(sd, ours)
    if problems:
        print("UNMATCHED parameters:")
        for p in problems:
            print("  ", p)
    new_state = unflatten_into(state, flat)
    save_networks({args.net: new_state}, args.which_epoch, args.expr_dir,
                  also_latest=False)
    print(f"imported {len(flat)} tensors → "
          f"{args.expr_dir}/{args.which_epoch}_net_{args.net}.pth")


if __name__ == "__main__":
    main()
