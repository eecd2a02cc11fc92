#!/usr/bin/env python
"""Preserve trained checkpoints across the inter-round workspace wipe.

The round-3→4 transition wiped both /tmp AND the (gitignored)
checkpoints/ dir, losing every trained net and forcing a full retrain
chain (ADVICE r3 / r4_chain.sh header). git history is the only storage
that provably survives, so: cast the final per-net .pth state dicts to
fp16 (halves size; quality evals are insensitive to fp16 weight
rounding — the forward pass runs bf16 on TPU anyway) and store them
under artifacts/ckpt/<name>/. `--restore` casts back to fp32 .pth files
under checkpoints/ so load_networks() and the queue scripts' resume
probes find them unchanged.

Usage:
  python scripts/preserve_ckpts.py            # snapshot (repo → artifacts)
  python scripts/preserve_ckpts.py --restore  # artifacts → checkpoints/
"""
import os
import sys

import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "checkpoints")
ART = os.path.join(REPO, "artifacts", "ckpt")

# (experiment, files worth keeping) — final nets + opt.txt only; orbax
# milestone states and intermediate epochs stay volatile.
KEEP = {
    "beststack40": ["40000_net_G.pth", "40000_net_D.pth", "opt.txt"],
    "bs40r": ["40000_net_R.pth", "40000_net_Rraw.pth", "opt.txt"],
    "bs40r_ho": ["40000_net_R.pth", "opt.txt"],
    "lgap4": ["10000_net_G.pth", "10000_net_D.pth", "40000_net_R.pth",
              "opt.txt"],
}


def _convert(src: str, dst: str, dtype) -> None:
    if src.endswith(".pth"):
        sd = torch.load(src, map_location="cpu", weights_only=True)
        sd = {k: (v.to(dtype) if v.is_floating_point() else v)
              for k, v in sd.items()}
        torch.save(sd, dst)
    else:  # opt.txt etc.
        with open(src, "rb") as f, open(dst, "wb") as g:
            g.write(f.read())
    print(f"  {src} → {dst} ({os.path.getsize(dst) / 1e6:.1f} MB)")


def main() -> int:
    restore = "--restore" in sys.argv
    src_root, dst_root = (ART, CKPT) if restore else (CKPT, ART)
    dtype = torch.float32 if restore else torch.float16
    n = 0
    for name, files in KEEP.items():
        sdir, ddir = os.path.join(src_root, name), os.path.join(dst_root, name)
        for f in files:
            src = os.path.join(sdir, f)
            if not os.path.exists(src):
                continue
            os.makedirs(ddir, exist_ok=True)
            dst = os.path.join(ddir, f)
            if restore and os.path.exists(dst):
                print(f"  keep existing {dst}")
                continue
            _convert(src, dst, dtype)
            n += 1
    print(f"{'restored' if restore else 'preserved'} {n} files")
    return 0


if __name__ == "__main__":
    sys.exit(main())
