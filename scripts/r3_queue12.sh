#!/bin/sh
# Round-3 phase 12: long-gap MAGNITUDE levers + the 40k best-stack run.
#
# Motivation (quality_results.jsonl / BENCHMARKS.md):
# - Long-gap hole-PSNR sits at 39.24 dB vs a 51.56 dB oracle-magnitude
#   ceiling: ~12 dB of MODEL-side magnitude headroom, and the round-3
#   bottleneck levers (dilation, attention) have never been trained on
#   the long-gap config. 75-150-frame holes are exactly where a larger
#   temporal mechanism should matter if it matters anywhere.
# - Arm D: best notes stack (dil 1,2,4 + onset 50, attention refuted)
#   at 40k steps - the remaining training-length datapoint for the
#   VERDICT ">=40 dB at 20k or attribution" criterion (20k = 38.79).
# - Arm A: train-pool vs eval-unseen pre-GL probe on the 20k notes
#   checkpoint: pins that data diversity is not the notes limiter
#   (the grid twin already showed zero gap).
set -x
cd /root/repo

try2() {
  timeout "$T1" "$@" || { sleep 90; timeout "$T2" "$@"; }
}

# --- arm A: notes train/eval-gap diag on the existing dil20b ckpt ---
T1=900 T2=1200 try2 python scripts/grid_diag.py dil20b /tmp/r3_dil20b 20000 \
  1,2,4 notes

# --- arm B: long-gap + dilated bottleneck, 10k ---
T1=2400 T2=3000 try2 python scripts/quality_long.py --steps 10000 --batch 32 \
  --long_gap --name lgdil --checkpoints_dir /tmp/r3_lgdil \
  --bottleneck_dilation 1,2,4
T1=1500 T2=2100 try2 python test.py --name lgdil --checkpoints_dir /tmp/r3_lgdil \
  --results_dir /tmp/r3_lgdil_res --dataset_mode synthetic --long_gap \
  --how_many 32 --gl_backend pallas --gl_iters 64 --which_epoch 10000 \
  --bottleneck_dilation 1,2,4

# --- arm C: long-gap + dilation + self-attention, 10k ---
T1=2700 T2=3300 try2 python scripts/quality_long.py --steps 10000 --batch 32 \
  --long_gap --name lgattn --checkpoints_dir /tmp/r3_lgattn \
  --bottleneck_dilation 1,2,4 --bottleneck_attn 2
T1=1500 T2=2100 try2 python test.py --name lgattn --checkpoints_dir /tmp/r3_lgattn \
  --results_dir /tmp/r3_lgattn_res --dataset_mode synthetic --long_gap \
  --how_many 32 --gl_backend pallas --gl_iters 64 --which_epoch 10000 \
  --bottleneck_dilation 1,2,4 --bottleneck_attn 2

# --- arm D: notes 40k, best stack (dil 1,2,4 + onset 50) ---
T1=6000 T2=7200 try2 python scripts/quality_long.py --steps 40000 --batch 32 \
  --notes --name notes40 --checkpoints_dir /tmp/r3_notes40 \
  --bottleneck_dilation 1,2,4 --lambda_onset 50
T1=1200 T2=1800 try2 python test.py --name notes40 \
  --checkpoints_dir /tmp/r3_notes40 --results_dir /tmp/r3_notes40_res \
  --dataset_mode synthetic_notes --how_many 16 --gl_backend pallas \
  --which_epoch 40000 --bottleneck_dilation 1,2,4
T1=1200 T2=1800 try2 python test.py --name notes40 \
  --checkpoints_dir /tmp/r3_notes40 --results_dir /tmp/r3_notes40_res30 \
  --dataset_mode synthetic_notes --how_many 16 --gl_backend pallas \
  --which_epoch 30000 --bottleneck_dilation 1,2,4

echo QUEUE12_DONE
