#!/bin/sh
# Round-3 phase 13: feature-matching loss on the notes corpus.
#
# Motivation: the corrected attribution matrix (quality_results.jsonl
# notes_grid_attribution_corrected) individually refuted phase,
# receptive field, capacity, loss weighting, information availability
# and long-range copying as the notes limiter — leaving the L1+GAN
# objective family itself. Feature matching (MelGAN lambda=10 /
# HiFi-GAN lambda=2) regresses D's own multi-scale features of the
# fake onto the real's, re-weighting the target toward onset/comb
# structure D discriminates on. Both canonical weights, on top of the
# best-known architecture arm (dil 1,2,4; 38.26 dB @10k).
#
# Waits for queue12 (notes40 arm) via /tmp/q12.pid.
set -x
cd /root/repo

while kill -0 "$(cat /tmp/q12.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done

try2() {
  timeout "$T1" "$@" || { sleep 90; timeout "$T2" "$@"; }
}

# --- arm A: notes + dil 1,2,4 + lambda_fm 10 (MelGAN weight) ---
T1=2400 T2=3000 try2 python scripts/quality_long.py --steps 10000 --batch 32 \
  --notes --name fm10 --checkpoints_dir /tmp/r3_fm10 \
  --bottleneck_dilation 1,2,4 --lambda_fm 10
T1=1200 T2=1800 try2 python test.py --name fm10 --checkpoints_dir /tmp/r3_fm10 \
  --results_dir /tmp/r3_fm10_res --dataset_mode synthetic_notes \
  --how_many 16 --gl_backend pallas --which_epoch 10000 \
  --bottleneck_dilation 1,2,4

# --- arm B: notes + dil 1,2,4 + lambda_fm 2 (HiFi-GAN weight) ---
T1=2400 T2=3000 try2 python scripts/quality_long.py --steps 10000 --batch 32 \
  --notes --name fm2 --checkpoints_dir /tmp/r3_fm2 \
  --bottleneck_dilation 1,2,4 --lambda_fm 2
T1=1200 T2=1800 try2 python test.py --name fm2 --checkpoints_dir /tmp/r3_fm2 \
  --results_dir /tmp/r3_fm2_res --dataset_mode synthetic_notes \
  --how_many 16 --gl_backend pallas --which_epoch 10000 \
  --bottleneck_dilation 1,2,4

echo QUEUE13_DONE
