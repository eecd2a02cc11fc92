#!/bin/sh
# Round-3 phase 8: magnitude-prediction ladder on the notes corpus.
# The --oracle_mag eval (queue7) showed the notes limiter is model
# magnitude (achieved 38.79 vs oracle 58.53 dB hole-PSNR), so the next
# levers are all training-side. Three 10k arms against the dil@10k
# reference point (38.26 dB, dilation 1,2,4 only):
#   A: deeper dilation 1,2,4,8 (receptive field over the whole hole)
#   B: capacity ngf 96 (+dilation 1,2,4)
#   C: hole_weight 5 (+dilation 1,2,4)
# Eval protocol matched to the r2/r3 sweeps: test.py synthetic_notes
# GLx32 pallas n=16.
set -x
cd /root/repo

try2() {
  timeout "$T1" "$@" || { sleep 90; timeout "$T2" "$@"; }
}

# A: deeper dilation
T1=2400 T2=3000 try2 python scripts/quality_long.py --steps 10000 --batch 32 --notes \
  --name dil8 --checkpoints_dir /tmp/r3_dil8 \
  --bottleneck_dilation 1,2,4,8
T1=1200 T2=1800 try2 python test.py --name dil8 --checkpoints_dir /tmp/r3_dil8 \
  --results_dir /tmp/r3_dil8_res --dataset_mode synthetic_notes \
  --how_many 16 --gl_backend pallas --which_epoch 10000 \
  --bottleneck_dilation 1,2,4,8
echo ARM_A_DONE

# B: capacity
T1=3000 T2=3600 try2 python scripts/quality_long.py --steps 10000 --batch 32 --notes \
  --name ngf96 --checkpoints_dir /tmp/r3_ngf96 \
  --bottleneck_dilation 1,2,4 --ngf 96
T1=1200 T2=1800 try2 python test.py --name ngf96 --checkpoints_dir /tmp/r3_ngf96 \
  --results_dir /tmp/r3_ngf96_res --dataset_mode synthetic_notes \
  --how_many 16 --gl_backend pallas --which_epoch 10000 \
  --bottleneck_dilation 1,2,4 --ngf 96
echo ARM_B_DONE

# C: hole weighting
T1=2400 T2=3000 try2 python scripts/quality_long.py --steps 10000 --batch 32 --notes \
  --name hw5 --checkpoints_dir /tmp/r3_hw5 \
  --bottleneck_dilation 1,2,4 --hole_weight 5
T1=1200 T2=1800 try2 python test.py --name hw5 --checkpoints_dir /tmp/r3_hw5 \
  --results_dir /tmp/r3_hw5_res --dataset_mode synthetic_notes \
  --how_many 16 --gl_backend pallas --which_epoch 10000 \
  --bottleneck_dilation 1,2,4
echo QUEUE8_DONE
