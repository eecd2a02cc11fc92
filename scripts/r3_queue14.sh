#!/bin/sh
# Round-3 phase 14: multi-scale discriminator on the notes corpus.
#
# Completes the objective-family matrix started by queue13 (FM weights
# on a single-scale D): num_D=2 alone isolates the multi-scale
# adversary, num_D=2 + lambda_fm 10 is the full GAN-vocoder recipe
# (MelGAN: multi-scale D + FM). Both on the dil 1,2,4 base arm
# (38.26 dB @10k) with matched pool/schedule/eval.
#
# Waits for queue13 via /tmp/q13.pid.
set -x
cd /root/repo

while kill -0 "$(cat /tmp/q13.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done

try2() {
  timeout "$T1" "$@" || { sleep 90; timeout "$T2" "$@"; }
}

# --- arm A: notes + dil 1,2,4 + num_D 2 (multi-scale adversary alone) ---
T1=2700 T2=3300 try2 python scripts/quality_long.py --steps 10000 --batch 32 \
  --notes --name msd2 --checkpoints_dir /tmp/r3_msd2 \
  --bottleneck_dilation 1,2,4 --num_D 2
T1=1200 T2=1800 try2 python test.py --name msd2 --checkpoints_dir /tmp/r3_msd2 \
  --results_dir /tmp/r3_msd2_res --dataset_mode synthetic_notes \
  --how_many 16 --gl_backend pallas --which_epoch 10000 \
  --bottleneck_dilation 1,2,4

# --- arm B: notes + dil 1,2,4 + num_D 2 + lambda_fm 10 (full MelGAN recipe) ---
T1=2700 T2=3300 try2 python scripts/quality_long.py --steps 10000 --batch 32 \
  --notes --name msdfm --checkpoints_dir /tmp/r3_msdfm \
  --bottleneck_dilation 1,2,4 --num_D 2 --lambda_fm 10
T1=1200 T2=1800 try2 python test.py --name msdfm --checkpoints_dir /tmp/r3_msdfm \
  --results_dir /tmp/r3_msdfm_res --dataset_mode synthetic_notes \
  --how_many 16 --gl_backend pallas --which_epoch 10000 \
  --bottleneck_dilation 1,2,4

echo QUEUE14_DONE
