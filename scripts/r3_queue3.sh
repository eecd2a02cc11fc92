#!/bin/sh
# Round-3 phase 3: combine the two winning onset levers (dilation +
# flux loss, NO spectral-convergence) at 10k, then the 20k run for the
# >=40 dB target. Waits for phase 2 (QUEUE2_DONE).
set -x
cd /root/repo
while ! grep -q QUEUE2_DONE /tmp/r3_queue2.log 2>/dev/null; do sleep 60; done

try2() {
  timeout 1800 "$@" || { sleep 90; timeout 2400 "$@"; }
}

try2 python scripts/quality_long.py --steps 10000 --batch 32 --notes \
  --name dilon --checkpoints_dir /tmp/r3_dilon \
  --bottleneck_dilation 1,2,4 --lambda_onset 50
try2 python test.py --name dilon --checkpoints_dir /tmp/r3_dilon \
  --results_dir /tmp/r3_dilon_res --dataset_mode synthetic_notes \
  --how_many 16 --gl_backend pallas --which_epoch 10000 \
  --bottleneck_dilation 1,2,4

try2 python scripts/quality_long.py --steps 20000 --batch 32 --notes \
  --name dil20 --checkpoints_dir /tmp/r3_dil20 \
  --bottleneck_dilation 1,2,4 --lambda_onset 50
try2 python test.py --name dil20 --checkpoints_dir /tmp/r3_dil20 \
  --results_dir /tmp/r3_dil20_res --dataset_mode synthetic_notes \
  --how_many 16 --gl_backend pallas --which_epoch 20000 \
  --bottleneck_dilation 1,2,4
echo QUEUE3_DONE
