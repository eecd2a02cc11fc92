#!/bin/sh
# Round-3 phase 10: the long-horizon arm. 30k steps of the best-known
# notes recipe (dilation 1,2,4 + lambda_onset 50) — quantifies the
# optimization-time slope past 20k (38.79 dB) and is the last
# training-side shot at the >=40 dB target before the ambiguity
# attribution closes the question. Waits for the post-queue9 bench
# confirmation to keep the TPU uncontended.
set -x
cd /root/repo
while ! grep -q BENCH_RC /tmp/bench_r3.err 2>/dev/null; do sleep 60; done

try2() {
  timeout "$T1" "$@" || { sleep 90; timeout "$T2" "$@"; }
}

T1=6000 T2=7200 try2 python scripts/quality_long.py --steps 30000 --batch 32 --notes \
  --name dil30 --checkpoints_dir /tmp/r3_dil30 \
  --bottleneck_dilation 1,2,4 --lambda_onset 50
T1=1200 T2=1800 try2 python test.py --name dil30 --checkpoints_dir /tmp/r3_dil30 \
  --results_dir /tmp/r3_dil30_res --dataset_mode synthetic_notes \
  --how_many 16 --gl_backend pallas --which_epoch 30000 \
  --bottleneck_dilation 1,2,4
echo QUEUE10_DONE
