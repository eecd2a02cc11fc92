#!/bin/sh
# Round-3 phase 21 (relaunch after /tmp wipe killed queue19C/queue20):
#   A. 20k dil+gated+onset stack — gated is the best 10k arm (38.53),
#      dil+onset the best 20k arm (38.79); stack all three and measure
#      at 10k/20k. Candidate new best notes recipe.
#   B. refiner follow-up (queue20's program): retrain the gated G is
#      covered by arm A's 10k milestone? No — arm A includes the onset
#      term; the refiner control must match queue18 (dil+gated, no
#      onset). Deferred to queue22 if wall clock allows.
set -x
cd /root/repo

try2() {
  timeout "$T1" "$@" || { sleep 90; timeout "$T2" "$@"; }
}

T1=3600 T2=3600 try2 python scripts/quality_long.py --steps 20000 --batch 32 \
  --notes --name gatestack --checkpoints_dir /tmp/r3_gatestack \
  --bottleneck_dilation 1,2,4 --gated --lambda_onset 50 --milestone 10000
T1=1500 T2=2100 try2 python test.py --name gatestack \
  --checkpoints_dir /tmp/r3_gatestack --results_dir /tmp/r3_gatestack_res20 \
  --dataset_mode synthetic_notes --how_many 16 --gl_backend pallas \
  --which_epoch 20000 --bottleneck_dilation 1,2,4 --gated
T1=1500 T2=2100 try2 python test.py --name gatestack \
  --checkpoints_dir /tmp/r3_gatestack --results_dir /tmp/r3_gatestack_res10 \
  --dataset_mode synthetic_notes --how_many 16 --gl_backend pallas \
  --which_epoch 10000 --bottleneck_dilation 1,2,4 --gated

echo QUEUE21_DONE
