#!/bin/sh
# Round-3 phase 19:
#   A. msd2 eval REDO with --num_D 2 — queue17 arm C's eval crashed on
#      checkpoint load because test.py rebuilt a single-scale D against
#      the multi-scale checkpoint (KeyError convs.0.bias). D is unused
#      at eval, but the orbax/pth template must match what was saved.
#   B. bench.py sanity on this machine (driver runs it again at round
#      end; this pins the same-day band).
#   C. 20k dil+gated+onset stack — queue17 showed gated is the best
#      10k arm (38.53 vs dil-only 38.26); stack it with the 20k-proven
#      onset term (dil+onset was 38.79 @20k) and measure at 10k/20k.
#
# Waits for queue18 via /tmp/q18.pid.
set -x
cd /root/repo

while kill -0 "$(cat /tmp/q18.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done

try2() {
  timeout "$T1" "$@" || { sleep 90; timeout "$T2" "$@"; }
}

# --- A: msd2 eval redo ---
T1=1500 T2=2100 try2 python test.py --name msd2 --checkpoints_dir /tmp/r3_msd2 \
  --results_dir /tmp/r3_msd2_res --dataset_mode synthetic_notes \
  --how_many 16 --gl_backend pallas --which_epoch 10000 \
  --bottleneck_dilation 1,2,4 --num_D 2

# --- B: bench sanity ---
T1=1200 T2=1500 try2 python bench.py

# --- C: 20k dil+gated+onset stack ---
T1=3600 T2=3600 try2 python scripts/quality_long.py --steps 20000 --batch 32 \
  --notes --name gatestack --checkpoints_dir /tmp/r3_gatestack \
  --bottleneck_dilation 1,2,4 --gated --lambda_onset 50 --milestone 10000
T1=1500 T2=2100 try2 python test.py --name gatestack \
  --checkpoints_dir /tmp/r3_gatestack --results_dir /tmp/r3_gatestack_res10 \
  --dataset_mode synthetic_notes --how_many 16 --gl_backend pallas \
  --which_epoch 10000 --bottleneck_dilation 1,2,4 --gated
T1=1500 T2=2100 try2 python test.py --name gatestack \
  --checkpoints_dir /tmp/r3_gatestack --results_dir /tmp/r3_gatestack_res20 \
  --dataset_mode synthetic_notes --how_many 16 --gl_backend pallas \
  --which_epoch 20000 --bottleneck_dilation 1,2,4 --gated

echo QUEUE19_DONE
