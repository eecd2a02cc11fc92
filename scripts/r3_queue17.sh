#!/bin/sh
# Round-3 phase 17: relaunch of the queue15/16 arms lost to the /tmp
# wipe between driver sessions (checkpoints and results were under
# /tmp/r3_*; the machine was recycled before the evals ran).
#
# Order by expected value:
#   A. long-gap + phase head  — the ONLY lever that can beat the
#      measured GL-class phase ceiling (oracle_mag: 3.82 dB SNR with
#      perfect magnitudes). Evals: model init vs extrapolate init at
#      matched magnitudes.
#   B. notes + dil 1,2,4 + gated convs — the one architecture-family
#      lever the attribution matrix never covered.
#   C. notes + dil 1,2,4 + num_D 2 (msd2) retrain + eval — the
#      queue14 training finished but both evals timed out and the
#      checkpoint is gone.
set -x
cd /root/repo

try2() {
  timeout "$T1" "$@" || { sleep 90; timeout "$T2" "$@"; }
}

# --- arm A: long-gap + phase head, 10k ---
T1=3600 T2=3600 try2 python scripts/quality_long.py --steps 10000 --batch 32 \
  --long_gap --name lgph --checkpoints_dir /tmp/r3_lgph --phase_head
T1=1800 T2=2100 try2 python test.py --name lgph --checkpoints_dir /tmp/r3_lgph \
  --results_dir /tmp/r3_lgph_res --dataset_mode synthetic --long_gap \
  --how_many 32 --gl_backend pallas --gl_iters 64 --which_epoch 10000 \
  --phase_head
T1=1800 T2=2100 try2 python test.py --name lgph --checkpoints_dir /tmp/r3_lgph \
  --results_dir /tmp/r3_lgph_res_ext --dataset_mode synthetic --long_gap \
  --how_many 32 --gl_backend pallas --gl_iters 64 --which_epoch 10000 \
  --phase_head --phase_init extrapolate

# --- arm B: notes + dil 1,2,4 + gated convs ---
T1=3600 T2=3600 try2 python scripts/quality_long.py --steps 10000 --batch 32 \
  --notes --name gated --checkpoints_dir /tmp/r3_gated \
  --bottleneck_dilation 1,2,4 --gated
T1=1800 T2=2100 try2 python test.py --name gated --checkpoints_dir /tmp/r3_gated \
  --results_dir /tmp/r3_gated_res --dataset_mode synthetic_notes \
  --how_many 16 --gl_backend pallas --which_epoch 10000 \
  --bottleneck_dilation 1,2,4 --gated

# --- arm C: notes + dil 1,2,4 + num_D 2, retrain + eval ---
T1=3600 T2=3600 try2 python scripts/quality_long.py --steps 10000 --batch 32 \
  --notes --name msd2 --checkpoints_dir /tmp/r3_msd2 \
  --bottleneck_dilation 1,2,4 --num_D 2
T1=1800 T2=2100 try2 python test.py --name msd2 --checkpoints_dir /tmp/r3_msd2 \
  --results_dir /tmp/r3_msd2_res --dataset_mode synthetic_notes \
  --how_many 16 --gl_backend pallas --which_epoch 10000 \
  --bottleneck_dilation 1,2,4

echo QUEUE17_DONE
