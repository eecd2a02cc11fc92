#!/bin/sh
# Round-3 phase 16: redo the msd2 eval (both queue14 attempts timed out
# under TPU contention) + the phase-head long-gap arm — the lever the
# oracle attribution says is the ONLY one that can move the long-gap
# waveform-SNR ceiling (GL-class recovery caps at 3.82 dB with perfect
# magnitudes; a predicted phase is not GL-class).
#
# Waits for queue15 via /tmp/q15.pid.
set -x
cd /root/repo

while kill -0 "$(cat /tmp/q15.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done

try2() {
  timeout "$T1" "$@" || { sleep 90; timeout "$T2" "$@"; }
}

# --- arm A: msd2 eval redo ---
T1=1500 T2=2100 try2 python test.py --name msd2 --checkpoints_dir /tmp/r3_msd2 \
  --results_dir /tmp/r3_msd2_res --dataset_mode synthetic_notes \
  --how_many 16 --gl_backend pallas --which_epoch 10000 \
  --bottleneck_dilation 1,2,4

# --- arm B: long-gap + phase head, 10k ---
T1=3000 T2=3600 try2 python scripts/quality_long.py --steps 10000 --batch 32 \
  --long_gap --name lgph --checkpoints_dir /tmp/r3_lgph --phase_head
# Eval 1: model-phase init + GL x64 refinement (product auto path).
T1=1500 T2=2100 try2 python test.py --name lgph --checkpoints_dir /tmp/r3_lgph \
  --results_dir /tmp/r3_lgph_res --dataset_mode synthetic --long_gap \
  --how_many 32 --gl_backend pallas --gl_iters 64 --which_epoch 10000 \
  --phase_head
# Eval 2: same checkpoint, extrapolate init (ablates the head's phase
# against the bidir phase-vocoder baseline at matched magnitudes).
T1=1500 T2=2100 try2 python test.py --name lgph --checkpoints_dir /tmp/r3_lgph \
  --results_dir /tmp/r3_lgph_res_ext --dataset_mode synthetic --long_gap \
  --how_many 32 --gl_backend pallas --gl_iters 64 --which_epoch 10000 \
  --phase_head --phase_init extrapolate

echo QUEUE16_DONE
