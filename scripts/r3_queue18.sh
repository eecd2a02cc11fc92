#!/bin/sh
# Round-3 phase 18: diffusion-refiner verification + first experiment.
#
#   V. /verify recipe for the refiner surface on the real TPU:
#      quick train.py checkpoint → train_refiner.py stage-2 →
#      test.py with and without --refiner (the new CLI path must run
#      end-to-end and not crash; quality at 400 steps is not the point).
#   A. Stage-2 refiner against the queue17 gated notes G (10k steps),
#      then the refine_t / refine_noise sweep. The control (same G,
#      no refiner) is queue17 arm B's eval.
#
# Waits for queue17 via /tmp/q17.pid.
set -x
cd /root/repo

while kill -0 "$(cat /tmp/q17.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done

try2() {
  timeout "$T1" "$@" || { sleep 90; timeout "$T2" "$@"; }
}

# --- V: verify recipe ---
T1=900 T2=1200 try2 python train.py --name vref --dataset_mode synthetic \
  --niter 1 --niter_decay 0 --batchSize 16 --steps_per_epoch 400 \
  --save_epoch_freq 1 --checkpoints_dir /tmp/vref_ckpt --print_freq 200
T1=900 T2=1200 try2 python scripts/train_refiner.py --steps 400 --batch 16 \
  --pool_batches 16 --milestone 400 --name vref \
  --checkpoints_dir /tmp/vref_ckpt --which_epoch latest
T1=900 T2=1200 try2 python test.py --name vref --checkpoints_dir /tmp/vref_ckpt \
  --results_dir /tmp/vref_res_ctl --dataset_mode synthetic --how_many 16
T1=900 T2=1200 try2 python test.py --name vref --checkpoints_dir /tmp/vref_ckpt \
  --results_dir /tmp/vref_res --dataset_mode synthetic --how_many 16 \
  --refiner --refiner_epoch 400 --refine_steps 8 --refine_t 0.35
echo VERIFY_DONE

# --- A: refiner vs the gated notes G (10k) ---
T1=3600 T2=3600 try2 python scripts/train_refiner.py --steps 10000 --batch 32 \
  --notes --name gated --checkpoints_dir /tmp/r3_gated --which_epoch 10000 \
  --bottleneck_dilation 1,2,4 --gated

GFLAGS="--name gated --checkpoints_dir /tmp/r3_gated --dataset_mode synthetic_notes \
  --how_many 16 --gl_backend pallas --which_epoch 10000 \
  --bottleneck_dilation 1,2,4 --gated --refiner --refiner_epoch 10000"

T1=1500 T2=2100 try2 python test.py $GFLAGS --results_dir /tmp/r3_ref_t35 \
  --refine_steps 8 --refine_t 0.35
T1=1500 T2=2100 try2 python test.py $GFLAGS --results_dir /tmp/r3_ref_t20 \
  --refine_steps 8 --refine_t 0.2
T1=1500 T2=2100 try2 python test.py $GFLAGS --results_dir /tmp/r3_ref_t35n0 \
  --refine_steps 8 --refine_t 0.35 --refine_noise 0.0
T1=1500 T2=2100 try2 python test.py $GFLAGS --results_dir /tmp/r3_ref_t100 \
  --refine_steps 16 --refine_t 1.0

echo QUEUE18_DONE
