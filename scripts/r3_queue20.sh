#!/bin/sh
# Round-3 phase 20: refiner follow-up — t_max-concentrated training.
# Sweep 1 (queue18) lost to the regression control on every arm with a
# 10k refiner trained on t~U(0,1). Two confounds to remove before the
# refutation is final: (a) capacity spent on t in (0.5, 1] is wasted
# for truncated refinement; (b) 10k steps is little for a diffusion
# model. One arm: t_max 0.5, 30k steps, then the two best-eval settings.
#
# Waits for queue19 via /tmp/q19.pid.
set -x
cd /root/repo

while kill -0 "$(cat /tmp/q19.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done

try2() {
  timeout "$T1" "$@" || { sleep 90; timeout "$T2" "$@"; }
}

T1=3600 T2=3600 try2 python scripts/train_refiner.py --steps 30000 --batch 32 \
  --notes --name gated --checkpoints_dir /tmp/r3_gated --which_epoch 10000 \
  --bottleneck_dilation 1,2,4 --gated --t_max 0.5 --milestone 15000

GFLAGS="--name gated --checkpoints_dir /tmp/r3_gated --dataset_mode synthetic_notes \
  --how_many 16 --gl_backend pallas --which_epoch 10000 \
  --bottleneck_dilation 1,2,4 --gated --refiner --refiner_epoch 30000"

T1=1500 T2=2100 try2 python test.py $GFLAGS --results_dir /tmp/r3_ref2_t35n0 \
  --refine_steps 8 --refine_t 0.35 --refine_noise 0.0
T1=1500 T2=2100 try2 python test.py $GFLAGS --results_dir /tmp/r3_ref2_t20 \
  --refine_steps 8 --refine_t 0.2
T1=1500 T2=2100 try2 python test.py $GFLAGS --results_dir /tmp/r3_ref2_t20n0s4 \
  --refine_steps 4 --refine_t 0.2 --refine_noise 0.0

echo QUEUE20_DONE
