#!/bin/bash
# r4_queue8 — estimator ENSEMBLE arms (--refine_mix): convex blend of
# the regression G's hole (hole-PSNR 39.62 at 40k) and the hole-only
# refiner's avg-8 posterior mean (39.01, the best refiner estimate).
#
# Both estimate the same posterior mean with different error profiles;
# if their errors decorrelate at all, some interior mix strictly beats
# BOTH endpoints on MSE metrics (PSNR). Any arm > 39.62 is the round's
# first refiner-involved WIN and direct evidence the refiner carries
# information the regression lacks; a monotone-in-mix result refutes
# decorrelation and closes the ensemble lever too.
#
# Runs strictly after queue7 (waits on its pid). ADVICE r3 conventions.
echo $$ > /tmp/q_r4_8.pid
cd /root/repo || exit 1

# Re-read the pid file each iteration (rm releases the wait) and guard
# against PID reuse by checking the live process is one of ours.
while PREV_PID=$(cat /tmp/q_r4_7.pid 2>/dev/null) && [ -n "$PREV_PID" ] \
      && ps -p "$PREV_PID" -o cmd= 2>/dev/null | grep -qE "r4_|test\.py|train_refiner|quality_long"; do
  sleep 60
done
set -x

CKPT=/root/repo/checkpoints
EVAL="--name bs40r_ho --checkpoints_dir $CKPT --bottleneck_dilation 1,2,4 --gated --results_dir /tmp/r4q8_res --dataset_mode synthetic_notes --how_many 16 --gl_backend pallas --which_epoch 40000 --refiner --refine_clamp q --refine_t 0.35 --refine_steps 8 --refine_avg 8"

test -f $CKPT/bs40r_ho/40000_net_R.pth \
  && timeout 2400 python test.py $EVAL --refine_mix 0.3 --log_results r4q8_mix03_avg8 \
  && timeout 2400 python test.py $EVAL --refine_mix 0.5 --log_results r4q8_mix05_avg8 \
  && timeout 2400 python test.py $EVAL --refine_mix 0.7 --log_results r4q8_mix07_avg8 \
  && echo R4_QUEUE8_DONE
