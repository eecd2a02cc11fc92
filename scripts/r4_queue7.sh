#!/bin/bash
# r4_queue7 — 80k continuation of the best-stack notes G.
#
# Rationale: the Bayes ceiling (scripts/bayes_ceiling.py, BENCHMARKS
# round-4 row) puts the reachable posterior-mean bound at 47.4 dB, so
# the 39.62-at-40k trajectory (38.20 -> 38.50 -> 39.62 over the last
# two 10k blocks — ACCELERATING, not saturating) still has ~8 dB of
# physically-reachable room. The cheapest credible path to the >=40 dB
# target is simply the next two doublings of the known-best recipe:
# resume beststack40 from its 40k orbax state and train to 80k with
# milestone evals at 60k/80k. (The "more steps alone" falsifier row in
# BENCHMARKS answered NO *for the 40k budget against the then-believed
# 58.5 ceiling*; the corrected ceiling re-opens steps as a lever.)
#
# Runs strictly after queue6 (waits on its pid). ADVICE r3 conventions.
echo $$ > /tmp/q_r4_7.pid
cd /root/repo || exit 1

# Re-read the pid file each iteration (rm releases the wait) and guard
# against PID reuse by checking the live process is one of ours.
while PREV_PID=$(cat /tmp/q_r4_6.pid 2>/dev/null) && [ -n "$PREV_PID" ] \
      && ps -p "$PREV_PID" -o cmd= 2>/dev/null | grep -qE "r4_|test\.py|train_refiner|quality_long"; do
  sleep 60
done
set -x

CKPT=/root/repo/checkpoints
STACK="--gated --bottleneck_dilation 1,2,4 --lambda_onset 50 --hole_weight 3.0"
EVAL="--name beststack40 --checkpoints_dir $CKPT --bottleneck_dilation 1,2,4 --gated --results_dir /tmp/r4q7_res --dataset_mode synthetic_notes --how_many 16 --gl_backend pallas"

RESUME=40000
for s in 70000 60000 50000; do
  if [ -d $CKPT/beststack40/${s}_state ]; then RESUME=$s; break; fi
done
echo "queue7 resume_step=$RESUME"

timeout 10800 python scripts/quality_long.py --steps 80000 --batch 32 --notes \
    --name beststack40 --checkpoints_dir $CKPT --milestone 10000 \
    --resume_step $RESUME \
    $STACK \
  && test -f $CKPT/beststack40/80000_net_G.pth \
  && timeout 1500 python test.py $EVAL --which_epoch 60000 --log_results r4q7_beststack_60k \
  && timeout 1500 python test.py $EVAL --which_epoch 80000 --log_results r4q7_beststack_80k \
  && echo R4_QUEUE7_DONE
