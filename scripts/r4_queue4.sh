#!/bin/bash
# r4_queue4 — 40k full-best-stack notes run (VERDICT r3 next-round #9):
# the cheapest falsifier for "more steps alone clears 40 dB" vs "we
# need a new objective". Recipe = round-4 best (gated + dil 1,2,4 +
# onset 50; 39.17 at 20k).
#
# RERUN NOTE (2026-08-19): the original queue4 run completed and its
# 20k/30k/40k evals are logged (38.20/38.50/39.62 hole-PSNR), but the
# checkpoint was wiped with the workspace. This rerun exists ONLY to
# reproduce the frozen 40k G that queues 1-3 consume; the redundant
# 20k/30k evals are dropped and the single 40k eval is tagged
# *_retrain so the reproduction is checkable against 39.62.
echo $$ > /tmp/q_r4_4.pid
cd /root/repo || exit 1
set -x

CKPT=/root/repo/checkpoints
BASE="--name beststack40 --checkpoints_dir $CKPT --bottleneck_dilation 1,2,4 --gated"
EVAL="$BASE --results_dir /tmp/r4q4_res --dataset_mode synthetic_notes --how_many 16 --gl_backend pallas"

# Resume from the newest saved {N}_state milestone if one exists (the
# 03:51 relay hang killed the first attempt at 13.5k with a 10k state
# on disk; quality_long.py gained --resume_step for exactly this).
RESUME=0
for s in 30000 20000 10000; do
  if [ -d $CKPT/beststack40/${s}_state ]; then RESUME=$s; break; fi
done
echo "queue4 resume_step=$RESUME"

timeout 18000 python scripts/quality_long.py --steps 40000 --batch 32 --notes \
    --gated --bottleneck_dilation 1,2,4 --lambda_onset 50 \
    --name beststack40 --checkpoints_dir $CKPT --milestone 10000 \
    --resume_step $RESUME \
  && test -f $CKPT/beststack40/40000_net_G.pth \
  && timeout 1500 python test.py $EVAL --which_epoch 40000 --log_results r4q4_beststack_40k_retrain \
  && echo R4_QUEUE4_DONE
