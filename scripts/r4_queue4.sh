#!/bin/bash
# r4_queue4 — 40k full-best-stack notes run (VERDICT r3 next-round #9):
# the cheapest falsifier for "more steps alone clears 40 dB" vs "we
# need a new objective". Recipe = round-4 best (gated + dil 1,2,4 +
# onset 50; 39.17 at 20k). Evals at 30k and 40k.
echo $$ > /tmp/q_r4_4.pid
cd /root/repo || exit 1
set -x

CKPT=/root/repo/checkpoints
BASE="--name beststack40 --checkpoints_dir $CKPT --bottleneck_dilation 1,2,4 --gated"
EVAL="$BASE --results_dir /tmp/r4q4_res --dataset_mode synthetic_notes --how_many 16 --gl_backend pallas"

timeout 18000 python scripts/quality_long.py --steps 40000 --batch 32 --notes \
    --gated --bottleneck_dilation 1,2,4 --lambda_onset 50 \
    --name beststack40 --checkpoints_dir $CKPT --milestone 10000 \
  && test -f $CKPT/beststack40/40000_net_G.pth \
  && timeout 1500 python test.py $EVAL --which_epoch 30000 --log_results r4q4_beststack_30k \
  && timeout 1500 python test.py $EVAL --which_epoch 40000 --log_results r4q4_beststack_40k \
  && echo R4_QUEUE4_DONE
