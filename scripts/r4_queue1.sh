#!/bin/bash
# r4_queue1 — refiner quality program, arm 1 (VERDICT r3 next-round #1).
#
# Trains the magnitude-domain refiner 40k steps (4x sweep-1) against the
# BEST frozen notes G (retargeted after the r4_queue4 result: beststack40
# 40k gated+dil+onset, control hole-PSNR 39.62 — the original gatestack
# 20k target died with /tmp), with cond_drop 0.1 so the eval ladder can
# sweep CFG. Then the ladder: EMA vs raw x t_start x DDIM-steps x
# guidance x noise.
#
# ADVICE r3 conventions: pid file for chaining, durable checkpoint dir
# (/root/repo/checkpoints survives /tmp wipes), && gating so evals never
# run against a missing checkpoint, --log_results appends every eval to
# scripts/quality_results.jsonl (in-repo, durable).
echo $$ > /tmp/q_r4_1.pid
cd /root/repo || exit 1
set -x

CKPT=/root/repo/checkpoints
# Separate experiment dir with hard-linked G/D so net_R checkpoints
# stay per-arm (same convention as queue2).
mkdir -p $CKPT/bs40r
for f in 40000_net_G.pth 40000_net_D.pth opt.txt; do
  ln -f $CKPT/beststack40/$f $CKPT/bs40r/$f 2>/dev/null
done

BASE="--name bs40r --checkpoints_dir $CKPT --bottleneck_dilation 1,2,4 --gated"
EVAL="$BASE --results_dir /tmp/r4q1_res --dataset_mode synthetic_notes --how_many 16 --gl_backend pallas --which_epoch 40000 --refiner"

# Auto-resume from the newest R{N}_state milestone after a relay hang.
RESUME=0
for s in 30000 20000 10000; do
  if [ -d $CKPT/bs40r/R${s}_state ]; then RESUME=$s; break; fi
done
echo "queue1 resume_step=$RESUME"

timeout 10800 python scripts/train_refiner.py --steps 40000 --batch 32 --notes \
    $BASE --which_epoch 40000 --cond_drop 0.1 --milestone 10000 \
    --resume_step $RESUME \
  && test -f $CKPT/bs40r/40000_net_R.pth \
  && timeout 1500 python test.py $EVAL --refine_t 0.35 --refine_steps 8  --log_results r4q1_ema_t035_s8 \
  && timeout 1500 python test.py $EVAL --refine_t 0.20 --refine_steps 8  --log_results r4q1_ema_t020_s8 \
  && timeout 1500 python test.py $EVAL --refine_t 0.50 --refine_steps 8  --log_results r4q1_ema_t050_s8 \
  && timeout 1500 python test.py $EVAL --refine_t 0.35 --refine_steps 16 --log_results r4q1_ema_t035_s16 \
  && timeout 1500 python test.py $EVAL --refine_t 0.35 --refine_steps 8 --refiner_net Rraw --log_results r4q1_raw_t035_s8 \
  && timeout 1500 python test.py $EVAL --refine_t 0.35 --refine_steps 8 --refine_guidance 1.0 --log_results r4q1_ema_t035_s8_g1 \
  && timeout 1500 python test.py $EVAL --refine_t 0.35 --refine_steps 8 --refine_guidance 2.0 --log_results r4q1_ema_t035_s8_g2 \
  && timeout 1500 python test.py $EVAL --refine_t 0.35 --refine_steps 8 --refine_noise 0.0 --log_results r4q1_ema_t035_s8_det \
  && timeout 1500 python test.py $EVAL --refine_t 0.35 --refine_steps 8 --refine_resample 2 --log_results r4q1_ema_t035_s8_rs2 \
  && timeout 2400 python test.py $EVAL --refine_t 0.35 --refine_steps 8 --eval_samples 4 --log_results r4q1_ema_t035_s8_bo4 \
  && echo R4_QUEUE1_DONE
