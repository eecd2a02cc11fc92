#!/bin/bash
# r4_queue2 — refiner quality program, arm 2: HOLE-ONLY objective
# (VERDICT r3 next-round #1 "add a hole-only loss variant").
#
# Trains a second 40k refiner with observed_weight=0 (all capacity on
# the hole) + cond_drop 0.1, saved under a SEPARATE experiment name
# (retargeted at beststack40 40k per the r4_queue4 result; G/D copied so test.py finds G+R under one --name;
# hard-link to avoid 2x disk). Eval pairs it with --refine_clamp q
# (RePaint-style observed re-noising — the in-distribution context for
# a hole-only model) and sweeps t_start / guidance.
echo $$ > /tmp/q_r4_2.pid
cd /root/repo || exit 1
set -x

CKPT=/root/repo/checkpoints
# Separate experiment dir with hard-linked G so net_R files don't clash
# with queue1's.
mkdir -p $CKPT/bs40r_ho
for f in 40000_net_G.pth 40000_net_D.pth opt.txt; do
  ln -f $CKPT/beststack40/$f $CKPT/bs40r_ho/$f 2>/dev/null
done

BASE="--name bs40r_ho --checkpoints_dir $CKPT --bottleneck_dilation 1,2,4 --gated"
EVAL="$BASE --results_dir /tmp/r4q2_res --dataset_mode synthetic_notes --how_many 16 --gl_backend pallas --which_epoch 40000 --refiner --refine_clamp q"

# Auto-resume from the newest R{N}_state milestone after a relay hang.
RESUME=0
for s in 30000 20000 10000; do
  if [ -d $CKPT/bs40r_ho/R${s}_state ]; then RESUME=$s; break; fi
done
echo "queue2 resume_step=$RESUME"

timeout 10800 python scripts/train_refiner.py --steps 40000 --batch 32 --notes \
    $BASE --which_epoch 40000 --observed_weight 0.0 --cond_drop 0.1 --milestone 10000 \
    --resume_step $RESUME \
  && test -f $CKPT/bs40r_ho/40000_net_R.pth \
  && timeout 1500 python test.py $EVAL --refine_t 0.35 --refine_steps 8  --log_results r4q2_ho_q_t035_s8 \
  && timeout 1500 python test.py $EVAL --refine_t 0.20 --refine_steps 8  --log_results r4q2_ho_q_t020_s8 \
  && timeout 1500 python test.py $EVAL --refine_t 1.00 --refine_steps 16 --log_results r4q2_ho_q_t100_s16 \
  && timeout 1500 python test.py $EVAL --refine_t 0.35 --refine_steps 8 --refine_guidance 1.0 --log_results r4q2_ho_q_t035_s8_g1 \
  && timeout 1500 python test.py $EVAL --refine_t 0.35 --refine_steps 8 --refine_clamp x0 --log_results r4q2_ho_x0_t035_s8 \
  && timeout 1500 python test.py $EVAL --refine_t 0.35 --refine_steps 8 --refine_resample 2 --log_results r4q2_ho_q_t035_s8_rs2 \
  && timeout 1500 python test.py $EVAL --refine_t 1.00 --refine_steps 16 --refine_resample 2 --log_results r4q2_ho_q_t100_s16_rs2 \
  && timeout 2400 python test.py $EVAL --refine_t 1.00 --refine_steps 16 --eval_samples 4 --log_results r4q2_ho_q_t100_s16_bo4 \
  && timeout 2400 python test.py $EVAL --refine_t 0.35 --refine_steps 8 --refine_avg 8 --log_results r4q2_ho_q_t035_s8_avg8 \
  && timeout 3000 python test.py $EVAL --refine_t 1.00 --refine_steps 16 --refine_avg 8 --log_results r4q2_ho_q_t100_s16_avg8 \
  && echo R4_QUEUE2_DONE
