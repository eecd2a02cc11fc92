#!/bin/bash
# r4_queue3 — the long-gap COMPLEX-DOMAIN program (VERDICT r3
# next-round #6): the one untried idea that attacks the 3.82 dB GL
# phase-recovery ceiling itself. Steps:
#   a) retrain a plain long-gap G 10k (round-2 recipe; the r2/r3
#      checkpoints died with /tmp) into the durable dir;
#   b) control eval (GL x64 pallas bidir) — expect ~39.2 hole-PSNR /
#      ~2.2 SNR per BENCHMARKS.md;
#   c) train the complex-domain refiner 40k against the frozen G;
#   d) eval ladder: GL-free complex decode, t_start=1 (full hole
#      generation), steps x clamp x guidance.
# Done criterion: any arm with waveform SNR > 4 dB beats the GL oracle
# ceiling -> headline; else a logged refutation in the house style.
echo $$ > /tmp/q_r4_3.pid
cd /root/repo || exit 1
set -x

CKPT=/root/repo/checkpoints
BASE="--name lgap4 --checkpoints_dir $CKPT --long_gap"
EVAL="$BASE --results_dir /tmp/r4q3_res --dataset_mode synthetic --how_many 16 --which_epoch 10000"
CEVAL="$EVAL --refiner --refiner_domain complex --refine_t 1.0"

# Auto-resume (both stages) from the newest saved milestones.
GRES=0
if [ -d $CKPT/lgap4/5000_state ]; then GRES=5000; fi
RRES=0
for s in 30000 20000 10000; do
  if [ -d $CKPT/lgap4/R${s}_state ]; then RRES=$s; break; fi
done
echo "queue3 g_resume=$GRES r_resume=$RRES"

timeout 7200 python scripts/quality_long.py --steps 10000 --batch 32 \
    --long_gap --name lgap4 --checkpoints_dir $CKPT --milestone 5000 \
    --resume_step $GRES \
  && test -f $CKPT/lgap4/10000_net_G.pth \
  && timeout 1500 python test.py $EVAL --gl_backend pallas --gl_iters 64 --log_results r4q3_control_gl64 \
  && timeout 14400 python scripts/train_refiner.py --steps 40000 --batch 32 \
       --long_gap $BASE --which_epoch 10000 --domain complex --cond_drop 0.1 --milestone 10000 \
       --resume_step $RRES \
  && test -f $CKPT/lgap4/40000_net_R.pth \
  && timeout 1500 python test.py $CEVAL --refine_steps 16 --log_results r4q3_cplx_t100_s16 \
  && timeout 1500 python test.py $CEVAL --refine_steps 32 --log_results r4q3_cplx_t100_s32 \
  && timeout 1500 python test.py $CEVAL --refine_steps 16 --refine_clamp q --log_results r4q3_cplx_q_t100_s16 \
  && timeout 1500 python test.py $CEVAL --refine_steps 16 --refine_guidance 1.0 --log_results r4q3_cplx_t100_s16_g1 \
  && timeout 1500 python test.py $CEVAL --refine_steps 16 --refine_noise 0.0 --log_results r4q3_cplx_t100_s16_det \
  && timeout 1500 python test.py $CEVAL --refine_steps 16 --refine_clamp q --refine_resample 2 --log_results r4q3_cplx_q_t100_s16_rs2 \
  && timeout 2400 python test.py $CEVAL --refine_steps 16 --eval_samples 4 --log_results r4q3_cplx_t100_s16_bo4 \
  && timeout 3000 python test.py $CEVAL --refine_steps 16 --refine_avg 8 --log_results r4q3_cplx_t100_s16_avg8 \
  && timeout 3000 python test.py $CEVAL --refine_steps 16 --refine_clamp q --refine_avg 8 --log_results r4q3_cplx_q_t100_s16_avg8 \
  && echo R4_QUEUE3_DONE
