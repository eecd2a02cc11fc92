#!/bin/bash
# r4_queue5 — POSTERIOR-MEAN eval arms (--refine_avg) on the queue-1
# magnitude refiner (bs40r). Rationale: PSNR/SNR are MSE metrics whose
# Bayes-optimal answer is the posterior MEAN; a single diffusion sample
# sits ~posterior-width below it (sweep-1 and the first r4q1 arm both
# lost to the regression control for exactly this reason), while the
# K-sample average closes that gap at O(1/K). This is the missing
# estimator in the round-3/4 ladder: if the diffusion model's posterior
# is right, avg-K must BEAT the regression G (which is only an
# L1-median estimate); if it still loses, the objective-family thesis
# is refuted at the estimator level, not the sampler level.
#
# Runs strictly after the r4 chain (waits on its pid) so the single
# TPU chip is never contended. ADVICE r3 conventions: pid file,
# && gating, durable --log_results.
echo $$ > /tmp/q_r4_5.pid
cd /root/repo || exit 1

# Re-read each iteration + PID-reuse guard (see r4_queue6.sh).
while CHAIN_PID=$(cat /tmp/q_r4_chain.pid 2>/dev/null) && [ -n "$CHAIN_PID" ] \
      && ps -p "$CHAIN_PID" -o cmd= 2>/dev/null | grep -qE "r4_|test\.py|train_refiner|quality_long"; do
  sleep 60
done
set -x

CKPT=/root/repo/checkpoints
EVAL="--name bs40r --checkpoints_dir $CKPT --bottleneck_dilation 1,2,4 --gated --results_dir /tmp/r4q5_res --dataset_mode synthetic_notes --how_many 16 --gl_backend pallas --which_epoch 40000 --refiner"

test -f $CKPT/bs40r/40000_net_R.pth \
  && timeout 2400 python test.py $EVAL --refine_t 0.35 --refine_steps 8 --refine_avg 4 --log_results r4q5_ema_t035_s8_avg4 \
  && timeout 2400 python test.py $EVAL --refine_t 0.35 --refine_steps 8 --refine_avg 8 --log_results r4q5_ema_t035_s8_avg8 \
  && timeout 3000 python test.py $EVAL --refine_t 1.00 --refine_steps 16 --refine_avg 8 --log_results r4q5_ema_t100_s16_avg8 \
  && timeout 3000 python test.py $EVAL --refine_t 0.50 --refine_steps 8 --refine_avg 8 --log_results r4q5_ema_t050_s8_avg8 \
  && echo R4_QUEUE5_DONE

# Follow-ups to queue3's near-headline: complex-domain avg8 hit SNR
# 3.83 (GL control 2.27; the ORACLE-magnitude GL ceiling is 3.82).
# avg32 asks whether the model's posterior mean crosses the literal
# >4 dB criterion; the t0.5 arms anchor the chain on G's magnitude
# (zero-phase init) to try to hold hole-PSNR while keeping the SNR win.
CEVAL="--name lgap4 --checkpoints_dir $CKPT --long_gap --results_dir /tmp/r4q5_res --dataset_mode synthetic --how_many 16 --which_epoch 10000 --refiner --refiner_domain complex"
test -f $CKPT/lgap4/40000_net_R.pth \
  && timeout 4800 python test.py $CEVAL --refine_t 1.0 --refine_steps 16 --refine_avg 32 --log_results r4q5_cplx_t100_s16_avg32 \
  && timeout 1500 python test.py $CEVAL --refine_t 0.5 --refine_steps 16 --log_results r4q5_cplx_t050_s16 \
  && timeout 3000 python test.py $CEVAL --refine_t 0.5 --refine_steps 16 --refine_avg 8 --log_results r4q5_cplx_t050_s16_avg8 \
  && echo R4_QUEUE5B_DONE
