#!/bin/bash
# r5_queue1 — the round-4 ORPHANED DECISION ARMS (VERDICT r4 next-round
# #1) plus the round-5 HYBRID decode arms (#2), on the lgap4 long-gap
# complex-domain refiner.
#
# Context: queue 3's complex posterior mean (avg8) hit waveform SNR
# 3.83 ≈ the 3.82 GL-oracle ceiling but collapsed hole-PSNR to 26.9 via
# magnitude shrinkage. Round 4 queued avg32 + t0.5-anchored arms to ask
# whether the learned decode CROSSES 4 dB; avg32's full-K vmap OOM'd at
# compile (17.31 G needed / 15.75 G HBM) and the && chain silently
# dropped the rest. Round 5 fixed the cliff (--refine_chunk, chunked
# posterior mean) and adds --complex_mag keep/mean — phase from the
# posterior mean, magnitude from G / E[|x|] — to try to win BOTH axes.
#
# Queue hygiene (VERDICT r4 weak #2 / next-round #8): every arm is
# INDEPENDENTLY gated on the checkpoint, never on the previous arm's
# rc; nonzero rc appends the stderr tail to a durable in-repo log so a
# compile failure can never again be invisible.
echo $$ > /tmp/q_r5_1.pid
cd /root/repo || exit 1

CKPT=/root/repo/checkpoints
FAILLOG=/root/repo/scripts/r5_failures.log

run_arm() {  # run_arm TAG TIMEOUT_S ARGS...
  local tag=$1 to=$2
  shift 2
  if ! test -f "$CKPT/lgap4/40000_net_R.pth"; then
    echo "SKIP $tag (no checkpoint)"
    return
  fi
  if timeout "$to" python test.py "$@" --log_results "$tag" \
       > "/tmp/r5_$tag.log" 2>&1; then
    echo "OK $tag"
  else
    local rc=$?
    echo "FAIL $tag rc=$rc"
    { echo "=== $tag rc=$rc $(date -u +%FT%TZ) ==="
      tail -8 "/tmp/r5_$tag.log"; } >> "$FAILLOG"
  fi
}

CEVAL="--name lgap4 --checkpoints_dir $CKPT --long_gap --results_dir /tmp/r5q1_res --dataset_mode synthetic --how_many 16 --which_epoch 10000 --refiner --refiner_domain complex"

# 1) The orphaned avg32 decision arm: does the posterior mean cross
#    4 dB SNR? (chunked: peak HBM = 8×B regardless of K=32)
run_arm r5q1_cplx_t100_s16_avg32 6000 $CEVAL --refine_t 1.0 --refine_steps 16 --refine_avg 32
# 2) The orphaned t0.5 anchor arms (chain anchored on G's magnitude).
run_arm r5q1_cplx_t050_s16       1800 $CEVAL --refine_t 0.5 --refine_steps 16
run_arm r5q1_cplx_t050_s16_avg8  3000 $CEVAL --refine_t 0.5 --refine_steps 16 --refine_avg 8
# 3) HYBRID decode (round-5 #2): phase from the posterior mean,
#    magnitude from G ('keep') or E[|x|] over the samples ('mean').
#    Target: hole-PSNR ~39 AND SNR >= 3.5 simultaneously.
run_arm r5q1_cplx_t100_s16_avg8_magkeep  3000 $CEVAL --refine_t 1.0 --refine_steps 16 --refine_avg 8 --complex_mag keep
run_arm r5q1_cplx_t100_s16_avg8_magmean  3000 $CEVAL --refine_t 1.0 --refine_steps 16 --refine_avg 8 --complex_mag mean
run_arm r5q1_cplx_t100_s16_avg32_magkeep 6000 $CEVAL --refine_t 1.0 --refine_steps 16 --refine_avg 32 --complex_mag keep
run_arm r5q1_cplx_t100_s16_avg32_magmean 6000 $CEVAL --refine_t 1.0 --refine_steps 16 --refine_avg 32 --complex_mag mean

echo R5_QUEUE1_DONE
