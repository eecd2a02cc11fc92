#!/bin/bash
# r5_queue4 — SELF-CONDITIONED refiner (VERDICT r4 next-round #6b) +
# quality-path bench presets (#7) + one transient-error rerun.
#
# Self-conditioning (Chen et al. 2023): R sees its own previous x̂0 as
# an extra input channel — a posterior-QUALITY lever, which is exactly
# where the Bayes-ceiling attribution (44.5 perfect-sampler vs 38.2-39
# realized single samples) says the headroom lives. Recipe mirrors
# bs40r_ho (the best round-4 refiner: hole-only + cond_drop 0.1 +
# clamp q) with --self_cond; evals at n=64 matched masks mirror
# r5_queue2 so deltas are paired.
echo $$ > /tmp/q_r5_4.pid
cd /root/repo || exit 1

while Q=$(cat /tmp/q_r5_3.pid 2>/dev/null) && [ -n "$Q" ] \
      && ps -p "$Q" -o cmd= 2>/dev/null | grep -qE "r5_|test\.py|quality_long|train_refiner"; do
  sleep 60
done

CKPT=/root/repo/checkpoints
FAILLOG=/root/repo/scripts/r5_failures.log

run_arm() {  # run_arm TAG TIMEOUT_S NEEDFILE ARGS...
  local tag=$1 to=$2 need=$3
  shift 3
  if ! test -f "$need"; then
    echo "SKIP $tag (no $need)"
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

# --- 1) rerun the queue-1 arm killed by a transient TPU
#        FAILED_PRECONDITION (see r5_failures.log; the identical code
#        path succeeded in the avg32 variant minutes later).
CEVAL="--name lgap4 --checkpoints_dir $CKPT --long_gap --results_dir /tmp/r5q4_res --dataset_mode synthetic --how_many 16 --which_epoch 10000 --refiner --refiner_domain complex"
run_arm r5q1_cplx_t100_s16_avg8_magkeep 3000 $CKPT/lgap4/40000_net_R.pth \
  $CEVAL --refine_t 1.0 --refine_steps 16 --refine_avg 8 --complex_mag keep

# --- 2) quality-path bench presets (VERDICT r4 #7) — durable JSONL.
#        Run BEFORE the long SC training: final round, the bench rows
#        must not be hostage to a 3h training run.
for p in refiner_mag refiner_complex hybrid; do
  if timeout 3600 python bench.py --preset $p \
       > /tmp/r5_bench_$p.log 2> /tmp/r5_bench_$p.err; then
    tail -1 /tmp/r5_bench_$p.log >> /root/repo/scripts/bench_quality_r5.jsonl
    echo "OK bench $p"
  else
    rc=$?
    echo "FAIL bench $p rc=$rc"
    { echo "=== bench $p rc=$rc $(date -u +%FT%TZ) ==="
      tail -8 /tmp/r5_bench_$p.err; } >> "$FAILLOG"
  fi
done

# --- 3) self-cond refiner training (frozen beststack40 G @ 40k).
mkdir -p $CKPT/bs40r_sc
for f in 40000_net_G.pth 40000_net_D.pth; do
  test -f $CKPT/bs40r_sc/$f || cp $CKPT/bs40r_ho/$f $CKPT/bs40r_sc/$f
done
if ! test -f $CKPT/bs40r_sc/40000_net_R.pth; then
  RESUME=0
  for s in 30000 20000 10000; do
    if [ -d $CKPT/bs40r_sc/R${s}_state ]; then RESUME=$s; break; fi
  done
  echo "queue4 refiner resume_step=$RESUME"
  if ! timeout 14400 python scripts/train_refiner.py --steps 40000 --batch 32 \
       --notes --name bs40r_sc --checkpoints_dir $CKPT \
       --bottleneck_dilation 1,2,4 --gated --which_epoch 40000 \
       --observed_weight 0.0 --cond_drop 0.1 --self_cond \
       --milestone 10000 --resume_step $RESUME \
       > /tmp/r5_train_bs40r_sc.log 2>&1; then
    rc=$?
    echo "FAIL train bs40r_sc rc=$rc"
    { echo "=== train bs40r_sc rc=$rc $(date -u +%FT%TZ) ==="
      tail -8 /tmp/r5_train_bs40r_sc.log; } >> "$FAILLOG"
  else
    echo "OK train bs40r_sc"
  fi
fi

# --- 4) self-cond evals, n=64 matched masks (pairs with r5_queue2).
EVAL="--name bs40r_sc --checkpoints_dir $CKPT --bottleneck_dilation 1,2,4 --gated --results_dir /tmp/r5q4_res --dataset_mode synthetic_notes --how_many 64 --gl_backend pallas --which_epoch 40000 --refiner --refine_selfcond --refine_clamp q"
run_arm r5q4_sc_t035_s8_n64 3600 $CKPT/bs40r_sc/40000_net_R.pth \
  $EVAL --refine_t 0.35 --refine_steps 8
run_arm r5q4_sc_t035_s8_avg8_n64 7200 $CKPT/bs40r_sc/40000_net_R.pth \
  $EVAL --refine_t 0.35 --refine_steps 8 --refine_avg 8
run_arm r5q4_sc_mix07_avg8_n64 7200 $CKPT/bs40r_sc/40000_net_R.pth \
  $EVAL --refine_t 0.35 --refine_steps 8 --refine_avg 8 --refine_mix 0.7

echo R5_QUEUE4_DONE
