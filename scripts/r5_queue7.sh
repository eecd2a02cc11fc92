#!/bin/bash
# r5_queue7 — replaces the killed r5_queue6 waiter and folds in the
# retry work from the relay-wedge casualties (r5_failures.log,
# 2026-08-20 ~03:2x): (0) the r5q5_control_clips paired-baseline rerun
# (transient TPU-unavailable), (1) the complex/hybrid quality benches
# at --batch 32 (batch 128 x chunk 8 = 1024 effective 256x256 images
# OOM'd at 17.7G/15.75G HBM; 32 x 8 = 256 effective fits with margin),
# (2) the bs40r_sc self-conditioned refiner retrain (died at startup on
# a relay connection-refused, zero milestones saved), (3) its three
# queue-4 eval arms, then (4) the full queue-6 winner-stack including
# the sc arm that would otherwise have been skipped. Priority order is
# cheap/decision-critical first so a late wall-clock cutoff loses the
# least. Per-arm gating on checkpoints; failure tails -> r5_failures.log.
echo $$ > /tmp/q_r5_7.pid
cd /root/repo || exit 1

while Q=$(cat /tmp/q_r5_5.pid 2>/dev/null) && [ -n "$Q" ] \
      && ps -p "$Q" -o cmd= 2>/dev/null | grep -qE "r5_|test\.py|quality_long|train_refiner|bench\.py"; do
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
  timeout "$to" python test.py "$@" --log_results "$tag" \
    > "/tmp/r5_$tag.log" 2>&1
  local rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "OK $tag"
  else
    echo "FAIL $tag rc=$rc"
    { echo "=== $tag rc=$rc $(date -u +%FT%TZ) ==="
      tail -8 "/tmp/r5_$tag.log"; } >> "$FAILLOG"
  fi
}

GEVAL="--checkpoints_dir $CKPT --bottleneck_dilation 1,2,4 --gated --results_dir /tmp/r5q7_res --dataset_mode synthetic_notes --how_many 64 --gl_backend pallas --which_epoch 40000"

# --- 0) paired-baseline reruns: BOTH r5q5 pairing arms died in the
#        03:49-04:14 TPU-unavailable window. These anchor every paired
#        verdict in analyze_r5.py, so they run first.
run_arm r5q5_control_clips 3600 $CKPT/beststack40/40000_net_G.pth \
  $GEVAL --name beststack40
run_arm r5q5_mix07_clips 7200 $CKPT/bs40r_ho/40000_net_R.pth \
  $GEVAL --name bs40r_ho --refiner --refine_clamp q --refine_t 0.35 \
  --refine_steps 8 --refine_avg 8 --refine_mix 0.7

# --- 1) complex/hybrid quality benches, batch 32 (OOM fix).
for p in refiner_complex hybrid; do
  timeout 3600 python bench.py --preset $p --batch 32 \
    > /tmp/r5_bench_$p.log 2> /tmp/r5_bench_$p.err
  rc=$?
  if [ "$rc" -eq 0 ]; then
    tail -1 /tmp/r5_bench_$p.log >> /root/repo/scripts/bench_quality_r5.jsonl
    echo "OK bench $p"
  else
    echo "FAIL bench $p rc=$rc"
    { echo "=== bench $p (batch32) rc=$rc $(date -u +%FT%TZ) ==="
      tail -8 /tmp/r5_bench_$p.err; } >> "$FAILLOG"
  fi
done

# --- 2) bs40r_sc self-cond refiner retrain (relay-wedge casualty).
mkdir -p $CKPT/bs40r_sc
for f in 40000_net_G.pth 40000_net_D.pth; do
  test -f $CKPT/bs40r_sc/$f || cp $CKPT/bs40r_ho/$f $CKPT/bs40r_sc/$f
done
if ! test -f $CKPT/bs40r_sc/40000_net_R.pth; then
  RESUME=0
  for s in 30000 20000 10000; do
    if [ -d $CKPT/bs40r_sc/R${s}_state ]; then RESUME=$s; break; fi
  done
  echo "queue7 sc refiner resume_step=$RESUME"
  timeout 14400 python scripts/train_refiner.py --steps 40000 --batch 32 \
    --notes --name bs40r_sc --checkpoints_dir $CKPT \
    --bottleneck_dilation 1,2,4 --gated --which_epoch 40000 \
    --observed_weight 0.0 --cond_drop 0.1 --self_cond \
    --milestone 10000 --resume_step $RESUME \
    > /tmp/r5_train_bs40r_sc.log 2>&1
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "OK train bs40r_sc"
  else
    echo "FAIL train bs40r_sc rc=$rc"
    { echo "=== train bs40r_sc rc=$rc $(date -u +%FT%TZ) ==="
      tail -8 /tmp/r5_train_bs40r_sc.log; } >> "$FAILLOG"
  fi
fi

# --- 3) self-cond evals, n=64 matched masks (pairs with r5_queue2/5).
SCEVAL="--name bs40r_sc $GEVAL --refiner --refine_selfcond --refine_clamp q"
run_arm r5q4_sc_t035_s8_n64 3600 $CKPT/bs40r_sc/40000_net_R.pth \
  $SCEVAL --refine_t 0.35 --refine_steps 8
run_arm r5q4_sc_t035_s8_avg8_n64 7200 $CKPT/bs40r_sc/40000_net_R.pth \
  $SCEVAL --refine_t 0.35 --refine_steps 8 --refine_avg 8
run_arm r5q4_sc_mix07_avg8_n64 7200 $CKPT/bs40r_sc/40000_net_R.pth \
  $SCEVAL --refine_t 0.35 --refine_steps 8 --refine_avg 8 --refine_mix 0.7

# --- 4) the queue-6 winner stack (ensemble-G conditioning the refiner).
ENS="--ensemble_names bs40_s11,bs40_s23"
EVAL="$GEVAL --refiner --refine_clamp q --refine_t 0.35 --refine_steps 8 --refine_avg 8"
run_arm r5q6_ens3_ho_avg8_n64 7200 $CKPT/bs40_s23/40000_net_G.pth \
  $EVAL --name bs40r_ho $ENS
run_arm r5q6_ens3_mix07_avg8_n64 7200 $CKPT/bs40_s23/40000_net_G.pth \
  $EVAL --name bs40r_ho $ENS --refine_mix 0.7
run_arm r5q6_ens3_sc_mix07_avg8_n64 7200 $CKPT/bs40r_sc/40000_net_R.pth \
  $EVAL --name bs40r_sc $ENS --refine_selfcond --refine_mix 0.7
run_arm r5q6_ens3_w96_mix07_avg8_n64 7200 $CKPT/bs40r_w96/40000_net_R.pth \
  $EVAL --name bs40r_w96 $ENS --rngf 96 --refine_mix 0.7

echo R5_QUEUE7_DONE
