#!/bin/bash
# r5_queue3 — SEED-ENSEMBLE of regression Gs (VERDICT r4 next-round
# #6a, the cheapest information-exploitation lever). The round-4 mix
# arms proved estimator errors decorrelate across independently-trained
# predictors (every G+R mix beat both pure streams); this queue tests
# the purest form: K independently-SEEDED best-stack Gs averaged in
# compressed-mag space (--ensemble_names, round-5 feature). Predicted
# +0.3–0.8 dB; target is any arm > 40 dB at n=64 with SEM.
#
# Trains two extra 40k best-stack Gs (seeds 11/23 vs beststack40's 0),
# then evaluates singles and 2-/3-member ensembles at n=64 matched
# masks. Waits for r5_queue2; per-arm gating + durable failure log.
echo $$ > /tmp/q_r5_3.pid
cd /root/repo || exit 1

while Q=$(cat /tmp/q_r5_2.pid 2>/dev/null) && [ -n "$Q" ] \
      && ps -p "$Q" -o cmd= 2>/dev/null | grep -qE "r5_|test\.py|quality_long"; do
  sleep 60
done

CKPT=/root/repo/checkpoints
FAILLOG=/root/repo/scripts/r5_failures.log

train_g() {  # train_g NAME SEED
  local name=$1 seed=$2
  if test -f "$CKPT/$name/40000_net_G.pth"; then
    echo "SKIP train $name (already at 40k)"
    return 0
  fi
  local RESUME=0 s
  for s in 30000 20000 10000; do
    if [ -d "$CKPT/$name/${s}_state" ]; then RESUME=$s; break; fi
  done
  if timeout 18000 python scripts/quality_long.py --steps 40000 --batch 32 \
       --notes --gated --bottleneck_dilation 1,2,4 --lambda_onset 50 \
       --seed "$seed" --name "$name" --checkpoints_dir "$CKPT" \
       --milestone 10000 --resume_step "$RESUME" \
       > "/tmp/r5_train_$name.log" 2>&1; then
    echo "OK train $name"
  else
    local rc=$?
    echo "FAIL train $name rc=$rc"
    { echo "=== train $name rc=$rc $(date -u +%FT%TZ) ==="
      tail -8 "/tmp/r5_train_$name.log"; } >> "$FAILLOG"
  fi
}

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

train_g bs40_s11 11
train_g bs40_s23 23

EVAL="--checkpoints_dir $CKPT --bottleneck_dilation 1,2,4 --gated --results_dir /tmp/r5q3_res --dataset_mode synthetic_notes --how_many 64 --gl_backend pallas --which_epoch 40000"

# Individual seeds at n=64 (both a baseline for the ensemble delta and
# two more replicates for the noise-floor estimate).
run_arm r5q3_s11_n64 3600 $CKPT/bs40_s11/40000_net_G.pth \
  $EVAL --name bs40_s11
run_arm r5q3_s23_n64 3600 $CKPT/bs40_s23/40000_net_G.pth \
  $EVAL --name bs40_s23
# The ensembles (beststack40 + extras), n=64 matched masks.
run_arm r5q3_ens2_n64 3600 $CKPT/bs40_s11/40000_net_G.pth \
  $EVAL --name beststack40 --ensemble_names bs40_s11
run_arm r5q3_ens3_n64 3600 $CKPT/bs40_s23/40000_net_G.pth \
  $EVAL --name beststack40 --ensemble_names bs40_s11,bs40_s23

echo R5_QUEUE3_DONE
