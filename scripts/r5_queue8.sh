#!/bin/bash
# r5_queue8 — RECOVERY queue. The 2026-08-20 VM reboot wiped the
# (gitignored) checkpoints/ tree, so queue 7's decision arms all
# skipped on their NEEDFILE gates. This queue retrains the four nets
# the orphaned arms need — with the recipes copied verbatim from
# r4_queue4 (beststack40), r4_queue2 (bs40r_ho), r5_queue3 (seed Gs)
# so the retrained models are same-seed replicas — then runs the arms
# in headline-priority order:
#   beststack40 -> bs40r_ho -> paired control/mix07 reruns
#   -> bs40_s11 -> ens2-conditioned refiner arms (early, in case s23
#      doesn't fit) -> bs40_s23 -> the queue-6 ens3 headline arms.
# Per-arm gating; failure tails -> r5_failures.log.
echo $$ > /tmp/q_r5_8.pid
cd /root/repo || exit 1

CKPT=/root/repo/checkpoints
FAILLOG=/root/repo/scripts/r5_failures.log
mkdir -p "$CKPT"

train_g() {  # train_g NAME [SEED]
  local name=$1 seed=$2
  if test -f "$CKPT/$name/40000_net_G.pth"; then
    echo "SKIP train $name (already at 40k)"
    return 0
  fi
  local RESUME=0 s SEEDARG=""
  [ -n "$seed" ] && SEEDARG="--seed $seed"
  for s in 30000 20000 10000; do
    if [ -d "$CKPT/$name/${s}_state" ]; then RESUME=$s; break; fi
  done
  echo "train $name resume=$RESUME $(date -u +%T)"
  if timeout 10800 python scripts/quality_long.py --steps 40000 --batch 32 \
       --notes --gated --bottleneck_dilation 1,2,4 --lambda_onset 50 \
       $SEEDARG --name "$name" --checkpoints_dir "$CKPT" \
       --milestone 10000 --resume_step "$RESUME" \
       > "/tmp/r5_train_$name.log" 2>&1; then
    echo "OK train $name $(date -u +%T)"
  else
    local rc=$?
    echo "FAIL train $name rc=$rc"
    { echo "=== retrain $name rc=$rc $(date -u +%FT%TZ) ==="
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
    echo "OK $tag $(date -u +%T)"
  else
    local rc=$?
    echo "FAIL $tag rc=$rc"
    { echo "=== $tag rc=$rc $(date -u +%FT%TZ) ==="
      tail -8 "/tmp/r5_$tag.log"; } >> "$FAILLOG"
  fi
}

# --- 1) the single-G anchor (seed 0, flag-identical to r4_queue4).
train_g beststack40

# --- 2) the hole-only refiner on the frozen beststack40 G
#        (flag-identical to r4_queue2).
if ! test -f "$CKPT/bs40r_ho/40000_net_R.pth" \
   && test -f "$CKPT/beststack40/40000_net_G.pth"; then
  mkdir -p "$CKPT/bs40r_ho"
  for f in 40000_net_G.pth 40000_net_D.pth; do
    ln -f "$CKPT/beststack40/$f" "$CKPT/bs40r_ho/$f" 2>/dev/null
  done
  RESUME=0
  for s in 30000 20000 10000; do
    if [ -d "$CKPT/bs40r_ho/R${s}_state" ]; then RESUME=$s; break; fi
  done
  echo "train bs40r_ho resume=$RESUME $(date -u +%T)"
  if timeout 10800 python scripts/train_refiner.py --steps 40000 --batch 32 \
       --notes --name bs40r_ho --checkpoints_dir "$CKPT" \
       --bottleneck_dilation 1,2,4 --gated --which_epoch 40000 \
       --observed_weight 0.0 --cond_drop 0.1 --milestone 10000 \
       --resume_step "$RESUME" > /tmp/r5_train_bs40r_ho.log 2>&1; then
    echo "OK train bs40r_ho $(date -u +%T)"
  else
    rc=$?
    echo "FAIL train bs40r_ho rc=$rc"
    { echo "=== retrain bs40r_ho rc=$rc $(date -u +%FT%TZ) ==="
      tail -8 /tmp/r5_train_bs40r_ho.log; } >> "$FAILLOG"
  fi
fi

GEVAL="--checkpoints_dir $CKPT --bottleneck_dilation 1,2,4 --gated --results_dir /tmp/r5q8_res --dataset_mode synthetic_notes --how_many 64 --gl_backend pallas --which_epoch 40000"
REVAL="$GEVAL --refiner --refine_clamp q --refine_t 0.35 --refine_steps 8 --refine_avg 8"

# --- 3) the paired-baseline reruns (anchor every paired verdict).
run_arm r5q5_control_clips 3600 "$CKPT/beststack40/40000_net_G.pth" \
  $GEVAL --name beststack40
run_arm r5q5_mix07_clips 5400 "$CKPT/bs40r_ho/40000_net_R.pth" \
  $REVAL --name bs40r_ho --refine_mix 0.7

# --- 4) first extra seed, then the ens2-conditioned refiner arm
#        early (headline insurance in case s23 doesn't fit the window).
train_g bs40_s11 11
run_arm r5q8_ens2_mix07_avg8_n64 5400 "$CKPT/bs40_s11/40000_net_G.pth" \
  $REVAL --name bs40r_ho --ensemble_names bs40_s11 --refine_mix 0.7

# --- 5) second extra seed, then the queue-6 ens3 headline arms.
train_g bs40_s23 23
run_arm r5q6_ens3_mix07_avg8_n64 5400 "$CKPT/bs40_s23/40000_net_G.pth" \
  $REVAL --name bs40r_ho --ensemble_names bs40_s11,bs40_s23 --refine_mix 0.7
run_arm r5q6_ens3_ho_avg8_n64 5400 "$CKPT/bs40_s23/40000_net_G.pth" \
  $REVAL --name bs40r_ho --ensemble_names bs40_s11,bs40_s23

# --- 6) the ens3 pure-G rerun on the SAME retrained members (pairs
#        with the step-3/4/5 arms run this session, mask-matched).
run_arm r5q8_ens3_n64 3600 "$CKPT/bs40_s23/40000_net_G.pth" \
  $GEVAL --name beststack40 --ensemble_names bs40_s11,bs40_s23

echo R5_QUEUE8_DONE
