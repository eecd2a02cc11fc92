#!/bin/bash
# r5_queue6 — COMBINE the round-5 winners. The three information-
# exploitation levers ran independently (q3 seed-ensemble, q4
# self-cond R, q5 longer/wider R); this queue stacks them: the
# 3-seed ensemble G becomes the refiner's conditioning (make_infer_fn
# feeds the ensemble MEAN to R — train/step.py:503-516) and the mix
# blends ensemble-G with the refiner posterior mean. Every arm is
# n=64 matched masks (same seed/how_many → same mask stream), so
# scripts/analyze_r5.py pairs them per-clip against r5q3_ens3_n64 /
# r5q5_control_clips. Per-arm gating on checkpoints; failures tail
# into scripts/r5_failures.log.
echo $$ > /tmp/q_r5_6.pid
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

ENS="--ensemble_names bs40_s11,bs40_s23"
EVAL="--checkpoints_dir $CKPT --bottleneck_dilation 1,2,4 --gated --results_dir /tmp/r5q6_res --dataset_mode synthetic_notes --how_many 64 --gl_backend pallas --which_epoch 40000 --refiner --refine_clamp q --refine_t 0.35 --refine_steps 8 --refine_avg 8"

# Ensemble-conditioned refiner posterior mean (pure R stream), and the
# convex mix with the ensemble-G estimate. bs40r_ho's G IS beststack40's
# 40k G (copied at refiner-training time), so pairing vs r5q3_ens3_n64
# isolates exactly the refiner's contribution on top of the ensemble.
run_arm r5q6_ens3_ho_avg8_n64 7200 $CKPT/bs40_s23/40000_net_G.pth \
  $EVAL --name bs40r_ho $ENS
run_arm r5q6_ens3_mix07_avg8_n64 7200 $CKPT/bs40_s23/40000_net_G.pth \
  $EVAL --name bs40r_ho $ENS --refine_mix 0.7

# Same stack with the self-conditioned R (if q4's training landed).
run_arm r5q6_ens3_sc_mix07_avg8_n64 7200 $CKPT/bs40r_sc/40000_net_R.pth \
  $EVAL --name bs40r_sc $ENS --refine_selfcond --refine_mix 0.7

# Same stack with the 2.25x-capacity R (if q5's training landed).
run_arm r5q6_ens3_w96_mix07_avg8_n64 7200 $CKPT/bs40r_w96/40000_net_R.pth \
  $EVAL --name bs40r_w96 $ENS --rngf 96 --refine_mix 0.7

echo R5_QUEUE6_DONE
