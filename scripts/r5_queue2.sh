#!/bin/bash
# r5_queue2 — ERROR BARS for the notes headliners (VERDICT r4 #4).
#
# Round 4 quoted 0.01-dB-precision claims off n=16 evals whose own
# replicates (39.62 vs 39.24 retrain, 60k/80k < 40k) imply a ±0.3–0.5
# dB noise floor. This queue re-states every surviving headliner at
# n=64 matched masks (same --seed → same mask stream; 4× the clips
# halves the SEM twice), with cli/test.py's new per-clip SEM fields
# logged durably. gatestack (round 3) is NOT re-run: its checkpoint no
# longer exists on disk — only beststack-family numbers are restated.
#
# Waits for r5_queue1 (single chip); per-arm gating + durable failure
# log per VERDICT r4 #8.
echo $$ > /tmp/q_r5_2.pid
cd /root/repo || exit 1

while Q1=$(cat /tmp/q_r5_1.pid 2>/dev/null) && [ -n "$Q1" ] \
      && ps -p "$Q1" -o cmd= 2>/dev/null | grep -qE "r5_|test\.py|quality_long"; do
  sleep 60
done

CKPT=/root/repo/checkpoints
FAILLOG=/root/repo/scripts/r5_failures.log
EVAL="--checkpoints_dir $CKPT --bottleneck_dilation 1,2,4 --gated --results_dir /tmp/r5q2_res --dataset_mode synthetic_notes --how_many 64 --gl_backend pallas"

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

# The 39.62 headline and its trajectory tail.
run_arm r5q2_beststack_40k_n64 3600 $CKPT/beststack40/40000_net_G.pth \
  $EVAL --name beststack40 --which_epoch 40000
run_arm r5q2_beststack_80k_n64 3600 $CKPT/beststack40/80000_net_G.pth \
  $EVAL --name beststack40 --which_epoch 80000
# The best fine-tune arm (queue 6 winner).
run_arm r5q2_l1ft_55k_n64 3600 $CKPT/bs40_l1ft/55000_net_G.pth \
  $EVAL --name bs40_l1ft --which_epoch 55000
# The best estimator on a single G+R pair (queue 8 winner) and its
# pure-refiner control (queue 2's 39.01 posterior-mean headliner).
run_arm r5q2_mix07_avg8_n64 7200 $CKPT/bs40r_ho/40000_net_R.pth \
  $EVAL --name bs40r_ho --which_epoch 40000 --refiner --refine_clamp q \
  --refine_t 0.35 --refine_steps 8 --refine_avg 8 --refine_mix 0.7
run_arm r5q2_ho_avg8_n64 7200 $CKPT/bs40r_ho/40000_net_R.pth \
  $EVAL --name bs40r_ho --which_epoch 40000 --refiner --refine_clamp q \
  --refine_t 0.35 --refine_steps 8 --refine_avg 8

echo R5_QUEUE2_DONE
