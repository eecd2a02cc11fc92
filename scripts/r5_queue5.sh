#!/bin/bash
# r5_queue5 — remaining information-exploitation levers (VERDICT r4
# next-round #6c): (a) LONGER refiner training — continue bs40r_ho
# 40k → 80k (its v-MSE was still falling at 0.00136); (b) 2.25×
# capacity — a fresh rngf-96 hole-only refiner at 40k. Each trains
# with 10k milestones so whatever exists when the round ends is
# eval-able; evals gate on files and skip gracefully.
#
# Context for the bar: at n=64 the 40k rngf-64 hole-only refiner's
# posterior mean (avg8) already reads 39.76 ± 1.25 — statistical
# parity with the 39.68 regression control. A better POSTERIOR
# (longer training / more capacity / self-cond, each attacking the
# 44.5 dB perfect-sampler bound) is the only remaining route past it.
echo $$ > /tmp/q_r5_5.pid
cd /root/repo || exit 1

while Q=$(cat /tmp/q_r5_4.pid 2>/dev/null) && [ -n "$Q" ] \
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

train_r() {  # train_r NAME STEPS EXTRA_ARGS...
  local name=$1 steps=$2
  shift 2
  if test -f "$CKPT/$name/${steps}_net_R.pth"; then
    echo "SKIP train $name (already at ${steps})"
    return
  fi
  mkdir -p "$CKPT/$name"
  for f in 40000_net_G.pth 40000_net_D.pth; do
    test -f "$CKPT/$name/$f" || cp "$CKPT/bs40r_ho/$f" "$CKPT/$name/$f"
  done
  local RESUME=0 s
  for s in 70000 60000 50000 40000 30000 20000 10000; do
    if [ "$s" -lt "$steps" ] && [ -d "$CKPT/$name/R${s}_state" ]; then
      RESUME=$s; break
    fi
  done
  echo "train $name steps=$steps resume=$RESUME"
  if timeout 14400 python scripts/train_refiner.py --steps "$steps" \
       --batch 32 --notes --name "$name" --checkpoints_dir "$CKPT" \
       --bottleneck_dilation 1,2,4 --gated --which_epoch 40000 \
       --observed_weight 0.0 --cond_drop 0.1 --milestone 10000 \
       --resume_step "$RESUME" "$@" \
       > "/tmp/r5_train_$name.log" 2>&1; then
    echo "OK train $name"
  else
    local rc=$?
    echo "FAIL train $name rc=$rc"
    { echo "=== train $name rc=$rc $(date -u +%FT%TZ) ==="
      tail -8 "/tmp/r5_train_$name.log"; } >> "$FAILLOG"
  fi
}

EVAL="--checkpoints_dir $CKPT --bottleneck_dilation 1,2,4 --gated --results_dir /tmp/r5q5_res --dataset_mode synthetic_notes --how_many 64 --gl_backend pallas --which_epoch 40000 --refiner --refine_clamp q"
GEVAL="--checkpoints_dir $CKPT --bottleneck_dilation 1,2,4 --gated --results_dir /tmp/r5q5_res --dataset_mode synthetic_notes --how_many 64 --gl_backend pallas --which_epoch 40000"

# (0) PAIRED reruns of the two n=64 headliners: the r5q2 records
#     predate per-clip logging, so the mix07-vs-control comparison has
#     no paired statistic yet. Same seed/how_many → same mask stream →
#     scripts/paired_delta.py r5q5_mix07_clips r5q5_control_clips.
run_arm r5q5_control_clips 3600 $CKPT/beststack40/40000_net_G.pth \
  $GEVAL --name beststack40
run_arm r5q5_mix07_clips 7200 $CKPT/bs40r_ho/40000_net_R.pth \
  $EVAL --name bs40r_ho --refine_t 0.35 --refine_steps 8 \
  --refine_avg 8 --refine_mix 0.7

# (a) longer training: bs40r_ho 40k -> 80k (orbax resume from
#     R40000_state; cosine lr restarts over the 80k horizon).
mkdir -p $CKPT/bs40r_ho80
for f in 40000_net_G.pth 40000_net_D.pth; do
  test -f $CKPT/bs40r_ho80/$f || cp $CKPT/bs40r_ho/$f $CKPT/bs40r_ho80/$f
done
for d in $CKPT/bs40r_ho/R*_state; do
  b=$(basename "$d")
  test -d "$CKPT/bs40r_ho80/$b" || cp -r "$d" "$CKPT/bs40r_ho80/$b"
done
train_r bs40r_ho80 80000
run_arm r5q5_ho80_avg8_n64 7200 $CKPT/bs40r_ho80/80000_net_R.pth \
  $EVAL --name bs40r_ho80 --refiner_epoch 80000 \
  --refine_t 0.35 --refine_steps 8 --refine_avg 8
: x_arm r5q5_ho80_mix07_avg8_n64 7200 $CKPT/bs40r_ho80/80000_net_R.pth \
  $EVAL --name bs40r_ho80 --refiner_epoch 80000 \
  --refine_t 0.35 --refine_steps 8 --refine_avg 8 --refine_mix 0.7

# (b) capacity: fresh rngf-96 (2.25x params) hole-only refiner, 40k.
: #w96cut bs40r_w96 40k --rngf 96
: x_arm r5q5_w96_avg8_n64 7200 $CKPT/bs40r_w96/40000_net_R.pth \
  $EVAL --name bs40r_w96 --rngf 96 \
  --refine_t 0.35 --refine_steps 8 --refine_avg 8
: x_arm r5q5_w96_mix07_avg8_n64 7200 $CKPT/bs40r_w96/40000_net_R.pth \
  $EVAL --name bs40r_w96 --rngf 96 \
  --refine_t 0.35 --refine_steps 8 --refine_avg 8 --refine_mix 0.7

echo R5_QUEUE5_DONE
