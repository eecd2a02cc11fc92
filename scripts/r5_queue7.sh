#!/bin/bash
# r5_queue7 (lean rewrite, ~4h of round left) — the wall-clock triage:
# the w96 (2-3h) and self-cond (1.5h) refiner TRAININGS cannot fit
# before the round deadline and would leave the chip busy when the
# driver's bench runs, so both are CUT (recorded in COVERAGE.md); the
# w96/ho80-mix arms in the running r5_queue5 were no-opped in place by
# a same-length edit. What remains, priority order:
#   0) the two paired-baseline reruns (both died in the 03:49-04:14
#      TPU-unavailable window) — they anchor every paired verdict;
#   1) the queue-6 winner-stack arms that need NO new training
#      (3-seed ensemble G conditioning the existing bs40r_ho refiner)
#      — the round's last headline candidates above ens3's 40.46;
#   2) the complex/hybrid quality benches at --batch 32 (the batch-128
#      runs OOM'd: 128 x chunk 8 = 1024 effective 256x256 images,
#      17.7G/15.75G HBM; 32 x 8 = 256 fits with margin).
# Per-arm gating on checkpoints; failure tails -> r5_failures.log.
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

# --- 0) paired-baseline reruns.
run_arm r5q5_control_clips 3600 $CKPT/beststack40/40000_net_G.pth \
  $GEVAL --name beststack40
run_arm r5q5_mix07_clips 7200 $CKPT/bs40r_ho/40000_net_R.pth \
  $GEVAL --name bs40r_ho --refiner --refine_clamp q --refine_t 0.35 \
  --refine_steps 8 --refine_avg 8 --refine_mix 0.7

# --- 1) ensemble-G conditioning the existing hole-only refiner.
ENS="--ensemble_names bs40_s11,bs40_s23"
EVAL="$GEVAL --refiner --refine_clamp q --refine_t 0.35 --refine_steps 8 --refine_avg 8"
run_arm r5q6_ens3_mix07_avg8_n64 7200 $CKPT/bs40_s23/40000_net_G.pth \
  $EVAL --name bs40r_ho $ENS --refine_mix 0.7
run_arm r5q6_ens3_ho_avg8_n64 7200 $CKPT/bs40_s23/40000_net_G.pth \
  $EVAL --name bs40r_ho $ENS

# --- 2) complex/hybrid quality benches, batch 32 (OOM fix).
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

# --- 3) if the ho80 training landed, its posterior-mean eval (the
#        "longer R training" lever answer) — queue5 runs this itself;
#        this is a belt-and-braces retry in case queue5's attempt hit
#        a transient (run_arm re-logs under the same tag; analyze_r5
#        takes the newest record per tag).
if ! grep -q '"tag": "r5q5_ho80_avg8_n64"' scripts/quality_results.jsonl; then
  run_arm r5q5_ho80_avg8_n64 7200 $CKPT/bs40r_ho80/80000_net_R.pth \
    $EVAL --name bs40r_ho80 --refiner_epoch 80000
fi

echo R5_QUEUE7_DONE
