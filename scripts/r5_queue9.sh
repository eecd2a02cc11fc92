#!/bin/bash
# r5_queue9 — bench watcher. Waits for r5_queue8 (the post-reboot
# retrain/rerun queue) to free the chip, then runs the two quality-path
# bench presets that still have no row in bench_quality_r5.jsonl
# (refiner_complex, hybrid at batch 32 / refine_chunk 4 — the queue-7
# copies died in the 2026-08-20 reboot). Per-arm gating; failure tails
# -> r5_failures.log.
echo $$ > /tmp/q_r5_9.pid
cd /root/repo || exit 1
FAILLOG=/root/repo/scripts/r5_failures.log

# Wait for queue 8: re-read the pid file every iteration AND check the
# command line still matches (a recycled pid must not wedge us —
# observed round 4: a kworker took a dead queue's pid).
while :; do
  PID=$(cat /tmp/q_r5_8.pid 2>/dev/null)
  [ -z "$PID" ] && break
  CMD=$(ps -p "$PID" -o cmd= 2>/dev/null)
  case "$CMD" in
    *r5_queue8*) sleep 60 ;;
    *) break ;;
  esac
done
echo "queue8 done $(date -u +%T); starting benches"

for p in refiner_complex hybrid; do
  # Deadline guard: the driver runs the headline bench.py on the real
  # chip at round end (~13:00 UTC today); a quality bench still running
  # then would contaminate BENCH_r05's plateau. Skip rather than risk it.
  if [ "$(date -u +%H%M)" -ge 1225 ]; then
    echo "SKIP bench $p (past 12:25 UTC deadline guard)"
    continue
  fi
  if grep -q "$( [ $p = hybrid ] && echo 'mag-keep hybrid' \
                 || echo 'complex DDIM x16 avg8 GL-free decode)' )" \
       scripts/bench_quality_r5.jsonl 2>/dev/null; then
    echo "SKIP bench $p (row exists)"
    continue
  fi
  if timeout 2700 python bench.py --preset $p --batch 32 \
       > /tmp/r5_bench_$p.log 2> /tmp/r5_bench_$p.err; then
    tail -1 /tmp/r5_bench_$p.log >> /root/repo/scripts/bench_quality_r5.jsonl
    echo "OK bench $p"
  else
    rc=$?
    echo "FAIL bench $p rc=$rc"
    { echo "=== bench $p (q9 batch32) rc=$rc $(date -u +%FT%TZ) ==="
      tail -8 /tmp/r5_bench_$p.err; } >> "$FAILLOG"
  fi
done
echo R5_QUEUE9_DONE
