#!/bin/bash
# r4_chain2 — re-prioritized tail of the round-4 TPU program.
#
# The original pid-chain ordered q5 (confirmatory posterior-mean arms
# on the standard refiner) before the decision-bearing runs. With
# wall-clock finite, highest-expected-value first:
#   1) r4_queue6: L2-vs-L1 estimator fine-tunes (the in-family lever)
#   2) r4_queue7: 80k best-stack continuation (the 40 dB shot — the
#      corrected Bayes ceiling re-opened steps as a lever)
#   3) r4_queue8: regression+refiner ensemble (--refine_mix)
#   4) r4_queue5: standard-refiner avg arms (confirmatory, last)
# Each queue script still writes its own pid file and gates its evals;
# their internal PREV_PID waits fall through instantly because the old
# waiter pids are dead (this chain serializes them itself).
echo $$ > /tmp/q_r4_chain2.pid
cd /root/repo || exit 1

# Re-read each iteration + PID-reuse guard (a dead pid can be recycled
# by an unrelated process — observed live: a kworker took queue5's pid
# and wedged queue6's kill -0 wait forever).
while CHAIN_PID=$(cat /tmp/q_r4_chain.pid 2>/dev/null) && [ -n "$CHAIN_PID" ] \
      && ps -p "$CHAIN_PID" -o cmd= 2>/dev/null | grep -qE "r4_|test\.py|train_refiner|quality_long"; do
  sleep 60
done

bash scripts/r4_queue6.sh > /tmp/r4q6.log 2>&1
echo "=== queue6 rc=$? ==="
bash scripts/r4_queue7.sh > /tmp/r4q7.log 2>&1
echo "=== queue7 rc=$? ==="
bash scripts/r4_queue8.sh > /tmp/r4q8.log 2>&1
echo "=== queue8 rc=$? ==="
bash scripts/r4_queue5.sh > /tmp/r4q5.log 2>&1
echo "=== queue5 rc=$? ==="
echo R4_CHAIN2_DONE
