#!/bin/bash
# r4_chain — serialized round-4 compute program on the single TPU chip.
#
# The workspace wipe killed both /tmp AND checkpoints/, so the frozen G
# that queues 1-3 hard-link must be retrained first. Order:
#   1) r4_queue4: 40k best-stack notes G (gated+dil+onset) -> beststack40
#      (also re-logs its 30k/40k control evals; prior run scored 39.62)
#   2) r4_queue1: 40k magnitude refiner vs frozen beststack40 + eval ladder
#   3) r4_queue2: 40k HOLE-ONLY refiner + RePaint-clamp eval ladder
#   4) r4_queue3: long-gap G 10k + 40k COMPLEX-domain refiner + GL-free evals
# Each queue script gates its own evals on checkpoint existence (ADVICE r3)
# and appends durable results to scripts/quality_results.jsonl.
echo $$ > /tmp/q_r4_chain.pid
cd /root/repo || exit 1

# Wait for the TPU relay to answer a real compute RPC before starting
# (the 03:51 relay hang wedged a 40k run mid-step; devices() alone can
# succeed while compute hangs, so probe with an actual matmul).
until timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)); assert float((x @ x).sum()) > 0
print('tpu probe ok')
" 2>/dev/null; do
  echo "$(date -u +%H:%M:%S) tpu probe failed; retrying in 60s"
  sleep 60
done

bash scripts/r4_queue4.sh > /tmp/r4q4.log 2>&1
echo "=== queue4 rc=$? ==="
bash scripts/r4_queue1.sh > /tmp/r4q1.log 2>&1
echo "=== queue1 rc=$? ==="
bash scripts/r4_queue2.sh > /tmp/r4q2.log 2>&1
echo "=== queue2 rc=$? ==="
bash scripts/r4_queue3.sh > /tmp/r4q3.log 2>&1
echo "=== queue3 rc=$? ==="
echo R4_CHAIN_DONE
