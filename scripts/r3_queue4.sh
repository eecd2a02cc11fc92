#!/bin/sh
# Round-3 phase 4: long-gap magnitude-sharpening sweep on the round-2
# long-gap checkpoint (/tmp/qlg10k), at GL x64 with the default
# bidirectional phase init. Complements the queue2 GL-iteration ladder:
# ladder picks the iteration count, this picks gamma. Waits for
# QUEUE3_DONE so it never contends with the 20k training run.
set -x
cd /root/repo
while ! grep -q QUEUE3_DONE /tmp/r3_queue3.log 2>/dev/null; do sleep 60; done

try2() {
  timeout 1200 "$@" || { sleep 90; timeout 1800 "$@"; }
}

for g in 1.2 1.5 2.0; do
  echo "=== long-gap mag_sharpen gamma=$g ==="
  try2 python test.py --name qlg10k --checkpoints_dir /tmp/qlg10k \
    --results_dir "/tmp/r3_lg_ms$g" --dataset_mode synthetic \
    --long_gap --how_many 32 --gl_backend pallas --gl_iters 64 \
    --mag_sharpen "$g" --which_epoch 10000
done
echo QUEUE4_DONE
