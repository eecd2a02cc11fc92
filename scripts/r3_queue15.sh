#!/bin/sh
# Round-3 phase 15: gated convolutions on the notes corpus + the
# notes train/eval-gap diagnostic (queue12 arm A redo — the dil20b
# checkpoints had been cleaned from /tmp; use the fresh notes40 ones).
#
# Gated convs (DeepFill-v2, --gated) are the one architecture-family
# lever the attribution matrix never covered: vanilla convs treat hole
# and observed pixels identically past layer 1; per-layer learned
# gates re-derive soft validity at every scale. On the dil 1,2,4 base
# arm (38.26 dB @10k) with matched pool/schedule/eval.
#
# Waits for queue14 via /tmp/q14.pid.
set -x
cd /root/repo

while kill -0 "$(cat /tmp/q14.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done

try2() {
  timeout "$T1" "$@" || { sleep 90; timeout "$T2" "$@"; }
}

# --- arm A: notes + dil 1,2,4 + gated convs ---
T1=3000 T2=3600 try2 python scripts/quality_long.py --steps 10000 --batch 32 \
  --notes --name gated --checkpoints_dir /tmp/r3_gated \
  --bottleneck_dilation 1,2,4 --gated
T1=1200 T2=1800 try2 python test.py --name gated --checkpoints_dir /tmp/r3_gated \
  --results_dir /tmp/r3_gated_res --dataset_mode synthetic_notes \
  --how_many 16 --gl_backend pallas --which_epoch 10000 \
  --bottleneck_dilation 1,2,4 --gated

# --- arm B: notes40 train-pool vs eval-unseen pre-GL probe ---
T1=900 T2=1200 try2 python scripts/grid_diag.py notes40 /tmp/r3_notes40 40000 \
  1,2,4 notes

echo QUEUE15_DONE
