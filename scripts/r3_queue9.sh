#!/bin/sh
# Round-3 phase 9: the ambiguity-ceiling attribution arm. Train the
# EXACT recipe of the best 10k notes arm (dilation 1,2,4, hole_weight 3)
# on the deterministic notes_grid twin. If the grid corpus scores far
# above the random-onset corpus (38.26 dB at this recipe/steps), the
# notes plateau is irreducible onset/pitch ambiguity, not capacity --
# the information analogue of the --oracle_mag phase ceiling.
# Waits for QUEUE8_DONE.
set -x
cd /root/repo
while ! grep -q QUEUE8_DONE /tmp/r3_queue8.log 2>/dev/null; do sleep 60; done

try2() {
  timeout "$T1" "$@" || { sleep 90; timeout "$T2" "$@"; }
}

T1=2400 T2=3000 try2 python scripts/quality_long.py --steps 10000 --batch 32 \
  --notes_grid --name grid10 --checkpoints_dir /tmp/r3_grid10 \
  --bottleneck_dilation 1,2,4
T1=1200 T2=1800 try2 python test.py --name grid10 --checkpoints_dir /tmp/r3_grid10 \
  --results_dir /tmp/r3_grid10_res --dataset_mode synthetic_notes_grid \
  --how_many 16 --gl_backend pallas --which_epoch 10000 \
  --bottleneck_dilation 1,2,4
echo QUEUE9_DONE
