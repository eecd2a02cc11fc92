#!/bin/sh
# Round-3 phase 11: the corrected notes_grid attribution + the
# bottleneck self-attention lever.
#
# Post-mortem: quality_long.py's pool-style expression fell through to
# "harmonic" for --notes_grid, so the original grid10 arm TRAINED on
# the harmonic corpus and evaluated on notes_grid — its 28.7 dB
# "conv cannot copy" attribution is retracted. This queue re-runs the
# matched-recipe grid arm on the CORRECT pool (arm 1), then tests the
# attention hypothesis anyway (arm 2: does content-based copying help
# on the deterministic corpus?), and on the random notes corpus
# (arm 3, vs the 38.26 dB dilation-only reference).
set -x
cd /root/repo

try2() {
  timeout "$T1" "$@" || { sleep 90; timeout "$T2" "$@"; }
}

# --- arm 1: corrected grid baseline (dil 1,2,4, matched to notes) ---
T1=2400 T2=3000 try2 python scripts/quality_long.py --steps 10000 --batch 32 \
  --notes_grid --name gridf --checkpoints_dir /tmp/r3_gridf \
  --bottleneck_dilation 1,2,4
T1=1200 T2=1800 try2 python test.py --name gridf --checkpoints_dir /tmp/r3_gridf \
  --results_dir /tmp/r3_gridf_res --dataset_mode synthetic_notes_grid \
  --how_many 16 --gl_backend pallas --which_epoch 10000 \
  --bottleneck_dilation 1,2,4
T1=900 T2=1200 try2 python scripts/grid_diag.py gridf /tmp/r3_gridf 10000 \
  1,2,4 notes_grid

# --- arm 2: grid + self-attention (the copying mechanism) ---
T1=2400 T2=3000 try2 python scripts/quality_long.py --steps 10000 --batch 32 \
  --notes_grid --name gridattn --checkpoints_dir /tmp/r3_gridattn \
  --bottleneck_dilation 1,2,4 --bottleneck_attn 2
T1=1200 T2=1800 try2 python test.py --name gridattn \
  --checkpoints_dir /tmp/r3_gridattn --results_dir /tmp/r3_gridattn_res \
  --dataset_mode synthetic_notes_grid --how_many 16 --gl_backend pallas \
  --which_epoch 10000 --bottleneck_dilation 1,2,4 --bottleneck_attn 2

# --- arm 3: random notes + self-attention (vs 38.26 dil-only) ---
T1=2400 T2=3000 try2 python scripts/quality_long.py --steps 10000 --batch 32 \
  --notes --name notesattn --checkpoints_dir /tmp/r3_notesattn \
  --bottleneck_dilation 1,2,4 --bottleneck_attn 2
T1=1200 T2=1800 try2 python test.py --name notesattn \
  --checkpoints_dir /tmp/r3_notesattn --results_dir /tmp/r3_notesattn_res \
  --dataset_mode synthetic_notes --how_many 16 --gl_backend pallas \
  --which_epoch 10000 --bottleneck_dilation 1,2,4 --bottleneck_attn 2

echo QUEUE11_DONE
