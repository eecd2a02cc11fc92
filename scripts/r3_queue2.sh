#!/bin/sh
# Round-3 TPU queue, phase 2 (rewritten with wedge armor: every step
# runs under `timeout` and retries once — relay wedges of 20-30 min
# were observed on ~40% of eval launches this session).
set -x
cd /root/repo

try2() {
  timeout 1200 "$@" || { sleep 90; timeout 1800 "$@"; }
}

# Arm evals whose first attempts wedged.
try2 python test.py --name sc5 --checkpoints_dir /tmp/r3_sc5 \
  --results_dir /tmp/r3_sc5_res --dataset_mode synthetic_notes \
  --how_many 16 --gl_backend pallas --which_epoch 10000
try2 python test.py --name on50 --checkpoints_dir /tmp/r3_on50 \
  --results_dir /tmp/r3_on50_res --dataset_mode synthetic_notes \
  --how_many 16 --gl_backend pallas --which_epoch 10000

# av_cue fusion-edge experiment.
try2 python scripts/quality_long.py --steps 10000 --batch 32 --cue \
  --model av --name cue_av --checkpoints_dir /tmp/r3_cue_av
try2 python test.py --name cue_av --checkpoints_dir /tmp/r3_cue_av \
  --results_dir /tmp/r3_cue_av_res --dataset_mode synthetic_av_cue \
  --model av --how_many 32 --gl_backend pallas --which_epoch 10000

try2 python scripts/quality_long.py --steps 10000 --batch 32 --cue \
  --model audio --name cue_audio --checkpoints_dir /tmp/r3_cue_audio
try2 python test.py --name cue_audio --checkpoints_dir /tmp/r3_cue_audio \
  --results_dir /tmp/r3_cue_audio_res --dataset_mode synthetic_av_cue \
  --model audio --how_many 32 --gl_backend pallas --which_epoch 10000

# Long-gap GL-iteration ladder on the round-2 checkpoint.
for it in 32 64 128 256; do
  echo "=== long-gap GL ladder: gl_iters=$it ==="
  try2 python test.py --name qlg10k --checkpoints_dir /tmp/qlg10k \
    --results_dir "/tmp/r3_lg_gl$it" --dataset_mode synthetic \
    --long_gap --how_many 32 --gl_backend pallas --gl_iters "$it" \
    --which_epoch 10000
done
echo QUEUE2_DONE
