#!/bin/sh
# Round-3 TPU queue, phase 2 — runs after r3_onset_sweep.sh.
# 1) av_cue fusion-edge experiment: AV model vs matched audio control
#    (10k steps each) on the vision-necessary corpus, matched evals.
# 2) Long-gap GL-iteration ladder on the surviving round-2 10k
#    checkpoint (/tmp/qlg10k): SNR vs gl_iters 32/64/128/256.
set -x
cd /root/repo

# Wait for the sweep to finish.
while ! grep -q SWEEP_DONE /tmp/r3_sweep.log 2>/dev/null; do sleep 60; done

# Retries of arm evals whose first attempts hit relay wedges.
python test.py --name sc5 --checkpoints_dir /tmp/r3_sc5 \
  --results_dir /tmp/r3_sc5_res --dataset_mode synthetic_notes \
  --how_many 16 --gl_backend pallas --which_epoch 10000
python test.py --name on50 --checkpoints_dir /tmp/r3_on50 \
  --results_dir /tmp/r3_on50_res --dataset_mode synthetic_notes \
  --how_many 16 --gl_backend pallas --which_epoch 10000

python scripts/quality_long.py --steps 10000 --batch 32 --cue \
  --model av --name cue_av --checkpoints_dir /tmp/r3_cue_av
python test.py --name cue_av --checkpoints_dir /tmp/r3_cue_av \
  --results_dir /tmp/r3_cue_av_res --dataset_mode synthetic_av_cue \
  --model av --how_many 32 --gl_backend pallas --which_epoch 10000

python scripts/quality_long.py --steps 10000 --batch 32 --cue \
  --model audio --name cue_audio --checkpoints_dir /tmp/r3_cue_audio
python test.py --name cue_audio --checkpoints_dir /tmp/r3_cue_audio \
  --results_dir /tmp/r3_cue_audio_res --dataset_mode synthetic_av_cue \
  --model audio --how_many 32 --gl_backend pallas --which_epoch 10000

for it in 32 64 128 256; do
  echo "=== long-gap GL ladder: gl_iters=$it ==="
  python test.py --name qlg10k --checkpoints_dir /tmp/qlg10k \
    --results_dir "/tmp/r3_lg_gl$it" --dataset_mode synthetic \
    --long_gap --how_many 32 --gl_backend pallas --gl_iters "$it" \
    --which_epoch 10000
done
echo QUEUE2_DONE
