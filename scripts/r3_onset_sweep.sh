#!/bin/sh
# Round-3 onset-limiter sweep on the polyphonic notes corpus.
# Baseline (round 2): hole-PSNR 37.46 @10k, 38.04 @20k (test.py
# synthetic_notes, GLx32 pallas, n=16). Target: >=40 dB @20k.
# Each arm: quality_long.py 10k steps batch 32 hole_weight 3 --notes,
# then the matched eval. Runs sequentially (single chip via relay).
set -x
cd /root/repo

run_arm() {
  name="$1"; shift
  train_extra="$1"; shift
  test_extra="$1"; shift
  python scripts/quality_long.py --steps 10000 --batch 32 --notes \
    --name "$name" --checkpoints_dir "/tmp/r3_$name" $train_extra \
    || return 1
  python test.py --name "$name" --checkpoints_dir "/tmp/r3_$name" \
    --results_dir "/tmp/r3_${name}_res" --dataset_mode synthetic_notes \
    --how_many 16 --gl_backend pallas --which_epoch 10000 $test_extra
}

run_arm sc5   "--lambda_sc 5"                          ""
run_arm on50  "--lambda_onset 50"                      ""
run_arm dil   "--bottleneck_dilation 1,2,4"            "--bottleneck_dilation 1,2,4"
run_arm combo "--lambda_sc 5 --lambda_onset 50 --bottleneck_dilation 1,2,4" "--bottleneck_dilation 1,2,4"
echo SWEEP_DONE
