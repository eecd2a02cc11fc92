#!/bin/sh
# Round-3 phase 7: oracle-magnitude ceiling attribution (test.py
# --oracle_mag): ground-truth magnitude through the SAME composite +
# phase-recovery + GL pipeline. eval(oracle) - eval(model) splits each
# corpus's quality gap into "magnitude model" vs "phase recovery".
# Waits for QUEUE6_DONE (dil20b checkpoint must exist).
set -x
cd /root/repo

try2() {
  timeout "$T1" "$@" || { sleep 90; timeout "$T2" "$@"; }
}

while ! grep -q QUEUE6_DONE /tmp/r3_queue6.log 2>/dev/null; do sleep 60; done

# Long-gap ceiling (r2 checkpoint, same eval as the GL ladder + queue5
# mag_sharpen arms: GLx64, bidirectional init)
T1=1200 T2=1800 try2 python test.py --name qlg10k --checkpoints_dir /tmp/qlg10k \
  --results_dir /tmp/r3_lg_oracle --dataset_mode synthetic \
  --long_gap --how_many 32 --gl_backend pallas --gl_iters 64 \
  --oracle_mag --which_epoch 10000

# Notes-corpus ceiling (dil20b checkpoint)
T1=1200 T2=1800 try2 python test.py --name dil20b --checkpoints_dir /tmp/r3_dil20b \
  --results_dir /tmp/r3_notes_oracle --dataset_mode synthetic_notes \
  --how_many 16 --gl_backend pallas --which_epoch 20000 \
  --bottleneck_dilation 1,2,4 --oracle_mag
echo QUEUE7_DONE
