#!/bin/sh
# Round-3 phase 5 (relaunch after session loss): the dilon 10k training
# finished but its eval, the 20k dil20 run, and the long-gap
# mag_sharpen sweep never ran. This queue resumes exactly there.
set -x
cd /root/repo

try2() {
  timeout "$T1" "$@" || { sleep 90; timeout "$T2" "$@"; }
}

T1=1200 T2=1800 try2 python test.py --name dilon --checkpoints_dir /tmp/r3_dilon \
  --results_dir /tmp/r3_dilon_res --dataset_mode synthetic_notes \
  --how_many 16 --gl_backend pallas --which_epoch 10000 \
  --bottleneck_dilation 1,2,4

T1=3600 T2=4200 try2 python scripts/quality_long.py --steps 20000 --batch 32 --notes \
  --name dil20 --checkpoints_dir /tmp/r3_dil20 \
  --bottleneck_dilation 1,2,4 --lambda_onset 50
T1=1200 T2=1800 try2 python test.py --name dil20 --checkpoints_dir /tmp/r3_dil20 \
  --results_dir /tmp/r3_dil20_res --dataset_mode synthetic_notes \
  --how_many 16 --gl_backend pallas --which_epoch 20000 \
  --bottleneck_dilation 1,2,4

for g in 1.2 1.5 2.0; do
  echo "=== long-gap mag_sharpen gamma=$g ==="
  T1=1200 T2=1800 try2 python test.py --name qlg10k --checkpoints_dir /tmp/qlg10k \
    --results_dir "/tmp/r3_lg_ms$g" --dataset_mode synthetic \
    --long_gap --how_many 32 --gl_backend pallas --gl_iters 64 \
    --mag_sharpen "$g" --which_epoch 10000
done
echo QUEUE5_DONE
