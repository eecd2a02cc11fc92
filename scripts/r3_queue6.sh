#!/bin/sh
# Round-3 phase 6: (a) v9 final-OLA A/B probes at GL x32 and x64 —
# same-session pairs so relay-day variance cancels; (b) the verify
# recipe (quick train + test.py drive, both GL backends); (c) a
# dilation-ONLY 20k notes arm (dil20b) — the 10k sweep says the onset
# flux term costs ~0.6 dB on top of dilation, so the best-known arm
# at 20k is dilation alone. Waits for QUEUE5_DONE.
set -x
cd /root/repo
while ! grep -q QUEUE5_DONE /tmp/r3_queue5.log 2>/dev/null; do sleep 60; done

try2() {
  timeout "$T1" "$@" || { sleep 90; timeout "$T2" "$@"; }
}

# (a) probes: loop-vs-matmul final OLA, x32 then x64
for e in gl_f32_pallas_fused gl_f32_pallas_fused_fout \
         gl_f32_pallas_fused_it64 gl_f32_pallas_fused_fout_it64; do
  T1=900 T2=1200 try2 python scripts/tpu_probe.py "$e" 128
done
echo PROBES_DONE

# (b) verify recipe
T1=1200 T2=1800 try2 python train.py --name v9chk --dataset_mode synthetic \
  --niter 1 --niter_decay 0 --batchSize 16 --steps_per_epoch 400 \
  --save_epoch_freq 1 --checkpoints_dir /tmp/v9chk_ckpt --print_freq 200
T1=900 T2=1200 try2 python test.py --name v9chk --checkpoints_dir /tmp/v9chk_ckpt \
  --results_dir /tmp/v9chk_res --dataset_mode synthetic --how_many 16
T1=900 T2=1200 try2 python test.py --name v9chk --checkpoints_dir /tmp/v9chk_ckpt \
  --results_dir /tmp/v9chk_res_pl --dataset_mode synthetic --how_many 16 \
  --gl_backend pallas
echo VERIFY_DONE

# (c) dilation-only 20k arm
T1=3600 T2=4200 try2 python scripts/quality_long.py --steps 20000 --batch 32 --notes \
  --name dil20b --checkpoints_dir /tmp/r3_dil20b \
  --bottleneck_dilation 1,2,4
T1=1200 T2=1800 try2 python test.py --name dil20b --checkpoints_dir /tmp/r3_dil20b \
  --results_dir /tmp/r3_dil20b_res --dataset_mode synthetic_notes \
  --how_many 16 --gl_backend pallas --which_epoch 20000 \
  --bottleneck_dilation 1,2,4
echo QUEUE6_DONE
