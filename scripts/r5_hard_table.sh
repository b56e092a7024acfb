#!/bin/bash
# Hard-corpus ablation table (VERDICT r4 item 5): regenerate the quality
# protocol on phantoms with complex phase + k-space noise (SNR 32 dB) +
# tissue texture, then re-run the reference ablation/acceleration rows at
# the same 600-epoch budget. Serialized — one chip.
set -x
cd /root/repo
timeout 4000 python scripts/quality_run.py --root runs/quality_hard --epochs 600 \
  --phase --snr-db 32 --texture 0.18 || exit 1
timeout 14000 python scripts/results_run.py --epochs 600 \
  --quality-root runs/quality_hard --out-root runs/results_hard \
  --rows morlet,edge,residual,vgg,perceptual,acc_005_8,acc_01_6,acc_02_4 || exit 2
