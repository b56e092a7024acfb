#!/bin/bash
# Serialized chip queue: saturate the headline model (train320 300->700
# epochs via auto-resume), then the final committed 940 sweep.
set -x
cd /root/repo
timeout 4000 python train_mod_siren.py \
  --config runs/results/train320/train320_2026-08-21_09-53-42/config.yaml \
  --set training.epochs=700 --set training.save_interval=100 \
  || exit 1
timeout 3000 python scripts/sweep940.py \
  --model-dir runs/results/train320/train320_2026-08-21_09-53-42 \
  || exit 2
