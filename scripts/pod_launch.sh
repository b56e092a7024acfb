#!/usr/bin/env bash
# TPU pod-slice launcher — the TPU-native counterpart of the reference's
# practical_slurm_launcher.sh (1 node / 1 GPU sbatch). Runs the same
# command on every worker of a Cloud TPU VM pod slice; jax.distributed
# bootstraps from the TPU metadata and the framework's primary-host guard
# keeps artifact writes on worker 0.
#
# Usage:
#   scripts/pod_launch.sh <tpu-name> <zone> -- python train_mod_siren.py \
#       --config configs/train.yaml [--set training.continue_training=true]
#
# Auto-restart: wrap in a loop with continue_training=true — checkpoint
# discovery (newest run dir, highest step) resumes exactly like the
# reference's SLURM restart path.
set -euo pipefail

TPU_NAME=${1:?tpu name}
ZONE=${2:?zone}
shift 2
[ "${1:-}" = "--" ] && shift

exec gcloud compute tpus tpu-vm ssh "$TPU_NAME" \
  --zone "$ZONE" \
  --worker=all \
  --command "cd $(pwd) && $*"
