#!/bin/sh
# TPU VM launch helper — the deployment equivalent of the reference's
# slurm.sh + singularity + torch.distributed.launch (reference README.md:66).
#
# On a TPU VM / pod slice there are no per-GPU worker processes: one python
# process per host drives all local chips through a jax.sharding.Mesh, and
# multi-host slices coordinate through jax.distributed (initialized
# automatically on Cloud TPU).
#
# Usage: deploy/launch_tpu.sh <run-script> [args...]
#   deploy/launch_tpu.sh runs/nusc_spatiotemporal_imu_500ms.py --disable_wandb
set -e
cd "$(dirname "$0")/.."
SCRIPT="$1"; shift
exec python "$SCRIPT" "$@"
