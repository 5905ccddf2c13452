#!/bin/sh
# TPU VM launch helper — the deployment equivalent of the reference's
# slurm.sh + singularity + torch.distributed.launch (reference README.md:66).
#
# One python process per HOST drives all local chips through a
# jax.sharding.Mesh. Multi-host slices coordinate through
# jax.distributed.initialize(), wired by future_od_tpu/parallel/distributed.py:
#   - Cloud TPU pod:   pass --dist_coordinator auto   (jax auto-discovers)
#   - Generic cluster: pass --dist_coordinator host:port
#                           --dist_num_processes N --dist_process_id I
#   - SLURM:           srun one task per host; SLURM_NTASKS/SLURM_PROCID and
#                      the nodelist are picked up automatically.
# Tensor parallelism (--mesh_model) must divide the LOCAL chip count so its
# collectives stay on ICI; the data axis spans hosts.
#
# Usage: deploy/launch_tpu.sh <run-script> [args...]
#   deploy/launch_tpu.sh runs/nusc_spatiotemporal_imu_500ms.py --disable_wandb
set -e
cd "$(dirname "$0")/.."
SCRIPT="$1"; shift
exec python "$SCRIPT" "$@"
