"""Multi-host runtime initialization (SURVEY.md §2.3).

The reference launches one NCCL process per GPU via `torch.distributed.launch`
and reads rank/world-size from env or SLURM variables
(`/root/reference/future_od/utils/distributed.py:42-60`). The TPU-native
equivalent is one process per host: `jax.distributed.initialize()` wires the
hosts into a single JAX runtime, after which `jax.devices()` is GLOBAL, the
("data", "model") mesh spans the whole slice, and the one GSPMD train step
replaces every explicit collective.

`distributed_config` is a pure decision function (unit-testable without a
cluster); `maybe_initialize_distributed` applies it.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Mapping, Optional


@dataclass(frozen=True)
class DistConfig:
    coordinator_address: str
    num_processes: int
    process_id: int


def distributed_config(
    args=None, env: Optional[Mapping[str, str]] = None
) -> Optional[DistConfig]:
    """Decide whether/how to initialize jax.distributed.

    Sources, in precedence order (mirroring the reference's env-then-SLURM
    fallback, distributed.py:46-51):
    1. explicit flags: --dist_coordinator / --dist_num_processes /
       --dist_process_id;
    2. COORDINATOR_ADDRESS + NUM_PROCESSES + PROCESS_ID env;
    3. SLURM: SLURM_NTASKS > 1 with SLURM_PROCID, coordinator = first
       hostname in SLURM_STEP_NODELIST (port 8476).

    Returns None for single-process runs (also the Cloud-TPU pod case, where
    `jax.distributed.initialize()` with no arguments auto-configures — callers
    pass `cloud_tpu=True` styled flags through args.dist_coordinator="auto").
    """
    env = os.environ if env is None else env

    coord = getattr(args, "dist_coordinator", None)
    nproc = getattr(args, "dist_num_processes", None)
    pid = getattr(args, "dist_process_id", None)
    if coord == "auto":
        # handled by maybe_initialize_distributed (argument-less initialize)
        return None
    if coord or nproc or pid is not None:
        # A partial flag set must not silently fall through to env/SLURM/
        # single-process (ADVICE r2), and on a multi-process run every host
        # defaulting to rank 0 would be a silent split-brain.
        if not (coord and nproc):
            raise ValueError(
                "partial distributed flags: --dist_coordinator and "
                "--dist_num_processes must be given together"
                + (" (got only --dist_process_id)" if pid is not None and not coord else "")
            )
        if int(nproc) > 1 and pid is None:
            raise ValueError(
                "--dist_num_processes > 1 requires an explicit "
                "--dist_process_id (defaulting every host to rank 0 would "
                "split-brain the job)"
            )
        return DistConfig(coord, int(nproc), int(pid or 0))

    if env.get("COORDINATOR_ADDRESS") or env.get("NUM_PROCESSES"):
        if not (env.get("COORDINATOR_ADDRESS") and env.get("NUM_PROCESSES")):
            raise ValueError(
                "partial distributed env: COORDINATOR_ADDRESS and "
                "NUM_PROCESSES must be set together"
            )
        if int(env["NUM_PROCESSES"]) > 1 and "PROCESS_ID" not in env:
            raise ValueError(
                "NUM_PROCESSES > 1 requires an explicit PROCESS_ID env var"
            )
        return DistConfig(
            env["COORDINATOR_ADDRESS"],
            int(env["NUM_PROCESSES"]),
            int(env.get("PROCESS_ID", 0)),
        )

    if int(env.get("SLURM_NTASKS", "1")) > 1:
        nodelist = env.get("SLURM_STEP_NODELIST", env.get("SLURM_NODELIST", ""))
        head = nodelist.split(",")[0].split("[")[0]
        if "[" in nodelist:  # compressed range: take the first index
            first = nodelist.split("[")[1].split("-")[0].split(",")[0].rstrip("]")
            head = head + first
        return DistConfig(
            f"{head}:8476",
            int(env["SLURM_NTASKS"]),
            int(env.get("SLURM_PROCID", 0)),
        )

    return None


_INITIALIZED = False


def maybe_initialize_distributed(args=None) -> bool:
    """Initialize jax.distributed for multi-host runs; no-op otherwise.

    Must run before any other jax backend use. Returns True when a multi-host
    runtime was (already) set up.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    if getattr(args, "dist_coordinator", None) == "auto":
        # Cloud TPU pod slice: jax auto-discovers coordinator + process ids.
        import jax

        jax.distributed.initialize()
        _INITIALIZED = True
        return True
    cfg = distributed_config(args)
    if cfg is None:
        return False
    import jax

    jax.distributed.initialize(
        coordinator_address=cfg.coordinator_address,
        num_processes=cfg.num_processes,
        process_id=cfg.process_id,
    )
    _INITIALIZED = True
    return True


def is_main_process() -> bool:
    """Rank-0 check (the reference gates pretrained download, prints, W&B, and
    checkpoint writes on it, distributed.py:26-39, trainer.py:98)."""
    import jax

    try:
        return jax.process_index() == 0
    except Exception:
        return True


def mesh_axes(total_devices: int, local_devices: int, num_model: int = 1):
    """Size the ("data", "model") mesh for a (possibly multi-host) run.

    Tensor parallelism must stay intra-host so its per-block all-reduce pair
    rides ICI, never DCN: num_model must divide the LOCAL device count; the
    data axis takes everything else (spanning hosts — gradient all-reduce is
    one collective per step and tolerates DCN).
    """
    assert num_model >= 1 and total_devices % num_model == 0
    assert local_devices % num_model == 0, (
        f"model axis {num_model} must divide local device count {local_devices} "
        "(tensor parallelism must not cross hosts)"
    )
    return total_devices // num_model, num_model
