"""Subprocess worker for tests/test_distributed_multiprocess.py.

Initializes jax.distributed through the PRODUCT path
(`parallel.distributed.maybe_initialize_distributed`) on the CPU backend,
then proves the runtime is real: global device count spans both processes and
a jitted global-sum reduction crosses the process boundary.

Usage: python tests/_dist_worker.py <process_id> <coordinator host:port>
"""
import os
import sys

# One local CPU device per process, BEFORE any jax import side effects.
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

import jax

jax.config.update("jax_platforms", "cpu")  # env var is overridden on this image

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


class _Args:
    dist_coordinator = None
    dist_num_processes = None
    dist_process_id = None


def main():
    pid, coord = int(sys.argv[1]), sys.argv[2]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from future_od_tpu.parallel.distributed import (
        is_main_process,
        maybe_initialize_distributed,
    )

    args = _Args()
    args.dist_coordinator = coord
    args.dist_num_processes = 2
    args.dist_process_id = pid
    assert maybe_initialize_distributed(args), "expected multi-process init"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 2, jax.device_count()
    assert jax.local_device_count() == 1
    assert is_main_process() == (pid == 0)

    # A real cross-process reduction: each process contributes its rank+1 on
    # its shard of a ("data",)-sharded global array; the replicated global
    # sum must read 1+2=3 on BOTH processes.
    mesh = jax.make_mesh((2,), ("data",))
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), np.full((1,), float(pid + 1), np.float32)
    )
    total = jax.jit(
        lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P())
    )(arr)
    assert float(total) == 3.0, float(total)
    print(f"DIST_OK pid={pid} total={float(total)}")


if __name__ == "__main__":
    main()
