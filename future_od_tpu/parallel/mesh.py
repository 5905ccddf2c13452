"""Device mesh + sharding rules.

TPU-native replacement for the reference's DDP/NCCL layer (SURVEY.md §2.2-2.3):
no process groups, no explicit collectives — a `jax.sharding.Mesh` over
("data", "model") plus NamedSharding annotations, with XLA inserting the
all-reduces over ICI.

- Data parallelism (the reference's only strategy) = batch dim sharded over
  "data", params replicated. Gradient all-reduce, loss-stat reduction, and the
  AP-accumulator gather all fall out of GSPMD on the global-batch program.
- Tensor parallelism (capability beyond the reference, for scaling the
  transformer): FFN and attention projection kernels shard over "model";
  XLA places the pair of all-reduces per block.
"""
from __future__ import annotations

from typing import Any, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_data: Optional[int] = None, num_model: int = 1) -> Mesh:
    """Build a ("data", "model") mesh over the available devices."""
    devices = jax.devices()
    if num_data is None:
        num_data = len(devices) // num_model
    assert num_data * num_model <= len(devices), (
        f"need {num_data}x{num_model} devices, have {len(devices)}"
    )
    grid = np.array(devices[: num_data * num_model]).reshape(num_data, num_model)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) dim over "data", replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Param-path substrings -> (kernel PartitionSpec, bias PartitionSpec) for the
# tensor-parallel axis. Column-parallel layers (sharded output) shard their
# bias too; row-parallel layers ("model" on input dim) keep bias replicated.
_COL_PARALLEL = (
    "fc1",  # FFN up-projection
    "query_content", "key_content", "value", "query_pos", "key_pos",
    "query_sine", "q_proj", "k_proj", "v_proj", "key']",
)
_ROW_PARALLEL = ("fc2", "out_proj")


def _spec_for(path: str, leaf) -> P:
    if getattr(leaf, "ndim", 0) == 2:
        for token in _ROW_PARALLEL:
            if token in path:
                return P("model", None)
        for token in _COL_PARALLEL:
            if token in path:
                return P(None, "model")
    if getattr(leaf, "ndim", 0) == 1:
        for token in _COL_PARALLEL:
            if token in path:
                return P("model")
    return P()


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedShardings for a param pytree: transformer projections sharded over
    "model" (no-op when the model axis has size 1), everything else replicated."""
    if mesh.shape["model"] == 1:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)

    def assign(path, leaf):
        pstr = jax.tree_util.keystr(path)
        spec = _spec_for(pstr, leaf)
        # Guard divisibility; fall back to replication when the axis doesn't tile.
        for dim, axis in enumerate(spec):
            if axis == "model" and leaf.shape[dim] % mesh.shape["model"] != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(assign, params)
