"""Checkpoint save/load (orbax).

The reference writes a single `.pth.tar` per run, overwritten each epoch, plus
a `_final` net-only export (trainer.py:282-328). Equivalents here:
`<dir>/<name>/` holds the full train state {params, frozen, opt_state, epoch,
step, stats}; `<dir>/<name>_final/` holds {params, frozen} only.
"""
from __future__ import annotations

import os
import shutil
from typing import Any, Optional

import orbax.checkpoint as ocp


def _path(checkpoint_dir: str, name: str) -> str:
    return os.path.abspath(os.path.join(checkpoint_dir, name))


def save_checkpoint(checkpoint_dir: str, name: str, tree: Any) -> str:
    """Atomically overwrite <dir>/<name> with the pytree."""
    path = _path(checkpoint_dir, name)
    os.makedirs(checkpoint_dir, exist_ok=True)
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(tmp, tree)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)
    return path


def load_checkpoint(
    checkpoint_dir: str, name: str, target: Optional[Any] = None
) -> Optional[Any]:
    """Restore <dir>/<name>; returns None when absent. `target` (a matching
    pytree of arrays) restores with correct dtypes/shardings."""
    path = _path(checkpoint_dir, name)
    if not os.path.exists(path):
        return None
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is not None:
            return ckptr.restore(path, item=target)
        return ckptr.restore(path)
