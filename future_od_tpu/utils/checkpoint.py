"""Checkpoint save/load (orbax + JSON sidecar).

The reference writes a single `.pth.tar` per run, overwritten each epoch, plus
a `_final` net-only export (trainer.py:282-328). Equivalents here:
`<dir>/<name>/` holds the array state (params, frozen stats, optimizer state,
step) via orbax plus a `meta.json` sidecar (epoch, net_type, stat meters);
`<dir>/<name>_final/` holds {params, frozen} only.

Array trees are restored against a matching target tree so optax NamedTuple
opt-states keep their structure (orbax would otherwise round-trip them as
plain dicts).
"""
from __future__ import annotations

import json
import os
import shutil
import threading
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp

META_FILE = "meta.json"
ARRAYS_DIR = "arrays"


def _path(checkpoint_dir: str, name: str) -> str:
    return os.path.abspath(os.path.join(checkpoint_dir, name))


def save_checkpoint(
    checkpoint_dir: str, name: str, arrays: Any, meta: Optional[dict] = None
) -> str:
    """Atomically overwrite <dir>/<name> with the array pytree + meta dict."""
    path = _path(checkpoint_dir, name)
    os.makedirs(checkpoint_dir, exist_ok=True)
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(tmp, ARRAYS_DIR), arrays)
    with open(os.path.join(tmp, META_FILE), "w") as f:
        json.dump(meta or {}, f)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)
    return path


class PendingSave:
    """Handle for an in-flight async checkpoint write.

    Orbax's AsyncCheckpointer copies the arrays to host BEFORE returning from
    save(), so the caller may keep training — including donating the state
    buffers to the next step — while serialization and disk IO run in a
    background thread. A finalizer thread here then commits (meta sidecar
    write + atomic rename) as soon as that write finishes, so the newest
    checkpoint survives a hard preemption (SIGKILL/OOM — anything that never
    reaches a flush) without anyone calling `wait()`. `wait()` blocks until
    the commit has happened; it is idempotent and failure-retryable (a commit
    that raised in the background is re-attempted, skipping the
    already-closed checkpointer).
    """

    def __init__(self, ckptr: "ocp.AsyncCheckpointer", tmp: str, path: str,
                 meta: Optional[dict]):
        self._ckptr: Optional[ocp.AsyncCheckpointer] = ckptr
        self._tmp = tmp
        self._path = path
        self._meta = meta
        self._lock = threading.Lock()
        self._done = False
        self._thread = threading.Thread(
            target=self._finalize_quietly,
            name=f"ckpt-commit:{os.path.basename(path)}",
            daemon=True,
        )
        self._thread.start()

    def _finalize_quietly(self):
        try:
            self.wait()
        except Exception as exc:  # noqa: BLE001 — retried by the next wait()
            print(f"WARNING: background checkpoint commit of {self._path} "
                  f"failed ({exc}); will retry on the next flush")

    def wait(self) -> str:
        with self._lock:
            if self._done:
                return self._path
            if self._ckptr is not None:
                self._ckptr.wait_until_finished()
                self._ckptr.close()
                # Failure-idempotent: drop the closed checkpointer so a retry
                # after a failed meta-write/rename goes straight to finalize.
                self._ckptr = None
            with open(os.path.join(self._tmp, META_FILE), "w") as f:
                json.dump(self._meta or {}, f)
            if os.path.exists(self._path):
                shutil.rmtree(self._path)
            os.replace(self._tmp, self._path)
            self._done = True
            return self._path


def save_checkpoint_async(
    checkpoint_dir: str, name: str, arrays: Any, meta: Optional[dict] = None
) -> PendingSave:
    """Start an asynchronous atomic overwrite of <dir>/<name>. The previous
    checkpoint stays intact until the new one commits — which the returned
    handle does eagerly in the background once the array write finishes
    (same crash-safety as the synchronous `save_checkpoint`); `wait()` only
    blocks until that commit is durable. Callers must not start a second
    save for the same name before waiting on the first (the temp directory
    is per-name)."""
    path = _path(checkpoint_dir, name)
    os.makedirs(checkpoint_dir, exist_ok=True)
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    ckptr.save(os.path.join(tmp, ARRAYS_DIR), arrays)
    return PendingSave(ckptr, tmp, path, meta)


def load_checkpoint_meta(checkpoint_dir: str, name: str) -> Optional[dict]:
    """Read just the JSON meta sidecar of <dir>/<name> (None when absent).
    Cheap: lets callers learn the checkpoint's architecture (meta
    "detr_args") BEFORE building the model/restore target."""
    meta_path = os.path.join(_path(checkpoint_dir, name), META_FILE)
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as f:
        return json.load(f)


def load_checkpoint(
    checkpoint_dir: str, name: str, target: Optional[Any] = None
) -> Optional[Tuple[Any, dict]]:
    """Restore <dir>/<name> -> (arrays, meta); None when absent. `target`
    (a matching pytree) preserves container types and dtypes."""
    path = _path(checkpoint_dir, name)
    if not os.path.isdir(path):
        return None
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is not None:
            # Restore every leaf with the TARGET's sharding, not the stored
            # one: without explicit restore_args orbax replays the sharding
            # recorded at save time, which cannot be reconstructed when the
            # saving platform differs (e.g. a TPU-trained checkpoint opened
            # for CPU eval fails with "sharding ... Got None").
            from orbax.checkpoint import checkpoint_utils

            arrays = ckptr.restore(
                os.path.join(path, ARRAYS_DIR),
                item=target,
                restore_args=checkpoint_utils.construct_restore_args(target),
            )
        else:
            arrays = ckptr.restore(os.path.join(path, ARRAYS_DIR))
    meta_path = os.path.join(path, META_FILE)
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return arrays, meta
