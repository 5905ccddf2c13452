"""AOT export of serving programs (``jax.export``).

Serializes the lowered inference computation to a portable StableHLO
artifact that a serving host reloads WITHOUT the model-building Python
(flax modules, argparse config, this repo) on its path — only ``jax`` and
the checkpoint. Lowering therefore happens once, at release time; the
server is a thin ``deserialize`` + orbax restore, and the artifact pins
the exact serving math independently of later code changes.

The reference's deployment story re-imports the full training codebase in
a container to run eval (``/root/reference/Dockerfile``,
``/root/reference/runs/eval/*.py``); a TPU serving fleet wants a sealed
program instead. Extra beyond the reference (SURVEY §2.1 #36 deployment).

Two serving surfaces are exportable:

- the batch clip path (``make_inference_fn``): ``infer(variables, data)``;
- the streaming pair (``make_streaming_fns``): ``encode_frame`` +
  ``detect_window`` — the per-frame-cache production server.

Variables stay an *argument* of the exported program (not baked-in
constants), so one artifact serves every checkpoint with matching shapes.

Cross-platform: pass ``platforms=("tpu", "cpu")`` to lower for both — the
artifact is built AOT, so a CPU release machine can produce the TPU
serving program.
"""
from __future__ import annotations

import os
from typing import Callable, Optional, Sequence, Tuple

import jax
from jax import export as _jax_export


def _specs(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jax.numpy.shape(x), x.dtype), tree
    )


def export_serving(
    fn: Callable,
    example_args: Tuple,
    platforms: Sequence[str] = ("tpu",),
    path: Optional[str] = None,
) -> bytes:
    """Lower ``fn(*example_args)`` AOT and return the serialized artifact.

    ``example_args`` supply shapes/dtypes only (values are never traced
    into the program). If ``path`` is given the blob is also written there.
    """
    exported = _jax_export.export(jax.jit(fn), platforms=list(platforms))(
        *_specs(example_args)
    )
    blob = exported.serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return bytes(blob)


def load_serving(path_or_blob) -> Callable:
    """Rehydrate an exported serving program into a callable.

    Accepts a filesystem path or the raw ``bytes``. The returned callable
    is jit-compatible (it is a single StableHLO call) and enforces the
    exported shapes/dtypes.
    """
    if isinstance(path_or_blob, (str, os.PathLike)):
        with open(path_or_blob, "rb") as f:
            blob = f.read()
    else:
        blob = path_or_blob
    exported = _jax_export.deserialize(bytearray(blob))
    return exported.call


def export_inference(
    model,
    variables,
    example_data,
    platforms: Sequence[str] = ("tpu",),
    path: Optional[str] = None,
) -> bytes:
    """Export the batch clip-inference path at ``example_data``'s shapes."""
    from future_od_tpu.train.step import make_inference_fn

    return export_serving(
        make_inference_fn(model), (variables, example_data), platforms, path
    )


def export_streaming(
    model,
    variables,
    example_frame,
    clip_frames: int = 3,
    platforms: Sequence[str] = ("tpu",),
    encode_path: Optional[str] = None,
    detect_path: Optional[str] = None,
) -> Tuple[bytes, bytes]:
    """Export the streaming pair at one frame's shapes.

    Returns ``(encode_blob, detect_blob)``. The detect program is exported
    for the (L-1)-frame cached feature window the encode program fills —
    the server's cache layout is thereby pinned by the artifacts.
    """
    from future_od_tpu.serve.streaming import make_streaming_fns

    encode_frame, detect_window = make_streaming_fns(
        model, clip_frames=clip_frames,
        image_hw=tuple(example_frame["video"].shape[1:3]),
    )
    feats, ego = jax.eval_shape(encode_frame, _specs(variables),
                                _specs(example_frame))
    encode_blob = export_serving(
        encode_frame, (variables, example_frame), platforms, encode_path
    )

    W = clip_frames - 1
    window = jax.ShapeDtypeStruct((feats.shape[0], W) + feats.shape[1:],
                                  feats.dtype)
    ego_window = (
        None if ego is None
        else jax.ShapeDtypeStruct((ego.shape[0], W) + ego.shape[1:],
                                  ego.dtype)
    )
    # offsets dtype mirrors StreamingSession.step (features dtype)
    offsets = jax.ShapeDtypeStruct((feats.shape[0], W), feats.dtype)
    detect_blob = export_serving(
        detect_window, (variables, window, ego_window, offsets),
        platforms, detect_path,
    )
    return encode_blob, detect_blob
