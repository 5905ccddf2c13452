"""Dense target construction and the DETR target format.

The reference pads per-image annotations to a dense `(Nmax,)` slot layout on
the host (`datasets/utils.py:19-38`) and converts to ragged per-image lists for
the loss (`st_detr.py:237-263`). On TPU we keep everything dense + masked:
`to_detr_targets` returns fixed-shape normalized cxcywh boxes with the active
mask, which the set criterion and matcher consume directly.
"""
from __future__ import annotations

from typing import Dict, Optional, Set, Tuple

import numpy as np

import jax.numpy as jnp


def construct_box_targets(
    boxes: np.ndarray,
    classes: np.ndarray,
    max_num_objects: int,
    ignore_categories: Optional[Set[int]] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Host-side dense padding of ragged annotations (datasets/utils.py:19-38).

    Args:
        boxes: (N, 4) float xyxy pixel boxes.
        classes: (N,) int labels.
    Returns:
        boxes (Nmax, 4), classes (Nmax,) int64, ignore_boxes (Nmax, 4),
        active (Nmax,) int64 — ignore-category objects go to ignore_boxes.
    """
    boxes = np.asarray(boxes, dtype=np.float32).reshape(-1, 4)
    classes = np.asarray(classes, dtype=np.int64).reshape(-1)
    if ignore_categories:
        ignore_mask = np.isin(classes, list(ignore_categories))
    else:
        ignore_mask = np.zeros_like(classes, dtype=bool)
    obj_boxes = boxes[~ignore_mask][:max_num_objects]
    obj_classes = classes[~ignore_mask][:max_num_objects]
    ign_boxes = boxes[ignore_mask][:max_num_objects]

    out_boxes = np.zeros((max_num_objects, 4), dtype=np.float32)
    out_ignores = np.zeros((max_num_objects, 4), dtype=np.float32)
    out_classes = np.zeros((max_num_objects,), dtype=np.int64)
    out_active = np.zeros((max_num_objects,), dtype=np.int64)
    out_boxes[: len(obj_boxes)] = obj_boxes
    out_ignores[: len(ign_boxes)] = ign_boxes
    out_classes[: len(obj_classes)] = obj_classes
    out_active[: len(obj_classes)] = 1
    return out_boxes, out_classes, out_ignores, out_active


def to_detr_targets(
    height: int,
    width: int,
    anno_active: jnp.ndarray,
    anno_boxes: jnp.ndarray,
    anno_classes: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """xyxy pixel boxes -> dense masked DETR targets (st_detr.py:237-263).

    Args:
        anno_active: (B, Nmax) 0/1.
        anno_boxes: (B, Nmax, 4) xyxy pixels.
        anno_classes: (B, Nmax) int.
    Returns:
        {"boxes": (B, Nmax, 4) normalized cxcywh, "labels": (B, Nmax) int,
         "active": (B, Nmax) bool} — inactive slots keep zero boxes/labels and
        must be masked by every consumer.
    """
    cxcywh = jnp.concatenate(
        [
            0.5 * (anno_boxes[..., 0:2] + anno_boxes[..., 2:4]),
            anno_boxes[..., 2:4] - anno_boxes[..., 0:2],
        ],
        axis=-1,
    )
    scale = jnp.array([1.0 / width, 1.0 / height, 1.0 / width, 1.0 / height], dtype=cxcywh.dtype)
    return {
        "boxes": cxcywh * scale,
        "labels": anno_classes.astype(jnp.int32),
        "active": anno_active.astype(bool),
    }
