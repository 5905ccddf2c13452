"""Box coordinate utilities.

Semantics match the public (Conditional)DETR box ops used by the reference
(`/root/reference/future_od/models/set_criterion.py:108-112` via
`ConditionalDETR.util.box_ops`) and the metric's batched IoU
(`/root/reference/future_od/utils/od_map.py:46-70`), re-expressed as
shape-static jnp functions.
"""
from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (x1, y1, x2, y2). Works on any (..., 4) array."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, x2, y2) -> (cx, cy, w, h). Works on any (..., 4) array."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [0.5 * (x1 + x2), 0.5 * (y1 + y2), x2 - x1, y2 - y1], axis=-1
    )


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of (..., 4) xyxy boxes."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Pairwise IoU between (..., M, 4) and (..., N, 4) xyxy boxes.

    Returns (iou, union), each (..., M, N). DETR-style: degenerate boxes give 0
    width/height after clamping.
    """
    area1 = box_area(boxes1)  # (..., M)
    area2 = box_area(boxes2)  # (..., N)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    return inter / union, union


def generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise GIoU between (..., M, 4) and (..., N, 4) xyxy boxes -> (..., M, N).

    GIoU = IoU - (enclosing_area - union) / enclosing_area.
    """
    iou, union = box_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / area


def elementwise_generalized_box_iou(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray
) -> jnp.ndarray:
    """GIoU between matching rows of two (..., 4) xyxy arrays -> (...).

    Equivalent to `diag(generalized_box_iou(a, b))` without the M×N blowup —
    the reference computes the full matrix and takes the diagonal
    (set_criterion.py:108-113); on TPU we keep it elementwise.
    """
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    iou = inter / union
    lt_c = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb_c = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh_c = jnp.clip(rb_c - lt_c, 0.0, None)
    area_c = wh_c[..., 0] * wh_c[..., 1]
    return iou - (area_c - union) / area_c


def batched_box_iou(boxes_one: jnp.ndarray, boxes_two: jnp.ndarray) -> jnp.ndarray:
    """Batched many-to-many IoU used by the mAP metric.

    Mirrors the reference's metric IoU exactly (od_map.py:46-70): negative
    widths/heights are relu-clamped per side, and numerator/denominator each
    carry a 1e-7 epsilon so empty-vs-empty gives IoU 1.

    Args:
        boxes_one: (B, M, 4) xyxy.
        boxes_two: (B, N, 4) xyxy.
    Returns:
        (B, M, N) IoU.
    """
    b1 = boxes_one[:, :, None, :]  # (B, M, 1, 4)
    b2 = boxes_two[:, None, :, :]  # (B, 1, N, 4)
    relu = lambda x: jnp.maximum(x, 0.0)
    area1 = relu(b1[..., 2] - b1[..., 0]) * relu(b1[..., 3] - b1[..., 1])
    area2 = relu(b2[..., 2] - b2[..., 0]) * relu(b2[..., 3] - b2[..., 1])
    inter = relu(
        jnp.minimum(b1[..., 2], b2[..., 2]) - jnp.maximum(b1[..., 0], b2[..., 0])
    ) * relu(jnp.minimum(b1[..., 3], b2[..., 3]) - jnp.maximum(b1[..., 1], b2[..., 1]))
    return (inter + 1e-7) / (area1 + area2 - inter + 1e-7)
