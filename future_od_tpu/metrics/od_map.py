"""Fully tensorized (future-)object-detection mAP.

Faithful XLA port of `/root/reference/future_od/utils/od_map.py`: per-class
top-K(=50) predictions, batched many-to-many IoU, a greedy claim loop over the
K ranked detections evaluated at all 10 IoU thresholds (.50:.05:.95)
simultaneously, COCO-like size categories, and cross-step accumulation tensors
designed for concatenation (and, under data parallelism, for all_gather).

Differences from the reference, both shape-static by design:
- no `_cut_annotation_tensor` (od_map.py:26-43): the dense N stays fixed;
  inactive slots are excluded by the availability mask, so results are
  identical, just with more (masked) columns;
- the claim loop is a `lax.fori_loop`, so `prepare_od_map_stuffs` jits into
  the evaluation step instead of being a separate GPU pass.

Dims: B batch, C classes (incl. the appended generic class), S=4 size
categories (all/small/medium/large), T=10 thresholds, M'=prediction slots,
K=50 kept per class, N=dense annotation slots.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from future_od_tpu.ops.boxes import batched_box_iou

# Size delimiters relative to the image area (od_map.py:20-23).
SIZE_CATEGORY_DELIMITERS = ((1 / 24) * (1 / 64), (1 / 4) * (1 / 12))
NUM_THRESHOLDS = 10
TOP_K = 50
NUM_SIZES = 4


def _box_size_categories(boxes: jnp.ndarray, imsize) -> jnp.ndarray:
    """(B, N, 4) xyxy -> (B, N, S) bool [all, small, medium, large]
    (od_map.py:152-171)."""
    H, W = imsize
    areas = (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])
    s0 = SIZE_CATEGORY_DELIMITERS[0] * H * W
    s1 = SIZE_CATEGORY_DELIMITERS[1] * H * W
    small = areas <= s0
    medium = (s0 < areas) & (areas <= s1)
    large = s1 < areas
    return jnp.stack([jnp.ones_like(small), small, medium, large], axis=-1)


@functools.partial(jax.jit, static_argnames=("imsize",))
def prepare_od_map_stuffs(
    pred_boxes: jnp.ndarray,  # (B, M', 4) xyxy pixels
    pred_class_scores: jnp.ndarray,  # (B, M', C) in [0, 1], generic appended
    anno_boxes: jnp.ndarray,  # (B, N, 4) xyxy pixels
    anno_classes: jnp.ndarray,  # (B, N) int
    anno_active: jnp.ndarray,  # (B, N) 0/1
    imsize: Tuple[int, int],
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-step AP intermediaries (od_map.py:214-287).

    Returns:
        confs (T, C, B·K); is_positive (T, C, B·K) bool;
        size_categories (C, S, B·K) bool; num_annos (C, S) int32.
    """
    B, Mp, C = pred_class_scores.shape
    N = anno_boxes.shape[1]
    K = min(TOP_K, Mp)
    T = NUM_THRESHOLDS
    S = NUM_SIZES
    thresholds = 0.50 + 0.05 * jnp.arange(T, dtype=jnp.float32)

    pred_boxes = jax.lax.stop_gradient(pred_boxes)
    scores = jax.lax.stop_gradient(pred_class_scores)
    anno_active = anno_active.astype(jnp.int32)

    iou_full = batched_box_iou(pred_boxes, anno_boxes)  # (B, M', N)

    # Per-class top-K predictions by confidence (od_map.py:89-103).
    confs, ordered_m = jax.lax.top_k(scores.transpose(0, 2, 1), K)  # (B, C, K)
    confs = confs.transpose(0, 2, 1)  # (B, K, C)
    ordered_m = ordered_m.transpose(0, 2, 1)  # (B, K, C)

    # Availability mask (od_map.py:106-130): active AND class match; the last
    # class slot is the generic detection that matches any class.
    active_mask = anno_active[:, None, :] == 1  # (B, 1, N)
    class_ids = jnp.arange(C - 1, dtype=anno_classes.dtype)
    class_mask = jnp.concatenate(
        [
            anno_classes[:, None, :] == class_ids[None, :, None],
            jnp.ones((B, 1, N), dtype=bool),
        ],
        axis=1,
    )  # (B, C, N)
    available = active_mask & class_mask  # (B, C, N)

    # Per-class ranked IoU (od_map.py:133-149): gather the top-K rows, mask
    # unavailable annotations to 0.
    iou = jnp.take_along_axis(
        iou_full[:, :, None, :], ordered_m.transpose(0, 1, 2)[..., None], axis=1
    )  # (B, K, C, N) — iou_full expanded over C then gathered at ordered_m
    iou = jnp.where(available[:, None, :, :], iou, 0.0)

    # Greedy claim loop over ranked detections (od_map.py:264-277): detection m
    # claims its best remaining annotation at each threshold; claimed
    # annotations are excluded for all later detections. The reference zeroes
    # the claimed column inside a (B, T, K, C, N) tensor; carrying a claim
    # MASK of shape (B, T, C, N) instead is semantically identical (only row m
    # is read at step m) and ~K·T times less memory traffic.
    def body(m, carry):
        claimed, is_pos = carry
        row = jax.lax.dynamic_slice_in_dim(iou, m, 1, axis=1)[:, 0]  # (B, C, N)
        row = jnp.where(claimed, 0.0, row[:, None])  # (B, T, C, N)
        best_score = row.max(axis=-1)  # (B, T, C)
        best_n = row.argmax(axis=-1)  # (B, T, C)
        pos_m = best_score >= thresholds[None, :, None]  # (B, T, C)
        is_pos = jax.lax.dynamic_update_slice_in_dim(
            is_pos, pos_m[:, :, None, :], m, axis=2
        )
        claimed = claimed | (jax.nn.one_hot(best_n, N, dtype=bool) & pos_m[..., None])
        return claimed, is_pos

    claimed = jnp.zeros((B, T, C, N), dtype=bool)
    is_positive = jnp.zeros((B, T, K, C), dtype=bool)
    _, is_positive = jax.lax.fori_loop(0, K, body, (claimed, is_positive))

    # Reshape to the accumulation layout (od_map.py:279-287).
    confs_out = jnp.broadcast_to(
        confs.reshape(B * K, C).T[None], (T, C, B * K)
    )
    is_positive_out = is_positive.transpose(1, 3, 0, 2).reshape(T, C, B * K)

    size_cats = _box_size_categories(pred_boxes, imsize)  # (B, M', S)
    size_cats = jnp.take_along_axis(
        size_cats[:, :, None, :], ordered_m[..., None], axis=1
    )  # (B, K, C, S)
    size_cats_out = size_cats.reshape(B * K, C, S).transpose(1, 2, 0)  # (C, S, B·K)

    anno_sizes = _box_size_categories(anno_boxes, imsize)  # (B, N, S)
    num_annos = (
        available[:, :, :, None] & anno_sizes[:, None, :, :]
    ).sum(axis=(0, 2)).astype(jnp.int32)  # (C, S)

    return confs_out, is_positive_out, size_cats_out, num_annos


def _get_ap(confs, is_positive, size_categories, num_annos):
    """AP per (class, size) for one threshold (od_map.py:290-314).

    confs/is_positive: (C, Nobj); size_categories: (C, S, Nobj);
    num_annos: (C, S) already summed over steps.
    """
    C, S, Nobj = size_categories.shape
    ids = jnp.argsort(-confs, axis=1)  # descending
    ids = jnp.broadcast_to(ids[:, None, :], (C, S, Nobj))
    is_positive = is_positive[:, None, :] & size_categories
    is_positive = jnp.take_along_axis(is_positive, ids, axis=2)
    size_categories = jnp.take_along_axis(size_categories, ids, axis=2)
    precision = jnp.cumsum(is_positive, axis=2) / (
        jnp.cumsum(size_categories, axis=2) + 1e-5
    )
    return (precision * is_positive).sum(axis=2) / num_annos


@jax.jit
def _ap_all_thresholds(confs, is_positive, size_categories, num_annos):
    num_annos = num_annos.astype(jnp.float32)
    return jax.vmap(lambda c, p: _get_ap(c, p, size_categories, num_annos))(
        confs, is_positive
    )


def aggregate_mean_average_precision(
    confs: np.ndarray,  # (T, C, num_objects) — concatenated over steps
    is_positive: np.ndarray,
    size_categories: np.ndarray,  # (C, S, num_objects)
    num_annos: np.ndarray,  # (C, S, num_steps)
) -> Dict[str, np.ndarray]:
    """Aggregate stacked per-step intermediaries into the AP dict
    (od_map.py:317-364): per-threshold APs plus class/threshold averages and
    the generic-objectness slice. NaN where a class has no annotations,
    ignored by the nan-means, as in the reference."""
    num_annos_total = np.asarray(num_annos).sum(axis=2)
    ap = np.asarray(
        _ap_all_thresholds(
            jnp.asarray(confs),
            jnp.asarray(is_positive),
            jnp.asarray(size_categories),
            jnp.asarray(num_annos_total),
        )
    )  # (T, C, S)
    with np.errstate(invalid="ignore"):
        return {
            "all": ap[:, 0:-1, :],
            "classavg": np.nanmean(ap[:, 0:-1, :], axis=1),
            "threshavg": np.nanmean(ap[:, 0:-1, :], axis=0),
            "classavg threshavg": np.nanmean(ap[:, 0:-1, :], axis=(0, 1)),
            "generic": ap[:, -1, :],
            "generic threshavg": np.nanmean(ap[:, -1, :], axis=0),
        }
