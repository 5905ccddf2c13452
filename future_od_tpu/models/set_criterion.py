"""DETR set-prediction criterion, dense/masked and fully on-device.

Re-design of the reference's `SetCriterion`
(`/root/reference/future_od/models/set_criterion.py`) for XLA: targets stay in
the dense (B, Nmax) slot layout with an active mask (never ragged), matching
runs on device (auction) or via host callback (exact Hungarian), and all
gather/scatter steps are shape-static so the whole loss jits into the train
step.

Under a data-parallel mesh the batch axis is global, so `num_boxes` computed
with a plain sum is already the cross-replica sum the reference obtains with
`all_reduce` (set_criterion.py:184-193) — identical gradients.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from future_od_tpu.ops.boxes import box_cxcywh_to_xyxy, elementwise_generalized_box_iou
from future_od_tpu.ops.losses import (
    class_error,
    sigmoid_binary_cross_entropy,
    sigmoid_focal_loss,
)
from future_od_tpu.ops.matching import SOLVERS, matching_cost


@dataclass(frozen=True)
class CriterionConfig:
    num_classes: int
    cls_loss_coef: float = 2.0
    bbox_loss_coef: float = 5.0
    giou_loss_coef: float = 2.0
    focal_alpha: float = 0.25
    set_cost_class: float = 2.0
    set_cost_bbox: float = 5.0
    set_cost_giou: float = 2.0
    matching_mode: str = "per level"  # | "last level"
    matcher: str = "auction"  # | "hungarian"
    aux_loss: bool = True
    masks: bool = False  # segmentation losses (set_criterion.py:117-148)
    mask_loss_coef: float = 1.0
    dice_loss_coef: float = 1.0
    # Static compaction of the dense target slots before the cost build:
    # active slots are gathered to the front and the cost matrices / solver /
    # loss gathers run over this many slots instead of the loader's Nmax=256
    # (the reference matches only the real boxes per image,
    # set_criterion.py:182 — typically ≪64 — while a dense layout pays the
    # full Nmax on every level). Exact whenever every image has ≤ cost_slots
    # active targets (permutation-invariant sums); images with more DROP the
    # overflow from matching and the loss for that step, loudly: the
    # `matcher_dropped` stat counts them and the Trainer warns. 0 disables.
    cost_slots: int = 128

    def __post_init__(self):
        assert self.matching_mode in ("per level", "last level")
        assert self.matcher in SOLVERS


def compact_targets(
    targets: Dict[str, jnp.ndarray], n_cost: int
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Gather active target slots to the front and truncate to n_cost slots.

    A pure permutation when every image fits (stable argsort keeps the active
    slots in their original order), so every criterion sum is unchanged up to
    float reassociation. Returns (compacted targets, dropped) where dropped is
    the scalar count of active targets that did NOT fit — those are excluded
    from matching and the loss for this step (telemetry: `matcher_dropped`).
    """
    active = targets["active"]
    B, N = active.shape
    if not n_cost or n_cost >= N:
        return targets, jnp.zeros((), jnp.float32)
    order = jnp.argsort(jnp.logical_not(active), axis=1, stable=True)[:, :n_cost]
    out = {
        "active": jnp.take_along_axis(active, order, axis=1),
        "labels": jnp.take_along_axis(targets["labels"], order, axis=1),
        "boxes": jnp.take_along_axis(targets["boxes"], order[..., None], axis=1),
    }
    if "masks" in targets:
        out["masks"] = jnp.take_along_axis(
            targets["masks"], order[..., None, None], axis=1
        )
    dropped = (
        jnp.maximum(active.sum(-1).astype(jnp.int32) - n_cost, 0)
        .sum()
        .astype(jnp.float32)
    )
    return out, dropped


def _match(outputs: Dict[str, jnp.ndarray], targets, cfg: CriterionConfig):
    cost = matching_cost(
        outputs["pred_logits"],
        outputs["pred_boxes"],
        targets,
        cost_class=cfg.set_cost_class,
        cost_bbox=cfg.set_cost_bbox,
        cost_giou=cfg.set_cost_giou,
        focal_alpha=cfg.focal_alpha,
    )
    return SOLVERS[cfg.matcher](cost, targets["active"], return_rounds=True)


def _level_losses(
    outputs: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    pred_idx: jnp.ndarray,  # (B, N) in [0, M], M = unmatched
    num_boxes: jnp.ndarray,
    cfg: CriterionConfig,
    log: bool,
) -> Dict[str, jnp.ndarray]:
    # Loss math always runs in f32 (the forward may be bf16 under mixed
    # precision; focal log-terms and GIoU need the precision).
    logits = outputs["pred_logits"].astype(jnp.float32)  # (B, M, C)
    boxes = outputs["pred_boxes"].astype(jnp.float32)  # (B, M, 4)
    B, M, C = logits.shape
    matched = targets["active"] & (pred_idx < M)  # (B, N)

    # --- classification (focal) loss, set_criterion.py:36-77 ---
    # Scatter target labels onto their matched query slot; unmatched queries
    # keep the background index (== num_classes -> all-zero one-hot row).
    scatter_idx = jnp.where(matched, pred_idx, M)  # M -> spill column
    labels = jnp.where(matched, targets["labels"], cfg.num_classes)
    target_classes = jnp.full((B, M + 1), cfg.num_classes, dtype=jnp.int32)
    target_classes = target_classes.at[
        jnp.arange(B)[:, None], scatter_idx
    ].set(labels)[:, :M]
    onehot = jax.nn.one_hot(target_classes, C, dtype=logits.dtype)
    loss_ce = (
        sigmoid_focal_loss(logits, onehot, num_boxes, alpha=cfg.focal_alpha, gamma=2.0)
        * M
    )

    # --- box losses, set_criterion.py:93-115 ---
    gather_idx = jnp.clip(pred_idx, 0, M - 1)
    src_boxes = jnp.take_along_axis(boxes, gather_idx[..., None], axis=1)  # (B, N, 4)
    l1 = jnp.abs(src_boxes - targets["boxes"]).sum(-1)
    loss_bbox = jnp.where(matched, l1, 0.0).sum() / num_boxes
    giou = elementwise_generalized_box_iou(
        box_cxcywh_to_xyxy(src_boxes), box_cxcywh_to_xyxy(targets["boxes"])
    )
    loss_giou = jnp.where(matched, 1.0 - giou, 0.0).sum() / num_boxes

    losses = {"loss_ce": loss_ce, "loss_bbox": loss_bbox, "loss_giou": loss_giou}

    # --- cardinality error (logging only), set_criterion.py:79-91 ---
    card_pred = (logits.max(-1) > 0.5).sum(-1).astype(jnp.float32)
    tgt_len = targets["active"].sum(-1).astype(jnp.float32)
    losses["cardinality_error"] = jax.lax.stop_gradient(
        jnp.abs(card_pred - tgt_len).mean()
    )

    if log:
        matched_logits = jnp.take_along_axis(
            logits, gather_idx[..., None], axis=1
        )  # (B, N, C)
        losses["class_error"] = jax.lax.stop_gradient(
            class_error(matched_logits, targets["labels"], matched)
        )
    return losses


def _mask_losses(
    outputs: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    pred_idx: jnp.ndarray,
    num_boxes: jnp.ndarray,
    cfg: CriterionConfig,
) -> Dict[str, jnp.ndarray]:
    """Mask focal + dice losses (set_criterion.py:117-148), dense/masked.

    outputs["pred_masks"]: (B, M, h, w) logits; targets["masks"]: (B, N, H, W)
    0/1 in the same dense slot layout as boxes. Matched predictions are
    bilinearly upsampled to the target resolution (align_corners=False ==
    jax.image.resize half-pixel convention); unmatched/inactive slots are
    zeroed out of both reductions.
    """
    src = outputs["pred_masks"].astype(jnp.float32)
    tgt = targets["masks"].astype(jnp.float32)
    B, M = src.shape[:2]
    N = tgt.shape[1]
    matched = targets["active"] & (pred_idx < M)  # (B, N)

    gather_idx = jnp.clip(pred_idx, 0, M - 1)
    src = jnp.take_along_axis(src, gather_idx[:, :, None, None], axis=1)
    src = jax.image.resize(src, (B, N) + tgt.shape[-2:], method="linear")
    src = src.reshape(B, N, -1)
    tgt = tgt.reshape(B, N, -1)

    prob = jax.nn.sigmoid(src)
    ce = sigmoid_binary_cross_entropy(src, tgt)
    p_t = prob * tgt + (1.0 - prob) * (1.0 - tgt)
    alpha_t = cfg.focal_alpha * tgt + (1.0 - cfg.focal_alpha) * (1.0 - tgt)
    focal = (alpha_t * ce * (1.0 - p_t) ** 2).mean(-1)  # per-instance
    loss_mask = jnp.where(matched, focal, 0.0).sum() / num_boxes

    dice = 1.0 - (2.0 * (prob * tgt).sum(-1) + 1.0) / (prob.sum(-1) + tgt.sum(-1) + 1.0)
    loss_dice = jnp.where(matched, dice, 0.0).sum() / num_boxes
    return {"loss_mask": loss_mask, "loss_dice": loss_dice}


def matching_costs_all(
    outputs: Dict[str, Any], targets: Dict[str, jnp.ndarray], cfg: CriterionConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stacked matching costs for every level the criterion will match:
    ((A·B, M, N) costs, (A·B, N) active), A = 1 + num_aux under "per level"
    matching, else 1. Shared by the in-jit solve and the host-matched split
    step (train/step.py:make_host_matched_train_step). N = cfg.cost_slots
    when compaction applies — indices solved on these costs align with the
    compacted layout `set_criterion` uses internally."""
    targets, _ = compact_targets(targets, cfg.cost_slots)
    levels = [outputs]
    if cfg.aux_loss and cfg.matching_mode == "per level":
        levels += list(outputs.get("aux_outputs", []))
    costs = jnp.concatenate(
        [
            matching_cost(
                lvl["pred_logits"], lvl["pred_boxes"], targets,
                cost_class=cfg.set_cost_class, cost_bbox=cfg.set_cost_bbox,
                cost_giou=cfg.set_cost_giou, focal_alpha=cfg.focal_alpha,
            )
            for lvl in levels
        ],
        axis=0,
    )
    return costs, jnp.tile(targets["active"], (len(levels), 1))


def set_criterion(
    outputs: Dict[str, Any],
    targets: Dict[str, jnp.ndarray],
    cfg: CriterionConfig,
    pred_idx_all: Optional[jnp.ndarray] = None,
    num_boxes: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Full criterion over the final level + aux levels (set_criterion.py:172-217).

    outputs: {"pred_logits": (B, M, C), "pred_boxes": (B, M, 4),
              "aux_outputs": [ {...} per intermediate level ]}.
    targets: dense masked dict from `to_detr_targets`.
    pred_idx_all: optional externally-solved indices (A, B, N) — A matching
    `matching_costs_all`'s level count, N its (possibly compacted) slot
    count — used by the host-matched split step; when given, no solver runs
    inside this function.
    num_boxes: optional normalizer override. Every loss term is a per-sample
    sum divided by this count, so a caller that splits a batch into
    micro-batches (gradient accumulation, train/step.py) passes the
    FULL-batch count here and sums the micro losses — exactly the unsplit
    loss. Default: this batch's active-target count (global under GSPMD).
    Returns a dict of per-loss scalars, aux levels suffixed `_{i}`.
    """
    if num_boxes is None:
        # From the PRE-compaction active mask: on cost_slots overflow the
        # dropped targets still normalize (conservative), keeping the count
        # identical to the reference's and to the accumulation path's
        # full-batch normalizer.
        num_boxes = jnp.maximum(targets["active"].sum().astype(jnp.float32), 1.0)
    targets, dropped = compact_targets(targets, cfg.cost_slots)
    aux = list(outputs.get("aux_outputs", [])) if cfg.aux_loss else []

    if pred_idx_all is not None:
        rounds = jnp.zeros((1,), jnp.int32)
        pred_idx = pred_idx_all[0]
        if pred_idx_all.shape[0] > 1:
            aux_idx = [pred_idx_all[i + 1] for i in range(len(aux))]
        else:
            aux_idx = [pred_idx] * len(aux)
    elif aux and cfg.matching_mode == "per level":
        # Batch all levels into ONE vmapped solve: the auction's while_loop is
        # the only sequential part of the criterion, so running (levels+1)·B
        # problems in lockstep instead of levels+1 sequential solves divides
        # its wall-clock by the level count.
        B, N = targets["active"].shape[0], targets["labels"].shape[1]
        costs, tiled_active = matching_costs_all(outputs, targets, cfg)
        A = costs.shape[0] // B
        all_idx, rounds = SOLVERS[cfg.matcher](costs, tiled_active, return_rounds=True)
        all_idx = all_idx.reshape(A, B, N)
        pred_idx, aux_idx = all_idx[0], [all_idx[i + 1] for i in range(len(aux))]
    else:
        pred_idx, rounds = _match(outputs, targets, cfg)
        aux_idx = [pred_idx] * len(aux)

    losses = _level_losses(outputs, targets, pred_idx, num_boxes, cfg, log=True)
    if cfg.masks and "pred_masks" in outputs:
        # Final level only, as in DETR (aux levels skip mask losses).
        losses.update(_mask_losses(outputs, targets, pred_idx, num_boxes, cfg))
    for i, lvl in enumerate(aux):
        aux_losses = _level_losses(lvl, targets, aux_idx[i], num_boxes, cfg, log=False)
        losses.update({f"{k}_{i}": v for k, v in aux_losses.items()})

    # Matcher telemetry (logging only): worst-case bidding rounds across all
    # solved problems this step, and final-level unmatched actives per image.
    # An ε regression (price-increment underflow) shows up here as rounds
    # pinned at max_iters + a non-zero unmatched count.
    M = outputs["pred_logits"].shape[1]
    B = targets["active"].shape[0]
    losses["matcher_rounds"] = jax.lax.stop_gradient(
        jnp.max(rounds).astype(jnp.float32)
    )
    losses["matcher_unmatched"] = jax.lax.stop_gradient(
        (targets["active"] & (pred_idx == M)).sum().astype(jnp.float32) / B
    )
    # Active targets that did not fit in cost_slots (excluded from matching
    # AND the loss this step) — must be ~always 0; the Trainer warns if not.
    losses["matcher_dropped"] = dropped
    return losses


def weighted_total(losses: Dict[str, jnp.ndarray], cfg: CriterionConfig, num_aux: int):
    """Total loss = Σ weight_k · loss_k over the weight dict the reference
    builds in st_detr.py:67-77."""
    base = {
        "loss_ce": cfg.cls_loss_coef,
        "loss_bbox": cfg.bbox_loss_coef,
        "loss_giou": cfg.giou_loss_coef,
    }
    weights = dict(base)
    if cfg.masks:
        weights["loss_mask"] = cfg.mask_loss_coef
        weights["loss_dice"] = cfg.dice_loss_coef
    for i in range(num_aux):
        weights.update({f"{k}_{i}": v for k, v in base.items()})
    total = sum(losses[k] * w for k, w in weights.items() if k in losses)
    return total, weights
