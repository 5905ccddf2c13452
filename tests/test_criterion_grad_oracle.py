"""Criterion GRADIENT parity against a torch oracle.

Forward oracles (test_*_torch_oracle.py) pin the model math; training
dynamics additionally depend on d(total loss)/d(predictions) — where a
mis-placed stop_gradient, a different loss reduction, or a masking bug
would diverge while leaving forward values identical. This test injects
the SAME assignment into both sides (decoupling the matcher, which has
its own parity tests) and compares the full gradient of the weighted
total — final level + aux level, focal + L1 + GIoU, and the mask
focal+dice path — elementwise.

Torch oracle re-implements the reference criterion functionally:
/root/reference/future_od/models/set_criterion.py:36-115 (labels/boxes),
:117-148 (masks), :172-217 (aux levels + num_boxes clamp), with the
DETR-family focal loss / GIoU the reference imports from its
ConditionalDETR submodule.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from future_od_tpu.models.set_criterion import (
    CriterionConfig,
    set_criterion,
    weighted_total,
)

B, M, C, N = 2, 6, 4, 3  # images, queries, classes, dense target slots


# ---- torch functional reference ----------------------------------------


def t_focal(inputs, targets, num_boxes, alpha=0.25, gamma=2.0):
    prob = inputs.sigmoid()
    ce = F.binary_cross_entropy_with_logits(inputs, targets, reduction="none")
    p_t = prob * targets + (1 - prob) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        loss = (alpha * targets + (1 - alpha) * (1 - targets)) * loss
    return loss.mean(1).sum() / num_boxes


def t_cxcywh_to_xyxy(b):
    cx, cy, w, h = b.unbind(-1)
    return torch.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], dim=-1
    )


def t_elementwise_giou(b1, b2):
    lt = torch.max(b1[..., :2], b2[..., :2])
    rb = torch.min(b1[..., 2:], b2[..., 2:])
    inter = (rb - lt).clamp(min=0).prod(-1)
    a1 = (b1[..., 2:] - b1[..., :2]).prod(-1)
    a2 = (b2[..., 2:] - b2[..., :2]).prod(-1)
    union = a1 + a2 - inter
    iou = inter / union
    hull_lt = torch.min(b1[..., :2], b2[..., :2])
    hull_rb = torch.max(b1[..., 2:], b2[..., 2:])
    hull = (hull_rb - hull_lt).clamp(min=0).prod(-1)
    return iou - (hull - union) / hull


def torch_level_losses(logits, boxes, ragged, indices, num_boxes, num_classes):
    """set_criterion.py:36-115 on one level. ragged: per-image dicts with
    'labels'/'boxes' tensors; indices: per-image (src, tgt) index pairs."""
    target_classes = torch.full(logits.shape[:2], num_classes, dtype=torch.int64)
    for b, (src, tgt) in enumerate(indices):
        target_classes[b, src] = ragged[b]["labels"][tgt]
    onehot = torch.zeros(logits.shape[0], logits.shape[1], logits.shape[2] + 1)
    onehot.scatter_(2, target_classes.unsqueeze(-1), 1)
    loss_ce = t_focal(logits, onehot[:, :, :-1], num_boxes) * logits.shape[1]

    src_boxes = torch.cat(
        [boxes[b, src] for b, (src, _) in enumerate(indices)]
    )
    tgt_boxes = torch.cat(
        [ragged[b]["boxes"][tgt] for b, (_, tgt) in enumerate(indices)]
    )
    loss_bbox = F.l1_loss(src_boxes, tgt_boxes, reduction="none").sum() / num_boxes
    giou = t_elementwise_giou(
        t_cxcywh_to_xyxy(src_boxes), t_cxcywh_to_xyxy(tgt_boxes)
    )
    loss_giou = (1 - giou).sum() / num_boxes
    return loss_ce, loss_bbox, loss_giou


# ---- shared fixtures ----------------------------------------------------


def make_problem(rng, with_masks=False, mask_hw=((8, 12), (16, 24))):
    """Random preds (1 aux level), dense targets (one image empty-ish),
    and a fixed random assignment shared by both sides."""
    active = np.zeros((B, N), bool)
    active[0, :3] = True  # image 0: full
    active[1, :1] = True  # image 1: single target (exercises spill slots)
    labels = rng.integers(0, C, (B, N))
    tboxes = np.stack(
        [
            rng.uniform(0.3, 0.7, (B, N, 2)),  # centers
            rng.uniform(0.1, 0.3, (B, N, 2)),  # sizes
        ],
        axis=-2,
    ).reshape(B, N, 4)

    def level():
        return {
            "pred_logits": rng.normal(0, 1, (B, M, C)).astype(np.float32),
            "pred_boxes": rng.uniform(0.2, 0.8, (B, M, 4)).astype(np.float32),
        }

    outputs = level()
    outputs["aux_outputs"] = [level()]

    # per-level random assignment: active target n -> distinct pred index
    pred_idx_all = np.full((2, B, N), M, np.int32)
    for a in range(2):
        for b in range(B):
            k = int(active[b].sum())
            pred_idx_all[a, b, :k] = rng.choice(M, size=k, replace=False)

    targets = {
        "labels": jnp.asarray(labels.astype(np.int32)),
        "boxes": jnp.asarray(tboxes.astype(np.float32)),
        "active": jnp.asarray(active),
    }
    if with_masks:
        h, w = mask_hw[1]
        masks = (rng.uniform(size=(B, N, h, w)) > 0.5).astype(np.float32)
        targets["masks"] = jnp.asarray(masks)
        hp, wp = mask_hw[0]
        outputs["pred_masks"] = rng.normal(0, 1, (B, M, hp, wp)).astype(
            np.float32
        )
    return outputs, targets, pred_idx_all, active


def torch_indices(pred_idx_all, active):
    """Our dense (A, B, N) assignment -> reference ragged indices + targets
    views (tgt indices enumerate the active targets in slot order)."""
    per_level = []
    for a in range(pred_idx_all.shape[0]):
        level = []
        for b in range(B):
            k = int(active[b].sum())
            src = torch.as_tensor(pred_idx_all[a, b, :k], dtype=torch.int64)
            level.append((src, torch.arange(k)))
        per_level.append(level)
    return per_level


# ---- tests --------------------------------------------------------------


def test_weighted_total_grads_match_torch():
    rng = np.random.default_rng(11)
    outputs, targets, pred_idx_all, active = make_problem(rng)
    cfg = CriterionConfig(num_classes=C)

    def total_fn(out):
        losses = set_criterion(out, targets, cfg, pred_idx_all=jnp.asarray(pred_idx_all))
        return weighted_total(losses, cfg, num_aux=len(out["aux_outputs"]))[0]

    jax_outputs = jax.tree.map(jnp.asarray, outputs)
    jtotal = total_fn(jax_outputs)
    jgrads = jax.jit(jax.grad(total_fn))(jax_outputs)

    # torch oracle
    num_boxes = max(float(active.sum()), 1.0)
    ragged = [
        {
            "labels": torch.as_tensor(
                np.asarray(targets["labels"])[b][active[b]], dtype=torch.int64
            ),
            "boxes": torch.as_tensor(np.asarray(targets["boxes"])[b][active[b]]),
        }
        for b in range(B)
    ]
    indices = torch_indices(pred_idx_all, active)
    levels = [outputs] + outputs["aux_outputs"]
    tensors = [
        {
            "pred_logits": torch.tensor(lvl["pred_logits"], requires_grad=True),
            "pred_boxes": torch.tensor(lvl["pred_boxes"], requires_grad=True),
        }
        for lvl in levels
    ]
    total = torch.zeros(())
    for a, ten in enumerate(tensors):
        ce, bb, gi = torch_level_losses(
            ten["pred_logits"], ten["pred_boxes"], ragged, indices[a],
            num_boxes, C,
        )
        total = total + cfg.cls_loss_coef * ce + cfg.bbox_loss_coef * bb + cfg.giou_loss_coef * gi
    total.backward()

    np.testing.assert_allclose(float(jtotal), float(total), rtol=1e-5)
    for a, (jlvl, ten) in enumerate(
        zip([jgrads] + jgrads["aux_outputs"], tensors)
    ):
        for key in ("pred_logits", "pred_boxes"):
            np.testing.assert_allclose(
                np.asarray(jlvl[key]),
                ten[key].grad.numpy(),
                rtol=1e-4,
                atol=1e-6,
                err_msg=f"level {a} d total / d {key}",
            )


def test_mask_loss_grads_match_torch():
    rng = np.random.default_rng(12)
    outputs, targets, pred_idx_all, active = make_problem(rng, with_masks=True)
    cfg = CriterionConfig(num_classes=C, masks=True, aux_loss=False)
    pred_idx = pred_idx_all[:1]

    def total_fn(pred_masks):
        out = dict(outputs, pred_masks=pred_masks)
        out.pop("aux_outputs")
        losses = set_criterion(out, targets, cfg, pred_idx_all=jnp.asarray(pred_idx))
        return (
            cfg.mask_loss_coef * losses["loss_mask"]
            + cfg.dice_loss_coef * losses["loss_dice"]
        )

    jmasks = jnp.asarray(outputs["pred_masks"])
    jgrad = jax.jit(jax.grad(total_fn))(jmasks)

    # torch oracle (set_criterion.py:117-148): gather matched masks,
    # bilinear-upsample (align_corners=False), focal-mean + dice / num_boxes
    num_boxes = max(float(active.sum()), 1.0)
    src = torch.tensor(outputs["pred_masks"], requires_grad=True)
    tmasks = torch.as_tensor(np.asarray(targets["masks"]))
    srcs, tgts = [], []
    for b in range(B):
        k = int(active[b].sum())
        srcs.append(src[b, pred_idx[0, b, :k]])
        tgts.append(tmasks[b, :k])
    smask = torch.cat(srcs)[:, None]
    tmask = torch.cat(tgts)
    smask = F.interpolate(
        smask, size=tmask.shape[-2:], mode="bilinear", align_corners=False
    )[:, 0].flatten(1)
    tmask = tmask.flatten(1)
    prob = smask.sigmoid()
    ce = F.binary_cross_entropy_with_logits(smask, tmask, reduction="none")
    p_t = prob * tmask + (1 - prob) * (1 - tmask)
    alpha_t = cfg.focal_alpha * tmask + (1 - cfg.focal_alpha) * (1 - tmask)
    loss_mask = (alpha_t * ce * (1 - p_t) ** 2).mean(1).sum() / num_boxes
    dice = 1 - (2 * (prob * tmask).sum(1) + 1) / (prob.sum(1) + tmask.sum(1) + 1)
    loss_dice = dice.sum() / num_boxes
    total = cfg.mask_loss_coef * loss_mask + cfg.dice_loss_coef * loss_dice
    total.backward()

    np.testing.assert_allclose(
        float(total_fn(jmasks)), float(total), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(jgrad), src.grad.numpy(), rtol=1e-3, atol=1e-6
    )
