"""SpatioTemporalDETR task wrapper: forward + set loss + post-processing.

Re-design of `/root/reference/future_od/models/st_detr.py`. The wrapper is a
flax module over a core model; `forward_with_loss` is the pure function the
trainer jits (model apply -> criterion -> post-proc -> AP intermediaries in
one XLA program).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from future_od_tpu.models.set_criterion import (
    CriterionConfig,
    set_criterion,
    weighted_total,
)
from future_od_tpu.ops.misc import video_hw
from future_od_tpu.ops.target_utils import to_detr_targets

IMU_KEYS = ("translation", "acceleration", "rotation", "rotation_rate")


@dataclass(frozen=True)
class SpatioTemporalDETRArgs:
    """All model/loss hyperparameters (st_detr.py:12-55)."""

    num_classes: int
    masks: bool = False

    # Optimization
    lr_backbone: float = 1e-5
    lr: float = 1e-4
    weight_decay: float = 1e-4
    max_norm: float = 0.1

    # Backbone
    backbone: str = "resnet50"
    dilation: bool = False
    position_embedding: str = "sine"
    pretrained_backbone: bool = True

    # Transformer settings
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 2048
    hidden_dim: int = 256
    dropout: float = 0.1
    enc_nheads: int = 8
    nheads: int = 8
    num_queries: int = 300
    pre_norm: bool = False

    # Matcher settings
    set_cost_class: float = 2.0
    set_cost_bbox: float = 5.0
    set_cost_giou: float = 2.0

    # Loss settings
    aux_loss: bool = True
    cls_loss_coef: float = 2.0
    bbox_loss_coef: float = 5.0
    giou_loss_coef: float = 2.0
    focal_alpha: float = 0.25

    # Data settings
    no_imu_speed: bool = False
    encode_offset: bool = False

    # TPU-native extras
    matcher: str = "auction"  # on-device default; "hungarian" = exact host arm
    # static active-slot compaction of the dense targets before the matcher
    # cost build (see CriterionConfig.cost_slots); 0 = full Nmax (exact
    # reference envelope, slower)
    cost_slots: int = 128
    # s2d stem: 4x4/1 conv over 2x2-packed input replaces the MXU-hostile
    # 3-channel 7x7/2 conv; pack on the HOST loader (12-channel video) to
    # avoid the on-device transpose (BENCHMARKS.md round 2)
    space_to_depth: bool = False
    # int8 post-training quantization of the backbone trunk (inference only;
    # training always runs the float path). See ops/quant.py.
    int8_backbone: bool = False
    # static-calibration int8: ranges from a calibration pass stored in the
    # "quant" collection (calibrate with apply(..., mutable=["quant"]));
    # implies the int8 inference path
    int8_static: bool = False
    # stem+layer1 freeze (paper.py:102-109). Besides the optimizer mask this
    # severs the backward graph at the boundary (resnet.stop_grad_frozen) —
    # exact, and skips the frozen stages' backward work. Set False (and pass
    # Trainer(freeze_backbone_stem=False)) when training from scratch.
    freeze_stem: bool = True

    def criterion_config(self, matching_mode: str = "per level") -> CriterionConfig:
        return CriterionConfig(
            num_classes=self.num_classes,
            cls_loss_coef=self.cls_loss_coef,
            bbox_loss_coef=self.bbox_loss_coef,
            giou_loss_coef=self.giou_loss_coef,
            focal_alpha=self.focal_alpha,
            set_cost_class=self.set_cost_class,
            set_cost_bbox=self.set_cost_bbox,
            set_cost_giou=self.set_cost_giou,
            matching_mode=matching_mode,
            matcher=self.matcher,
            aux_loss=self.aux_loss,
            masks=self.masks,
            cost_slots=self.cost_slots,
        )

    def imu_keys(self) -> Tuple[str, ...]:
        return IMU_KEYS + (() if self.no_imu_speed else ("speed",))


STAT_IDFS = (
    "labels", "box_l1", "box_giou", "cardinality", "class_error",
    "matcher_rounds", "matcher_unmatched", "matcher_dropped",
)


class SpatioTemporalDETR(nn.Module):
    """Thin task module: assembles IMU input and runs the core (st_detr.py:98-120).

    Loss/post-proc are pure functions below so the trainer composes them
    freely inside one jitted step.
    """

    core: nn.Module
    args: SpatioTemporalDETRArgs

    @nn.compact
    def __call__(self, data: Dict[str, jnp.ndarray], deterministic: bool = True):
        images = data["video"]  # (B, L, H, W, 3)
        kwargs = {}
        if data.get("translation") is not None:
            kwargs["imu"] = jnp.concatenate(
                [data[k] for k in self.args.imu_keys()], axis=2
            )
        if self.args.encode_offset:
            kwargs["temporal_offsets"] = data["temporal_offsets"]
        return self.core(images, deterministic=deterministic, **kwargs)


def normalize_outputs(outputs, data) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray, jnp.ndarray]:
    """Normalize core output to (annotated_frame_output, pred_logits, pred_boxes).

    Mirrors st_detr.py:122-158: a core may return one dict (single output,
    L_out=1) or a list of per-frame dicts (CausalCore-style), in which case
    the annotated frame (incl. aux levels) is gathered per batch element.
    pred_logits/pred_boxes gain the L_out axis at dim 1.
    """
    if isinstance(outputs, (list, tuple)):
        pred_logits = jnp.stack([o["pred_logits"] for o in outputs], axis=1)
        pred_boxes = jnp.stack([o["pred_boxes"] for o in outputs], axis=1)
        B = pred_logits.shape[0]
        idx = data["annotated_frame_idx"]  # (B,)
        take = lambda x: x[jnp.arange(B), idx]
        num_aux = len(outputs[0].get("aux_outputs", []))
        annotated = {
            "pred_logits": take(pred_logits),
            "pred_boxes": take(pred_boxes),
        }
        if num_aux:
            aux_logits = jnp.stack(
                [
                    jnp.stack([o["aux_outputs"][a]["pred_logits"] for o in outputs], axis=1)
                    for a in range(num_aux)
                ]
            )  # (A, B, L, M, C)
            aux_boxes = jnp.stack(
                [
                    jnp.stack([o["aux_outputs"][a]["pred_boxes"] for o in outputs], axis=1)
                    for a in range(num_aux)
                ]
            )
            annotated["aux_outputs"] = [
                {
                    "pred_logits": aux_logits[a][jnp.arange(B), idx],
                    "pred_boxes": aux_boxes[a][jnp.arange(B), idx],
                }
                for a in range(num_aux)
            ]
        return annotated, pred_logits, pred_boxes
    if "pred_logits" in outputs and outputs["pred_logits"].ndim == 3:
        return outputs, outputs["pred_logits"][:, None], outputs["pred_boxes"][:, None]
    raise ValueError(f"cannot interpret output format: {jax.tree.structure(outputs)}")


def compute_loss(
    annotated_output: Dict[str, Any],
    data: Dict[str, jnp.ndarray],
    criterion_cfg: CriterionConfig,
    pred_idx_all: Optional[jnp.ndarray] = None,
    num_boxes: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Set loss + the reference's stat dict (st_detr.py:169-188).

    num_boxes: optional normalizer override for micro-batched callers
    (gradient accumulation) — see set_criterion."""
    H, W = video_hw(data["video"])
    targets = to_detr_targets(
        H, W, data["active"], data["boxes"], data["classes"]
    )
    if criterion_cfg.masks:
        # Mask targets are not derivable from boxes; the batch must carry
        # them in the same dense slot layout. Fail loudly rather than let
        # _mask_losses KeyError inside jit (ADVICE r2).
        if "masks" not in data:
            raise ValueError(
                "criterion_cfg.masks=True requires dense mask targets in the "
                "batch: data['masks'] with shape (B, N, H, W) aligned to the "
                "boxes/classes slots (no bundled dataset emits them)"
            )
        targets = {**targets, "masks": data["masks"]}
    losses = set_criterion(
        annotated_output, targets, criterion_cfg, pred_idx_all, num_boxes
    )
    num_aux = len(annotated_output.get("aux_outputs", []))
    total, weights = weighted_total(losses, criterion_cfg, num_aux)
    stats = {
        "labels": losses["loss_ce"] * weights["loss_ce"],
        "box_l1": losses["loss_bbox"] * weights["loss_bbox"],
        "box_giou": losses["loss_giou"] * weights["loss_giou"],
        "cardinality": losses["cardinality_error"],
        "class_error": losses["class_error"],
        "matcher_rounds": losses["matcher_rounds"],
        "matcher_unmatched": losses["matcher_unmatched"],
        "matcher_dropped": losses["matcher_dropped"],
    }
    assert set(stats) == set(STAT_IDFS)
    return total, stats


def post_process(
    pred_logits: jnp.ndarray,  # (B, L_out, M, C)
    pred_boxes: jnp.ndarray,  # (B, L_out, M, 4) cxcywh [0,1]
    data: Dict[str, jnp.ndarray],
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray, jnp.ndarray]:
    """Sigmoid scores + generic-object class + pixel xyxy boxes
    (st_detr.py:190-234). Returns (output dict, annotated-frame scores,
    annotated-frame boxes) — the latter feed the mAP accumulators."""
    B, L_in = data["video"].shape[0], data["video"].shape[1]
    H, W = video_hw(data["video"])
    scores = jax.nn.sigmoid(pred_logits)
    scores = jnp.concatenate([scores, scores.max(axis=3, keepdims=True)], axis=3)
    boxes = pred_boxes * jnp.array([W, H, W, H], dtype=pred_boxes.dtype)
    boxes = jnp.concatenate(
        [
            boxes[..., 0:2] - 0.5 * boxes[..., 2:4],
            boxes[..., 0:2] + 0.5 * boxes[..., 2:4],
        ],
        axis=-1,
    )
    if boxes.shape[1] == L_in:
        idx = data["annotated_frame_idx"]
        anno_scores = scores[jnp.arange(B), idx]
        anno_boxes = boxes[jnp.arange(B), idx]
    else:
        anno_scores = scores[:, 0]
        anno_boxes = boxes[:, 0]
    output = {
        "class_scores": scores[:, :, None, ...],  # (B, L_out, 1, M, C+1)
        "boxes": boxes[:, :, None, ...],
    }
    return output, anno_scores, anno_boxes
