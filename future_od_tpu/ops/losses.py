"""Loss primitives: sigmoid focal loss, dice loss, class-error.

Semantics follow the DETR-family losses the reference imports from its
ConditionalDETR submodule (`set_criterion.py:6,63,145-146`), re-expressed as
masked, shape-static jnp functions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_binary_cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable BCE-with-logits, elementwise."""
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    num_boxes: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """DETR-style focal loss.

    logits/targets: (B, M, C) with one-hot targets. Returns
    mean-over-queries, summed over batch and classes, divided by num_boxes —
    the reduction used by the reference's sigmoid_focal_loss (RetinaNet/DETR
    convention: `loss.mean(1).sum() / num_boxes`).
    """
    prob = jax.nn.sigmoid(logits)
    ce = sigmoid_binary_cross_entropy(logits, targets)
    p_t = prob * targets + (1.0 - prob) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    return loss.mean(axis=1).sum() / num_boxes


def dice_loss(
    logits: jnp.ndarray, targets: jnp.ndarray, num_boxes: jnp.ndarray
) -> jnp.ndarray:
    """DICE/F-1 loss for masks. logits/targets: (N, HW) flattened masks."""
    probs = jax.nn.sigmoid(logits)
    numerator = 2.0 * (probs * targets).sum(axis=1)
    denominator = probs.sum(axis=1) + targets.sum(axis=1)
    loss = 1.0 - (numerator + 1.0) / (denominator + 1.0)
    return loss.sum() / num_boxes


def class_error(
    matched_logits: jnp.ndarray,
    matched_classes: jnp.ndarray,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """100 - top-1 accuracy of matched predictions (set_criterion.py:76).

    matched_logits: (B, N, C); matched_classes: (B, N) int; valid: (B, N) bool
    mask for real (active) target slots.
    """
    pred = jnp.argmax(matched_logits, axis=-1)
    correct = (pred == matched_classes) & valid
    num = jnp.maximum(valid.sum(), 1)
    accuracy = 100.0 * correct.sum() / num
    return 100.0 - accuracy
