"""Small numeric helpers."""
from __future__ import annotations

import jax.numpy as jnp


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Clamped logit, the inverse of sigmoid on [0, 1].

    Mirrors the DETR-family `inverse_sigmoid` the reference imports
    (paper.py:29,406): clamp x to [0,1], floor numerator/denominator at eps.
    """
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)


def video_hw(video) -> tuple:
    """Logical (H, W) pixels of a video tensor.

    A 12-channel (2x2 blocks) or 48-channel (4x4 blocks, the s2d4 stem
    layout device_normalize also accepts) video is space-to-depth packed on
    the HOST (pixel blocks folded into channels,
    models/resnet.py:space_to_depth) — the TPU stem optimization that avoids
    the on-device input transpose. Box scaling and the mAP accumulators must
    keep using the ORIGINAL pixel frame, so packed inputs report their
    block-factor times the stored spatial dims.
    """
    H, W, C = video.shape[2], video.shape[3], video.shape[-1]
    if C == 12:
        return 2 * H, 2 * W
    if C == 48:
        return 4 * H, 4 * W
    return H, W
