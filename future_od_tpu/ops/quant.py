"""Int8 post-training quantization for the backbone conv path.

TPU-native inference extra (no reference counterpart — the reference serves
fp32/TF32 eager PyTorch, `/root/reference/future_od/models/paper.py:83-116`):
the v5e MXU's int8 peak is 2x its bf16 peak, and int8 activations halve the
HBM traffic of the bandwidth-bound early ResNet stages, so a quantized
backbone attacks both walls the float backbone hits (BENCHMARKS.md: backbone
= ~75% of inference at the eval shape).

Scheme (standard conv PTQ):
  - weights: symmetric per-output-channel int8, frozen-BN scale folded into
    the kernel BEFORE quantization so the per-channel scale absorbs it;
  - activations: symmetric per-tensor int8 with a dynamic (abs-max) scale —
    no calibration pass or stored ranges, robust to input distribution;
  - accumulation: int32 on the MXU (`preferred_element_type`), dequantized
    by `act_scale * weight_scale[c]` back to the compute dtype.

All functions are shape-polymorphic and jit-safe (no data-dependent control
flow); the rounding mode is round-half-to-even (`jnp.round`), matching the
XLA default for float->int conversion paths.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

QMAX = 127.0


def quantize_weight_per_channel(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """HWIO kernel -> (int8 kernel, float32 per-output-channel scale).

    Symmetric: q = round(w / s), s = max|w| over (H, W, I) per O, so the full
    int8 range covers the channel's dynamic range exactly.
    """
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=tuple(range(w.ndim - 1)))
    scale = jnp.maximum(amax, 1e-12) / QMAX
    q = jnp.clip(jnp.round(w32 / scale), -QMAX, QMAX).astype(jnp.int8)
    return q, scale


def quantize_act_per_tensor(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Activation tensor -> (int8 tensor, scalar float32 scale), dynamic
    abs-max symmetric quantization."""
    x32 = x.astype(jnp.float32)
    # initial= keeps zero-size inputs legal (the float conv path accepts
    # them, e.g. degenerate 1-frame clips through a future-pred core)
    amax = jnp.max(jnp.abs(x32), initial=0.0)
    scale = jnp.maximum(amax, 1e-12) / QMAX
    q = jnp.clip(jnp.round(x32 / scale), -QMAX, QMAX).astype(jnp.int8)
    return q, scale


def int8_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    strides: Sequence[int] = (1, 1),
    padding: Sequence[Tuple[int, int]] = ((0, 0), (0, 0)),
    dilation: Sequence[int] = (1, 1),
) -> jnp.ndarray:
    """Float-in / float-out NHWC conv computed on the int8 MXU path.

    `kernel` is the EFFECTIVE float kernel (frozen-BN scale already folded
    in); `bias` the folded BN shift. Quantizes both operands, convolves with
    int32 accumulation, dequantizes, adds bias. Output dtype follows x.
    """
    out_dtype = x.dtype
    wq, ws = quantize_weight_per_channel(kernel)
    xq, xs = quantize_act_per_tensor(x)
    acc = jax.lax.conv_general_dilated(
        xq, wq, tuple(strides), list(padding),
        rhs_dilation=tuple(dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (xs * ws)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)
