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


def smooth_factors(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Per-INPUT-channel scale-migration factors m (SmoothQuant, α=0.5).

    Outlier input channels (ratios of 10-60x between the tensor abs-max and
    the median channel abs-max were measured on a converged backbone —
    BENCHMARKS.md round 3) make per-tensor activation quantization lossy: one
    hot channel sets the scale and the rest collapse to a few levels.
    Dividing x by m and multiplying the matching kernel input slice by m is
    an EXACT rewrite of the conv; choosing m_c = sqrt(amax(x_c)/colmax(w_c))
    equalizes the two sides' dynamic ranges so both int8 quantizations see
    ~sqrt of the original channel spread. Costs one per-channel reduction and
    one elementwise divide (fused by XLA); the conv stays pure int8.
    """
    x32 = x.astype(jnp.float32)
    act_amax = jnp.max(jnp.abs(x32), axis=tuple(range(x.ndim - 1)), initial=0.0)
    w32 = kernel.astype(jnp.float32)
    # per-input-channel kernel abs-max: reduce every axis except input (-2)
    w_axes = tuple(i for i in range(kernel.ndim) if i != kernel.ndim - 2)
    w_amax = jnp.max(jnp.abs(w32), axis=w_axes)
    m = jnp.sqrt(
        jnp.maximum(act_amax, 1e-12) / jnp.maximum(w_amax, 1e-12)
    )
    # dead channels (all-zero activations) keep m = 1 to avoid inflating the
    # folded kernel with activation ranges that never materialize
    return jnp.where(act_amax > 0.0, m, 1.0)


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


def _conv_nonneg_core(
    x32, scale, wq, ws, bias, strides, padding, dilation, out_dtype
):
    """Shared zero-point-128 conv body (dynamic and static paths): quantize
    the smoothed input with the given per-tensor scale, pad in the QUANTIZED
    domain with -128 (= x 0), int8×int8 conv with int32 MXU accumulation,
    per-output-channel zero-point correction, dequantize, bias."""
    q = (
        jnp.clip(jnp.round(x32 / scale), 0.0, 255.0) - 128.0
    ).astype(jnp.int8)
    pH, pW = tuple(padding[0]), tuple(padding[1])
    if pH != (0, 0) or pW != (0, 0):
        q = jnp.pad(
            q, ((0, 0), pH, pW, (0, 0)), constant_values=jnp.int8(-128)
        )
    acc = jax.lax.conv_general_dilated(
        q, wq, tuple(strides), [(0, 0), (0, 0)],
        rhs_dilation=tuple(dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    # zero-point correction: 128 · Σ_{h,w,i} wq per output channel (int32)
    zp_corr = 128 * jnp.sum(
        wq.astype(jnp.int32), axis=tuple(range(wq.ndim - 1))
    )
    out = (acc + zp_corr).astype(jnp.float32) * (scale * ws)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


def _conv_signed_core(
    x32, scale, wq, ws, bias, strides, padding, dilation, out_dtype
):
    """Shared symmetric-signed conv body (dynamic and static paths); zero
    padding is exact in the quantized domain (0 maps to q = 0)."""
    q = jnp.clip(jnp.round(x32 / scale), -QMAX, QMAX).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        q, wq, tuple(strides), list(padding),
        rhs_dilation=tuple(dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (scale * ws)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


def int8_conv_nonneg(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    strides: Sequence[int] = (1, 1),
    padding: Sequence[Tuple[int, int]] = ((0, 0), (0, 0)),
    dilation: Sequence[int] = (1, 1),
) -> jnp.ndarray:
    """int8 conv for NON-NEGATIVE (post-ReLU) inputs with the full 8-bit
    range recovered via a fixed zero-point of 128.

    Symmetric int8 wastes the sign bit on post-ReLU activations (effective
    7-bit resolution — measured as a 0.28 AP50 drop on a converged model,
    BENCHMARKS.md round 3). Here q = round(x/s) - 128 with s = max(x)/255,
    so x ≈ s·(q + 128). Exactness under zero-padding: padding is applied in
    the QUANTIZED domain with value -128 (which represents x = 0), making
    conv(x)/s == conv_valid(q_pad) + 128·Σw[c] with the correction constant
    per output channel — folded into the bias, no border terms. Both conv
    operands remain int8 with int32 MXU accumulation.
    """
    m = smooth_factors(x, kernel)
    wq, ws = quantize_weight_per_channel(
        kernel.astype(jnp.float32) * m[None, None, :, None]
    )
    x32 = x.astype(jnp.float32) / m
    amax = jnp.max(x32, initial=0.0)  # x >= 0: max is the range
    scale = jnp.maximum(amax, 1e-12) / 255.0
    return _conv_nonneg_core(
        x32, scale, wq, ws, bias, strides, padding, dilation, x.dtype
    )


def observe_channel_amax(x: jnp.ndarray, nonneg: bool) -> jnp.ndarray:
    """Per-input-channel activation range, (C,) float32 — the one statistic
    the STATIC calibration stores per conv (everything else — smoothing
    factors, per-tensor scale — derives from it plus the weights)."""
    x32 = x.astype(jnp.float32)
    v = x32 if nonneg else jnp.abs(x32)
    return jnp.max(v, axis=tuple(range(x.ndim - 1)), initial=0.0)


def static_smooth_and_scale(
    amax_c: jnp.ndarray, kernel: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(stored per-channel act range, effective kernel) -> (per-input-channel
    smoothing factors m, post-smoothing per-tensor act range).

    Same α=0.5 scale migration as `smooth_factors`, but driven by CALIBRATED
    ranges instead of a per-call full-tensor reduction — the O(C) math here
    is negligible next to the activation passes it replaces."""
    w32 = kernel.astype(jnp.float32)
    w_axes = tuple(i for i in range(kernel.ndim) if i != kernel.ndim - 2)
    w_amax = jnp.max(jnp.abs(w32), axis=w_axes)
    m = jnp.sqrt(
        jnp.maximum(amax_c, 1e-12) / jnp.maximum(w_amax, 1e-12)
    )
    m = jnp.where(amax_c > 0.0, m, 1.0)
    return m, jnp.max(amax_c / m, initial=0.0)


def _static_scale(amax: jnp.ndarray, qrange: float) -> jnp.ndarray:
    """Per-tensor scale from a calibrated range, guarded against the
    NEVER-CALIBRATED case: an all-zero stored range (e.g. the "quant"
    collection initialized but no mutable-"quant" pass run, or calibration
    run under a different FUTURE_OD_INT8_SKIP than inference) would give
    scale ≈ 4e-15 and saturate every activation to the clip boundary —
    constant garbage with no error. Fall back to scale = 1.0 (plain
    round-to-integer quantization: degraded, not broken). For any
    calibrated range (amax > 0) this matches the dynamic path's
    max(amax, 1e-12)/qrange bit for bit."""
    return jnp.where(amax > 0.0, jnp.maximum(amax, 1e-12), qrange) / qrange


def assert_calibrated(quant_collection) -> None:
    """Eager-side guard for the static-int8 path: raise if any stored range
    in a "quant" collection is still all-zero (i.e. no mutable-"quant"
    calibration pass ever observed that conv — e.g. calibration ran under a
    different FUTURE_OD_INT8_SKIP than inference will). Inside jit the same
    condition degrades gracefully to scale = 1.0 (see _static_scale); call
    this from serving/bench entry points where the collection is concrete."""
    import numpy as np

    flat = jax.tree_util.tree_flatten_with_path(quant_collection)[0]
    dead = [
        jax.tree_util.keystr(path)
        for path, leaf in flat
        if not (np.asarray(leaf) > 0).any()
    ]
    if dead:
        raise ValueError(
            "static-int8 'quant' collection has uncalibrated (all-zero) "
            f"ranges: {dead} — run a calibration pass "
            "(model.apply(..., mutable=['quant'])) with the same "
            "FUTURE_OD_INT8_SKIP setting inference will use"
        )


def int8_conv_nonneg_static(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    amax_c: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    strides: Sequence[int] = (1, 1),
    padding: Sequence[Tuple[int, int]] = ((0, 0), (0, 0)),
    dilation: Sequence[int] = (1, 1),
) -> jnp.ndarray:
    """`int8_conv_nonneg` with CALIBRATED ranges: the dynamic path's three
    full-tensor activation passes (channel amax for smoothing, smoothing
    divide, tensor amax) collapse into ONE fused divide+round+clip that XLA
    merges with the preceding elementwise op. Given amax_c equal to the
    input's true per-channel range, the result is bit-identical to the
    dynamic path (tests/test_quant.py)."""
    m, amax = static_smooth_and_scale(amax_c, kernel)
    wq, ws = quantize_weight_per_channel(
        kernel.astype(jnp.float32) * m[None, None, :, None]
    )
    scale = _static_scale(amax, 255.0)
    # same arithmetic ORDER as the dynamic path (x/m, then /scale) so the
    # result is bit-identical given exact ranges; XLA fuses the two divides
    # into the one elementwise pass either way
    x32 = x.astype(jnp.float32) / m
    return _conv_nonneg_core(
        x32, scale, wq, ws, bias, strides, padding, dilation, x.dtype
    )


def int8_conv_static(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    amax_c: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    strides: Sequence[int] = (1, 1),
    padding: Sequence[Tuple[int, int]] = ((0, 0), (0, 0)),
    dilation: Sequence[int] = (1, 1),
) -> jnp.ndarray:
    """`int8_conv` (signed symmetric, for the stem's signed inputs) with
    CALIBRATED per-channel ranges — same single-pass quantization as
    `int8_conv_nonneg_static`; zero padding is exact (0 maps to q=0)."""
    m, amax = static_smooth_and_scale(amax_c, kernel)
    wq, ws = quantize_weight_per_channel(
        kernel.astype(jnp.float32) * m[None, None, :, None]
    )
    scale = _static_scale(amax, QMAX)
    x32 = x.astype(jnp.float32) / m
    return _conv_signed_core(
        x32, scale, wq, ws, bias, strides, padding, dilation, x.dtype
    )


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
    m = smooth_factors(x, kernel)
    wq, ws = quantize_weight_per_channel(
        kernel.astype(jnp.float32) * m[None, None, :, None]
    )
    x32 = x.astype(jnp.float32) / m
    amax = jnp.max(jnp.abs(x32), initial=0.0)
    scale = jnp.maximum(amax, 1e-12) / QMAX
    return _conv_signed_core(
        x32, scale, wq, ws, bias, strides, padding, dilation, x.dtype
    )
