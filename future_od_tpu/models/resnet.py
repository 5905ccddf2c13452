"""ResNet backbone with frozen BatchNorm, NHWC, flax.linen.

TPU-native re-design of the reference's `CDetrBackbone`
(`/root/reference/future_od/models/paper.py:83-116`): torchvision ResNet-50
topology (v1 bottlenecks, stride on the 3x3 conv), FrozenBatchNorm2d
semantics (fixed statistics + affine, eps=1e-5), optional layer4 dilation,
and a 1x1 projection to the transformer width.

Frozen-BN statistics live in the non-trainable "frozen" variable collection;
stem/layer1 freezing is enforced by the optimizer mask
(future_od_tpu/train/optimizer.py), matching paper.py:102-109.

`future_od_tpu/utils/torch_port.py` maps a torchvision `state_dict` onto
these params for pretrained initialization (no download in this environment).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

# ImageNet statistics, duplicated from data/transforms.py (kept in sync by
# tests/test_models.py::test_uint8_device_normalize) so the model package
# never imports the OpenCV-backed data package. Used by the uint8
# device-normalize ingestion path below.
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def device_normalize(x: jnp.ndarray, out_dtype) -> jnp.ndarray:
    """uint8 video -> normalized float, on device, in the same op order as
    the host path (transforms.remap_and_normalize) so f32 results are
    bitwise equal. Shipping uint8 over the host->device link moves 4x
    fewer bytes than pre-normalized f32 — the input-bound serving regime's
    cheapest win. Accepts packed layouts too (channels = 3, 12 or 48 with
    (di, dj, c) channel order: the stats tile across the minor c)."""
    reps = x.shape[-1] // 3
    mean = jnp.tile(jnp.asarray(IMAGENET_MEAN, jnp.float32), reps)
    std = jnp.tile(jnp.asarray(IMAGENET_STD, jnp.float32), reps)
    return ((x.astype(jnp.float32) / 255.0 - mean) / std).astype(out_dtype)

STAGE_BLOCKS = {
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
}


def fused_resnet_allowed() -> bool:
    """Whether the fused Pallas bottleneck kernels may run (opt-in:
    FUTURE_OD_FUSED_RESNET=1, TPU backends only).

    Opt-in because measured EMBEDDED, not standalone: the im2col fused
    bottleneck beats XLA per-block in isolation (6.6 vs 7.9 ms inner block,
    b12 224x400 bf16) but LOSES inside the full jitted model (full-bench
    110.5 -> 100.5 clips/s with layer1 fused, -> 106.8 with layer2 fused) —
    XLA fuses across consecutive bottlenecks in context and the opaque custom
    calls break those chains without saving additional HBM round-trips. The
    whole-layer chained kernel that would actually cut traffic SIGKILLs this
    toolchain's remote Mosaic compiler. Full story: BENCHMARKS.md round 2.
    """
    import os

    if os.environ.get("FUTURE_OD_FUSED_RESNET", "0") != "1":
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


class FrozenBatchNorm(nn.Module):
    """BatchNorm with constant statistics and affine (never updated).

    y = (x - mean) * weight / sqrt(var + eps) + bias, all four stored in the
    "frozen" collection. Random init: identity transform.
    """

    features: int
    eps: float = 1e-5

    def setup(self):
        shape = (self.features,)
        self._weight = self.variable("frozen", "weight", jnp.ones, shape)
        self._bias = self.variable("frozen", "bias", jnp.zeros, shape)
        self._mean = self.variable("frozen", "running_mean", jnp.zeros, shape)
        self._var = self.variable("frozen", "running_var", jnp.ones, shape)

    def scale_shift(self):
        """The affine (scale, shift) the BN applies — used to fold it into
        the preceding conv for the fused kernels."""
        scale = self._weight.value * jax.lax.rsqrt(self._var.value + self.eps)
        return scale, self._bias.value - self._mean.value * scale

    def __call__(self, x):
        scale, shift = self.scale_shift()
        return x * scale + shift


class ConvKernel(nn.Module):
    """Bare HWIO conv kernel parameter, named like nn.Conv's ({name}/kernel)
    so checkpoints/ports stay compatible while the forward is free to run the
    conv through XLA or a fused Pallas kernel."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", conv_init, self.shape)


def _conv(x, kernel, strides=(1, 1), padding=((0, 0), (0, 0)), dilation=(1, 1)):
    dtype = jnp.promote_types(x.dtype, kernel.dtype)
    return jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), strides, list(padding),
        rhs_dilation=dilation, dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class Bottleneck(nn.Module):
    """torchvision-v1 bottleneck: 1x1 -> 3x3(stride, dilation) -> 1x1 (x4)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    fuse: bool = False  # eligible for the fused Pallas path (layer1)
    int8: bool = False  # int8 PTQ inference path (ops/quant.py)
    int8_static: bool = False  # calibrated ranges ("quant" collection)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        p = self.planes
        cin = x.shape[-1]
        k1 = ConvKernel((1, 1, cin, p), name="conv1")()
        bn1 = FrozenBatchNorm(p, name="bn1")
        k2 = ConvKernel((3, 3, p, p), name="conv2")()
        bn2 = FrozenBatchNorm(p, name="bn2")
        k3 = ConvKernel((1, 1, p, 4 * p), name="conv3")()
        bn3 = FrozenBatchNorm(4 * p, name="bn3")
        kd = bnd = None
        if self.downsample:
            kd = ConvKernel((1, 1, cin, 4 * p), name="downsample_conv")()
            bnd = FrozenBatchNorm(4 * p, name="downsample_bn")

        use_fused = (
            self.fuse
            and deterministic
            and self.stride == 1
            and self.dilation == 1
            and x.shape[1] % 8 == 0
            and fused_resnet_allowed()
        )
        if use_fused:
            # One Pallas program per row tile: the whole block stays in VMEM
            # (no gradient defined — inference only; layer1 is frozen in
            # training anyway, paper.py:102-109).
            from future_od_tpu.ops.fused_resnet import fused_bottleneck

            s1, t1 = bn1.scale_shift()
            s2, t2 = bn2.scale_shift()
            s3, t3 = bn3.scale_shift()
            args = dict(
                w1=k1[0, 0] * s1, b1=t1,
                w2=k2 * s2, b2=t2,
                w3=k3[0, 0] * s3, b3=t3,
            )
            if self.downsample:
                sd, td = bnd.scale_shift()
                args.update(wd=kd[0, 0] * sd, bd=td)
            return fused_bottleneck(x, **args)

        # int8_static: calibrated ranges live in the "quant" collection (the
        # BatchNorm running-stats idiom). A mutable-"quant" apply is a
        # CALIBRATION pass: it runs the DYNAMIC int8 path while the
        # per-channel input ranges accumulate (running max), so the stored
        # ranges are those of the quantized network itself — error
        # propagation included. A normal apply then quantizes with the
        # stored ranges: zero per-call activation reductions (ops/quant.py
        # statics), and on the calibration batch the static output is
        # bitwise-equal to the dynamic path (tests/test_quant.py).
        calibrating = self.int8_static and self.is_mutable_collection("quant")
        if self.int8_static:
            qvars = {
                name: self.variable(
                    "quant", f"{name}_amax",
                    lambda c=cin_: jnp.zeros((c,), jnp.float32),
                )
                for name, cin_ in (
                    ("conv1", cin), ("conv2", p), ("conv3", p),
                ) + ((("downsample_conv", cin),) if self.downsample else ())
            }

        if self.int8 and deterministic:
            # Inference-only int8 path: frozen-BN folded into the quantized
            # per-channel kernels, int32 MXU accumulation (ops/quant.py).
            # Every conv input here is post-ReLU (non-negative), so the
            # zero-point-128 variant recovers the full 8-bit range.
            from future_od_tpu.ops.quant import (
                int8_conv_nonneg,
                int8_conv_nonneg_static,
                observe_channel_amax,
            )

            if self.int8_static and not calibrating:
                conv = lambda x_, k_, b_, name, **kw: int8_conv_nonneg_static(
                    x_, k_, qvars[name].value, b_, **kw
                )
            else:
                def conv(x_, k_, b_, name, **kw):
                    if calibrating:
                        qvars[name].value = jnp.maximum(
                            qvars[name].value,
                            observe_channel_amax(x_, nonneg=True),
                        )
                    return int8_conv_nonneg(x_, k_, b_, **kw)
            s1, t1 = bn1.scale_shift()
            s2, t2 = bn2.scale_shift()
            s3, t3 = bn3.scale_shift()
            out = jax.nn.relu(conv(x, k1 * s1, t1, "conv1"))
            out = jax.nn.relu(conv(
                out, k2 * s2, t2, "conv2",
                strides=(self.stride, self.stride),
                padding=[(self.dilation, self.dilation)] * 2,
                dilation=(self.dilation, self.dilation),
            ))
            out = conv(out, k3 * s3, t3, "conv3")
            if self.downsample:
                sd, td = bnd.scale_shift()
                identity = conv(
                    x, kd * sd, td, "downsample_conv",
                    strides=(self.stride, self.stride),
                )
            else:
                identity = x
            return jax.nn.relu(out + identity)

        identity = x
        out = jax.nn.relu(bn1(_conv(x, k1)))
        out = _conv(
            out, k2,
            strides=(self.stride, self.stride),
            padding=[(self.dilation, self.dilation)] * 2,
            dilation=(self.dilation, self.dilation),
        )
        out = jax.nn.relu(bn2(out))
        out = bn3(_conv(out, k3))
        if self.downsample:
            identity = bnd(
                _conv(x, kd, strides=(self.stride, self.stride))
            )
        return jax.nn.relu(out + identity)


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel order (di, dj, c)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


def stem_weights_to_space_to_depth(w7: jnp.ndarray) -> jnp.ndarray:
    """Transform the (7, 7, 3, 64) HWIO stem kernel into the exactly
    equivalent (4, 4, 12, 64) kernel applied to space-to-depth input.

    Derivation: output(i,j) of conv7x7 stride 2 pad 3 reads unpacked rows
    2i-3..2i+3. Packed conv stride 1 with kernel 4 and pad (2,1) reads packed
    rows i-2..i+1 = unpacked rows 2i-4..2i+3 (a superset). With packed-kernel
    index kp and intra-pixel offset di, the unpacked kernel index is
    ki = 2·kp + di - 1 (out of [0,7) -> zero weight).
    """
    kh, kw, c_in, c_out = w7.shape
    assert (kh, kw) == (7, 7)
    w4 = jnp.zeros((4, 4, 2, 2, c_in, c_out), w7.dtype)
    for kp in range(4):
        for lp in range(4):
            for di in range(2):
                for dj in range(2):
                    ki = 2 * kp + di - 1
                    kj = 2 * lp + dj - 1
                    if 0 <= ki < 7 and 0 <= kj < 7:
                        w4 = w4.at[kp, lp, di, dj].set(w7[ki, kj])
    return w4.reshape(4, 4, 4 * c_in, c_out)


def space_to_depth4(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/4, W/4, 16C), channel order (di, dj, c)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 4, 4, W // 4, 4, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 4, W // 4, 16 * C)


def stem_weights_to_s2d4(w7: jnp.ndarray) -> jnp.ndarray:
    """Transform the (7, 7, 3, 64) HWIO stem kernel into the exactly
    equivalent (3, 3, 48, 256) kernel applied to 4x-space-to-depth input.

    One packed block holds a 4x4 pixel tile, i.e. a 2x2 group of stride-2
    conv outputs — so the packed conv emits all four as output channels
    (a, b, c): conv7x7 output pixel (2p+a, 2q+b, c) lands in packed cell
    (p, q). Derivation: output row i=2p+a reads unpacked rows 2i+ki-3; the
    packed conv (kernel 3, pad 1) reads rows 4(p+kp-1)+di, so
    ki = 4*kp + di - 2a - 1 (outside [0,7) -> zero weight; the
    decomposition (kp, di) of each ki is unique, so coverage is exact).
    The payoff vs the 2x s2d stem: contraction depth 48 and 4x fewer
    spatial positions keep the MXU busy, and the 2x2 output group never
    needs a depth-to-space transpose because `s2d4_stem_pool` consumes it
    in packed form.
    """
    kh, kw, c_in, c_out = w7.shape
    assert (kh, kw) == (7, 7)
    w3 = jnp.zeros((3, 3, 4, 4, c_in, 2, 2, c_out), w7.dtype)
    for kp in range(3):
        for lp in range(3):
            for di in range(4):
                for dj in range(4):
                    for a in range(2):
                        for b in range(2):
                            ki = 4 * kp + di - 2 * a - 1
                            kj = 4 * lp + dj - 2 * b - 1
                            if 0 <= ki < 7 and 0 <= kj < 7:
                                w3 = w3.at[kp, lp, di, dj, :, a, b].set(
                                    w7[ki, kj]
                                )
    return w3.reshape(3, 3, 16 * c_in, 4 * c_out)


def s2d4_stem_pool(y: jnp.ndarray) -> jnp.ndarray:
    """maxpool 3x3/2 pad 1 computed directly on the s2d(4) stem conv output
    (B, P, Q, (a, b, C)) — no depth-to-space transpose ever materializes.

    Pool output (p, q) covers conv rows 2p-1..2p+1 = packed (p-1, a=1),
    (p, a=0), (p, a=1) (cols likewise), so the 3x3 window factorizes into a
    column max over the b slices followed by a row max over the a slices.
    Inputs are post-ReLU (>= 0) and every window contains a real pixel, so
    zero-padding the shifted slices is exactly the reference -inf padding.
    """
    C = y.shape[-1] // 4
    y00, y01, y10, y11 = (y[..., i * C : (i + 1) * C] for i in range(4))

    def shift_w(t):
        return jnp.pad(t, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :-1]

    def shift_h(t):
        return jnp.pad(t, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :-1]

    col0 = jnp.maximum(jnp.maximum(shift_w(y01), y00), y01)
    col1 = jnp.maximum(jnp.maximum(shift_w(y11), y10), y11)
    return jnp.maximum(jnp.maximum(shift_h(col1), col0), col1)


class ResNet(nn.Module):
    """ResNet backbone trunk returning the layer4 feature map (stride 32, or
    16 with dilation), NHWC.

    space_to_depth: rewrite the 3-channel 7x7/2 stem as an exactly equivalent
    4x4/1 conv over 2x2 space-to-depth input (the standard TPU ResNet stem
    optimization — a 3-channel conv wastes the MXU; measured ~2x faster stem
    at 896x1600). Weight-compatible with the naive stem through
    `stem_weights_to_space_to_depth`.
    """

    name_id: str = "resnet50"
    dilation: bool = False  # replace layer4 stride with dilation (paper.py:95)
    use_space_to_depth: bool = False
    int8: bool = False  # int8 PTQ inference path for every trunk conv
    int8_static: bool = False  # calibrated act ranges ("quant" collection)
    # stop_grad_frozen: sever the backward graph at the stem+layer1 freeze
    # boundary (paper.py:102-109 sets requires_grad=False there, which
    # prunes torch's autograd the same way). Under the optimizer's frozen
    # mask this is EXACT — those grads were computed then zeroed, and XLA
    # cannot fold g*0 -> 0 (NaN semantics), so the whole stem+layer1
    # backward was real work. Must be False when training from scratch
    # (freeze_backbone_stem=False runs).
    stop_grad_frozen: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        blocks = STAGE_BLOCKS[self.name_id]
        # fused stem needs pool rows (H/4) divisible by its 8-row tile.
        # Opt-in (FUTURE_OD_FUSED_STEM=1): this environment's Mosaic rejects
        # the kernel's narrow-lane (12-channel) shape casts; the kernel is
        # interpret-verified and kept for toolchains that can lower it.
        import os

        fuse_stem = (
            deterministic
            and os.environ.get("FUTURE_OD_FUSED_STEM", "0") == "1"
            and x.shape[1] % 32 == 0
            and x.shape[2] % 4 == 0
            and fused_resnet_allowed()
        )
        if self.use_space_to_depth:
            k1 = ConvKernel((4, 4, 12, 64), name="conv1")()
            if x.shape[-1] != 12:
                # host-packed inputs (12 channels) skip the on-device
                # transpose — the cost that sank the embedded s2d stem in
                # round 2 (BENCHMARKS.md: +64 ms at b12 896x1600)
                x = space_to_depth(x)
            w4 = k1
        else:
            k1 = ConvKernel((7, 7, 3, 64), name="conv1")()
            w4 = None
        bn1 = FrozenBatchNorm(64, name="bn1")
        if x.dtype == jnp.uint8:
            # uint8 arrived over the wire: normalize on device in the
            # params' compute dtype (see device_normalize)
            x = device_normalize(x, k1.dtype)
        # s2d-math stem: even without s2d-format weights, compute the stem as
        # conv4x4/1 over space-to-depth input (exact reformulation; weights
        # stay (7,7,3,64)). Opt-in (FUTURE_OD_S2D_STEM=1): wins standalone
        # (17.5 vs 23.9 ms at b24 896x1600 bf16, tools/bench_stem.py) but the
        # input transpose costs +64 ms EMBEDDED in the full jitted model
        # (full-bench 110.5 -> 69.6 clips/s) on this toolchain.
        s2d_math = (
            w4 is None
            and os.environ.get("FUTURE_OD_S2D_STEM", "0") == "1"
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        )
        # FUTURE_OD_INT8_SKIP: comma list of "stem" / stage indices
        # ("1".."4") kept in float under int8 PTQ — the standard
        # skip-first-layer mitigation plus per-stage diagnosis surface
        int8_skip = set(
            t for t in os.environ.get("FUTURE_OD_INT8_SKIP", "").split(",")
            if t
        )
        if fuse_stem:
            # conv + BN + ReLU + maxpool in one Pallas kernel over s2d input
            # (the 3-channel 7x7 conv is the most MXU-hostile op here).
            from future_od_tpu.ops.fused_resnet import fused_stem

            if w4 is None:
                x = space_to_depth(x)
                w4 = stem_weights_to_space_to_depth(k1)
            s, t = bn1.scale_shift()
            x = fused_stem(x, w4 * s, t)
        else:
            # static-int8 stem range: signed input (normalized pixels), so
            # the calibration records |x| per channel (see Bottleneck for
            # the calibration/"quant"-collection mechanics: a mutable-
            # "quant" apply runs the DYNAMIC int8 stem while observing)
            calibrating = (
                self.int8_static and self.is_mutable_collection("quant")
            )
            if self.int8_static:
                from future_od_tpu.ops.quant import observe_channel_amax

                stem_q = self.variable(
                    "quant", "conv1_amax",
                    lambda c=k1.shape[2]: jnp.zeros((c,), jnp.float32),
                )
            int8_stem = (
                self.int8 and deterministic and "stem" not in int8_skip
                and not s2d_math
            )
            if int8_stem:
                from future_od_tpu.ops.quant import int8_conv, int8_conv_static

                s, t = bn1.scale_shift()
                if self.int8_static and not calibrating:
                    int8_conv = (
                        lambda x_, k_, b_, **kw: int8_conv_static(
                            x_, k_, stem_q.value, b_, **kw
                        )
                    )
                elif calibrating:
                    stem_q.value = jnp.maximum(
                        stem_q.value, observe_channel_amax(x, nonneg=False)
                    )
            if self.use_space_to_depth:
                if int8_stem:
                    x = int8_conv(x, k1 * s, t, padding=[(2, 1), (2, 1)])
                else:
                    x = _conv(x, k1, padding=[(2, 1), (2, 1)])
            elif s2d_math:
                x = _conv(
                    space_to_depth(x),
                    stem_weights_to_space_to_depth(k1),
                    padding=[(2, 1), (2, 1)],
                )
            elif int8_stem:
                x = int8_conv(
                    x, k1 * s, t, strides=(2, 2), padding=[(3, 3), (3, 3)]
                )
            else:
                x = _conv(x, k1, strides=(2, 2), padding=[(3, 3), (3, 3)])
            if not int8_stem:
                x = jax.nn.relu(bn1(x))
            else:
                x = jax.nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        planes = 64
        for stage_idx, num_blocks in enumerate(blocks):
            stride = 1 if stage_idx == 0 else 2
            dilation = 1
            if stage_idx == 3 and self.dilation:
                stride, dilation = 1, 2
            for block_idx in range(num_blocks):
                # torchvision semantics: when a stage is dilated, its first
                # block still runs at the PREVIOUS dilation (1) — only
                # subsequent blocks use the increased rate (torchvision
                # resnet._make_layer's previous_dilation argument).
                x = Bottleneck(
                    planes=planes,
                    stride=stride if block_idx == 0 else 1,
                    dilation=1 if block_idx == 0 else dilation,
                    downsample=(block_idx == 0),
                    # fused Pallas path wins on layer1/layer2 shapes and
                    # loses on layer3+ (tools/bench_fused_bottleneck.py);
                    # FUTURE_OD_FUSE_STAGES overrides (e.g. "0" = layer1 only)
                    fuse=(
                        str(stage_idx)
                        in os.environ.get("FUTURE_OD_FUSE_STAGES", "01")
                    ),
                    int8=self.int8 and str(stage_idx + 1) not in int8_skip,
                    int8_static=self.int8_static
                    and str(stage_idx + 1) not in int8_skip,
                    name=f"layer{stage_idx + 1}_block{block_idx}",
                )(x, deterministic=deterministic)
            # FUTURE_OD_SEVER_STAGE (default 0 = the stem+layer1 freeze
            # boundary) is a measurement-only knob: moving the sever deeper
            # kills real gradients, but the resulting step-time *marginals*
            # attribute the backward cost per stage
            # (tools/bench_train_split.py BENCH_SEVER_SWEEP=1).
            if self.stop_grad_frozen and stage_idx == int(
                os.environ.get("FUTURE_OD_SEVER_STAGE", "0")
            ):
                x = jax.lax.stop_gradient(x)
            planes *= 2
        return x


class CDetrBackbone(nn.Module):
    """ResNet trunk + 1x1 projection to hidden_dim (paper.py:110-116).

    Input (B, H, W, 3) normalized images -> (B, H/32, W/32, hidden_dim).
    """

    hidden_dim: int = 256
    name_id: str = "resnet50"
    dilation: bool = False
    use_space_to_depth: bool = False
    int8: bool = False
    int8_static: bool = False
    stop_grad_frozen: bool = False  # see ResNet.stop_grad_frozen

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        features = ResNet(
            self.name_id, self.dilation, self.use_space_to_depth, self.int8,
            int8_static=self.int8_static,
            stop_grad_frozen=self.stop_grad_frozen, name="body"
        )(x, deterministic=deterministic)
        return nn.Conv(
            self.hidden_dim, (1, 1), kernel_init=conv_init, name="input_proj"
        )(features)
