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

STAGE_BLOCKS = {
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
}


class FrozenBatchNorm(nn.Module):
    """BatchNorm with constant statistics and affine (never updated).

    y = (x - mean) * weight / sqrt(var + eps) + bias, all four stored in the
    "frozen" collection. Random init: identity transform.
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        shape = (self.features,)
        weight = self.variable("frozen", "weight", jnp.ones, shape).value
        bias = self.variable("frozen", "bias", jnp.zeros, shape).value
        mean = self.variable("frozen", "running_mean", jnp.zeros, shape).value
        var = self.variable("frozen", "running_var", jnp.ones, shape).value
        scale = weight * jax.lax.rsqrt(var + self.eps)
        return x * scale + (bias - mean * scale)


class Bottleneck(nn.Module):
    """torchvision-v1 bottleneck: 1x1 -> 3x3(stride, dilation) -> 1x1 (x4)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, kernel_init=conv_init, name="conv1")(x)
        out = FrozenBatchNorm(self.planes, name="bn1")(out)
        out = jax.nn.relu(out)
        out = nn.Conv(
            self.planes,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=[(self.dilation, self.dilation)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            kernel_init=conv_init,
            name="conv2",
        )(out)
        out = FrozenBatchNorm(self.planes, name="bn2")(out)
        out = jax.nn.relu(out)
        out = nn.Conv(
            self.planes * 4, (1, 1), use_bias=False, kernel_init=conv_init, name="conv3"
        )(out)
        out = FrozenBatchNorm(self.planes * 4, name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(
                self.planes * 4,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                kernel_init=conv_init,
                name="downsample_conv",
            )(x)
            identity = FrozenBatchNorm(self.planes * 4, name="downsample_bn")(identity)
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

    @nn.compact
    def __call__(self, x):
        blocks = STAGE_BLOCKS[self.name_id]
        if self.use_space_to_depth:
            x = space_to_depth(x)
            x = nn.Conv(
                64, (4, 4), strides=(1, 1), padding=[(2, 1), (2, 1)], use_bias=False,
                kernel_init=conv_init, name="conv1",
            )(x)
        else:
            x = nn.Conv(
                64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
                kernel_init=conv_init, name="conv1",
            )(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = jax.nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        planes = 64
        for stage_idx, num_blocks in enumerate(blocks):
            stride = 1 if stage_idx == 0 else 2
            dilation = 1
            if stage_idx == 3 and self.dilation:
                stride, dilation = 1, 2
            for block_idx in range(num_blocks):
                x = Bottleneck(
                    planes=planes,
                    stride=stride if block_idx == 0 else 1,
                    dilation=dilation,
                    downsample=(block_idx == 0),
                    name=f"layer{stage_idx + 1}_block{block_idx}",
                )(x)
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

    @nn.compact
    def __call__(self, x):
        features = ResNet(
            self.name_id, self.dilation, self.use_space_to_depth, name="body"
        )(x)
        return nn.Conv(
            self.hidden_dim, (1, 1), kernel_init=conv_init, name="input_proj"
        )(features)
