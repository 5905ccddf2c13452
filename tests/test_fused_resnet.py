"""Fused ResNet Pallas kernels vs XLA references (interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from future_od_tpu.ops.fused_resnet import fused_bottleneck, fused_stem


def xla_bottleneck(x, w1, b1, w2, b2, w3, b3, wd=None, bd=None):
    h = jax.nn.relu(jnp.einsum("bhwc,cd->bhwd", x, w1) + b1)
    h = jax.lax.conv_general_dilated(
        h, w2, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b2
    h = jax.nn.relu(h)
    h = jnp.einsum("bhwc,cd->bhwd", h, w3) + b3
    res = jnp.einsum("bhwc,cd->bhwd", x, wd) + bd if wd is not None else x
    return jax.nn.relu(h + res)


class TestFusedBottleneck:
    @pytest.mark.parametrize("downsample", [False, True])
    def test_matches_xla(self, rng, downsample):
        B, H, W, cin, cmid = 2, 16, 24, 64, 16
        cout = 64
        r = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.2)
        x = r(B, H, W, cin)
        w1, b1 = r(cin, cmid), r(cmid)
        w2, b2 = r(3, 3, cmid, cmid), r(cmid)
        w3, b3 = r(cmid, cout), r(cout)
        wd, bd = (r(cin, cout), r(cout)) if downsample else (None, None)
        out = fused_bottleneck(
            x, w1, b1, w2, b2, w3, b3, wd, bd, tile_h=8, interpret=True
        )
        ref = xla_bottleneck(x, w1, b1, w2, b2, w3, b3, wd, bd)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def test_identity_residual_without_downsample(self, rng):
        # zero conv weights -> output = relu(residual) = x for positive x
        B, H, W, c = 1, 8, 16, 32
        x = jnp.abs(jnp.asarray(rng.normal(size=(B, H, W, c)).astype(np.float32)))
        z = lambda *s: jnp.zeros(s, jnp.float32)
        out = fused_bottleneck(
            x, z(c, 8), z(8), z(3, 3, 8, 8), z(8), z(8, c), z(c),
            tile_h=8, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


class TestFusedStem:
    def test_matches_reference_stem(self, rng):
        from future_od_tpu.models.resnet import (
            space_to_depth,
            stem_weights_to_space_to_depth,
        )

        B, H, W = 2, 64, 96
        x = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))
        w7 = jnp.asarray(rng.normal(size=(7, 7, 3, 64)).astype(np.float32) * 0.1)
        scale = jnp.asarray(rng.uniform(0.5, 1.5, size=(64,)).astype(np.float32))
        shift = jnp.asarray(rng.normal(size=(64,)).astype(np.float32) * 0.1)

        # reference: conv7x7/2 pad 3 -> y*scale+shift -> relu -> maxpool3x3/2 pad 1
        conv = jax.lax.conv_general_dilated(
            x, w7, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        act = jax.nn.relu(conv * scale + shift)
        ref = jax.lax.reduce_window(
            act, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)],
        )

        w4 = stem_weights_to_space_to_depth(w7) * scale  # BN fold
        out = fused_stem(space_to_depth(x), w4, shift, tile_p=8, interpret=True)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def test_uneven_tiles_and_bf16(self, rng):
        from future_od_tpu.models.resnet import (
            space_to_depth,
            stem_weights_to_space_to_depth,
        )

        B, H, W = 1, 32, 64
        x = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))
        w7 = jnp.asarray(rng.normal(size=(7, 7, 3, 64)).astype(np.float32) * 0.1)
        conv = jax.lax.conv_general_dilated(
            x, w7, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        ref = jax.lax.reduce_window(
            jax.nn.relu(conv), -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)],
        )
        w4 = stem_weights_to_space_to_depth(w7)
        out = fused_stem(
            space_to_depth(x).astype(jnp.bfloat16), w4, jnp.zeros((64,)),
            tile_p=4, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref), atol=0.15, rtol=0.05
        )
