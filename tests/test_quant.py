"""Int8 PTQ path (ops/quant.py + the backbone int8 arm).

TPU-native inference extra with no reference counterpart (the reference
serves fp32 eager torch); accuracy is bounded here against the float path.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from future_od_tpu.models.resnet import CDetrBackbone
from future_od_tpu.ops.quant import (
    int8_conv,
    quantize_act_per_tensor,
    quantize_weight_per_channel,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


class TestQuantPrimitives:
    def test_weight_roundtrip_error_bounded(self, rng):
        w = jnp.asarray(rng.normal(size=(3, 3, 8, 16)).astype(np.float32))
        q, scale = quantize_weight_per_channel(w)
        assert q.dtype == jnp.int8
        assert scale.shape == (16,)
        # symmetric quantization: |w - q*s| <= s/2 elementwise
        err = np.abs(np.asarray(w) - np.asarray(q, np.float32) * np.asarray(scale))
        assert (err <= np.asarray(scale) / 2 + 1e-7).all()

    def test_weight_full_range_used(self, rng):
        w = jnp.asarray(rng.normal(size=(1, 1, 4, 4)).astype(np.float32))
        q, _ = quantize_weight_per_channel(w)
        # per-channel scale => each channel's abs-max hits exactly 127
        assert (np.abs(np.asarray(q, np.int32)).max(axis=(0, 1, 2)) == 127).all()

    def test_act_roundtrip_error_bounded(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
        q, scale = quantize_act_per_tensor(x)
        err = np.abs(np.asarray(x) - np.asarray(q, np.float32) * float(scale))
        assert (err <= float(scale) / 2 + 1e-7).all()

    def test_int8_conv_close_to_float(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32))
        w = jnp.asarray(
            (rng.normal(size=(3, 3, 8, 16)) * 0.1).astype(np.float32)
        )
        b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
        got = int8_conv(x, w, b, padding=[(1, 1), (1, 1)])
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        assert rel < 0.02, rel

    def test_int8_conv_stride_dilation_shapes(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 4)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, 4, 8)).astype(np.float32))
        out = int8_conv(
            x, w, strides=(2, 2), padding=[(1, 1), (1, 1)]
        )
        assert out.shape == (1, 8, 8, 8)
        out = int8_conv(
            x, w, padding=[(2, 2), (2, 2)], dilation=(2, 2)
        )
        assert out.shape == (1, 16, 16, 8)

    def test_int8_conv_preserves_bf16_dtype(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(1, 1, 4, 4)), jnp.bfloat16)
        assert int8_conv(x, w).dtype == jnp.bfloat16


class TestInt8Backbone:
    def _toy_input(self, rng, shape=(1, 64, 96, 3)):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32))

    def test_same_param_tree_as_float(self, rng):
        x = self._toy_input(rng)
        vf = CDetrBackbone(hidden_dim=32).init(jax.random.key(0), x)
        vq = CDetrBackbone(hidden_dim=32, int8=True).init(jax.random.key(0), x)
        assert jax.tree_util.tree_structure(vf) == jax.tree_util.tree_structure(vq)

    def test_int8_close_to_float(self, rng):
        x = self._toy_input(rng)
        m_f = CDetrBackbone(hidden_dim=32)
        m_q = CDetrBackbone(hidden_dim=32, int8=True)
        variables = m_f.init(jax.random.key(0), x)
        # random-init frozen BN is the identity transform; perturb the stats
        # so the fold-into-kernel path is actually exercised
        frozen = jax.tree_util.tree_map(
            lambda v: v + 0.05 * jnp.arange(v.size, dtype=v.dtype) / v.size,
            variables["frozen"],
        )
        variables = {**variables, "frozen": frozen}
        out_f = m_f.apply(variables, x, deterministic=True)
        out_q = m_q.apply(variables, x, deterministic=True)
        assert out_f.shape == out_q.shape
        rel = float(jnp.linalg.norm(out_q - out_f) / jnp.linalg.norm(out_f))
        # 18 stacked quantized convs: error compounds but stays small
        assert rel < 0.12, rel
        cos = float(
            jnp.vdot(out_f, out_q)
            / (jnp.linalg.norm(out_f) * jnp.linalg.norm(out_q))
        )
        assert cos > 0.99, cos

    def test_training_path_is_float(self, rng):
        # deterministic=False (training) must bypass quantization entirely
        x = self._toy_input(rng, (1, 32, 32, 3))
        m_f = CDetrBackbone(hidden_dim=32)
        m_q = CDetrBackbone(hidden_dim=32, int8=True)
        variables = m_f.init(jax.random.key(0), x)
        out_f = m_f.apply(variables, x, deterministic=False)
        out_q = m_q.apply(variables, x, deterministic=False)
        np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_q))

    def test_int8_jits(self, rng):
        x = self._toy_input(rng, (1, 32, 32, 3))
        m = CDetrBackbone(hidden_dim=32, int8=True)
        variables = m.init(jax.random.key(0), x)
        out = jax.jit(
            lambda v, x: m.apply(v, x, deterministic=True)
        )(variables, x)
        assert np.isfinite(np.asarray(out)).all()
