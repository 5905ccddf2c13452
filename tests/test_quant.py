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
    int8_conv_nonneg,
    quantize_act_per_tensor,
    quantize_weight_per_channel,
    smooth_factors,
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
        assert int8_conv_nonneg(jnp.abs(x), w).dtype == jnp.bfloat16

    def test_nonneg_conv_close_to_float(self, rng):
        # post-ReLU inputs: the zero-point-128 variant must match the float
        # conv at least as well as the symmetric one (full 8-bit range)
        x = jnp.asarray(
            np.abs(rng.normal(size=(2, 16, 16, 8))).astype(np.float32)
        )
        w = jnp.asarray(
            (rng.normal(size=(3, 3, 8, 16)) * 0.1).astype(np.float32)
        )
        b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        got = int8_conv_nonneg(x, w, b, padding=[(1, 1), (1, 1)])
        rel_nn = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        rel_sym = float(
            jnp.linalg.norm(int8_conv(x, w, b, padding=[(1, 1), (1, 1)]) - ref)
            / jnp.linalg.norm(ref)
        )
        assert rel_nn < 0.02, rel_nn
        assert rel_nn <= rel_sym + 1e-4, (rel_nn, rel_sym)

    def test_nonneg_conv_stride_dilation_match_float(self, rng):
        # zero-point padding + per-channel correction must stay exact under
        # stride/dilation geometry (borders are where a bug would show)
        x = jnp.asarray(
            np.abs(rng.normal(size=(1, 16, 20, 4))).astype(np.float32)
        )
        w = jnp.asarray(rng.normal(size=(3, 3, 4, 8)).astype(np.float32) * 0.1)
        ref = jax.lax.conv_general_dilated(
            x, w, (2, 2), [(2, 2), (2, 2)], rhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        got = int8_conv_nonneg(
            x, w, strides=(2, 2), padding=[(2, 2), (2, 2)], dilation=(2, 2)
        )
        assert got.shape == ref.shape
        rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        assert rel < 0.02, rel

    def test_smoothing_improves_outlier_channels(self, rng, monkeypatch):
        # one hot input channel (100x the rest) — the scale-migration path
        # must beat a unit-smoothed quantization by a clear margin
        from future_od_tpu.ops import quant

        ch_scale = np.ones(8, np.float32)
        ch_scale[3] = 100.0
        x = jnp.asarray(
            np.abs(rng.normal(size=(2, 16, 16, 8))).astype(np.float32)
            * ch_scale
        )
        w = jnp.asarray(
            (rng.normal(size=(3, 3, 8, 16)) * 0.1).astype(np.float32)
        )
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        got = int8_conv_nonneg(x, w, padding=[(1, 1), (1, 1)])
        rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        monkeypatch.setattr(
            quant, "smooth_factors",
            lambda x_, k_: jnp.ones((x_.shape[-1],), jnp.float32),
        )
        got_unsmoothed = quant.int8_conv_nonneg(x, w, padding=[(1, 1), (1, 1)])
        rel_no = float(
            jnp.linalg.norm(got_unsmoothed - ref) / jnp.linalg.norm(ref)
        )
        assert rel < rel_no, (rel, rel_no)

    def test_smooth_factors_zero_channel_safe(self, rng):
        x = jnp.asarray(np.zeros((1, 4, 4, 4), np.float32))
        w = jnp.asarray(rng.normal(size=(1, 1, 4, 4)).astype(np.float32))
        m = smooth_factors(x, w)
        assert np.isfinite(np.asarray(m)).all()
        np.testing.assert_array_equal(np.asarray(m), np.ones(4, np.float32))


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


class TestInt8Static:
    """Static-calibration variant: ranges from a calibration pass (the
    "quant" collection) replace every per-call activation reduction."""

    def _toy_input(self, rng, shape=(1, 64, 96, 3)):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32))

    def _models(self):
        m_d = CDetrBackbone(hidden_dim=32, int8=True)
        m_s = CDetrBackbone(hidden_dim=32, int8=True, int8_static=True)
        return m_d, m_s

    def test_static_equals_dynamic_on_calibration_batch(self, rng):
        """Calibrated on X, evaluated on X: the static path sees exactly the
        ranges the dynamic path computes on the fly -> bitwise-equal output."""
        x = self._toy_input(rng)
        m_d, m_s = self._models()
        vs = m_s.init(jax.random.key(0), x)  # init IS a calibration pass on x
        assert "quant" in vs
        out_d = m_d.apply(
            {"params": vs["params"], "frozen": vs["frozen"]}, x,
            deterministic=True,
        )
        out_s = m_s.apply(vs, x, deterministic=True)
        np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_s))

    def test_calibration_is_running_max(self, rng):
        """mutable=["quant"] applies run the DYNAMIC int8 path (so the
        stored ranges include quantization-error propagation) and accumulate
        the per-channel max across batches."""
        x1 = self._toy_input(rng, (1, 32, 32, 3))
        x2 = 3.0 * self._toy_input(rng, (1, 32, 32, 3))
        m_d, m_s = self._models()
        vs = m_s.init(jax.random.key(0), x1)
        out, mut = m_s.apply(vs, x2, deterministic=True, mutable=["quant"])
        # calibration pass output == dynamic int8 path output
        out_d = m_d.apply(
            {"params": vs["params"], "frozen": vs["frozen"]}, x2,
            deterministic=True,
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out_d))
        stem_before = np.asarray(vs["quant"]["body"]["conv1_amax"])
        stem_after = np.asarray(mut["quant"]["body"]["conv1_amax"])
        assert (stem_after >= stem_before).all() and (stem_after > stem_before).any()

    def test_static_close_to_float_off_calibration(self, rng):
        """Evaluated on a batch it was NOT calibrated on (ranges still cover
        it): accuracy comparable to the dynamic arm."""
        x_cal = 1.5 * self._toy_input(rng)  # wider calibration range
        x = self._toy_input(rng)
        m_f = CDetrBackbone(hidden_dim=32)
        _, m_s = self._models()
        vs = m_s.init(jax.random.key(0), x_cal)
        out_f = m_f.apply(
            {"params": vs["params"], "frozen": vs["frozen"]}, x,
            deterministic=True,
        )
        out_s = m_s.apply(vs, x, deterministic=True)
        rel = float(jnp.linalg.norm(out_s - out_f) / jnp.linalg.norm(out_f))
        assert rel < 0.15, rel

    def test_uncalibrated_ranges_degrade_not_saturate(self, rng):
        """An all-zero stored range (no calibration pass ever ran) must fall
        back to scale=1 quantization — NOT a ~4e-15 scale that saturates
        every activation to the clip boundary."""
        from future_od_tpu.ops.quant import (
            int8_conv_nonneg,
            int8_conv_nonneg_static,
        )

        x = jnp.abs(jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32)))
        k = jnp.asarray(rng.normal(size=(3, 3, 4, 8)).astype(np.float32))
        out = int8_conv_nonneg_static(x, k, jnp.zeros((4,), jnp.float32))
        ref = int8_conv_nonneg(x, k)
        assert np.isfinite(np.asarray(out)).all()
        # scale=1 round-to-integer: degraded but the right magnitude, not
        # the constant garbage a saturated clip would produce
        rel = float(
            jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref)
        )
        assert rel < 1.0, rel

    def test_assert_calibrated(self, rng):
        from future_od_tpu.ops.quant import assert_calibrated

        x = self._toy_input(rng, (1, 32, 32, 3))
        _, m_s = self._models()
        vs = m_s.init(jax.random.key(0), x)
        assert_calibrated(vs["quant"])  # calibrated by init: no raise
        import jax as _jax

        dead = _jax.tree.map(lambda a: jnp.zeros_like(a), vs["quant"])
        with pytest.raises(ValueError, match="uncalibrated"):
            assert_calibrated(dead)

    def test_static_jits(self, rng):
        x = self._toy_input(rng, (1, 32, 32, 3))
        _, m_s = self._models()
        vs = m_s.init(jax.random.key(0), x)
        out = jax.jit(
            lambda v, x: m_s.apply(v, x, deterministic=True)
        )(vs, x)
        assert np.isfinite(np.asarray(out)).all()
