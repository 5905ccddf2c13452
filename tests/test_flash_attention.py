"""Fused-attention tests: Pallas kernel (interpret mode) and the XLA chunked
formulation vs the einsum reference."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from future_od_tpu.ops.flash_attention import (
    chunked_attention,
    flash_attention,
    reference_attention,
)


def make_qkv(rng, B, H, Nq, Nk, d, dv):
    q = jnp.asarray(rng.normal(size=(B, H, Nq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, Nk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, Nk, dv)).astype(np.float32))
    return q, k, v


class TestChunkedAttention:
    @pytest.mark.parametrize(
        "shape",
        [
            (2, 3, 100, 130, 32, 32),  # unaligned, encoder-like head dim
            (1, 2, 128, 512, 64, 32),  # decoder conditional (2d concat) shape
            (2, 1, 7, 5, 16, 16),  # tiny
        ],
    )
    def test_matches_reference(self, rng, shape):
        B, H, Nq, Nk, d, dv = shape
        q, k, v = make_qkv(rng, B, H, Nq, Nk, d, dv)
        scale = 1.0 / np.sqrt(d)
        out = chunked_attention(q, k, v, scale, block_k=64)
        ref = reference_attention(q, k, v, scale)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_single_block(self, rng):
        q, k, v = make_qkv(rng, 1, 1, 16, 16, 8, 8)
        out = chunked_attention(q, k, v, 0.5, block_k=512)
        ref = reference_attention(q, k, v, 0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestFlashKernelInterpret:
    """The Pallas kernel is validated in interpret mode (gridded Mosaic
    compiles are pathologically slow through this environment's remote-compile
    relay; on a normal TPU toolchain the same kernel compiles directly)."""

    @pytest.mark.parametrize(
        "shape",
        [
            (2, 3, 100, 130, 32, 32),
            (1, 2, 128, 300, 64, 32),
        ],
    )
    def test_matches_reference(self, rng, shape):
        B, H, Nq, Nk, d, dv = shape
        q, k, v = make_qkv(rng, B, H, Nq, Nk, d, dv)
        scale = 1.0 / np.sqrt(d)
        out = flash_attention(q, k, v, scale, block_q=64, block_k=128, interpret=True)
        ref = reference_attention(q, k, v, scale)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_padding_mask_correct(self, rng):
        # Nk far from a block multiple: padded keys must contribute nothing.
        q, k, v = make_qkv(rng, 1, 1, 8, 129, 16, 16)
        out = flash_attention(q, k, v, 0.25, block_q=8, block_k=128, interpret=True)
        ref = reference_attention(q, k, v, 0.25)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_bf16_dot_arm_matches_reference(self, rng):
        """The OPT-IN bf16 MXU-dot arm (FUTURE_OD_FLASH_BF16_DOT=1; measured
        slower standalone on this toolchain — tools/bench_softmax_floor.py —
        so the upcast-f32 dots stay the default): only q·scale and p gain a
        bf16 rounding, so outputs stay within bf16 resolution of the f32
        softmax reference and of the default arm."""
        import os

        B, H, Nq, Nk, d, dv = 2, 2, 96, 300, 32, 32
        qf, kf, vf = make_qkv(rng, B, H, Nq, Nk, d, dv)
        q, k, v = (x.astype(jnp.bfloat16) for x in (qf, kf, vf))
        scale = 1.0 / np.sqrt(d)
        ref = reference_attention(
            q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
            scale,
        )
        # default arm: upcast-f32 dots
        up = flash_attention(q, k, v, scale, block_q=32, block_k=128,
                             interpret=True)
        assert up.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(up, np.float32), np.asarray(ref), atol=1.5e-2
        )
        os.environ["FUTURE_OD_FLASH_BF16_DOT"] = "1"
        try:
            # different block_q forces a fresh trace that sees the env knob
            out = flash_attention(q, k, v, scale, block_q=48, block_k=128,
                                  interpret=True)
        finally:
            del os.environ["FUTURE_OD_FLASH_BF16_DOT"]
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref), atol=1.5e-2
        )
        # the two arms agree with each other to bf16 output resolution
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(up, np.float32), atol=1.5e-2
        )


class TestFlashAutoBlocks:
    """block_q/block_k=None — the production inference path since round 3
    (layers.attend_heads delegates block choice to the kernel's auto
    logic: whole-sequence blocks under the VMEM guard, with the
    round-to-8/128 clamps)."""

    @pytest.mark.parametrize(
        "shape",
        [
            (1, 2, 1400, 1400, 32, 32),  # encoder: full-row 1400/1408 blocks
            (1, 1, 7, 5, 16, 16),        # tiny: clamps floor at 8/128
            (1, 1, 300, 1400, 64, 32),   # decoder cross-attn proportions
        ],
    )
    def test_auto_matches_reference(self, rng, shape):
        B, H, Nq, Nk, d, dv = shape
        q, k, v = make_qkv(rng, B, H, Nq, Nk, d, dv)
        scale = 1.0 / np.sqrt(d)
        out = flash_attention(q, k, v, scale, interpret=True)
        ref = reference_attention(q, k, v, scale)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    def test_flash_block_env_sets_and_restores(self, monkeypatch):
        import os
        from future_od_tpu.ops.flash_attention import flash_block_env

        monkeypatch.delenv("FUTURE_OD_FLASH_BQ", raising=False)
        monkeypatch.delenv("FUTURE_OD_FLASH_BK", raising=False)
        with flash_block_env(block_q=512, block_k=1536):
            assert os.environ["FUTURE_OD_FLASH_BQ"] == "512"
            assert os.environ["FUTURE_OD_FLASH_BK"] == "1536"
        assert "FUTURE_OD_FLASH_BQ" not in os.environ
        assert "FUTURE_OD_FLASH_BK" not in os.environ

    def test_flash_block_env_defers_to_user_env(self, monkeypatch):
        # explicit A/B knobs must win over a caller's pinned geometry
        import os
        from future_od_tpu.ops.flash_attention import flash_block_env

        monkeypatch.setenv("FUTURE_OD_FLASH_BQ", "64")
        with flash_block_env(block_q=512):
            assert os.environ["FUTURE_OD_FLASH_BQ"] == "64"
        assert os.environ["FUTURE_OD_FLASH_BQ"] == "64"

    def test_env_knobs_honored(self, rng, monkeypatch):
        # the A/B knobs must reach the auto logic (trace-time env read)
        q, k, v = make_qkv(rng, 1, 1, 64, 256, 16, 16)
        monkeypatch.setenv("FUTURE_OD_FLASH_BQ", "32")
        monkeypatch.setenv("FUTURE_OD_FLASH_BK", "128")
        out = flash_attention(q, k, v, 0.25, interpret=True)
        ref = reference_attention(q, k, v, 0.25)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestAttendHeadsDispatch:
    """attend_heads' flash-vs-einsum gate — the production dispatch decision.

    Round 4: flash requires q >= 256 as well as k >= 1024
    (FUTURE_OD_FLASH_MIN_QUERIES): the decoder's 128-query attentions run
    ONE q-block program per (batch, head), so per-call dispatch dominates —
    einsum decoder attns measured +5.3 % full-model (BENCHMARKS.md round 4).
    """

    def _dispatches_flash(self, monkeypatch, nq, nk):
        import future_od_tpu.models.layers as layers_mod
        import future_od_tpu.ops.flash_attention as fa_mod

        monkeypatch.setattr(layers_mod, "flash_allowed", lambda: True)
        called = []

        def fake_flash(q, k, v, scale, **kw):
            called.append(q.shape)
            return jnp.zeros(q.shape[:3] + (v.shape[-1],), q.dtype)

        monkeypatch.setattr(fa_mod, "flash_attention", fake_flash)
        rng = np.random.default_rng(0)
        qh = jnp.asarray(rng.normal(size=(1, nq, 2, 16)).astype(np.float32))
        kh = jnp.asarray(rng.normal(size=(1, nk, 2, 16)).astype(np.float32))
        vh = jnp.asarray(rng.normal(size=(1, nk, 2, 16)).astype(np.float32))
        layers_mod.attend_heads(
            qh, kh, vh, 0.25, dropout_rate=0.0, deterministic=True
        )
        return bool(called)

    def test_encoder_shape_uses_flash(self, monkeypatch):
        assert self._dispatches_flash(monkeypatch, nq=1400, nk=1400)

    def test_decoder_cross_attn_uses_einsum(self, monkeypatch):
        # 128 slot queries x 1400 image keys: k passes min_keys but q fails
        # min_queries -> einsum
        assert not self._dispatches_flash(monkeypatch, nq=128, nk=1400)

    def test_min_queries_env_override(self, monkeypatch):
        monkeypatch.setenv("FUTURE_OD_FLASH_MIN_QUERIES", "64")
        assert self._dispatches_flash(monkeypatch, nq=128, nk=1400)


class TestFlashTrainInterpret:
    """Differentiable flash attention (custom-vjp Pallas fwd/bwd) in
    interpret mode: values + gradients vs the einsum reference, and the
    in-kernel dropout's determinism/statistics."""

    @pytest.mark.parametrize(
        "shape",
        [
            (2, 2, 100, 130, 32, 32),  # unaligned
            (1, 2, 128, 384, 64, 32),  # conditional-attn-like (2d concat)
        ],
    )
    def test_grads_match_reference(self, rng, shape):
        from future_od_tpu.ops.flash_attention import flash_attention_train

        B, H, Nq, Nk, d, dv = shape
        q, k, v = make_qkv(rng, B, H, Nq, Nk, d, dv)
        scale = 1.0 / np.sqrt(d)
        cot = jnp.asarray(rng.normal(size=(B, H, Nq, dv)).astype(np.float32))

        def flash_loss(q, k, v):
            out = flash_attention_train(
                q, k, v, jnp.int32(0), scale, 0.0, 64, 128, True
            )
            return jnp.sum(out * cot)

        def ref_loss(q, k, v):
            return jnp.sum(reference_attention(q, k, v, scale) * cot)

        val_f, grads_f = jax.value_and_grad(flash_loss, argnums=(0, 1, 2))(q, k, v)
        val_r, grads_r = jax.value_and_grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(float(val_f), float(val_r), rtol=1e-4)
        for gf, gr, name in zip(grads_f, grads_r, "qkv"):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gr), atol=5e-4, err_msg=f"d{name}"
            )

    def test_dropout_deterministic_and_unbiased(self, rng):
        from future_od_tpu.ops.flash_attention import flash_attention_train

        B, H, Nq, Nk, d = 1, 2, 64, 256, 32
        q, k, v = make_qkv(rng, B, H, Nq, Nk, d, d)
        scale = 1.0 / np.sqrt(d)
        args = (q, k, v, jnp.int32(7), scale, 0.5, 64, 128, True)
        out1 = flash_attention_train(*args)
        out2 = flash_attention_train(*args)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
        # different seed -> different dropout pattern
        out3 = flash_attention_train(q, k, v, jnp.int32(8), scale, 0.5, 64, 128, True)
        assert not np.allclose(np.asarray(out1), np.asarray(out3))
        # dropout expectation ~= undropped output (many keys average out)
        ref = reference_attention(q, k, v, scale)
        outs = [
            np.asarray(
                flash_attention_train(q, k, v, jnp.int32(s), scale, 0.5, 64, 128, True)
            )
            for s in range(8)
        ]
        np.testing.assert_allclose(
            np.mean(outs, axis=0), np.asarray(ref), atol=0.35
        )

    def test_dropout_grads_finite_and_seeded(self, rng):
        from future_od_tpu.ops.flash_attention import flash_attention_train

        B, H, Nq, Nk, d = 1, 1, 32, 128, 16
        q, k, v = make_qkv(rng, B, H, Nq, Nk, d, d)

        def loss(q, seed):
            out = flash_attention_train(
                q, k, v, seed, 1.0 / np.sqrt(d), 0.3, 32, 64, True
            )
            return jnp.sum(out**2)

        g1 = jax.grad(loss)(q, jnp.int32(3))
        g2 = jax.grad(loss)(q, jnp.int32(3))
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
        assert np.all(np.isfinite(np.asarray(g1)))
