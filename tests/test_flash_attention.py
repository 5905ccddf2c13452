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
