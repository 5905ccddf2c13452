"""Fused (flash) attention Pallas kernel for TPU.

The encoder's self-attention over h·w ≈ 1400 tokens and the decoder's
conditional cross-attention materialize (B, H, Nq, Nk) logits in HBM on the
XLA path — ~0.75 GB per encoder layer at the eval config. This kernel streams
K/V blocks through VMEM with an online softmax, so logits never touch HBM.

Used on the inference path (deterministic, no attention-weight capture); the
training path keeps the XLA formulation (attention-weight dropout + autodiff).
The conditional cross-attention's concat-head trick folds into this kernel
naturally: q = concat(q_content, q_sine) per head is just head_dim 2·d.

Correctness is tested against the einsum reference on TPU and in interpret
mode (tests/test_flash_attention.py).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 512
NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, out_ref, *, scale, kv_len, block_k):
    """One (batch·head, q-block) program: online-softmax over k blocks.

    q_ref: (1, block_q, d); k_ref: (1, Nk_padded, d); v_ref: (1, Nk_padded, dv);
    out_ref: (1, block_q, dv).
    """
    block_q = q_ref.shape[1]
    d_v = v_ref.shape[-1]
    nk_padded = k_ref.shape[1]
    num_kb = nk_padded // block_k

    q = q_ref[0].astype(jnp.float32) * scale

    def body(kb, carry):
        acc, row_max, row_sum = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, block_k)
        # Mask padded keys.
        col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < kv_len, logits, NEG_INF)

        new_max = jnp.maximum(row_max, logits.max(axis=1, keepdims=True))
        correction = jnp.exp(row_max - new_max)
        p = jnp.exp(logits - new_max)
        new_sum = row_sum * correction + p.sum(axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        new_acc = acc * correction + pv
        return new_acc, new_max, new_sum

    acc = jnp.zeros((block_q, d_v), jnp.float32)
    row_max = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    row_sum = jnp.zeros((block_q, 1), jnp.float32)
    acc, row_max, row_sum = jax.lax.fori_loop(0, num_kb, body, (acc, row_max, row_sum))
    out_ref[0] = (acc / row_sum).astype(out_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret")
)
def flash_attention(
    q: jnp.ndarray,  # (B, H, Nq, d)
    k: jnp.ndarray,  # (B, H, Nk, d)
    v: jnp.ndarray,  # (B, H, Nk, dv)
    scale: float,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q·kᵀ·scale)·v without materializing logits. Returns
    (B, H, Nq, dv) in q's dtype."""
    B, H, Nq, d = q.shape
    Nk = k.shape[2]
    dv = v.shape[3]

    block_q = min(block_q, max(8, Nq))
    block_k = min(block_k, max(128, Nk))
    nq_pad = -(-Nq // block_q) * block_q
    nk_pad = -(-Nk // block_k) * block_k

    qf = _pad_to(q.reshape(B * H, Nq, d), nq_pad, 1)
    kf = _pad_to(k.reshape(B * H, Nk, d), nk_pad, 1)
    vf = _pad_to(v.reshape(B * H, Nk, dv), nk_pad, 1)

    grid = (B * H, nq_pad // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, kv_len=Nk, block_k=block_k
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_pad, dv), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, dv), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, nq_pad, dv), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :Nq].reshape(B, H, Nq, dv)


def reference_attention(q, k, v, scale):
    """Einsum reference used by tests and the training path."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    weights = jax.nn.softmax(logits * scale, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v.astype(jnp.float32)).astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_k"))
def chunked_attention(
    q: jnp.ndarray,  # (B, H, Nq, d)
    k: jnp.ndarray,  # (B, H, Nk, d)
    v: jnp.ndarray,  # (B, H, Nk, dv)
    scale: float,
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    """Memory-efficient attention in pure XLA: lax.scan over key blocks with a
    running (max, sum, acc) online softmax, so only (B, H, Nq, block_k) logits
    are ever live — the HBM win of the flash kernel without Pallas.

    (The Pallas `flash_attention` kernel above is preferred where gridded
    Mosaic compilation is available; this environment's remote-compile relay
    stalls on gridded kernels, so the XLA formulation is the default.)
    """
    B, H, Nq, d = q.shape
    Nk = k.shape[2]
    dv = v.shape[3]
    nk_pad = -(-Nk // block_k) * block_k
    kp = _pad_to(k, nk_pad, 2)
    vp = _pad_to(v, nk_pad, 2)
    num_blocks = nk_pad // block_k

    qf = q.astype(jnp.float32) * scale
    kb = kp.reshape(B, H, num_blocks, block_k, d).transpose(2, 0, 1, 3, 4)
    vb = vp.reshape(B, H, num_blocks, block_k, dv).transpose(2, 0, 1, 3, 4)
    valid = (
        jnp.arange(nk_pad).reshape(num_blocks, block_k) < Nk
    )  # (num_blocks, block_k)

    def body(carry, inputs):
        acc, row_max, row_sum = carry
        k_blk, v_blk, valid_blk = inputs
        logits = jnp.einsum("bhqd,bhkd->bhqk", qf, k_blk.astype(jnp.float32))
        logits = jnp.where(valid_blk[None, None, None, :], logits, NEG_INF)
        new_max = jnp.maximum(row_max, logits.max(axis=-1, keepdims=True))
        corr = jnp.exp(row_max - new_max)
        p = jnp.exp(logits - new_max)
        new_sum = row_sum * corr + p.sum(axis=-1, keepdims=True)
        new_acc = acc * corr + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_blk.astype(jnp.float32)
        )
        return (new_acc, new_max, new_sum), None

    init = (
        jnp.zeros((B, H, Nq, dv), jnp.float32),
        jnp.full((B, H, Nq, 1), NEG_INF, jnp.float32),
        jnp.zeros((B, H, Nq, 1), jnp.float32),
    )
    (acc, _, row_sum), _ = jax.lax.scan(body, init, (kb, vb, valid))
    return (acc / row_sum).astype(q.dtype)
