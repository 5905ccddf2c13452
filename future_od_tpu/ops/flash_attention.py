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

import contextlib
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 1536
DEFAULT_BLOCK_K = 1536
NEG_INF = -1e30
LSE_LANES = 128  # lse/delta rows are lane-broadcast for legal TPU tiling


LOG2E = 1.4426950408889634


def _env_true(name: str) -> bool:
    return os.environ.get(name, "0") == "1"


@contextlib.contextmanager
def flash_block_env(block_q: int | None = None, block_k: int | None = None):
    """Trace-time override of the auto block-size caps.

    The best block geometry is PROGRAM-dependent (see flash_attention's
    docstring): whole-sequence q-blocks win the batch-eval program but
    lose the server's fused encode+ring-scatter program by 35 %. Callers
    that jit a program with a measured-different optimum wrap the call
    that triggers tracing (the knobs are read at trace time, then baked
    into the compiled program). Defers to an explicitly-set user env var
    so the FUTURE_OD_FLASH_BQ/_BK A/B knobs keep working.
    """
    saved = {}
    try:
        for key, val in (
            ("FUTURE_OD_FLASH_BQ", block_q),
            ("FUTURE_OD_FLASH_BK", block_k),
        ):
            if val is not None and key not in os.environ:
                saved[key] = None
                os.environ[key] = str(val)
        yield
    finally:
        for key in saved:
            os.environ.pop(key, None)


def _flash_kernel(q_ref, k_ref, v_ref, out_ref, *, scale, kv_len, block_k):
    """One (batch·head, q-block) program: online-softmax over k blocks.

    q_ref: (1, block_q, d); k_ref: (1, Nk_padded, d); v_ref: (1, Nk_padded, dv);
    out_ref: (1, block_q, dv).

    The softmax is VPU-bound at encoder shapes (the score tensor is ~60x the
    activation volume), so two per-element ops are shaved with identical
    semantics: exp runs in base 2 with log2(e) folded into the q scale
    (exp2(log2e·(s−m)) ≡ exp(s−m), elementwise-exact), and the padded-key
    mask (iota + compare + select) runs only on the single block that
    actually contains padding instead of on every block.

    Round-4 floor study (tools/bench_softmax_floor.py, chained timing at the
    encoder shape): a dots-only kernel with the ENTIRE softmax stripped costs
    5.50 ms vs 5.54 ms for this full kernel — the kernel sits on a
    per-program dispatch/streaming floor, and the VPU softmax work is fully
    overlapped. Consequently bf16 MXU dots (FUTURE_OD_FLASH_BF16_DOT=1) stay
    OPT-IN: they measured *slower* standalone (6.30 ms — Mosaic operand
    relayouts) and neutral embedded, while the shipped upcast-f32 dots keep
    round-3's validated numerics. All reductions stay f32 either way.
    """
    block_q = q_ref.shape[1]
    d_v = v_ref.shape[-1]
    nk_padded = k_ref.shape[1]
    num_kb = nk_padded // block_k
    num_clean = kv_len // block_k  # blocks with no padded key

    bf16_dots = q_ref.dtype == jnp.bfloat16 and _env_true(
        "FUTURE_OD_FLASH_BF16_DOT"
    )
    dot_t = jnp.bfloat16 if bf16_dots else jnp.float32
    # scale in f32, round once to the dot dtype
    q = (q_ref[0].astype(jnp.float32) * (scale * LOG2E)).astype(dot_t)

    def make_body(masked):
        def body(kb, carry):
            acc, row_max, row_sum = carry
            k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(dot_t)
            v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(dot_t)
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (block_q, block_k) f32
            if masked:
                col = kb * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, logits.shape, 1
                )
                logits = jnp.where(col < kv_len, logits, NEG_INF)

            new_max = jnp.maximum(row_max, logits.max(axis=1, keepdims=True))
            correction = jnp.exp2(row_max - new_max)
            p = jnp.exp2(logits - new_max)
            new_sum = row_sum * correction + p.sum(axis=1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(dot_t), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            new_acc = acc * correction + pv
            return new_acc, new_max, new_sum

        return body

    carry = (
        jnp.zeros((block_q, d_v), jnp.float32),
        jnp.full((block_q, 1), NEG_INF, jnp.float32),
        jnp.zeros((block_q, 1), jnp.float32),
    )
    carry = jax.lax.fori_loop(0, num_clean, make_body(False), carry)
    if num_kb > num_clean:  # static: at most one block holds padded keys
        carry = make_body(True)(num_clean, carry)
    acc, row_max, row_sum = carry
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
    block_q: int | None = None,
    block_k: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q·kᵀ·scale)·v without materializing logits. Returns
    (B, H, Nq, dv) in q's dtype.

    Block sizes default to whole-sequence blocks (one program per (b, h),
    k-length padded to 128 instead of a block multiple) subject to a VMEM
    cap on the f32 logits tile: at encoder shapes (B·H=192, T=1400) fixed
    (512, 512) blocks ran 576 small programs per layer and per-program
    overhead dominated — standalone 6.26 ms vs 5.46 ms whole-sequence
    (tools/bench_flash_blocks.py, chained timing, b24), embedded
    105.5 → 110.9 clips/s bench.py (ABBA, one window).
    """
    B, H, Nq, d = q.shape
    Nk = k.shape[2]
    dv = v.shape[3]

    if block_q is None:
        # q-block cap: whole-sequence q blocks (one program per (b, h))
        # win EMBEDDED in the batch-eval program since the exp2/
        # single-masked-block kernel rework — bench.py ABBA in one window:
        # bq=512 105.5/105.4 vs full-row 110.8/110.9 clips/s (+5.1%);
        # bq=1400 and 1408 measure identical. The choice is PROGRAM-
        # dependent: the multi-stream server's fused encode+ring-scatter
        # program measures the OPPOSITE (152 -> 98 clips/s with full-row;
        # monotonic in block_q: 512 > 704 > 1408), so serve/server.py pins
        # its geometry via flash_block_env. The 12 MB logits-tile guard
        # below bounds VMEM; env knobs for A/B (FUTURE_OD_FLASH_BQ / _BK).
        cap_q = int(os.environ.get("FUTURE_OD_FLASH_BQ", DEFAULT_BLOCK_Q))
        block_q = min(-(-Nq // 16) * 16, cap_q)
    if block_k is None:
        cap_k = int(os.environ.get("FUTURE_OD_FLASH_BK", DEFAULT_BLOCK_K))
        block_k = min(-(-Nk // 128) * 128, cap_k)
        # keep the f32 logits tile under ~12 MB of VMEM
        while block_q * block_k * 4 > 12 * 1024 * 1024 and block_k > 512:
            block_k //= 2
        block_k = -(-block_k // 128) * 128
    block_q = min(block_q, max(8, -(-Nq // 8) * 8))
    block_k = min(block_k, max(128, -(-Nk // 128) * 128))
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


# ---------------------------------------------------------------------------
# Differentiable flash attention (training path)
# ---------------------------------------------------------------------------
#
# custom_vjp with Pallas forward AND backward kernels. The forward also emits
# the logsumexp rows; the backward recomputes probabilities per block from
# them (the standard flash backward), so (Nq, Nk) tensors never touch HBM in
# either direction. Attention-weight dropout is generated INSIDE the kernels
# by a stateless integer hash of the GLOBAL (batch·head, row, col) coordinate
# and the seed — the forward and both backward kernels therefore regenerate
# bit-identical masks regardless of their block partitioning, and the same
# code runs under interpret mode (no TPU-PRNG primitive dependency).


def _dropout_mask(seed_ref, bh, row0, col0, shape, rate, nq_pad, nk_pad):
    """Deterministic dropout keep-mask for the tile whose global top-left
    element is (bh, row0, col0), scaled by 1/keep. PCG-style output hash over
    the element's flat index XOR seed (wrapping uint32 arithmetic)."""
    # flat index built in uint32 from the start: at int32 the multiply-adds
    # wrap once B*H*nq_pad*nk_pad exceeds 2^31, correlating dropout bits
    # across distant positions (ADVICE r2)
    row = (row0 + jax.lax.broadcasted_iota(jnp.int32, shape, 0)).astype(jnp.uint32)
    col = (col0 + jax.lax.broadcasted_iota(jnp.int32, shape, 1)).astype(jnp.uint32)
    idx = (bh.astype(jnp.uint32) * jnp.uint32(nq_pad) + row) * jnp.uint32(nk_pad) + col
    x = idx ^ (seed_ref[0].astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
    x = x * jnp.uint32(747796405) + jnp.uint32(2891336453)
    w = ((x >> ((x >> jnp.uint32(28)) + jnp.uint32(4))) ^ x) * jnp.uint32(277803737)
    bits = (w >> jnp.uint32(22)) ^ w
    threshold = jnp.uint32(min(int(rate * (2**32)), 2**32 - 1))
    return (bits >= threshold).astype(jnp.float32) / (1.0 - rate)


def _flash_fwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, out_ref, lse_ref, *, scale, kv_len, block_k, rate
):
    block_q = q_ref.shape[1]
    d_v = v_ref.shape[-1]
    num_kb = k_ref.shape[1] // block_k
    bh = pl.program_id(0)
    qb = pl.program_id(1)

    q = q_ref[0].astype(jnp.float32) * scale

    def body(kb, carry):
        acc, row_max, row_sum = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < kv_len, logits, NEG_INF)

        new_max = jnp.maximum(row_max, logits.max(axis=1, keepdims=True))
        correction = jnp.exp(row_max - new_max)
        p = jnp.exp(logits - new_max)
        new_sum = row_sum * correction + p.sum(axis=1, keepdims=True)
        if rate > 0.0:
            p = p * _dropout_mask(
                seed_ref, bh, qb * block_q, kb * block_k, p.shape, rate,
                q_ref.shape[1] * pl.num_programs(1), k_ref.shape[1],
            )
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
    # lse rows broadcast across a full 128-lane register: TPU block shapes
    # need the last two dims (sublane, lane)-tiled, so a (1, block_q) row
    # vector is not addressable — same layout as jax's reference TPU flash.
    lse_ref[0] = jnp.broadcast_to(
        row_max + jnp.log(row_sum), (row_sum.shape[0], LSE_LANES)
    )


def _flash_dq_kernel(
    seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, scale, kv_len, block_k, rate,
):
    """dq for one (bh, q-block): dq = Σ_kb (p ⊙ (dS - δ)) · k · scale."""
    num_kb = k_ref.shape[1] // block_k
    bh = pl.program_id(0)
    qb = pl.program_id(1)

    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, 0:1]  # rows lane-broadcast; one lane suffices
    delta = delta_ref[0][:, 0:1]

    def body(kb, dq):
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        logits = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        p = jnp.where(col < kv_len, jnp.exp(logits - lse), 0.0)
        ds = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if rate > 0.0:
            ds = ds * _dropout_mask(
                seed_ref, bh, qb * q_ref.shape[1], kb * block_k, ds.shape, rate,
                q_ref.shape[1] * pl.num_programs(1), k_ref.shape[1],
            )
        dlogits = p * (ds - delta)
        return dq + jax.lax.dot_general(
            dlogits, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    dq = jax.lax.fori_loop(
        0, num_kb, body, jnp.zeros((q.shape[0], q.shape[1]), jnp.float32)
    )
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _flash_dkv_kernel(
    seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, scale, q_len, kv_len, block_q, rate,
):
    """dk/dv for one (bh, k-block): loop over q blocks."""
    num_qb = q_ref.shape[1] // block_q
    bh = pl.program_id(0)
    kb = pl.program_id(1)
    block_k = k_ref.shape[1]

    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)

    def body(qb, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(qb * block_q, block_q), 0:1]
        delta = delta_ref[0, pl.ds(qb * block_q, block_q), 0:1]
        row = qb * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, 1), 0
        )
        logits = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        # zero out padded keys AND padded query rows (their lse is garbage)
        valid = (col < kv_len) & (row < q_len)
        p = jnp.where(valid, jnp.exp(logits - lse), 0.0)
        ds = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if rate > 0.0:
            mask = _dropout_mask(
                seed_ref, bh, qb * block_q, kb * block_k, p.shape, rate,
                q_ref.shape[1], block_k * pl.num_programs(1),
            )
            p_dropped = p * mask
            ds = ds * mask
        else:
            p_dropped = p
        dv = dv + jax.lax.dot_general(
            p_dropped, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dlogits = p * (ds - delta)
        dk = dk + jax.lax.dot_general(
            dlogits, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk, dv

    dk = jnp.zeros((block_k, k.shape[1]), jnp.float32)
    dv = jnp.zeros((block_k, v.shape[1]), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_qb, body, (dk, dv))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _train_shapes(q, k, block_q, block_k):
    B, H, Nq, d = q.shape
    Nk = k.shape[2]
    block_q = min(block_q, max(8, Nq))
    block_k = min(block_k, max(128, Nk))
    nq_pad = -(-Nq // block_q) * block_q
    nk_pad = -(-Nk // block_k) * block_k
    return B, H, Nq, Nk, d, block_q, block_k, nq_pad, nk_pad


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8)
)
def flash_attention_train(
    q, k, v, seed, scale, dropout_rate=0.0, block_q=DEFAULT_BLOCK_Q,
    block_k=DEFAULT_BLOCK_K, interpret=False,
):
    """Differentiable fused attention with in-kernel attention-weight dropout.

    q/k/v: (B, H, N, d); seed: int32 scalar array driving the dropout PRNG
    (ignored when dropout_rate == 0). Returns (B, H, Nq, dv) in q's dtype.
    """
    out, _ = _flash_train_fwd(
        q, k, v, seed, scale, dropout_rate, block_q, block_k, interpret
    )
    return out


def _flash_train_fwd(q, k, v, seed, scale, dropout_rate, block_q, block_k, interpret):
    B, H, Nq, Nk, d, block_q, block_k, nq_pad, nk_pad = _train_shapes(
        q, k, block_q, block_k
    )
    dv_dim = v.shape[3]
    qf = _pad_to(q.reshape(B * H, Nq, d), nq_pad, 1)
    kf = _pad_to(k.reshape(B * H, Nk, d), nk_pad, 1)
    vf = _pad_to(v.reshape(B * H, Nk, dv_dim), nk_pad, 1)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    grid = (B * H, nq_pad // block_q)
    out, lse = pl.pallas_call(
        functools.partial(
            _flash_fwd_kernel, scale=scale, kv_len=Nk, block_k=block_k,
            rate=dropout_rate,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_pad, dv_dim), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dv_dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, block_q, LSE_LANES), lambda b, i: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, nq_pad, dv_dim), q.dtype),
            jax.ShapeDtypeStruct((B * H, nq_pad, LSE_LANES), jnp.float32),
        ],
        interpret=interpret,
    )(seed_arr, qf, kf, vf)
    out = out[:, :Nq].reshape(B, H, Nq, dv_dim)
    return out, (q, k, v, seed_arr, out, lse)


def _flash_train_bwd(scale, dropout_rate, block_q, block_k, interpret, res, do):
    q, k, v, seed_arr, out, lse = res
    B, H, Nq, Nk, d, block_q, block_k, nq_pad, nk_pad = _train_shapes(
        q, k, block_q, block_k
    )
    dv_dim = v.shape[3]
    qf = _pad_to(q.reshape(B * H, Nq, d), nq_pad, 1)
    kf = _pad_to(k.reshape(B * H, Nk, d), nk_pad, 1)
    vf = _pad_to(v.reshape(B * H, Nk, dv_dim), nk_pad, 1)
    dof = _pad_to(do.reshape(B * H, Nq, dv_dim), nq_pad, 1)
    # δ = rowsum(do ⊙ out) — tiny, computed in XLA; lane-broadcast like lse
    delta = _pad_to(
        jnp.sum(
            do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
        ).reshape(B * H, Nq),
        nq_pad,
        1,
    )
    delta = jnp.broadcast_to(delta[..., None], (B * H, nq_pad, LSE_LANES))

    grid_q = (B * H, nq_pad // block_q)
    dq = pl.pallas_call(
        functools.partial(
            _flash_dq_kernel, scale=scale, kv_len=Nk, block_k=block_k,
            rate=dropout_rate,
        ),
        grid=grid_q,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_pad, dv_dim), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, dv_dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, LSE_LANES), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, LSE_LANES), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, nq_pad, d), q.dtype),
        interpret=interpret,
    )(seed_arr, qf, kf, vf, dof, lse, delta)

    grid_k = (B * H, nk_pad // block_k)
    dk, dvv = pl.pallas_call(
        functools.partial(
            _flash_dkv_kernel, scale=scale, q_len=Nq, kv_len=Nk,
            block_q=block_q, rate=dropout_rate,
        ),
        grid=grid_k,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nq_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dv_dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq_pad, dv_dim), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq_pad, LSE_LANES), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq_pad, LSE_LANES), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dv_dim), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, nk_pad, d), k.dtype),
            jax.ShapeDtypeStruct((B * H, nk_pad, dv_dim), v.dtype),
        ],
        interpret=interpret,
    )(seed_arr, qf, kf, vf, dof, lse, delta)

    dq = dq[:, :Nq].reshape(B, H, Nq, d)
    dk = dk[:, :Nk].reshape(B, H, Nk, d)
    dvv = dvv[:, :Nk].reshape(B, H, Nk, dv_dim)
    return dq, dk, dvv, None


flash_attention_train.defvjp(_flash_train_fwd, _flash_train_bwd)


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
