"""Flash-attention block-size sweep at the encoder's embedded shape.

Round-3 attribution found each encoder layer costs 4.55 ms embedded while
every analytic bound (MXU, HBM, VPU-softmax) sits under ~1.5 ms — the
suspect is per-program dispatch overhead: at the shipped defaults
(block_q=256, block_k=512) one layer's attention is B*H * ceil(T/256) =
1152 tiny programs. This sweeps (block_q, block_k) with chained-scan
timing (BENCHMARKS.md measurement discipline) at (B=24, H=8, T=1400, d=32),
plus the einsum formulation for reference.

Run on TPU (serialized): python tools/bench_flash_blocks.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit_chained(fn, q, k, v, iters=8, warmup=1):
    @jax.jit
    def chained(q, k, v):
        def body(c, _):
            out = fn(q + c, k, v)
            return (out.reshape(-1)[0] * 1e-30).astype(q.dtype), None

        c, _ = jax.lax.scan(body, jnp.zeros((), q.dtype), None, length=iters)
        return c

    for _ in range(warmup):
        np.asarray(chained(q, k, v))
    t0 = time.perf_counter()
    np.asarray(chained(q, k, v))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    from future_od_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from future_od_tpu.ops.flash_attention import flash_attention

    B, H, T, d = 24, 8, 1400, 32
    scale = 1.0 / np.sqrt(d)
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, H, T, d)).astype(np.float32)).astype(
            jnp.bfloat16
        )
        for _ in range(3)
    )

    def einsum_attn(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    ref = np.asarray(einsum_attn(q, k, v), np.float32)
    rows = [("einsum", timeit_chained(einsum_attn, q, k, v), 0.0)]
    print(f"  einsum           {rows[0][1]:7.2f} ms", flush=True)
    for bq, bk in [(256, 512), (512, 512), (1400, 512), (1400, 1536),
                   (512, 1536), (256, 1536)]:
        fn = lambda q, k, v, bq=bq, bk=bk: flash_attention(
            q, k, v, scale=scale, block_q=bq, block_k=bk
        )
        try:
            out = np.asarray(fn(q, k, v), np.float32)
            err = np.abs(out - ref).max()
            ms = timeit_chained(fn, q, k, v)
            print(f"  bq={bq:5d} bk={bk:5d} {ms:7.2f} ms  maxerr={err:.2e}",
                  flush=True)
        except Exception as e:
            print(f"  bq={bq} bk={bk} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
