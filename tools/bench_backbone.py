"""Backbone-only benchmark at the flagship inference shape (24, 896, 1600, 3)
— isolates the fused-bottleneck / s2d-stem settings from the full model to
explain embedded-vs-standalone performance differences.

Run on TPU: python tools/bench_backbone.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10, warmup=2):
    """Device time per call: `iters` sequential executions chained by a data
    dependency inside ONE jitted program — per-dispatch host overhead through
    the axon tunnel otherwise dominates standalone timings (see
    tools/bench_split.py findings in BENCHMARKS.md)."""
    x0, rest = args[0], args[1:]

    @jax.jit
    def chained(x0, rest):
        def body(c, _):
            out = fn(x0 + c, *rest)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return (leaf.reshape(-1)[0] * 1e-30).astype(x0.dtype), None

        c, _ = jax.lax.scan(body, jnp.zeros((), x0.dtype), None, length=iters)
        return c

    for _ in range(warmup):
        np.asarray(chained(x0, rest))
    t0 = time.perf_counter()
    np.asarray(chained(x0, rest))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    from future_od_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from future_od_tpu.models.resnet import CDetrBackbone

    B, H, W = 24, 896, 1600
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(B, H, W, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)

    for label, env in [
        ("all off (xla 7x7 + xla blocks)",
         {"FUTURE_OD_DISABLE_FUSED_RESNET": "1"}),
        ("fused blocks, 7x7 stem",
         {"FUTURE_OD_DISABLE_S2D_STEM": "1"}),
        ("fused blocks + s2d stem", {}),
    ]:
        os.environ.pop("FUTURE_OD_DISABLE_FUSED_RESNET", None)
        os.environ.pop("FUTURE_OD_DISABLE_S2D_STEM", None)
        os.environ.update(env)
        model = CDetrBackbone(hidden_dim=256)
        variables = jax.jit(model.init)(jax.random.key(0), x[:1])
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            variables,
        )
        fn = lambda x, v: model.apply(v, x, deterministic=True)
        try:
            ms = timeit(fn, x, variables)
            print(f"  {label:36s} {ms:8.2f} ms", flush=True)
        except Exception as e:
            print(f"  {label} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
