"""Per-stage backbone attribution vs the roofline bounds (tools/roofline.py).

Times PREFIX programs of the ResNet-50 trunk — stem; stem+layer1; ...;
stem+layer1..4; +proj — each as a chained jitted scan (per-dispatch host
overhead through the axon tunnel otherwise dominates; see BENCHMARKS.md
round-2 measurement discipline).  Marginal stage time = difference of
successive prefixes.  Prefixes are produced by registering truncated
entries in resnet.STAGE_BLOCKS, so the measured code is exactly the
shipping trunk (same Bottleneck modules, same fusion flags), not a copy.

Caveat recorded with the results: prefix differencing breaks any XLA
fusion that would span the cut point, so marginals are upper bounds on the
stage's embedded cost; the final prefix equals the real full backbone.

Run on TPU (serialized — no other TPU process): python tools/bench_stage_attrib.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, x0, variables, iters=8, warmup=1):
    @jax.jit
    def chained(x0, variables):
        def body(c, _):
            out = fn(x0 + c, variables)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return (leaf.reshape(-1)[0] * 1e-30).astype(x0.dtype), None

        c, _ = jax.lax.scan(body, jnp.zeros((), x0.dtype), None, length=iters)
        return c

    for _ in range(warmup):
        np.asarray(chained(x0, variables))
    t0 = time.perf_counter()
    np.asarray(chained(x0, variables))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    from future_od_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from future_od_tpu.models import resnet as R

    B, H, W = 24, 896, 1600
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(B, H, W, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)

    full = R.STAGE_BLOCKS["resnet50"]
    prefixes = [("stem", ())] + [
        (f"+layer{i + 1}", full[: i + 1]) for i in range(len(full))
    ]
    for name, blocks in prefixes:
        R.STAGE_BLOCKS[f"prefix_{name}"] = blocks

    results = {}
    prev = 0.0
    rows = []
    for name, _blocks in prefixes:
        model = R.ResNet(name_id=f"prefix_{name}")
        variables = jax.jit(model.init)(jax.random.key(0), x[:1])
        variables = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            variables,
        )
        fn = lambda x, v: model.apply(v, x, deterministic=True)
        ms = timeit(fn, x, variables)
        rows.append((name, ms, ms - prev))
        print(f"  {name:10s} prefix {ms:8.2f} ms   marginal {ms - prev:8.2f} ms",
              flush=True)
        results[name] = {"prefix_ms": round(ms, 2),
                         "marginal_ms": round(ms - prev, 2)}
        prev = ms

    # full backbone incl. 1x1 proj for the grand total
    model = R.CDetrBackbone(hidden_dim=256)
    variables = jax.jit(model.init)(jax.random.key(0), x[:1])
    variables = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables,
    )
    fn = lambda x, v: model.apply(v, x, deterministic=True)
    ms = timeit(fn, x, variables)
    print(f"  {'+proj':10s} prefix {ms:8.2f} ms   marginal {ms - prev:8.2f} ms",
          flush=True)
    results["+proj"] = {"prefix_ms": round(ms, 2),
                        "marginal_ms": round(ms - prev, 2)}

    out = os.environ.get("STAGE_ATTRIB_OUT", "/tmp/stage_attrib.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
