"""Same-process timing of the flagship infer vs its backbone sub-computation.

Settles embedded-vs-standalone discrepancies: both timings share one process,
one methodology (pipelined iters + single host-materialization sync), and the
very same weights/input tensors.

Run on TPU: python tools/bench_split.py
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
    def sync(o):
        np.asarray(jax.tree_util.tree_leaves(o)[0])

    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    from future_od_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from future_od_tpu.models.build import build_flagship
    from future_od_tpu.models.st_detr import SpatioTemporalDETRArgs
    from future_od_tpu.train.step import make_inference_fn
    from future_od_tpu.models.resnet import CDetrBackbone

    B, FRAMES, H, W = 12, 3, 896, 1600
    args = SpatioTemporalDETRArgs(
        num_classes=8, num_queries=128, lr_backbone=1e-4
    )
    model = build_flagship(args)
    rng = np.random.default_rng(0)
    data = {
        "video": jnp.asarray(
            rng.normal(size=(B, FRAMES, H, W, 3)).astype(np.float32)
        ),
        "annotated_frame_idx": jnp.asarray([FRAMES - 1] * B),
    }
    for key, d in [
        ("translation", 3), ("acceleration", 3), ("rotation", 4),
        ("rotation_rate", 3), ("speed", 1),
    ]:
        data[key] = jnp.asarray(
            rng.normal(size=(B, FRAMES, d)).astype(np.float32)
        )
    variables = jax.jit(
        lambda k: model.init({"params": k}, data, deterministic=True)
    )(jax.random.key(0))
    bf16 = jnp.bfloat16
    variables = jax.tree.map(
        lambda x: x.astype(bf16) if x.dtype == jnp.float32 else x, variables
    )
    data["video"] = data["video"].astype(bf16)

    infer = jax.jit(make_inference_fn(model))
    ms = timeit(infer, variables, data)
    print(f"  full infer                 {ms:8.2f} ms "
          f"({B / ms * 1000:.1f} clips/s)", flush=True)

    # backbone with the flagship's own weights on the folded 2-frame input
    def find_subtree(tree, name):
        if isinstance(tree, dict):
            if name in tree:
                return tree[name]
            for v in tree.values():
                r = find_subtree(v, name)
                if r is not None:
                    return r
        return None

    bb_vars = {
        col: find_subtree(variables[col], "backbone")
        for col in variables
        if find_subtree(variables[col], "backbone") is not None
    }
    print(f"  backbone collections: {list(bb_vars)}", flush=True)
    bb = CDetrBackbone(hidden_dim=256)
    folded = data["video"][:, :-1].reshape(B * (FRAMES - 1), H, W, 3)
    bb_fn = jax.jit(lambda v, x: bb.apply(v, x, deterministic=True))
    ms = timeit(bb_fn, bb_vars, folded)
    print(f"  backbone (24 img, same w)  {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
