"""Auxiliary benchmark: training-step throughput at the stage-1 config.

(bench.py remains the driver's single-line headline benchmark; this measures
the full jitted train step — forward + on-device matching/loss + backward +
clipped AdamW + mAP intermediaries — at batch 32 @ 448x800, the reference's
stage-1 training configuration.)
"""
from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from future_od_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from future_od_tpu.models.build import build_flagship
    from future_od_tpu.models.st_detr import SpatioTemporalDETRArgs
    from future_od_tpu.train.optimizer import build_optimizer
    from future_od_tpu.train.step import TrainState, make_train_step

    import os as _os

    B = int(_os.environ.get("BENCH_B", 32))
    H = int(_os.environ.get("BENCH_H", 448))
    W = int(_os.environ.get("BENCH_W", 800))
    L, N = 3, 256
    # BENCH_NO_STOPGRAD=1: keep the full backward through the frozen
    # stem+layer1 (the pre-round-3 behavior) for the stop-gradient A/B
    args = SpatioTemporalDETRArgs(
        num_classes=8, num_queries=128, lr_backbone=1e-4,
        freeze_stem=_os.environ.get("BENCH_NO_STOPGRAD", "0") != "1",
        # BENCH_COST_SLOTS=0 restores the dense Nmax=256 criterion (A/B arm)
        cost_slots=int(_os.environ.get("BENCH_COST_SLOTS", "128")),
    )
    model = build_flagship(args)

    rng = np.random.default_rng(0)
    # Scene-like targets: centers scattered over the image, log-normal sizes.
    # (Earlier versions piled every box within ~40 px of the origin, which
    # drove the auction into pathological price wars — 260 bidding rounds vs
    # ~25 on real data — and overstated the matcher's share of the step.)
    cxy = rng.uniform(0.05, 0.95, size=(B, N, 2)).astype(np.float32) * [W, H]
    wh = np.exp(rng.normal(4.0, 0.6, size=(B, N, 2))).astype(np.float32)
    wh = np.clip(wh, 8, [W * 0.5, H * 0.5])
    data = {
        "video": jnp.asarray(rng.normal(size=(B, L, H, W, 3)).astype(np.float32)),
        "boxes": jnp.asarray(
            np.concatenate([cxy - wh / 2, cxy + wh / 2], -1)
        ),
        "classes": jnp.asarray(rng.integers(0, 8, size=(B, N))),
        "active": jnp.asarray((rng.uniform(size=(B, N)) < 0.1).astype(np.int64)),
        "annotated_frame_idx": jnp.asarray([L - 1] * B),
    }
    for key, d in [
        ("translation", 3), ("acceleration", 3), ("rotation", 4),
        ("rotation_rate", 3), ("speed", 1),
    ]:
        data[key] = jnp.asarray(rng.normal(size=(B, L, d)).astype(np.float32))

    variables = jax.jit(
        lambda k: model.init({"params": k}, data, deterministic=True)
    )(jax.random.key(0))
    tx, opt_state = build_optimizer(
        variables["params"], lr=args.lr, lr_backbone=args.lr_backbone,
        weight_decay=args.weight_decay, max_norm=args.max_norm,
    )
    state = TrainState(variables["params"], variables["frozen"], opt_state, jnp.int32(0))
    import os
    mixed = os.environ.get("MIXED", "0") == "1"
    # BENCH_ACCUM=K scans the fwd/bwd over K micro-batches (exact; one
    # micro-batch's activations live at a time) — the memory lever that
    # lifts the per-chip batch ceiling at stage-2 shapes.
    accum = int(os.environ.get("BENCH_ACCUM", "1"))
    # BENCH_NO_GUARD=1 drops the non-finite-gradient skip (A/B arm for the
    # production divergence guard's overhead; see step._guarded_apply).
    step = jax.jit(
        make_train_step(
            model, args.criterion_config(), tx, mixed_precision=mixed,
            accum_steps=accum,
            skip_nonfinite=os.environ.get("BENCH_NO_GUARD", "0") != "1",
        ),
        donate_argnums=(0,),
    )

    # Dropout-bit PRNG, default rbg (the Trainer's default): the forward
    # draws ~1e9 dropout bits/step at b32 and threefry costs ~10 VPU
    # ops/word vs the TPU hardware RNG — measured 300.5 -> 259.2 ms bf16.
    # BENCH_PRNG=threefry2x32 reproduces the A/B baseline arm.
    key = jax.random.key(1, impl=os.environ.get("BENCH_PRNG", "rbg"))
    state, loss, *_ = step(state, data, key)
    np.asarray(loss)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss, *_ = step(state, data, key)
    np.asarray(loss)
    elapsed = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": f"train_clips_per_sec_b{B}_{H}x{W}"
                + ("_bf16" if mixed else ""),
                "value": round(B * iters / elapsed, 2),
                "unit": "clips/sec/chip",
                "step_ms": round(elapsed / iters * 1e3, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
