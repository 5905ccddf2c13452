"""Streaming-serving throughput at the flagship eval config.

Measures clips/s when consecutive clips share frames (the production video
stream case): each step encodes ONE new frame (batch of 12 streams) and
decodes against the cached previous frame — vs the batch eval path that
re-encodes both frames per clip (bench.py).

Run on TPU: python tools/bench_streaming.py
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


def main():
    from future_od_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from future_od_tpu.models.build import build_flagship
    from future_od_tpu.models.st_detr import SpatioTemporalDETRArgs
    from future_od_tpu.serve import StreamingSession

    B = int(os.environ.get("BENCH_BATCH", 12))
    H, W = 896, 1600
    # BENCH_INT8=1: serve with the int8 PTQ backbone (see bench.py / ops/quant.py)
    int8 = os.environ.get("BENCH_INT8", "0") == "1"
    args = SpatioTemporalDETRArgs(
        num_classes=8, num_queries=128, lr_backbone=1e-4, int8_backbone=int8
    )
    model = build_flagship(args)
    rng = np.random.default_rng(0)

    # BENCH_HOST_FRAMES=1: leave frames as host numpy so each step pays the
    # real host->device transfer (the serving regime — frames arrive from
    # cameras/decoders on the host). BENCH_U8=1: ship uint8 and normalize
    # on device (resnet.device_normalize) — 4x fewer bytes over the link.
    host_frames = os.environ.get("BENCH_HOST_FRAMES", "0") == "1"
    u8 = os.environ.get("BENCH_U8", "0") == "1"

    def frame(i):
        if u8:
            v = rng.integers(0, 256, size=(B, H, W, 3)).astype(np.uint8)
        else:
            v = rng.normal(size=(B, H, W, 3)).astype(np.float32)
        if host_frames:
            video = v
        elif u8:
            video = jnp.asarray(v)
        else:
            video = jnp.asarray(v).astype(jnp.bfloat16)
        f = {"video": video}
        for key, d in [
            ("translation", 3), ("acceleration", 3), ("rotation", 4),
            ("rotation_rate", 3), ("speed", 1),
        ]:
            imu = rng.normal(size=(B, d)).astype(np.float32)
            f[key] = imu if host_frames else jnp.asarray(imu)
        return f

    init_data = {
        "video": jnp.zeros((B, 3, H, W, 3), jnp.float32),
        "annotated_frame_idx": jnp.asarray([2] * B),
        **{
            k: jnp.zeros((B, 3, d), jnp.float32)
            for k, d in [
                ("translation", 3), ("acceleration", 3), ("rotation", 4),
                ("rotation_rate", 3), ("speed", 1),
            ]
        },
    }
    variables = jax.jit(
        lambda k: model.init({"params": k}, init_data, deterministic=True)
    )(jax.random.key(0))
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables,
    )

    session = StreamingSession(model, variables, clip_frames=3)
    frames = [frame(i) for i in range(4)]

    # warm up: compile encode + detect, fill the window
    for f in frames[:3]:
        out = session.step(f)
    np.asarray(out["boxes"])

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        out = session.step(frames[i % 4])
    np.asarray(out["boxes"])
    elapsed = time.perf_counter() - t0
    clips_per_sec = B * iters / elapsed
    print(
        json.dumps(
            {
                "metric": "clips_per_sec_per_chip_streaming"
                + ("_int8" if int8 else "")
                + ("_hostio" if host_frames else "")
                + ("_u8" if u8 else "")
                + f"_b{B}_896x1600",
                "value": round(clips_per_sec, 2),
                "unit": "clips/sec/chip",
                "vs_baseline": round(clips_per_sec / 40.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
