"""MultiStreamServer throughput + per-clip latency at the flagship config.

Simulates S independent camera streams whose frames arrive round-robin into
a MultiStreamServer with max_batch=B (serve/server.py): every dispatch is a
full fixed-shape batch drawn from whichever streams have frames pending.
Reports aggregate clips/s and the p50/p95/p99 submit->materialized latency
of completed clips.

The lockstep upper bound is tools/bench_streaming.py (all streams share one
batch row forever); this bench shows the asynchronous-arrival server holds
that throughput while the occupancy telemetry stays at pad_fraction 0.

Run on TPU: python tools/bench_server.py
  BENCH_STREAMS (default 24)  BENCH_BATCH (default 12)  BENCH_ITERS (default 8)
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

IMU = [("translation", 3), ("acceleration", 3), ("rotation", 4),
       ("rotation_rate", 3), ("speed", 1)]


def main():
    from future_od_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from future_od_tpu.models.build import build_flagship
    from future_od_tpu.models.st_detr import SpatioTemporalDETRArgs
    from future_od_tpu.serve import MultiStreamServer

    S = int(os.environ.get("BENCH_STREAMS", 24))
    B = int(os.environ.get("BENCH_BATCH", 12))
    iters = int(os.environ.get("BENCH_ITERS", 8))  # full passes over streams
    H, W = 896, 1600
    args = SpatioTemporalDETRArgs(num_classes=8, num_queries=128, lr_backbone=1e-4)
    model = build_flagship(args)
    rng = np.random.default_rng(0)

    def frame():
        f = {"video": jnp.asarray(
            rng.normal(size=(H, W, 3)).astype(np.float32)
        ).astype(jnp.bfloat16)}
        for key, d in IMU:
            f[key] = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
        return f

    init_data = {
        "video": jnp.zeros((B, 3, H, W, 3), jnp.float32),
        "annotated_frame_idx": jnp.asarray([2] * B),
        **{k: jnp.zeros((B, 3, d), jnp.float32) for k, d in IMU},
    }
    variables = jax.jit(
        lambda k: model.init({"params": k}, init_data, deterministic=True)
    )(jax.random.key(0))
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables,
    )

    server = MultiStreamServer(
        model, variables, max_batch=B, clip_frames=3, max_streams=S
    )
    # a small pool of premade frames (frame *contents* don't affect timing)
    pool = [frame() for _ in range(8)]

    # warm up: compile encode+detect, fill every stream's window
    for t in range(2):
        for s in range(S):
            res = server.submit(s, pool[(s + t) % len(pool)])
    res += server.flush()
    np.asarray(res[-1][1]["boxes"])

    # timed: round-robin arrivals. A dispatch's clips complete together, so
    # ONE materialization per dispatch stamps every clip in it; latency =
    # clip's submit time -> its dispatch materialized on host.
    submit_t = {}
    latencies = []
    clips = 0

    # BENCH_PIPELINED=1: skip the per-dispatch sync (throughput regime,
    # comparable to tools/bench_streaming.py; no latency stats)
    pipelined = os.environ.get("BENCH_PIPELINED", "0") == "1"
    last = None

    def consume(results):
        nonlocal clips, last
        for placements, out in results:
            if not pipelined:
                np.asarray(out["boxes"])  # one sync: whole dispatch done
                done = time.perf_counter()
                for sid, _row in placements:
                    latencies.append(done - submit_t[sid])
            clips += len(placements)
            last = out

    t0 = time.perf_counter()
    for t in range(iters):
        for s in range(S):
            submit_t[s] = time.perf_counter()
            consume(server.submit(s, pool[(s + t) % len(pool)]))
    consume(server.flush())
    if pipelined and last is not None:
        np.asarray(last["boxes"])
    elapsed = time.perf_counter() - t0
    if pipelined:
        latencies = [0.0]

    lat = np.asarray(latencies) * 1e3
    stats = server.stats()
    print(
        json.dumps(
            {
                "metric": "multistream_server"
                + ("_pipelined" if pipelined else "")
                + f"_s{S}_b{B}_896x1600",
                "value": round(clips / elapsed, 2),
                "unit": "clips/sec/chip",
                "vs_baseline": round(clips / elapsed / 40.0, 3),
                "clips": clips,
                "latency_ms_p50": round(float(np.percentile(lat, 50)), 1),
                "latency_ms_p95": round(float(np.percentile(lat, 95)), 1),
                "latency_ms_p99": round(float(np.percentile(lat, 99)), 1),
                "pad_fraction": round(stats["pad_fraction"], 4),
            }
        )
    )


if __name__ == "__main__":
    main()
