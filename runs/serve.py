"""Production serving entry: multi-stream micro-batched inference.

Loads a trained checkpoint (or random-initializes for a smoke run), builds
the flagship spatiotemporal detector, and serves N asynchronous video
streams through `future_od_tpu.serve.MultiStreamServer` — fixed-shape
micro-batches over a device-resident feature ring (see serve/server.py).
The reference repo has no serving path at all; this is the deployment
counterpart of its eval scripts (runs/eval/*).

Default source is synthetic frames (measures the serving fabric itself);
a real deployment replaces `frame_source` with camera/decoder callbacks —
each frame is an (H, W, 3) uint8/float numpy array plus per-key (d,) IMU
vectors. With --device_normalize frames ship as uint8 and the backbone
normalizes on device (4x fewer host->device bytes).

Examples:
  python runs/serve.py --streams 24 --max_batch 12            # smoke, random init
  python runs/serve.py --checkpoint nusc_500ms_final --bf16   # trained net
  python runs/serve.py --mesh_data 8                          # dp-serve 8 chips
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

IMU = [("translation", 3), ("acceleration", 3), ("rotation", 4),
       ("rotation_rate", 3), ("speed", 1)]


def build_parser():
    parser = argparse.ArgumentParser(description="Multi-stream serving entry")
    parser.add_argument("--checkpoint", default=None,
                        help="checkpoint name under --checkpoint_dir "
                        "(e.g. a trainer <name>_final); random init if absent")
    parser.add_argument("--checkpoint_dir", default=None,
                        help="checkpoint directory (default: the repo "
                        "config checkpoint_path)")
    parser.add_argument("--streams", default=24, type=int)
    parser.add_argument("--max_batch", default=12, type=int)
    parser.add_argument("--max_streams", default=64, type=int)
    parser.add_argument("--img_size", nargs=2, default=[896, 1600], type=int)
    parser.add_argument("--num_classes", default=8, type=int)
    parser.add_argument("--clip_frames", default=3, type=int)
    parser.add_argument("--rounds", default=8, type=int,
                        help="round-robin passes over the streams")
    parser.add_argument("--bf16", action="store_true", default=False)
    parser.add_argument("--device_normalize", action="store_true", default=False,
                        help="ship uint8 frames, normalize on device")
    parser.add_argument("--mesh_data", default=0, type=int,
                        help="serve over an N-chip data mesh (stream-pinned "
                        "ring shards under shard_map)")
    return parser


def main():
    args = build_parser().parse_args()
    from future_od_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from config import config
    from future_od_tpu.models.build import build_flagship
    from future_od_tpu.models.st_detr import SpatioTemporalDETRArgs
    from future_od_tpu.serve import MultiStreamServer
    from future_od_tpu.utils.checkpoint import (
        load_checkpoint,
        load_checkpoint_meta,
    )

    ckpt_dir = args.checkpoint_dir or config["checkpoint_path"]
    H, W = args.img_size
    # Serve the architecture the checkpoint was TRAINED with (meta sidecar)
    # — CLI defaults can silently diverge (e.g. an encode_offset run has an
    # identical param tree, so a mismatched load would succeed and detect
    # wrongly). CLI args only apply to meta-less/random-init runs.
    meta = (
        load_checkpoint_meta(ckpt_dir, args.checkpoint)
        if args.checkpoint else None
    )
    if meta and meta.get("detr_args"):
        import dataclasses

        fields = {f.name for f in dataclasses.fields(SpatioTemporalDETRArgs)}
        detr_args = SpatioTemporalDETRArgs(
            **{k: v for k, v in meta["detr_args"].items() if k in fields}
        )
        print("model architecture from checkpoint meta")
    else:
        detr_args = SpatioTemporalDETRArgs(
            num_classes=args.num_classes, num_queries=128, lr_backbone=1e-4
        )
    model = build_flagship(detr_args)

    init_data = {
        "video": jnp.zeros((1, args.clip_frames, H, W, 3), jnp.float32),
        "annotated_frame_idx": jnp.asarray([args.clip_frames - 1]),
        **{k: jnp.zeros((1, args.clip_frames, d), jnp.float32) for k, d in IMU},
    }
    variables = jax.jit(
        lambda k: model.init({"params": k}, init_data, deterministic=True)
    )(jax.random.key(0))
    if args.checkpoint:
        # target-derived restore (as demo.py): leaves adopt THIS process's
        # placement instead of replaying the save-time sharding — a
        # TPU-trained checkpoint must open on any serving host/topology
        restored = load_checkpoint(
            ckpt_dir, args.checkpoint,
            target={"params": variables["params"], "frozen": variables["frozen"]},
        )
        if restored is None:
            raise SystemExit(f"checkpoint not found: {args.checkpoint}")
        arrays, _meta = restored
        variables = {"params": arrays["params"], "frozen": arrays["frozen"]}
        print(f"loaded checkpoint {args.checkpoint}")
    if args.bf16:
        variables = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, variables,
        )

    mesh = None
    if args.mesh_data:
        from future_od_tpu.parallel.mesh import make_mesh, replicate

        mesh = make_mesh(num_data=args.mesh_data, num_model=1)
        variables = jax.device_put(
            variables, jax.tree.map(lambda _: replicate(mesh), variables)
        )
        print(f"serving over a {args.mesh_data}-chip data mesh")

    server = MultiStreamServer(
        model, variables, max_batch=args.max_batch,
        clip_frames=args.clip_frames, max_streams=args.max_streams, mesh=mesh,
    )

    rng = np.random.default_rng(0)

    # Pre-generate a small frame pool OUTSIDE the timed loop: host RNG for a
    # (896, 1600, 3) frame costs tens of ms and nproc may be 1, so in-loop
    # generation would time frame synthesis, not the serving fabric. A real
    # deployment replaces this with camera/decoder callbacks.
    def make_frame():
        if args.device_normalize:
            video = rng.integers(0, 256, size=(H, W, 3)).astype(np.uint8)
        else:
            video = rng.normal(size=(H, W, 3)).astype(np.float32)
        f = {"video": video}
        for key, d in IMU:
            f[key] = rng.normal(size=(d,)).astype(np.float32)
        return f

    pool = [make_frame() for _ in range(min(args.streams, 8))]

    def frame_source(stream_id, t):
        return pool[(stream_id + t) % len(pool)]

    from collections import deque

    submit_t = {s: deque() for s in range(args.streams)}
    latencies, clips = [], 0

    def consume(results):
        nonlocal clips
        for placements, out in results:
            np.asarray(out["boxes"])  # one sync per dispatch
            done = time.perf_counter()
            for sid, _row in placements:
                # clips complete in submit order within a stream: pop the
                # OLDEST pending submit so queued frames are timed from
                # their own submission, not the stream's latest
                latencies.append(done - submit_t[sid].popleft())
            clips += len(placements)

    # warm up (compile + fill windows), then serve
    for t in range(args.clip_frames - 1):
        for s in range(args.streams):
            server.submit(s, frame_source(s, t))
    server.flush()
    t0 = time.perf_counter()
    for t in range(args.rounds):
        for s in range(args.streams):
            submit_t[s].append(time.perf_counter())
            consume(server.submit(s, frame_source(s, t)))
    consume(server.flush())
    elapsed = time.perf_counter() - t0

    lat = np.asarray(latencies) * 1e3
    print(json.dumps({
        "clips_per_sec": round(clips / elapsed, 2),
        "clips": clips,
        "latency_ms_p50": round(float(np.percentile(lat, 50)), 1),
        "latency_ms_p95": round(float(np.percentile(lat, 95)), 1),
        "latency_ms_p99": round(float(np.percentile(lat, 99)), 1),
        **{k: round(v, 4) for k, v in server.stats().items()},
    }))


if __name__ == "__main__":
    main()
