"""Loader throughput benchmark: real JPEG decode at stage-1 shapes.

VERDICT r1 weak #5: the thread-pool Loader (data/loader.py) replaces the
reference's 16 decode *processes* with GIL-releasing cv2 threads — unproven
against real JPEG work. This benchmark writes ~camera-sized JPEGs to a tmp
dir, then measures end-to-end Loader throughput (decode 3-frame clip ->
resize to 448x800 -> normalize -> collate) at batch 32 across worker counts,
against the 838 ms/step training budget (BENCHMARKS.md).

CPU-only; run anywhere:  python tools/bench_loader.py [--frames N]
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax


def make_jpegs(root: str, n: int, h: int = 900, w: int = 1600) -> list:
    import cv2

    rng = np.random.default_rng(0)
    paths = []
    # realistic-entropy content: smooth gradients + noise compresses like a
    # road scene (pure noise over-estimates decode cost, flat under-estimates)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for i in range(n):
        base = (
            128
            + 80 * np.sin(xx / (40 + i % 7) + i)
            + 40 * np.cos(yy / (30 + i % 5))
        )
        img = base[..., None] + rng.normal(0, 18, size=(h, w, 3))
        path = os.path.join(root, f"{i:04d}.jpg")
        cv2.imwrite(path, np.clip(img, 0, 255).astype(np.uint8),
                    [int(cv2.IMWRITE_JPEG_QUALITY), 90])
        paths.append(path)
    return paths


class ClipDataset:
    """Minimal 3-frame clip dataset: decode + resize + normalize, the same
    work per sample as NuScenesDataset's image path (data/nu_scenes.py)."""

    def __init__(self, paths, length: int = 3, size=(448, 800)):
        self.paths = paths
        self.length = length
        self.size = size

    def __len__(self):
        return 4096

    def __getitem__(self, idx):
        import cv2

        frames = []
        for k in range(self.length):
            img = cv2.imread(self.paths[(idx * 3 + k) % len(self.paths)])
            img = cv2.resize(
                img, (self.size[1], self.size[0]),
                interpolation=cv2.INTER_LINEAR,
            )
            frames.append(img[..., ::-1].astype(np.float32) / 255.0)
        video = np.stack(frames)
        return {
            "video": video,
            "boxes": np.zeros((self.length, 20, 4), np.float32),
            "classes": np.zeros((self.length, 20), np.int32),
            "active": np.zeros((self.length, 20), bool),
            "annotated_frame_idx": np.int32(self.length - 1),
            "ignore_boxes": np.zeros((self.length, 20, 4), np.float32),
            "temporal_offsets": np.linspace(-1, 0, self.length, dtype=np.float32),
        }


def main():
    jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--loader", default="thread", choices=["thread", "grain"],
                    help="thread pool vs grain worker processes")
    args = ap.parse_args()

    if args.loader == "grain":
        from future_od_tpu.data.grain_loader import GrainLoader as Loader
    else:
        from future_od_tpu.data.loader import Loader

    with tempfile.TemporaryDirectory() as root:
        t0 = time.perf_counter()
        paths = make_jpegs(root, args.frames)
        print(f"wrote {len(paths)} jpegs in {time.perf_counter()-t0:.1f}s")
        ds = ClipDataset(paths)

        for workers in (1, 4, 8, 16, 32):
            loader = Loader(
                ds, args.batch, shuffle=True, num_workers=workers,
                device_put=False,
            )
            it = iter(loader)
            next(it)  # warm the pool
            t0 = time.perf_counter()
            for _ in range(args.batches):
                next(it)
            dt = (time.perf_counter() - t0) / args.batches
            decodes = args.batch * ds.length / dt
            print(
                f"workers={workers:3d}: {dt*1000:7.1f} ms/batch "
                f"({decodes:6.0f} decodes/s) "
                f"{'OK' if dt < 0.838 else 'SLOWER than 838ms step'}",
                flush=True,
            )


if __name__ == "__main__":
    main()
