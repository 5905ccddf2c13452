"""Prefetching host loader feeding device-resident batches.

Replaces the reference's torch DataLoader (16 worker processes,
runs/_loader.py:106-123) with a thread-pool pipeline: sample loading +
transforms run in parallel host threads (the heavy parts — JPEG decode,
resize — release the GIL inside OpenCV's native kernels), batches are stacked
to numpy and `jax.device_put` with the data-parallel sharding so the jitted
step consumes device-resident global batches while the next batch decodes.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, Optional, Sequence

import numpy as np

import jax

# Keys stacked into device arrays; everything else (strings) stays host-side.
ARRAY_KEYS = (
    "video", "boxes", "classes", "active", "annotated_frame_idx", "ignore_boxes",
    "translation", "acceleration", "rotation", "rotation_rate", "speed",
    "temporal_offsets",
)
VAL_SEED = 9069788369656784  # the reference's fixed validation seed (_loader.py:104)


def host_space_to_depth(video: np.ndarray) -> np.ndarray:
    """(..., H, W, C) -> (..., H/2, W/2, 4C): host-side 2x2 pixel packing
    with (di, dj, c) channel order. The SINGLE definition of the pack
    layout — it must match models/resnet.space_to_depth (the on-device
    equivalent), the (4, 4, 12, 64) s2d stem kernel, and
    device_normalize's channel-tiled stats; callers (Loader, bench.py)
    share this instead of re-deriving the transpose."""
    v = np.asarray(video)
    *lead, H, W, C = v.shape
    v = v.reshape(*lead, H // 2, 2, W // 2, 2, C)
    v = np.moveaxis(v, v.ndim - 4, v.ndim - 3)  # (..., H/2, W/2, di, dj, C)
    return np.ascontiguousarray(v).reshape(*lead, H // 2, W // 2, 4 * C)


def collate(samples: Sequence[Dict[str, Any]]) -> Dict[str, Any]:
    batch: Dict[str, Any] = {}
    for key in samples[0]:
        if key in ARRAY_KEYS:
            batch[key] = np.stack([np.asarray(s[key]) for s in samples])
        else:
            batch[key] = [s[key] for s in samples]
    return batch


class Loader:
    """Iterable over device-ready batches.

    Args:
        dataset: indexable with __len__/__getitem__ returning the batch dict.
        batch_size: global batch size.
        shuffle: reshuffle every epoch (seeded by epoch for determinism —
            the DistributedSampler.set_epoch idiom).
        seed: RNG seed (use VAL_SEED for validation order parity).
        drop_last: drop the trailing partial batch (train default — keeps
            shapes static so the step never recompiles).
        sharding: optional jax sharding for device placement of batches.
        num_workers: host threads for sample loading.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = True,
        sharding=None,
        num_workers: int = 8,
        prefetch: int = 2,
        device_put: bool = True,
        space_to_depth: bool = False,
    ):
        assert len(dataset) > 0, "All loaders must be non-empty"
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.sharding = sharding
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.device_put = device_put
        # pack 2x2 pixel blocks into 12 channels on the HOST (per-sample, in
        # the worker pool) so the TPU s2d stem skips its input transpose
        self.space_to_depth = space_to_depth
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batch_indices(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng((self.seed * 100_003 + self._epoch) % (2**63)).shuffle(order)
        else:
            np.random.default_rng(self.seed % (2**63)).shuffle(order)
        nb = len(self)
        for b in range(nb):
            yield order[b * self.batch_size : (b + 1) * self.batch_size]

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    # Fan out per-SAMPLE (not per-batch) so a single batch's
                    # JPEG decodes fill every worker; pending holds the
                    # ordered sample futures of up to prefetch+1 batches.
                    pending = []

                    def drain(futs):
                        out_q.put(
                            ("ok", self._finish([f.result() for f in futs]))
                        )

                    try:
                        for idxs in self._batch_indices():
                            if stop.is_set():
                                return
                            pending.append(
                                [pool.submit(self._get_sample, i)
                                 for i in idxs]
                            )
                            while len(pending) > self.prefetch:
                                drain(pending.pop(0))
                        while pending and not stop.is_set():
                            drain(pending.pop(0))
                    finally:
                        # early exit (consumer stopped / error): drop queued
                        # work so the pool shuts down promptly
                        for futs in pending:
                            for f in futs:
                                f.cancel()
            except Exception as exc:  # propagate into the consumer
                out_q.put(("err", exc))
            finally:
                out_q.put(("done", None))

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                kind, payload = out_q.get()
                if kind == "done":
                    return
                if kind == "err":
                    raise payload
                yield payload
        finally:
            stop.set()

    def _get_sample(self, i):
        sample = self.dataset[i]
        if self.space_to_depth:
            sample = dict(sample)
            sample["video"] = host_space_to_depth(sample["video"])
        return sample

    def _load_batch(self, idxs):
        return self._finish([self._get_sample(i) for i in idxs])

    def _finish(self, samples):
        batch = collate(samples)
        if self.device_put:
            arrays = {k: v for k, v in batch.items() if k in ARRAY_KEYS}
            if self.sharding is not None:
                arrays = jax.device_put(
                    arrays, jax.tree.map(lambda _: self.sharding, arrays)
                )
            else:
                arrays = jax.device_put(arrays)
            batch.update(arrays)
        return batch
