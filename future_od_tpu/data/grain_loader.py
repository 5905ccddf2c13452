"""Grain-based input pipeline (process-parallel decode).

Alternative to the thread-prefetch `Loader` (data/loader.py) built on Google
Grain: worker *processes* decode/transform samples (sidestepping the GIL for
python-heavy datasets), with the same batch-dict contract and determinism
guarantees. Select with `Loader`-compatible construction:

    loader = GrainLoader(dataset, batch_size=32, shuffle=True, seed=0)
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import numpy as np

from future_od_tpu.data.loader import ARRAY_KEYS


class _BatchToDict:
    """Grain batch operation producing the framework batch dict."""

    def __call__(self, samples: Sequence[Dict[str, Any]]) -> Dict[str, Any]:
        from future_od_tpu.data.loader import collate

        return collate(list(samples))


class GrainLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = True,
        num_workers: int = 8,
        device_put: bool = True,
    ):
        import grain.python as pygrain

        assert len(dataset) > 0, "All loaders must be non-empty"
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.device_put = device_put
        self._pygrain = pygrain
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        pygrain = self._pygrain
        sampler = pygrain.IndexSampler(
            num_records=len(self.dataset),
            shard_options=pygrain.NoSharding(),
            shuffle=self.shuffle,
            num_epochs=1,
            seed=(self.seed * 100_003 + self._epoch) % (2**31),
        )
        loader = pygrain.DataLoader(
            data_source=self.dataset,
            sampler=sampler,
            operations=[
                pygrain.Batch(batch_size=self.batch_size, drop_remainder=self.drop_last)
            ],
            worker_count=self.num_workers,
        )
        import jax

        for batch in loader:
            # grain batches arrays by stacking; strings come through as lists
            out = dict(batch) if isinstance(batch, dict) else batch
            if self.device_put:
                arrays = {
                    k: jax.device_put(np.asarray(v))
                    for k, v in out.items()
                    if k in ARRAY_KEYS
                }
                out.update(arrays)
            yield out
