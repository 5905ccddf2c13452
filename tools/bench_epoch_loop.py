"""Epoch-LOOP throughput at the stage-1 config — host/device overlap A/B.

bench_train.py times the jitted step in a chained loop (pure device work);
this drives the real `Trainer._run_epoch` host loop around that step — meter
updates, AP-tensor fetches, prints — against a zero-cost in-memory loader, so
the difference between the two is exactly the host-loop overhead. The
one-step-lagged result pipeline in the trainer (dispatch step i+1 before
fetching step i's scalars) should hide that overhead behind device compute;
`FUTURE_OD_NO_PIPELINE=1` reproduces the reference-style blocking loop
(/root/reference/future_od/trainer.py:163-171 fetches loss.item() and stats
every iteration before the next batch is touched).

Run on TPU (both arms back-to-back, one window):
    python tools/bench_epoch_loop.py                      # pipelined
    FUTURE_OD_NO_PIPELINE=1 python tools/bench_epoch_loop.py   # blocking
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from future_od_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


class FakeLoader:
    """Yields the same DEVICE-RESIDENT batch `n` times — isolates the host
    loop from data generation AND from host->device transfer. (This
    environment reaches the chip through a slow tunnel: the same 413 MB f32
    batch measured ~14 s/iter to re-ship, drowning the loop signal; a real
    pod feeds chips over local DMA. BENCH_HOST_BATCH=1 keeps the batch on
    host to measure the tunnel-transfer-bound regime instead.)"""

    def __init__(self, batch, n):
        self._batch = batch
        self._n = n
        self.batch_size = batch["video"].shape[0]

    def set_epoch(self, epoch):
        pass

    def __len__(self):
        return self._n

    def __iter__(self):
        for _ in range(self._n):
            yield self._batch


def main():
    from future_od_tpu.models.build import build_flagship
    from future_od_tpu.models.st_detr import SpatioTemporalDETRArgs
    from future_od_tpu.train.trainer import Trainer
    from future_od_tpu.utils.wandb import WandBConfig

    B = int(os.environ.get("BENCH_B", 32))
    H = int(os.environ.get("BENCH_H", 448))
    W = int(os.environ.get("BENCH_W", 800))
    iters = int(os.environ.get("BENCH_ITERS", 12))
    L, N = 3, 256

    rng = np.random.default_rng(0)
    cxy = rng.uniform(0.05, 0.95, size=(B, N, 2)).astype(np.float32) * [W, H]
    wh = np.exp(rng.normal(4.0, 0.6, size=(B, N, 2))).astype(np.float32)
    wh = np.clip(wh, 8, [W * 0.5, H * 0.5])
    batch = {
        "video": rng.normal(size=(B, L, H, W, 3)).astype(np.float32),
        "boxes": np.concatenate([cxy - wh / 2, cxy + wh / 2], -1),
        "classes": rng.integers(0, 8, size=(B, N)).astype(np.int32),
        "active": (rng.uniform(size=(B, N)) < 0.1).astype(np.int64),
        "annotated_frame_idx": np.asarray([L - 1] * B, np.int32),
    }
    for key, d in [
        ("translation", 3), ("acceleration", 3), ("rotation", 4),
        ("rotation_rate", 3), ("speed", 1),
    ]:
        batch[key] = rng.normal(size=(B, L, d)).astype(np.float32)
    if os.environ.get("BENCH_HOST_BATCH", "0") != "1":
        import jax.numpy as jnp

        batch = {k: jnp.asarray(v) for k, v in batch.items()}

    detr_args = SpatioTemporalDETRArgs(
        num_classes=8, num_queries=128, lr_backbone=1e-4
    )
    model = build_flagship(detr_args)
    trainer = Trainer(
        model,
        detr_args,
        train_loader=FakeLoader(batch, iters),
        val_loaders={"val0": FakeLoader(batch, 1)},
        checkpoint_path="/tmp/bench_epoch_loop_ckpt",
        visualization_path="/tmp/bench_epoch_loop_vis",
        save_name="bench",
        category_dict={i: f"c{i}" for i in range(8)},
        checkpoint_epochs=False,
        wandb_config=WandBConfig(enabled=False),
        mixed_precision=True,
        print_interval=1000,
    )

    trainer._epoch = 2  # skip the epoch-1 grad audit: it is a separate
    # (blocking) program that would dominate a short measured epoch
    trainer._run_epoch("train", trainer._train_loader, training=True)  # compile
    t0 = time.perf_counter()
    trainer._run_epoch("train", trainer._train_loader, training=True)
    elapsed = time.perf_counter() - t0
    arm = (
        "blocking" if os.environ.get("FUTURE_OD_NO_PIPELINE") == "1"
        else "pipelined"
    )
    print(
        json.dumps(
            {
                "metric": f"epoch_loop_{arm}_b{B}_{H}x{W}_bf16",
                "value": round(B * iters / elapsed, 2),
                "unit": "clips/sec/chip",
                "iter_ms": round(elapsed / iters * 1e3, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
