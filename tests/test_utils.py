"""Utility tests: visualization, checkpoint atomicity, stats, profiling,
grain loader."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from future_od_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from future_od_tpu.utils.stats import AverageMeter
from future_od_tpu.utils.visualization import COLOURS, draw_boxes, visualize


class TestVisualization:
    def test_colour_cube(self):
        assert COLOURS.shape == (125, 3)
        assert COLOURS.min() == 0.0 and COLOURS.max() == 1.0

    def test_draw_boxes_outline_only(self):
        img = np.zeros((40, 60, 3), np.float32)
        out = draw_boxes(img, np.array([[10, 10, 30, 30]]), np.array([[1.0, 0, 0]]))
        # the reference paints the thickness band just OUTSIDE each edge
        assert out[8, 20, 0] > 0  # above the top edge
        assert out[20, 8, 0] > 0  # left of the left edge
        assert out[20, 20, 0] == 0  # interior untouched

    def test_visualize_writes_png(self, tmp_path, rng):
        img = rng.normal(size=(32, 48, 3)).astype(np.float32)
        path = str(tmp_path / "vis.png")
        visualize(img, np.array([0]), np.array([[5, 5, 20, 20]]), path, 9)
        assert os.path.exists(path) and os.path.getsize(path) > 0

    def test_visualize_float_scores_thresholded(self, tmp_path, rng):
        img = rng.normal(size=(32, 48, 3)).astype(np.float32)
        scores = np.array([[0.9, 0.1], [0.2, 0.3]], np.float32)  # second below thr
        path = str(tmp_path / "vis2.png")
        visualize(img, scores, np.array([[5, 5, 20, 20], [1, 1, 9, 9]]), path, 2)
        assert os.path.exists(path)

    def test_revert_normalization_uint8_branch_engages(self, rng):
        """Regression: uint8 frames (device-normalize batches) must take the
        /255 rescale, not the imagenet de-normalization — and the branch must
        survive callers that pass plain arrays (no pre-cast to float)."""
        from future_od_tpu.utils.visualization import (
            revert_imagenet_normalization,
        )

        u8 = rng.integers(0, 256, size=(8, 8, 3)).astype(np.uint8)
        out = revert_imagenet_normalization(u8)
        np.testing.assert_allclose(out, u8.astype(np.float32) / 255.0)
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_visualize_uint8_roundtrip(self, tmp_path, rng):
        """End-to-end through visualize(): a uint8 frame must come back as
        itself (PNG pixel values == input), proving no imagenet math was
        applied to 0-255 data."""
        import cv2

        from future_od_tpu.utils.visualization import visualize as vis_fn

        u8 = rng.integers(0, 256, size=(16, 16, 3)).astype(np.uint8)
        path = str(tmp_path / "vis_u8.png")
        vis_fn(u8, None, None, path, 9)
        back = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        # /255 then *255 in float32 truncates at most one level
        assert np.abs(back.astype(int) - u8.astype(int)).max() <= 1


class TestCheckpointUtils:
    def test_atomic_overwrite_and_meta(self, tmp_path):
        tree = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 2))}}
        save_checkpoint(str(tmp_path), "ck", tree, {"epoch": 3})
        tree2 = {"a": jnp.arange(4.0) * 2, "b": {"c": jnp.zeros((2, 2))}}
        save_checkpoint(str(tmp_path), "ck", tree2, {"epoch": 4})  # overwrite
        arrays, meta = load_checkpoint(str(tmp_path), "ck", target=tree)
        assert meta["epoch"] == 4
        np.testing.assert_allclose(arrays["a"], np.arange(4.0) * 2)
        assert not os.path.exists(str(tmp_path / "ck.tmp"))

    def test_missing_returns_none(self, tmp_path):
        assert load_checkpoint(str(tmp_path), "nope") is None

    def test_restore_uses_target_sharding_not_stored(self, tmp_path):
        """Regression: restore must place leaves per the TARGET, not replay
        the sharding recorded at save time. Without explicit restore_args,
        orbax reconstructs the saved sharding — which crashes with
        'sharding ... Got None' when the saving platform differs (observed:
        an axon-TPU-saved run checkpoint could not be opened for CPU eval)."""
        import jax

        dev0, dev1 = jax.devices()[0], jax.devices()[1]
        tree = {"w": jax.device_put(jnp.arange(6.0), dev0)}
        save_checkpoint(str(tmp_path), "ck", tree, {})
        target = {"w": jax.device_put(jnp.zeros(6), dev1)}
        arrays, _ = load_checkpoint(str(tmp_path), "ck", target=target)
        np.testing.assert_allclose(arrays["w"], np.arange(6.0))
        assert arrays["w"].devices() == {dev1}

    def test_stale_tmp_cleaned(self, tmp_path):
        os.makedirs(tmp_path / "ck.tmp")  # crashed previous save
        tree = {"a": jnp.ones(2)}
        save_checkpoint(str(tmp_path), "ck", tree, {})
        assert load_checkpoint(str(tmp_path), "ck", target=tree) is not None

    def test_async_save_commits_eagerly(self, tmp_path):
        """Async saves commit in the BACKGROUND once the array write
        finishes — durable without anyone calling wait() (the hard-preemption
        case, ADVICE r3 medium); wait() stays idempotent."""
        import time

        from future_od_tpu.utils.checkpoint import (
            load_checkpoint_meta,
            save_checkpoint_async,
        )

        tree = {"a": jnp.arange(3.0)}
        save_checkpoint(str(tmp_path), "ck", tree, {"epoch": 1})
        pending = save_checkpoint_async(
            str(tmp_path), "ck", {"a": jnp.arange(3.0) * 5}, {"epoch": 2}
        )
        # poll WITHOUT wait(): the background finalizer must commit on its own
        deadline = time.time() + 60
        while time.time() < deadline:
            meta = load_checkpoint_meta(str(tmp_path), "ck")
            if meta and meta.get("epoch") == 2:
                break
            time.sleep(0.05)
        assert load_checkpoint_meta(str(tmp_path), "ck")["epoch"] == 2
        pending.wait()
        pending.wait()  # idempotent
        arrays, meta = load_checkpoint(str(tmp_path), "ck", target=tree)
        assert meta["epoch"] == 2
        np.testing.assert_allclose(arrays["a"], np.arange(3.0) * 5)
        assert not os.path.exists(str(tmp_path / "ck.tmp"))

    def test_async_save_wait_retries_failed_commit(self, tmp_path):
        """A finalize that failed (e.g. meta write raced a disk error) must be
        retryable: wait() skips the already-closed checkpointer and re-runs
        the meta-write + rename (ADVICE r3 low)."""
        from future_od_tpu.utils.checkpoint import save_checkpoint_async

        tree = {"a": jnp.arange(4.0)}
        pending = save_checkpoint_async(str(tmp_path), "ck", tree, {"epoch": 7})
        pending.wait()
        # Simulate a failed commit after the checkpointer was closed: roll the
        # directory back to pre-rename state and clear the done flag.
        os.replace(str(tmp_path / "ck"), str(tmp_path / "ck.tmp"))
        pending._done = False
        assert pending._ckptr is None  # closed exactly once
        pending.wait()  # must NOT touch the closed checkpointer
        arrays, meta = load_checkpoint(str(tmp_path), "ck", target=tree)
        assert meta["epoch"] == 7
        np.testing.assert_allclose(arrays["a"], np.arange(4.0))


class TestStats:
    def test_average_meter_epochs(self):
        m = AverageMeter()
        m.update(1.0)
        m.update(3.0)
        assert m.avg == 2.0
        m.new_epoch()
        assert m.history == [2.0] and m.count == 0
        d = m.state_dict()
        m2 = AverageMeter()
        m2.load_state_dict(d)
        assert m2.history == [2.0]


class TestProfiling:
    def test_step_timer(self):
        from future_od_tpu.utils.profiling import StepTimer, sync

        timer = StepTimer()
        out = timer.timed(lambda: jnp.ones(4) * 2)
        np.testing.assert_allclose(out, 2.0)
        s = timer.summary()
        assert s["steps"] == 1 and s["mean_s"] >= 0
        sync({"x": jnp.ones(2)})  # no crash


class TestGrainLoader:
    def test_contract(self):
        pytest.importorskip("grain")
        from future_od_tpu.data.grain_loader import GrainLoader
        from future_od_tpu.data.synthetic import SyntheticClipDataset

        ds = SyntheticClipDataset(num_samples=8)
        loader = GrainLoader(ds, batch_size=4, shuffle=True, num_workers=0,
                             device_put=False)
        batches = list(loader)
        assert len(batches) == 2
        assert batches[0]["video"].shape[0] == 4
