"""Host pipeline tests: joint transforms, synthetic dataset, loader."""
import numpy as np
import pytest

from future_od_tpu.data.loader import Loader, collate
from future_od_tpu.data.synthetic import SyntheticClipDataset
from future_od_tpu.data.transforms import (
    JointCenterCrop,
    JointCompose,
    JointHorizontalFlip,
    JointRandomCrop,
    JointResize,
    RandomSelect,
    RandomSizedCrop,
    SizeFilter,
    remap_and_normalize,
)


def make_clip(rng, L=2, H=40, W=60, n=3):
    images = rng.normal(size=(L, H, W, 3)).astype(np.float32)
    boxes = np.array([[5, 5, 20, 20], [30, 10, 50, 30], [55, 35, 59, 39]], np.float32)[:n]
    classes = np.arange(n)
    return images, boxes, classes


class TestTransforms:
    def test_resize_scales_boxes(self, rng):
        images, boxes, classes = make_clip(rng)
        out_im, out_boxes, _ = JointResize((80, 120))(images, boxes, classes)
        assert out_im.shape == (2, 80, 120, 3)
        np.testing.assert_allclose(out_boxes, boxes * 2.0)

    def test_center_crop_shifts_and_clamps(self, rng):
        images, boxes, classes = make_clip(rng)
        out_im, out_boxes, out_cls = JointCenterCrop((20, 40))(images, boxes, classes)
        assert out_im.shape == (2, 20, 40, 3)
        # crop origin (10, 10): box0 [5,5,20,20] -> [-5,-5,10,10] -> clamp [0,0,10,10]
        np.testing.assert_allclose(out_boxes[0], [0, 0, 10, 10])
        # box2 at [55,35,59,39] is fully outside the crop -> removed
        assert len(out_cls) == 2

    def test_hflip_boxes(self, rng):
        images, boxes, classes = make_clip(rng, n=1)
        out_im, out_boxes, _ = JointHorizontalFlip(p=1.0)(images, boxes, classes)
        W = images.shape[2]
        np.testing.assert_allclose(out_boxes[0], [W - 20, 5, W - 5, 20])
        np.testing.assert_allclose(out_im[:, :, 0], images[:, :, -1])

    def test_hflip_probability_zero(self, rng):
        images, boxes, classes = make_clip(rng, n=1)
        out_im, out_boxes, _ = JointHorizontalFlip(p=0.0)(images, boxes, classes)
        np.testing.assert_allclose(out_boxes, boxes)

    def test_random_sized_crop_keeps_shapes_consistent(self, rng):
        images, boxes, classes = make_clip(rng)
        out_im, out_boxes, out_cls = RandomSizedCrop(0.5, 1.0)(images, boxes, classes)
        assert out_im.ndim == 4 and len(out_boxes) == len(out_cls)
        h, w = out_im.shape[1:3]
        assert (out_boxes[:, 0::2] <= w).all() and (out_boxes[:, 1::2] <= h).all()

    def test_size_filter(self, rng):
        images, boxes, classes = make_clip(rng)
        # 40x60 image; min_size 0.05 -> area > 120: keeps [15x15=225] and
        # [20x20=400], drops [4x4=16]
        _, out_boxes, _ = SizeFilter(0.05)(images, boxes, classes)
        assert len(out_boxes) == 2

    def test_random_select(self, rng):
        images, boxes, classes = make_clip(rng)
        t = RandomSelect(
            JointCompose([JointResize((80, 120))]), JointCompose([]), p=1.0
        )
        out_im, _, _ = t(images, boxes, classes)
        assert out_im.shape[1] == 80

    def test_remap_normalize_roundtrip(self):
        u8 = np.full((1, 4, 4, 3), 255, np.uint8)
        out = remap_and_normalize(u8)
        mean = np.array([0.485, 0.456, 0.406])
        std = np.array([0.229, 0.224, 0.225])
        np.testing.assert_allclose(out[0, 0, 0], (1.0 - mean) / std, rtol=1e-5)


class TestSynthetic:
    def test_contract(self):
        ds = SyntheticClipDataset(num_samples=4)
        s = ds[0]
        L, (H, W) = ds.num_frames, ds.image_size
        assert s["video"].shape == (L, H, W, 3)
        assert s["boxes"].shape == (256, 4) and s["active"].shape == (256,)
        assert s["translation"].shape == (L, 3) and s["rotation"].shape == (L, 4)
        assert s["temporal_offsets"].shape == (L,)
        assert int(s["annotated_frame_idx"]) == L - 1
        assert s["active"].sum() >= 1

    def test_deterministic(self):
        ds = SyntheticClipDataset(num_samples=4)
        a, b = ds[1], ds[1]
        np.testing.assert_allclose(a["video"], b["video"])
        np.testing.assert_allclose(a["boxes"], b["boxes"])

    def test_future_frame_has_no_boxes_drawn(self):
        # the annotated (last) frame must NOT contain the rendered rectangles:
        # the model has to extrapolate, not detect
        ds = SyntheticClipDataset(num_samples=2)
        s = ds[0]
        past, future = s["video"][0], s["video"][-1]
        # variance of the future frame is pure noise; past frames contain
        # large flat rectangles -> noticeably different structure
        assert np.abs(future.std() - s["video"][1].std()) < 0.5  # sanity
        assert not np.allclose(past, future)


class TestLoader:
    def test_batching_and_contract(self):
        ds = SyntheticClipDataset(num_samples=10)
        loader = Loader(ds, batch_size=4, shuffle=True, device_put=False)
        batches = list(loader)
        assert len(batches) == 2  # drop_last
        b = batches[0]
        assert b["video"].shape[0] == 4
        assert b["annotated_frame_idx"].shape == (4,)
        assert isinstance(b["idf"], list) and len(b["idf"]) == 4

    def test_epoch_shuffling_differs(self):
        ds = SyntheticClipDataset(num_samples=16)
        loader = Loader(ds, batch_size=8, shuffle=True, device_put=False)
        loader.set_epoch(0)
        first = [b["idf"] for b in loader]
        loader.set_epoch(1)
        second = [b["idf"] for b in loader]
        assert first != second

    def test_val_order_fixed(self):
        ds = SyntheticClipDataset(num_samples=16)
        l1 = Loader(ds, batch_size=8, shuffle=False, seed=123, device_put=False)
        l2 = Loader(ds, batch_size=8, shuffle=False, seed=123, device_put=False)
        assert [b["idf"] for b in l1] == [b["idf"] for b in l2]

    def test_worker_exception_propagates(self):
        class Bad:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                raise RuntimeError("boom")

        loader = Loader(Bad(), batch_size=2, device_put=False)
        with pytest.raises(RuntimeError, match="boom"):
            list(loader)


class TestLoaderSelection:
    """--loader thread|grain backend selection (reference counterpart: the
    16-process torch DataLoader, runs/_loader.py:106-123)."""

    def test_make_loader_backends(self):
        from argparse import Namespace

        from runs._loader import _make_loader
        from future_od_tpu.data.grain_loader import GrainLoader
        from future_od_tpu.data.loader import Loader

        ds = SyntheticClipDataset(num_samples=4, num_frames=1, image_size=(64, 96), seed=0)
        thread = _make_loader(
            Namespace(loader="thread"), ds, batch_size=2, num_workers=1
        )
        assert isinstance(thread, Loader)
        g = _make_loader(Namespace(loader="grain"), ds, batch_size=2, num_workers=0)
        assert isinstance(g, GrainLoader)

    def test_grain_loader_batch_contract(self):
        pytest.importorskip("grain")
        from future_od_tpu.data.grain_loader import GrainLoader

        ds = SyntheticClipDataset(num_samples=4, num_frames=2, image_size=(64, 96), seed=0)
        loader = GrainLoader(ds, batch_size=2, num_workers=0, device_put=False)
        batches = list(loader)
        assert len(batches) == 2
        batch = batches[0]
        assert batch["video"].shape == (2, 2, 64, 96, 3)
        for key in ("boxes", "classes", "active", "annotated_frame_idx"):
            assert key in batch


class TestLoaderSpaceToDepth:
    def test_packing_matches_model_op(self):
        from future_od_tpu.data.loader import Loader
        from future_od_tpu.models.resnet import space_to_depth

        ds = SyntheticClipDataset(num_samples=2, num_frames=2, image_size=(64, 96), seed=0)
        plain = next(iter(Loader(ds, batch_size=2, device_put=False, num_workers=1)))
        packed = next(iter(Loader(
            ds, batch_size=2, device_put=False, num_workers=1, space_to_depth=True
        )))
        assert packed["video"].shape == (2, 2, 32, 48, 12)
        import jax.numpy as jnp

        want = np.asarray(space_to_depth(jnp.asarray(
            plain["video"].reshape(4, 64, 96, 3)
        ))).reshape(2, 2, 32, 48, 12)
        np.testing.assert_allclose(packed["video"], want, atol=0)

    def test_host_pack_helper_handles_batch_dims(self):
        """host_space_to_depth is the single pack-layout definition shared
        by Loader and bench.py — it must accept any leading dims and agree
        with the 4-dim path."""
        from future_od_tpu.data.loader import host_space_to_depth

        rng = np.random.default_rng(0)
        v = rng.normal(size=(3, 2, 8, 12, 3)).astype(np.float32)
        out5 = host_space_to_depth(v)
        assert out5.shape == (3, 2, 4, 6, 12)
        out4 = np.stack([host_space_to_depth(v[i]) for i in range(3)])
        np.testing.assert_array_equal(out5, out4)

    def test_video_hw_packed_layouts(self):
        from future_od_tpu.ops.misc import video_hw

        assert video_hw(np.zeros((1, 2, 8, 12, 3))) == (8, 12)
        assert video_hw(np.zeros((1, 2, 8, 12, 12))) == (16, 24)
        # 4x4 (s2d4) packing: 48 channels -> 4x the stored dims
        assert video_hw(np.zeros((1, 2, 8, 12, 48))) == (32, 48)
