"""NuScenes dataset logic tests with a mocked devkit.

The sweep-walking by timestamp offsets (nu_scenes.py:183-213 in the reference)
and the CAN-bus nearest-utime join are the fiddly parts of the data layer
(SURVEY.md §7 hard part 6). These tests fabricate a devkit-shaped object graph
(sample_data prev/next chains with microsecond timestamps, CAN pose streams)
and verify frame selection, offset filtering, and IMU assembly without the
real devkit or data.
"""
import sys
import types

import numpy as np
import pytest


def install_fake_devkit(monkeypatch, timestamps_us, can_utimes):
    """Build fake `nuscenes` modules exposing one scene with a chain of
    sample_data records at the given timestamps (first entry = keyframe)."""
    records = {}
    n = len(timestamps_us)
    for i, ts in enumerate(timestamps_us):
        records[f"sd{i}"] = {
            "token": f"sd{i}",
            "timestamp": ts,
            "prev": f"sd{i-1}" if i > 0 else "",
            "next": f"sd{i+1}" if i < n - 1 else "",
            "sample_token": "sample0",
            "ego_pose_token": f"ep{i}",
            "filename": f"img{i}.jpg",
        }

    class FakeNuScenes:
        def __init__(self, version, dataroot):
            self.version = version
            self.dataroot = dataroot
            self.sample = [
                {"token": "sample0", "scene_token": "scene0",
                 "data": {"CAM_FRONT": "sd_key"}}
            ]

        def get(self, table, token):
            if table == "sample_data":
                return records[token]
            if table == "scene":
                return {"name": "scene-0001", "log_token": "log0"}
            if table == "log":
                return {"logfile": "n008-2018-08-01-12-00-00"}
            if table == "ego_pose":
                idx = int(token[2:])
                return {
                    "translation": [float(idx), 0.0, 0.0],
                    "rotation": [1.0, 0.0, 0.0, 0.0],
                }
            if table == "sample":
                return {"token": "sample0", "scene_token": "scene0"}
            raise KeyError((table, token))

    class FakeCanBus:
        can_blacklist = []

        def __init__(self, dataroot):
            pass

        def get_messages(self, scene_name, message_name):
            return [
                {
                    "utime": ut,
                    "translation": [float(j), 0.0, 0.0],
                    "accel": [0.1 * j, 0.0, 0.0],
                    "rotation": [1.0, 0.0, 0.0, 0.0],
                    "rotation_rate": [0.0, 0.0, 0.0],
                    "vel": [float(j), 0.0, 0.0],
                }
                for j, ut in enumerate(can_utimes)
            ]

    nusc_mod = types.ModuleType("nuscenes")
    nusc_mod.NuScenes = FakeNuScenes
    can_mod = types.ModuleType("nuscenes.can_bus.can_bus_api")
    can_mod.NuScenesCanBus = FakeCanBus
    can_pkg = types.ModuleType("nuscenes.can_bus")
    splits_mod = types.ModuleType("nuscenes.utils.splits")
    splits_mod.create_splits_scenes = lambda: {"mini_train": ["scene-0001"]}
    utils_pkg = types.ModuleType("nuscenes.utils")
    for name, mod in [
        ("nuscenes", nusc_mod), ("nuscenes.can_bus", can_pkg),
        ("nuscenes.can_bus.can_bus_api", can_mod),
        ("nuscenes.utils", utils_pkg), ("nuscenes.utils.splits", splits_mod),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)
    return records


def make_dataset(monkeypatch, tmp_path, frame_offsets, filter_offsets=None,
                 timestamps=None, can_utimes=None):
    """Keyframe sd4 at t=4.0s with sweeps every 0.5s back to t=2.0s."""
    import json
    import os

    if timestamps is None:
        # sd0..sd4: 2.0, 2.5, 3.0, 3.5, 4.0 seconds; keyframe = sd4
        timestamps = [2_000_000, 2_500_000, 3_000_000, 3_500_000, 4_000_000]
    if can_utimes is None:
        can_utimes = [1_900_000, 2_400_000, 3_100_000, 3_600_000, 3_950_000]
    records = install_fake_devkit(monkeypatch, timestamps, can_utimes)
    records["sd_key"] = records[f"sd{len(timestamps) - 1}"]

    os.makedirs(tmp_path / "v1.0-mini", exist_ok=True)
    with open(tmp_path / "v1.0-mini" / "image_annotations.json", "w") as f:
        json.dump(
            [
                {
                    "sample_data_token": records["sd_key"]["token"],
                    "category_name": "vehicle.car",
                    "bbox_corners": [10.0, 10.0, 50.0, 50.0],
                }
            ],
            f,
        )

    from future_od_tpu.data import nu_scenes as ns

    return ns.NuScenesDataset(
        root_path=str(tmp_path),
        split="mini_train",
        front_camera_only=True,
        frame_offsets=frame_offsets,
        filter_offsets=filter_offsets,
    )


class TestSweepWalking:
    def test_numeric_offsets_pick_exact_sweeps(self, monkeypatch, tmp_path):
        ds = make_dataset(monkeypatch, tmp_path, frame_offsets=[-1.0, -0.5, 0])
        assert len(ds.samples) == 1
        offsets = list(ds.samples[0].keys())
        assert offsets == [-1.0, -0.5, 0.0]
        tokens = [sd["token"] for sd in ds.samples[0].values()]
        assert tokens == ["sd2", "sd3", "sd4"]

    def test_prev_offset_takes_adjacent_sweep(self, monkeypatch, tmp_path):
        ds = make_dataset(monkeypatch, tmp_path, frame_offsets=["prev", "prev", 0])
        offsets = list(ds.samples[0].keys())
        # two immediately preceding sweeps: -1.0s and -0.5s
        assert offsets == [-1.0, -0.5, 0.0]
        tokens = [sd["token"] for sd in ds.samples[0].values()]
        assert tokens == ["sd2", "sd3", "sd4"]

    def test_missing_offset_drops_sample(self, monkeypatch, tmp_path):
        # -3.0s doesn't exist in the chain -> the sample is skipped entirely
        ds = make_dataset(monkeypatch, tmp_path, frame_offsets=[-3.0, -0.5, 0])
        assert len(ds.samples) == 0

    def test_filter_offsets_independent_of_frame_offsets(self, monkeypatch, tmp_path):
        # frame offsets exist, but the filter demands a missing -3.0s frame
        ds = make_dataset(
            monkeypatch, tmp_path, frame_offsets=[-0.5, 0],
            filter_offsets=[-3.0, -0.5, 0],
        )
        assert len(ds.samples) == 0


class TestSweepWalkingInvariants:
    def test_mixed_prev_and_numeric_offsets(self, monkeypatch, tmp_path):
        # ["prev", -0.5, 0]: -0.5 matches exactly (sd3), then "prev" takes
        # the sweep immediately before that match (sd2).
        ds = make_dataset(monkeypatch, tmp_path, frame_offsets=["prev", -0.5, 0])
        offsets = list(ds.samples[0].keys())
        assert offsets == [-1.0, -0.5, 0.0]
        tokens = [sd["token"] for sd in ds.samples[0].values()]
        assert tokens == ["sd2", "sd3", "sd4"]

    def test_overshoot_aborts_side(self, monkeypatch, tmp_path):
        # -0.75 s falls between sweeps (-1.0 and -0.5): the backward search
        # overshoots without an exact hit, so the sample is dropped even
        # though a farther -1.0 sweep exists.
        ds = make_dataset(monkeypatch, tmp_path, frame_offsets=[-0.75, 0])
        assert len(ds.samples) == 0

    def test_future_offset_matches_forward(self, monkeypatch, tmp_path):
        # keyframe = sd2 (t=3.0s) via a custom key record: +0.5 matches sd3
        import json, os
        records = install_fake_devkit(
            monkeypatch,
            [2_000_000, 2_500_000, 3_000_000, 3_500_000, 4_000_000],
            [3_000_000],
        )
        records["sd_key"] = records["sd2"]
        os.makedirs(tmp_path / "v1.0-mini", exist_ok=True)
        with open(tmp_path / "v1.0-mini" / "image_annotations.json", "w") as f:
            json.dump([], f)
        from future_od_tpu.data import nu_scenes as ns

        ds = ns.NuScenesDataset(
            root_path=str(tmp_path), split="mini_train", front_camera_only=True,
            frame_offsets=[-0.5, 0, 0.5],
        )
        tokens = [sd["token"] for sd in ds.samples[0].values()]
        assert tokens == ["sd1", "sd2", "sd3"]
        assert list(ds.samples[0].keys()) == [-0.5, 0.0, 0.5]

    def test_blacklisted_scene_removed(self, monkeypatch, tmp_path):
        # scene-0001 in the CAN blacklist -> no samples survive
        import json, os
        records = install_fake_devkit(
            monkeypatch,
            [2_000_000, 2_500_000, 3_000_000, 3_500_000, 4_000_000],
            [2_000_000],
        )
        records["sd_key"] = records["sd4"]
        os.makedirs(tmp_path / "v1.0-mini", exist_ok=True)
        with open(tmp_path / "v1.0-mini" / "image_annotations.json", "w") as f:
            json.dump([], f)
        import sys as _sys

        _sys.modules["nuscenes.can_bus.can_bus_api"].NuScenesCanBus.can_blacklist = [1]
        from future_od_tpu.data import nu_scenes as ns

        try:
            ds = ns.NuScenesDataset(
                root_path=str(tmp_path), split="mini_train",
                front_camera_only=True, frame_offsets=[-0.5, 0],
            )
        finally:
            _sys.modules["nuscenes.can_bus.can_bus_api"].NuScenesCanBus.can_blacklist = []
        assert len(ds) == 0


class TestCanBusJoin:
    def test_nearest_utime_tie_prefers_earlier_message(self, monkeypatch, tmp_path):
        # keyframe t=4.0s exactly between utimes 3.9s and 4.1s -> the earlier
        # message wins (reference argmin picks the first minimal index)
        ds = make_dataset(
            monkeypatch, tmp_path, frame_offsets=[-1.0, -0.5, 0],
            can_utimes=[2_500_000, 3_000_000, 3_500_000, 3_900_000, 4_100_000],
        )
        assert ds.imus["sd4"]["vel"][0] == 3.0  # index 3 = utime 3.9s


    def test_nearest_utime_pose(self, monkeypatch, tmp_path):
        ds = make_dataset(monkeypatch, tmp_path, frame_offsets=[-1.0, -0.5, 0])
        # frame at 3.0s (sd2): nearest CAN utime is 3.1s (index 2)
        imu = ds.imus["sd2"]
        assert imu["vel"][0] == 2.0
        # keyframe at 4.0s: nearest is 3.95s (index 4)
        assert ds.imus["sd4"]["vel"][0] == 4.0

    def test_getitem_contract(self, monkeypatch, tmp_path):
        import cv2

        # write a real tiny jpeg for each frame
        for i in range(5):
            cv2.imwrite(str(tmp_path / f"img{i}.jpg"), np.zeros((32, 48, 3), np.uint8))
        from future_od_tpu.data.transforms import JointCompose, JointResize

        ds = make_dataset(monkeypatch, tmp_path, frame_offsets=[-1.0, -0.5, 0])
        ds.joint_transform = JointCompose([JointResize((32, 48))])
        sample = ds[0]
        assert sample["video"].shape == (3, 32, 48, 3)
        assert sample["temporal_offsets"].tolist() == [-1.0, -0.5, 0.0]
        assert int(sample["annotated_frame_idx"]) == 2
        assert sample["active"].sum() == 1
        # translation relative to the first frame
        np.testing.assert_allclose(sample["translation"][0], [0, 0, 0])


class TestNightFilter:
    def test_daytime_scene_skipped(self, monkeypatch, tmp_path):
        # logfile hour 12 -> daytime -> sample skipped under --night
        import json, os
        records = install_fake_devkit(
            monkeypatch,
            [2_000_000, 2_500_000, 3_000_000, 3_500_000, 4_000_000],
            [2_000_000],
        )
        records["sd_key"] = records["sd4"]
        os.makedirs(tmp_path / "v1.0-mini", exist_ok=True)
        with open(tmp_path / "v1.0-mini" / "image_annotations.json", "w") as f:
            json.dump([], f)
        from future_od_tpu.data import nu_scenes as ns

        ds = ns.NuScenesDataset(
            root_path=str(tmp_path), split="mini_train", night=True,
            front_camera_only=True, frame_offsets=[-0.5, 0],
        )
        assert len(ds) == 0
