"""File-level dataset fixtures: drive the real dataset classes from disk.

Round-2 VERDICT next #6: all previous dataset tests mocked the devkit at the
OBJECT boundary (hand-built python records). Here a tiny fake archive is
written to disk — real JPEG image files plus devkit-shaped JSON tables — and
the devkit itself is stubbed at the FILE boundary: the stub classes load
their tables from `<dataroot>/<version>/*.json` exactly like the real
devkits do (token-indexed tables, key-camera reverse index, CAN message
files under can_bus/). `NuScenesDataset`/`NuImagesDataset.__getitem__` then
run end-to-end: JPEG decode, sweep matching, CAN join, joint transform,
dense targets, IMU — returning the full SURVEY §2.6 batch-dict contract.

Reference behaviors exercised: /root/reference/future_od/datasets/
nu_scenes.py:78-351 and nu_images.py:66-272.
"""
import json
import os
import sys
import types

import numpy as np
import pytest

MICRO = 1_000_000  # timestamps are microseconds in both devkits


# ---------------------------------------------------------------------------
# File-boundary devkit stubs: same table-loading behavior as the real devkits
# ---------------------------------------------------------------------------


class _TableDevkit:
    """Loads named JSON tables from <dataroot>/<version>/ and indexes them by
    token — the core of both real devkits' __init__."""

    TABLES = ()

    def __init__(self, version: str, dataroot: str):
        self.version = version
        self.dataroot = dataroot
        self._index = {}
        for table in self.TABLES:
            with open(os.path.join(dataroot, version, table + ".json")) as f:
                records = json.load(f)
            setattr(self, table, records)
            self._index[table] = {r["token"]: r for r in records}

    def get(self, table: str, token: str):
        return self._index[table][token]


class FileNuScenes(_TableDevkit):
    TABLES = ("sample", "sample_data", "ego_pose", "scene", "log",
              "sensor", "calibrated_sensor")

    def __init__(self, version: str, dataroot: str):
        super().__init__(version, dataroot)
        # the real devkit reverse-indexes keyframe sample_datas into
        # sample["data"][channel] during table post-processing
        for s in self.sample:
            s.setdefault("data", {})
        for sd in self.sample_data:
            if not sd["is_key_frame"]:
                continue
            cs = self.get("calibrated_sensor", sd["calibrated_sensor_token"])
            channel = self.get("sensor", cs["sensor_token"])["channel"]
            self.get("sample", sd["sample_token"])["data"][channel] = sd["token"]


class FileNuScenesCanBus:
    """Reads can_bus/<scene>_<message>.json like the real CAN API."""

    def __init__(self, dataroot: str):
        self.dataroot = dataroot
        self.can_blacklist = []

    def get_messages(self, scene_name: str, message_name: str):
        path = os.path.join(
            self.dataroot, "can_bus", f"{scene_name}_{message_name}.json"
        )
        with open(path) as f:
            return json.load(f)


class FileNuImages(_TableDevkit):
    TABLES = ("sample", "sample_data", "ego_pose", "log",
              "sensor", "calibrated_sensor", "object_ann")

    def get_sample_content(self, sample_token: str):
        # the real devkit returns the sample's 13 sample_datas in time order
        sds = [
            sd for sd in self.sample_data if sd["sample_token"] == sample_token
        ]
        sds.sort(key=lambda sd: sd["timestamp"])
        return [sd["token"] for sd in sds]


def install_file_devkits(monkeypatch):
    """Install the file-boundary stubs under the real import names (the real
    packages are absent in this environment)."""
    nusc = types.ModuleType("nuscenes")
    nusc.NuScenes = FileNuScenes
    can_api = types.ModuleType("nuscenes.can_bus.can_bus_api")
    can_api.NuScenesCanBus = FileNuScenesCanBus
    can_pkg = types.ModuleType("nuscenes.can_bus")
    splits = types.ModuleType("nuscenes.utils.splits")
    splits.create_splits_scenes = lambda: {
        "mini_train": ["scene-0001"],
        "mini_val": ["scene-0001"],
        "train": ["scene-0001"],
        "val": [],
    }
    utils_pkg = types.ModuleType("nuscenes.utils")
    for name, mod in [
        ("nuscenes", nusc),
        ("nuscenes.can_bus", can_pkg),
        ("nuscenes.can_bus.can_bus_api", can_api),
        ("nuscenes.utils", utils_pkg),
        ("nuscenes.utils.splits", splits),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)

    nuim = types.ModuleType("nuimages")
    nuim.NuImages = FileNuImages
    monkeypatch.setitem(sys.modules, "nuimages", nuim)


# ---------------------------------------------------------------------------
# On-disk archive builders
# ---------------------------------------------------------------------------

IMG_H, IMG_W = 90, 160


def _write_jpeg(path, seed):
    import cv2

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (IMG_H, IMG_W, 3), np.uint8)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    assert cv2.imwrite(path, img)


def build_nuscenes_archive(root):
    """One scene, one CAM_FRONT chain of 9 sweeps at 0.25 s spacing; the last
    sweep is the annotated keyframe, so offsets [-1.0, -0.5, 0] resolve to
    chain indices 4, 6, 8."""
    version_dir = os.path.join(root, "v1.0-mini")
    os.makedirs(version_dir, exist_ok=True)
    n = 9
    t0 = 10_000 * MICRO

    sample_data, ego_pose = [], []
    for i in range(n):
        filename = f"sweeps/CAM_FRONT/frame{i}.jpg"
        _write_jpeg(os.path.join(root, filename), seed=i)
        sample_data.append({
            "token": f"sd{i}",
            "sample_token": "sample0",
            "ego_pose_token": f"ep{i}",
            "calibrated_sensor_token": "cs0",
            "timestamp": t0 + int(i * 0.25 * MICRO),
            "prev": f"sd{i - 1}" if i > 0 else "",
            "next": f"sd{i + 1}" if i < n - 1 else "",
            "is_key_frame": i == n - 1,
            "filename": filename,
        })
        ego_pose.append({
            "token": f"ep{i}",
            "translation": [float(i), 0.0, 0.0],
            "rotation": [1.0, 0.0, 0.0, 0.0],
            "timestamp": t0 + int(i * 0.25 * MICRO),
        })

    tables = {
        "sample": [{
            "token": "sample0",
            "scene_token": "scene0",
            "timestamp": t0 + int((n - 1) * 0.25 * MICRO),
        }],
        "sample_data": sample_data,
        "ego_pose": ego_pose,
        "scene": [{
            "token": "scene0", "name": "scene-0001", "log_token": "log0",
        }],
        "log": [{"token": "log0", "logfile": "n008-2018-08-01-12-00-00"}],
        "sensor": [{"token": "s0", "channel": "CAM_FRONT"}],
        "calibrated_sensor": [{"token": "cs0", "sensor_token": "s0"}],
    }
    for name, records in tables.items():
        with open(os.path.join(version_dir, name + ".json"), "w") as f:
            json.dump(records, f)

    # 2D boxes pre-exported for the keyframe (nu_scenes.py:142-148): one car,
    # one ignore-class stroller, one discarded traffic cone
    annos = [
        {"sample_data_token": f"sd{n - 1}", "category_name": "vehicle.car",
         "bbox_corners": [10.0, 10.0, 60.0, 50.0]},
        {"sample_data_token": f"sd{n - 1}",
         "category_name": "human.pedestrian.stroller",
         "bbox_corners": [80.0, 20.0, 100.0, 60.0]},
        {"sample_data_token": f"sd{n - 1}",
         "category_name": "movable_object.trafficcone",
         "bbox_corners": [0.0, 0.0, 5.0, 5.0]},
    ]
    with open(os.path.join(version_dir, "image_annotations.json"), "w") as f:
        json.dump(annos, f)

    # CAN pose stream at 10 ms cadence covering the chain (jittered so the
    # nearest-utime join actually has to pick)
    can_dir = os.path.join(root, "can_bus")
    os.makedirs(can_dir, exist_ok=True)
    poses = []
    t = t0 - MICRO
    while t < t0 + int(n * 0.25 * MICRO):
        poses.append({
            "utime": t + 1234,
            "accel": [0.1, 0.2, 9.8],
            "rotation_rate": [0.0, 0.0, 0.01],
            "vel": [float(len(poses) % 7), 0.0, 0.0],
            "pos": [0.0, 0.0, 0.0],
            "orientation": [1.0, 0.0, 0.0, 0.0],
        })
        t += 10_000
    with open(os.path.join(can_dir, "scene-0001_pose.json"), "w") as f:
        json.dump(poses, f)
    return root


def build_nuimages_archive(root):
    """One 13-frame clip with the annotated keyframe at index 6."""
    version_dir = os.path.join(root, "v1.0-mini")
    os.makedirs(version_dir, exist_ok=True)
    n = 13
    t0 = 20_000 * MICRO

    sample_data, ego_pose = [], []
    for i in range(n):
        filename = f"samples/CAM_FRONT/img{i}.jpg"
        _write_jpeg(os.path.join(root, filename), seed=100 + i)
        sample_data.append({
            "token": f"sd{i}",
            "sample_token": "sample0",
            "ego_pose_token": f"ep{i}",
            "calibrated_sensor_token": "cs0",
            "timestamp": t0 + i * MICRO // 2,
            "filename": filename,
        })
        ego_pose.append({
            "token": f"ep{i}",
            "translation": [float(i), 0.0, 0.0],
            "rotation": [1.0, 0.0, 0.0, 0.0],
            "acceleration": [0.0, 0.1, 9.8],
            "rotation_rate": [0.0, 0.0, 0.0],
            "speed": float(i),
        })

    tables = {
        "sample": [{
            "token": "sample0",
            "key_camera_token": "sd6",
            "log_token": "log0",
        }],
        "sample_data": sample_data,
        "ego_pose": ego_pose,
        "log": [{"token": "log0", "logfile": "n008-2018-08-01-12-00-00"}],
        "sensor": [{"token": "s0", "channel": "CAM_FRONT"}],
        "calibrated_sensor": [{"token": "cs0", "sensor_token": "s0"}],
        "object_ann": [
            {"token": "ann0", "sample_data_token": "sd6",
             "category_token": "fd69059b62a3469fbaef25340c0eab7f",  # car
             "bbox": [10.0, 10.0, 60.0, 50.0]},
            {"token": "ann1", "sample_data_token": "sd6",
             "category_token": "6a5888777ca14867a8aee3fe539b56c4",  # stroller
             "bbox": [80.0, 20.0, 100.0, 60.0]},
            {"token": "ann2", "sample_data_token": "sd6",
             "category_token": "85abebdccd4d46c7be428af5a6173947",  # cone
             "bbox": [0.0, 0.0, 5.0, 5.0]},
        ],
    }
    for name, records in tables.items():
        with open(os.path.join(version_dir, name + ".json"), "w") as f:
            json.dump(records, f)
    return root


BATCH_CONTRACT_KEYS = {
    "video", "boxes", "classes", "active", "annotated_frame_idx",
    "ignore_boxes", "weather", "sun_elevation", "translation",
    "acceleration", "rotation", "rotation_rate", "speed", "idf",
}


class TestNuScenesFromDisk:
    def test_getitem_full_contract(self, monkeypatch, tmp_path):
        install_file_devkits(monkeypatch)
        build_nuscenes_archive(str(tmp_path))
        from future_od_tpu.data import nu_scenes
        from future_od_tpu.data.transforms import JointCompose, JointResize

        ds = nu_scenes.NuScenesDataset(
            root_path=str(tmp_path),
            split="mini_train",
            front_camera_only=True,
            frame_offsets=[-1.0, -0.5, 0],
            joint_transform=JointCompose([JointResize((64, 128))]),
        )
        assert len(ds) == 1
        s = ds[0]
        assert BATCH_CONTRACT_KEYS | {"temporal_offsets"} <= set(s)
        assert s["video"].shape == (3, 64, 128, 3)
        assert s["video"].dtype == np.float32
        np.testing.assert_allclose(
            s["temporal_offsets"], [-1.0, -0.5, 0.0], atol=1e-6
        )
        assert int(s["annotated_frame_idx"]) == 2
        # dense targets: the car is active; the stroller is an ignore box;
        # the traffic cone was discarded at annotation indexing
        assert int(s["active"].sum()) == 1
        assert float(np.abs(s["ignore_boxes"]).sum()) > 0
        car = s["boxes"][np.asarray(s["active"], bool)]
        # JointResize (90,160) -> (64,128): x scaled by 0.8, y by 64/90
        np.testing.assert_allclose(
            car[0], [10 * 0.8, 10 * 64 / 90, 60 * 0.8, 50 * 64 / 90], rtol=1e-5
        )
        # IMU: ego translation relative to the first selected frame; frames
        # are chain indices 4, 6, 8 whose ego x = index
        np.testing.assert_allclose(s["translation"][:, 0], [0.0, 2.0, 4.0])
        np.testing.assert_allclose(s["acceleration"][0], [0.1, 0.2, 9.8])
        # decoded pixels really come from the JPEG files on disk
        assert float(np.std(s["video"])) > 0.1

    def test_missing_sweeps_skip_sample(self, monkeypatch, tmp_path):
        install_file_devkits(monkeypatch)
        build_nuscenes_archive(str(tmp_path))
        from future_od_tpu.data import nu_scenes
        from future_od_tpu.data.transforms import JointCompose, JointResize

        # -3.0 s precedes the chain head: the sample must be skipped
        ds = nu_scenes.NuScenesDataset(
            root_path=str(tmp_path),
            split="mini_train",
            front_camera_only=True,
            frame_offsets=[-3.0, -0.5, 0],
            joint_transform=JointCompose([JointResize((64, 128))]),
        )
        assert len(ds) == 0


class TestNuImagesFromDisk:
    def test_getitem_full_contract(self, monkeypatch, tmp_path):
        install_file_devkits(monkeypatch)
        build_nuimages_archive(str(tmp_path))
        from future_od_tpu.data import nu_images
        from future_od_tpu.data.transforms import JointCompose, JointResize

        ds = nu_images.NuImagesDataset(
            root_path=str(tmp_path),
            split="mini",
            front_camera_only=True,
            frames=[4, 5, 6],
            joint_transform=JointCompose([JointResize((64, 128))]),
        )
        assert len(ds) == 1
        s = ds[0]
        assert BATCH_CONTRACT_KEYS <= set(s)
        assert s["video"].shape == (3, 64, 128, 3)
        assert int(s["annotated_frame_idx"]) == 2
        assert int(s["active"].sum()) == 1
        assert float(np.abs(s["ignore_boxes"]).sum()) > 0
        np.testing.assert_allclose(s["translation"][:, 0], [0.0, 1.0, 2.0])
        np.testing.assert_allclose(s["speed"][:, 0], [4.0, 5.0, 6.0])
        assert float(np.std(s["video"])) > 0.1

    def test_loader_integration_from_disk(self, monkeypatch, tmp_path):
        # the on-disk sample flows through the production Loader collate
        install_file_devkits(monkeypatch)
        build_nuimages_archive(str(tmp_path))
        from future_od_tpu.data import nu_images
        from future_od_tpu.data.loader import Loader
        from future_od_tpu.data.transforms import JointCompose, JointResize

        ds = nu_images.NuImagesDataset(
            root_path=str(tmp_path),
            split="mini",
            front_camera_only=True,
            frames=[4, 5, 6],
            joint_transform=JointCompose([JointResize((64, 128))]),
        )
        batch = next(iter(Loader(ds, batch_size=1, device_put=False, num_workers=1)))
        assert batch["video"].shape == (1, 3, 64, 128, 3)
        assert batch["translation"].shape == (1, 3, 3)
