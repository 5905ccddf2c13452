"""NuImages dataset logic tests with a mocked devkit: 13-frame clip
validation, frame selection with random offsets, ego_pose IMU assembly."""
import sys
import types

import numpy as np
import pytest


def install_fake_nuimages(monkeypatch, num_frames=13, key_index=6):
    sd_tokens = [f"sd{i}" for i in range(num_frames)]

    class FakeNuImages:
        def __init__(self, version, dataroot):
            self.version = version
            self.sample = [
                {
                    "token": "sample0",
                    "key_camera_token": sd_tokens[key_index],
                    "log_token": "log0",
                }
            ]
            self.object_ann = [
                {
                    "token": "ann0",
                    "sample_data_token": sd_tokens[key_index],
                    "category_token": "fd69059b62a3469fbaef25340c0eab7f",  # car
                    "bbox": [5.0, 5.0, 20.0, 20.0],
                }
            ]
            self.sensor = [{"token": "s0", "channel": "CAM_FRONT"}]
            self.calibrated_sensor = [{"token": "cs0", "sensor_token": "s0"}]
            self.log = [{"token": "log0", "logfile": "n008-2018-08-01-12-00-00"}]

        def get(self, table, token):
            if table == "sample_data":
                idx = int(token[2:])
                return {
                    "token": token,
                    "filename": f"img{idx}.jpg",
                    "ego_pose_token": f"ep{idx}",
                    "calibrated_sensor_token": "cs0",
                }
            if table == "ego_pose":
                idx = int(token[2:])
                return {
                    "translation": [float(idx), 0.0, 0.0],
                    "rotation": [1.0, 0.0, 0.0, 0.0],
                    "acceleration": [0.0, 0.0, 0.0],
                    "rotation_rate": [0.0, 0.0, 0.0],
                    "speed": float(idx),
                }
            raise KeyError((table, token))

        def get_sample_content(self, token):
            return list(sd_tokens)

    mod = types.ModuleType("nuimages")
    mod.NuImages = FakeNuImages
    monkeypatch.setitem(sys.modules, "nuimages", mod)
    return sd_tokens


def make_ds(monkeypatch, tmp_path, frames, num_frames=13, **kw):
    install_fake_nuimages(monkeypatch, num_frames=num_frames)
    import cv2

    for i in range(num_frames):
        cv2.imwrite(str(tmp_path / f"img{i}.jpg"), np.zeros((32, 48, 3), np.uint8))
    from future_od_tpu.data import nu_images as ni
    from future_od_tpu.data.transforms import JointCompose, JointResize

    return ni.NuImagesDataset(
        root_path=str(tmp_path),
        split="mini",
        front_camera_only=True,
        frames=frames,
        joint_transform=JointCompose([JointResize((32, 48))]),
        **kw,
    )


class TestNuImages:
    def test_clip_validation_keeps_13_frame_samples(self, monkeypatch, tmp_path):
        ds = make_ds(monkeypatch, tmp_path, frames=[4, 5, 6])
        assert len(ds) == 1

    def test_short_clips_skipped(self, monkeypatch, tmp_path):
        # 11-frame content (or a shifted keyframe) is rejected (nu_images.py:137-139)
        ds = make_ds(monkeypatch, tmp_path, frames=[4, 5, 6], num_frames=11)
        assert len(ds) == 0

    def test_frame_selection_and_imu(self, monkeypatch, tmp_path):
        ds = make_ds(monkeypatch, tmp_path, frames=[4, 5, 6])
        s = ds[0]
        assert s["video"].shape == (3, 32, 48, 3)
        assert int(s["annotated_frame_idx"]) == 2  # frames.index(6)
        # translation relative to the first selected frame (ego x = frame idx)
        np.testing.assert_allclose(s["translation"][:, 0], [0.0, 1.0, 2.0])
        np.testing.assert_allclose(s["speed"][:, 0], [4.0, 5.0, 6.0])
        assert s["active"].sum() == 1  # the one car annotation

    def test_random_offset_sampler(self, monkeypatch, tmp_path):
        # Offset augmentation shifts the whole window; the annotated keyframe
        # (frame 6) must remain inside it and its index moves accordingly
        # (reference nu_images.py:151-171 semantics).
        ds = make_ds(
            monkeypatch, tmp_path, frames=[4, 5, 6],
            frame_offset_sampler=lambda: 2,
        )
        s = ds[0]
        # frames become [6, 7, 8] -> annotated index 0
        assert int(s["annotated_frame_idx"]) == 0
        np.testing.assert_allclose(s["speed"][:, 0], [6.0, 7.0, 8.0])
