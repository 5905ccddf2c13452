"""Golden / reference-semantics tests for the pure-function op core."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from future_od_tpu.ops import (
    batched_box_iou,
    box_area,
    box_cxcywh_to_xyxy,
    box_xyxy_to_cxcywh,
    class_error,
    concat_quaternion,
    construct_box_targets,
    gen_sineembed_for_position,
    generalized_box_iou,
    inverse_quaternion,
    inverse_sigmoid,
    sigmoid_focal_loss,
    spatial_encoding,
    spatio_temporal_encoding,
    to_detr_targets,
)
from future_od_tpu.ops.boxes import box_iou, elementwise_generalized_box_iou
from future_od_tpu.ops.quaternion import relative_pose


class TestBoxes:
    def test_roundtrip(self, rng):
        b = rng.uniform(0, 1, size=(7, 4)).astype(np.float32)
        b = np.concatenate([b[:, :2], b[:, :2] + np.abs(b[:, 2:])], axis=1)
        out = box_cxcywh_to_xyxy(box_xyxy_to_cxcywh(jnp.asarray(b)))
        np.testing.assert_allclose(out, b, atol=1e-6)

    def test_iou_golden(self):
        a = jnp.array([[0.0, 0.0, 2.0, 2.0]])
        b = jnp.array([[1.0, 1.0, 3.0, 3.0], [0.0, 0.0, 2.0, 2.0], [5.0, 5.0, 6.0, 6.0]])
        iou, _ = box_iou(a, b)
        np.testing.assert_allclose(iou[0], [1 / 7, 1.0, 0.0], atol=1e-6)

    def test_giou_golden(self):
        a = jnp.array([[0.0, 0.0, 1.0, 1.0]])
        b = jnp.array([[2.0, 0.0, 3.0, 1.0]])
        # iou 0; enclosing area 3, union 2 -> giou = 0 - 1/3
        np.testing.assert_allclose(generalized_box_iou(a, b)[0, 0], -1 / 3, atol=1e-6)

    def test_elementwise_matches_diag(self, rng):
        a = rng.uniform(0, 1, size=(10, 4)).astype(np.float32)
        b = rng.uniform(0, 1, size=(10, 4)).astype(np.float32)
        a = np.concatenate([a[:, :2], a[:, :2] + a[:, 2:] + 0.1], axis=1)
        b = np.concatenate([b[:, :2], b[:, :2] + b[:, 2:] + 0.1], axis=1)
        full = generalized_box_iou(jnp.asarray(a), jnp.asarray(b))
        elem = elementwise_generalized_box_iou(jnp.asarray(a), jnp.asarray(b))
        np.testing.assert_allclose(np.diag(full), elem, atol=1e-6)

    def test_batched_iou_identity_and_empty(self):
        boxes = jnp.array([[[0.0, 0.0, 2.0, 2.0], [0.0, 0.0, 0.0, 0.0]]])
        iou = batched_box_iou(boxes, boxes)
        # self-IoU 1 for real box; empty-vs-empty = 1 via the double epsilon
        np.testing.assert_allclose(iou[0, 0, 0], 1.0, atol=1e-5)
        np.testing.assert_allclose(iou[0, 1, 1], 1.0, atol=1e-5)
        assert iou[0, 0, 1] < 1e-5

    def test_area(self):
        assert float(box_area(jnp.array([0.0, 0.0, 2.0, 3.0]))) == 6.0


class TestQuaternion:
    def test_identity(self):
        q = np.array([1.0, 0, 0, 0], dtype=np.float32)
        r = np.array([0.5, 0.5, 0.5, 0.5], dtype=np.float32)
        np.testing.assert_allclose(concat_quaternion(q, r), r, atol=1e-6)
        np.testing.assert_allclose(
            concat_quaternion(r, inverse_quaternion(r)), q, atol=1e-6
        )

    def test_compose_rotation_matrix(self, rng):
        # Composition must match rotation-matrix composition.
        def quat_to_mat(q):
            w, x, y, z = q
            return np.array(
                [
                    [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                    [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                    [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
                ]
            )

        q1 = rng.normal(size=4)
        q2 = rng.normal(size=4)
        q1 /= np.linalg.norm(q1)
        q2 /= np.linalg.norm(q2)
        q12 = concat_quaternion(q1.astype(np.float64), q2.astype(np.float64))
        # concat(q1, q2) applies q1 then q2 with the reference's convention
        np.testing.assert_allclose(
            quat_to_mat(q12), quat_to_mat(q1) @ quat_to_mat(q2), atol=1e-9
        )

    def test_relative_pose_first_frame_identity(self, rng):
        t = rng.normal(size=(3, 3)).astype(np.float64)
        q = rng.normal(size=(3, 4))
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        t_rel, q_rel = relative_pose(t, q)
        np.testing.assert_allclose(t_rel[0], 0.0, atol=1e-9)
        np.testing.assert_allclose(q_rel[0], [1, 0, 0, 0], atol=1e-9)


class TestPosEnc:
    def test_spatial_shape_and_symmetry(self):
        enc = spatial_encoding(4, 6, 32)
        assert enc.shape == (4, 6, 32)
        # first half depends only on y, second half only on x
        assert np.allclose(enc[:, 0, :16], enc[:, 3, :16])
        assert np.allclose(enc[0, :, 16:], enc[2, :, 16:])

    def test_spatial_matches_reference_formula(self):
        h, w, c = 3, 5, 8
        enc = np.asarray(spatial_encoding(h, w, c))
        # hand-compute channel 0 at (i, j): sin(y_i / T^0) with y normalized
        for i in range(h):
            y = (i + 1) / (h + 1e-6) * 2 * np.pi
            np.testing.assert_allclose(enc[i, 0, 0], np.sin(y), atol=1e-5)
            np.testing.assert_allclose(enc[i, 0, 1], np.cos(y), atol=1e-5)

    def test_spatio_temporal_with_offsets(self):
        offs = jnp.array([[-1.0, -0.5], [-0.8, -0.4]])
        enc = spatio_temporal_encoding(2, 4, 4, 16, temporal_offsets=offs)
        assert enc.shape == (2, 2, 4, 4, 16)
        base = spatio_temporal_encoding(2, 4, 4, 16, no_temporal=True)
        assert base.shape == (2, 4, 4, 16)
        assert not np.allclose(enc[0], base)

    def test_sineembed_shape(self):
        pos = jnp.array([[[0.5, 0.25]]])
        emb = gen_sineembed_for_position(pos, 256)
        assert emb.shape == (1, 1, 256)
        # first half is y-embedding: channel 0 = sin(0.25 * 2pi / 1)
        np.testing.assert_allclose(emb[0, 0, 0], np.sin(0.25 * 2 * np.pi), atol=1e-5)
        np.testing.assert_allclose(emb[0, 0, 128], np.sin(0.5 * 2 * np.pi), atol=1e-5)


class TestLosses:
    def test_focal_loss_matches_manual(self, rng):
        logits = jnp.asarray(rng.normal(size=(2, 5, 3)).astype(np.float32))
        targets = jnp.zeros((2, 5, 3)).at[0, 1, 2].set(1.0).at[1, 0, 0].set(1.0)
        num_boxes = 2.0
        loss = sigmoid_focal_loss(logits, targets, num_boxes, alpha=0.25, gamma=2.0)

        p = jax.nn.sigmoid(logits)
        ce = -(targets * jnp.log(p) + (1 - targets) * jnp.log(1 - p))
        p_t = p * targets + (1 - p) * (1 - targets)
        alpha_t = 0.25 * targets + 0.75 * (1 - targets)
        manual = (alpha_t * ce * (1 - p_t) ** 2).mean(axis=1).sum() / num_boxes
        np.testing.assert_allclose(loss, manual, rtol=1e-5)

    def test_class_error(self):
        logits = jnp.array([[[5.0, 0.0], [0.0, 5.0], [5.0, 0.0]]])
        classes = jnp.array([[0, 1, 1]])
        valid = jnp.array([[True, True, True]])
        np.testing.assert_allclose(class_error(logits, classes, valid), 100 * (1 / 3), atol=1e-5)
        # masked-out wrong prediction doesn't count
        valid = jnp.array([[True, True, False]])
        np.testing.assert_allclose(class_error(logits, classes, valid), 0.0, atol=1e-5)

    def test_inverse_sigmoid_roundtrip(self):
        x = jnp.array([0.01, 0.3, 0.5, 0.99])
        np.testing.assert_allclose(jax.nn.sigmoid(inverse_sigmoid(x)), x, atol=1e-5)


class TestTargets:
    def test_construct_box_targets(self):
        boxes = np.array([[0, 0, 10, 10], [5, 5, 6, 6], [1, 1, 2, 2]], dtype=np.float32)
        classes = np.array([0, 8, 3])
        out_boxes, out_classes, ignores, active = construct_box_targets(
            boxes, classes, max_num_objects=5, ignore_categories={8}
        )
        assert out_boxes.shape == (5, 4) and active.tolist() == [1, 1, 0, 0, 0]
        assert out_classes.tolist() == [0, 3, 0, 0, 0]
        np.testing.assert_allclose(ignores[0], [5, 5, 6, 6])
        np.testing.assert_allclose(out_boxes[1], [1, 1, 2, 2])

    def test_to_detr_targets_normalization(self):
        boxes = jnp.array([[[0.0, 0.0, 100.0, 50.0]]])
        tgt = to_detr_targets(100, 200, jnp.array([[1]]), boxes, jnp.array([[2]]))
        np.testing.assert_allclose(tgt["boxes"][0, 0], [0.25, 0.25, 0.5, 0.5], atol=1e-6)
        assert bool(tgt["active"][0, 0])


class TestTemporalEncodingGolden:
    def test_500ms_offsets_normalization(self):
        # 500ms config after dropping the future frame: offsets [-1.0, -0.5];
        # reference normalizes by the LAST offset (+eps) then scales by 2π
        # (paper.py:66-73): t = offset/last * 2π -> [4π, 2π].
        from future_od_tpu.ops.posenc import temporal_encoding

        offs = jnp.array([[-1.0, -0.5]])
        enc = np.asarray(temporal_encoding(2, 8, temporal_offsets=offs))
        assert enc.shape == (1, 2, 8)
        # channel 0: sin(t / T^0) with t = 4π resp. 2π -> both ~0
        np.testing.assert_allclose(enc[0, :, 0], [np.sin(4 * np.pi), np.sin(2 * np.pi)], atol=1e-4)
        # channel 1: cos(t) -> both ~1
        np.testing.assert_allclose(enc[0, :, 1], [1.0, 1.0], atol=1e-4)
        # a higher-frequency pair distinguishes the frames
        t = np.array([4 * np.pi, 2 * np.pi])
        dim_t2 = 10000.0 ** (2.0 * 1 / 8)
        np.testing.assert_allclose(enc[0, :, 2], np.sin(t / dim_t2), atol=1e-4)

    def test_frame_index_fallback(self):
        from future_od_tpu.ops.posenc import temporal_encoding

        enc = np.asarray(temporal_encoding(3, 4))
        # t = (i+1)/3 * 2π
        t = (np.arange(1, 4) / (3 + 1e-6)) * 2 * np.pi
        np.testing.assert_allclose(enc[:, 0], np.sin(t), atol=1e-5)
