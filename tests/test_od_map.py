"""mAP metric tests: hand goldens + an independent brute-force oracle that
replays the reference algorithm's semantics with plain python loops."""
import numpy as np
import pytest

import jax.numpy as jnp

from future_od_tpu.metrics.od_map import (
    NUM_SIZES,
    SIZE_CATEGORY_DELIMITERS,
    aggregate_mean_average_precision,
    prepare_od_map_stuffs,
)


def brute_force_prepare(pred_boxes, scores, anno_boxes, anno_classes, anno_active, imsize, K=50):
    """Slow, loopy oracle of od_map.py:214-287 semantics."""
    B, Mp, C = scores.shape
    K = min(K, Mp)
    N = anno_boxes.shape[1]
    T = 10
    thresholds = [0.50 + 0.05 * t for t in range(T)]

    def iou_one(a, b):
        relu = lambda v: max(v, 0.0)
        area1 = relu(a[2] - a[0]) * relu(a[3] - a[1])
        area2 = relu(b[2] - b[0]) * relu(b[3] - b[1])
        inter = relu(min(a[2], b[2]) - max(a[0], b[0])) * relu(
            min(a[3], b[3]) - max(a[1], b[1])
        )
        return (inter + 1e-7) / (area1 + area2 - inter + 1e-7)

    confs = np.zeros((T, C, B * K), np.float32)
    is_pos = np.zeros((T, C, B * K), bool)
    size_cats = np.zeros((C, NUM_SIZES, B * K), bool)
    num_annos = np.zeros((C, NUM_SIZES), np.int64)
    H, W = imsize
    s0, s1 = [d * H * W for d in SIZE_CATEGORY_DELIMITERS]

    def sizes_of(box):
        area = (box[2] - box[0]) * (box[3] - box[1])
        return [True, area <= s0, s0 < area <= s1, s1 < area]

    for b in range(B):
        for c in range(C):
            # available annotations for this class (generic = last slot)
            avail0 = [
                n
                for n in range(N)
                if anno_active[b, n] == 1 and (c == C - 1 or anno_classes[b, n] == c)
            ]
            for n in avail0:
                for s in range(NUM_SIZES):
                    if sizes_of(anno_boxes[b, n])[s]:
                        num_annos[c, s] += 1
            order = np.argsort(-scores[b, :, c], kind="stable")[:K]
            for t_idx, thr in enumerate(thresholds):
                avail = set(avail0)
                for k, m in enumerate(order):
                    slot = b * K + k
                    confs[t_idx, c, slot] = scores[b, m, c]
                    for s in range(NUM_SIZES):
                        size_cats[c, s, slot] = sizes_of(pred_boxes[b, m])[s]
                    # best among available; zeroed-out => score 0
                    best_n, best_iou = -1, 0.0
                    for n in range(N):
                        v = iou_one(pred_boxes[b, m], anno_boxes[b, n]) if n in avail else 0.0
                        if v > best_iou:
                            best_iou, best_n = v, n
                    if best_iou >= thr:
                        is_pos[t_idx, c, slot] = True
                        if best_n >= 0:
                            avail.discard(best_n)
    return confs, is_pos, size_cats, num_annos


def _random_case(rng, B=2, Mp=12, C=4, N=6, imsize=(100, 160)):
    H, W = imsize
    pb = rng.uniform(0, [W - 30, H - 30, 0, 0], size=(B, Mp, 4)).astype(np.float32)
    pb[..., 2:] = pb[..., :2] + rng.uniform(5, 30, size=(B, Mp, 2))
    scores = rng.uniform(size=(B, Mp, C)).astype(np.float32)
    scores[..., -1] = scores[..., :-1].max(-1)  # generic class
    ab = rng.uniform(0, [W - 30, H - 30, 0, 0], size=(B, N, 4)).astype(np.float32)
    ab[..., 2:] = ab[..., :2] + rng.uniform(5, 30, size=(B, N, 2))
    # plant overlaps so some detections match
    for b in range(B):
        for n in range(min(N, 4)):
            pb[b, n] = ab[b, n] + rng.normal(0, 2, size=4)
    ac = rng.integers(0, C - 1, size=(B, N))
    aa = (rng.uniform(size=(B, N)) < 0.8).astype(np.int64)
    return pb, scores, ab, ac, aa, imsize


class TestPrepare:
    def test_matches_brute_force(self, rng):
        for trial in range(3):
            case = _random_case(rng)
            got = prepare_od_map_stuffs(*[jnp.asarray(x) for x in case[:5]], case[5])
            want = brute_force_prepare(*case)
            got = [np.asarray(g) for g in got]
            np.testing.assert_allclose(got[0], want[0], atol=1e-5, err_msg="confs")
            np.testing.assert_array_equal(got[1], want[1], err_msg="is_positive")
            np.testing.assert_array_equal(got[2], want[2], err_msg="size_categories")
            np.testing.assert_array_equal(got[3], want[3], err_msg="num_annos")

    def test_perfect_single_detection(self):
        # one detection exactly on one annotation: positive at all thresholds
        imsize = (100, 100)
        pb = np.array([[[10, 10, 40, 40]]], np.float32)
        scores = np.array([[[0.9, 0.9]]], np.float32)  # 1 class + generic
        ab = np.array([[[10, 10, 40, 40]]], np.float32)
        ac = np.zeros((1, 1), np.int64)
        aa = np.ones((1, 1), np.int64)
        confs, is_pos, size_cats, num_annos = [
            np.asarray(x)
            for x in prepare_od_map_stuffs(
                jnp.asarray(pb), jnp.asarray(scores), jnp.asarray(ab),
                jnp.asarray(ac), jnp.asarray(aa), imsize,
            )
        ]
        assert is_pos[:, 0, 0].all() and is_pos[:, 1, 0].all()
        assert num_annos[0, 0] == 1 and num_annos[1, 0] == 1

    def test_double_claim_blocked(self):
        # two identical detections, one annotation: only the higher-ranked
        # claims it (od_map.py:264-277)
        imsize = (100, 100)
        pb = np.array([[[10, 10, 40, 40], [10, 10, 40, 40]]], np.float32)
        scores = np.array([[[0.9, 0.9], [0.8, 0.8]]], np.float32)
        ab = np.array([[[10, 10, 40, 40]]], np.float32)
        ac = np.zeros((1, 1), np.int64)
        aa = np.ones((1, 1), np.int64)
        _, is_pos, _, _ = [
            np.asarray(x)
            for x in prepare_od_map_stuffs(
                jnp.asarray(pb), jnp.asarray(scores), jnp.asarray(ab),
                jnp.asarray(ac), jnp.asarray(aa), imsize,
            )
        ]
        # slot 0 (rank 0) positive, slot 1 negative, at every threshold
        assert is_pos[:, 0, 0].all()
        assert not is_pos[:, 0, 1].any()


class TestAggregate:
    def test_perfect_ap_is_one(self):
        imsize = (100, 100)
        pb = np.array([[[10, 10, 40, 40], [50, 50, 90, 90]]], np.float32)
        scores = np.array([[[0.9, 0.9], [0.8, 0.8]]], np.float32)
        ab = pb.copy()
        ac = np.zeros((1, 2), np.int64)
        aa = np.ones((1, 2), np.int64)
        stuff = prepare_od_map_stuffs(
            jnp.asarray(pb), jnp.asarray(scores), jnp.asarray(ab),
            jnp.asarray(ac), jnp.asarray(aa), imsize,
        )
        confs, is_pos, size_cats, num_annos = [np.asarray(x) for x in stuff]
        ap = aggregate_mean_average_precision(
            confs, is_pos, size_cats, num_annos[..., None]
        )
        # class 0, size "all": perfect AP at every threshold
        np.testing.assert_allclose(ap["all"][:, 0, 0], 1.0, atol=1e-4)
        np.testing.assert_allclose(ap["generic"][:, 0], 1.0, atol=1e-4)

    def test_half_precision_ap(self):
        # 1 TP (rank 1) + 1 FP (rank 0, higher conf): AP = precision at the
        # TP = 1/2
        imsize = (100, 100)
        pb = np.array([[[10, 10, 40, 40], [60, 60, 62, 62]]], np.float32)
        scores = np.array([[[0.8, 0.8], [0.9, 0.9]]], np.float32)
        ab = np.array([[[10, 10, 40, 40]]], np.float32)
        ac = np.zeros((1, 1), np.int64)
        aa = np.ones((1, 1), np.int64)
        stuff = prepare_od_map_stuffs(
            jnp.asarray(pb), jnp.asarray(scores), jnp.asarray(ab),
            jnp.asarray(ac), jnp.asarray(aa), imsize,
        )
        confs, is_pos, size_cats, num_annos = [np.asarray(x) for x in stuff]
        ap = aggregate_mean_average_precision(
            confs, is_pos, size_cats, num_annos[..., None]
        )
        np.testing.assert_allclose(ap["all"][0, 0, 0], 0.5, atol=1e-3)

    def test_object_permutation_invariance(self, rng):
        # AP sorts by confidence internally, so permuting the accumulated
        # object axis (= arbitrary step/rank interleaving) must not change it
        case = _random_case(rng)
        stuff = [np.asarray(x) for x in prepare_od_map_stuffs(
            *[jnp.asarray(x) for x in case[:5]], case[5]
        )]
        one = aggregate_mean_average_precision(*stuff[:3], stuff[3][..., None])
        perm = rng.permutation(stuff[0].shape[2])
        two = aggregate_mean_average_precision(
            stuff[0][:, :, perm],
            stuff[1][:, :, perm],
            stuff[2][:, :, perm],
            stuff[3][..., None],
        )
        np.testing.assert_allclose(one["all"], two["all"], atol=1e-4)

    def test_nan_for_absent_class(self):
        # a class with no annotations must yield NaN AP, excluded by nanmeans
        imsize = (100, 100)
        pb = np.array([[[10, 10, 40, 40]]], np.float32)
        scores = np.array([[[0.9, 0.1, 0.9]]], np.float32)  # 2 classes + generic
        ab = pb.copy()
        ac = np.zeros((1, 1), np.int64)
        aa = np.ones((1, 1), np.int64)
        stuff = [np.asarray(x) for x in prepare_od_map_stuffs(
            jnp.asarray(pb), jnp.asarray(scores), jnp.asarray(ab),
            jnp.asarray(ac), jnp.asarray(aa), imsize,
        )]
        ap = aggregate_mean_average_precision(*stuff[:3], stuff[3][..., None])
        assert np.isnan(ap["all"][0, 1, 0])
        np.testing.assert_allclose(ap["classavg"][0, 0], 1.0, atol=1e-4)
