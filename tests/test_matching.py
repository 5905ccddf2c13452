"""Assignment-solver tests: auction optimality vs exact Hungarian, cost
semantics, and the host-callback arm."""
import numpy as np

import jax
import jax.numpy as jnp
import scipy.optimize

from future_od_tpu.ops.matching import (
    auction_assignment,
    hungarian_assignment,
    matching_cost,
)


def _scipy_total(cost, active):
    cols = np.nonzero(active)[0]
    if len(cols) == 0:
        return 0.0
    r, c = scipy.optimize.linear_sum_assignment(cost[:, cols])
    return cost[:, cols][r, c].sum()


def _assignment_total(cost, active, pred_idx):
    M = cost.shape[0]
    total = 0.0
    seen = set()
    n_matched = 0
    for j in np.nonzero(active)[0]:
        i = int(pred_idx[j])
        if i < M:
            assert i not in seen, "duplicate query assignment"
            seen.add(i)
            total += cost[i, j]
            n_matched += 1
    return total, n_matched


class TestAuction:
    def test_matches_hungarian_total_cost(self, rng):
        B, M = 4, 32
        for trial in range(5):
            N = 24
            cost = rng.normal(size=(B, M, N)).astype(np.float32) * 5
            active = rng.uniform(size=(B, N)) < 0.7
            active[:, 0] = True
            out = np.asarray(auction_assignment(jnp.asarray(cost), jnp.asarray(active)))
            for b in range(B):
                opt = _scipy_total(cost[b], active[b])
                got, n = _assignment_total(cost[b], active[b], out[b])
                assert n == active[b].sum(), f"unmatched actives b={b}"
                assert got <= opt + 1e-3 + 1e-4 * abs(opt), (got, opt)

    def test_all_inactive(self):
        cost = jnp.zeros((2, 8, 6))
        active = jnp.zeros((2, 6), dtype=bool)
        out = auction_assignment(cost, active)
        assert (np.asarray(out) == 8).all()

    def test_single_target(self):
        cost = jnp.asarray(np.array([[[3.0], [1.0], [2.0]]]))  # (1, 3, 1)
        active = jnp.ones((1, 1), dtype=bool)
        out = auction_assignment(cost, active)
        assert int(out[0, 0]) == 1  # cheapest query

    def test_jit_and_grad_safety(self, rng):
        # matching must be usable inside a jitted loss without tracing issues
        cost = jnp.asarray(rng.normal(size=(2, 16, 8)).astype(np.float32))
        active = jnp.ones((2, 8), dtype=bool)
        out = jax.jit(auction_assignment)(cost, active)
        assert out.shape == (2, 8)


class TestHungarianCallback:
    def test_matches_scipy_exactly(self, rng):
        B, M, N = 3, 16, 12
        cost = rng.normal(size=(B, M, N)).astype(np.float32)
        active = rng.uniform(size=(B, N)) < 0.6
        out = np.asarray(
            hungarian_assignment(jnp.asarray(cost), jnp.asarray(active))
        )
        for b in range(B):
            opt = _scipy_total(cost[b], active[b])
            got, n = _assignment_total(cost[b], active[b], out[b])
            assert n == active[b].sum()
            np.testing.assert_allclose(got, opt, atol=1e-5)
        # inactive slots must be M
        assert (out[~active] == M).all()

    def test_under_jit(self, rng):
        cost = jnp.asarray(rng.normal(size=(1, 8, 4)).astype(np.float32))
        active = jnp.ones((1, 4), dtype=bool)
        out = jax.jit(hungarian_assignment)(cost, active)
        assert out.shape == (1, 4)


class TestMatchingCost:
    def test_perfect_prediction_is_cheapest(self):
        # A query predicting exactly the target box+class must win the match.
        M, N, C = 4, 2, 3
        tgt_boxes = jnp.array([[[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.1, 0.1]]])
        tgt_labels = jnp.array([[1, 2]])
        targets = {
            "boxes": tgt_boxes,
            "labels": tgt_labels,
            "active": jnp.ones((1, N), dtype=bool),
        }
        logits = jnp.full((1, M, C), -4.0)
        logits = logits.at[0, 2, 1].set(4.0).at[0, 3, 2].set(4.0)
        boxes = jnp.full((1, M, 4), 0.5)
        boxes = boxes.at[0, 2].set(tgt_boxes[0, 0]).at[0, 3].set(tgt_boxes[0, 1])
        cost = matching_cost(logits, boxes, targets)
        assert cost.shape == (1, M, N)
        assignment = auction_assignment(cost, targets["active"])
        assert assignment[0].tolist() == [2, 3]

    def test_cost_components_golden(self):
        # One query, one target, hand-computed cost.
        logits = jnp.array([[[0.0]]])  # prob 0.5
        boxes = jnp.array([[[0.5, 0.5, 0.2, 0.2]]])
        targets = {
            "boxes": jnp.array([[[0.5, 0.5, 0.2, 0.2]]]),
            "labels": jnp.array([[0]]),
            "active": jnp.ones((1, 1), dtype=bool),
        }
        cost = matching_cost(
            logits, boxes, targets, cost_class=1.0, cost_bbox=0.0, cost_giou=0.0
        )
        p = 0.5
        pos = 0.25 * (1 - p) ** 2 * -np.log(p + 1e-8)
        neg = 0.75 * p**2 * -np.log(1 - p + 1e-8)
        np.testing.assert_allclose(cost[0, 0, 0], pos - neg, rtol=1e-5)
        # identical boxes: giou cost = -1, l1 = 0
        cost_g = matching_cost(
            logits, boxes, targets, cost_class=0.0, cost_bbox=0.0, cost_giou=1.0
        )
        np.testing.assert_allclose(cost_g[0, 0, 0], -1.0, rtol=1e-5)


class TestCostSlotCompaction:
    """cost_slots compaction (set_criterion.compact_targets): permutation-
    exact whenever every image's active count fits, loud telemetry when not.
    VERDICT r3 #1 — the matcher+criterion slice runs over a static compacted
    slot count instead of the loader's dense Nmax."""

    def _problem(self, rng, B=3, M=16, C=5, N=40, max_active=10, aux=2):
        outputs = {
            "pred_logits": jnp.asarray(rng.normal(size=(B, M, C)).astype(np.float32)),
            "pred_boxes": jnp.asarray(rng.uniform(0.2, 0.8, size=(B, M, 4)).astype(np.float32)),
            "aux_outputs": [
                {
                    "pred_logits": jnp.asarray(rng.normal(size=(B, M, C)).astype(np.float32)),
                    "pred_boxes": jnp.asarray(rng.uniform(0.2, 0.8, size=(B, M, 4)).astype(np.float32)),
                }
                for _ in range(aux)
            ],
        }
        active = np.zeros((B, N), bool)
        for b in range(B):
            k = rng.integers(1, max_active + 1)
            active[b, rng.choice(N, size=k, replace=False)] = True  # scattered
        targets = {
            "boxes": jnp.asarray(rng.uniform(0.1, 0.6, size=(B, N, 4)).astype(np.float32)),
            "labels": jnp.asarray(rng.integers(0, C, size=(B, N))),
            "active": jnp.asarray(active),
        }
        return outputs, targets

    def test_compaction_is_exact_when_actives_fit(self):
        from future_od_tpu.models.set_criterion import CriterionConfig, set_criterion

        rng = np.random.default_rng(0)
        outputs, targets = self._problem(rng)
        dense = set_criterion(
            outputs, targets, CriterionConfig(num_classes=5, cost_slots=0)
        )
        compact = set_criterion(
            outputs, targets, CriterionConfig(num_classes=5, cost_slots=12)
        )
        assert set(dense) | {"matcher_dropped"} == set(compact) | {"matcher_dropped"}
        for key in dense:
            if key in ("matcher_rounds", "matcher_dropped"):
                continue
            np.testing.assert_allclose(
                np.asarray(dense[key]), np.asarray(compact[key]),
                rtol=1e-5, atol=1e-6, err_msg=key,
            )
        assert float(compact["matcher_dropped"]) == 0.0

    def test_compact_targets_permutation(self):
        from future_od_tpu.models.set_criterion import compact_targets

        rng = np.random.default_rng(1)
        _, targets = self._problem(rng, B=2, N=30, max_active=6)
        out, dropped = compact_targets(targets, 8)
        assert float(dropped) == 0.0
        for b in range(2):
            act = np.asarray(targets["active"][b])
            idx = np.nonzero(act)[0]
            # active slots land at the front, original order preserved
            np.testing.assert_array_equal(
                np.asarray(out["boxes"][b, : len(idx)]),
                np.asarray(targets["boxes"][b, idx]),
            )
            np.testing.assert_array_equal(
                np.asarray(out["labels"][b, : len(idx)]),
                np.asarray(targets["labels"][b, idx]),
            )
            assert np.asarray(out["active"][b, : len(idx)]).all()
            assert not np.asarray(out["active"][b, len(idx):]).any()

    def test_overflow_drops_loudly(self):
        from future_od_tpu.models.set_criterion import CriterionConfig, set_criterion

        rng = np.random.default_rng(2)
        outputs, targets = self._problem(rng, B=2, M=16, N=24, max_active=1)
        # force 10 actives in image 0, 3 in image 1, cost_slots=6 -> 4 dropped
        active = np.zeros((2, 24), bool)
        active[0, rng.choice(24, size=10, replace=False)] = True
        active[1, :3] = True
        targets["active"] = jnp.asarray(active)
        losses = set_criterion(
            outputs, targets, CriterionConfig(num_classes=5, cost_slots=6)
        )
        assert float(losses["matcher_dropped"]) == 4.0
        for key, val in losses.items():
            assert np.isfinite(np.asarray(val)).all(), key

    def test_host_matched_indices_align(self):
        """matching_costs_all compacts identically, so externally-solved
        indices (the host-matched split step) line up with set_criterion's
        internal compacted layout."""
        from future_od_tpu.models.set_criterion import (
            CriterionConfig,
            matching_costs_all,
            set_criterion,
        )
        from future_od_tpu.ops.matching import _hungarian_host

        rng = np.random.default_rng(3)
        outputs, targets = self._problem(rng)
        cfg = CriterionConfig(num_classes=5, cost_slots=12, matcher="hungarian")
        costs, active = matching_costs_all(outputs, targets, cfg)
        assert costs.shape[-1] == 12 and active.shape[-1] == 12
        B = targets["active"].shape[0]
        idx = _hungarian_host(np.asarray(costs, np.float32), np.asarray(active, bool))
        pred_idx_all = jnp.asarray(idx.reshape(-1, B, idx.shape[-1]))
        split = set_criterion(outputs, targets, cfg, pred_idx_all=pred_idx_all)
        # reference: dense hungarian without compaction
        cfg_dense = CriterionConfig(num_classes=5, cost_slots=0, matcher="hungarian")
        costs_d, active_d = matching_costs_all(outputs, targets, cfg_dense)
        idx_d = _hungarian_host(np.asarray(costs_d, np.float32), np.asarray(active_d, bool))
        dense = set_criterion(
            outputs, targets, cfg_dense,
            pred_idx_all=jnp.asarray(idx_d.reshape(-1, B, idx_d.shape[-1])),
        )
        for key in ("loss_ce", "loss_bbox", "loss_giou", "loss_ce_0", "loss_bbox_1"):
            np.testing.assert_allclose(
                np.asarray(dense[key]), np.asarray(split[key]),
                rtol=1e-5, atol=1e-6, err_msg=key,
            )
