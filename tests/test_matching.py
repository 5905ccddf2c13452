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
