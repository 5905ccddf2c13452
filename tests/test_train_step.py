"""Train-step unit tests: optimizer wiring, LR schedule, freeze mask, mixed
precision."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from future_od_tpu.models.build import build_flagship
from future_od_tpu.models.st_detr import SpatioTemporalDETRArgs
from future_od_tpu.train.optimizer import (
    build_optimizer,
    get_lr_func,
    param_labels,
    set_learning_rates,
)
from future_od_tpu.train.step import TrainState, make_train_step

TINY = dict(
    num_classes=4, num_queries=8, hidden_dim=32, enc_layers=1, dec_layers=1,
    dim_feedforward=64, enc_nheads=2, nheads=2, lr_backbone=1e-4,
)


def setup(mixed=False):
    import tests.test_models as tm

    args = SpatioTemporalDETRArgs(**TINY)
    model = build_flagship(args)
    data = tm.make_data(np.random.default_rng(0), B=2, L=2, H=64, W=64, N=8)
    variables = model.init({"params": jax.random.key(0)}, data)
    tx, opt_state = build_optimizer(
        variables["params"], lr=1e-4, lr_backbone=1e-5, max_norm=0.1
    )
    state = TrainState(variables["params"], variables["frozen"], opt_state, jnp.int32(0))
    step = jax.jit(make_train_step(model, args.criterion_config(), tx, mixed_precision=mixed))
    return model, state, step, data


class TestLrSchedule:
    def test_reference_shape(self):
        f = get_lr_func(100)
        assert f(0) == pytest.approx(1 / 11)
        assert f(9) == pytest.approx(10 / 11)
        assert f(10) == 1.0
        assert f(60) == 1.0
        assert f(61) == 0.5
        assert f(90) == 0.5
        assert f(91) == 0.1

    def test_injected_lrs_change_updates(self):
        model, state, step, data = setup()
        s1, *_ = step(state, data, jax.random.key(1))
        # zero both LRs: params must not move
        model2, state2, step2, data2 = setup()
        state2 = state2._replace(
            opt_state=set_learning_rates(state2.opt_state, 0.0, 0.0)
        )
        s2, *_ = step2(state2, data2, jax.random.key(1))
        moved = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), s2.params, state2.params
        )
        assert max(jax.tree.leaves(moved)) == 0.0


class TestRbgDropoutKey:
    def test_rbg_key_threads_through_the_step(self):
        """The Trainer's production dropout PRNG is 'rbg' (TPU hardware RNG;
        threefry costs ~10 VPU ops per word of the ~1e9 dropout bits a b32
        step draws — measured 300.5 -> 259.2 ms bf16, BENCHMARKS.md round 3).
        The jitted step must accept a typed rbg key (fold_in inside) and the
        resulting dropout stream must differ from threefry's."""
        model, state, step, data = setup()
        s_rbg, loss_rbg, *_ = step(state, data, jax.random.key(1, impl="rbg"))
        assert np.isfinite(float(loss_rbg))
        # same seed, different impl => different dropout bits => different loss
        _, loss_tf, *_ = step(state, data, jax.random.key(1, impl="threefry2x32"))
        assert float(loss_rbg) != float(loss_tf)
        # and params moved under the rbg arm
        d0 = state.params["core"]["detector"]["class_embed"]["kernel"]
        d1 = s_rbg.params["core"]["detector"]["class_embed"]["kernel"]
        assert not np.allclose(np.asarray(d0), np.asarray(d1))

    def test_trainer_default_is_rbg(self):
        import inspect

        from future_od_tpu.train.trainer import Trainer

        assert inspect.signature(Trainer.__init__).parameters["prng_impl"].default == "rbg"


class TestGradAccum:
    def _setup(self, accum, mixed=False):
        import tests.test_models as tm

        args = SpatioTemporalDETRArgs(**TINY, dropout=0.0)
        model = build_flagship(args)
        data = tm.make_data(np.random.default_rng(0), B=4, L=2, H=64, W=64, N=8)
        variables = model.init({"params": jax.random.key(0)}, data)
        tx, opt_state = build_optimizer(
            variables["params"], lr=1e-4, lr_backbone=1e-5, max_norm=0.1
        )
        state = TrainState(
            variables["params"], variables["frozen"], opt_state, jnp.int32(0)
        )
        step = jax.jit(
            make_train_step(
                model, args.criterion_config(), tx,
                mixed_precision=mixed, accum_steps=accum,
            )
        )
        return state, step, data

    def test_accum_is_exact(self):
        """accum_steps=2 must reproduce the unsplit step: micro losses are
        normalized by the FULL batch's num_boxes and summed, matching is
        per-sample, and post-proc runs once on the reassembled predictions —
        so loss, stats, updated params, and mAP tensors all agree (dropout=0
        so the per-micro rng fold is inert)."""
        state1, step1, data = self._setup(accum=1)
        state2, step2, _ = self._setup(accum=2)
        key = jax.random.key(1)
        s1, loss1, stats1, map1, out1 = step1(state1, data, key)
        s2, loss2, stats2, map2, out2 = step2(state2, data, key)
        assert np.isfinite(float(loss1))
        np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
        for k in ("labels", "box_l1", "box_giou", "cardinality",
                  "matcher_unmatched"):
            np.testing.assert_allclose(
                float(stats1[k]), float(stats2[k]), rtol=1e-5, atol=1e-6,
                err_msg=k,
            )
        # AdamW at step 0 is sign-like (g/sqrt(g^2)), so f32 reassociation of
        # the micro-grad sum can flip near-zero elements by up to 2*lr=2e-4;
        # the loss/stats/map equalities above carry the exactness claim.
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=2.5e-4
            ),
            s1.params, s2.params,
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            ),
            (map1, out1), (map2, out2),
        )

    def test_accum_mixed_precision_runs(self):
        state, step, data = self._setup(accum=2, mixed=True)
        s, loss, *_ = step(state, data, jax.random.key(1))
        assert np.isfinite(float(loss))
        d0 = state.params["core"]["detector"]["class_embed"]["kernel"]
        d1 = s.params["core"]["detector"]["class_embed"]["kernel"]
        assert not np.allclose(np.asarray(d0), np.asarray(d1))

    def test_indivisible_batch_raises(self):
        state, step, data = self._setup(accum=3)
        with pytest.raises(ValueError, match="not divisible"):
            step(state, data, jax.random.key(1))


class TestFreezeMask:
    def test_labels(self):
        model, state, _, _ = setup()
        labels = param_labels(state.params)
        flat = {
            jax.tree_util.keystr(p): l
            for p, l in jax.tree_util.tree_leaves_with_path(labels)
        }
        stem = [l for k, l in flat.items() if "body" in k and "conv1" in k and "layer" not in k]
        assert all(l == "frozen" for l in stem) and stem
        l3 = [l for k, l in flat.items() if "layer3" in k and "body" in k]
        assert all(l == "backbone" for l in l3) and l3
        dec = [l for k, l in flat.items() if "decoder" in k]
        assert all(l == "main" for l in dec) and dec

    def test_frozen_params_never_move(self):
        model, state, step, data = setup()
        new_state, *_ = step(state, data, jax.random.key(1))
        stem_before = state.params["core"]["separate_encoder"]["backbone"]["body"]["conv1"]["kernel"]
        stem_after = new_state.params["core"]["separate_encoder"]["backbone"]["body"]["conv1"]["kernel"]
        np.testing.assert_array_equal(np.asarray(stem_before), np.asarray(stem_after))
        # trainable head params DO move (class_embed always has gradient;
        # bbox_embed's early layers are exactly zero-grad at init)
        d_before = state.params["core"]["detector"]["class_embed"]["kernel"]
        d_after = new_state.params["core"]["detector"]["class_embed"]["kernel"]
        assert not np.allclose(np.asarray(d_before), np.asarray(d_after))

    def test_stop_grad_frozen_is_exact(self):
        """freeze_stem severs the backward at the stem+layer1 boundary;
        trainable-param grads must be bit-identical to the full backward
        (the frozen grads were zeroed by the optimizer mask anyway)."""
        import tests.test_models as tm
        from future_od_tpu.models.st_detr import compute_loss, normalize_outputs

        data = tm.make_data(np.random.default_rng(0), B=2, L=2, H=64, W=64, N=8)
        cfgs = {}
        for freeze in (True, False):
            args = SpatioTemporalDETRArgs(**TINY, freeze_stem=freeze)
            model = build_flagship(args)
            variables = model.init({"params": jax.random.key(0)}, data)

            def loss_fn(params, args=args, model=model, variables=variables):
                out = model.apply(
                    {"params": params, "frozen": variables["frozen"]},
                    data,
                    deterministic=False,
                    rngs={"dropout": jax.random.key(7)},
                )
                annotated, _, _ = normalize_outputs(out, data)
                loss, _ = compute_loss(annotated, data, args.criterion_config())
                return loss

            cfgs[freeze] = (
                jax.grad(loss_fn)(variables["params"]),
                param_labels(variables["params"]),
            )

        g_stop, labels = cfgs[True]
        g_full, _ = cfgs[False]
        flat_stop = jax.tree_util.tree_leaves_with_path(g_stop)
        flat_full = dict(
            (jax.tree_util.keystr(p), l)
            for p, l in jax.tree_util.tree_leaves_with_path(g_full)
        )
        flat_labels = dict(
            (jax.tree_util.keystr(p), l)
            for p, l in jax.tree_util.tree_leaves_with_path(labels)
        )
        saw_frozen_nonzero = False
        for path, g in flat_stop:
            key = jax.tree_util.keystr(path)
            if flat_labels[key] == "frozen":
                assert not np.asarray(jnp.abs(g)).max() > 0, key
                if np.asarray(jnp.abs(flat_full[key])).max() > 0:
                    saw_frozen_nonzero = True
            else:
                np.testing.assert_array_equal(
                    np.asarray(g), np.asarray(flat_full[key]), err_msg=key
                )
        # the severed backward really removed work: at least one frozen
        # param had a nonzero grad in the full arm
        assert saw_frozen_nonzero


class TestMixedPrecision:
    def test_bf16_step_matches_f32_roughly(self):
        _, state32, step32, data = setup(mixed=False)
        _, state16, step16, _ = setup(mixed=True)
        _, loss32, *_ = step32(state32, data, jax.random.key(1))
        _, loss16, *_ = step16(state16, data, jax.random.key(1))
        assert np.isfinite(float(loss16))
        np.testing.assert_allclose(float(loss16), float(loss32), rtol=0.05)

    def test_params_stay_f32(self):
        _, state, step, data = setup(mixed=True)
        new_state, *_ = step(state, data, jax.random.key(1))
        dtypes = {x.dtype for x in jax.tree.leaves(new_state.params)}
        assert dtypes == {jnp.dtype(jnp.float32)}

    def test_uint8_video_survives_bf16_cast(self):
        """Regression: the mixed-precision video cast must NOT touch uint8
        video — an astype(bf16) there leaves 0-255 values that skip the
        backbone's device_normalize dtype check, silently training on raw
        pixels. uint8-fed and host-normalized-f32-fed bf16 steps must agree
        exactly (device normalization is bitwise-equal by construction)."""
        from future_od_tpu.data.transforms import remap_and_normalize

        _, state, step, data = setup(mixed=True)
        rng = np.random.default_rng(3)
        u8 = rng.integers(
            0, 256, size=data["video"].shape
        ).astype(np.uint8)
        data_u8 = dict(data, video=jnp.asarray(u8))
        data_f32 = dict(
            data, video=jnp.asarray(remap_and_normalize(u8))
        )
        _, loss_u8, *_ = step(state, data_u8, jax.random.key(1))
        _, loss_f32, *_ = step(state, data_f32, jax.random.key(1))
        assert float(loss_u8) == float(loss_f32)


class TestMatcherTelemetry:
    def test_rounds_and_unmatched_in_losses_and_stats(self):
        import tests.test_models as tm
        from future_od_tpu.models.st_detr import compute_loss, normalize_outputs

        args = SpatioTemporalDETRArgs(**TINY)
        model = build_flagship(args)
        data = tm.make_data(np.random.default_rng(3), B=2, L=2, H=64, W=64, N=6, num_classes=4)
        variables = model.init({"params": jax.random.key(0)}, data)
        out = model.apply(variables, data, deterministic=True)
        annotated, _, _ = normalize_outputs(out, data)
        _, stats = compute_loss(annotated, data, args.criterion_config())
        assert float(stats["matcher_rounds"]) >= 1.0
        # 8 queries >= 6 target slots: the auction must match every active
        assert float(stats["matcher_unmatched"]) == 0.0

    def test_solver_round_contract(self):
        from future_od_tpu.ops.matching import auction_assignment, hungarian_assignment

        rng = np.random.default_rng(0)
        cost = jnp.asarray(rng.normal(size=(3, 8, 5)).astype(np.float32))
        active = jnp.asarray(rng.uniform(size=(3, 5)) < 0.8)
        idx, rounds = auction_assignment(cost, active, return_rounds=True)
        assert idx.shape == (3, 5) and rounds.shape == (3,)
        assert np.all(np.asarray(rounds) >= (np.asarray(active).sum(-1) > 0))
        # plain call keeps the old contract
        idx_only = auction_assignment(cost, active)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_only))
        h_idx, h_rounds = hungarian_assignment(cost, active, return_rounds=True)
        assert np.all(np.asarray(h_rounds) == 0)


class TestMaskLosses:
    def _setup(self, invert=False):
        from future_od_tpu.models.set_criterion import CriterionConfig, set_criterion

        B, M, N, C = 2, 6, 4, 3
        rng = np.random.default_rng(0)
        boxes = np.full((B, N, 4), 0.5, np.float32)
        targets = {
            "boxes": jnp.asarray(boxes),
            "labels": jnp.asarray(rng.integers(0, C, (B, N))),
            "active": jnp.asarray(np.ones((B, N), bool)),
            "masks": jnp.asarray((rng.uniform(size=(B, N, 16, 16)) < 0.5).astype(np.float32)),
        }
        # predictions: queries 0..N-1 perfectly aligned with targets
        logits = np.full((B, M, C), -4.0, np.float32)
        pred_boxes = np.full((B, M, 4), 0.5, np.float32)
        masks_small = np.asarray(
            jax.image.resize(targets["masks"], (B, N, 8, 8), method="linear")
        )
        pred_masks = np.full((B, M, 8, 8), 0.0, np.float32)
        sign = -1.0 if invert else 1.0
        pred_masks[:, :N] = sign * 8.0 * (masks_small - 0.5)
        outputs = {
            "pred_logits": jnp.asarray(logits),
            "pred_boxes": jnp.asarray(pred_boxes),
            "pred_masks": jnp.asarray(pred_masks),
        }
        cfg = CriterionConfig(num_classes=C, masks=True, aux_loss=False)
        return set_criterion(outputs, targets, cfg), cfg

    def test_mask_losses_present_and_ordered(self):
        from future_od_tpu.models.set_criterion import weighted_total

        losses_good, cfg = self._setup(invert=False)
        losses_bad, _ = self._setup(invert=True)
        for key in ("loss_mask", "loss_dice"):
            assert np.isfinite(float(losses_good[key]))
            assert float(losses_good[key]) < float(losses_bad[key])
        total, weights = weighted_total(losses_good, cfg, num_aux=0)
        assert "loss_mask" in weights and "loss_dice" in weights
        assert np.isfinite(float(total))

    def test_compute_loss_threads_mask_targets(self):
        # masks=True end-to-end through compute_loss: batch masks become
        # targets["masks"]; a batch without them fails loudly (ADVICE r2)
        import pytest

        from future_od_tpu.models.set_criterion import CriterionConfig
        from future_od_tpu.models.st_detr import compute_loss

        rng = np.random.default_rng(5)
        B, M, N, C, H, W = 2, 6, 4, 3, 16, 16
        boxes_wh = np.abs(rng.normal(size=(B, N, 4))).astype(np.float32) * 4 + 1
        data = {
            "video": jnp.zeros((B, 1, H, W, 3)),
            "boxes": jnp.asarray(
                np.concatenate(
                    [boxes_wh[..., :2], boxes_wh[..., :2] + boxes_wh[..., 2:]], -1
                )
            ),
            "classes": jnp.asarray(rng.integers(0, C, size=(B, N))),
            "active": jnp.ones((B, N), jnp.int64),
            "masks": jnp.asarray(
                (rng.uniform(size=(B, N, H, W)) < 0.5).astype(np.float32)
            ),
        }
        outputs = {
            "pred_logits": jnp.asarray(rng.normal(size=(B, M, C)).astype(np.float32)),
            "pred_boxes": jax.nn.sigmoid(
                jnp.asarray(rng.normal(size=(B, M, 4)).astype(np.float32))
            ),
            "pred_masks": jnp.asarray(
                rng.normal(size=(B, M, 8, 8)).astype(np.float32)
            ),
        }
        cfg = CriterionConfig(num_classes=C, masks=True, aux_loss=False)
        loss, stats = compute_loss(outputs, data, cfg)
        assert np.isfinite(float(loss))
        with pytest.raises(ValueError, match="masks"):
            compute_loss(
                outputs, {k: v for k, v in data.items() if k != "masks"}, cfg
            )


class TestGradAudit:
    def test_planted_dead_param_is_reported(self):
        # The epoch-1 audit (reference trainer.py:181-185): a parameter that
        # does not influence the loss has an identically-zero gradient and
        # must be named; frozen-labeled params are excluded by design.
        from flax import linen as nn

        import tests.test_models as tm
        from future_od_tpu.train.optimizer import param_labels
        from future_od_tpu.train.step import dead_param_names, make_grad_report

        class WithDead(nn.Module):
            model: object

            @nn.compact
            def __call__(self, data, deterministic=True, **kw):
                self.param("dead_weight", nn.initializers.ones, (4,))
                return self.model(data, deterministic=deterministic, **kw)

        args = SpatioTemporalDETRArgs(**TINY)
        model = WithDead(model=build_flagship(args))
        data = tm.make_data(np.random.default_rng(3), B=2, L=2, H=64, W=64, N=8)
        variables = model.init(
            {"params": jax.random.key(0), "dropout": jax.random.key(1)},
            data, deterministic=False,
        )
        state = TrainState(
            variables["params"], variables["frozen"], (), jnp.int32(0)
        )
        report = make_grad_report(model, args.criterion_config())
        norms = jax.device_get(report(state, data, jax.random.key(2)))
        dead = dead_param_names(norms, param_labels(state.params))
        assert any("dead_weight" in name for name in dead)
        # known-live params must NOT be reported (exhaustive liveness does
        # not hold at init: the zero-initialized bbox head back-propagates
        # exact zeros on step 0, and attention key-projection biases are
        # structurally grad-free through the softmax's shift invariance —
        # both also true of the reference's torch modules)
        for name in dead:
            assert "class_embed" not in name and "backbone" not in name, name


class TestHostMatchedSplitStep:
    """The exact-Hungarian arm for callback-less backends: split step (jitted
    cost pass -> host JV -> jitted grad pass) must reproduce the in-jit
    pure_callback hungarian step exactly."""

    def test_matches_injit_hungarian_train_step(self):
        import tests.test_models as tm
        from future_od_tpu.train.step import make_host_matched_steps

        args = SpatioTemporalDETRArgs(**{**TINY, "matcher": "hungarian"})
        model = build_flagship(args)
        data = tm.make_data(np.random.default_rng(7), B=2, L=2, H=64, W=64, N=8)
        variables = model.init({"params": jax.random.key(0)}, data)
        tx, opt_state = build_optimizer(
            variables["params"], lr=1e-4, lr_backbone=1e-5, max_norm=0.1
        )
        state = TrainState(
            variables["params"], variables["frozen"], opt_state, jnp.int32(0)
        )
        cfg = args.criterion_config()
        injit = jax.jit(make_train_step(model, cfg, tx))
        split_train, split_eval = make_host_matched_steps(model, cfg, tx)

        rng = jax.random.key(1)
        s1, loss1, stats1, _, _ = injit(state, data, rng)
        s2, loss2, stats2, _, _ = split_train(state, data, rng)
        np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
        for k in ("labels", "box_l1", "box_giou"):
            np.testing.assert_allclose(
                float(stats1[k]), float(stats2[k]), rtol=1e-6, err_msg=k
            )
        moved = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), s1.params, s2.params
        )
        assert max(jax.tree.leaves(moved)) < 1e-6

        # eval side too
        eval_injit = jax.jit(
            __import__(
                "future_od_tpu.train.step", fromlist=["make_eval_step"]
            ).make_eval_step(model, cfg)
        )
        l1, st1, _, _ = eval_injit(state, data)
        l2, st2, _, _ = split_eval(state, data)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)

    def test_tracker_eval_host_matched_matches_injit(self):
        # The tracker+hungarian combination on callback-less backends routes
        # finish() through the split criterion (jitted costs -> host JV ->
        # jitted loss); on CPU both arms run, so they must agree exactly.
        import tests.test_models as tm
        from future_od_tpu.models.build import build_tracker_baseline
        from future_od_tpu.models.tracker import TrackerFuturePredictor
        from future_od_tpu.train.step import make_tracker_eval_step

        args = SpatioTemporalDETRArgs(**{**TINY, "matcher": "hungarian"})
        model = build_tracker_baseline(args)
        data = tm.make_data(
            np.random.default_rng(11), B=2, L=3, H=64, W=64, N=8,
            with_offsets=True, num_classes=4,
        )
        variables = model.init({"params": jax.random.key(0)}, data)
        state = TrainState(
            variables["params"], variables["frozen"], (), jnp.int32(0)
        )
        cfg = args.criterion_config()
        tracker = TrackerFuturePredictor()
        injit = make_tracker_eval_step(model, cfg, tracker)
        split = make_tracker_eval_step(model, cfg, tracker, host_matched=True)
        l1, st1, _, _ = injit(state, data)
        l2, st2, _, _ = split(state, data)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
        for k in ("labels", "box_l1", "box_giou"):
            np.testing.assert_allclose(
                float(st1[k]), float(st2[k]), rtol=1e-6, err_msg=k
            )


class TestMatcherParity:
    def test_auction_vs_hungarian_loss(self):
        # Same params/data: the on-device auction's matching must give a loss
        # within a fraction of a percent of the exact Hungarian's (near-ties
        # may match differently; their loss contribution is tiny by
        # construction).
        import tests.test_models as tm
        from future_od_tpu.models.st_detr import compute_loss, normalize_outputs

        args = SpatioTemporalDETRArgs(**TINY)
        model = build_flagship(args)
        data = tm.make_data(np.random.default_rng(5), B=2, L=2, H=64, W=64, N=16, num_classes=4)
        variables = model.init({"params": jax.random.key(0)}, data)
        out = model.apply(variables, data, deterministic=True)
        annotated, _, _ = normalize_outputs(out, data)
        losses = {}
        for matcher in ["auction", "hungarian"]:
            cfg = SpatioTemporalDETRArgs(**{**TINY, "matcher": matcher}).criterion_config()
            loss, _ = compute_loss(annotated, data, cfg)
            losses[matcher] = float(loss)
        assert losses["auction"] >= losses["hungarian"] - 1e-4  # exact is optimal
        np.testing.assert_allclose(
            losses["auction"], losses["hungarian"], rtol=5e-3
        )


class TestNonfiniteGuard:
    """_guarded_apply: non-finite grads must skip the update (params AND
    optimizer moments unchanged, step still advances, stat set); finite
    steps must be bit-identical to the unguarded path."""

    def test_nonfinite_batch_skips_update(self):
        model, state, step, data = setup()
        poisoned = dict(data)
        poisoned["video"] = data["video"].astype(jnp.float32).at[0, 0, 0, 0, 0].set(
            jnp.nan
        )
        new_state, loss, stats, _, _ = step(state, poisoned, jax.random.key(0))
        assert float(stats["nonfinite_skipped"]) == 1.0
        assert int(new_state.step) == int(state.step) + 1
        for old, new in zip(
            jax.tree.leaves(state.params), jax.tree.leaves(new_state.params)
        ):
            np.testing.assert_array_equal(np.asarray(old), np.asarray(new))
        for old, new in zip(
            jax.tree.leaves(state.opt_state), jax.tree.leaves(new_state.opt_state)
        ):
            np.testing.assert_array_equal(np.asarray(old), np.asarray(new))

    def test_finite_step_bit_identical_to_unguarded(self):
        import tests.test_models as tm
        from future_od_tpu.models.build import build_flagship
        from future_od_tpu.train.optimizer import build_optimizer
        from future_od_tpu.train.step import make_train_step

        args = SpatioTemporalDETRArgs(**TINY)
        model = build_flagship(args)
        data = tm.make_data(np.random.default_rng(0), B=2, L=2, H=64, W=64, N=8)
        variables = model.init({"params": jax.random.key(0)}, data)
        tx, opt_state = build_optimizer(
            variables["params"], lr=1e-4, lr_backbone=1e-5, max_norm=0.1
        )
        state = TrainState(
            variables["params"], variables["frozen"], opt_state, jnp.int32(0)
        )
        cfg = args.criterion_config()
        guarded = jax.jit(make_train_step(model, cfg, tx, skip_nonfinite=True))
        unguarded = jax.jit(make_train_step(model, cfg, tx, skip_nonfinite=False))
        sg, _, stats_g, _, _ = guarded(state, data, jax.random.key(0))
        su, _, stats_u, _, _ = unguarded(state, data, jax.random.key(0))
        assert float(stats_g["nonfinite_skipped"]) == 0.0
        assert "nonfinite_skipped" not in stats_u
        for a, b in zip(jax.tree.leaves(sg.params), jax.tree.leaves(su.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
