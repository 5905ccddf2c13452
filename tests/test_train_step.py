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
