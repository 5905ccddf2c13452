"""Mesh/sharding tests on the 8-virtual-CPU-device platform: dp-only and
dp x tp training steps must agree with the single-device result."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from future_od_tpu.models.build import build_flagship
from future_od_tpu.models.st_detr import SpatioTemporalDETRArgs
from future_od_tpu.parallel.mesh import batch_sharding, make_mesh, param_shardings
from future_od_tpu.train.optimizer import build_optimizer
from future_od_tpu.train.step import TrainState, make_train_step

TINY = dict(
    num_classes=4, num_queries=8, hidden_dim=32, enc_layers=1, dec_layers=1,
    dim_feedforward=64, enc_nheads=2, nheads=2, lr_backbone=1e-4,
)


def setup(B=8, matcher="auction"):
    import tests.test_models as tm

    args = SpatioTemporalDETRArgs(**{**TINY, "matcher": matcher})
    model = build_flagship(args)
    data = tm.make_data(np.random.default_rng(0), B=B, L=2, H=64, W=64, N=8)
    variables = model.init({"params": jax.random.key(0)}, data)
    tx, opt_state = build_optimizer(
        variables["params"], lr=1e-4, lr_backbone=1e-4, max_norm=0.1
    )
    state = TrainState(variables["params"], variables["frozen"], opt_state, jnp.int32(0))
    step = make_train_step(model, args.criterion_config(), tx)
    if matcher != "auction":
        return model, state, step, data, args
    return model, state, step, data


class TestSharding:
    def test_mesh_shapes(self):
        mesh = make_mesh(num_data=4, num_model=2)
        assert dict(mesh.shape) == {"data": 4, "model": 2}
        mesh = make_mesh()
        assert mesh.shape["data"] * mesh.shape["model"] == 8

    def test_param_shardings_model_axis(self):
        mesh = make_mesh(num_data=4, num_model=2)
        model, state, _, _ = setup()
        shardings = param_shardings(state.params, mesh)
        flat = jax.tree_util.tree_leaves_with_path(shardings)
        specs = {jax.tree_util.keystr(p): s.spec for p, s in flat}
        # FFN up-projection column-parallel, down row-parallel
        fc1 = [s for k, s in specs.items() if "feedforward" in k and "fc1" in k and "kernel" in k]
        fc2 = [s for k, s in specs.items() if "feedforward" in k and "fc2" in k and "kernel" in k]
        assert all(s == P(None, "model") for s in fc1) and fc1
        assert all(s == P("model", None) for s in fc2) and fc2
        # backbone convs replicated
        conv = [s for k, s in specs.items() if "body" in k and "kernel" in k]
        assert all(s == P() for s in conv)

    def test_dp_matches_single_device(self):
        # one train step, replicated vs dp-sharded batch: same loss and params
        model, state, step, data = setup(B=8)
        rng = jax.random.key(1)
        single = jax.jit(step)
        s1, loss1, stats1, _, _ = single(state, data, rng)

        mesh = make_mesh(num_data=8, num_model=1)
        repl = NamedSharding(mesh, P())
        state_sh = TrainState(
            params=jax.tree.map(lambda _: repl, state.params),
            frozen=jax.tree.map(lambda _: repl, state.frozen),
            opt_state=jax.tree.map(lambda _: repl, state.opt_state),
            step=repl,
        )
        data_sh = jax.tree.map(lambda _: batch_sharding(mesh), data)
        model2, state2, step2, data2 = setup(B=8)
        state2 = jax.device_put(state2, state_sh)
        data2 = jax.device_put(data2, data_sh)
        sharded = jax.jit(
            step2, in_shardings=(state_sh, data_sh, repl),
            out_shardings=(state_sh, repl, repl, repl, repl),
        )
        s2, loss2, stats2, _, _ = sharded(state2, data2, rng)
        np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-4)
        l1 = jax.tree.leaves(s1.params)[0]
        l2 = jax.tree.leaves(s2.params)[0]
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=2e-5)

    def test_dp_accum_matches_single_device(self):
        """Gradient accumulation under a dp mesh: the interleaved micro-split
        is shard-local (each device's contiguous shard contributes local/K
        rows to every micro-batch), so the accumulated step must equal the
        unsharded unsplit step — same loss, same updated params."""
        import tests.test_models as tm

        args = SpatioTemporalDETRArgs(**TINY, dropout=0.0)
        model = build_flagship(args)
        data = tm.make_data(np.random.default_rng(0), B=8, L=2, H=64, W=64, N=8)
        variables = model.init({"params": jax.random.key(0)}, data)
        tx, opt_state = build_optimizer(
            variables["params"], lr=1e-4, lr_backbone=1e-4, max_norm=0.1
        )
        state = TrainState(
            variables["params"], variables["frozen"], opt_state, jnp.int32(0)
        )
        rng = jax.random.key(1)
        base = jax.jit(make_train_step(model, args.criterion_config(), tx))
        s1, loss1, *_ = base(state, data, rng)

        mesh = make_mesh(num_data=8, num_model=1)
        repl = NamedSharding(mesh, P())
        state_sh = TrainState(
            params=jax.tree.map(lambda _: repl, state.params),
            frozen=jax.tree.map(lambda _: repl, state.frozen),
            opt_state=jax.tree.map(lambda _: repl, state.opt_state),
            step=repl,
        )
        state2 = jax.device_put(state, state_sh)
        data2 = jax.device_put(
            data, jax.tree.map(lambda _: batch_sharding(mesh), data)
        )
        accum = jax.jit(
            make_train_step(model, args.criterion_config(), tx, accum_steps=2),
            in_shardings=(
                state_sh, jax.tree.map(lambda _: batch_sharding(mesh), data), repl
            ),
            out_shardings=(state_sh, repl, repl, repl, repl),
        )
        s2, loss2, *_ = accum(state2, data2, rng)
        np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-4)
        l1, l2 = jax.tree.leaves(s1.params)[0], jax.tree.leaves(s2.params)[0]
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=2.5e-4)

    def test_host_matched_split_step_on_dp_mesh(self):
        # --matcher hungarian's split-step arm over a data-parallel mesh
        # (VERDICT r2 next #8): the jitted cost pass gathers replicated costs,
        # the host JV solve feeds the sharded grad pass, and the result equals
        # the in-jit pure_callback hungarian step on the same global batch.
        from future_od_tpu.train.step import make_host_matched_steps

        model, state, step, data, args = setup(B=8, matcher="hungarian")
        rng = jax.random.key(1)
        s1, loss1, stats1, _, _ = jax.jit(step)(state, data, rng)

        mesh = make_mesh(num_data=8, num_model=1)
        repl = NamedSharding(mesh, P())
        state_sh = TrainState(
            params=jax.tree.map(lambda _: repl, state.params),
            frozen=jax.tree.map(lambda _: repl, state.frozen),
            opt_state=jax.tree.map(lambda _: repl, state.opt_state),
            step=repl,
        )
        model2, state2, _, data2, _ = setup(B=8, matcher="hungarian")
        state2 = jax.device_put(state2, state_sh)
        data2 = jax.device_put(
            data2, jax.tree.map(lambda _: batch_sharding(mesh), data2)
        )
        from future_od_tpu.train.optimizer import build_optimizer

        tx, _ = build_optimizer(
            state.params, lr=1e-4, lr_backbone=1e-4, max_norm=0.1
        )
        split_train, split_eval = make_host_matched_steps(
            model2, args.criterion_config(), tx,
            mesh=mesh, state_shardings=state_sh,
        )
        s2, loss2, stats2, _, _ = split_train(state2, data2, rng)
        np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-4)
        l1, l2 = jax.tree.leaves(s1.params)[0], jax.tree.leaves(s2.params)[0]
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=2e-5)
        l_ev, _, _, _ = split_eval(state2, data2)
        assert np.isfinite(float(l_ev))

    def test_dp_tp_runs(self):
        # 4x2 mesh with tensor-parallel params: step executes, loss finite
        model, state, step, data = setup(B=8)
        mesh = make_mesh(num_data=4, num_model=2)
        repl = NamedSharding(mesh, P())
        p_sh = param_shardings(state.params, mesh)
        state_sh = TrainState(
            params=p_sh,
            frozen=jax.tree.map(lambda _: repl, state.frozen),
            opt_state=jax.tree.map(lambda _: repl, state.opt_state),
            step=repl,
        )
        data_sh = jax.tree.map(lambda _: batch_sharding(mesh), data)
        state = jax.device_put(state, state_sh)
        data = jax.device_put(data, data_sh)
        sharded = jax.jit(
            step, in_shardings=(state_sh, data_sh, repl),
            out_shardings=(state_sh, repl, repl, repl, repl),
        )
        _, loss, _, _, _ = sharded(state, data, jax.random.key(1))
        assert np.isfinite(float(loss))


class TestTrainerWithMesh:
    def test_trainer_runs_sharded_epoch(self, tmp_path):
        from future_od_tpu.data.loader import Loader
        from future_od_tpu.data.synthetic import CATEGORY_DICT, SyntheticClipDataset
        from future_od_tpu.models.build import build_flagship
        from future_od_tpu.train.trainer import Trainer
        from future_od_tpu.utils.wandb import WandBConfig

        args = SpatioTemporalDETRArgs(
            num_classes=2, num_queries=8, hidden_dim=32, enc_layers=1, dec_layers=1,
            dim_feedforward=64, enc_nheads=2, nheads=2, lr_backbone=1e-4,
        )
        model = build_flagship(args)
        mesh = make_mesh(num_data=4, num_model=2)
        train_ds = SyntheticClipDataset(num_samples=8, image_size=(64, 96), seed=1)
        val_ds = SyntheticClipDataset(num_samples=4, image_size=(64, 96), seed=2)
        trainer = Trainer(
            model=model,
            detr_args=args,
            train_loader=Loader(train_ds, batch_size=4, shuffle=True, num_workers=2),
            val_loaders={"val0": Loader(val_ds, batch_size=4, num_workers=2)},
            checkpoint_path=str(tmp_path / "ckpt"),
            visualization_path=str(tmp_path / "vis"),
            save_name="mesh_test",
            category_dict=CATEGORY_DICT,
            checkpoint_epochs=False,
            wandb_config=WandBConfig(enabled=False),
            mesh=mesh,
        )
        trainer.train(max_epochs=1)
        assert trainer._epoch == 1
        m = trainer._stats["train labels loss"]
        assert np.isfinite(m.history[-1])


class TestDistributedConfig:
    """Multi-host launch decision logic (parallel/distributed.py) — pure,
    testable without a cluster."""

    def test_single_process_is_none(self):
        from future_od_tpu.parallel.distributed import distributed_config

        assert distributed_config(env={}) is None
        assert distributed_config(env={"SLURM_NTASKS": "1"}) is None

    def test_explicit_env(self):
        from future_od_tpu.parallel.distributed import distributed_config

        cfg = distributed_config(
            env={
                "COORDINATOR_ADDRESS": "10.0.0.1:1234",
                "NUM_PROCESSES": "4",
                "PROCESS_ID": "2",
            }
        )
        assert cfg.coordinator_address == "10.0.0.1:1234"
        assert cfg.num_processes == 4 and cfg.process_id == 2

    def test_slurm_env(self):
        from future_od_tpu.parallel.distributed import distributed_config

        cfg = distributed_config(
            env={
                "SLURM_NTASKS": "2",
                "SLURM_PROCID": "1",
                "SLURM_STEP_NODELIST": "tpu-host[03-04]",
            }
        )
        assert cfg.coordinator_address == "tpu-host03:8476"
        assert cfg.num_processes == 2 and cfg.process_id == 1

    def test_flags_take_precedence(self):
        import argparse

        from future_od_tpu.parallel.distributed import distributed_config

        args = argparse.Namespace(
            dist_coordinator="head:9", dist_num_processes=8, dist_process_id=3
        )
        cfg = distributed_config(
            args, env={"COORDINATOR_ADDRESS": "x:1", "NUM_PROCESSES": "2"}
        )
        assert cfg.coordinator_address == "head:9"
        assert cfg.num_processes == 8 and cfg.process_id == 3

    def test_partial_flags_raise(self):
        import argparse

        import pytest

        from future_od_tpu.parallel.distributed import distributed_config

        # coordinator without num_processes must not silently fall through
        # to env/SLURM/single-process (ADVICE r2)
        args = argparse.Namespace(
            dist_coordinator="head:9", dist_num_processes=None, dist_process_id=None
        )
        with pytest.raises(ValueError):
            distributed_config(args, env={})
        # multi-process without an explicit rank would split-brain on rank 0
        args = argparse.Namespace(
            dist_coordinator="head:9", dist_num_processes=4, dist_process_id=None
        )
        with pytest.raises(ValueError):
            distributed_config(args, env={})
        with pytest.raises(ValueError):
            distributed_config(
                env={"COORDINATOR_ADDRESS": "x:1", "NUM_PROCESSES": "4"}
            )
        # "auto" is the argument-less jax.distributed.initialize arm, not a
        # partial flag set
        args = argparse.Namespace(
            dist_coordinator="auto", dist_num_processes=None, dist_process_id=None
        )
        assert distributed_config(args, env={}) is None

    def test_mesh_axes_keeps_model_axis_intra_host(self):
        from future_od_tpu.parallel.distributed import mesh_axes

        # 4 hosts x 4 local chips, tp=4 -> data axis 4 across hosts
        assert mesh_axes(16, 4, 4) == (4, 4)
        with pytest.raises(AssertionError):
            mesh_axes(16, 4, 8)  # tp would cross hosts
