"""End-to-end trainer tests on the synthetic dataset (the reference's
`--debug` mini-split operational smoke, SURVEY.md §4): full epochs through the
jitted train/eval steps, AP aggregation, checkpoint save/load/resume."""
import os

import numpy as np
import pytest

from future_od_tpu.data.loader import Loader, VAL_SEED
from future_od_tpu.data.synthetic import CATEGORY_DICT, SyntheticClipDataset
from future_od_tpu.models.build import build_flagship
from future_od_tpu.models.st_detr import SpatioTemporalDETRArgs
from future_od_tpu.train.trainer import Trainer
from future_od_tpu.utils.wandb import WandBConfig

TINY = dict(
    num_classes=2, num_queries=12, hidden_dim=32, enc_layers=1, dec_layers=2,
    dim_feedforward=64, enc_nheads=4, nheads=4, lr=1e-4, lr_backbone=1e-4,
)


def make_trainer(tmp_path, n_train=8, n_val=4, batch=2, mesh=None,
                 val_drop_last=True, **arg_overrides):
    args = SpatioTemporalDETRArgs(**{**TINY, **arg_overrides})
    model = build_flagship(args)
    train_ds = SyntheticClipDataset(
        num_samples=n_train, image_size=(64, 96), max_objects=3, seed=1
    )
    val_ds = SyntheticClipDataset(
        num_samples=n_val, image_size=(64, 96), max_objects=3, seed=2
    )
    train_loader = Loader(train_ds, batch_size=batch, shuffle=True, num_workers=2)
    val_loader = Loader(
        val_ds, batch_size=batch, shuffle=False, seed=VAL_SEED, num_workers=2,
        drop_last=val_drop_last,
    )
    trainer = Trainer(
        model=model,
        detr_args=args,
        mesh=mesh,
        train_loader=train_loader,
        val_loaders={"val0": val_loader},
        checkpoint_path=str(tmp_path / "ckpt"),
        visualization_path=str(tmp_path / "vis"),
        save_name="e2e_test",
        category_dict=CATEGORY_DICT,
        lr_func=lambda e: 1.0,
        print_interval=100,
        visualization_epochs={1},
        visualization_iterations={0},
        checkpoint_epochs=True,
        wandb_config=WandBConfig(enabled=False),
    )
    return trainer, args


@pytest.mark.slow
class TestEndToEnd:
    def test_train_eval_checkpoint_resume(self, tmp_path):
        trainer, args = make_trainer(tmp_path)
        trainer.train(max_epochs=2)
        assert trainer._epoch == 2
        # loss meters populated with finite values and history advanced
        m = trainer._stats["train labels loss"]
        assert len(m.history) == 2 and np.isfinite(m.history[-1])
        # AP got aggregated
        assert hasattr(trainer, "_last_ap")
        assert trainer._last_ap["all"].shape[0] == 10
        # checkpoint exists; PNG visualization written
        assert os.path.exists(tmp_path / "ckpt" / "e2e_test")
        assert os.path.exists(tmp_path / "ckpt" / "e2e_test_final")
        vis_files = list((tmp_path / "vis").glob("*.png"))
        assert vis_files, "expected PNG visualizations"

        # resume: a fresh trainer loads epoch 2 and continues to 3
        trainer2, _ = make_trainer(tmp_path)
        trainer2.load_checkpoint()
        assert trainer2._epoch == 2
        p_before = np.asarray(
            next(iter(jax_leaves(trainer2.state.params)))
        ).copy()
        trainer2.train(max_epochs=3)
        assert trainer2._epoch == 3
        p_after = np.asarray(next(iter(jax_leaves(trainer2.state.params))))
        assert not np.allclose(p_before, p_after), "params did not update"

    def test_params_only_load(self, tmp_path):
        trainer, args = make_trainer(tmp_path)
        trainer.train(max_epochs=1)
        trainer2, _ = make_trainer(tmp_path)
        trainer2.load_checkpoint(
            str(tmp_path / "ckpt" / "e2e_test_final"), load_only_net=True
        )
        assert trainer2._epoch == 0  # only net loaded
        trainer2.eval()  # must run cleanly from loaded weights

    def test_tracker_baseline_eval_e2e(self, tmp_path):
        # The non-learned tracker baseline (paper.py:689-703): per-frame
        # detections on the two past frames are tracked + extrapolated on
        # host, and the result flows through loss/post-proc/AP like any
        # other prediction.
        from future_od_tpu.models.build import build_tracker_baseline
        from future_od_tpu.models.tracker import TrackerFuturePredictor

        args = SpatioTemporalDETRArgs(**TINY)
        model = build_tracker_baseline(args)
        val_ds = SyntheticClipDataset(
            num_samples=4, image_size=(64, 96), max_objects=3, seed=2
        )
        val_loader = Loader(
            val_ds, batch_size=2, shuffle=False, seed=VAL_SEED, num_workers=2
        )
        trainer = Trainer(
            model=model,
            detr_args=args,
            train_loader=None,
            val_loaders={"val0": val_loader},
            checkpoint_path=str(tmp_path / "ckpt"),
            visualization_path=str(tmp_path / "vis"),
            save_name="tracker_e2e",
            category_dict=CATEGORY_DICT,
            checkpoint_epochs=False,
            wandb_config=WandBConfig(enabled=False),
            tracker=TrackerFuturePredictor(),
        )
        trainer.eval()
        assert hasattr(trainer, "_last_ap")
        ap50 = trainer._last_ap["all"][0, :, 0]
        assert ap50.shape == (len(CATEGORY_DICT),)
        assert np.all(np.isfinite(ap50) | np.isnan(ap50))
        m = trainer._stats["val0 box_l1 loss"]
        assert np.isfinite(m.avg)

    def test_tracker_baseline_checkpoint_compat_with_single_frame(self, tmp_path):
        # A single-frame-trained checkpoint loads directly into the tracker
        # baseline (identical param tree) — the reference trains the tracker
        # baseline's detector at L=1 the same way.
        import jax

        from future_od_tpu.models.build import build_single_frame, build_tracker_baseline

        args = SpatioTemporalDETRArgs(**TINY)
        sf = build_single_frame(args)
        tb = build_tracker_baseline(args)
        ds = SyntheticClipDataset(num_samples=2, image_size=(64, 96), seed=3)
        batch = Loader(ds, batch_size=2, num_workers=0).__iter__().__next__()
        from future_od_tpu.data.loader import ARRAY_KEYS

        data = {k: v for k, v in batch.items() if k in ARRAY_KEYS}
        single = dict(data)
        single["video"] = data["video"][:, -1:]
        for k in ("translation", "acceleration", "rotation", "rotation_rate", "speed",
                  "temporal_offsets"):
            single[k] = data[k][:, -1:]
        v_sf = sf.init({"params": jax.random.key(0)}, single, deterministic=True)
        v_tb = tb.init({"params": jax.random.key(0)}, data, deterministic=True)
        assert jax.tree.structure(v_sf["params"]) == jax.tree.structure(v_tb["params"])

    def test_mesh_epoch_with_ragged_val_batch(self, tmp_path):
        """A dp-mesh epoch must survive the val loader's trailing partial
        batch (val keeps drop_last=False in the run scripts): batches that
        don't divide the data axis fall back to replicated placement
        (trainer._device_batch) instead of crashing device_put."""
        from future_od_tpu.parallel.mesh import make_mesh

        trainer, _ = make_trainer(
            tmp_path, n_train=4, n_val=5, batch=2,
            mesh=make_mesh(2, 1), val_drop_last=False,
        )
        # [2, 2, 1] val batches: the final one is ragged
        assert len(trainer._val_loaders["val0"]) == 3
        trainer.train(1)
        trainer.eval()
        for key, meter in trainer._stats.items():
            if meter.count:
                assert np.isfinite(meter.avg), key
        assert any(
            meter.count for key, meter in trainer._stats.items()
            if key.startswith("val0")
        )

    def test_behavioral_arch_mismatch_warns_on_load(self, tmp_path, capsys):
        """encode_offset is param-free: a mismatched load succeeds silently
        at the tree level, so the trainer must warn from the meta sidecar."""
        trainer, _ = make_trainer(tmp_path)
        trainer.save_checkpoint()
        trainer.flush_saves()  # commit before another instance reads it
        other, _ = make_trainer(tmp_path, encode_offset=True)
        other.load_checkpoint()
        out = capsys.readouterr().out
        assert "encode_offset=False" in out and "WARNING" in out

    def test_pipelined_loop_matches_blocking(self, tmp_path, monkeypatch):
        """The one-step-lagged host loop (dispatch step i+1 before fetching
        step i's stats) must be a pure scheduling change: meters and AP are
        identical to the reference-style blocking loop
        (FUTURE_OD_NO_PIPELINE=1)."""
        trainer, _ = make_trainer(tmp_path, n_train=4, batch=2)
        trainer._save_checkpoints = False
        trainer.train(max_epochs=1)
        stats_pipe = {
            k: m.avg for k, m in trainer._stats.items() if m.count
        }
        ap_pipe = trainer._last_ap

        monkeypatch.setenv("FUTURE_OD_NO_PIPELINE", "1")
        trainer2, _ = make_trainer(tmp_path, n_train=4, batch=2)
        trainer2._save_checkpoints = False
        trainer2.train(max_epochs=1)
        stats_block = {
            k: m.avg for k, m in trainer2._stats.items() if m.count
        }
        assert stats_pipe.keys() == stats_block.keys()
        for k in stats_pipe:
            np.testing.assert_allclose(
                stats_pipe[k], stats_block[k], rtol=1e-6, err_msg=k
            )
        np.testing.assert_allclose(
            ap_pipe["all"], trainer2._last_ap["all"], equal_nan=True
        )

    def test_loss_decreases_on_overfit(self, tmp_path):
        # overfit 4 fixed clips for several epochs: total train loss must drop
        trainer, args = make_trainer(tmp_path, n_train=4, batch=2)
        trainer._save_checkpoints = False
        trainer.train(max_epochs=6)
        hist = trainer._stats["train box_l1 loss"].history
        first, last = hist[0], hist[-1]
        assert last < first, f"box_l1 did not decrease: {hist}"


def jax_leaves(tree):
    import jax

    return jax.tree.leaves(tree)
