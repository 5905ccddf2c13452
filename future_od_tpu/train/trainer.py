"""Epoch-based training/eval driver.

TPU-native re-design of `/root/reference/future_od/trainer.py`: the same
operational surface (epoch loop, per-epoch eval, AverageMeter stats, capped
AP accumulation, hardest-batch tracking, visualization schedule, W&B,
checkpoint save/load, signal-based clean exit) over jitted steps. All compute
stays in one XLA program per step; the host loop only moves scalars, the tiny
AP accumulator tensors, and (on visualization steps) the prediction dict.

Unlike the reference's loop (which blocks on `loss.item()` every iteration),
the epoch loop here runs one step AHEAD of its host bookkeeping: step i+1 is
dispatched before step i's loss/stats/AP tensors are fetched, so host work
(meter updates, prints, AP accumulation — each fetch a full tunnel round trip
on remote-relay backends) overlaps device compute instead of stalling it.
The jitted steps chain on device through the donated TrainState, so no host
value is needed to keep the device busy.
"""
from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from future_od_tpu.metrics.od_map import aggregate_mean_average_precision
from future_od_tpu.models.set_criterion import CriterionConfig
from future_od_tpu.models.st_detr import SpatioTemporalDETRArgs
from future_od_tpu.train.optimizer import build_optimizer, get_lr_func, set_learning_rates
from future_od_tpu.train.step import TrainState, make_eval_step, make_train_step
from future_od_tpu.utils.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    save_checkpoint_async,
)
from future_od_tpu.utils.signals import EXIT, install_signal_handlers
from future_od_tpu.utils.stats import AverageMeter
from future_od_tpu.utils.visualization import visualize, visualize_wandb
from future_od_tpu.utils.wandb import WandBConfig, maybe_import_wandb

AP_IMAGE_CAP = 10_000  # accumulate AP stats from at most 10k images (trainer.py:203-204)


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


class Trainer:
    def __init__(
        self,
        model,
        detr_args: SpatioTemporalDETRArgs,
        train_loader,
        val_loaders,
        checkpoint_path: str,
        visualization_path: str,
        save_name: str,
        category_dict: Dict[int, str],
        lr_func: Optional[Callable[[int], float]] = None,
        print_interval: int = 25,
        visualization_epochs=(),
        visualization_iterations=(0,),
        checkpoint_epochs: bool = True,
        wandb_config: Optional[WandBConfig] = None,
        matching_mode: str = "per level",
        mesh=None,
        seed: int = 0,
        variables: Optional[Dict[str, Any]] = None,
        mixed_precision: bool = False,
        checkpoint_every_iters: int = 0,
        freeze_backbone_stem: bool = True,
        tracker=None,
        prng_impl: str = "rbg",
        accum_steps: int = 1,
    ):
        install_signal_handlers()
        self._model = model
        self._args = detr_args
        self._criterion_cfg = detr_args.criterion_config(matching_mode)
        self._train_loader = train_loader
        self._val_loaders = (
            {f"val{idx}": ldr for idx, ldr in enumerate(val_loaders)}
            if isinstance(val_loaders, (list, tuple))
            else dict(val_loaders)
        )
        if self._train_loader is not None:
            assert len(self._train_loader) > 0, "All loaders must be non-empty"
        assert all(len(l) > 0 for l in self._val_loaders.values()), (
            "All loaders must be non-empty"
        )

        self._checkpoint_path = checkpoint_path
        self._visualization_path = visualization_path
        self._save_name = save_name
        self._category_dict = category_dict
        self._lr_func = lr_func or (lambda e: 1.0)
        self._print_interval = print_interval
        self._visualization_epochs = set(visualization_epochs)
        self._visualization_iterations = set(visualization_iterations)
        self._save_checkpoints = checkpoint_epochs
        self._checkpoint_every_iters = checkpoint_every_iters
        self._wandb_config = wandb_config or WandBConfig()
        self._mesh = mesh
        # Dropout stream PRNG. The train forward draws ~1e9 dropout bits per
        # b32 step (attention-weight + FFN dropout); threefry generates them
        # in ~10 VPU ops/word while "rbg" uses the TPU hardware RNG — measured
        # 300.5 -> 259.2 ms/step bf16 b32 (BENCHMARKS.md round 3). Resume is
        # unaffected: the per-step key is fold_in(seed-key, step).
        self._rng = jax.random.key(seed, impl=prng_impl)
        self._freeze_stem = freeze_backbone_stem
        if getattr(detr_args, "freeze_stem", None) is not None and (
            detr_args.freeze_stem != freeze_backbone_stem
        ):
            # A disagreement is silently wrong in one direction: the model's
            # stop_gradient zeroes stem/layer1 grads while the optimizer
            # believes it is training them.
            raise ValueError(
                "Trainer(freeze_backbone_stem="
                f"{freeze_backbone_stem}) disagrees with "
                f"SpatioTemporalDETRArgs.freeze_stem={detr_args.freeze_stem};"
                " set both flags the same way"
            )
        self._grad_report = None  # built lazily by _grad_audit
        self._dropped_warned = False  # one-shot cost_slots overflow warning
        self._last_ap = None
        # per-mode AP of the most recent epoch; always present so external
        # consumers (tools/matcher_drift.py etc.) get a KeyError with the
        # mode name — not an AttributeError — if an epoch never aggregated
        self._ap_by_mode: Dict[str, Any] = {}

        # Stats meters per (mode, stat key) (trainer.py:71-77) + matcher
        # telemetry (auction rounds / unmatched actives).
        from future_od_tpu.models.st_detr import STAT_IDFS

        self._stat_idfs = STAT_IDFS
        self._stats: Dict[str, AverageMeter] = {}
        for mode in ["train"] + list(self._val_loaders.keys()):
            for key in self._stat_idfs:
                self._stats[f"{mode} {key} loss"] = AverageMeter()
        # emitted by the train step's divergence guard (step.py _guarded_apply)
        self._stats["train nonfinite_skipped loss"] = AverageMeter()
        self._nonfinite_warned = False

        self._epoch = 0
        self._training_iterations = 0
        self._pending_saves = []  # in-flight async checkpoint writes
        self._wandb = None
        self._batch_shard = None  # set below when a mesh is given

        # Initialize params / optimizer / jitted steps.
        if variables is None:
            example = self._example_batch()
            variables = jax.jit(
                lambda k: model.init({"params": k}, example, deterministic=True)
            )(jax.random.key(seed))
        self._tx, opt_state = build_optimizer(
            variables["params"],
            lr=detr_args.lr,
            lr_backbone=detr_args.lr_backbone,
            weight_decay=detr_args.weight_decay,
            max_norm=detr_args.max_norm,
            freeze_stem=freeze_backbone_stem,
        )
        self.state = TrainState(
            params=variables["params"],
            frozen=variables.get("frozen", {}),
            opt_state=opt_state,
            step=jnp.int32(0),
        )
        # Mesh shardings (shared by both step arms): params follow
        # parallel/mesh.py's rules, batches shard on dim 0.
        self._state_shardings = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from future_od_tpu.parallel.mesh import batch_sharding, param_shardings

            repl = NamedSharding(mesh, P())
            self._state_shardings = TrainState(
                params=param_shardings(self.state.params, mesh),
                frozen=jax.tree.map(lambda _: repl, self.state.frozen),
                opt_state=jax.tree.map(lambda _: repl, self.state.opt_state),
                step=repl,
            )
            self._batch_shard = batch_sharding(mesh)
            self._batch_repl = repl
            self._mesh_data = mesh.shape["data"]
            self.state = jax.device_put(self.state, self._state_shardings)
        else:
            self._batch_shard = None

        # Exact-Hungarian on callback-less backends (axon): split-step arm —
        # jitted cost pass -> host C++ JV solve -> jitted grad pass.
        self._host_matched = (
            self._criterion_cfg.matcher == "hungarian"
            and jax.default_backend() not in ("cpu",)
        )
        if self._host_matched:
            from future_od_tpu.train.step import make_host_matched_steps

            if accum_steps != 1:
                raise ValueError(
                    "accum_steps is not supported on the host-matched "
                    "exact-Hungarian arm (it is the parity-validation path, "
                    "not the production trainer)"
                )
            self._train_step, self._eval_step = make_host_matched_steps(
                model, self._criterion_cfg, self._tx,
                mixed_precision=mixed_precision,
                mesh=mesh, state_shardings=self._state_shardings,
            )
            if tracker is not None:
                from future_od_tpu.train.step import make_tracker_eval_step

                # finish() must also avoid the in-jit exact solver here —
                # the tracker eval step gets the split-criterion arm too.
                self._eval_step = make_tracker_eval_step(
                    model, self._criterion_cfg, tracker, host_matched=True
                )
            return

        train_fn = make_train_step(
            model, self._criterion_cfg, self._tx, mixed_precision=mixed_precision,
            accum_steps=accum_steps,
        )
        eval_fn = make_eval_step(model, self._criterion_cfg)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            self._train_step = jax.jit(
                train_fn,
                in_shardings=(self._state_shardings, None, repl),
                out_shardings=(self._state_shardings, repl, repl, repl, repl),
                donate_argnums=(0,),
            )
            self._eval_step = jax.jit(
                eval_fn, in_shardings=(self._state_shardings, None)
            )
        else:
            self._train_step = jax.jit(train_fn, donate_argnums=(0,))
            self._eval_step = jax.jit(eval_fn)
        if tracker is not None:
            # Non-learned tracker baseline (paper.py:689-703): eval runs the
            # host-side tracker between two jitted halves.
            from future_od_tpu.train.step import make_tracker_eval_step

            self._eval_step = make_tracker_eval_step(
                model, self._criterion_cfg, tracker
            )

    # ------------------------------------------------------------------
    def _example_batch(self):
        loader = self._train_loader or next(iter(self._val_loaders.values()))
        return self._device_batch(next(iter(loader)))

    def _device_batch(self, batch):
        from future_od_tpu.data.loader import ARRAY_KEYS

        arrays = {k: v for k, v in batch.items() if k in ARRAY_KEYS}
        if self._batch_shard is not None:
            # ragged trailing eval batches (val loaders keep the partial
            # batch) can't split over the data axis — replicate those; the
            # new shape retraces the eval step anyway
            batch_rows = next(iter(arrays.values())).shape[0]
            shard = (
                self._batch_shard
                if batch_rows % self._mesh_data == 0
                else self._batch_repl
            )
            arrays = jax.device_put(
                arrays, jax.tree.map(lambda _: shard, arrays)
            )
        return arrays

    # ------------------------------------------------------------------
    def train(self, max_epochs: int):
        self._setup_wandb(tags=["training"])
        print(f"Training epochs {self._epoch + 1} to {max_epochs}.")
        # finally: even an uncaught exception mid-epoch must not discard
        # async saves whose array write already finished (ADVICE r3).
        try:
            for epoch in range(self._epoch + 1, max_epochs + 1):
                self._epoch = epoch
                self._train_loader.set_epoch(epoch)
                factor = self._lr_func(epoch - 1)
                self.state = self.state._replace(
                    opt_state=set_learning_rates(
                        self.state.opt_state,
                        self._args.lr * factor,
                        self._args.lr_backbone * factor,
                    )
                )
                print(f"Starting epoch {epoch} with lr factor {factor}")
                self._run_epoch("train", self._train_loader, training=True)
                self._run_eval()
                for meter in self._stats.values():
                    meter.new_epoch()
                if EXIT.is_set():
                    return
                if self._save_checkpoints:
                    print("Saving Checkpoint")
                    self.save_checkpoint(
                        is_final=(epoch == max_epochs), blocking=False
                    )
        finally:
            self.flush_saves()
        print("Finished training!")

    def eval(self):
        self._setup_wandb(tags=["eval"])
        print("Running eval.")
        self._run_eval()

    def _run_eval(self):
        for name, loader in self._val_loaders.items():
            self._run_epoch(name, loader, training=False)

    # ------------------------------------------------------------------
    def _setup_wandb(self, tags=None):
        from future_od_tpu.parallel.distributed import is_main_process

        conf = self._wandb_config
        if not conf.enabled or not is_main_process():
            return
        wandb = maybe_import_wandb()
        if wandb is None:
            print("wandb not installed; disabling W&B logging")
            self._wandb_config.enabled = False
            return
        wandb.init(
            project=conf.project,
            entity=conf.entity,
            config=conf.hyperparams,
            name=conf.name,
            notes=conf.notes,
            resume="must" if conf.resume_id else None,
            id=conf.resume_id,
            tags=tags,
        )
        self._wandb = wandb

    # ------------------------------------------------------------------
    def _grad_audit(self, data):
        """Epoch-1 dead-branch audit + optional gradient watching.

        Prints every trainable parameter whose gradient is identically zero
        on the first real batch (the reference prints `grad is None` params,
        trainer.py:181-185); with wandb watch_model, also logs per-parameter
        gradient norms each epoch (the wandb.watch parity path — torch's
        hook-based watch has no JAX equivalent, so norms are computed from an
        explicit grad pass on the epoch's first batch).
        """
        if self._grad_report is None:
            from dataclasses import replace

            from future_od_tpu.train.step import make_grad_report

            # the audit concerns grad-flow topology, not assignment quality:
            # force the on-device auction so the report jits on callback-less
            # backends even under --matcher hungarian
            cfg = replace(self._criterion_cfg, matcher="auction")
            self._grad_report = make_grad_report(self._model, cfg)
        from future_od_tpu.train.optimizer import param_labels
        from future_od_tpu.train.step import dead_param_names

        norms = jax.device_get(self._grad_report(self.state, data, self._rng))
        labels = param_labels(self.state.params, self._freeze_stem)
        if self._epoch == 1:
            for name in dead_param_names(norms, labels):
                print(f"Parameter {name} has an identically-zero gradient")
        if (
            self._wandb_config.watch_model
            and self._wandb_config.enabled
            and self._wandb is not None
        ):
            flat = jax.tree_util.tree_flatten_with_path(norms)[0]
            self._wandb.log(
                {
                    "epoch": self._epoch,
                    **{
                        f"grads/{jax.tree_util.keystr(p)}": float(n)
                        for p, n in flat
                    },
                }
            )

    # ------------------------------------------------------------------
    def _run_epoch(self, mode: str, data_loader, training: bool):
        num_iterations = len(data_loader)
        od_map_stuff_lst = [[], [], [], []]
        hardest = {"loss": -1e10, "data": None, "output": None}
        batch_size = data_loader.batch_size
        stats_keys = list(self._stat_idfs)
        t_start = time.time()

        def consume(i, batch, loss, stats, od_map_stuffs, output):
            # Host-side bookkeeping for step i's results. Runs AFTER step i+1
            # has been dispatched (one-step lag), so every device->host fetch
            # here overlaps step i+1's device compute instead of stalling it.
            # One batched device_get replaces the per-scalar fetches (each a
            # full tunnel round trip on the remote-relay backend).
            ap_collect = i * batch_size < AP_IMAGE_CAP
            loss, stats, od_map_host = jax.device_get(
                (loss, stats, od_map_stuffs if ap_collect else ())
            )
            loss = float(loss)
            for key, value in stats.items():
                self._stats[f"{mode} {key} loss"].update(float(value), 1)
            if (
                float(stats.get("nonfinite_skipped", 0.0)) > 0
                and not self._nonfinite_warned
            ):
                self._nonfinite_warned = True
                print(
                    "WARNING: a training step produced non-finite gradients; "
                    "its update was SKIPPED (divergence guard, step.py "
                    "_guarded_apply). Telemetry: 'nonfinite_skipped' stat. "
                    "Recurring skips mean the run is unstable — lower the lr "
                    "or batch size and root-cause with tools/nan_probe.py."
                )
            if float(stats.get("matcher_dropped", 0.0)) > 0 and not self._dropped_warned:
                self._dropped_warned = True
                print(
                    f"WARNING: {float(stats['matcher_dropped']):.0f} active "
                    "targets exceeded cost_slots "
                    f"({self._criterion_cfg.cost_slots}) this step and were "
                    "dropped from matching/loss — raise "
                    "SpatioTemporalDETRArgs.cost_slots (--cost_slots) if this "
                    "recurs (telemetry: 'matcher_dropped' stat)."
                )
            if ap_collect:
                for idx, elem in enumerate(od_map_host):
                    od_map_stuff_lst[idx].append(np.asarray(elem))

            # only the W&B visualization block consumes the hardest batch —
            # without it, skip the per-new-max device->host prediction copy
            # and don't retain the full host batch for the whole epoch
            if (
                loss > hardest["loss"]
                and self._wandb_config.enabled
                and self._wandb is not None
                and self._epoch in self._visualization_epochs
            ):
                hardest.update(loss=loss, data=batch, output=_to_host(output))

            if (
                i in self._visualization_iterations
                and self._epoch in self._visualization_epochs
            ):
                self.visualize_batch(batch, _to_host(output), mode)
            if (i + 1) % self._print_interval == 0:
                loss_str = "  ".join(
                    f"{self._stats[f'{mode} {k} loss'].avg:.5f} ({k})"
                    for k in stats_keys
                )
                print(
                    f"[{mode}: {self._epoch}, {i + 1:4d}/{num_iterations}] Loss: {loss_str}."
                )

        # FUTURE_OD_NO_PIPELINE=1: consume each step's results before
        # dispatching the next (the reference's blocking loop) — A/B knob.
        lag = os.environ.get("FUTURE_OD_NO_PIPELINE", "0") != "1"
        pending = None
        for i, batch in enumerate(data_loader):
            if EXIT.is_set():
                if pending is not None:
                    consume(*pending)
                return
            data = self._device_batch(batch)

            if training:
                if i == 0 and (self._epoch == 1 or self._wandb_config.watch_model):
                    self._grad_audit(data)
                self.state, loss, stats, od_map_stuffs, output = self._train_step(
                    self.state, data, self._rng
                )
                self._training_iterations += 1
            else:
                loss, stats, od_map_stuffs, output = self._eval_step(self.state, data)

            if pending is not None:
                consume(*pending)
            pending = (i, batch, loss, stats, od_map_stuffs, output)
            if not lag:
                consume(*pending)
                pending = None

            if (
                training
                and self._checkpoint_every_iters
                and self._training_iterations % self._checkpoint_every_iters == 0
                and self._save_checkpoints
            ):
                # Mid-epoch checkpoint (TPU-native extra beyond the reference's
                # per-epoch saves): survives preemption of long epochs. Resume
                # restarts the epoch, which matches the reference's semantics.
                # (Async: only the host copy of this step's state blocks.)
                self.save_checkpoint(blocking=False)
        if pending is not None:
            consume(*pending)

        loss_items = [
            (self._stats[f"{mode} {k} loss"].avg, k) for k in stats_keys
        ]
        loss_str = "  ".join(f"{v:.5f} ({k})" for v, k in loss_items)
        dt = time.time() - t_start
        print(f"[{mode}: {self._epoch}] Loss: {loss_str}  ({dt:.1f}s)")

        if not od_map_stuff_lst[0]:
            return
        ap = aggregate_mean_average_precision(
            np.concatenate(od_map_stuff_lst[0], axis=2),
            np.concatenate(od_map_stuff_lst[1], axis=2),
            np.concatenate(od_map_stuff_lst[2], axis=2),
            np.stack(od_map_stuff_lst[3], axis=2),
        )
        self._last_ap = ap
        self._ap_by_mode[mode] = ap
        print("AP50 for epoch is:", " ".join(f"{v:.3f}" for v in ap["all"][0, :, 0]))
        print("MAP for epoch is:", " ".join(f"{v:.3f}" for v in ap["threshavg"][:, 0]))
        for size_idx, size in [(1, "small"), (2, "medium"), (3, "large")]:
            print(
                f"MAP for {size} objects is:",
                " ".join(f"{v:.3f}" for v in ap["threshavg"][:, size_idx]),
            )

        if self._wandb_config.enabled and self._wandb is not None:
            log = {"epoch": self._epoch, "iteration": self._training_iterations}
            for style in ["classavg", "generic"]:
                for size_idx, size in enumerate(["", "-small", "-medium", "-large"]):
                    log[f"{mode}-{style}/ap{size}"] = ap[f"{style} threshavg"][size_idx]
                    log[f"{mode}-{style}/ap50{size}"] = ap[style][0, size_idx]
                    log[f"{mode}-{style}/ap70{size}"] = ap[style][4, size_idx]
            for class_idx, class_name in enumerate(self._category_dict.values()):
                log[f"{mode}-class/ap_{class_name}"] = ap["threshavg"][class_idx, 0]
                log[f"{mode}-class/ap50_{class_name}"] = ap["all"][0, class_idx, 0]
                log[f"{mode}-class/ap70_{class_name}"] = ap["all"][4, class_idx, 0]
            for val, name in loss_items:
                log[f"{mode}-losses/{name}"] = val
            self._wandb.log(log)
            if self._epoch in self._visualization_epochs and hardest["data"] is not None:
                self.visualize_batch(
                    hardest["data"], hardest["output"], mode, prefix="hardest_"
                )

    # ------------------------------------------------------------------
    def flush_saves(self):
        """Commit any in-flight async checkpoint writes (atomic rename)."""
        for pending in self._pending_saves:
            pending.wait()
        self._pending_saves = []

    def save_checkpoint(self, is_final: bool = False, blocking: bool = True):
        """Write <save_name> (full train state + meta) and, when is_final,
        <save_name>_final (net-only), like the reference (trainer.py:282-299).

        blocking=True (the default — the contract external callers expect):
        durable on return. The trainer's own loop passes blocking=False: the
        write starts in the background (the arrays are host-copied before
        this returns, so donated state buffers stay safe) and COMMITS in the
        background as soon as it finishes — `flush_saves()` only waits, it
        is not what makes the checkpoint durable."""
        from future_od_tpu.parallel.distributed import is_main_process

        if not is_main_process():
            # Multi-host: rank 0 writes, like the reference (trainer.py:98).
            return
        arrays = {
            "params": self.state.params,
            "frozen": self.state.frozen,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }
        import dataclasses

        meta = {
            "net_type": type(self._model).__name__,
            "epoch": self._epoch,
            "stats": {k: m.state_dict() for k, m in self._stats.items()},
            # architecture travels with the artifact: deployment entries
            # (runs/serve.py) rebuild the model from this instead of
            # trusting their CLI defaults to match the training run
            "detr_args": dataclasses.asdict(self._args),
        }
        # Async write: orbax copies the arrays to host before returning, so
        # the next epoch's steps (which DONATE the state buffers) start
        # immediately while serialization + disk IO run in the background,
        # and the PendingSave commits itself as soon as the write finishes
        # (preemption-safe). FUTURE_OD_SYNC_CKPT=1 restores fully blocking
        # saves.
        self.flush_saves()  # at most one in-flight write per name
        if os.environ.get("FUTURE_OD_SYNC_CKPT", "0") == "1":
            save_checkpoint(self._checkpoint_path, self._save_name, arrays, meta)
        else:
            self._pending_saves.append(
                save_checkpoint_async(
                    self._checkpoint_path, self._save_name, arrays, meta
                )
            )
        if is_final:
            final_arrays = {"params": self.state.params, "frozen": self.state.frozen}
            final_meta = {"net_type": meta["net_type"], "detr_args": meta["detr_args"]}
            if os.environ.get("FUTURE_OD_SYNC_CKPT", "0") == "1":
                save_checkpoint(
                    self._checkpoint_path, self._save_name + "_final",
                    final_arrays, final_meta,
                )
            else:
                self._pending_saves.append(
                    save_checkpoint_async(
                        self._checkpoint_path, self._save_name + "_final",
                        final_arrays, final_meta,
                    )
                )
        if blocking:
            self.flush_saves()

    def load_checkpoint(self, checkpoint: Optional[str] = None, load_only_net=False):
        """checkpoint: None -> <ckpt_path>/<save_name>; str -> explicit path
        split into (dir, name). A path ending in .pth/.pth.tar is treated as a
        reference torch checkpoint and converted
        (utils/checkpoint_convert.py) — net-only by nature."""
        self.flush_saves()  # a load must see any write this process started
        if checkpoint is not None and checkpoint.endswith((".pth", ".pth.tar")):
            import torch

            from future_od_tpu.utils.checkpoint_convert import (
                convert_reference_checkpoint,
            )

            print(f"Converting reference checkpoint: {checkpoint}")
            blob = torch.load(
                os.path.expanduser(checkpoint), map_location="cpu", weights_only=False
            )
            state_dict = blob["net"] if isinstance(blob, dict) and "net" in blob else blob
            converted = convert_reference_checkpoint(
                state_dict,
                {"params": self.state.params, "frozen": self.state.frozen},
                dim=self._args.hidden_dim,
            )
            self.state = self.state._replace(
                params=jax.tree.map(jnp.asarray, converted["params"]),
                frozen=jax.tree.map(jnp.asarray, converted["frozen"]),
            )
            print(f"Loaded (converted): {checkpoint}")
            return
        if checkpoint is None:
            ckpt_dir, name = self._checkpoint_path, self._save_name
        else:
            path = os.path.expanduser(checkpoint)
            ckpt_dir, name = os.path.dirname(path) or ".", os.path.basename(path)
        print(f"Loading checkpoint: {os.path.join(ckpt_dir, name)}")
        if load_only_net:
            target = {"params": self.state.params, "frozen": self.state.frozen}
        else:
            target = {
                "params": self.state.params,
                "frozen": self.state.frozen,
                "opt_state": self.state.opt_state,
                "step": self.state.step,
            }
        restored = load_checkpoint(ckpt_dir, name, target=target)
        if restored is None:
            print(
                "WARNING: Attempted to load checkpoint, but it does not exist. "
                "Continuing without loading."
            )
            return
        arrays, meta = restored
        assert meta.get("net_type") == type(self._model).__name__, (
            "Network is not of correct type"
        )
        if meta.get("detr_args"):
            import dataclasses

            # param-free behavioral flags load cleanly from a mismatched
            # config but change semantics — warn loudly (structural
            # mismatches already fail in the tree restore above)
            ours = dataclasses.asdict(self._args)
            for key in ("encode_offset", "no_imu_speed", "space_to_depth"):
                saved = meta["detr_args"].get(key)
                if saved is not None and saved != ours.get(key):
                    print(
                        f"WARNING: checkpoint was trained with {key}={saved} "
                        f"but this run uses {key}={ours.get(key)} — outputs "
                        "will be wrong unless this is intentional."
                    )
        if load_only_net:
            self.state = self.state._replace(
                params=arrays["params"], frozen=arrays["frozen"]
            )
        else:
            self.state = TrainState(
                params=arrays["params"],
                frozen=arrays["frozen"],
                opt_state=arrays["opt_state"],
                step=jnp.asarray(arrays["step"], jnp.int32),
            )
            self._epoch = int(meta.get("epoch", 0))
            for key, meter_state in meta.get("stats", {}).items():
                if key in self._stats:
                    self._stats[key].load_state_dict(meter_state)
        print(f"Loaded: {os.path.join(ckpt_dir, name)}")

    # ------------------------------------------------------------------
    def visualize_batch(self, batch, output, mode: str, prefix: str = ""):
        """PNG + W&B box overlays (trainer.py:334-413). Rank 0 only."""
        from future_od_tpu.parallel.distributed import is_main_process

        if not is_main_process():
            return
        scores = np.asarray(output["class_scores"])  # (B, L_out, 1, M, C+1)
        boxes = np.asarray(output["boxes"])
        B, L_out = scores.shape[:2]
        video = np.asarray(batch["video"])
        L_in = video.shape[1]
        assert L_in == L_out or L_out == 1
        background = scores.shape[-1]
        anno_classes = np.asarray(batch["classes"]).copy()
        anno_active = np.asarray(batch["active"])
        anno_classes[anno_active == 0] = background
        anno_boxes = np.asarray(batch["boxes"])
        anno_frame = np.asarray(batch["annotated_frame_idx"])
        ignore_boxes = np.asarray(batch.get("ignore_boxes", np.zeros_like(anno_boxes)))

        wandb_images = []
        for b in range(min(B, max(4, self._wandb_config.num_images))):
            fpath = os.path.join(
                self._visualization_path, f"{prefix}{mode}_b{b}_anno.png"
            )
            visualize(
                video[b, anno_frame[b]], anno_classes[b], anno_boxes[b], fpath,
                background,
            )
            for l in range(L_in):
                has_anno = l == anno_frame[b]
                has_det = L_in == L_out or has_anno
                if not has_det:
                    continue
                l_det = l if L_out == L_in else 0
                if self._wandb_config.enabled and b < self._wandb_config.num_images:
                    img = visualize_wandb(
                        image=video[b, l],
                        pred_scores=scores[b, l_det, 0],
                        pred_boxes=boxes[b, l_det, 0],
                        background_class=background,
                        category_dict=self._category_dict,
                        anno_classes=anno_classes[b] if has_anno else None,
                        anno_boxes=anno_boxes[b] if has_anno else None,
                        ignore_boxes=ignore_boxes[b] if has_anno else None,
                    )
                    if img is not None:
                        wandb_images.append(img)
        if wandb_images and self._wandb is not None:
            self._wandb.log(
                {
                    f"visualization/{prefix}{mode}_bounding_boxes": wandb_images,
                    "epoch": self._epoch,
                }
            )
