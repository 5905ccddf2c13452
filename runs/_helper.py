"""Shared run-script helpers (reference: runs/_helper.py).

Builds the Trainer from loaders + model + args, the base argparse surface, and
the LR schedule. The TPU build has no per-process distributed launcher: the
`--mesh_model` flag sizes the tensor-parallel axis, the data axis takes the
remaining local devices, and the single jitted program spans them.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from future_od_tpu.data import nu_images, nu_scenes, synthetic
from future_od_tpu.train.optimizer import get_lr_func  # noqa: F401  (re-export)
from future_od_tpu.train.trainer import Trainer
from future_od_tpu.utils.wandb import WandBConfig


def category_dict_for(train_loader):
    ds = train_loader.dataset
    if isinstance(ds, synthetic.SyntheticClipDataset):
        return synthetic.CATEGORY_DICT
    if type(ds).__name__ == "NuImagesDataset":
        return nu_images.CATEGORY_DICT
    return nu_scenes.CATEGORY_DICT


def _build_mesh(args, train_loader):
    """Size and build the ("data", "model") mesh for this run, or None on a
    single device. The data axis takes every device the model axis doesn't,
    clipped to the largest size that divides the global batch (jit requires
    the batch to split evenly over "data"); the model axis stays intra-host
    (parallel/distributed.mesh_axes). Single device + mesh_model 1 -> None,
    the unsharded fast path."""
    import jax

    num_model = int(getattr(args, "mesh_model", 1))
    if jax.device_count() == 1 and num_model == 1:
        return None
    from future_od_tpu.parallel.distributed import mesh_axes
    from future_od_tpu.parallel.mesh import make_mesh

    num_data, num_model = mesh_axes(
        jax.device_count(), jax.local_device_count(), num_model
    )
    batch = getattr(train_loader, "batch_size", None)
    if batch:
        while num_data > 1 and batch % num_data:
            num_data -= 1
    if num_data * num_model == 1:
        return None
    print(
        f"device mesh: data={num_data} model={num_model} "
        f"({jax.device_count()} devices visible)"
    )
    return make_mesh(num_data, num_model)


def get_trainer(args, config, detr_args, lr_func, model, train_loader, val_loaders,
                tracker=None):
    import jax

    from future_od_tpu.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed(args)

    if detr_args.matcher == "hungarian" and jax.default_backend() not in ("cpu",):
        # jax.pure_callback is unsupported on this TPU backend (axon); the
        # Trainer engages the split-step exact arm instead (jitted cost pass
        # -> host C++ JV solve -> jitted grad pass; ~1.5x step cost).
        print(
            "--matcher hungarian on a callback-less backend: using the "
            "host-matched split step (exact, ~1.5x step cost)."
        )

    mesh = _build_mesh(args, train_loader)

    trainer = Trainer(
        model=model,
        detr_args=detr_args,
        mesh=mesh,
        train_loader=train_loader,
        val_loaders=val_loaders,
        checkpoint_path=config["checkpoint_path"],
        visualization_path=os.path.join(config["visualization_path"], args.experiment_idf),
        save_name=args.experiment_idf,
        category_dict=category_dict_for(train_loader),
        lr_func=lr_func,
        print_interval=25,
        visualization_epochs=set(int(i) for i in np.linspace(1, args.epochs, 10)),
        visualization_iterations=[0],
        checkpoint_epochs=not args.no_checkpoints,
        mixed_precision=getattr(args, "bf16", False),
        checkpoint_every_iters=getattr(args, "checkpoint_every_iters", 0),
        prng_impl=getattr(args, "prng", "rbg"),
        accum_steps=getattr(args, "accum", 1),
        tracker=tracker,
        wandb_config=WandBConfig(
            enabled=(not args.disable_wandb),
            name=args.experiment_idf + getattr(args, "wandb_suffix", ""),
            notes="",
            num_images=32,
            hyperparams={
                "slurm-id": os.environ.get("SLURM_JOB_ID"),
                "epochs": args.epochs,
            },
            resume_id=args.wandb_resume_id,
        ),
    )
    if not args.restart:
        trainer.load_checkpoint(args.checkpoint, getattr(args, "load_only_net", False))
    return trainer


def build_base_parser():
    parser = argparse.ArgumentParser(
        description="Experiment runfile, you run experiments from this file"
    )
    parser.add_argument("--restart", action="store_true", default=False)
    parser.add_argument("--debug", action="store_true", default=False)
    parser.add_argument("--disable_wandb", action="store_true", default=False)
    parser.add_argument("--wandb_resume_id", default=None)
    parser.add_argument("--no_checkpoints", action="store_true", default=False)
    parser.add_argument("--checkpoint", default=None, help="Override checkpoint to be loaded")
    parser.add_argument("--short_train", action="store_true", default=False)
    parser.add_argument("--night", action="store_true", default=False)
    parser.add_argument("--load-only-net", action="store_true", default=False)
    parser.add_argument(
        "--synthetic", action="store_true", default=False,
        help="Use the synthetic moving-box dataset (no real data required)",
    )
    add_tpu_args(parser)
    return parser


def add_tpu_args(parser):
    parser.add_argument(
        "--mesh_model", default=1, type=int,
        help="tensor-parallel axis size; data axis = devices / mesh_model",
    )
    parser.add_argument(
        "--matcher", default="auction", choices=["auction", "hungarian"],
        help="set-matching solver (auction = on-device, hungarian = exact host callback)",
    )
    parser.add_argument(
        "--cost_slots", default=128, type=int,
        help="compact the dense Nmax=256 target slots to this many active "
        "slots before the matcher cost build / solve / loss (exact while "
        "every image has <= this many boxes; overflow is dropped loudly — "
        "'matcher_dropped' stat). 0 = no compaction",
    )
    parser.add_argument("--num_workers", default=16, type=int)
    parser.add_argument(
        "--s2d", action="store_true", default=False,
        help="space-to-depth stem with HOST-packed 12-channel frames "
        "(loader packs per sample; see models/resnet.py)",
    )
    parser.add_argument(
        "--int8", action="store_true", default=False,
        help="int8 PTQ backbone for inference/eval (ops/quant.py; training "
        "steps always run the float path)",
    )
    parser.add_argument(
        "--loader", default="thread", choices=["thread", "grain"],
        help="input pipeline backend: thread pool (native decode releases "
        "the GIL) or grain worker processes (python-heavy datasets)",
    )
    parser.add_argument(
        "--device_normalize", action="store_true", default=False,
        help="ship uint8 video and normalize on device (4x fewer "
        "host->device bytes; resnet.device_normalize)",
    )
    parser.add_argument(
        "--checkpoint_every_iters", default=0, type=int,
        help="also checkpoint mid-epoch every N train iterations (preemption safety)",
    )
    parser.add_argument(
        "--bf16", action="store_true", default=False,
        help="bfloat16 forward/backward with f32 master params (mixed precision)",
    )
    parser.add_argument(
        "--accum", type=int, default=1,
        help="gradient-accumulation micro-steps: scan the fwd/bwd over "
        "batch/accum micro-batches, holding one micro-batch's activations "
        "at a time (exact — micro losses share the full-batch num_boxes "
        "normalizer; see train/step.py)",
    )
    parser.add_argument(
        "--prng", default="rbg", choices=["rbg", "threefry2x32"],
        help="dropout-bit PRNG: rbg rides the TPU hardware RNG (-14%% step "
        "time at b32 bf16); threefry2x32 for bit-exact cross-backend streams",
    )
    # Multi-host (one process per host; SURVEY.md §2.3). "auto" on Cloud TPU
    # pods; otherwise coordinator/num/id, or SLURM env is picked up directly.
    parser.add_argument("--dist_coordinator", default=None,
                        help='multi-host coordinator "host:port", or "auto" on Cloud TPU')
    parser.add_argument("--dist_num_processes", default=None, type=int)
    parser.add_argument("--dist_process_id", default=None, type=int)
