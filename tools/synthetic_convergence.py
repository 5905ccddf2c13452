"""Synthetic convergence demonstration.

Trains a small single-frame detector on the synthetic moving-box dataset until
AP50 is clearly nonzero — end-to-end evidence that data -> matcher -> loss ->
optimizer -> AP all point the right way without real datasets mounted.

    python tools/synthetic_convergence.py [--epochs 120] [--tpu-size small]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from future_od_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from future_od_tpu.data.loader import Loader, VAL_SEED
from future_od_tpu.data.synthetic import CATEGORY_DICT, SyntheticClipDataset
from future_od_tpu.models.build import build_single_frame
from future_od_tpu.models.st_detr import SpatioTemporalDETRArgs
from future_od_tpu.train.trainer import Trainer
from future_od_tpu.utils.wandb import WandBConfig


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=120)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--samples", type=int, default=256)
    parser.add_argument("--out", default="checkpoints")
    args = parser.parse_args()

    detr_args = SpatioTemporalDETRArgs(
        freeze_stem=False,  # from-scratch run: backprop the whole trunk
        num_classes=2, num_queries=32, hidden_dim=128, enc_layers=2, dec_layers=3,
        dim_feedforward=512, enc_nheads=8, nheads=8,
        lr=args.lr, lr_backbone=args.lr,
    )
    model = build_single_frame(detr_args, use_imu=False)
    train_ds = SyntheticClipDataset(
        num_samples=args.samples, num_frames=1, image_size=(128, 192),
        max_objects=4, seed=1,
    )
    val_ds = SyntheticClipDataset(
        num_samples=64, num_frames=1, image_size=(128, 192), max_objects=4, seed=2
    )
    trainer = Trainer(
        model=model,
        detr_args=detr_args,
        train_loader=Loader(train_ds, batch_size=args.batch, shuffle=True, num_workers=4),
        val_loaders={"val0": Loader(val_ds, batch_size=args.batch, seed=VAL_SEED, num_workers=4)},
        checkpoint_path=args.out,
        visualization_path="visualization/synthetic_convergence",
        save_name="synthetic_convergence",
        category_dict=CATEGORY_DICT,
        lr_func=lambda e: min(1.0, (e + 1) / 5),
        print_interval=1000,
        checkpoint_epochs=True,
        wandb_config=WandBConfig(enabled=False),
        freeze_backbone_stem=False,  # training from scratch
    )
    trainer.load_checkpoint()  # resume if a previous run left a checkpoint
    trainer.train(args.epochs)
    ap = trainer._last_ap
    print("FINAL val AP50 per class:", " ".join(f"{v:.3f}" for v in ap["all"][0, :, 0]))


if __name__ == "__main__":
    main()
