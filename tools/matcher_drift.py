"""Auction-vs-exact matcher training-dynamics drift, measured on real hardware.

Trains the same tiny single-frame detector twice from an identical init —
once with the on-device auction matcher, once with the exact Hungarian (the
host-matched split-step arm on callback-less TPU backends) — with identical
data order and dropout streams, then reports per-epoch loss and AP50
trajectory deltas (SURVEY.md §7 hard part 1: the auction must track the exact
matcher's dynamics closely enough to preserve AP).

    python tools/matcher_drift.py [--epochs 25]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from future_od_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np

from future_od_tpu.data.loader import Loader, VAL_SEED
from future_od_tpu.data.synthetic import CATEGORY_DICT, SyntheticClipDataset
from future_od_tpu.models.build import build_single_frame
from future_od_tpu.models.st_detr import SpatioTemporalDETRArgs
from future_od_tpu.train.trainer import Trainer
from future_od_tpu.utils.wandb import WandBConfig


def run(matcher: str, epochs: int, batch: int, samples: int, progress_path: str = ""):
    detr_args = SpatioTemporalDETRArgs(
        freeze_stem=False,  # from-scratch run: backprop the whole trunk
        num_classes=2, num_queries=32, hidden_dim=128, enc_layers=2, dec_layers=3,
        dim_feedforward=512, enc_nheads=8, nheads=8,
        lr=3e-4, lr_backbone=3e-4, matcher=matcher,
    )
    model = build_single_frame(detr_args, use_imu=False)
    train_ds = SyntheticClipDataset(
        num_samples=samples, num_frames=1, image_size=(128, 192),
        max_objects=4, seed=1,
    )
    val_ds = SyntheticClipDataset(
        num_samples=64, num_frames=1, image_size=(128, 192), max_objects=4, seed=2
    )
    trainer = Trainer(
        model=model,
        detr_args=detr_args,
        train_loader=Loader(train_ds, batch_size=batch, shuffle=True, num_workers=4),
        val_loaders={
            "val0": Loader(val_ds, batch_size=batch, seed=VAL_SEED, num_workers=4)
        },
        checkpoint_path="checkpoints",
        visualization_path=f"visualization/matcher_drift_{matcher}",
        save_name=f"matcher_drift_{matcher}",
        category_dict=CATEGORY_DICT,
        lr_func=lambda e: min(1.0, (e + 1) / 5),
        print_interval=1000,
        checkpoint_epochs=False,
        wandb_config=WandBConfig(enabled=False),
        freeze_backbone_stem=False,
        seed=0,  # same init + dropout stream for both arms
    )
    ap50, train_ap50 = [], []
    for e in range(1, epochs + 1):
        trainer.train(e)
        ap50.append([float(v) for v in trainer._ap_by_mode["val0"]["all"][0, :, 0]])
        train_ap50.append(
            [float(v) for v in trainer._ap_by_mode["train"]["all"][0, :, 0]]
        )
        if progress_path:
            with open(progress_path, "a") as f:
                f.write(json.dumps({
                    "matcher": matcher, "epoch": e,
                    "ap50": ap50[-1], "train_ap50": train_ap50[-1],
                }) + "\n")
    loss_hist = {
        k: list(trainer._stats[f"train {k} loss"].history)
        for k in ("labels", "box_l1", "box_giou")
    }
    return {"ap50": ap50, "train_ap50": train_ap50, "loss": loss_hist}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=240)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--samples", type=int, default=256)
    parser.add_argument("--out", default="/tmp/matcher_drift.json")
    parser.add_argument("--progress", default="/tmp/matcher_drift_progress.jsonl")
    args = parser.parse_args()

    results = {}
    for matcher in ("auction", "hungarian"):
        print(f"=== training with matcher={matcher} ===", flush=True)
        results[matcher] = run(matcher, args.epochs, args.batch, args.samples, args.progress)

    summary = {
        "epochs": args.epochs,
        "steps": args.epochs * (args.samples // args.batch),
    }
    for split, key in (("val", "ap50"), ("train", "train_ap50")):
        ap_h = np.asarray(results["hungarian"][key])  # (E, C)
        ap_a = np.asarray(results["auction"][key])
        # The drift bound only carries information once accuracy is
        # meaningful (VERDICT r2 weak #1): also report it over the converged
        # region, defined as epochs where the exact-matcher arm's best-class
        # AP50 >= 0.4 (the VERDICT's bar; reachable on the train split here).
        converged = np.nanmax(ap_h, axis=1) >= 0.4
        summary.update({
            f"{split}_final_ap50_hungarian": ap_h[-1].tolist(),
            f"{split}_final_ap50_auction": ap_a[-1].tolist(),
            f"{split}_final_ap50_abs_delta": np.abs(ap_h[-1] - ap_a[-1]).tolist(),
            f"{split}_max_epoch_ap50_abs_delta": float(np.nanmax(np.abs(ap_h - ap_a))),
            f"{split}_converged_epochs": int(converged.sum()),
            f"{split}_converged_max_ap50_abs_delta": (
                float(np.nanmax(np.abs(ap_h[converged] - ap_a[converged])))
                if converged.any() else None
            ),
            f"{split}_converged_mean_ap50_abs_delta": (
                float(np.nanmean(np.abs(ap_h[converged] - ap_a[converged])))
                if converged.any() else None
            ),
        })
    for k in ("labels", "box_l1", "box_giou"):
        lh = np.asarray(results["hungarian"]["loss"][k])
        la = np.asarray(results["auction"]["loss"][k])
        summary[f"mean_abs_loss_delta_{k}"] = float(np.mean(np.abs(lh - la)))
        summary[f"final_loss_{k}"] = [float(lh[-1]), float(la[-1])]
    results["summary"] = summary
    with open(args.out, "w") as f:
        json.dump(results, f)
    print("MATCHER DRIFT SUMMARY:", json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
