"""AP impact of the int8 PTQ backbone on a TRAINED model.

Random-weight box deltas say little about detection quality; this measures
what matters: load the converged synthetic single-frame checkpoint that the
branched drift run produces (checkpoints/drift_base, AP50 past onset), run
the exact same val evaluation with the float vs the int8 backbone
(SpatioTemporalDETRArgs.int8_backbone), and report per-class AP50/mAP both
arms. Evidence for BENCHMARKS.md's int8 entry.

    python tools/quant_ap_check.py [--ckpt checkpoints/drift_base]
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


def evaluate(int8: bool, ckpt: str, batch: int) -> dict:
    # must mirror tools/matcher_drift_branched.py's model config — that's
    # what the checkpoint holds
    detr_args = SpatioTemporalDETRArgs(
        freeze_stem=False,  # from-scratch run: backprop the whole trunk
        num_classes=2, num_queries=32, hidden_dim=128, enc_layers=2,
        dec_layers=3, dim_feedforward=512, enc_nheads=8, nheads=8,
        lr=3e-4, lr_backbone=3e-4, int8_backbone=int8,
    )
    model = build_single_frame(detr_args, use_imu=False)
    # evaluate on the TRAIN split (AP50 ~0.86/0.95 after the drift-base run):
    # the held-out split sits near the AP noise floor on this tiny synthetic
    # task, so quantization deltas are only measurable where AP is converged
    fit_ds = SyntheticClipDataset(
        num_samples=256, num_frames=1, image_size=(128, 192), max_objects=4,
        seed=1,
    )
    val_ds = SyntheticClipDataset(
        num_samples=64, num_frames=1, image_size=(128, 192), max_objects=4,
        seed=2,
    )
    trainer = Trainer(
        model=model,
        detr_args=detr_args,
        train_loader=Loader(val_ds, batch_size=batch, num_workers=2),
        val_loaders={
            "fit": Loader(fit_ds, batch_size=batch, seed=VAL_SEED, num_workers=2),
            "val0": Loader(val_ds, batch_size=batch, seed=VAL_SEED, num_workers=2),
        },
        checkpoint_path=os.path.dirname(ckpt) or ".",
        visualization_path="visualization/quant_ap_check",
        save_name=os.path.basename(ckpt),
        category_dict=CATEGORY_DICT,
        print_interval=1000,
        wandb_config=WandBConfig(enabled=False),
        freeze_backbone_stem=False,  # mirrors matcher_drift_branched.py —
        # the optimizer-state tree must match the checkpoint's at restore
        seed=0,
    )
    trainer.load_checkpoint(ckpt)
    trainer._run_eval()
    out = {}
    for mode in ("fit", "val0"):
        ap = trainer._ap_by_mode[mode]["all"]  # (thresh, class, size) layout
        out[mode] = {
            "ap50": [float(v) for v in ap[0, :, 0]],
            "map": [float(v) for v in np.nanmean(ap[:, :, 0], axis=0)],
        }
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", default="checkpoints/drift_base")
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--out", default="/tmp/quant_ap_check.json")
    args = parser.parse_args()

    results = {}
    for name, int8 in (("float", False), ("int8", True)):
        results[name] = evaluate(int8, args.ckpt, args.batch)
        print(name, results[name], flush=True)
    for mode in ("fit", "val0"):
        results[f"{mode}_ap50_abs_delta"] = [
            abs(a - b)
            for a, b in zip(
                results["float"][mode]["ap50"], results["int8"][mode]["ap50"]
            )
        ]
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
