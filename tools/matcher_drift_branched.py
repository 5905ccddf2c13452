"""Branched auction-vs-exact matcher drift at CONVERGED accuracy.

The full-trajectory paired runs (tools/matcher_drift.py) showed that on the
tiny from-scratch synthetic task the two arms pair almost exactly through the
DETR warm-up plateau (epoch-50 losses within 2e-4) but leave the plateau at
different epochs — onset timing is chaotic, so per-epoch AP deltas during
the transient measure seed sensitivity, not matcher drift. This tool does
what VERDICT r2 #1's parenthetical prescribes instead: train ONE base model
past onset, then branch it — resume the same checkpoint twice and train N
further epochs with the auction vs the exact Hungarian under identical data
order and dropout streams — and report per-epoch |ΔAP50| in the converged
region (SURVEY §7 hard part 1).

    python tools/matcher_drift_branched.py [--base-epochs 230] [--branch-epochs 40]
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


def make_trainer(matcher: str, save_name: str, batch: int, samples: int,
                 checkpoint_dir: str, val_samples: int = 64,
                 lr: float = 3e-4, max_norm: float = 0.1):
    detr_args = SpatioTemporalDETRArgs(
        freeze_stem=False,  # from-scratch run: backprop the whole trunk
        num_classes=2, num_queries=32, hidden_dim=128, enc_layers=2, dec_layers=3,
        dim_feedforward=512, enc_nheads=8, nheads=8,
        lr=lr, lr_backbone=lr, max_norm=max_norm, matcher=matcher,
    )
    model = build_single_frame(detr_args, use_imu=False)
    train_ds = SyntheticClipDataset(
        num_samples=samples, num_frames=1, image_size=(128, 192),
        max_objects=4, seed=1,
    )
    val_ds = SyntheticClipDataset(
        num_samples=val_samples, num_frames=1, image_size=(128, 192),
        max_objects=4, seed=2,
    )
    return Trainer(
        model=model,
        detr_args=detr_args,
        train_loader=Loader(train_ds, batch_size=batch, shuffle=True, num_workers=4),
        val_loaders={
            "val0": Loader(val_ds, batch_size=batch, seed=VAL_SEED, num_workers=4)
        },
        checkpoint_path=checkpoint_dir,
        visualization_path=f"visualization/{save_name}",
        save_name=save_name,
        category_dict=CATEGORY_DICT,
        lr_func=lambda e: min(1.0, (e + 1) / 5),
        print_interval=1000,
        checkpoint_epochs=True,
        wandb_config=WandBConfig(enabled=False),
        freeze_backbone_stem=False,
        seed=0,  # identical init + dropout + data order across arms
    )


def _last_base_record(progress_path):
    """Most recent matcher=='base' line of the progress file (or None)."""
    last = None
    if os.path.exists(progress_path):
        with open(progress_path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except (json.JSONDecodeError, ValueError):
                    continue
                if rec.get("matcher") == "base":
                    last = rec
    return last


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--base-epochs", type=int, default=230)
    parser.add_argument("--branch-epochs", type=int, default=40)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--samples", type=int, default=256)
    parser.add_argument("--val-samples", type=int, default=64)
    parser.add_argument("--ckpt-dir", default="checkpoints")
    parser.add_argument("--out", default="/tmp/matcher_drift_branched.json")
    parser.add_argument("--progress", default="/tmp/matcher_drift_branched.jsonl")
    parser.add_argument("--base-only", action="store_true",
                        help="stop after the base phase (stage the long base "
                             "run separately from the branch comparison)")
    parser.add_argument("--stop-val-ap", type=float, default=0.0,
                        help="end the base phase early once mean val AP50 "
                             "reaches this (0 = train the full --base-epochs)")
    args = parser.parse_args()

    # Phase 1: base run (auction — the production path) to past-onset AP.
    # Epoch-by-epoch with a NaN sentinel: a diverged base (seen once at
    # batch 32 / lr 3e-4 — NaN at epoch ~26, auction burning max_iters on NaN
    # costs) must abort immediately instead of burning hours of TPU.
    base = make_trainer("auction", "drift_base", args.batch, args.samples,
                        args.ckpt_dir, args.val_samples)
    base.load_checkpoint()  # resume a partial base if one exists
    # ADVICE r4 (medium): on resume, check the stop condition BEFORE training —
    # a stage-2 invocation resuming a base that already early-stopped must not
    # train extra base epochs (which would silently move the branching point).
    # The progress file is the durable "base done at epoch k" marker.
    prev = _last_base_record(args.progress)
    base_done = bool(
        args.stop_val_ap
        and prev is not None
        and float(np.nanmean(prev["ap50"])) >= args.stop_val_ap
        # ...and the resumed checkpoint really is at/past that epoch — a
        # progress file without its checkpoint (or a stale one) must NOT
        # skip the base phase.
        and base._epoch >= int(prev["epoch"])
    )
    if base_done:
        print(f"BASE already at mean val AP50 "
              f"{float(np.nanmean(prev['ap50'])):.3f} >= {args.stop_val_ap} "
              f"(progress epoch {prev['epoch']}, checkpoint epoch "
              f"{base._epoch}); skipping phase 1", flush=True)
    for e in ([] if base_done else range(base._epoch + 1, args.base_epochs + 1)):
        base.train(e)
        labels = base._stats["train labels loss"].history[-1]
        if not np.isfinite(labels):
            # With the train step's non-finite gradient guard (train/step.py
            # _guarded_apply) a poisoned step keeps the old params, so a NaN
            # epoch AVERAGE no longer implies a dead run — abort only when the
            # parameter tree itself is non-finite.
            import jax

            params_ok = all(
                bool(np.isfinite(np.asarray(leaf)).all())
                for leaf in jax.tree.leaves(base.state.params)
            )
            skipped = base._stats["train nonfinite_skipped loss"].history[-1]
            if not params_ok:
                sys.exit(f"ABORT: base run diverged (labels loss {labels} at "
                         f"epoch {e}, params non-finite); lower --batch/lr "
                         f"and clear --ckpt-dir")
            print(f"WARN: epoch {e} labels loss {labels} but params finite "
                  f"(guard skipped {skipped:.3f} of steps); continuing",
                  flush=True)
        tr_ap = [float(v) for v in base._ap_by_mode["train"]["all"][0, :, 0]]
        val_ap = [float(v) for v in base._ap_by_mode["val0"]["all"][0, :, 0]]
        with open(args.progress, "a") as f:
            f.write(json.dumps({
                "matcher": "base", "epoch": e, "labels_loss": float(labels),
                "train_ap50": tr_ap, "ap50": val_ap,
            }) + "\n")
        if args.stop_val_ap and float(np.nanmean(val_ap)) >= args.stop_val_ap:
            print(f"BASE reached mean val AP50 "
                  f"{float(np.nanmean(val_ap)):.3f} >= {args.stop_val_ap} at "
                  f"epoch {e}; ending base phase", flush=True)
            break
    base_epochs = base._epoch  # actual (early stop / resume aware)
    # A fully-resumed base (branch-stage invocation) runs zero epochs, so
    # _ap_by_mode is empty — recover the converged base AP from the progress
    # file's last base line instead of reporting null (ADVICE r4 low).
    tr_ap_tbl = base._ap_by_mode.get("train")
    if tr_ap_tbl is not None:
        base_ap = [float(v) for v in tr_ap_tbl["all"][0, :, 0]]
    else:
        prev = _last_base_record(args.progress)
        base_ap = None if prev is None else prev.get("train_ap50")
    print(f"BASE train AP50 after {base_epochs} epochs: {base_ap}", flush=True)
    base.flush_saves()
    if args.base_only:
        print("--base-only: stopping after the base phase", flush=True)
        return
    base_ckpt = os.path.join(args.ckpt_dir, "drift_base")

    # Phase 2: branch the checkpoint into both matcher arms (branches never
    # save, so both load the base checkpoint directly).
    results = {"base_ap50": base_ap, "base_epochs": base_epochs}
    total = base_epochs + args.branch_epochs
    for matcher in ("auction", "hungarian"):
        name = f"drift_branch_{matcher}"
        trainer = make_trainer(matcher, name, args.batch, args.samples,
                               args.ckpt_dir, args.val_samples)
        trainer._save_checkpoints = False
        trainer.load_checkpoint(base_ckpt)
        ap = {"train": [], "val": []}
        for e in range(base_epochs + 1, total + 1):
            trainer.train(e)
            ap["train"].append(
                [float(v) for v in trainer._ap_by_mode["train"]["all"][0, :, 0]]
            )
            ap["val"].append(
                [float(v) for v in trainer._ap_by_mode["val0"]["all"][0, :, 0]]
            )
            with open(args.progress, "a") as f:
                f.write(json.dumps({
                    "matcher": matcher, "epoch": e,
                    "train_ap50": ap["train"][-1], "ap50": ap["val"][-1],
                }) + "\n")
        results[matcher] = ap

    a = np.asarray(results["auction"]["train"])  # (E, C)
    h = np.asarray(results["hungarian"]["train"])
    av = np.asarray(results["auction"]["val"])
    hv = np.asarray(results["hungarian"]["val"])
    results["summary"] = {
        "branch_epochs": args.branch_epochs,
        # systematic drift = |window-mean(auction) - window-mean(hungarian)|
        # per class (per-epoch deltas measure run-to-run noise instead)
        "train_windowmean_ap50_delta": np.abs(
            np.nanmean(a, 0) - np.nanmean(h, 0)
        ).tolist(),
        "val_windowmean_ap50_delta": np.abs(
            np.nanmean(av, 0) - np.nanmean(hv, 0)
        ).tolist(),
        "val_windowmean_ap50": {
            "auction": np.nanmean(av, 0).tolist(),
            "hungarian": np.nanmean(hv, 0).tolist(),
        },
        "train_mean_ap50_abs_delta": float(np.nanmean(np.abs(a - h))),
        "train_max_ap50_abs_delta": float(np.nanmax(np.abs(a - h))),
        "train_final_ap50": {"auction": a[-1].tolist(), "hungarian": h[-1].tolist()},
        "val_mean_ap50_abs_delta": float(np.nanmean(np.abs(av - hv))),
        "val_max_ap50_abs_delta": float(np.nanmax(np.abs(av - hv))),
        "val_final_ap50": {"auction": av[-1].tolist(), "hungarian": hv[-1].tolist()},
    }
    with open(args.out, "w") as f:
        json.dump(results, f)
    print("BRANCHED DRIFT SUMMARY:", json.dumps(results["summary"], indent=2))


if __name__ == "__main__":
    main()
