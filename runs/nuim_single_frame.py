"""Single-frame ConditionalDETR-R50 detection — the minimum end-to-end slice
(BASELINE.json config #1): SingleFrameCore with L=1, no IMU, CPU-runnable with
`--debug --synthetic`. Exercises data -> model -> matcher -> loss -> train
step -> AP -> checkpoint before any temporal/IMU complexity.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from config import config
from future_od_tpu.data import nu_images
from future_od_tpu.models.build import build_single_frame
from future_od_tpu.models.st_detr import SpatioTemporalDETRArgs
from runs._helper import build_base_parser, get_lr_func, get_trainer
from runs._loader import get_nuim_loaders


def train(model, args, detr_args):
    lr_func = get_lr_func(args.epochs)
    print("starting dataset loading...")
    train_loader, val_loaders = get_nuim_loaders(
        (448, 800) if not args.debug else (128, 192),
        offsets=[0],
        config=config,
        args=args,
        train_batch_size=32 if not args.debug else 2,
    )
    trainer = get_trainer(args, config, detr_args, lr_func, model, train_loader, val_loaders)
    trainer.train(args.epochs)


def main():
    print(f"Started script: {os.path.basename(__file__)}")
    parser = build_base_parser()
    parser.add_argument("--epochs", default=100, type=int)
    args = parser.parse_args()
    args.experiment_idf = os.path.splitext(os.path.basename(__file__))[0]
    num_classes = 2 if args.synthetic else len(nu_images.CATEGORY_DICT)
    detr_args = SpatioTemporalDETRArgs(
        num_classes=num_classes,
        num_queries=128 if not args.debug else 16,
        lr_backbone=1e-4,
        matcher=args.matcher,
        cost_slots=args.cost_slots,
        space_to_depth=args.s2d,
    )
    if args.debug:
        detr_args = SpatioTemporalDETRArgs(
            num_classes=num_classes, num_queries=16, hidden_dim=64, enc_layers=2,
            dec_layers=2, dim_feedforward=128, enc_nheads=4, nheads=4,
            lr_backbone=1e-4, matcher=args.matcher,
        cost_slots=args.cost_slots,
        space_to_depth=args.s2d,
        )
    model = build_single_frame(detr_args, use_imu=False)
    print("built model")
    train(model, args, detr_args)


if __name__ == "__main__":
    main()
