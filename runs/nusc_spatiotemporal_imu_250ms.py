"""NuScenes spatiotemporal+IMU run, 250 ms horizon
(reference: runs/nusc_spatiotemporal_imu_250ms.py). Offsets [-0.5, -0.25, 0] s.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from config import config
from future_od_tpu.data import nu_scenes
from future_od_tpu.models.st_detr import SpatioTemporalDETRArgs
from runs._helper import build_base_parser, get_lr_func, get_trainer
from runs._loader import get_nusc_loaders
from runs._model import build_model

OFFSETS = [-0.5, -0.25, 0]


def train(model, args, detr_args):
    lr_func = get_lr_func(args.epochs)
    print("starting dataset loading...")
    train_loader, val_loaders = get_nusc_loaders(
        (448, 800), offsets=OFFSETS, config=config, args=args, train_batch_size=32
    )
    trainer = get_trainer(args, config, detr_args, lr_func, model, train_loader, val_loaders)

    print("Starting first training stage")
    trainer.train(int(args.epochs * 0.60))

    print("Starting second training stage")
    trainer._train_loader, trainer._val_loaders = get_nusc_loaders(
        (896, 1600), offsets=OFFSETS, config=config, args=args, train_batch_size=16
    )
    trainer.train(args.epochs)


def main():
    print(f"Started script: {os.path.basename(__file__)}")
    parser = build_base_parser()
    parser.add_argument("--epochs", default=160, type=int)
    args = parser.parse_args()
    args.experiment_idf = os.path.splitext(os.path.basename(__file__))[0]
    detr_args = SpatioTemporalDETRArgs(
        num_classes=len(nu_scenes.CATEGORY_DICT),
        num_queries=128,
        lr_backbone=1e-4,
        matcher=args.matcher,
        cost_slots=args.cost_slots,
        space_to_depth=args.s2d,
    )
    model = build_model(args, detr_args)
    print("built model")
    train(model, args, detr_args)


if __name__ == "__main__":
    main()
