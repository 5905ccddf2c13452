"""Model builder (reference: runs/_model.py) — the flagship architecture all
runs use: SpatioTemporalDETR(FuturePredCore(ResNet-50 + IMU-MLP + 6-layer
egodeep encoder, no joint encoder, recurrent num_images=2 decoder))."""
from __future__ import annotations

from future_od_tpu.models.build import build_flagship
from future_od_tpu.models.st_detr import SpatioTemporalDETRArgs


def build_model(args, detr_args: SpatioTemporalDETRArgs, store_attention: bool = False):
    del args  # no DDP wrapping: sharding is handled by the jitted step
    return build_flagship(detr_args, store_attention=store_attention)
