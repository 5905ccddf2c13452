"""Model assembly — the concrete architectures the run scripts use.

`build_flagship` mirrors the one architecture every reference run builds
(`/root/reference/runs/_model.py:14-74`): ResNet-50 + IMU-MLP + 6-layer
per-frame encoder with egodeep, no joint encoder, 6-layer recurrent decoder
with num_images=2, first_layer_special="always", 128 queries.
"""
from __future__ import annotations

from typing import Optional

from flax import linen as nn

from future_od_tpu.models.cores import (
    CDetrDetectorSpatioTemporal,
    FuturePredCore,
    SeparateEncoder,
    SingleFrameCore,
    TrackerBaselineCore,
)
from future_od_tpu.models.st_detr import SpatioTemporalDETR, SpatioTemporalDETRArgs


def _separate_encoder(args: SpatioTemporalDETRArgs, use_imu: bool = True) -> SeparateEncoder:
    return SeparateEncoder(
        hidden_dim=args.hidden_dim,
        enc_layers=args.enc_layers,
        enc_heads=args.enc_nheads,
        ff_dim=args.dim_feedforward,
        dropout=args.dropout,
        use_encoder=args.enc_layers > 0,
        use_egodeep=use_imu,
        use_imu=use_imu,
        backbone_name=args.backbone,
        backbone_dilation=args.dilation,
        backbone_space_to_depth=args.space_to_depth,
        backbone_int8=args.int8_backbone or args.int8_static,
        backbone_int8_static=args.int8_static,
        backbone_freeze_stem=args.freeze_stem,
    )


def _detector(
    args: SpatioTemporalDETRArgs,
    num_images: int,
    image_memory_mode: str = "attend one at a time",
    first_layer_special_when: str = "always",
    use_slotstates: bool = False,
    store_attention: bool = False,
) -> CDetrDetectorSpatioTemporal:
    return CDetrDetectorSpatioTemporal(
        num_classes=args.num_classes,
        hidden_dim=args.hidden_dim,
        num_queries=args.num_queries,
        dec_layers=args.dec_layers,
        dec_heads=args.nheads,
        ff_dim=args.dim_feedforward,
        dropout=args.dropout,
        num_images=num_images,
        use_slotstates=use_slotstates,
        use_egodeep=True,
        aux_loss=args.aux_loss,
        first_layer_special_when=first_layer_special_when,
        image_memory_mode=image_memory_mode,
        store_attention=store_attention,
    )


def build_flagship(
    args: SpatioTemporalDETRArgs, store_attention: bool = False
) -> SpatioTemporalDETR:
    """The paper's spatiotemporal+IMU model (runs/_model.py:14-74)."""
    core = FuturePredCore(
        separate_encoder=_separate_encoder(args, use_imu=True),
        detector=_detector(args, num_images=2, store_attention=store_attention),
        joint_encoder=None,
        no_temporal_pos=True,
        encode_offset=args.encode_offset,
    )
    return SpatioTemporalDETR(core=core, args=args)


def build_with_joint_encoder(
    args: SpatioTemporalDETRArgs,
    kind: str = "joint",  # "joint" | "sequential" | "f2f"
    joint_layers: int = 2,
    num_frames: int = 2,
    store_attention: bool = False,
) -> SpatioTemporalDETR:
    """Flagship variant with a cross-frame joint encoder (the paper's
    ablations, paper.py:173-277)."""
    from future_od_tpu.models.cores import (
        JointEncoder,
        JointEncoderF2F,
        JointEncoderSequential,
    )

    if kind == "joint":
        joint = JointEncoder(
            joint_layers, args.hidden_dim, args.enc_nheads, args.dim_feedforward,
            args.dropout, use_egodeep=True,
        )
    elif kind == "sequential":
        joint = JointEncoderSequential(
            joint_layers, args.hidden_dim, args.enc_nheads, args.dim_feedforward,
            args.dropout, num_previmages=num_frames - 1, use_prevout=True,
            use_egodeep=True,
        )
    elif kind == "f2f":
        joint = JointEncoderF2F(args.hidden_dim, num_frames)
    else:
        raise ValueError(f"unknown joint encoder kind: {kind}")
    core = FuturePredCore(
        separate_encoder=_separate_encoder(args, use_imu=True),
        detector=_detector(
            args,
            # F2F collapses to one future feature map, so a single image
            # attention suffices; the others keep the 2-frame memory.
            num_images=1 if kind == "f2f" else 2,
            store_attention=store_attention,
        ),
        joint_encoder=joint,
        no_temporal_pos=False,  # joint variants rely on temporal encoding
        encode_offset=args.encode_offset,
    )
    return SpatioTemporalDETR(core=core, args=args)


def build_single_frame(args: SpatioTemporalDETRArgs, use_imu: bool = False) -> SpatioTemporalDETR:
    """Single-frame ablation core (paper.py:488-528) — also the CPU-runnable
    minimum end-to-end slice (BASELINE.json config #1)."""
    core = SingleFrameCore(
        separate_encoder=_separate_encoder(args, use_imu=use_imu),
        detector=_detector(args, num_images=1),
        no_temporal_pos=True,
    )
    return SpatioTemporalDETR(core=core, args=args)


def build_tracker_baseline(args: SpatioTemporalDETRArgs, use_imu: bool = False) -> SpatioTemporalDETR:
    """Tracker baseline core (paper.py:649-706)."""
    core = TrackerBaselineCore(
        separate_encoder=_separate_encoder(args, use_imu=use_imu),
        detector=_detector(args, num_images=1),
        no_temporal_pos=True,
    )
    return SpatioTemporalDETR(core=core, args=args)
