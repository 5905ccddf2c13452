"""Pure-function compute ops: boxes, quaternions, positional encodings, losses,
assignment solvers, dense-target construction. Everything here is shape-static,
jit-friendly, and differentiable where it needs to be."""

from future_od_tpu.ops.boxes import (  # noqa: F401
    box_area,
    box_cxcywh_to_xyxy,
    box_iou,
    box_xyxy_to_cxcywh,
    batched_box_iou,
    generalized_box_iou,
)
from future_od_tpu.ops.quaternion import concat_quaternion, inverse_quaternion  # noqa: F401
from future_od_tpu.ops.posenc import (  # noqa: F401
    gen_sineembed_for_position,
    spatial_encoding,
    spatio_temporal_encoding,
)
from future_od_tpu.ops.losses import sigmoid_focal_loss, dice_loss, class_error  # noqa: F401
from future_od_tpu.ops.misc import inverse_sigmoid  # noqa: F401
from future_od_tpu.ops.target_utils import construct_box_targets, to_detr_targets  # noqa: F401
