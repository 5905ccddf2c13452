"""Non-learned tracker-baseline eval (reference: paper.py:649-706).

Single-frame detections on the two past frames are Hungarian-tracked and
linearly extrapolated to the future frame by the host-side
`TrackerFuturePredictor`; AP is scored against the future-frame annotations.
The detector is trained at L=1 (the single-frame run script); its param tree
is identical to `build_single_frame`'s, so a single-frame checkpoint loads
directly.
"""
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from future_od_tpu.models.build import build_tracker_baseline
from future_od_tpu.models.tracker import TrackerFuturePredictor
from runs.eval._common import run_eval

if __name__ == "__main__":
    dim_mode = os.environ.get("FUTURE_OD_TRACKER_DIM_EXTRAPOLATION") or None
    run_eval(
        __file__, "nusc", offsets=[-1.0, -0.5, 0],
        default_checkpoint="nuim_single_frame_final",
        filter_offsets=[-1.0, -0.5, 0],
        model_builder=lambda args, detr_args: build_tracker_baseline(detr_args),
        tracker=TrackerFuturePredictor(dim_extrapolation=dim_mode),
    )
