"""NuScenes 250 ms eval (reference: runs/eval/nusc_250ms_attendprev_decoder_eval.py)."""
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from runs.eval._common import run_eval

if __name__ == "__main__":
    run_eval(
        __file__, "nusc", offsets=[-0.5, -0.25, 0],
        default_checkpoint="w6_nusc_250ms_attendprev_decoder",
        filter_offsets=[-0.5, -0.25, 0],
    )
