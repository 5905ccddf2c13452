"""NuScenes 100 ms eval (reference: runs/eval/nusc_100ms_attendprev_decoder_eval.py).
Uses the shared ~83 ms checkpoint with encoded temporal offsets."""
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from runs.eval._common import run_eval

if __name__ == "__main__":
    run_eval(
        __file__, "nusc", offsets=["prev", -0.1, 0],
        default_checkpoint="w6_nusc_83ms_attendprev_decoder",
        encode_offset=True, filter_offsets=["prev", -0.1, 0],
    )
