"""NuImages 500 ms eval (reference: runs/eval/nuim_spatiotemporal_imu_eval.py)."""
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from runs.eval._common import run_eval

if __name__ == "__main__":
    run_eval(
        __file__, "nuim", offsets=[-2, -1, 0],
        default_checkpoint="w6_nuim_spatiotemporal_imu",
    )
