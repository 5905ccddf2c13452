"""CLI-surface tests: every run script must import and expose its argparse
surface (subprocess on the CPU platform; no device work)."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TRAIN_SCRIPTS = [
    "runs/nuim_single_frame.py",
    "runs/nuim_spatiotemporal_imu.py",
    "runs/nusc_spatiotemporal_imu_500ms.py",
    "runs/nusc_spatiotemporal_imu_250ms.py",
    "runs/nusc_spatiotemporal_imu_prevframe.py",
]
EVAL_SCRIPTS = [
    "runs/eval/nusc_500ms_attendprev_decoder_eval.py",
    "runs/eval/nusc_250ms_attendprev_decoder_eval.py",
    "runs/eval/nusc_100ms_attendprev_decoder_eval.py",
    "runs/eval/nusc_50ms_attendprev_decoder_eval.py",
    "runs/eval/nuim_spatiotemporal_imu_eval.py",
]


def run_help(script):
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, os.path.join(REPO, script), "--help"],
        capture_output=True, text=True, timeout=120, env=env, cwd=REPO,
    )


@pytest.mark.parametrize("script", TRAIN_SCRIPTS)
def test_train_script_help(script):
    result = run_help(script)
    assert result.returncode == 0, result.stderr[-2000:]
    for flag in ["--debug", "--synthetic", "--restart", "--epochs", "--bf16", "--matcher"]:
        assert flag in result.stdout, f"{script} missing {flag}"


@pytest.mark.parametrize("script", EVAL_SCRIPTS)
def test_eval_script_help(script):
    result = run_help(script)
    assert result.returncode == 0, result.stderr[-2000:]
    for flag in ["--checkpoint", "--disable_wandb", "--matcher"]:
        assert flag in result.stdout, f"{script} missing {flag}"


def test_bench_and_demo_importable():
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
    for mod in ["bench", "bench_train", "demo"]:
        result = subprocess.run(
            [sys.executable, "-c", f"import {mod}"],
            capture_output=True, text=True, timeout=120, env=env, cwd=REPO,
        )
        assert result.returncode == 0, (mod, result.stderr[-1500:])
