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


def test_train_cli_builds_mesh_on_multidevice_host():
    """The run scripts must actually train over the visible devices: on an
    8-virtual-device host, get_trainer auto-builds the ("data","model") mesh
    (data axis clipped to divide the debug batch of 2) and a full synthetic
    epoch — train steps AND ragged-final-val-batch eval — completes.
    Regression: the --mesh_model flag used to be parsed but never wired, so
    every CLI run silently trained on one device."""
    env = dict(
        os.environ,
        PYTHONPATH="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    result = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "runs/nuim_single_frame.py"),
            "--debug", "--synthetic", "--epochs", "1", "--disable_wandb",
            "--no_checkpoints", "--restart", "--prng", "threefry2x32",
        ],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    assert "device mesh: data=2 model=1" in result.stdout, result.stdout[-2000:]


def test_serve_cli_loads_checkpoint_arch_from_meta(tmp_path):
    """Deployment must serve the architecture the checkpoint was TRAINED
    with: the Trainer writes detr_args into the meta sidecar and
    runs/serve.py rebuilds the model from it (a CLI-default model would have
    a different param tree here — hidden_dim 32 vs 256 — so a successful
    load+serve proves the meta path), restoring with a target so placement
    adapts to the serving host."""
    from tests.test_trainer_e2e import make_trainer

    trainer, _ = make_trainer(tmp_path)
    trainer.save_checkpoint(is_final=True)
    trainer.flush_saves()  # commit the async write before the subprocess reads it
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
    result = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "runs/serve.py"),
            "--checkpoint", "e2e_test_final",
            "--checkpoint_dir", str(tmp_path / "ckpt"),
            "--img_size", "64", "96", "--streams", "2", "--max_batch", "2",
            "--rounds", "2",
        ],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert result.returncode == 0, result.stderr[-3000:]
    assert "model architecture from checkpoint meta" in result.stdout
    assert "loaded checkpoint e2e_test_final" in result.stdout


def test_bench_and_demo_importable():
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
    for mod in ["bench", "bench_train", "demo"]:
        result = subprocess.run(
            [sys.executable, "-c", f"import {mod}"],
            capture_output=True, text=True, timeout=120, env=env, cwd=REPO,
        )
        assert result.returncode == 0, (mod, result.stderr[-1500:])


def test_serve_script_help():
    result = run_help("runs/serve.py")
    assert result.returncode == 0, result.stderr[-2000:]
    for flag in ["--checkpoint", "--streams", "--max_batch", "--bf16",
                 "--device_normalize", "--mesh_data"]:
        assert flag in result.stdout, f"runs/serve.py missing {flag}"


def test_serve_script_smoke():
    """End-to-end serving smoke on CPU: tiny image, 3 streams, random init."""
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "runs/serve.py"),
         "--img_size", "64", "96", "--streams", "3", "--max_batch", "2",
         "--rounds", "2", "--max_streams", "4"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    import json as _json
    stats = _json.loads(result.stdout.strip().splitlines()[-1])
    assert stats["clips"] == 3 * 2  # every stream past warmup yields a clip
    assert stats["pad_fraction"] < 0.5
