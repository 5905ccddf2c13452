"""Smoke-run the long-form TPU measurement tools at tiny scale on CPU.

Rationale: a tool crash discovered hours into a real device run burns
irreplaceable TPU time — round 4's matcher_drift_branched KeyError surfaced
only AFTER the 60-epoch base phase completed, voiding the whole run. Every
tool whose real invocation is hours long must therefore complete end-to-end
at minutes-scale settings in CI, covering the full control flow (base phase,
checkpoint branch, both matcher arms, summary emission).
"""
import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "tools", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_matcher_drift_branched_smoke(tmp_path, monkeypatch):
    tool = _load_tool("matcher_drift_branched")
    out = tmp_path / "drift.json"
    prog = tmp_path / "drift_progress.jsonl"
    monkeypatch.chdir(tmp_path)  # visualization/ output lands under tmp
    common = [
        "--batch", "8", "--samples", "16", "--val-samples", "8",
        "--ckpt-dir", str(tmp_path / "ckpt"),
        "--out", str(out), "--progress", str(prog),
    ]
    # Staged flow (the real TPU invocation): base phase alone first...
    monkeypatch.setattr(sys, "argv", [
        "matcher_drift_branched.py",
        "--base-epochs", "2", "--branch-epochs", "1", "--base-only", *common,
    ])
    tool.main()
    assert not out.exists()  # base-only stops before the branch phase
    base_lines = [json.loads(l) for l in prog.read_text().splitlines()]
    assert [l["epoch"] for l in base_lines] == [1, 2]
    assert all(l["matcher"] == "base" for l in base_lines)
    # ...then the full invocation resumes the finished base (zero epochs to
    # train — _ap_by_mode starts empty on resume) and goes straight to branch.
    monkeypatch.setattr(sys, "argv", [
        "matcher_drift_branched.py",
        "--base-epochs", "2", "--branch-epochs", "1", *common,
    ])
    tool.main()

    results = json.loads(out.read_text())
    assert results["base_epochs"] == 2
    # both branch arms produced one epoch of train+val AP rows
    assert len(results["auction"]["train"]) == 1
    assert len(results["auction"]["val"]) == 1
    assert len(results["hungarian"]["train"]) == 1
    summary = results["summary"]
    for key in (
        "train_windowmean_ap50_delta",
        "val_windowmean_ap50_delta",
        "val_windowmean_ap50",
        "train_final_ap50",
        "val_final_ap50",
    ):
        assert key in summary, key
    # per-class vectors: 2 synthetic classes
    assert len(summary["train_windowmean_ap50_delta"]) == 2
    # progress lines: base epochs from stage 1, one per branch epoch per arm
    lines = [json.loads(l) for l in prog.read_text().splitlines()]
    assert {l["matcher"] for l in lines} == {"base", "auction", "hungarian"}


def test_nan_probe_forced_replay_smoke(tmp_path, monkeypatch):
    """Exercise nan_probe's full control flow (epoch loop + snapshot +
    deterministic replay + finiteness diagnosis + dump) via the forced-fatal
    path, so the real TPU invocation can't crash after the long phase A."""
    tool = _load_tool("nan_probe")
    snap = tmp_path / "snaps"
    out = tmp_path / "fatal.npz"
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", [
        "nan_probe.py", "--batch", "8", "--samples", "16", "--val-samples", "8",
        "--max-epochs", "2", "--force-fatal-epoch", "2",
        "--snap-dir", str(snap), "--out", str(out),
    ])
    tool.main()
    assert out.exists()
    assert (snap / "state_prefatal.pkl").exists()
    assert (snap / "state_e1.pkl").exists()

    # Phase D (--analyze): solver cross-check on the dumped cost matrices.
    import numpy as np

    d = np.load(out)
    assert "costs" in d and "cost_active" in d and "logits_final" in d
    monkeypatch.setattr(sys, "argv", [
        "nan_probe.py", "--analyze", "--out", str(out),
    ])
    tool.main()
    report = json.loads(
        (tmp_path / "fatal_solver_report.json").read_text()
    )
    agg = report["aggregate"]
    assert agg["total_active"] > 0
    # healthy-state costs: the exact solver must match everything, and the
    # auction must be within its epsilon bound of the exact cost
    assert agg["total_unmatched_hungarian"] == 0
    assert agg["total_cost_auction"] >= agg["total_cost_hungarian"] - 1e-4
