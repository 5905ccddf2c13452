"""Reproduce and localize the batch-32/lr-3e-4 training divergence.

The round-4 val-drift base run (tools/matcher_drift_branched.py --batch 32
--samples 4096) died twice with the same signature: smooth loss decline, then
in ONE epoch the labels loss goes NaN while every box-side stat stays finite,
`matcher_rounds` spikes and `matcher_unmatched` goes non-zero, and the next
epoch the whole parameter tree is NaN (box_l1 == 0.0 exactly: all targets
unmatched, the masked sums are empty). This tool finds the exact step and the
exact tensor that produces the first non-finite value:

- Phase A: run the identical training config epoch by epoch, snapshotting the
  full TrainState (params + AdamW moments + step counter) to disk after every
  epoch, until the labels loss goes non-finite.
- Phase B: restore the last healthy snapshot and replay the fatal epoch
  step by step (the dropout key is fold_in(seed, state.step) and the loader
  shuffles by (seed, epoch), so the replay is bit-identical), fetching the
  stats of every step instead of once per epoch.
- Phase C: at the first non-finite step, re-run the forward/loss/grad from
  the pre-step state with finiteness maps over (a) every output level's
  logits/boxes, (b) every per-level loss term, (c) every top-level gradient
  subtree, and dump state + batch + the exact on-device matching cost
  matrices to an .npz for offline analysis.
- Phase D (--analyze, CPU-runnable, no TPU needed): load the .npz and feed
  the captured cost matrices to BOTH solvers — the on-device auction and the
  exact host Hungarian — and compare assignments, unmatched counts, and
  assignment costs; plus logit/cost extremes. Tests the VERDICT r4 #3
  hypothesis that the matcher_rounds spike is a side effect of degenerate
  costs from extreme logits rather than an auction bug.

    python tools/nan_probe.py --batch 32 --samples 4096 --max-epochs 40
    python tools/nan_probe.py --analyze   # afterwards, on CPU
"""
import argparse
import os
import pickle
import sys

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))
sys.path.insert(0, _TOOLS)  # so the import below works under importlib too

from matcher_drift_branched import make_trainer  # noqa: E402 (enables cache)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from future_od_tpu.train.step import _forward_and_loss  # noqa: E402
from future_od_tpu.train.optimizer import set_learning_rates  # noqa: E402


def _finite_map(tree):
    """{path: (finite_fraction, max_abs)} for every leaf of a pytree."""
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        x = np.asarray(leaf)
        if x.dtype.kind not in "fc":
            continue
        name = jax.tree_util.keystr(path)
        out[name] = (float(np.isfinite(x).mean()), float(np.abs(x).max()))
    return out


def _snapshot(state, path):
    leaves = [np.asarray(l) for l in jax.tree_util.tree_leaves(state)]
    with open(path, "wb") as f:
        pickle.dump(leaves, f)


def _restore(state_template, path):
    with open(path, "rb") as f:
        leaves = pickle.load(f)
    treedef = jax.tree_util.tree_structure(state_template)
    return jax.tree_util.tree_unflatten(treedef, [jnp.asarray(l) for l in leaves])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--samples", type=int, default=4096)
    parser.add_argument("--val-samples", type=int, default=64)
    parser.add_argument("--max-epochs", type=int, default=40)
    parser.add_argument("--lr", type=float, default=3e-4,
                        help="probe lr (the divergence repro); the reference's "
                             "stage-1 flagship trains at 1e-4 — the "
                             "lr-dependence arm of VERDICT r4 #3")
    parser.add_argument("--clip", type=float, default=0.1,
                        help="grad-clip max_norm (reference: 0.1)")
    parser.add_argument("--snap-dir", default="/tmp/nanprobe")
    parser.add_argument("--out", default="/tmp/nanprobe/fatal.npz")
    parser.add_argument(
        "--force-fatal-epoch", type=int, default=0,
        help="treat this epoch as fatal even if finite and replay its first "
        "step through the full diagnosis path (CI smoke of phases B/C)",
    )
    parser.add_argument(
        "--resume-fatal-epoch", type=int, default=0,
        help="skip Phase A: restore state_e{N-1}.pkl from --snap-dir (written "
        "by an earlier run) and go straight to the Phase B replay of epoch N",
    )
    parser.add_argument(
        "--analyze", action="store_true",
        help="phase D only: solver cross-check on an existing --out npz "
        "(no training, CPU-friendly)",
    )
    args = parser.parse_args()
    if args.analyze:
        analyze(args.out)
        return
    os.makedirs(args.snap_dir, exist_ok=True)

    trainer = make_trainer(
        "auction", "nan_probe", args.batch, args.samples,
        os.path.join(args.snap_dir, "ckpt"), args.val_samples,
        lr=args.lr, max_norm=args.clip,
    )
    trainer._save_checkpoints = False  # snapshots below replace orbax saves

    # ---- Phase A: epoch loop with snapshots until the first NaN epoch ----
    fatal_epoch = args.resume_fatal_epoch or None
    if fatal_epoch is None:
        for e in range(1, args.max_epochs + 1):
            trainer.train(e)
            labels = trainer._stats["train labels loss"].history[-1]
            extras = " ".join(
                f"{k}={trainer._stats[f'train {k} loss'].history[-1]:.3f}"
                for k in ("box_l1", "matcher_rounds", "matcher_unmatched",
                          "nonfinite_skipped")
                if f"train {k} loss" in trainer._stats
            )
            print(f"[probe] epoch {e}: labels {labels:.5f} {extras}", flush=True)
            if not np.isfinite(labels):
                fatal_epoch = e
                break
            _snapshot(trainer.state, os.path.join(args.snap_dir, f"state_e{e}.pkl"))
            if args.force_fatal_epoch == e:
                fatal_epoch = e  # CI smoke: exercise the replay + diag path
                break
    if fatal_epoch is None:
        sys.exit(f"no divergence within {args.max_epochs} epochs — raise --max-epochs")
    print(f"[probe] FATAL EPOCH: {fatal_epoch}; replaying step by step", flush=True)

    # ---- Phase B: restore last healthy state, replay the fatal epoch ----
    # Two passes, both free of per-step state copies (a full TrainState is
    # ~300 MB and this environment's device<->host tunnel makes per-step
    # host mirroring hours-slow): pass 1 fetches only the scalar loss/stats
    # to find the fatal step index, pass 2 re-restores and replays to just
    # before it, keeping exactly ONE extra on-device state copy.
    def _restored_state():
        state = _restore(
            trainer.state,
            os.path.join(args.snap_dir, f"state_e{fatal_epoch - 1}.pkl"),
        )
        factor = trainer._lr_func(fatal_epoch - 1)
        return state._replace(
            opt_state=set_learning_rates(
                state.opt_state, trainer._args.lr * factor,
                trainer._args.lr_backbone * factor,
            )
        )

    loader = trainer._train_loader
    loader.set_epoch(fatal_epoch)
    state = _restored_state()
    fatal_i = None
    for i, batch in enumerate(loader):
        data = trainer._device_batch(batch)
        state, loss, stats, _, _ = trainer._train_step(state, data, trainer._rng)
        host = jax.device_get((loss, stats))
        bad = [k for k, v in host[1].items() if not np.isfinite(v)]
        if not np.isfinite(host[0]) or bad or args.force_fatal_epoch:
            print(f"[probe] FATAL STEP {i}: loss {host[0]}, non-finite {bad}",
                  flush=True)
            print(f"[probe] stats: {host[1]}", flush=True)
            fatal_i = i
            break
    if fatal_i is None:
        sys.exit("replay did not reproduce — non-determinism; investigate loader")

    loader.set_epoch(fatal_epoch)
    state = _restored_state()
    fatal = None
    for i, batch in enumerate(loader):
        data = trainer._device_batch(batch)
        if i == fatal_i:
            fatal = (i, batch, data, state)  # pre-step state, never donated
            break
        state, loss, stats, _, _ = trainer._train_step(state, data, trainer._rng)
    i, batch, data, prev_state = fatal

    # ---- Phase C: localized finiteness maps from the pre-step state ----
    dropout_rng = jax.random.fold_in(trainer._rng, prev_state.step)
    model, cfg = trainer._model, trainer._criterion_cfg

    raw = model.apply(
        {"params": prev_state.params, "frozen": prev_state.frozen}, data,
        deterministic=False, rngs={"dropout": dropout_rng},
    )
    print("[probe] forward finiteness (train mode):", flush=True)
    for name, (frac, mx) in _finite_map(jax.device_get(raw)).items():
        flag = "" if frac == 1.0 else "   <-- NON-FINITE"
        print(f"    {name}: finite {frac:.6f}, max|x| {mx:.4e}{flag}", flush=True)

    def fwd(p):
        return _forward_and_loss(
            model, cfg, p, prev_state.frozen, data,
            deterministic=False, dropout_rng=dropout_rng,
        )

    (loss, (stats, _, _)), grads = jax.value_and_grad(fwd, has_aux=True)(
        prev_state.params
    )
    print(f"[probe] replayed loss {jax.device_get(loss)}", flush=True)
    print(f"[probe] per-term stats: {jax.device_get(stats)}", flush=True)
    print("[probe] non-finite gradient subtrees:", flush=True)
    for name, (frac, mx) in _finite_map(jax.device_get(grads)).items():
        if frac < 1.0:
            print(f"    {name}: finite {frac:.6f}, max|x| {mx:.4e}", flush=True)

    # The exact on-device cost matrices the matcher saw at the fatal step
    # (same forward: identical params/frozen/dropout key) — phase D feeds
    # them to both solvers offline.
    from future_od_tpu.models.set_criterion import matching_costs_all
    from future_od_tpu.models.st_detr import normalize_outputs
    from future_od_tpu.ops.misc import video_hw
    from future_od_tpu.ops.target_utils import to_detr_targets

    annotated, _, _ = normalize_outputs(raw, data)
    Hh, Ww = video_hw(data["video"])
    targets = to_detr_targets(
        Hh, Ww, data["active"], data["boxes"], data["classes"]
    )
    costs, active = jax.jit(
        lambda a, t: matching_costs_all(a, t, cfg)
    )(annotated, targets)
    logits_final = np.asarray(jax.device_get(annotated["pred_logits"]))

    np.savez(
        args.out,
        step=i,
        costs=np.asarray(jax.device_get(costs)),
        cost_active=np.asarray(jax.device_get(active)),
        logits_final=logits_final,
        **{f"batch_{k}": np.asarray(v) for k, v in batch.items()
           if hasattr(v, "shape")},
    )
    _snapshot(prev_state, os.path.join(args.snap_dir, "state_prefatal.pkl"))
    print(f"[probe] dumped batch + cost matrices to {args.out} and state to "
          f"{args.snap_dir}/state_prefatal.pkl", flush=True)


def analyze(npz_path: str):
    """Phase D: solver cross-check on the captured fatal-step cost matrices.

    Runs on the CPU platform (call with JAX_PLATFORMS handling as in
    tests/conftest.py, or just let it run wherever — the auction jits
    anywhere and the Hungarian is host numpy)."""
    import json

    from future_od_tpu.models.st_detr import SpatioTemporalDETRArgs
    from future_od_tpu.ops.matching import (
        _hungarian_host,
        auction_assignment,
    )

    d = np.load(npz_path)
    costs, active = d["costs"], d["cost_active"].astype(bool)
    AB, M, N = costs.shape
    print(f"[analyze] costs ({AB}, {M}, {N}); "
          f"finite {np.isfinite(costs).mean():.6f}, "
          f"max|finite cost| {np.nanmax(np.abs(np.where(np.isfinite(costs), costs, np.nan))):.4e}")
    if "logits_final" in d:
        lg = d["logits_final"]
        print(f"[analyze] final-level logits: finite {np.isfinite(lg).mean():.6f}, "
              f"min {np.nanmin(lg):.2f}, max {np.nanmax(lg):.2f}; "
              f"sigmoid saturation (|logit|>15): {(np.abs(lg) > 15).mean():.6f}")

    idx_a, rounds = jax.jit(
        lambda c, a: auction_assignment(c, a, return_rounds=True)
    )(jnp.asarray(costs), jnp.asarray(active))
    idx_a, rounds = np.asarray(idx_a), np.asarray(rounds)
    idx_h = _hungarian_host(costs.astype(np.float32), active)

    report = {"rounds_max": int(rounds.max()), "rounds": rounds.tolist()}
    per_level = []
    for ab in range(AB):
        act = active[ab]
        n_act = int(act.sum())
        # idx arrays are (AB, N): matched query per target slot, M = unmatched
        a_row, h_row = idx_a[ab], idx_h[ab]
        matched_a = a_row[act] < M
        matched_h = h_row[act] < M
        agree = float(np.mean(a_row[act] == h_row[act])) if n_act else 1.0

        def _cost_of(row):
            sel = act & (row < M)
            if not sel.any():
                return 0.0
            c = costs[ab][row[sel], np.where(sel)[0]]
            return float(np.where(np.isfinite(c), c, 0).sum())

        per_level.append({
            "active": n_act,
            "unmatched_auction": int(n_act - matched_a.sum()),
            "unmatched_hungarian": int(n_act - matched_h.sum()),
            "agreement": agree,
            "cost_auction": _cost_of(a_row),
            "cost_hungarian": _cost_of(h_row),
        })
    report["per_problem"] = per_level
    agg = {
        "total_active": sum(p["active"] for p in per_level),
        "total_unmatched_auction": sum(p["unmatched_auction"] for p in per_level),
        "total_unmatched_hungarian": sum(p["unmatched_hungarian"] for p in per_level),
        "mean_agreement": float(np.mean([p["agreement"] for p in per_level])),
        "total_cost_auction": sum(p["cost_auction"] for p in per_level),
        "total_cost_hungarian": sum(p["cost_hungarian"] for p in per_level),
    }
    report["aggregate"] = agg
    print("[analyze] aggregate:", json.dumps(agg, indent=2))
    out = npz_path.replace(".npz", "_solver_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"[analyze] full report -> {out}")


if __name__ == "__main__":
    main()
