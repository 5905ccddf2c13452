"""Train-step cost decomposition at the stage-1 config (b32 448x800 bf16).

Times four nested programs to locate where the 835 ms step goes:
  infer    deterministic forward + postproc (no loss)
  fwdloss  training forward + matcher + criterion (no grad)
  grad     value_and_grad of fwdloss
  step     full train step (grad + AdamW + mAP prep)

Run on TPU: python tools/bench_train_split.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax


def timed(fn, *args, iters=5, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1000


def main():
    from future_od_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from future_od_tpu.models.build import build_flagship
    from future_od_tpu.models.st_detr import SpatioTemporalDETRArgs
    from future_od_tpu.train.optimizer import build_optimizer
    from future_od_tpu.train.step import (
        TrainState,
        _forward_and_loss,
        _to_half,
        make_inference_fn,
        make_train_step,
    )

    B, L, H, W, N = 32, 3, 448, 800, 256
    args = SpatioTemporalDETRArgs(
        num_classes=8, num_queries=128, lr_backbone=1e-4
    )
    model = build_flagship(args)
    rng = np.random.default_rng(0)
    # scene-like targets (same recipe as bench_train.py): scattered centers,
    # log-normal sizes — origin-piled boxes drove pathological auction rounds
    cxy = rng.uniform(0.05, 0.95, size=(B, N, 2)).astype(np.float32) * [W, H]
    wh = np.exp(rng.normal(4.0, 0.6, size=(B, N, 2))).astype(np.float32)
    wh = np.clip(wh, 8, [W * 0.5, H * 0.5])
    data = {
        "video": jnp.asarray(
            rng.normal(size=(B, L, H, W, 3)).astype(np.float32)
        ),
        "boxes": jnp.asarray(
            np.concatenate([cxy - wh / 2, cxy + wh / 2], -1)
        ),
        "classes": jnp.asarray(rng.integers(0, 8, size=(B, N))),
        "active": jnp.asarray(
            (rng.uniform(size=(B, N)) < 0.1).astype(np.int64)
        ),
        "annotated_frame_idx": jnp.asarray([L - 1] * B),
    }
    for key, d in [
        ("translation", 3), ("acceleration", 3), ("rotation", 4),
        ("rotation_rate", 3), ("speed", 1),
    ]:
        data[key] = jnp.asarray(
            rng.normal(size=(B, L, d)).astype(np.float32)
        )

    variables = jax.jit(
        lambda k: model.init({"params": k}, data, deterministic=True)
    )(jax.random.key(0))
    tx, opt_state = build_optimizer(
        variables["params"], lr=args.lr, lr_backbone=args.lr_backbone,
        weight_decay=args.weight_decay, max_norm=args.max_norm,
    )
    state = TrainState(
        variables["params"], variables["frozen"], opt_state, jnp.int32(0)
    )
    ccfg = args.criterion_config()
    key = jax.random.key(1)
    bf = jnp.bfloat16
    data_h = dict(data)
    data_h["video"] = data["video"].astype(bf)
    params_h = _to_half(state.params, bf)
    frozen_h = _to_half(state.frozen, bf)

    infer = jax.jit(make_inference_fn(model))
    vars_h = {"params": params_h, "frozen": frozen_h}
    print(f"  infer (det fwd+postproc)  {timed(infer, vars_h, data_h):8.1f} ms",
          flush=True)

    from future_od_tpu.models.set_criterion import SOLVERS, matching_costs_all
    from future_od_tpu.models.st_detr import normalize_outputs
    from future_od_tpu.ops.misc import video_hw
    from future_od_tpu.ops.target_utils import to_detr_targets

    def _fwd(p):
        return model.apply(
            {"params": _to_half(p, bf), "frozen": frozen_h}, data_h,
            deterministic=False, rngs={"dropout": key},
        )

    jraw = jax.jit(lambda p: _fwd(p)["pred_boxes"])
    print(f"  train fwd only            {timed(jraw, state.params):8.1f} ms",
          flush=True)

    def _costs(p):
        annotated, _, _ = normalize_outputs(_fwd(p), data_h)
        Hh, Ww = video_hw(data_h["video"])
        targets = to_detr_targets(
            Hh, Ww, data_h["active"], data_h["boxes"], data_h["classes"]
        )
        return matching_costs_all(annotated, targets, ccfg), targets

    jcosts = jax.jit(lambda p: _costs(p)[0][0])
    print(f"  + 6-level cost build      {timed(jcosts, state.params):8.1f} ms",
          flush=True)

    def _solve(p):
        (costs, active), _ = _costs(p)
        idx, rounds = SOLVERS[ccfg.matcher](costs, active, return_rounds=True)
        return idx, rounds

    jsolve = jax.jit(lambda p: _solve(p)[0])
    print(f"  + auction solve           {timed(jsolve, state.params):8.1f} ms",
          flush=True)

    def fwdloss(p):
        return _forward_and_loss(
            model, ccfg, _to_half(p, bf), frozen_h, data_h,
            deterministic=False, dropout_rng=key,
        )

    jfwd = jax.jit(lambda p: fwdloss(p)[0])
    print(f"  train fwd + matcher+loss  {timed(jfwd, state.params):8.1f} ms",
          flush=True)

    # NOTE: the grads themselves must be program OUTPUTS — returning only the
    # loss value lets XLA dead-code-eliminate the entire backward graph (the
    # round-3 run measured exactly fwd+loss time that way).
    jgrad = jax.jit(
        lambda p: jax.value_and_grad(fwdloss, has_aux=True)(p)[1]
    )
    print(f"  + backward (grads)        {timed(jgrad, state.params):8.1f} ms",
          flush=True)

    def grad_opt(s):
        (loss, _), grads = jax.value_and_grad(
            lambda p: fwdloss(p), has_aux=True
        )(s.params)
        updates, opt_state = tx.update(grads, s.opt_state, s.params)
        params = optax.apply_updates(s.params, updates)
        return TrainState(params, s.frozen, opt_state, s.step + 1)

    jgradopt = jax.jit(grad_opt)
    print(f"  + optimizer (no mAP)      {timed(jgradopt, state):8.1f} ms",
          flush=True)

    step = jax.jit(make_train_step(model, ccfg, tx, mixed_precision=True))
    t = timed(step, state, data, key)
    print(f"  full step                 {t:8.1f} ms", flush=True)

    # BENCH_SEVER_SWEEP=1: move the backward-sever boundary through the
    # backbone (FUTURE_OD_SEVER_STAGE, measurement-only — see resnet.py) and
    # time the FULL step per position. Successive differences attribute the
    # backward (dgrad+wgrad) of each stage; "none" (no sever; freeze via the
    # optimizer mask only) bounds the stem+layer1 backward.
    if os.environ.get("BENCH_SEVER_SWEEP", "0") == "1":
        print("  -- sever sweep (full step per backward boundary) --",
              flush=True)
        prev = None
        for sever in ["none", "0", "1", "2", "3"]:
            if sever == "none":
                os.environ["FUTURE_OD_SEVER_STAGE"] = "-1"  # matches no stage
            else:
                os.environ["FUTURE_OD_SEVER_STAGE"] = sever
            m = build_flagship(args)  # re-trace under the new boundary
            s = jax.jit(make_train_step(m, ccfg, tx, mixed_precision=True))
            t = timed(s, state, data, key)
            label = (
                "no sever (mask-frozen)" if sever == "none"
                else f"sever after layer{int(sever) + 1}"
            )
            marginal = "" if prev is None else f"   (-{prev - t:6.1f})"
            print(f"  {label:<26}{t:8.1f} ms{marginal}", flush=True)
            prev = t
        os.environ.pop("FUTURE_OD_SEVER_STAGE", None)


if __name__ == "__main__":
    main()
