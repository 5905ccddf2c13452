"""Decoder + heads + post-proc piece timing at the embedded inference shape.

VERDICT r3 #6 / r4 #4: the round-3 roofline put "decoder + IMU + postproc" at
7.2 ms embedded vs ~3 ms of small-op latency bounds, and round 4 shipped the
dispatch half (einsum decoder attns, +5.3%) without ever recording the
aux-head/post-proc half. This tool times each piece the credible way for this
environment (BENCHMARKS.md round 2: per-dispatch host overhead poisons
standalone timings): every measurement chains ITERS iterations inside ONE
jitted lax.scan with a data dependency, so per-iteration cost is pure device
time.

Pieces, at the flagship's eval config (B=12, two 28x50 feature memories,
D=256, M=128 queries, 8 heads, 6 layers, egodeep token, bf16):
  detector   CDetrDetectorSpatioTemporal.detect equivalent (decoder stack +
             class/bbox heads) — deterministic, so aux levels DCE like the
             real inference program
  dec-stack  TransformerDecoder alone (no heads)
  heads      class_embed + bbox_embed + sigmoid coords on the FULL stacked
             hs (the training configuration: 6 levels in one matmul)
  heads[-1]  same on the final level only (what inference keeps after DCE)
  postproc   st_detr.post_process (sigmoid + scale + corner conversion +
             annotated-frame gather)

Optimization arms (same pieces re-timed):
  FUTURE_OD_PACKED_PROJ=1  pack the per-input Dense projections inside the
             attention blocks (self-attn q/k/v content kernels concatenated
             into one (D, 3D) matmul, etc. — models/layers.py)

Run on TPU (serialized — no other TPU/CPU jobs):
    python tools/bench_decoder_split.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from future_od_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

B, H_TOK, W_TOK, D, M, HEADS, LAYERS = 12, 28, 50, 256, 128, 8, 6
N = H_TOK * W_TOK
ITERS = int(os.environ.get("BENCH_ITERS", 50))


def timed_chain(apply_fn, feedback_fn, x0, label):
    """Time apply_fn chained ITERS times in ONE jitted scan.

    feedback_fn(out) must return a scalar mixed back into the carry so the
    iterations have a true data dependency (no DCE, no overlap)."""

    def body(carry, _):
        out = apply_fn(carry)
        return carry + feedback_fn(out).astype(carry.dtype) * 1e-12, None

    @jax.jit
    def run(x):
        y, _ = jax.lax.scan(body, x, None, length=ITERS)
        return y

    r = run(x0)
    np.asarray(r)  # warm compile + sync (axon: block_until_ready returns early)
    t0 = time.perf_counter()
    r = run(x0)
    np.asarray(r)
    ms = (time.perf_counter() - t0) / ITERS * 1000
    print(f"  {label:<34}{ms:8.3f} ms", flush=True)
    return ms


def main():
    from future_od_tpu.models.cores import CDetrDetectorSpatioTemporal
    from future_od_tpu.models.decoder import TransformerDecoder
    from future_od_tpu.models import st_detr

    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    features = jnp.asarray(
        rng.normal(size=(B, 2, H_TOK, W_TOK, D)).astype(np.float32), dtype=bf
    )
    pos_enc = jnp.asarray(
        rng.normal(size=(2, H_TOK, W_TOK, D)).astype(np.float32), dtype=bf
    )
    egodeep = jnp.asarray(
        rng.normal(size=(B, 2, D)).astype(np.float32), dtype=bf
    )

    detector = CDetrDetectorSpatioTemporal(
        num_classes=8, hidden_dim=D, num_queries=M, dec_layers=LAYERS,
        dec_heads=HEADS, ff_dim=2048, num_images=2, use_egodeep=True,
    )
    dvars = jax.jit(
        lambda k: detector.init(
            {"params": k}, features, pos_enc, egodeep, deterministic=True
        )
    )(jax.random.key(0))
    dvars = jax.tree.map(lambda x: x.astype(bf), dvars)

    def run_detector(f):
        out = detector.apply(dvars, f, pos_enc, egodeep, deterministic=True)
        return out["pred_logits"], out["pred_boxes"]

    t_det = timed_chain(
        run_detector, lambda o: jnp.sum(o[0].astype(jnp.float32)), features,
        "detector (decoder+heads, DCE'd aux)",
    )

    decoder = TransformerDecoder(
        num_layers=LAYERS, dim=D, num_heads=HEADS, ff_dim=2048,
        num_images=2, use_egodeep=True,
    )
    q_pos = jnp.asarray(rng.normal(size=(B, M, D)).astype(np.float32), bf)
    q_content = jnp.zeros((B, M, D), bf)
    frames = [features[:, 0].reshape(B, N, D), features[:, 1].reshape(B, N, D)]
    poss = [pos_enc[0].reshape(1, N, D) * jnp.ones((B, 1, 1), bf)] * 2
    ego1 = egodeep[:, :1]
    dec_vars = jax.jit(
        lambda k: decoder.init(
            {"params": k}, q_content, q_pos, frames, poss,
            first_layer_special=True, egodeep=ego1, deterministic=True,
        )
    )(jax.random.key(1))
    dec_vars = jax.tree.map(lambda x: x.astype(bf), dec_vars)

    def run_stack(f):
        fr = [f[:, 0].reshape(B, N, D), f[:, 1].reshape(B, N, D)]
        hs, ref = decoder.apply(
            dec_vars, q_content, q_pos, fr, poss,
            first_layer_special=True, egodeep=ego1, deterministic=True,
        )
        return hs, ref

    t_stack = timed_chain(
        run_stack, lambda o: jnp.sum(o[0][-1].astype(jnp.float32)), features,
        "decoder stack only (6 levels out)",
    )

    def run_stack_last(f):
        hs, ref = run_stack(f)
        return hs[-1], ref  # aux levels dead -> XLA may DCE the stack copy

    timed_chain(
        run_stack_last, lambda o: jnp.sum(o[0].astype(jnp.float32)), features,
        "decoder stack, last level consumed",
    )

    # Heads on a precomputed hs stack (training shape: all 6 levels).
    from flax import linen as nn
    from future_od_tpu.models.layers import MLP, default_kernel_init

    class Heads(nn.Module):
        @nn.compact
        def __call__(self, hs, ref_logit):
            deltas = MLP(D, 4, 3, last_layer_zero_init=True, name="bbox")(hs)
            coords = jnp.concatenate(
                [deltas[..., :2] + ref_logit[None], deltas[..., 2:]], -1
            )
            cls = nn.Dense(8, kernel_init=default_kernel_init, name="cls")(hs)
            return cls, nn.sigmoid(coords)

    hs0 = jnp.asarray(
        rng.normal(size=(LAYERS, B, M, D)).astype(np.float32), bf
    )
    ref_logit = jnp.asarray(rng.normal(size=(B, M, 2)).astype(np.float32), bf)
    heads = Heads()
    hvars = jax.tree.map(
        lambda x: x.astype(bf),
        jax.jit(lambda k: heads.init(k, hs0, ref_logit))(jax.random.key(2)),
    )
    timed_chain(
        lambda h: heads.apply(hvars, h, ref_logit),
        lambda o: jnp.sum(o[0].astype(jnp.float32)), hs0,
        "heads, all 6 levels (train shape)",
    )
    hs1 = hs0[:1]
    timed_chain(
        lambda h: heads.apply(hvars, h, ref_logit),
        lambda o: jnp.sum(o[0].astype(jnp.float32)), hs1,
        "heads, final level only (inference)",
    )

    # post_process at the inference output shape.
    logits = jnp.asarray(
        rng.normal(size=(B, 1, M, 8)).astype(np.float32), bf
    )
    boxes = jax.nn.sigmoid(
        jnp.asarray(rng.normal(size=(B, 1, M, 4)).astype(np.float32), bf)
    )
    data = {
        "video": jnp.zeros((B, 3, 896, 1600, 3), bf),
        "annotated_frame_idx": jnp.asarray([2] * B),
    }

    def run_pp(lg):
        out, s, b = st_detr.post_process(lg, boxes, data)
        return s, b

    timed_chain(
        run_pp, lambda o: jnp.sum(o[0].astype(jnp.float32)), logits,
        "post_process (inference shape)",
    )

    print(f"\n  detector total {t_det:.3f} ms  (stack {t_stack:.3f} + "
          f"heads/embed/ref {t_det - t_stack:.3f})", flush=True)


if __name__ == "__main__":
    main()
