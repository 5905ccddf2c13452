"""Microbenchmark: ResNet stem variants at 896x1600 b12 bf16.

The 7x7/2 3-channel stem conv is the most MXU-hostile op in the network
(3 input channels -> ~2% MXU utilization as a direct conv). All variants
compute conv+BN-fold+relu+maxpool3x3/2; im2col ones work over
space-to-depth(2) input where the conv becomes 4x4/1 with K=192.

  xla7x7    direct conv (shipped default)
  xlaim2col im2col + einsum + reduce_window, all XLA
  pallasA   XLA-materialized patches -> Pallas matmul+relu+pool kernel
  pallasB   Pallas kernel does im2col in VMEM (3D concat -> one reshape)

Run on TPU: python tools/bench_stem.py ;  numerics: --check (CPU interpret)
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from future_od_tpu.models.resnet import (
    space_to_depth,
    stem_weights_to_space_to_depth,
)


def sync(x):
    np.asarray(x[0, 0, 0])


def timeit(fn, *args, iters=10, warmup=3):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1000


stem_w_to_s2d = stem_weights_to_space_to_depth  # (7,7,3,64) -> (4,4,12,64)


def pool(a):
    return jax.lax.reduce_window(
        a, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )


@jax.jit
def xla7x7(x, w7):
    c = jax.lax.conv_general_dilated(
        x, w7.astype(x.dtype), (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return pool(jax.nn.relu(c))


@jax.jit
def xlaim2col(x, w7):
    w4 = stem_w_to_s2d(w7).astype(x.dtype)
    s = space_to_depth(x)
    Hc, Wc = s.shape[1], s.shape[2]
    sp = jnp.pad(s, ((0, 0), (2, 1), (2, 1), (0, 0)))
    patches = jnp.concatenate(
        [sp[:, dy : dy + Hc, dx : dx + Wc, :] for dy in range(4)
         for dx in range(4)],
        axis=-1,
    )
    c = jnp.einsum("bhwk,ko->bhwo", patches, w4.reshape(192, 64))
    return pool(jax.nn.relu(c))


# --------------------------------------------------------------------------
# Shared Pallas matmul+relu+pool tail.
# conv coordinate i = conv_row + 1 (i=0 is the pool's padding row, value
# from real zero-padding), j = conv_col + 1. Pool row p <- i rows 2p..2p+2,
# pool col q <- j cols 2q..2q+2.
# --------------------------------------------------------------------------


def _matmul_pool(conv, tp, tile_p, Wp):
    """conv: (2*tile_p+1, >=2*Wp+1, 64) f32 conv outputs. Returns pooled
    (tile_p, Wp, 64)."""
    neg = jnp.float32(-1e30)
    row_pad = (
        jax.lax.broadcasted_iota(jnp.int32, conv.shape, 0) == 0
    ) & (tp == 0)
    col_pad = jax.lax.broadcasted_iota(jnp.int32, conv.shape, 1) == 0
    conv = jnp.where(row_pad | col_pad, neg, conv)
    n = 2 * tile_p + 1
    body = conv[:, : 2 * Wp].reshape(n, Wp, 2, conv.shape[-1])
    c0, c1 = body[:, :, 0], body[:, :, 1]
    c2 = jnp.concatenate([c0[:, 1:], conv[:, 2 * Wp : 2 * Wp + 1]], axis=1)
    colmax = jnp.maximum(jnp.maximum(c0, c1), c2)
    rows = colmax[: 2 * tile_p].reshape(tile_p, 2, Wp, colmax.shape[-1])
    r0, r1 = rows[:, 0], rows[:, 1]
    r2 = jnp.concatenate([r0[1:], colmax[2 * tile_p :]], axis=0)
    return jnp.maximum(jnp.maximum(r0, r1), r2)


def _kernelA(center, extra, w, b, out_ref, *, tile_p):
    # center: (1, 2*tile_p, Js, 192) patch rows; extra: (1, 1, Js, 192)
    tp = pl.program_id(1)
    Wp = out_ref.shape[2]
    xs = jnp.concatenate([center[0], extra[0]], axis=0)
    n = xs.shape[0]
    conv = jax.lax.dot_general(
        xs.reshape(-1, xs.shape[-1]), w[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b[:]
    conv = jnp.maximum(conv, 0.0).reshape(n, xs.shape[1], -1)
    out_ref[0] = _matmul_pool(conv, tp, tile_p, Wp).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_p", "interpret"))
def pallasA(x, w7, tile_p=8, interpret=False):
    w4 = stem_w_to_s2d(w7)
    s = space_to_depth(x)
    B, Hc, Wc, _ = s.shape
    Hp, Wp = Hc // 2, Wc // 2
    # conv coords: i in [0, 2*Hp+1), j in [0, 2*Wp+1)
    sp = jnp.pad(s, ((0, 0), (3, 1), (3, 1), (0, 0)))
    nj = 2 * Wp + 1
    jpad = (-nj) % 8
    patches = jnp.concatenate(
        [
            jnp.pad(
                sp[:, di : di + 2 * Hp + 1, dj : dj + nj],
                ((0, 0), (0, 0), (0, jpad), (0, 0)),
            )
            for di in range(4)
            for dj in range(4)
        ],
        axis=-1,
    )  # (B, 2*Hp+1, Js, 192)
    n_tiles = Hp // tile_p
    js = nj + jpad
    return pl.pallas_call(
        functools.partial(_kernelA, tile_p=tile_p),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, 2 * tile_p, js, 192), lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, js, 192),
                lambda b, i: (b, jnp.minimum((i + 1) * 2 * tile_p, 2 * Hp), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_p, Wp, 64), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp, 64), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        patches, patches,
        w4.reshape(192, 64).astype(x.dtype),
        jnp.zeros((1, 64), jnp.float32),
    )


def _kernelB(*refs, tile_p):
    # refs: center (1, 2*tile_p, Js, 12), 4 single halo rows, w, b, out
    center, h0, h1r, h2r, h3r, w, b, out_ref = refs
    tp = pl.program_id(1)
    Wp = out_ref.shape[2]
    xs = jnp.concatenate(
        [center[0], h0[0], h1r[0], h2r[0], h3r[0]], axis=0
    )  # (2*tile_p+4, Js, 12)
    n = 2 * tile_p + 1
    nj = 2 * Wp + 1
    pats = jnp.concatenate(
        [
            xs[di : di + n, dj : dj + nj]
            for di in range(4)
            for dj in range(4)
        ],
        axis=-1,
    )  # (n, nj, 192) — 3D concat, then ONE reshape
    conv = jax.lax.dot_general(
        pats.reshape(-1, 192), w[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b[:]
    conv = jnp.maximum(conv, 0.0).reshape(n, nj, -1)
    out_ref[0] = _matmul_pool(conv, tp, tile_p, Wp).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_p", "interpret"))
def pallasB(x, w7, tile_p=8, interpret=False):
    w4 = stem_w_to_s2d(w7)
    s = space_to_depth(x)
    B, Hc, Wc, _ = s.shape
    Hp, Wp = Hc // 2, Wc // 2
    jpad = (-(Wc + 4)) % 8
    sp = jnp.pad(s, ((0, 0), (3, 1), (3, 1 + jpad), (0, 0)))
    js = Wc + 4 + jpad
    n_tiles = Hp // tile_p
    step = 2 * tile_p
    nrow = 2 * Hp + 4  # sp rows
    row = lambda off: pl.BlockSpec(
        (1, 1, js, 12),
        lambda b, i, off=off: (
            b, jnp.minimum(i * step + step + off, nrow - 1), 0, 0
        ),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_kernelB, tile_p=tile_p),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, step, js, 12), lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            row(0), row(1), row(2), row(3),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_p, Wp, 64), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp, 64), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        sp, sp, sp, sp, sp,
        w4.reshape(192, 64).astype(x.dtype),
        jnp.zeros((1, 64), jnp.float32),
    )


@jax.jit
def xla_s2d(x, w7):
    w4 = stem_w_to_s2d(w7).astype(x.dtype)
    s = space_to_depth(x)
    c = jax.lax.conv_general_dilated(
        s, w4, (1, 1), [(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return pool(jax.nn.relu(c))


def _kernelB16(*refs, tile_p):
    # Channel-padded (16) variant: im2col K = 16 taps x 16 ch = 256, which
    # keeps every lane dimension 128-aligned after the concat.
    center, h0, h1r, h2r, h3r, w, b, out_ref = refs
    tp = pl.program_id(1)
    Wp = out_ref.shape[2]
    xs = jnp.concatenate(
        [center[0], h0[0], h1r[0], h2r[0], h3r[0]], axis=0
    )  # (2*tile_p+4, Js, 16)
    n = 2 * tile_p + 1
    nj = 2 * Wp + 1
    pats = jnp.concatenate(
        [
            xs[di : di + n, dj : dj + nj]
            for di in range(4)
            for dj in range(4)
        ],
        axis=-1,
    )  # (n, nj, 256)
    conv = jax.lax.dot_general(
        pats.reshape(-1, 256), w[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b[:]
    conv = jnp.maximum(conv, 0.0).reshape(n, nj, -1)
    out_ref[0] = _matmul_pool(conv, tp, tile_p, Wp).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_p", "interpret"))
def pallasB16(x, w7, tile_p=8, interpret=False):
    w4 = stem_w_to_s2d(w7)  # (4, 4, 12, 64)
    w4 = jnp.pad(w4, ((0, 0), (0, 0), (0, 4), (0, 0)))  # ch 12 -> 16
    s = space_to_depth(x)
    B, Hc, Wc, _ = s.shape
    Hp, Wp = Hc // 2, Wc // 2
    jpad = (-(Wc + 4)) % 8
    sp = jnp.pad(s, ((0, 0), (3, 1), (3, 1 + jpad), (0, 4)))
    js = Wc + 4 + jpad
    n_tiles = Hp // tile_p
    step = 2 * tile_p
    nrow = 2 * Hp + 4
    row = lambda off: pl.BlockSpec(
        (1, 1, js, 16),
        lambda b, i, off=off: (
            b, jnp.minimum(i * step + step + off, nrow - 1), 0, 0
        ),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_kernelB16, tile_p=tile_p),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, step, js, 16), lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            row(0), row(1), row(2), row(3),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_p, Wp, 64), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp, 64), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        sp, sp, sp, sp, sp,
        w4.reshape(256, 64).astype(x.dtype),
        jnp.zeros((1, 64), jnp.float32),
    )


def check_interpret():
    jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)).astype(np.float32))
    w7 = jnp.asarray(rng.normal(size=(7, 7, 3, 64)).astype(np.float32) * 0.1)
    ref = np.asarray(xla7x7(x, w7))
    for name, fn in [("xlaim2col", xlaim2col)]:
        err = np.abs(np.asarray(fn(x, w7)) - ref).max()
        print(f"{name}: maxerr={err:.2e}")
        assert err < 2e-4, (name, err)
    err = np.abs(np.asarray(xla_s2d(x, w7)) - ref).max()
    print(f"xla_s2d: maxerr={err:.2e}")
    assert err < 2e-4, err
    for name, fn in [
        ("pallasA", pallasA), ("pallasB", pallasB), ("pallasB16", pallasB16)
    ]:
        err = np.abs(np.asarray(fn(x, w7, interpret=True)) - ref).max()
        print(f"{name}: maxerr={err:.2e}")
        assert err < 2e-4, (name, err)
    print("interpret check OK")


# --------------------------------------------------------------------------
# Host-packed variants (loader emits packed frames; packing happens OUTSIDE
# the timed program — the deployment shape after round 3's Loader work) and
# the s2d(4) stem: conv3x3/1 over (H/4, W/4, 48) with a (3,3,48,256) kernel
# whose 2x2 output group is consumed in packed form by s2d4_stem_pool — no
# depth-to-space transpose, contraction depth 48.
# --------------------------------------------------------------------------

from future_od_tpu.models.resnet import (  # noqa: E402
    space_to_depth4,
    stem_weights_to_s2d4,
    s2d4_stem_pool,
)


def s2d_host(s, w4):
    c = jax.lax.conv_general_dilated(
        s, w4, (1, 1), [(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return pool(jax.nn.relu(c))


def s2d4_host(x48, w3):
    c = jax.lax.conv_general_dilated(
        x48, w3, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return s2d4_stem_pool(jax.nn.relu(c))


def s2d4_im2col(x48, w3):
    B, Hp, Wp, _ = x48.shape
    xp = jnp.pad(x48, ((0, 0), (1, 1), (1, 1), (0, 0)))
    pats = jnp.concatenate(
        [xp[:, di : di + Hp, dj : dj + Wp] for di in range(3)
         for dj in range(3)],
        axis=-1,
    )
    c = jnp.einsum("bhwk,ko->bhwo", pats, w3.reshape(9 * 48, 256))
    return s2d4_stem_pool(jax.nn.relu(c))


def s2d4_p128_host(x128, w3p):
    """s2d(4) stem with the 48 packed channels zero-padded to a lane-aligned
    128 (padding done on host / outside timing): tests whether XLA's conv is
    efficient once Cin is a full lane tile."""
    c = jax.lax.conv_general_dilated(
        x128, w3p, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return s2d4_stem_pool(jax.nn.relu(c))


def _kernelD(center, h0, h1, w_ref, out_ref, *, tile_p):
    """s2d(4) stem conv as 9 accumulated full-lane matmuls.

    center: (1, tile_p, Js, 128) — s2d4 input (48 real channels zero-padded
    to a full 128 lane tile on the host; Js = Wp+2 col halos); h0/h1: the
    two rows below the tile; w_ref: (9, 128, 256); out_ref:
    (1, tile_p, Wp, 256) packed conv output (channel order (a, b, c) —
    consumed by s2d4_stem_pool outside). Every operand keeps a 128/256 lane
    dim: no narrow-lane casts, the construct this toolchain's Mosaic
    rejects (BENCHMARKS.md round 2/3).
    """
    Wp = out_ref.shape[2]
    xs = jnp.concatenate([center[0], h0[0], h1[0]], axis=0)

    # 9 whole-tile matmuls (M = tile_p*Wp) — one per conv tap, statically
    # unrolled (this toolchain's Pallas lowering has no dynamic_slice on
    # values), accumulated in f32
    acc = jnp.zeros((tile_p * Wp, 256), jnp.float32)
    for di in range(3):
        for dj in range(3):
            xt = (
                xs[di : di + tile_p, dj : dj + Wp, :]
                .reshape(tile_p * Wp, 128)
                .astype(jnp.bfloat16)
            )
            acc += jax.lax.dot_general(
                xt, w_ref[di * 3 + dj],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    out_ref[0] = (
        jnp.maximum(acc, 0.0).reshape(tile_p, Wp, 256).astype(out_ref.dtype)
    )


@functools.partial(jax.jit, static_argnames=("tile_p", "interpret"))
def pallasD(x128, w3p, tile_p=8, interpret=False):
    """Full s2d(4) stem: Pallas 9-tap conv (relu fused) + XLA transpose-free
    pool. x128: (B, Hp, Wp, 128) host-padded s2d4 frames; w3p: (3,3,128,256).
    """
    B, Hp, Wp, _ = x128.shape
    xp = jnp.pad(x128, ((0, 0), (1, 1), (1, 1), (0, 0)))  # rows/cols +1 halo
    w9 = w3p.reshape(9, 128, 256).astype(jnp.bfloat16)
    n_tiles = Hp // tile_p
    row = lambda off: pl.BlockSpec(
        (1, 1, Wp + 2, 128),
        lambda b, i, off=off: (b, i * tile_p + tile_p + off, 0, 0),
        memory_space=pltpu.VMEM,
    )
    conv = pl.pallas_call(
        functools.partial(_kernelD, tile_p=tile_p),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, tile_p, Wp + 2, 128), lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            row(0), row(1),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_p, Wp, 256), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp, 256), x128.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(xp, xp, xp, w9)
    return s2d4_stem_pool(conv)


def timeit_chained(fn, x0, w, iters=8, warmup=1):
    """Chained-iteration timing inside ONE jitted program (per-dispatch host
    overhead through the axon tunnel poisons loop timings — BENCHMARKS.md
    round-2 measurement discipline)."""

    @jax.jit
    def chained(x0, w):
        def body(c, _):
            out = fn(x0 + c, w)
            return (out.reshape(-1)[0] * 1e-30).astype(x0.dtype), None

        c, _ = jax.lax.scan(body, jnp.zeros((), x0.dtype), None, length=iters)
        return c

    for _ in range(warmup):
        np.asarray(chained(x0, w))
    t0 = time.perf_counter()
    np.asarray(chained(x0, w))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    import sys
    sys.path.insert(0, "/root/repo")
    from future_od_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    B, H, W = 24, 896, 1600  # b12 x 2 frames: the embedded backbone batch
    x = jnp.asarray(
        rng.normal(size=(B, H, W, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    w7 = jnp.asarray(rng.normal(size=(7, 7, 3, 64)).astype(np.float32) * 0.1)
    x12 = space_to_depth(x)
    x48 = space_to_depth4(x)
    w4 = stem_w_to_s2d(w7).astype(x.dtype)
    w3 = stem_weights_to_s2d4(w7).astype(x.dtype)

    ref = None
    x128 = jnp.pad(x48, ((0, 0), (0, 0), (0, 0), (0, 80)))
    w3p = jnp.pad(w3, ((0, 0), (0, 0), (0, 80), (0, 0)))
    for name, fn, xin, win in [
        ("xla7x7", xla7x7, x, w7),
        ("s2d_host", s2d_host, x12, w4),
        ("s2d4_host", s2d4_host, x48, w3),
        ("s2d4_p128", s2d4_p128_host, x128, w3p),
        ("s2d4_im2col", s2d4_im2col, x48, w3),
    ]:
        try:
            out = np.asarray(fn(xin, win), np.float32)
            if ref is None:
                ref = out
            err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
            ms = timeit_chained(fn, xin, win)
            print(f"  {name:12s} {ms:7.2f} ms   relmax={err:.2e}", flush=True)
        except Exception as e:
            print(f"  {name} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    import sys

    if "--check" in sys.argv:
        check_interpret()
    else:
        main()
