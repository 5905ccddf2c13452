"""Microbenchmark: fused-bottleneck kernel variants vs XLA at layer1 shapes.

Layer1 of ResNet-50 @ 896x1600 input is the bandwidth-bound stage
(BENCHMARKS.md): 3 bottlenecks at 224x400 spatial, cmid=64, cout=256.
This script times XLA vs the shipped fused kernel vs candidate variants
so kernel changes are judged on the real shapes before landing.

Run on the TPU:  python tools/bench_fused_bottleneck.py
"""
from __future__ import annotations

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from future_od_tpu.utils.cache import enable_compilation_cache
from future_od_tpu.ops.fused_resnet import fused_bottleneck


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0][0, 0, 0])


def timeit(fn, *args, iters=10, warmup=3):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1000


def xla_bottleneck(x, w1, b1, w2, b2, w3, b3, wd=None, bd=None):
    h = jax.nn.relu(jnp.einsum("bhwc,cd->bhwd", x, w1) + b1)
    h = jax.lax.conv_general_dilated(
        h, w2, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b2
    h = jax.nn.relu(h)
    h = jnp.einsum("bhwc,cd->bhwd", h, w3) + b3
    res = jnp.einsum("bhwc,cd->bhwd", x, wd) + bd if wd is not None else x
    return jax.nn.relu(h + res)


# --------------------------------------------------------------------------
# v2: same-array halo blocks (clamped index maps, no strided gathers, width
# pad only) + im2col single matmul for the 3x3.
# --------------------------------------------------------------------------


def _v2_kernel(top, center, bot, w1, b1, w2, b2, w3, b3, wd, bd, out_ref,
               *, tile_h, has_ds, im2col):
    ty = pl.program_id(1)
    W = out_ref.shape[2]
    xs = jnp.concatenate([top[0], center[0], bot[0]], axis=0)
    cin = xs.shape[-1]
    ws = xs.shape[1]
    cmid = w1.shape[-1]
    cout = w3.shape[-1]

    h1 = jax.lax.dot_general(
        xs.reshape(-1, cin), w1[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1[:]
    h1 = jnp.maximum(h1, 0.0).reshape(tile_h + 2, ws, cmid)
    row = jax.lax.broadcasted_iota(jnp.int32, h1.shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, h1.shape, 1)
    grow = ty * tile_h + row - 1
    inside = (
        (grow >= 0)
        & (grow < pl.num_programs(1) * tile_h)
        & (col >= 1)
        & (col <= W)
    )
    h1 = jnp.where(inside, h1, 0.0).astype(xs.dtype)

    if im2col:
        pats = jnp.concatenate(
            [
                h1[dy : dy + tile_h, dx : dx + W].reshape(tile_h * W, cmid)
                for dy in range(3)
                for dx in range(3)
            ],
            axis=-1,
        )  # (tile_h*W, 9*cmid)
        acc = jax.lax.dot_general(
            pats, w2[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2[:]
    else:
        acc = jnp.broadcast_to(b2[:], (tile_h * W, cmid)).astype(jnp.float32)
        w2r = w2[:].reshape(3, 3, cmid, cmid)
        for dy in range(3):
            for dx in range(3):
                acc = acc + jax.lax.dot_general(
                    h1[dy : dy + tile_h, dx : dx + W].reshape(-1, cmid),
                    w2r[dy, dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    h2 = jnp.maximum(acc, 0.0).astype(xs.dtype)

    h3 = jax.lax.dot_general(
        h2, w3[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + b3[:]
    center_px = xs[1 : 1 + tile_h, 1 : 1 + W].reshape(-1, cin)
    if has_ds:
        res = jax.lax.dot_general(
            center_px, wd[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bd[:]
    else:
        res = center_px.astype(jnp.float32)
    out = jnp.maximum(h3 + res, 0.0)
    out_ref[0] = out.reshape(tile_h, W, cout).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_h", "im2col"))
def fused_v2(x, w1, b1, w2, b2, w3, b3, wd=None, bd=None, tile_h=8,
             im2col=True):
    B, H, W, cin = x.shape
    assert H % tile_h == 0
    cmid = w1.shape[-1]
    cout = w3.shape[-1]
    has_ds = wd is not None
    wpad = (-(W + 2)) % 8
    ws = W + 2 + wpad
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1 + wpad), (0, 0)))  # width pad only

    dtype = x.dtype
    w2k = (
        # im2col weight: (9*cmid, cmid), tap order matches the kernel concat
        jnp.transpose(w2, (0, 1, 2, 3)).reshape(9 * cmid, cmid)
        if True
        else w2
    )
    args = [
        xp, xp, xp,
        w1.astype(dtype), b1.astype(jnp.float32).reshape(1, -1),
        w2k.astype(dtype), b2.astype(jnp.float32).reshape(1, -1),
        w3.astype(dtype), b3.astype(jnp.float32).reshape(1, -1),
    ]
    if has_ds:
        args += [wd.astype(dtype), bd.astype(jnp.float32).reshape(1, -1)]
    else:
        args += [jnp.zeros((1, 1), dtype), jnp.zeros((1, 1), jnp.float32)]

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    n_tiles = H // tile_h
    row_spec = lambda rm: pl.BlockSpec(
        (1, 1, ws, cin), rm, memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(
            _v2_kernel, tile_h=tile_h, has_ds=has_ds, im2col=im2col
        ),
        grid=(B, n_tiles),
        in_specs=[
            row_spec(lambda b, i: (b, jnp.maximum(i * tile_h - 1, 0), 0, 0)),
            pl.BlockSpec(
                (1, tile_h, ws, cin), lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            row_spec(
                lambda b, i: (
                    b, jnp.minimum((i + 1) * tile_h, x.shape[1] - 1), 0, 0
                )
            ),
            vmem(), vmem(), vmem(), vmem(), vmem(), vmem(), vmem(), vmem(),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, W, cout), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, cout), dtype),
    )(*args)


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    B, H, W = 12, 224, 400
    dt = jnp.bfloat16
    r = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.1, dt)

    print(f"== layer1 inner block (cin=256) B={B} {H}x{W} {dt.__name__} ==")
    x = r(B, H, W, 256)
    w1, b1 = r(256, 64), r(64)
    w2, b2 = r(3, 3, 64, 64), r(64)
    w3, b3 = r(64, 256), r(256)

    ref = None
    def check(name, fn, *args, **kw):
        nonlocal ref
        out = np.asarray(fn(*args, **kw), np.float32)
        if ref is None:
            ref = out
        err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        ms = timeit(lambda: fn(*args, **kw))
        print(f"  {name:34s} {ms:7.2f} ms   relmax={err:.2e}", flush=True)

    jx = jax.jit(xla_bottleneck)
    check("xla", jx, x, w1, b1, w2, b2, w3, b3)
    check("fused v1 (shipped, tile 8)", fused_bottleneck,
          x, w1, b1, w2, b2, w3, b3)
    for tile in (8, 16, 32):
        for im2col in (False, True):
            try:
                check(
                    f"v2 tile={tile} im2col={int(im2col)}", fused_v2,
                    x, w1, b1, w2, b2, w3, b3, tile_h=tile, im2col=im2col,
                )
            except Exception as e:
                print(f"  v2 tile={tile} im2col={int(im2col)} FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)

    print(f"== layer1 block0 (cin=64, downsample) ==")
    x0 = r(B, H, W, 64)
    w1a = r(64, 64)
    wd, bd = r(64, 256), r(256)
    ref = None
    check("xla", jx, x0, w1a, b1, w2, b2, w3, b3, wd, bd)
    check("fused v1 (shipped, tile 8)", fused_bottleneck,
          x0, w1a, b1, w2, b2, w3, b3, wd, bd)
    check("v2 tile=16 im2col=1", fused_v2,
          x0, w1a, b1, w2, b2, w3, b3, wd, bd, tile_h=16, im2col=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
