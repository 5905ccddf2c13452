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
    """DEVICE time per call: chains `iters` sequential executions inside ONE
    jitted program (lax.scan with a data dependency), so per-dispatch host
    overhead — large and variable through this environment's axon tunnel —
    is amortized away. (Naive dispatch loops here overstate small programs:
    a standalone backbone 'measured' slower than the full model containing
    it.)"""
    x0 = args[0]
    rest = args[1:]

    @jax.jit
    def chained(x0, rest):
        def body(c, _):
            out = fn(x0 + c, *rest)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return (leaf.reshape(-1)[0] * 1e-30).astype(x0.dtype), None

        c, _ = jax.lax.scan(
            body, jnp.zeros((), x0.dtype), None, length=iters
        )
        return c

    for _ in range(warmup):
        np.asarray(chained(x0, rest))
    t0 = time.perf_counter()
    np.asarray(chained(x0, rest))
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(*args)


# --------------------------------------------------------------------------
# v3: the whole layer1 (3 chained bottlenecks) in one kernel. 3-row halos
# (one per chained 3x3) as six clamped one-row blocks; each block's h1 and
# output are masked to image support so boundary zeros propagate exactly
# like XLA's conv padding.
# --------------------------------------------------------------------------


def _v3_kernel(*refs, tile_h, n_blocks):
    halo = n_blocks  # rows of halo each side
    ins = refs[: 2 * halo + 1]  # [top rows..., center, bot rows...]
    wrefs = refs[2 * halo + 1 : -1]
    out_ref = refs[-1]
    ty = pl.program_id(1)
    W = out_ref.shape[2]
    H = pl.num_programs(1) * tile_h
    xs = jnp.concatenate([r[0] for r in ins[:halo]] + [ins[halo][0]]
                         + [r[0] for r in ins[halo + 1 :]], axis=0)
    ws = xs.shape[1]

    def mask(a, row0):
        # zero positions outside the image; a rows start at image row
        # ty*tile_h + row0, cols at image col -halo.
        grow = ty * tile_h + row0 + jax.lax.broadcasted_iota(
            jnp.int32, a.shape, 0
        )
        gcol = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1) - halo
        ok = (grow >= 0) & (grow < H) & (gcol >= 0) & (gcol < W)
        return jnp.where(ok, a, 0.0)

    g = xs  # block input, rows n_k starting at image row ty*tile_h - (halo-k)
    wi = 0
    for k in range(n_blocks):
        w1, b1, w2, b2, w3, b3, wd, bd = wrefs[wi : wi + 8]
        wi += 8
        n_k = g.shape[0]
        cin = g.shape[-1]
        cmid = w1.shape[-1]
        cout = w3.shape[-1]
        has_ds = wd.shape[-1] == cout
        h1 = jax.lax.dot_general(
            g.reshape(-1, cin), w1[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1[:]
        h1 = mask(
            jnp.maximum(h1, 0.0).reshape(n_k, ws, cmid), -(halo - k)
        ).astype(g.dtype)
        pats = jnp.concatenate(
            [
                h1[dy : dy + n_k - 2, dx : dx + ws - 2].reshape(-1, cmid)
                for dy in range(3)
                for dx in range(3)
            ],
            axis=-1,
        )
        h2 = jnp.maximum(
            jax.lax.dot_general(
                pats, w2[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + b2[:],
            0.0,
        ).astype(g.dtype)
        h3 = jax.lax.dot_general(
            h2, w3[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b3[:]
        # residual: center rows/cols of g matching the conv output support
        gc = g[1 : n_k - 1, 1 : ws - 1].reshape(-1, cin)
        if has_ds:
            res = jax.lax.dot_general(
                gc, wd[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bd[:]
        else:
            res = gc.astype(jnp.float32)
        o = jnp.maximum(h3 + res, 0.0).reshape(n_k - 2, ws - 2, cout)
        o = jnp.pad(o, ((0, 0), (1, 1), (0, 0)))
        g = mask(o, -(halo - k - 1)).astype(xs.dtype)

    out_ref[0] = g[:, halo : halo + W].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret"))
def fused_layer1(x, blocks, tile_h=8, interpret=False):
    """blocks: list of dicts w1,b1,w2(3,3,c,c),b2,w3,b3[,wd,bd]."""
    B, H, W, cin0 = x.shape
    assert H % tile_h == 0
    n_blocks = len(blocks)
    halo = n_blocks
    cout = blocks[-1]["w3"].shape[-1]
    wpad = (-(W + 2 * halo)) % 8
    ws = W + 2 * halo + wpad
    xp = jnp.pad(x, ((0, 0), (0, 0), (halo, halo + wpad), (0, 0)))

    dtype = x.dtype
    wargs = []
    for bk in blocks:
        cmid = bk["w1"].shape[-1]
        wargs += [
            bk["w1"].astype(dtype),
            bk["b1"].astype(jnp.float32).reshape(1, -1),
            bk["w2"].reshape(9 * cmid, cmid).astype(dtype),
            bk["b2"].astype(jnp.float32).reshape(1, -1),
            bk["w3"].astype(dtype),
            bk["b3"].astype(jnp.float32).reshape(1, -1),
        ]
        if "wd" in bk:
            wargs += [
                bk["wd"].astype(dtype),
                bk["bd"].astype(jnp.float32).reshape(1, -1),
            ]
        else:
            wargs += [jnp.zeros((1, 1), dtype), jnp.zeros((1, 1), jnp.float32)]

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    n_tiles = H // tile_h
    row = lambda off: pl.BlockSpec(
        (1, 1, ws, cin0),
        lambda b, i, off=off: (
            b, jnp.clip(i * tile_h + off, 0, H - 1), 0, 0
        ),
        memory_space=pltpu.VMEM,
    )
    in_specs = (
        [row(-halo + j) for j in range(halo)]
        + [
            pl.BlockSpec(
                (1, tile_h, ws, cin0), lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        + [row(tile_h + j) for j in range(halo)]
        + [vmem() for _ in wargs]
    )
    return pl.pallas_call(
        functools.partial(_v3_kernel, tile_h=tile_h, n_blocks=n_blocks),
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, tile_h, W, cout), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, cout), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*([xp] * (2 * halo + 1)), *wargs)


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
        ms = timeit(lambda x0, *rest: fn(x0, *rest, **kw), *args)
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
    check("v2 tile=8 im2col=1", fused_v2,
          x0, w1a, b1, w2, b2, w3, b3, wd, bd, tile_h=8, im2col=True)

    for stage, (h, w, cin, cmid) in {
        "layer2": (112, 200, 512, 128),
        "layer3": (56, 100, 1024, 256),
    }.items():
        print(f"== {stage} inner block ({h}x{w} cin={cin} cmid={cmid}) ==")
        xs_ = r(B, h, w, cin)
        ws1, wb1 = r(cin, cmid), r(cmid)
        ws2, wb2 = r(3, 3, cmid, cmid), r(cmid)
        ws3, wb3 = r(cmid, cin), r(cin)
        ref = None
        check("xla", jx, xs_, ws1, wb1, ws2, wb2, ws3, wb3)
        check("v2 tile=8 im2col=1", fused_v2,
              xs_, ws1, wb1, ws2, wb2, ws3, wb3, tile_h=8, im2col=True)

    print("== full layer1 (3 chained blocks) ==")
    blocks = make_layer1_blocks(rng, dt)

    @jax.jit
    def xla_layer1(x, blocks):
        for bk in blocks:
            x = xla_bottleneck(
                x, bk["w1"], bk["b1"], bk["w2"], bk["b2"], bk["w3"],
                bk["b3"], bk.get("wd"), bk.get("bd"),
            )
        return x

    @functools.partial(jax.jit, static_argnames=("tile_h",))
    def v2_layer1(x, blocks, tile_h=8):
        for bk in blocks:
            x = fused_v2(
                x, bk["w1"], bk["b1"], bk["w2"], bk["b2"], bk["w3"],
                bk["b3"], bk.get("wd"), bk.get("bd"), tile_h=tile_h,
            )
        return x

    ref = None
    check("xla layer1", xla_layer1, x0, blocks)
    check("3x v2 tile=8", v2_layer1, x0, blocks)
    for tile in (8, 16):
        try:
            check(f"v3 chained tile={tile}", fused_layer1, x0, blocks,
                  tile_h=tile)
        except Exception as e:
            print(f"  v3 tile={tile} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
    print("DONE", flush=True)


def make_layer1_blocks(rng, dt):
    r = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.1, dt)
    blocks = []
    for k in range(3):
        cin = 64 if k == 0 else 256
        bk = dict(
            w1=r(cin, 64), b1=r(64), w2=r(3, 3, 64, 64), b2=r(64),
            w3=r(64, 256), b3=r(256),
        )
        if k == 0:
            bk.update(wd=r(cin, 256), bd=r(256))
        blocks.append(bk)
    return blocks


def check_interpret():
    """Tiny-shape numerics check on CPU (interpret mode)."""
    jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(1)
    blocks = make_layer1_blocks(rng, jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 64)).astype(np.float32))

    def ref(x):
        for bk in blocks:
            x = xla_bottleneck(
                x, bk["w1"], bk["b1"], bk["w2"], bk["b2"], bk["w3"],
                bk["b3"], bk.get("wd"), bk.get("bd"),
            )
        return x

    r = np.asarray(ref(x))
    for tile in (8, 4):
        o = np.asarray(fused_layer1(x, blocks, tile_h=tile, interpret=True))
        err = np.abs(o - r).max()
        print(f"v3 interpret tile={tile}: maxerr={err:.2e}")
        assert err < 2e-4, err
    print("interpret check OK")


if __name__ == "__main__":
    import sys

    if "--check" in sys.argv:
        check_interpret()
    else:
        main()
