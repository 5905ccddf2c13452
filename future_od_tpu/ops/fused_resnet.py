"""Fused ResNet blocks as Pallas TPU kernels.

The backbone dominates inference (BENCHMARKS.md: 81 of ~109 ms per eval
batch), and its early stages are bandwidth-bound: XLA runs each bottleneck as
3 conv round-trips through HBM plus the residual read. These kernels keep the
whole block in VMEM:

- `fused_bottleneck`: 1x1 -> 3x3 -> 1x1 (+ optional 1x1 downsample residual)
  with BN folded into weights/biases and ReLUs fused. The input is read once
  (plus a 2-row halo stream); no intermediate tensor touches HBM.
- `fused_stem`: the 7x7/2 conv + BN + ReLU + 3x3/2 maxpool, expressed over
  2x2 space-to-depth input as a 4x4/1 conv (im2col in kernel -> one K=192
  MXU matmul) with the pool fused — the 3-channel conv is the single most
  MXU-hostile op in the network.

Stride-1 / dilation-1 blocks only (that is layer1, the bandwidth-bound one).
Used on the inference path (the backbone's early stages are frozen during
training, reference paper.py:102-109).

Halos: row tiles overlap their neighbours, which blocked BlockSpecs cannot
express directly. The same input array is passed three times with different
index maps — a clamped one-row block above the tile, the disjoint center
block, and a clamped one-row block below — and the kernel concatenates them.
Clamped rows at the image boundary carry garbage that the in-kernel support
mask zeroes before the 3x3 reads it. Column halos ride in the width padding.

Measured on TPU v5 lite (tools/bench_fused_bottleneck.py, b12 224x400 bf16):
layer1 inner block 6.6 ms vs 7.9 XLA; block0 6.5 vs 9.4; full layer1 chain
14.8 vs 20.1 ms. The 3x3 runs as a single im2col matmul (K = 9*cmid): nine
separate 64x64 matmuls were ~1.5x slower, and chaining all three blocks
into one kernel SIGKILLs this toolchain's remote Mosaic compiler.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bottleneck_kernel(
    top, center, bot, w1, b1, w2, b2, w3, b3, wd, bd, out_ref, *, tile_h, has_ds
):
    """One (batch, row-tile) program of the fused bottleneck.

    top/bot: (1, 1, Ws, Cin) clamped halo rows; center: (1, tile_h, Ws, Cin);
    out_ref: (1, tile_h, W, Cout); Ws = W+2 rounded up to 8.
    w2: (9*Cmid, Cmid) im2col-flattened 3x3 taps in (dy, dx) order.
    """
    ty = pl.program_id(1)
    W = out_ref.shape[2]
    xs = jnp.concatenate([top[0], center[0], bot[0]], axis=0)
    cin = xs.shape[-1]
    ws = xs.shape[1]
    cmid = w1.shape[-1]
    cout = w3.shape[-1]

    # 1x1 conv + ReLU over the full slab (halo included: the 3x3 needs it).
    h1 = jax.lax.dot_general(
        xs.reshape(-1, cin), w1[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1[:]
    h1 = jnp.maximum(h1, 0.0).reshape(tile_h + 2, ws, cmid)
    # Halo positions OUTSIDE the image must be the 3x3 conv's zero padding,
    # not relu(b1) of clamped/zero-padded input.
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

    # 3x3 conv: im2col in VMEM -> one (tile_h*W, 9*cmid) MXU matmul.
    pats = jnp.concatenate(
        [
            h1[dy : dy + tile_h, dx : dx + W].reshape(tile_h * W, cmid)
            for dy in range(3)
            for dx in range(3)
        ],
        axis=-1,
    )
    acc = jax.lax.dot_general(
        pats, w2[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2[:]
    h2 = jnp.maximum(acc, 0.0).astype(xs.dtype)

    # 1x1 expansion + residual + ReLU.
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


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret"))
def fused_bottleneck(
    x: jnp.ndarray,  # (B, H, W, Cin)
    w1: jnp.ndarray,  # (Cin, Cmid)  BN-folded
    b1: jnp.ndarray,  # (Cmid,)
    w2: jnp.ndarray,  # (3, 3, Cmid, Cmid)
    b2: jnp.ndarray,
    w3: jnp.ndarray,  # (Cmid, Cout)
    b3: jnp.ndarray,
    wd: Optional[jnp.ndarray] = None,  # (Cin, Cout) downsample, or None
    bd: Optional[jnp.ndarray] = None,
    tile_h: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """relu(conv1x1(relu(conv3x3(relu(conv1x1(x))))) + residual), stride 1.

    Weights carry folded frozen-BN scales; biases the folded shifts. H must be
    divisible by tile_h (the caller gates on this).
    """
    B, H, W, cin = x.shape
    assert H % tile_h == 0, (H, tile_h)
    cmid = w1.shape[-1]
    cout = w3.shape[-1]
    has_ds = wd is not None
    wpad = (-(W + 2)) % 8  # 8-align the slab's sublane (width) dim
    ws = W + 2 + wpad
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1 + wpad), (0, 0)))  # width pad only

    dtype = x.dtype
    args = [
        xp, xp, xp,
        w1.astype(dtype), b1.astype(jnp.float32).reshape(1, -1),
        w2.reshape(9 * cmid, cmid).astype(dtype),
        b2.astype(jnp.float32).reshape(1, -1),
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
        functools.partial(_bottleneck_kernel, tile_h=tile_h, has_ds=has_ds),
        grid=(B, n_tiles),
        in_specs=[
            # clamped halo rows: boundary garbage is masked in-kernel
            row_spec(lambda b, i: (b, jnp.maximum(i * tile_h - 1, 0), 0, 0)),
            pl.BlockSpec(
                (1, tile_h, ws, cin), lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            row_spec(
                lambda b, i: (b, jnp.minimum((i + 1) * tile_h, H - 1), 0, 0)
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
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# Fused stem: 4x4/1 conv over space-to-depth(2) input + BN + ReLU + maxpool
# ---------------------------------------------------------------------------


def _stem_kernel(main, halo, w, b, out_ref, *, tile_p):
    """One (batch, pool-row-tile) program.

    Geometry (rows; columns identical): s2d input is pre-padded with
    (top 3, bottom 1) zero rows, so conv row c in [-1, Hc) reads padded rows
    c+1..c+4. A tile of tile_p pool rows starting at p0 needs conv rows
    2p0-1..2p0+2·tile_p-1 (n_conv = 2·tile_p+1 of them) -> padded rows
    2p0..2p0+n_conv+2. The first 2·tile_p of those are this tile's disjoint
    `main` block; the last 4 come from the strided `halo` tensor. Conv row -1
    / col -1 exist only as maxpool PADDING: computed then masked to -inf
    before pooling (maxpool padding excludes, it does not contribute zeros).

    main: (1, 2·tile_p, Ws, 12); halo: (1, 1, 4, Ws, 12);
    out_ref: (1, tile_p, Wp, 64); w: (192, 64) im2col (dy, dx, c) taps.
    """
    tp = pl.program_id(1)
    Wp = out_ref.shape[2]
    Wc = 2 * Wp
    n_conv = 2 * tile_p + 1
    xs = jnp.concatenate([main[0], halo[0, 0]], axis=0)  # (n_conv+3, Ws, 12)

    # im2col: 16 shifted views over (n_conv, Wc+1) conv positions (local col 0
    # = conv col -1) -> one (M, 192) x (192, 64) MXU matmul.
    cols = [
        xs[dy : dy + n_conv, dx : dx + Wc + 1, :].reshape(n_conv * (Wc + 1), 12)
        for dy in range(4)
        for dx in range(4)
    ]
    patches = jnp.concatenate(cols, axis=-1)  # (M, 192)
    conv = jax.lax.dot_general(
        patches, w[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b[:]
    conv = jnp.maximum(conv, 0.0).reshape(n_conv, Wc + 1, -1)

    # Mask the pool padding: local col 0 (conv col -1) always; local row 0
    # (conv row -1) in the first tile only.
    neg = jnp.float32(-1e30)
    col_pad = jax.lax.broadcasted_iota(jnp.int32, conv.shape, 1) == 0
    row_pad = (
        jax.lax.broadcasted_iota(jnp.int32, conv.shape, 0) == 0
    ) & (tp == 0)
    conv = jnp.where(col_pad | row_pad, neg, conv)

    # maxpool 3x3/2: pool col q takes local cols 2q, 2q+1, 2q+2.
    body = conv[:, : 2 * Wp].reshape(n_conv, Wp, 2, conv.shape[-1])
    c0, c1 = body[:, :, 0], body[:, :, 1]
    c2 = jnp.concatenate([c0[:, 1:], conv[:, 2 * Wp : 2 * Wp + 1]], axis=1)
    colmax = jnp.maximum(jnp.maximum(c0, c1), c2)  # (n_conv, Wp, 64)
    # pool row p takes local rows 2p, 2p+1, 2p+2.
    rows = colmax[: 2 * tile_p].reshape(tile_p, 2, Wp, colmax.shape[-1])
    r0, r1 = rows[:, 0], rows[:, 1]
    r2 = jnp.concatenate(
        [r0[1:], colmax[2 * tile_p : 2 * tile_p + 1]], axis=0
    )
    out = jnp.maximum(jnp.maximum(r0, r1), r2)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_p", "interpret"))
def fused_stem(
    x_s2d: jnp.ndarray,  # (B, Hc, Wc, 12) space-to-depth(2) input
    w4: jnp.ndarray,  # (4, 4, 12, 64) s2d stem kernel (BN-folded)
    bias: jnp.ndarray,  # (64,)
    tile_p: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """relu(bn(conv4x4/1 pad(2,1)(x_s2d))) -> maxpool3x3/2 pad 1.

    Equivalent to the reference 7x7/2 stem on the un-s2d image (see
    models/resnet.py:stem_weights_to_space_to_depth). Returns
    (B, Hc/2, Wc/2, 64).
    """
    B, Hc, Wc, C = x_s2d.shape
    assert C == 12
    Hp, Wp = Hc // 2, Wc // 2
    assert Hp % tile_p == 0, (Hp, tile_p)
    # (3, 1) padding: conv pad (2, 1) plus one extra leading row/col so the
    # pool-padding position (conv row/col -1) has an addressable input window.
    # Extra right padding 8-aligns the slab's sublane (width) dim.
    wpad = (-(Wc + 4)) % 8
    xp = jnp.pad(x_s2d, ((0, 0), (3, 1), (3, 1 + wpad), (0, 0)))
    w = w4.reshape(16 * 12, 64)  # im2col order matches the kernel's loops

    n_tiles = Hp // tile_p
    step = 2 * tile_p
    main = xp[:, : step * n_tiles]  # (B, Hc, Ws, 12) disjoint tile rows
    halo = jnp.stack(
        [xp[:, step + k : step * (n_tiles - 1) + step + k + 1 : step] for k in range(4)],
        axis=2,
    )  # (B, n_tiles, 4, Ws, 12)
    ws = xp.shape[2]

    return pl.pallas_call(
        functools.partial(_stem_kernel, tile_p=tile_p),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, step, ws, 12), lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 4, ws, 12), lambda b, i: (b, i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_p, Wp, 64), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp, 64), x_s2d.dtype),
        interpret=interpret,
    )(main, halo, w.astype(x_s2d.dtype), bias.astype(jnp.float32).reshape(1, -1))
