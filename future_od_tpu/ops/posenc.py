"""Sine positional encodings (spatial, temporal, and query reference-point).

Reproduces the math of the reference's `PositionalEncoder`
(`/root/reference/future_od/models/paper.py:32-80`) and
`gen_sineembed_for_position` (`transformer.py:35-48`), but computed directly
from index grids (the reference cumsums an all-ones mask — identical values)
and laid out channels-last, the TPU-native layout.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

TWO_PI = 2.0 * math.pi


def _sine_encode(embedding: jnp.ndarray, num_features: int, temperature: float) -> jnp.ndarray:
    """Interleaved sin/cos encoding of `embedding` (...,) -> (..., num_features).

    Matches paper.py:75-80: dim_t = T^(2*(i//2)/F); even slots sin, odd slots cos
    of the same frequency pair.
    """
    dim_t = jnp.arange(num_features, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_features)
    pos = embedding[..., None] / dim_t  # (..., F)
    sin = jnp.sin(pos[..., 0::2])
    cos = jnp.cos(pos[..., 1::2])
    return jnp.stack([sin, cos], axis=-1).reshape(*pos.shape[:-1], -1)


def spatial_encoding(
    h: int, w: int, channels: int, temperature: float = 10000.0
) -> jnp.ndarray:
    """2D sine positional encoding -> (h, w, channels), y-half then x-half.

    y/x coordinates are the normalized cumulative positions of paper.py:57-64:
    row i gets (i+1)/(h + 1e-6) * 2π (the reference divides by the last cumsum
    value + eps).
    """
    assert channels % 2 == 0
    y = (jnp.arange(1, h + 1, dtype=jnp.float32) / (h + 1e-6)) * TWO_PI
    x = (jnp.arange(1, w + 1, dtype=jnp.float32) / (w + 1e-6)) * TWO_PI
    y_enc = _sine_encode(y, channels // 2, temperature)  # (h, C/2)
    x_enc = _sine_encode(x, channels // 2, temperature)  # (w, C/2)
    y_enc = jnp.broadcast_to(y_enc[:, None, :], (h, w, channels // 2))
    x_enc = jnp.broadcast_to(x_enc[None, :, :], (h, w, channels // 2))
    return jnp.concatenate([y_enc, x_enc], axis=-1)


def temporal_encoding(
    num_frames: int,
    channels: int,
    temporal_offsets: jnp.ndarray | None = None,
    temperature: float = 10000.0,
    extra_temporal_offset: float = 0.0,
) -> jnp.ndarray:
    """Temporal sine term, (B, L, channels) if offsets given else (L, channels).

    With real offsets (seconds, (B, L)): t = (offset + extra) / (last_offset
    + extra + 1e-6) * 2π per paper.py:66-73. Without offsets: frame index
    1..L normalized by L.
    """
    if temporal_offsets is not None:
        t = temporal_offsets + extra_temporal_offset  # (B, L)
        t = t / (t[:, -1:] + 1e-6) * TWO_PI
    else:
        t = (jnp.arange(1, num_frames + 1, dtype=jnp.float32) / (num_frames + 1e-6)) * TWO_PI
    return _sine_encode(t, channels, temperature)


def spatio_temporal_encoding(
    num_frames: int,
    h: int,
    w: int,
    channels: int,
    temporal_offsets: jnp.ndarray | None = None,
    no_temporal: bool = False,
    temperature: float = 10000.0,
    extra_temporal_offset: float = 0.0,
) -> jnp.ndarray:
    """Spatial (+ optional temporal) encoding for a clip.

    Returns (L, h, w, C) when temporal_offsets is None (shared across batch),
    else (B, L, h, w, C). Equivalent to paper.py:50-55.
    """
    spatial = spatial_encoding(h, w, channels, temperature)  # (h, w, C)
    spatial = jnp.broadcast_to(spatial[None], (num_frames, h, w, channels))
    if no_temporal:
        return spatial
    temporal = temporal_encoding(
        num_frames, channels, temporal_offsets, temperature, extra_temporal_offset
    )
    if temporal_offsets is not None:
        # (B, L, C) -> (B, L, 1, 1, C)
        return spatial[None] + temporal[:, :, None, None, :]
    return spatial + temporal[:, None, None, :]


def gen_sineembed_for_position(pos: jnp.ndarray, dim: int = 256) -> jnp.ndarray:
    """Sine embedding of 2D reference points in [0, 1].

    pos: (..., 2) with (x, y); returns (..., dim) as concat(embed_y, embed_x),
    each dim/2 wide — matching transformer.py:35-48.
    """
    half = dim // 2
    dim_t = jnp.arange(half, dtype=jnp.float32)
    dim_t = 10000.0 ** (2.0 * jnp.floor(dim_t / 2.0) / half)

    def interleave(v):
        p = (v * TWO_PI)[..., None] / dim_t
        return jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], axis=-1).reshape(
            *p.shape[:-1], -1
        )

    return jnp.concatenate([interleave(pos[..., 1]), interleave(pos[..., 0])], axis=-1)
