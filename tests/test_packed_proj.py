"""Packed-projection path (FUTURE_OD_PACKED_PROJ) is exact.

Concatenating the kernels of Dense projections that share an input and doing
ONE matmul computes each output element from the same dot product as the
separate matmuls, so packed and unpacked must agree to float tolerance (and
params/checkpoints are layout-identical by construction).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from future_od_tpu.models.layers import (
    EgodeepAttention,
    SelfAttention,
    SlotToImageAttention,
    SlotToSlotAttention,
)


def _with_packed(value: str):
    prev = os.environ.get("FUTURE_OD_PACKED_PROJ")
    os.environ["FUTURE_OD_PACKED_PROJ"] = value
    return prev


def _restore(prev):
    if prev is None:
        os.environ.pop("FUTURE_OD_PACKED_PROJ", None)
    else:
        os.environ["FUTURE_OD_PACKED_PROJ"] = prev


def _run_both(module_fn, init_args, apply_args):
    """init+apply with packing off, then apply the SAME params with it on."""
    prev = _with_packed("0")
    try:
        mod = module_fn()
        variables = mod.init(jax.random.key(0), *init_args)
        base = mod.apply(variables, *apply_args)
        _with_packed("1")
        packed_vars = mod.init(jax.random.key(0), *init_args)
        packed = mod.apply(variables, *apply_args)
    finally:
        _restore(prev)
    # identical param trees (names, shapes, init values)
    chex_equal = jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        variables, packed_vars,
    )
    del chex_equal
    return np.asarray(base), np.asarray(packed)


D, H, B, M, N = 64, 4, 2, 8, 20


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_slot_to_slot_packed_exact(rng):
    x = jnp.asarray(rng.normal(size=(B, M, D)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(B, M, D)).astype(np.float32))
    base, packed = _run_both(
        lambda: SlotToSlotAttention(D, H, dropout=0.0),
        (x, pos, x, pos),
        (x, pos, x, pos),
    )
    np.testing.assert_allclose(base, packed, rtol=0, atol=1e-5)


def test_slot_to_slot_cross_inputs_keep_unpacked_path(rng):
    """Different key tensors (slotstates attn) must not take the packed arm."""
    x = jnp.asarray(rng.normal(size=(B, M, D)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(B, M, D)).astype(np.float32))
    kc = jnp.asarray(rng.normal(size=(B, M, D)).astype(np.float32))
    base, packed = _run_both(
        lambda: SlotToSlotAttention(D, H, dropout=0.0),
        (x, pos, kc, pos),
        (x, pos, kc, pos),
    )
    np.testing.assert_allclose(base, packed, rtol=0, atol=1e-5)


def test_slot_to_image_packed_exact(rng):
    q = jnp.asarray(rng.normal(size=(B, M, D)).astype(np.float32))
    qs = jnp.asarray(rng.normal(size=(B, M, D)).astype(np.float32))
    kc = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    ks = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    args = (q, q, qs, kc, True, ks)
    base, packed = _run_both(
        lambda: SlotToImageAttention(D, H, dropout=0.0), args, args
    )
    np.testing.assert_allclose(base, packed, rtol=0, atol=1e-5)


def test_egodeep_packed_exact(rng):
    q = jnp.asarray(rng.normal(size=(B, M, D)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(B, M, D)).astype(np.float32))
    key = jnp.asarray(rng.normal(size=(B, 1, D)).astype(np.float32))
    base, packed = _run_both(
        lambda: EgodeepAttention(D, H, dropout=0.0), (q, pos, key), (q, pos, key)
    )
    np.testing.assert_allclose(base, packed, rtol=0, atol=1e-5)


def test_self_attention_packed_exact(rng):
    src = jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    qk = src + jnp.asarray(rng.normal(size=(B, N, D)).astype(np.float32))
    base, packed = _run_both(
        lambda: SelfAttention(D, H, dropout=0.0), (qk, qk, src), (qk, qk, src)
    )
    np.testing.assert_allclose(base, packed, rtol=0, atol=1e-5)


def test_full_model_packed_exact(rng):
    """Flagship forward agrees packed-vs-unpacked on identical params."""
    from future_od_tpu.models.build import build_flagship
    from future_od_tpu.models.st_detr import SpatioTemporalDETRArgs

    args = SpatioTemporalDETRArgs(
        num_classes=2, num_queries=8, hidden_dim=64, enc_layers=1,
        dec_layers=2, dim_feedforward=64, enc_nheads=4, nheads=4,
    )
    model = build_flagship(args)
    data = {
        "video": jnp.asarray(rng.normal(size=(1, 3, 64, 96, 3)).astype(np.float32)),
        "annotated_frame_idx": jnp.asarray([2]),
    }
    for key, d in [
        ("translation", 3), ("acceleration", 3), ("rotation", 4),
        ("rotation_rate", 3), ("speed", 1),
    ]:
        data[key] = jnp.asarray(rng.normal(size=(1, 3, d)).astype(np.float32))

    prev = _with_packed("0")
    try:
        variables = model.init({"params": jax.random.key(0)}, data, deterministic=True)
        base = model.apply(variables, data, deterministic=True)
        _with_packed("1")
        packed = model.apply(variables, data, deterministic=True)
    finally:
        _restore(prev)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=2e-4
        ),
        base, packed,
    )
