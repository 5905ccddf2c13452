"""Generic building blocks (reference: future_od/models/shared_modules.py).

Not referenced by any current run config in the reference either (SURVEY.md
§2.1 #20) — kept for API completeness: stateful sequencing, batch-first
self/cross attention with per-head projections, GEGLU feed-forward, residual
wrappers.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from future_od_tpu.models.layers import TorchLinear


class SequentialWithState(nn.Module):
    """Chain of layers threading optional per-layer state; layers declare
    `stateful = True` to receive/return state (shared_modules.py:6-19)."""

    layers: Sequence[nn.Module]

    def __call__(self, x, state: Optional[List[Any]] = None):
        if state is None:
            state = [None for _ in self.layers]
        state = list(state)
        for idx, layer in enumerate(self.layers):
            if getattr(layer, "stateful", False):
                x, state[idx] = layer(x, state[idx])
            else:
                x = layer(x)
        return x, state


class NoneModule(nn.Module):
    def __call__(self, *args, **kwargs):
        return None


class ValueFromDict(nn.Module):
    key: str

    def __call__(self, x):
        return x[self.key]


class Attention(nn.Module):
    """Batch-first MHA with decoupled head width (shared_modules.py:36-78):
    q from (B, M, Dq), packed kv from (B, N, Dc), scaled by Dhead^-0.5."""

    num_heads: int
    head_dim: int

    @nn.compact
    def compute(self, left, right, mask: Optional[jnp.ndarray] = None):
        B, M, _ = left.shape
        N = right.shape[1]
        D = self.num_heads * self.head_dim
        q = TorchLinear(D, use_bias=False, name="to_q")(left)
        kv = TorchLinear(2 * D, use_bias=False, name="to_kv")(right)
        k, v = jnp.split(kv, 2, axis=-1)
        qh = q.reshape(B, M, self.num_heads, self.head_dim)
        kh = k.reshape(B, N, self.num_heads, self.head_dim)
        vh = v.reshape(B, N, self.num_heads, self.head_dim)
        logits = jnp.einsum("bmhd,bnhd->bhmn", qh, kh) * (self.head_dim**-0.5)
        if mask is not None:
            logits = jnp.where(mask[:, None], logits, -1e30)
        weights = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhmn,bnhd->bmhd", weights, vh).reshape(B, M, D)
        return TorchLinear(left.shape[-1], name="to_out")(out)

    def __call__(self, left, right=None, mask=None):
        right = left if right is None else right
        return self.compute(left, right, mask)


class GEGLU(nn.Module):
    """Gated-GELU feed-forward (shared_modules.py GEGLU block)."""

    hidden_dim: int

    @nn.compact
    def __call__(self, x):
        proj = TorchLinear(2 * self.hidden_dim, name="proj")(x)
        a, gate = jnp.split(proj, 2, axis=-1)
        out = a * jax.nn.gelu(gate)
        return TorchLinear(x.shape[-1], name="out")(out)


class Residual(nn.Module):
    inner: nn.Module

    def __call__(self, x, *args, **kwargs):
        return x + self.inner(x, *args, **kwargs)
