"""Numerical parity of the attention primitives against a torch oracle.

Replays the custom ConditionalDETR MultiheadAttention semantics (caller-side
projections, per-head concat(content, sine) q/k with 2D total width scaled by
(2D/H)^-0.5, D-wide values, out_proj) in plain torch with OUR weights, and
checks the flax modules produce the same outputs. Catches head-split ordering,
scaling, and projection-wiring mistakes that shape tests cannot see.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from future_od_tpu.models.layers import SelfAttention, SlotToImageAttention

D, H = 32, 4
B, Nq, Nk = 2, 5, 7


def t(x):
    return torch.from_numpy(np.asarray(x))


def torch_linear(x, params):
    w = t(params["kernel"])  # flax (in, out)
    out = x @ w
    if "bias" in params:
        out = out + t(params["bias"])
    return out


def torch_mha(q, k, v, num_heads, out_proj):
    """torch F.multi_head_attention_forward core with pre-projected q/k/v:
    per-head split, scale by (E/H)^-0.5 with E = q.shape[-1]."""
    E = q.shape[-1]
    Ev = v.shape[-1]
    hd, hdv = E // num_heads, Ev // num_heads
    qh = q.reshape(B, -1, num_heads, hd).transpose(1, 2)
    kh = k.reshape(B, -1, num_heads, hd).transpose(1, 2)
    vh = v.reshape(B, -1, num_heads, hdv).transpose(1, 2)
    logits = qh @ kh.transpose(-1, -2) * (hd**-0.5)
    weights = torch.softmax(logits, dim=-1)
    out = (weights @ vh).transpose(1, 2).reshape(B, -1, Ev)
    return torch_linear(out, out_proj)


class TestSlotToImageOracle:
    def test_matches_torch(self, rng):
        m = SlotToImageAttention(D, H, dropout=0.0, use_query_pos=True)
        qc = jnp.asarray(rng.normal(size=(B, Nq, D)).astype(np.float32))
        qp = jnp.asarray(rng.normal(size=(B, Nq, D)).astype(np.float32))
        qs = jnp.asarray(rng.normal(size=(B, Nq, D)).astype(np.float32))
        kc = jnp.asarray(rng.normal(size=(B, Nk, D)).astype(np.float32))
        ks = jnp.asarray(rng.normal(size=(B, Nk, D)).astype(np.float32))
        variables = m.init(jax.random.key(0), qc, qp, qs, kc, True, ks)
        out = np.asarray(m.apply(variables, qc, qp, qs, kc, True, ks))

        p = variables["params"]
        q_content = torch_linear(t(qc), p["query_content"]) + torch_linear(
            t(qp), p["query_pos"]
        )
        q_sine = torch_linear(t(qs), p["query_sine"])
        k_sine = torch_linear(t(ks), p["key_pos"])
        k_content = torch_linear(t(kc), p["key_content"]) + k_sine
        v = torch_linear(t(kc), p["value"])
        hd = D // H
        # per-head concat: (B, N, H, 2hd) -> flat (B, N, 2D) in torch head order
        q2 = torch.cat(
            [
                q_content.reshape(B, Nq, H, hd),
                q_sine.reshape(B, Nq, H, hd),
            ],
            dim=3,
        ).reshape(B, Nq, 2 * D)
        k2 = torch.cat(
            [
                k_content.reshape(B, Nk, H, hd),
                k_sine.reshape(B, Nk, H, hd),
            ],
            dim=3,
        ).reshape(B, Nk, 2 * D)
        want = torch_mha(q2, k2, v, H, p["out_proj"]).numpy()
        np.testing.assert_allclose(out, want, atol=1e-5)

    def test_is_first_false_drops_pos_paths(self, rng):
        # is_first=False: no query_pos into content, no sine added to key content
        m = SlotToImageAttention(D, H, dropout=0.0, use_query_pos=False)
        qc = jnp.asarray(rng.normal(size=(B, Nq, D)).astype(np.float32))
        qs = jnp.asarray(rng.normal(size=(B, Nq, D)).astype(np.float32))
        kc = jnp.asarray(rng.normal(size=(B, Nk, D)).astype(np.float32))
        ks = jnp.asarray(rng.normal(size=(B, Nk, D)).astype(np.float32))
        variables = m.init(jax.random.key(0), qc, None, qs, kc, False, ks)
        out = np.asarray(m.apply(variables, qc, None, qs, kc, False, ks))
        p = variables["params"]
        assert "query_pos" not in p
        q_content = torch_linear(t(qc), p["query_content"])
        q_sine = torch_linear(t(qs), p["query_sine"])
        k_sine = torch_linear(t(ks), p["key_pos"])
        k_content = torch_linear(t(kc), p["key_content"])  # no +k_sine
        v = torch_linear(t(kc), p["value"])
        hd = D // H
        q2 = torch.cat(
            [q_content.reshape(B, Nq, H, hd), q_sine.reshape(B, Nq, H, hd)], dim=3
        ).reshape(B, Nq, 2 * D)
        k2 = torch.cat(
            [k_content.reshape(B, Nk, H, hd), k_sine.reshape(B, Nk, H, hd)], dim=3
        ).reshape(B, Nk, 2 * D)
        want = torch_mha(q2, k2, v, H, p["out_proj"]).numpy()
        np.testing.assert_allclose(out, want, atol=1e-5)


class TestSelfAttentionOracle:
    def test_matches_torch(self, rng):
        m = SelfAttention(D, H, dropout=0.0)
        q_in = jnp.asarray(rng.normal(size=(B, Nq, D)).astype(np.float32))
        k_in = jnp.asarray(rng.normal(size=(B, Nk, D)).astype(np.float32))
        v_in = jnp.asarray(rng.normal(size=(B, Nk, D)).astype(np.float32))
        variables = m.init(jax.random.key(0), q_in, k_in, v_in)
        out = np.asarray(m.apply(variables, q_in, k_in, v_in))
        p = variables["params"]
        q = torch_linear(t(q_in), p["q_proj"])
        k = torch_linear(t(k_in), p["k_proj"])
        v = torch_linear(t(v_in), p["v_proj"])
        want = torch_mha(q, k, v, H, p["out_proj"]).numpy()
        np.testing.assert_allclose(out, want, atol=1e-5)


class TestSlotToSlotOracle:
    def test_matches_torch(self, rng):
        from future_od_tpu.models.layers import SlotToSlotAttention

        m = SlotToSlotAttention(D, H, dropout=0.0)
        qc = jnp.asarray(rng.normal(size=(B, Nq, D)).astype(np.float32))
        qp = jnp.asarray(rng.normal(size=(B, Nq, D)).astype(np.float32))
        kc = jnp.asarray(rng.normal(size=(B, Nk, D)).astype(np.float32))
        kp = jnp.asarray(rng.normal(size=(B, Nk, D)).astype(np.float32))
        variables = m.init(jax.random.key(0), qc, qp, kc, kp)
        out = np.asarray(m.apply(variables, qc, qp, kc, kp))
        p = variables["params"]
        q = torch_linear(t(qc), p["query_content"]) + torch_linear(t(qp), p["query_pos"])
        k = torch_linear(t(kc), p["key_content"]) + torch_linear(t(kp), p["key_pos"])
        v = torch_linear(t(kc), p["value"])
        want = torch_mha(q, k, v, H, p["out_proj"]).numpy()
        np.testing.assert_allclose(out, want, atol=1e-5)


class TestEgodeepOracle:
    def test_matches_torch_single_key(self, rng):
        from future_od_tpu.models.layers import EgodeepAttention

        m = EgodeepAttention(D, H, dropout=0.0, ff_dim=None)
        qc = jnp.asarray(rng.normal(size=(B, Nq, D)).astype(np.float32))
        qp = jnp.asarray(rng.normal(size=(B, Nq, D)).astype(np.float32))
        key = jnp.asarray(rng.normal(size=(B, 1, D)).astype(np.float32))
        variables = m.init(jax.random.key(0), qc, qp, key)
        out = np.asarray(m.apply(variables, qc, qp, key))
        p = variables["params"]
        q = torch_linear(t(qc), p["query_content"]) + torch_linear(t(qp), p["query_pos"])
        k = torch_linear(t(key), p["key"])
        v = torch_linear(t(key), p["value"])
        want = torch_mha(q, k, v, H, p["out_proj"]).numpy()
        np.testing.assert_allclose(out, want, atol=1e-5)
