"""Assembled-stack numerical parity against a torch re-implementation.

Extends the per-module oracles (test_attention_torch_oracle.py) to whole
assemblies: a full TransformerDecoderLayer, the 6-layer TransformerDecoder
(reference-point head, conditional sine scaling, first_layer_special, shared
final norm), an encoder layer with egodeep, and the complete recurrent
CDetrDetectorSpatioTemporal over two frames (the flagship's future-prediction
machinery). The torch side re-implements the reference semantics
(`/root/reference/future_od/models/transformer.py:184-512`, paper.py:280-429)
from scratch and runs OUR ported weights, so any wiring/order/scaling drift in
the flax stack shows up as a numeric mismatch.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from future_od_tpu.models.decoder import TransformerDecoder, TransformerDecoderLayer
from future_od_tpu.models.encoder import TransformerEncoderLayer

D, H = 32, 4
ATOL = 1e-4
# Multi-layer stacks accumulate f32 reassociation noise through repeated
# LayerNorms (~2e-4 max observed over 6 layers); wiring errors show as O(0.1+).
STACK_ATOL = 1e-3


def t(x):
    return torch.from_numpy(np.asarray(x))


def lin(x, p):
    out = x @ t(p["kernel"])
    if "bias" in p:
        out = out + t(p["bias"])
    return out


def ln(x, p):
    return F.layer_norm(x, (x.shape[-1],), t(p["scale"]), t(p["bias"]))


def mlp(x, p, num_layers):
    for i in range(num_layers):
        x = lin(x, p[f"layer{i}"])
        if i < num_layers - 1:
            x = F.relu(x)
    return x


def ffn(x, p):
    return lin(F.relu(lin(x, p["fc1"])), p["fc2"])


def mha(q, k, v, num_heads, out_proj):
    """torch F.multi_head_attention_forward core on pre-projected q/k/v."""
    B, Nq, E = q.shape
    Nk, Ev = k.shape[1], v.shape[-1]
    hd, hdv = E // num_heads, Ev // num_heads
    qh = q.reshape(B, Nq, num_heads, hd).transpose(1, 2)
    kh = k.reshape(B, Nk, num_heads, hd).transpose(1, 2)
    vh = v.reshape(B, Nk, num_heads, hdv).transpose(1, 2)
    weights = torch.softmax(qh @ kh.transpose(-1, -2) * (hd**-0.5), dim=-1)
    out = (weights @ vh).transpose(1, 2).reshape(B, Nq, Ev)
    return lin(out, out_proj)


def slot2slot(p, qc, qp, kc, kp, num_heads):
    q = lin(qc, p["query_content"]) + lin(qp, p["query_pos"])
    k = lin(kc, p["key_content"]) + lin(kp, p["key_pos"])
    return mha(q, k, lin(kc, p["value"]), num_heads, p["out_proj"])


def slot2image(p, qc, qp, qs, kc, key_pos_flag, ks, num_heads):
    B, Nq, dim = qc.shape
    Nk = kc.shape[1]
    hd = dim // num_heads
    q_content = lin(qc, p["query_content"])
    if qp is not None and "query_pos" in p:
        q_content = q_content + lin(qp, p["query_pos"])
    q_sine = lin(qs, p["query_sine"])
    k_sine = lin(ks, p["key_pos"])
    k_content = lin(kc, p["key_content"])
    if key_pos_flag:
        k_content = k_content + k_sine
    q2 = torch.cat(
        [q_content.reshape(B, Nq, num_heads, hd), q_sine.reshape(B, Nq, num_heads, hd)],
        dim=3,
    ).reshape(B, Nq, 2 * dim)
    k2 = torch.cat(
        [k_content.reshape(B, Nk, num_heads, hd), k_sine.reshape(B, Nk, num_heads, hd)],
        dim=3,
    ).reshape(B, Nk, 2 * dim)
    return mha(q2, k2, lin(kc, p["value"]), num_heads, p["out_proj"])


def egodeep_attn(p, qc, qp, key, num_heads, with_post):
    q = lin(qc, p["query_content"]) + lin(qp, p["query_pos"])
    out = mha(q, lin(key, p["key"]), lin(key, p["value"]), num_heads, p["out_proj"])
    if with_post:
        # the reference's quirk: residual really is out + dropout(out)
        out = ln(out + out, p["norm1"])
        out = ln(out + ffn(out, p["mlp"]), p["norm2"])
    return out


def enc_attention(p, src, qb, kb, vb, num_heads):
    a = mha(
        lin(qb, p["attn"]["q_proj"]),
        lin(kb, p["attn"]["k_proj"]),
        lin(vb, p["attn"]["v_proj"]),
        num_heads,
        p["attn"]["out_proj"],
    )
    src = ln(src + a, p["norm1"])
    return ln(src + ffn(src, p["mlp"]), p["norm2"])


def sineembed(pos, dim):
    """Reference gen_sineembed_for_position (transformer.py:35-48)."""
    import math

    half = dim // 2
    dim_t = torch.arange(half, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / half)

    def interleave(v):
        p = (v * 2 * math.pi)[..., None] / dim_t
        return torch.stack((p[..., 0::2].sin(), p[..., 1::2].cos()), dim=-1).flatten(-2)

    return torch.cat([interleave(pos[..., 1]), interleave(pos[..., 0])], dim=-1)


def inverse_sigmoid(x, eps=1e-5):
    x = x.clamp(0.0, 1.0)
    return torch.log(x.clamp(min=eps) / (1 - x).clamp(min=eps))


def decoder_layer(p, x, query_pos, query_sine, images, img_pos, ego, is_first, num_heads):
    new = slot2slot(p["self_attend"], x, query_pos, x, query_pos, num_heads)
    x = ln(x + new, p["norm_sa"])
    for i, (img, ipos) in enumerate(zip(images, img_pos)):
        new = slot2image(
            p[f"image_attend{i}"], x, query_pos if is_first else None,
            query_sine, img, is_first, ipos, num_heads,
        )
        x = ln(x + new, p[f"norm_ia{i}"])
    if ego is not None and "egodeep_attend" in p:
        new = egodeep_attn(p["egodeep_attend"], x, query_pos, ego, num_heads, with_post=False)
        x = ln(x + new, p["norm_eda"])
    new = ffn(x, p["feedforward"])
    return ln(x + new, p["norm_out"])


def decoder_stack(p, num_layers, query_content, query_pos, images, img_pos, ego,
                  num_heads, dim, first_layer_special=True):
    ref = torch.sigmoid(mlp(query_pos, p["ref_point_head"], 2))
    unscaled = sineembed(ref, dim)
    x = query_content
    inter = []
    for lid in range(num_layers):
        if lid == 0 and first_layer_special:
            qs = unscaled
        else:
            qs = mlp(x, p["query_scale"], 2) * unscaled
        x = decoder_layer(
            p[f"layer{lid}"], x, query_pos, qs, images, img_pos, ego,
            is_first=(lid == 0) and first_layer_special, num_heads=num_heads,
        )
        inter.append(ln(x, p["norm"]))
    return torch.stack(inter), ref


class TestDecoderLayerOracle:
    @pytest.mark.parametrize("is_first", [True, False])
    def test_full_layer(self, rng, is_first):
        B, M, N = 2, 5, 9
        m = TransformerDecoderLayer(
            D, H, ff_dim=48, dropout=0.0, num_images=2, use_egodeep=True,
            image_attn_query_pos=is_first,
        )
        r = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
        qc, qp, qs = r(B, M, D), r(B, M, D), r(B, M, D)
        imgs = [r(B, N, D), r(B, N, D)]
        ipos = [r(B, N, D), r(B, N, D)]
        ego = r(B, 1, D)
        args = (qc, qp, qs, imgs, ipos, None, None, None)
        variables = m.init(jax.random.key(0), *args, is_first=is_first, egodeep=ego)
        out = np.asarray(m.apply(variables, *args, is_first=is_first, egodeep=ego))
        want = decoder_layer(
            variables["params"], t(qc), t(qp), t(qs), [t(x) for x in imgs],
            [t(x) for x in ipos], t(ego), is_first, H,
        ).numpy()
        np.testing.assert_allclose(out, want, atol=ATOL)


class TestDecoderStackOracle:
    @pytest.mark.parametrize("first_layer_special", [True, False])
    def test_six_layers(self, rng, first_layer_special):
        B, M, N = 2, 5, 9
        m = TransformerDecoder(
            num_layers=6, dim=D, num_heads=H, ff_dim=48, dropout=0.0,
            num_images=2, use_egodeep=True,
        )
        r = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
        qc = jnp.zeros((B, M, D), jnp.float32)
        qp = r(B, M, D)
        imgs = [r(B, N, D), r(B, N, D)]
        ipos = [r(B, N, D), r(B, N, D)]
        ego = r(B, 1, D)
        variables = m.init(
            jax.random.key(1), qc, qp, imgs, ipos,
            first_layer_special=first_layer_special, egodeep=ego,
        )
        hs, ref = m.apply(
            variables, qc, qp, imgs, ipos,
            first_layer_special=first_layer_special, egodeep=ego,
        )
        want_hs, want_ref = decoder_stack(
            variables["params"], 6, t(qc), t(qp), [t(x) for x in imgs],
            [t(x) for x in ipos], t(ego), H, D,
            first_layer_special=first_layer_special,
        )
        np.testing.assert_allclose(np.asarray(ref), want_ref.numpy(), atol=ATOL)
        np.testing.assert_allclose(np.asarray(hs), want_hs.numpy(), atol=STACK_ATOL)


class TestEncoderLayerOracle:
    def test_self_attn_plus_egodeep(self, rng):
        B, N = 2, 11
        m = TransformerEncoderLayer(D, H, ff_dim=48, dropout=0.0, use_egodeep=True)
        r = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
        feats, pos, ego = r(B, N, D), r(B, N, D), r(B, 1, D)
        variables = m.init(jax.random.key(2), feats, image_pos=pos, egodeep=ego)
        out = np.asarray(m.apply(variables, feats, image_pos=pos, egodeep=ego))
        p = variables["params"]
        x = enc_attention(
            p["self_attn"], t(feats), t(feats) + t(pos), t(feats) + t(pos), t(feats), H
        )
        new = egodeep_attn(p["egodeep_attend"], x, t(pos), t(ego), H, with_post=True)
        want = ln(x + new, p["norm_eda"]).numpy()
        np.testing.assert_allclose(out, want, atol=ATOL)


class TestDetectorOracle:
    def test_recurrent_two_frames(self, rng):
        # the flagship detector: "attend one at a time", num_images=2,
        # first_layer_special="always", over an L=2 clip (paper.py:331-429)
        from future_od_tpu.models.cores import CDetrDetectorSpatioTemporal

        B, L, h, w, M, layers = 2, 2, 3, 4, 5, 3
        m = CDetrDetectorSpatioTemporal(
            num_classes=4, hidden_dim=D, num_queries=M, dec_layers=layers,
            dec_heads=H, ff_dim=48, dropout=0.0, num_images=2,
            use_egodeep=True, first_layer_special_when="always",
        )
        r = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
        feats = r(B, L, h, w, D)
        pos = r(L, h, w, D)
        ego = r(B, L, D)
        variables = m.init(jax.random.key(3), feats, pos, ego)
        # the bbox head is zero-initialized (paper.py:312-313) which would hide
        # head-wiring bugs — randomize it for the oracle comparison
        params = jax.tree.map(lambda x: x, variables["params"])
        last = f"layer2"
        params["bbox_embed"][last] = {
            "kernel": r(D, 4) * 0.1,
            "bias": r(4) * 0.1,
        }
        out = m.apply({"params": params}, feats, pos, ego)

        p = params
        query_pos = t(p["query_embed"]["embedding"]).unsqueeze(0).expand(B, M, D)
        zeros = torch.zeros(B, M, D)
        state_imgs = []
        pos_np = np.broadcast_to(np.asarray(pos)[None], (B, L, h, w, D))
        for l in range(L):
            frame = t(np.asarray(feats)[:, l].reshape(B, h * w, D))
            fpos = t(pos_np[:, l].reshape(B, h * w, D))
            images = [frame] + state_imgs
            img_pos = [fpos for _ in images]
            hs, ref = decoder_stack(
                p["decoder"], layers, zeros, query_pos, images, img_pos,
                t(np.asarray(ego)[:, l : l + 1]), H, D, first_layer_special=True,
            )
            state_imgs = images[:1]  # num_images - 1 remembered frames
        ref_logit = inverse_sigmoid(ref)
        deltas = mlp(hs, p["bbox_embed"], 3)
        coords = torch.sigmoid(
            torch.cat([deltas[..., :2] + ref_logit.unsqueeze(0), deltas[..., 2:]], dim=-1)
        )
        cls = lin(hs, p["class_embed"])
        np.testing.assert_allclose(
            np.asarray(out["pred_logits"]), cls[-1].numpy(), atol=STACK_ATOL
        )
        np.testing.assert_allclose(
            np.asarray(out["pred_boxes"]), coords[-1].numpy(), atol=STACK_ATOL
        )
        for i, aux in enumerate(out["aux_outputs"]):
            np.testing.assert_allclose(
                np.asarray(aux["pred_logits"]), cls[i].numpy(), atol=STACK_ATOL
            )
            np.testing.assert_allclose(
                np.asarray(aux["pred_boxes"]), coords[i].numpy(), atol=STACK_ATOL
            )
