"""Attention primitives and small blocks (flax.linen, batch-first).

Re-designs of the reference's attention modules
(`/root/reference/future_od/models/transformer.py:51-181` and the custom
ConditionalDETR `MultiheadAttention` they wrap — an MHA without internal
input projections, supporting vdim != embed_dim):

- Everything is (B, N, D) batch-first; attention cores are einsums that lower
  straight onto the MXU.
- `SlotToImageAttention` (the conditional cross-attention with per-head
  concat(content, sine) queries/keys) never materializes the 2D-wide concat:
  `concat(qc, qs) · concat(kc, ks) == qc·kc + qs·ks`, so it runs as two
  batched matmuls summed pre-softmax, with the torch-compatible
  1/sqrt(2D/H) scaling.
- Attention maps for the demo/visualization path are exposed through flax's
  `sow` mechanism (collection "intermediates") instead of module state.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# Transformer linear layers use xavier/glorot init to match the reference's
# `_reset_parameters` (transformer.py:12-15). Biases use the torch Linear
# default U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — _reset_parameters skips 1-D
# params — which matters: with zero biases, layer 0's self-attention over the
# all-zero initial query content would be exactly zero and the first decoder
# layer degenerate at init.
default_kernel_init = nn.initializers.xavier_uniform()


class TorchLinear(nn.Module):
    """Dense with xavier-uniform kernel and torch-default bias init.

    `return_weights=True` creates the params (same names/shapes — checkpoint
    layout unchanged) but returns `(kernel, bias)` instead of applying them:
    the hook for packing several projections that share an input into ONE
    matmul over concatenated kernels (see `packed_proj` below)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, *, return_weights: bool = False):
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", default_kernel_init, (fan_in, self.features), jnp.float32
        )
        bias = None
        if self.use_bias:
            bound = 1.0 / math.sqrt(fan_in)
            bias = self.param(
                "bias",
                lambda key, shape, dtype: jax.random.uniform(
                    key, shape, dtype, minval=-bound, maxval=bound
                ),
                (self.features,),
                jnp.float32,
            )
        if return_weights:
            return kernel, bias
        y = x @ kernel
        if bias is not None:
            y = y + bias
        return y


def packed_proj_enabled() -> bool:
    """Pack per-input Dense projections into one matmul (small-op latency).

    At the decoder's M=128-query shapes each projection is a tiny
    (B*M, D) x (D, D) matmul; concatenating the kernels of projections that
    share an input turns k dispatches into one (B*M, D) x (D, k*D) matmul
    with identical per-element reduction order (outputs are bitwise the
    separate results' concat). Measured via tools/bench_decoder_split.py."""
    import os

    return os.environ.get("FUTURE_OD_PACKED_PROJ", "0") == "1"


def _packed(parent_input, branches):
    """Apply several TorchLinear projections of `parent_input` as one matmul.

    branches: list of (features, name). Returns the per-branch outputs.
    Params are created under the same submodule names as the unpacked path,
    so checkpoints are interchangeable."""
    kbs = [
        _dense(f, name)(parent_input, return_weights=True) for f, name in branches
    ]
    kernel = jnp.concatenate([k for k, _ in kbs], axis=1)
    y = parent_input @ kernel
    if any(b is not None for _, b in kbs):
        bias = jnp.concatenate(
            [
                b if b is not None else jnp.zeros((k.shape[1],), k.dtype)
                for k, b in kbs
            ]
        )
        y = y + bias
    sizes = np.cumsum([f for f, _ in branches])[:-1]
    return jnp.split(y, sizes, axis=-1)


def _dense(features: int, name: Optional[str] = None, use_bias: bool = True) -> TorchLinear:
    return TorchLinear(features, use_bias=use_bias, name=name)


def flash_allowed() -> bool:
    """Use the Pallas flash kernel on TPU unless disabled via env."""
    import os

    if os.environ.get("FUTURE_OD_DISABLE_FLASH", "0") == "1":
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def attend_heads(
    qh: jnp.ndarray,  # (B, Nq, H, dq)
    kh: jnp.ndarray,  # (B, Nk, H, dq)
    vh: jnp.ndarray,  # (B, Nk, H, dv)
    scale: float,
    *,
    dropout_rate: float,
    deterministic: bool,
    module: Optional[nn.Module] = None,
    sow_weights: bool = False,
) -> jnp.ndarray:
    """Multi-head attention core -> (B, Nq, H*dv).

    On TPU with a large key count and no attention capture this dispatches to
    the fused Pallas flash kernels (ops/flash_attention.py) — measured 2.2x
    the XLA einsum at the encoder's 1400-token shape. The training path uses
    the differentiable variant (custom-vjp forward/backward kernels with
    in-kernel attention-weight dropout), so (Nq, Nk) logits never touch HBM in
    either direction. Attention-capture and small shapes keep the einsum
    formulation (sow + exact torch-oracle parity).
    """
    # Gates are EMBEDDED full-step measurements, not standalone kernel wins
    # (BENCHMARKS.md round 2). Inference flash wins at full-res key counts
    # (+17% full-model throughput at 1400 keys) but LOSES at 448x800's 350
    # keys (474 -> 431 clips/s, re-measured round 3 with full-row blocks)
    # — threshold 1024. The custom-vjp TRAIN
    # kernels lose embedded at every measured shape (stage-1 350 keys:
    # 991 -> 1823 ms f32; stage-2 1400 keys: 609 -> 693 ms bf16) — XLA's
    # fused einsum attention wins on this toolchain — so the train path is
    # opt-in (FUTURE_OD_TRAIN_FLASH=1) for toolchains where it pays.
    import os

    if deterministic:
        # threshold re-confirmed round 3 with full-row blocks (flash still
        # -9% at 350 keys); FUTURE_OD_FLASH_MIN_KEYS overrides for A/B.
        # MIN_QUERIES separates the decoder's slot-query attns (128 q ×
        # 1400 k) from the encoder's (1400 q): at tiny q the per-call Pallas
        # dispatch outweighs the fused-softmax win — einsum decoder attns
        # measured +5.3% full-model (111.1/111.3 -> 116.7/117.1 clips/s,
        # in-window ABBA, BENCHMARKS.md round 4), so flash additionally
        # requires q >= 256 by default.
        min_keys = int(os.environ.get("FUTURE_OD_FLASH_MIN_KEYS", 1024))
        min_q = int(os.environ.get("FUTURE_OD_FLASH_MIN_QUERIES", 256))
        use_flash = (
            kh.shape[1] >= min_keys and qh.shape[1] >= min_q and flash_allowed()
        )
    else:
        use_flash = (
            os.environ.get("FUTURE_OD_TRAIN_FLASH", "0") == "1"
            and kh.shape[1] >= 256
            and flash_allowed()
        )
    use_flash = use_flash and not sow_weights
    if use_flash:
        if deterministic:
            from future_od_tpu.ops.flash_attention import flash_attention

            # block sizes: delegate to the kernel's auto logic (full-row
            # q blocks under a VMEM guard — the embedded-measured winner,
            # +5.1% bench.py; FUTURE_OD_FLASH_BQ/_BK env knobs for A/B)
            out = flash_attention(
                qh.transpose(0, 2, 1, 3),
                kh.transpose(0, 2, 1, 3),
                vh.transpose(0, 2, 1, 3),
                scale,
            )  # (B, H, Nq, dv)
        else:
            from future_od_tpu.ops.flash_attention import flash_attention_train

            rate = float(dropout_rate)
            if rate > 0.0:
                # the einsum path would fail loudly on the missing dropout
                # rng; don't silently train without attention dropout here
                assert module is not None, (
                    "train-flash attention with dropout_rate>0 needs the "
                    "calling module for make_rng('dropout')"
                )
                rng = module.make_rng("dropout")
                seed = jax.random.randint(
                    rng, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
                )
            else:
                seed = jnp.int32(0)
            out = flash_attention_train(
                qh.transpose(0, 2, 1, 3),
                kh.transpose(0, 2, 1, 3),
                vh.transpose(0, 2, 1, 3),
                seed,
                scale,
                rate,
                256,
                512,
            )
        out = out.transpose(0, 2, 1, 3)
        return out.reshape(*out.shape[:2], -1)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh)
    return attention_core(
        scale,
        logits,
        vh,
        dropout_rate=dropout_rate,
        deterministic=deterministic,
        module=module,
        sow_weights=sow_weights,
    )


def attention_core(
    logits_scale: float,
    logits: jnp.ndarray,
    v: jnp.ndarray,
    *,
    dropout_rate: float,
    deterministic: bool,
    dropout_rng=None,
    module: Optional[nn.Module] = None,
    sow_weights: bool = False,
):
    """softmax(logits * scale) @ v with attention-weight dropout.

    logits: (B, H, Nq, Nk); v: (B, Nk, H, Dv_head). Returns (B, Nq, H*Dv_head)
    plus optionally sows the head-averaged weights (the torch MHA return
    convention used by the demo notebook's attention visualization).
    """
    weights = jax.nn.softmax(logits * logits_scale, axis=-1)
    if sow_weights and module is not None:
        module.sow("intermediates", "attention_weights", weights.mean(axis=1))
    if dropout_rate > 0.0 and not deterministic:
        if dropout_rng is None and module is not None:
            dropout_rng = module.make_rng("dropout")
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = weights * keep / (1.0 - dropout_rate)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
    return out.reshape(*out.shape[:2], -1)


class MLP(nn.Module):
    """num_layers-deep ReLU MLP (transformer.py:18-32)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    last_layer_zero_init: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = jax.nn.relu(_dense(self.hidden_dim, name=f"layer{i}")(x))
        last = f"layer{self.num_layers - 1}"
        if self.last_layer_zero_init:
            # bbox head: weights AND bias zeroed (paper.py:312-313).
            x = nn.Dense(
                self.output_dim, kernel_init=nn.initializers.zeros, name=last
            )(x)
        else:
            x = _dense(self.output_dim, name=last)(x)
        return x


class FeedForward(nn.Module):
    """Transformer FFN: Dense -> ReLU -> Dropout -> Dense (+ optional out drop)."""

    hidden_dim: int
    output_dim: int
    dropout: float = 0.1
    dropout_after: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = jax.nn.relu(_dense(self.hidden_dim, name="fc1")(x))
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = _dense(self.output_dim, name="fc2")(x)
        if self.dropout_after:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class SlotToSlotAttention(nn.Module):
    """Decoder self-attention (transformer.py:61-82): separate content/pos
    projections for q and k, value from content only."""

    dim: int
    num_heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        query_content,
        query_pos,
        key_content,
        key_pos,
        deterministic: bool = True,
    ):
        D, H = self.dim, self.num_heads
        if (
            packed_proj_enabled()
            and query_content is key_content
            and query_pos is key_pos
        ):
            # Decoder self-attention: q/k/v content projections share the
            # input, as do the q/k pos projections — 5 tiny matmuls -> 2.
            qc, kc, v = _packed(
                query_content,
                [(D, "query_content"), (D, "key_content"), (D, "value")],
            )
            qp, kp = _packed(query_pos, [(D, "query_pos"), (D, "key_pos")])
            q, k = qc + qp, kc + kp
        else:
            q = _dense(D, "query_content")(query_content) + _dense(D, "query_pos")(query_pos)
            k = _dense(D, "key_content")(key_content) + _dense(D, "key_pos")(key_pos)
            v = _dense(D, "value")(key_content)
        B, Nq, _ = q.shape
        Nk = k.shape[1]
        qh = q.reshape(B, Nq, H, D // H)
        kh = k.reshape(B, Nk, H, D // H)
        vh = v.reshape(B, Nk, H, D // H)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh)
        out = attention_core(
            1.0 / math.sqrt(D // H),
            logits,
            vh,
            dropout_rate=self.dropout,
            deterministic=deterministic,
            module=self,
        )
        return _dense(D, "out_proj")(out)


class EgodeepAttention(nn.Module):
    """Cross-attention to the (single-token) IMU embedding
    (transformer.py:85-119). With `ff_dim` set, appends the reference's
    norm(out + dropout(out)) -> norm(out + mlp(out)) block (encoder flavor)."""

    dim: int
    num_heads: int
    dropout: float = 0.1
    ff_dim: Optional[int] = None

    @nn.compact
    def __call__(self, query_content, query_pos, key, deterministic: bool = True):
        D, H = self.dim, self.num_heads
        q = _dense(D, "query_content")(query_content) + _dense(D, "query_pos")(query_pos)
        if packed_proj_enabled():
            k, v = _packed(key, [(D, "key"), (D, "value")])
        else:
            k = _dense(D, "key")(key)
            v = _dense(D, "value")(key)
        B, Nq, _ = q.shape
        Nk = k.shape[1]
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk",
            q.reshape(B, Nq, H, D // H),
            k.reshape(B, Nk, H, D // H),
        )
        out = attention_core(
            1.0 / math.sqrt(D // H),
            logits,
            v.reshape(B, Nk, H, D // H),
            dropout_rate=self.dropout,
            deterministic=deterministic,
            module=self,
        )
        out = _dense(D, "out_proj")(out)
        if self.ff_dim is not None:
            # NOTE: mirrors the reference exactly — the "residual" really is
            # out + dropout(out), not input + dropout(out) (transformer.py:117).
            out = nn.LayerNorm(name="norm1")(
                out + nn.Dropout(self.dropout)(out, deterministic=deterministic)
            )
            ff = FeedForward(self.ff_dim, D, self.dropout, dropout_after=True, name="mlp")
            out = nn.LayerNorm(name="norm2")(out + ff(out, deterministic=deterministic))
        return out


class SlotToImageAttention(nn.Module):
    """Conditional cross-attention (transformer.py:122-181).

    Per head, queries are concat(content_proj, sine_proj) and keys
    concat(content_proj(+pos), sine_proj), each D/H wide, attending into
    D-dim values. The concat is algebraically eliminated:
    logits = (qc·kc + qs·ks) / sqrt(2D/H) — two MXU matmuls, no 2D-wide
    tensors. `use_query_pos=False` reproduces decoder layers >= 1, whose
    query_pos projection is deleted (transformer.py:321-324).
    """

    dim: int
    num_heads: int
    dropout: float = 0.1
    use_query_pos: bool = True
    store_attention: bool = False

    @nn.compact
    def __call__(
        self,
        query_content,
        query_pos,
        query_sine,
        key_content,
        key_pos_flag: bool,
        key_sine,
        deterministic: bool = True,
    ):
        """key_pos_flag mirrors the reference's `key_pos is not None` switch:
        when True (is_first), the projected sine is also added into the key
        content path (transformer.py:159-163)."""
        D, H = self.dim, self.num_heads
        if packed_proj_enabled():
            # value and key_content share the image-token input: 2 -> 1
            # (B*Nk, D) x (D, 2D) matmul.
            v, k_content = _packed(
                key_content, [(D, "value"), (D, "key_content")]
            )
        else:
            v = _dense(D, "value")(key_content)
            k_content = _dense(D, "key_content")(key_content)
        q_content = _dense(D, "query_content")(query_content)
        if self.use_query_pos and query_pos is not None:
            q_content = q_content + _dense(D, "query_pos")(query_pos)
        q_sine = _dense(D, "query_sine")(query_sine)

        k_sine = _dense(D, "key_pos")(key_sine)
        if key_pos_flag:
            k_content = k_content + k_sine

        B, Nq, _ = q_content.shape
        Nk = k_content.shape[1]
        hd = D // H
        # Per-head concat(content, sine) queries/keys. (The concat dot product
        # equals qc·kc + qs·ks, so the einsum fallback and the flash kernel
        # compute the same logits.)
        qh = jnp.concatenate(
            [q_content.reshape(B, Nq, H, hd), q_sine.reshape(B, Nq, H, hd)], axis=-1
        )
        kh = jnp.concatenate(
            [k_content.reshape(B, Nk, H, hd), k_sine.reshape(B, Nk, H, hd)], axis=-1
        )
        out = attend_heads(
            qh,
            kh,
            v.reshape(B, Nk, H, hd),
            1.0 / math.sqrt(2 * D // H),  # torch scales by full 2D/H head width
            dropout_rate=self.dropout,
            deterministic=deterministic,
            module=self,
            sow_weights=self.store_attention,
        )
        return _dense(D, "out_proj")(out)


class SelfAttention(nn.Module):
    """Standard MHA with packed in-projection (torch nn.MultiheadAttention
    semantics used by the encoder, transformer.py:401-419): q/k get positional
    encodings added by the caller, v does not."""

    dim: int
    num_heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, query, key, value, deterministic: bool = True):
        D, H = self.dim, self.num_heads
        if packed_proj_enabled() and query is key:
            # Encoder self-attention: q/k share src+pos (v is src alone).
            q, k = _packed(query, [(D, "q_proj"), (D, "k_proj")])
            v = _dense(D, "v_proj")(value)
        else:
            q = _dense(D, "q_proj")(query)
            k = _dense(D, "k_proj")(key)
            v = _dense(D, "v_proj")(value)
        B, Nq, _ = q.shape
        Nk = k.shape[1]
        out = attend_heads(
            q.reshape(B, Nq, H, D // H),
            k.reshape(B, Nk, H, D // H),
            v.reshape(B, Nk, H, D // H),
            1.0 / math.sqrt(D // H),
            dropout_rate=self.dropout,
            deterministic=deterministic,
            module=self,
        )
        return _dense(D, "out_proj")(out)


class EncoderAttention(nn.Module):
    """Encoder attention block (transformer.py:401-419): pre-projected-pos
    self/cross attention + dropout/norm + FFN + norm (post-norm)."""

    dim: int
    num_heads: int
    ff_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, src, query_base, key_base, val_base, deterministic: bool = True):
        attn = SelfAttention(self.dim, self.num_heads, self.dropout, name="attn")(
            query_base, key_base, val_base, deterministic=deterministic
        )
        src = nn.LayerNorm(name="norm1")(
            src + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        )
        ff = FeedForward(self.ff_dim, self.dim, self.dropout, dropout_after=True, name="mlp")
        src = nn.LayerNorm(name="norm2")(src + ff(src, deterministic=deterministic))
        return src
