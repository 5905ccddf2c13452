"""Transformer encoder with egodeep / prevout / frame-memory attention.

Re-design of the reference encoder (`transformer.py:422-512`), batch-first
(B, N, D). The per-frame encoder runs folded over (B·L) on the batch axis so
all frames encode in one big MXU-friendly batch (paper.py:146-165).
"""
from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
from flax import linen as nn

from future_od_tpu.models.layers import EgodeepAttention, EncoderAttention


class TransformerEncoderLayer(nn.Module):
    """One encoder layer (transformer.py:422-487): self-attn over image tokens
    with positional encodings on q/k, optional cross-attn to previous layer
    output / previous-frame feature memory, optional egodeep cross-attn."""

    dim: int
    num_heads: int
    ff_dim: int = 2048
    dropout: float = 0.1
    num_previmages: int = 0
    use_prevout: bool = False
    use_egodeep: bool = False

    @nn.compact
    def __call__(
        self,
        image_features: jnp.ndarray,  # (B, N, D)
        prevout: Optional[jnp.ndarray] = None,
        image_feature_memory: Optional[List[jnp.ndarray]] = None,
        image_pos: Optional[jnp.ndarray] = None,
        egodeep: Optional[jnp.ndarray] = None,  # (B, Negodeep, D)
        deterministic: bool = True,
    ):
        x = image_features
        # One shared q/k base object: lets SelfAttention's packed-projection
        # path recognize self-attention (`query is key`) and fuse the q/k
        # projections into one matmul.
        qk = x + image_pos
        x = EncoderAttention(self.dim, self.num_heads, self.ff_dim, self.dropout, name="self_attn")(
            src=x,
            query_base=qk,
            key_base=qk,
            val_base=x,
            deterministic=deterministic,
        )
        if prevout is not None and self.use_prevout:
            x = EncoderAttention(
                self.dim, self.num_heads, self.ff_dim, self.dropout, name="prevout_attn"
            )(
                src=x,
                query_base=x + image_pos,
                key_base=prevout + image_pos,
                val_base=prevout,
                deterministic=deterministic,
            )
        if image_feature_memory:
            for i, prev in enumerate(image_feature_memory[: self.num_previmages]):
                x = EncoderAttention(
                    self.dim, self.num_heads, self.ff_dim, self.dropout,
                    name=f"previmage_attn{i}",
                )(
                    src=x,
                    query_base=x + image_pos,
                    key_base=prev + image_pos,
                    val_base=prev,
                    deterministic=deterministic,
                )
        if egodeep is not None and self.use_egodeep:
            new = EgodeepAttention(
                self.dim, self.num_heads, self.dropout, ff_dim=self.ff_dim,
                name="egodeep_attend",
            )(x, image_pos, egodeep, deterministic=deterministic)
            x = nn.LayerNorm(name="norm_eda")(
                x + nn.Dropout(self.dropout)(new, deterministic=deterministic)
            )
        return x


class TransformerEncoder(nn.Module):
    """Stack of encoder layers (transformer.py:490-512)."""

    num_layers: int
    dim: int
    num_heads: int
    ff_dim: int = 2048
    dropout: float = 0.1
    num_previmages: int = 0
    use_prevout: bool = False
    use_egodeep: bool = False

    @nn.compact
    def __call__(
        self,
        image_features,
        prevout=None,
        image_feature_memory=None,
        image_pos=None,
        egodeep=None,
        deterministic: bool = True,
    ):
        for i in range(self.num_layers):
            image_features = TransformerEncoderLayer(
                self.dim,
                self.num_heads,
                self.ff_dim,
                self.dropout,
                self.num_previmages,
                self.use_prevout,
                self.use_egodeep,
                name=f"layer{i}",
            )(
                image_features,
                prevout=prevout,
                image_feature_memory=image_feature_memory,
                image_pos=image_pos,
                egodeep=egodeep,
                deterministic=deterministic,
            )
        return image_features
