"""Conditional-DETR transformer decoder with frame memory, slotstates, and
egodeep conditioning.

Re-design of the reference decoder (`transformer.py:184-398`), batch-first.
Structural choices carried over exactly:
- post-norm residual order: self-attn -> one conditional image attention per
  remembered frame -> optional slotstates attn -> optional egodeep attn -> FFN;
- layer 0 may be "special": unscaled query sine embedding and positional
  projections added into the content paths (first_layer_special / is_first);
- layers >= 1 have no query_pos projection in their image attentions
  (the reference deletes those weights, transformer.py:321-324);
- shared final LayerNorm applied to every intermediate level's output.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from future_od_tpu.models.layers import (
    EgodeepAttention,
    FeedForward,
    MLP,
    SlotToImageAttention,
    SlotToSlotAttention,
)
from future_od_tpu.ops.posenc import gen_sineembed_for_position


class TransformerDecoderLayer(nn.Module):
    """One decoder layer (transformer.py:184-312)."""

    dim: int
    num_heads: int
    ff_dim: int = 2048
    dropout: float = 0.1
    num_images: int = 1
    use_slotstates: bool = False
    use_egodeep: bool = False
    image_attn_query_pos: bool = True  # False for layers >= 1
    store_attention: bool = False

    @nn.compact
    def __call__(
        self,
        query_content,  # (B, M, D)
        query_pos,  # (B, M, D)
        query_sine,  # (B, M, D)
        image_content_lst: List[jnp.ndarray],  # each (B, N, D)
        image_pos_lst: List[jnp.ndarray],
        slotstates_content=None,
        slotstates_pos=None,
        slotstates_sine=None,
        is_first: bool = False,
        egodeep=None,  # (B, 1, D)
        deterministic: bool = True,
    ):
        x = query_content
        new = SlotToSlotAttention(self.dim, self.num_heads, self.dropout, name="self_attend")(
            query_content=x,
            query_pos=query_pos,
            key_content=x,
            key_pos=query_pos,
            deterministic=deterministic,
        )
        x = nn.LayerNorm(name="norm_sa")(
            x + nn.Dropout(self.dropout)(new, deterministic=deterministic)
        )

        # One conditional cross-attention per remembered frame; like the
        # reference's zip() (transformer.py:274), a shorter memory list simply
        # skips the later attention modules.
        for i, (image_content, image_pos) in enumerate(
            zip(image_content_lst[: self.num_images], image_pos_lst[: self.num_images])
        ):
            new = SlotToImageAttention(
                self.dim,
                self.num_heads,
                self.dropout,
                use_query_pos=self.image_attn_query_pos,
                store_attention=self.store_attention,
                name=f"image_attend{i}",
            )(
                query_content=x,
                query_pos=query_pos if is_first else None,
                query_sine=query_sine,
                key_content=image_content,
                key_pos_flag=is_first,
                key_sine=image_pos,
                deterministic=deterministic,
            )
            x = nn.LayerNorm(name=f"norm_ia{i}")(
                x + nn.Dropout(self.dropout)(new, deterministic=deterministic)
            )

        if self.use_slotstates and slotstates_content is not None:
            new = SlotToSlotAttention(
                self.dim, self.num_heads, self.dropout, name="slotstates_attend"
            )(
                query_content=x,
                query_pos=query_pos,
                key_content=slotstates_content,
                key_pos=slotstates_pos,
                deterministic=deterministic,
            )
            x = nn.LayerNorm(name="norm_ssa")(
                x + nn.Dropout(self.dropout)(new, deterministic=deterministic)
            )

        if self.use_egodeep and egodeep is not None:
            new = EgodeepAttention(
                self.dim, self.num_heads, self.dropout, ff_dim=None, name="egodeep_attend"
            )(x, query_pos, egodeep, deterministic=deterministic)
            x = nn.LayerNorm(name="norm_eda")(
                x + nn.Dropout(self.dropout)(new, deterministic=deterministic)
            )

        new = FeedForward(self.ff_dim, self.dim, self.dropout, name="feedforward")(
            x, deterministic=deterministic
        )
        x = nn.LayerNorm(name="norm_out")(
            x + nn.Dropout(self.dropout)(new, deterministic=deterministic)
        )
        return x


class TransformerDecoder(nn.Module):
    """Decoder stack (transformer.py:315-398): owns the reference-point head
    and per-layer conditional sine scaling; returns all intermediate levels."""

    num_layers: int
    dim: int
    num_heads: int
    ff_dim: int = 2048
    dropout: float = 0.1
    num_images: int = 1
    use_slotstates: bool = False
    use_egodeep: bool = False
    store_attention: bool = False

    @nn.compact
    def __call__(
        self,
        query_content,  # (B, M, D) — zeros for the first frame, recurrent after
        query_pos,  # (B, M, D) learned embeddings
        image_content_lst: List[jnp.ndarray],
        image_pos_lst: List[jnp.ndarray],
        slotstates_content=None,
        first_layer_special: bool = True,
        egodeep=None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (stacked per-layer outputs (num_layers, B, M, D),
        reference points (B, M, 2))."""
        query_scale = MLP(self.dim, self.dim, 2, name="query_scale")
        ref_point_head = MLP(self.dim, 2, 2, name="ref_point_head")
        final_norm = nn.LayerNorm(name="norm")

        reference_points = nn.sigmoid(ref_point_head(query_pos))  # (B, M, 2)
        unscaled_query_sine = gen_sineembed_for_position(reference_points, self.dim)

        intermediate = []
        x = query_content
        for layer_id in range(self.num_layers):
            if layer_id == 0 and first_layer_special:
                query_sine = unscaled_query_sine
            else:
                query_sine = query_scale(x) * unscaled_query_sine
            if slotstates_content is not None:
                slotstates_pos = query_pos
                slotstates_sine = query_scale(slotstates_content) * unscaled_query_sine
            else:
                slotstates_pos = None
                slotstates_sine = None

            x = TransformerDecoderLayer(
                self.dim,
                self.num_heads,
                self.ff_dim,
                self.dropout,
                self.num_images,
                self.use_slotstates,
                self.use_egodeep,
                image_attn_query_pos=(layer_id == 0),
                store_attention=self.store_attention,
                name=f"layer{layer_id}",
            )(
                x,
                query_pos,
                query_sine,
                image_content_lst,
                image_pos_lst,
                slotstates_content,
                slotstates_pos,
                slotstates_sine,
                is_first=(layer_id == 0) and first_layer_special,
                egodeep=egodeep,
                deterministic=deterministic,
            )
            intermediate.append(final_norm(x))

        return jnp.stack(intermediate, axis=0), reference_points
