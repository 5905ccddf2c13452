"""Model cores: per-frame encoding, cross-frame encoders, the recurrent
frame-memory detector, and the paper's model families.

Re-design of `/root/reference/future_od/models/paper.py` (TPU-first):
- images are NHWC; features (B, L, h, w, D) channels-last;
- all frames run the backbone + per-frame encoder as one folded (B·L) batch;
- the recurrent "attend one at a time" detector unrolls its (static, tiny)
  frame loop at trace time — each step is a full 6-layer decoder pass whose
  image-memory list grows to `num_images`, so XLA sees one straight-line
  program with no dynamic control flow.
"""
from __future__ import annotations

import math
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from future_od_tpu.models.decoder import TransformerDecoder
from future_od_tpu.models.encoder import TransformerEncoder
from future_od_tpu.models.layers import default_kernel_init
from future_od_tpu.models.resnet import CDetrBackbone, conv_init
from future_od_tpu.ops.misc import inverse_sigmoid
from future_od_tpu.ops.posenc import spatial_encoding, spatio_temporal_encoding


class ImuEncoder(nn.Module):
    """IMU embedding MLP: Linear(imu_dim -> width) -> ReLU -> Linear(-> dim)
    (runs/_model.py:26-30)."""

    dim: int
    width: int = 128

    @nn.compact
    def __call__(self, imu):  # (B, L, imu_dim) -> (B, L, dim)
        from future_od_tpu.models.layers import TorchLinear

        x = jax.nn.relu(TorchLinear(self.width, name="fc1")(imu))
        return TorchLinear(self.dim, name="fc2")(x)


class SeparateEncoder(nn.Module):
    """Per-frame feature extraction (paper.py:119-170): backbone on the folded
    (B·L) frame batch, IMU -> egodeep token, optional per-frame transformer
    encoder over the h·w tokens with egodeep cross-attention."""

    hidden_dim: int
    enc_layers: int = 6
    enc_heads: int = 8
    ff_dim: int = 2048
    dropout: float = 0.1
    use_encoder: bool = True
    use_egodeep: bool = True
    use_imu: bool = True
    concat_imu: bool = False
    backbone_name: str = "resnet50"
    backbone_dilation: bool = False
    # NOTE: measured SLOWER on this toolchain (55 vs 78 clips/s at the bench
    # config — the 12-channel 4x4 conv picks a bad algorithm); default off,
    # kept as a capability for toolchains where the classic trick wins.
    backbone_space_to_depth: bool = False
    # int8 PTQ inference path for the trunk convs (ops/quant.py) — the v5e
    # MXU's int8 peak is 2x bf16 and int8 halves early-stage HBM traffic
    backbone_int8: bool = False
    # static-calibration variant: activation ranges from a calibration pass
    # (the "quant" variable collection) instead of per-call reductions
    backbone_int8_static: bool = False
    # sever the backward at the stem+layer1 freeze boundary (exact under the
    # optimizer's frozen mask; False for from-scratch training) — see
    # resnet.ResNet.stop_grad_frozen
    backbone_freeze_stem: bool = True

    @nn.compact
    def __call__(
        self, images: jnp.ndarray, imu: Optional[jnp.ndarray] = None, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """images (B, L, H, W, 3) — or (B, L, H/2, W/2, 12) when the host
        already space-to-depth packed the frames; imu (B, L, imu_dim).
        Returns features (B, L, h, w, D) and egodeep (B, L, D) or None."""
        B, L, H, W, C = images.shape
        folded = images.reshape(B * L, H, W, C)
        features = CDetrBackbone(
            self.hidden_dim, self.backbone_name, self.backbone_dilation,
            self.backbone_space_to_depth, self.backbone_int8,
            int8_static=self.backbone_int8_static,
            stop_grad_frozen=self.backbone_freeze_stem, name="backbone",
        )(folded, deterministic=deterministic)
        _, h, w, D = features.shape

        egodeep = None
        if imu is not None and self.use_imu:
            egodeep = ImuEncoder(self.hidden_dim, name="imu_layers")(imu)  # (B, L, D)
        if self.concat_imu and egodeep is not None:
            features = features + egodeep.reshape(B * L, 1, 1, D)
            egodeep = None

        if self.use_encoder:
            pos = spatial_encoding(h, w, D).reshape(1, h * w, D)
            tokens = features.reshape(B * L, h * w, D)
            ego_tok = (
                egodeep.reshape(B * L, 1, D) if (egodeep is not None and self.use_egodeep)
                else None
            )
            tokens = TransformerEncoder(
                self.enc_layers,
                self.hidden_dim,
                self.enc_heads,
                self.ff_dim,
                self.dropout,
                use_egodeep=self.use_egodeep,
                name="transformer",
            )(tokens, image_pos=pos, egodeep=ego_tok, deterministic=deterministic)
            features = tokens.reshape(B * L, h, w, D)
        return features.reshape(B, L, h, w, D), egodeep


class JointEncoder(nn.Module):
    """Joint attention over all l·h·w tokens at once (paper.py:180-203)."""

    num_layers: int
    dim: int
    num_heads: int
    ff_dim: int = 2048
    dropout: float = 0.1
    use_egodeep: bool = False

    @nn.compact
    def __call__(self, features, pos_enc, egodeep=None, deterministic: bool = True):
        """features/pos_enc (B, L, h, w, D); egodeep (B, L, D).
        Returns (features, pos_enc) same shapes."""
        B, L, h, w, D = features.shape
        tokens = features.reshape(B, L * h * w, D)
        pos = pos_enc.reshape(B, L * h * w, D) if pos_enc.ndim == 5 else (
            jnp.broadcast_to(pos_enc[None], (B, L, h, w, D)).reshape(B, L * h * w, D)
        )
        tokens = TransformerEncoder(
            self.num_layers, self.dim, self.num_heads, self.ff_dim, self.dropout,
            use_egodeep=self.use_egodeep, name="transformer",
        )(tokens, image_pos=pos, egodeep=egodeep, deterministic=deterministic)
        return tokens.reshape(B, L, h, w, D), pos_enc


class JointEncoderSequential(nn.Module):
    """Causal per-frame encoder with growing frame memory (paper.py:206-234)."""

    num_layers: int
    dim: int
    num_heads: int
    ff_dim: int = 2048
    dropout: float = 0.1
    num_previmages: int = 0
    use_prevout: bool = True
    use_egodeep: bool = False

    @nn.compact
    def __call__(self, features, pos_enc, egodeep=None, deterministic: bool = True):
        B, L, h, w, D = features.shape
        if pos_enc.ndim == 4:  # (L, h, w, D) shared across batch
            pos_frames = [
                jnp.broadcast_to(pos_enc[l].reshape(1, h * w, D), (B, h * w, D))
                for l in range(L)
            ]
        else:
            pos_frames = [pos_enc[:, l].reshape(B, h * w, D) for l in range(L)]
        encoder = TransformerEncoder(
            self.num_layers, self.dim, self.num_heads, self.ff_dim, self.dropout,
            num_previmages=self.num_previmages, use_prevout=self.use_prevout,
            use_egodeep=self.use_egodeep, name="transformer",
        )
        out = None
        memory: List[jnp.ndarray] = []
        outputs = []
        for l in range(L):
            frame = features[:, l].reshape(B, h * w, D)
            ego_tok = egodeep[:, l : l + 1] if egodeep is not None else None
            out = encoder(
                frame,
                prevout=out,
                image_feature_memory=memory,
                image_pos=pos_frames[l],
                egodeep=ego_tok,
                deterministic=deterministic,
            )
            memory = [frame] + memory
            outputs.append(out.reshape(B, h, w, D))
        return jnp.stack(outputs, axis=1), pos_enc


class JointEncoderF2F(nn.Module):
    """F2F-style dilated conv stack over channel-stacked frames
    (paper.py:237-277, arXiv 1803.11496). Returns a single future feature map."""

    hidden_dim: int
    num_frames: int

    @nn.compact
    def __call__(self, features, pos_enc, egodeep=None, deterministic: bool = True):
        del egodeep
        B, L, h, w, D = features.shape
        x = features.transpose(0, 2, 3, 1, 4).reshape(B, h, w, L * D)
        p = self.hidden_dim
        spec = [  # (features, kernel, dilation) mirroring paper.py:246-259
            (2 * p, 1, 1), (2 * p, 3, 2), (2 * p, 3, 2), (p, 3, 4),
            (p, 3, 8), (p, 3, 2), (p, 7, 1),
        ]
        for i, (feats, k, d) in enumerate(spec):
            x = nn.Conv(
                feats, (k, k), kernel_dilation=(d, d), padding="SAME",
                kernel_init=conv_init, name=f"conv{i}",
            )(x)
            if i < len(spec) - 1:
                x = jax.nn.relu(x)
        out = x.reshape(B, 1, h, w, p)
        out_pos = pos_enc[-1:] if pos_enc.ndim == 4 else pos_enc[:, -1:]
        return out, out_pos


class CDetrDetectorSpatioTemporal(nn.Module):
    """Recurrent conditional-DETR detection head (paper.py:280-429).

    Queries start from a learned embedding; in "attend one at a time" mode the
    decoder runs once per frame, carrying a bounded image memory of
    num_images-1 previous feature maps (and optionally the final queries as
    slotstates). Only the final frame's prediction is returned.
    """

    num_classes: int
    hidden_dim: int
    num_queries: int = 300
    dec_layers: int = 6
    dec_heads: int = 8
    ff_dim: int = 2048
    dropout: float = 0.1
    num_images: int = 1
    use_slotstates: bool = False
    use_egodeep: bool = False
    aux_loss: bool = True
    first_layer_special_when: str = "always"  # "first frame" | "always" | "never"
    image_memory_mode: str = "attend one at a time"  # | "attend all at once"
    store_attention: bool = False

    def setup(self):
        assert self.first_layer_special_when in ("first frame", "always", "never")
        assert self.image_memory_mode in ("attend one at a time", "attend all at once")
        self.decoder = TransformerDecoder(
            self.dec_layers,
            self.hidden_dim,
            self.dec_heads,
            self.ff_dim,
            self.dropout,
            num_images=self.num_images,
            use_slotstates=self.use_slotstates,
            use_egodeep=self.use_egodeep,
            store_attention=self.store_attention,
            name="decoder",
        )
        # Focal-prior bias for the classification head (paper.py:307-309) and
        # zero-initialized bbox delta head (paper.py:312-313).
        prior_prob = 0.01
        bias_value = -math.log((1 - prior_prob) / prior_prob)
        self.class_embed = nn.Dense(
            self.num_classes,
            kernel_init=default_kernel_init,
            bias_init=nn.initializers.constant(bias_value),
            name="class_embed",
        )
        from future_od_tpu.models.layers import MLP  # local import to avoid cycle

        self.bbox_embed = MLP(
            self.hidden_dim, 4, 3, last_layer_zero_init=True, name="bbox_embed"
        )
        self.query_embed = nn.Embed(
            self.num_queries,
            self.hidden_dim,
            embedding_init=nn.initializers.normal(1.0),
            name="query_embed",
        )

    def __call__(self, features, pos_enc, egodeep=None, deterministic: bool = True):
        """features (B, L, h, w, D); pos_enc (L, h, w, D) or (B, L, h, w, D);
        egodeep (B, L, D) or None. Returns the prediction dict for the final
        recurrence step."""
        B, L, h, w, D = features.shape
        if pos_enc.ndim == 4:
            pos_enc = jnp.broadcast_to(pos_enc[None], (B, L, h, w, D))

        if self.image_memory_mode == "attend all at once":
            tokens = features.reshape(B, L * h * w, D)
            pos = pos_enc.reshape(B, L * h * w, D)
            ego = egodeep if egodeep is not None else None  # (B, L, D) as L tokens
            out, _ = self.detect(tokens, pos, ego, True, None, deterministic)
            return out

        state = None
        out = None
        for l in range(L):
            frame = features[:, l].reshape(B, h * w, D)
            pos = pos_enc[:, l].reshape(B, h * w, D)
            ego = egodeep[:, l : l + 1] if egodeep is not None else None
            if (
                not self.use_slotstates
                and l < L - 1
                # measurement-only A/B knob (trace-time)
                and os.environ.get("FUTURE_OD_NO_DEC_SKIP", "0") != "1"
            ):
                # Without slotstates, a non-final frame's decoder output is
                # entirely unused: the recurrence state carries only the RAW
                # frame features (paper.py:399-402 truncates image memory; the
                # wrapper consumes only the final step's dict). Skipping the
                # dead 6-layer decoder pass is exact — XLA cannot DCE it
                # itself once the attention lowers to opaque Pallas calls.
                # (Training dropout draws shift versus the unskipped trace —
                # a different random stream, same distribution.)
                prev = state["image_content_lst"] if state is not None else []
                state = {
                    "slotstates_content": None,
                    "image_content_lst": ([frame] + prev)[: self.num_images - 1],
                }
                continue
            out, state = self.detect(frame, pos, ego, l == 0, state, deterministic)
        return out

    def detect(
        self,
        frame_features,  # (B, N, D)
        pos_embed,  # (B, N, D)
        egodeep,  # (B, Nego, D) or None
        first_frame: bool,
        state: Optional[Dict[str, Any]],
        deterministic: bool = True,
    ):
        """One decoder pass over the current frame + remembered frames
        (paper.py:352-419)."""
        B = frame_features.shape[0]
        query_pos = jnp.broadcast_to(
            self.query_embed.embedding[None], (B, self.num_queries, self.hidden_dim)
        )
        query_content = jnp.zeros_like(query_pos)

        if state is None:
            image_content_lst = [frame_features]
            slotstates_content = None
        else:
            image_content_lst = [frame_features] + state["image_content_lst"]
            slotstates_content = state["slotstates_content"]
        if self.image_memory_mode == "attend one at a time":
            image_pos_lst = [pos_embed for _ in image_content_lst]
        else:
            image_pos_lst = [pos_embed]

        hs, reference = self.decoder(
            query_content=query_content,
            query_pos=query_pos,
            image_content_lst=image_content_lst,
            image_pos_lst=image_pos_lst,
            slotstates_content=slotstates_content,
            first_layer_special=(
                (first_frame and self.first_layer_special_when == "first frame")
                or self.first_layer_special_when == "always"
            ),
            egodeep=egodeep,
            deterministic=deterministic,
        )  # hs: (num_layers, B, M, D); reference: (B, M, 2)

        new_state = {
            "slotstates_content": hs[-1] if self.use_slotstates else None,
            "image_content_lst": image_content_lst[: self.num_images - 1],
        }

        ref_logit = inverse_sigmoid(reference)  # (B, M, 2)

        def heads(levels):  # (..., B, M, D) -> logits, sigmoid coords
            deltas = self.bbox_embed(levels)
            coords = jnp.concatenate(
                [deltas[..., :2] + ref_logit, deltas[..., 2:]], axis=-1
            )
            return self.class_embed(levels), nn.sigmoid(coords)

        # Heads applied to the final level and the aux levels SEPARATELY
        # (identical math to one application over the stacked hs — the same
        # matmul on each level slice): inference consumes only the final
        # level, and a head matmul over all 6 levels followed by [-1] does
        # NOT get sliced down by XLA — measured 3.08 ms vs 0.88 ms for the
        # final level alone (tools/bench_decoder_split.py). Splitting lets
        # the aux-level heads dead-code-eliminate in the inference program
        # while training still computes all levels (aux in one batched
        # 5-level matmul). FUTURE_OD_STACKED_HEADS=1 restores the single
        # stacked application (measurement-only A/B knob).
        if os.environ.get("FUTURE_OD_STACKED_HEADS", "0") == "1":
            all_class, all_coord = heads(hs)
            out = {"pred_logits": all_class[-1], "pred_boxes": all_coord[-1]}
            if self.aux_loss:
                out["aux_outputs"] = [
                    {"pred_logits": all_class[i], "pred_boxes": all_coord[i]}
                    for i in range(hs.shape[0] - 1)
                ]
            return out, new_state
        final_class, final_coord = heads(hs[-1])
        out = {"pred_logits": final_class, "pred_boxes": final_coord}
        if self.aux_loss:
            aux_class, aux_coord = heads(hs[:-1])
            out["aux_outputs"] = [
                {"pred_logits": aux_class[i], "pred_boxes": aux_coord[i]}
                for i in range(hs.shape[0] - 1)
            ]
        return out, new_state


class FuturePredCore(nn.Module):
    """The paper's main model (paper.py:432-485): drop the future frame, encode
    the past, predict the future frame's boxes."""

    separate_encoder: SeparateEncoder
    detector: CDetrDetectorSpatioTemporal
    joint_encoder: Optional[nn.Module] = None
    no_temporal_pos: bool = True
    encode_offset: bool = False
    extra_temporal_offset: float = 0.0

    def _pos_enc(self, features, temporal_offsets):
        B, L, h, w, D = features.shape
        return spatio_temporal_encoding(
            L, h, w, D,
            temporal_offsets=temporal_offsets,
            no_temporal=self.no_temporal_pos,
            extra_temporal_offset=self.extra_temporal_offset,
        )

    @nn.compact
    def __call__(self, images, imu=None, temporal_offsets=None, deterministic: bool = True):
        # Drop the last ("future") frame — the model must predict it
        # (paper.py:463-468).
        images = images[:, :-1]
        if imu is not None:
            imu = imu[:, :-1]
        if temporal_offsets is not None:
            temporal_offsets = temporal_offsets[:, :-1]

        features, egodeep = self.separate_encoder(images, imu, deterministic)
        pos_enc = self._pos_enc(features, temporal_offsets)
        if self.joint_encoder is not None:
            features, pos_enc = self.joint_encoder(
                features, pos_enc, egodeep, deterministic
            )
        return self.detector(features, pos_enc, egodeep, deterministic)


class SingleFrameCore(nn.Module):
    """Ablation core (paper.py:488-528): no frame dropping, no joint encoder —
    the detector sees all L frames."""

    separate_encoder: SeparateEncoder
    detector: CDetrDetectorSpatioTemporal
    no_temporal_pos: bool = True
    extra_temporal_offset: float = 0.0

    @nn.compact
    def __call__(self, images, imu=None, temporal_offsets=None, deterministic: bool = True):
        features, egodeep = self.separate_encoder(images, imu, deterministic)
        B, L, h, w, D = features.shape
        pos_enc = spatio_temporal_encoding(
            L, h, w, D,
            temporal_offsets=temporal_offsets,
            no_temporal=self.no_temporal_pos,
            extra_temporal_offset=self.extra_temporal_offset,
        )
        return self.detector(features, pos_enc, egodeep, deterministic)


class TrackerBaselineCore(nn.Module):
    """Tracker baseline core (paper.py:649-706): L=1 -> plain detection
    (training); L=3 -> detect frames 0,1 independently, then the (host-side)
    tracker extrapolates frame 2. The on-device part returns per-frame
    detections; `future_od_tpu.models.tracker.TrackerFuturePredictor` performs
    the assignment+extrapolation on host (it is eval-only and host-bound in
    the reference too, paper.py:549)."""

    separate_encoder: SeparateEncoder
    detector: CDetrDetectorSpatioTemporal
    no_temporal_pos: bool = True

    @nn.compact
    def __call__(self, images, imu=None, temporal_offsets=None, deterministic: bool = True):
        if images.shape[1] > 1:
            # The future frame's detections come from the host-side tracker,
            # so its features are never consumed — skip encoding it (the
            # reference encodes all L frames and discards the last,
            # paper.py:681-699).
            images = images[:, :-1]
            if imu is not None:
                imu = imu[:, :-1]
            if temporal_offsets is not None:
                temporal_offsets = temporal_offsets[:, :-1]
        features, egodeep = self.separate_encoder(images, imu, deterministic)
        B, L, h, w, D = features.shape
        pos_enc = spatio_temporal_encoding(
            L, h, w, D, temporal_offsets=temporal_offsets, no_temporal=self.no_temporal_pos
        )
        if L == 1:
            return self.detector(features, pos_enc, egodeep, deterministic)
        # Per-frame independent detections for the tracker (past frames).
        preds = []
        for l in range(L):
            ego = egodeep[:, l : l + 1] if egodeep is not None else None
            pos_l = pos_enc[l : l + 1] if pos_enc.ndim == 4 else pos_enc[:, l : l + 1]
            preds.append(
                self.detector(features[:, l : l + 1], pos_l, ego, deterministic)
            )
        return {"per_frame_preds": preds}
