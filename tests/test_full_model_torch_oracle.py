"""Whole-flagship forward parity against the assembled torch oracle.

The final piece of SURVEY §7 hard part 4: a single tiny FuturePredCore
forward — ResNet-50 backbone + input proj + IMU MLP + egodeep encoder +
recurrent conditional decoder — compared end-to-end against the torch
re-implementation assembled from the per-stage oracles
(test_backbone_torch_oracle.py for the trunk, test_stack_torch_oracle.py for
the transformer stacks). Catches cross-module wiring drift (frame dropping,
token folding/reshapes, egodeep routing, pos-enc plumbing) that per-module
oracles cannot see.

Reference composition: /root/reference/future_od/models/paper.py:432-485
(FuturePredCore) over the flagship layout of /root/reference/runs/_model.py.
"""
import numpy as np

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from test_backbone_torch_oracle import STAGE_BLOCKS, torch_resnet_forward
from test_stack_torch_oracle import (
    decoder_stack,
    egodeep_attn,
    enc_attention,
    inverse_sigmoid,
    lin,
    ln,
    mlp,
    t,
)

from future_od_tpu.models.cores import (
    CDetrDetectorSpatioTemporal,
    FuturePredCore,
    SeparateEncoder,
)
from future_od_tpu.ops.posenc import spatial_encoding, spatio_temporal_encoding

D, HEADS = 32, 4


def flax_body_to_sd(params, frozen):
    """Inverse of utils/torch_port: flax body params/frozen -> torchvision-
    named state_dict consumed by the functional torch resnet forward."""
    sd = {}

    def conv(name, sub):
        sd[name + ".weight"] = t(np.asarray(sub["kernel"]).transpose(3, 2, 0, 1))

    def bn(name, sub):
        for k in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{name}.{k}"] = t(np.asarray(sub[k]))

    conv("conv1", params["conv1"])
    bn("bn1", frozen["bn1"])
    for stage, num_blocks in STAGE_BLOCKS.items():
        for b in range(num_blocks):
            ours, theirs = f"layer{stage}_block{b}", f"layer{stage}.{b}"
            for ci in (1, 2, 3):
                conv(f"{theirs}.conv{ci}", params[ours][f"conv{ci}"])
                bn(f"{theirs}.bn{ci}", frozen[ours][f"bn{ci}"])
            if "downsample_conv" in params[ours]:
                conv(f"{theirs}.downsample.0", params[ours]["downsample_conv"])
                bn(f"{theirs}.downsample.1", frozen[ours]["downsample_bn"])
    return sd


def encoder_stack(p, num_layers, tokens, pos, ego):
    for i in range(num_layers):
        lp = p[f"layer{i}"]
        x = enc_attention(lp["self_attn"], tokens, tokens + pos, tokens + pos, tokens, HEADS)
        new = egodeep_attn(lp["egodeep_attend"], x, pos, ego, HEADS, with_post=True)
        tokens = ln(x + new, lp["norm_eda"])
    return tokens


class TestFullModelOracle:
    def test_flagship_forward(self):
        rng = np.random.default_rng(7)
        B, L_in, H_img, W_img = 1, 3, 64, 96
        M, dec_layers, enc_layers = 5, 2, 2

        core = FuturePredCore(
            separate_encoder=SeparateEncoder(
                hidden_dim=D, enc_layers=enc_layers, enc_heads=HEADS,
                ff_dim=48, dropout=0.0, use_egodeep=True,
            ),
            detector=CDetrDetectorSpatioTemporal(
                num_classes=4, hidden_dim=D, num_queries=M,
                dec_layers=dec_layers, dec_heads=HEADS, ff_dim=48, dropout=0.0,
                num_images=2, use_egodeep=True, first_layer_special_when="always",
            ),
            no_temporal_pos=True,
        )
        images = jnp.asarray(rng.normal(0, 1, (B, L_in, H_img, W_img, 3)).astype(np.float32))
        imu = jnp.asarray(rng.normal(0, 1, (B, L_in, 14)).astype(np.float32))
        variables = core.init(jax.random.key(0), images, imu)

        # randomize the zero-initialized bbox head (paper.py:312-313) so head
        # wiring errors cannot hide, and use non-identity frozen BN stats
        params = jax.device_get(variables["params"])
        frozen = jax.device_get(variables["frozen"])
        last = f"layer2"
        params["detector"]["bbox_embed"][last] = {
            "kernel": rng.normal(0, 0.1, (D, 4)).astype(np.float32),
            "bias": rng.normal(0, 0.1, (4,)).astype(np.float32),
        }

        def jitter_bn(tree):
            if isinstance(tree, dict):
                return {k: jitter_bn(v) for k, v in tree.items()}
            return tree + rng.normal(0, 0.05, tree.shape).astype(np.float32)

        frozen = jitter_bn(frozen)
        variables = {"params": params, "frozen": frozen}
        out = core.apply(variables, images, imu)

        # ---- torch oracle ----
        sep = params["separate_encoder"]
        det = params["detector"]
        sd = flax_body_to_sd(
            sep["backbone"]["body"], frozen["separate_encoder"]["backbone"]["body"]
        )
        # FuturePredCore drops the future frame (paper.py:463-468)
        past = np.asarray(images)[:, :-1]
        L = L_in - 1
        folded = torch.from_numpy(
            past.reshape(B * L, H_img, W_img, 3).transpose(0, 3, 1, 2)
        )
        with torch.no_grad():
            trunk = torch_resnet_forward(folded, sd)["layer4"]
            proj_w = t(np.asarray(sep["backbone"]["input_proj"]["kernel"]).transpose(3, 2, 0, 1))
            proj_b = t(np.asarray(sep["backbone"]["input_proj"]["bias"]))
            feats = F.conv2d(trunk, proj_w, proj_b)  # (B*L, D, h, w)
            _, _, h, w = feats.shape
            tokens = feats.permute(0, 2, 3, 1).reshape(B * L, h * w, D)

            imu_past = t(np.asarray(imu)[:, :-1])
            ego = lin(F.relu(lin(imu_past, sep["imu_layers"]["fc1"])), sep["imu_layers"]["fc2"])

            enc_pos = t(np.asarray(spatial_encoding(h, w, D))).reshape(1, h * w, D)
            tokens = encoder_stack(
                sep["transformer"], enc_layers, tokens, enc_pos,
                ego.reshape(B * L, 1, D),
            )

            det_pos = np.asarray(
                spatio_temporal_encoding(L, h, w, D, no_temporal=True)
            )
            pos_np = np.broadcast_to(det_pos[None], (B, L, h, w, D))
            query_pos = t(det["query_embed"]["embedding"]).unsqueeze(0).expand(B, M, D)
            zeros = torch.zeros(B, M, D)
            frames = tokens.reshape(B, L, h * w, D)
            state_imgs = []
            for l in range(L):
                frame = frames[:, l]
                fpos = t(pos_np[:, l].reshape(B, h * w, D).copy())
                imgs = [frame] + state_imgs
                img_pos = [fpos for _ in imgs]
                hs, ref = decoder_stack(
                    det["decoder"], dec_layers, zeros, query_pos, imgs, img_pos,
                    ego[:, l : l + 1], HEADS, D, first_layer_special=True,
                )
                state_imgs = imgs[:1]
            deltas = mlp(hs, det["bbox_embed"], 3)
            coords = torch.sigmoid(
                torch.cat(
                    [deltas[..., :2] + inverse_sigmoid(ref).unsqueeze(0), deltas[..., 2:]],
                    dim=-1,
                )
            )
            cls = lin(hs, det["class_embed"])

        # the 50-layer trunk + 2 encoder + 2x2 decoder passes accumulate f32
        # reassociation noise; wiring errors show as O(0.1+)
        np.testing.assert_allclose(
            np.asarray(out["pred_logits"]), cls[-1].numpy(), atol=3e-3
        )
        np.testing.assert_allclose(
            np.asarray(out["pred_boxes"]), coords[-1].numpy(), atol=3e-3
        )
