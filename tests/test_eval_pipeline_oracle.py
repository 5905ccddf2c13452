"""Eval-PIPELINE-level torch oracle: trainer.eval() AP table vs the same
weights driven through the torch re-implementation + an independent
reference-semantics AP computation (VERDICT r4 #6).

The per-module oracles (backbone / attention / stacks / full model) pin the
forward; test_od_map pins prepare/aggregate against a brute-force oracle.
This test closes the remaining seam: the full chain
model -> post_process -> per-batch AP intermediaries -> cross-batch
accumulation -> AP aggregation, as ACTUALLY COMPOSED by Trainer.eval(), must
produce the same AP table as the torch model + a plain-numpy replay of the
reference's post-proc and AP semantics
(/root/reference/future_od/models/st_detr.py:190-234,
/root/reference/future_od/utils/od_map.py:214-364).

Catches what the piecewise oracles cannot: annotated-frame selection drift,
pixel-coordinate convention drift in post-proc, accumulation-axis mistakes,
and any trainer-side reordering of the intermediaries.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from test_backbone_torch_oracle import torch_resnet_forward
from test_full_model_torch_oracle import encoder_stack, flax_body_to_sd
from test_od_map import brute_force_prepare
from test_stack_torch_oracle import decoder_stack, inverse_sigmoid, lin, mlp, t

from future_od_tpu.data.loader import Loader, VAL_SEED
from future_od_tpu.data.synthetic import CATEGORY_DICT, SyntheticClipDataset
from future_od_tpu.models.build import build_flagship
from future_od_tpu.models.st_detr import SpatioTemporalDETRArgs
from future_od_tpu.ops.posenc import spatial_encoding, spatio_temporal_encoding
from future_od_tpu.train.trainer import Trainer
from future_od_tpu.utils.wandb import WandBConfig

D, HEADS = 32, 4
TINY = dict(
    num_classes=2, num_queries=12, hidden_dim=D, enc_layers=1, dec_layers=2,
    dim_feedforward=64, enc_nheads=HEADS, nheads=HEADS, lr=1e-4,
    lr_backbone=1e-4, dropout=0.0,
)


def torch_flagship_forward(params, frozen, batch, num_classes, M, enc_layers,
                           dec_layers):
    """The flagship forward in torch, assembled from the per-stage oracles
    (same composition as test_full_model_torch_oracle, parameterized and
    driven from a LOADER batch dict exactly as SpatioTemporalDETR preps it:
    imu = concat(translation, acceleration, rotation, rotation_rate, speed),
    FuturePredCore drops the future frame). Returns (logits, boxes) numpy,
    final decoder level only."""
    sep = params["core"]["separate_encoder"]
    det = params["core"]["detector"]
    video = np.asarray(batch["video"], np.float32)  # (B, L, H, W, 3)
    B, L_in, H_img, W_img, _ = video.shape
    imu = np.concatenate(
        [
            np.asarray(batch[k], np.float32)
            for k in ("translation", "acceleration", "rotation",
                      "rotation_rate", "speed")
        ],
        axis=2,
    )
    sd = flax_body_to_sd(
        sep["backbone"]["body"],
        frozen["core"]["separate_encoder"]["backbone"]["body"],
    )
    past = video[:, :-1]  # FuturePredCore drops the future frame
    L = L_in - 1
    folded = torch.from_numpy(
        np.ascontiguousarray(
            past.reshape(B * L, H_img, W_img, 3).transpose(0, 3, 1, 2)
        )
    )
    with torch.no_grad():
        trunk = torch_resnet_forward(folded, sd)["layer4"]
        proj_w = t(
            np.asarray(sep["backbone"]["input_proj"]["kernel"]).transpose(3, 2, 0, 1)
        )
        proj_b = t(np.asarray(sep["backbone"]["input_proj"]["bias"]))
        feats = F.conv2d(trunk, proj_w, proj_b)  # (B*L, D, h, w)
        _, _, h, w = feats.shape
        tokens = feats.permute(0, 2, 3, 1).reshape(B * L, h * w, D)

        imu_past = t(imu[:, :-1])
        ego = lin(
            F.relu(lin(imu_past, sep["imu_layers"]["fc1"])), sep["imu_layers"]["fc2"]
        )  # (B, L, D)

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
            imgs = [frame] + state_imgs  # num_images=2 memory
            img_pos = [fpos for _ in imgs]
            hs, ref = decoder_stack(
                det["decoder"], dec_layers, zeros, query_pos, imgs, img_pos,
                ego[:, l : l + 1], HEADS, D, first_layer_special=True,
            )
            state_imgs = imgs[:1]
        deltas = mlp(hs, det["bbox_embed"], 3)
        coords = torch.sigmoid(
            torch.cat(
                [deltas[..., :2] + inverse_sigmoid(ref).unsqueeze(0),
                 deltas[..., 2:]],
                dim=-1,
            )
        )
        cls = lin(hs, det["class_embed"])
    return cls[-1].numpy(), coords[-1].numpy()


def reference_ap_aggregate(confs, is_pos, size_cats, num_annos):
    """Plain-loop replay of the reference's AP aggregation
    (od_map.py:290-364): per (threshold, class, size) sort all accumulated
    objects by confidence, precision at rank k counts only in-size objects,
    AP = sum over positives of precision / num_annos. Independent of
    metrics/od_map.py (no jax)."""
    T, C, Nobj = confs.shape
    S = size_cats.shape[1]
    ap = np.full((T, C, S), np.nan, np.float64)
    for t_idx in range(T):
        for c in range(C):
            order = np.argsort(-confs[t_idx, c], kind="stable")
            for s in range(S):
                if num_annos[c, s] == 0:
                    continue
                tp = 0
                seen = 0
                total = 0.0
                for obj in order:
                    if not size_cats[c, s, obj]:
                        continue
                    seen += 1
                    if is_pos[t_idx, c, obj] and size_cats[c, s, obj]:
                        tp += 1
                        total += tp / seen
                ap[t_idx, c, s] = total / num_annos[c, s]
    return ap


@pytest.mark.slow
class TestEvalPipelineOracle:
    def test_trainer_eval_ap_table_matches_torch_oracle(self, tmp_path):
        B, n_val = 2, 4
        args = SpatioTemporalDETRArgs(**TINY)
        model = build_flagship(args)
        val_ds = SyntheticClipDataset(
            num_samples=n_val, image_size=(64, 96), max_objects=3, seed=11
        )
        trainer = Trainer(
            model=model,
            detr_args=args,
            train_loader=Loader(val_ds, batch_size=B, shuffle=True, num_workers=0),
            val_loaders={
                "val0": Loader(
                    val_ds, batch_size=B, shuffle=False, seed=VAL_SEED,
                    num_workers=0,
                )
            },
            checkpoint_path=str(tmp_path / "ckpt"),
            visualization_path=str(tmp_path / "vis"),
            save_name="oracle_eval",
            category_dict=CATEGORY_DICT,
            lr_func=lambda e: 1.0,
            print_interval=100,
            wandb_config=WandBConfig(enabled=False),
        )

        # Randomize the zero-initialized bbox delta head and jitter the frozen
        # BN stats (as in the full-model oracle) so predictions spread out —
        # wiring errors cannot hide behind identical boxes / flat scores.
        rng = np.random.default_rng(7)
        params = jax.device_get(trainer.state.params)
        frozen = jax.device_get(trainer.state.frozen)
        last = f"layer{3 - 1}"
        params["core"]["detector"]["bbox_embed"][last] = {
            "kernel": rng.normal(0, 0.2, (D, 4)).astype(np.float32),
            "bias": rng.normal(0, 0.3, (4,)).astype(np.float32),
        }
        params["core"]["detector"]["class_embed"] = {
            "kernel": rng.normal(0, 0.5, (D, args.num_classes)).astype(np.float32),
            "bias": rng.normal(-2.0, 1.0, (args.num_classes,)).astype(np.float32),
        }

        def jitter(tree):
            if isinstance(tree, dict):
                return {k: jitter(v) for k, v in tree.items()}
            return tree + rng.normal(0, 0.05, tree.shape).astype(np.float32)

        frozen = jitter(frozen)
        trainer.state = trainer.state._replace(params=params, frozen=frozen)

        # ---- arm 1: the shipped pipeline, exactly as the product runs it ----
        trainer.eval()
        ap_flax = trainer._ap_by_mode["val0"]

        # ---- arm 2: torch oracle model + reference-semantics AP, numpy ----
        M = args.num_queries
        K = min(50, M)
        parts = {"confs": [], "is_pos": [], "size_cats": [], "num_annos": []}
        for batch in Loader(
            val_ds, batch_size=B, shuffle=False, seed=VAL_SEED, num_workers=0
        ):
            logits, boxes_cxcywh = torch_flagship_forward(
                params, frozen, batch, args.num_classes, M,
                args.enc_layers, args.dec_layers,
            )
            # reference post-proc (st_detr.py:190-234): sigmoid scores +
            # appended generic class (max over classes), cxcywh [0,1] ->
            # pixel xyxy
            H_img, W_img = batch["video"].shape[2], batch["video"].shape[3]
            scores = 1.0 / (1.0 + np.exp(-logits))
            scores = np.concatenate(
                [scores, scores.max(axis=2, keepdims=True)], axis=2
            )
            bx = boxes_cxcywh * np.array([W_img, H_img, W_img, H_img], np.float32)
            bx = np.concatenate(
                [bx[..., 0:2] - 0.5 * bx[..., 2:4], bx[..., 0:2] + 0.5 * bx[..., 2:4]],
                axis=-1,
            )
            confs, is_pos, size_cats, num_annos = brute_force_prepare(
                bx, scores,
                np.asarray(batch["boxes"], np.float32),
                np.asarray(batch["classes"]),
                np.asarray(batch["active"]),
                (H_img, W_img), K=K,
            )
            parts["confs"].append(confs)
            parts["is_pos"].append(is_pos)
            parts["size_cats"].append(size_cats)
            parts["num_annos"].append(num_annos)

        ap_ref = reference_ap_aggregate(
            np.concatenate(parts["confs"], axis=2),
            np.concatenate(parts["is_pos"], axis=2),
            np.concatenate(parts["size_cats"], axis=2),
            np.sum(parts["num_annos"], axis=0),
        )

        # ap_flax["all"] is (T, C-1, S) (real classes); generic is the last
        # class row of the oracle table
        np.testing.assert_allclose(
            ap_flax["all"], ap_ref[:, :-1, :], atol=2e-3,
            err_msg="per-class AP table diverged between the shipped eval "
                    "pipeline and the torch+numpy reference replay",
        )
        np.testing.assert_allclose(
            ap_flax["generic"], ap_ref[:, -1, :], atol=2e-3,
            err_msg="generic-objectness AP diverged",
        )
        # sanity: the case must be non-degenerate (some positives somewhere)
        assert np.nanmax(ap_ref) > 0.0
