"""Inference demo: run the flagship model on one clip, draw the predicted
future boxes, and dump per-object decoder attention maps over the past frames.

TPU-native equivalent of the reference's `demo.ipynb` (cells 2-11): instead of
toggling `store_attention` module state, attention maps come out of flax's
"intermediates" collection, captured in the same jitted forward.

Usage:
    python demo.py [--checkpoint checkpoints/<name>_final] [--synthetic]
                   [--out visualization/demo]
"""
from __future__ import annotations

import argparse
import os

import numpy as np

import jax
import jax.numpy as jnp

from future_od_tpu.data.loader import collate
from future_od_tpu.data.synthetic import CATEGORY_DICT, SyntheticClipDataset
from future_od_tpu.models.build import build_flagship
from future_od_tpu.models.st_detr import (
    SpatioTemporalDETRArgs,
    normalize_outputs,
    post_process,
)
from future_od_tpu.utils.checkpoint import load_checkpoint
from future_od_tpu.utils.visualization import visualize


def main():
    from future_od_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--synthetic", action="store_true", default=True)
    parser.add_argument("--out", default="visualization/demo")
    parser.add_argument("--score_threshold", type=float, default=0.3)
    parser.add_argument("--num_classes", type=int, default=None)
    args = parser.parse_args()

    num_classes = args.num_classes or len(CATEGORY_DICT)
    # demo the architecture the checkpoint was trained with (meta sidecar,
    # as runs/serve.py); CLI defaults apply to random-init runs only
    meta = None
    if args.checkpoint:
        from future_od_tpu.utils.checkpoint import load_checkpoint_meta

        meta = load_checkpoint_meta(
            os.path.dirname(args.checkpoint) or ".",
            os.path.basename(args.checkpoint),
        )
    if meta and meta.get("detr_args"):
        import dataclasses

        fields = {f.name for f in dataclasses.fields(SpatioTemporalDETRArgs)}
        detr_args = SpatioTemporalDETRArgs(
            **{k: v for k, v in meta["detr_args"].items() if k in fields}
        )
        print("model architecture from checkpoint meta")
    else:
        detr_args = SpatioTemporalDETRArgs(
            num_classes=num_classes, num_queries=128, lr_backbone=1e-4
        )
    model = build_flagship(detr_args, store_attention=True)

    ds = SyntheticClipDataset(num_samples=1, image_size=(256, 448), seed=11)
    batch = collate([ds[0]])
    data = {
        k: jnp.asarray(v)
        for k, v in batch.items()
        if not isinstance(v, list)
    }

    variables = jax.jit(
        lambda k: model.init({"params": k}, data, deterministic=True)
    )(jax.random.key(0))
    if args.checkpoint:
        ckpt_dir = os.path.dirname(args.checkpoint) or "."
        name = os.path.basename(args.checkpoint)
        restored = load_checkpoint(
            ckpt_dir, name,
            target={"params": variables["params"], "frozen": variables["frozen"]},
        )
        assert restored is not None, f"checkpoint not found: {args.checkpoint}"
        arrays, _ = restored
        variables = {"params": arrays["params"], "frozen": arrays["frozen"]}
        print(f"loaded {args.checkpoint}")

    @jax.jit
    def forward(variables, data):
        out, mutated = model.apply(
            variables, data, deterministic=True, mutable=["intermediates"]
        )
        return out, mutated["intermediates"]

    out, intermediates = forward(variables, data)
    annotated, pred_logits, pred_boxes = normalize_outputs(out, data)
    output, anno_scores, anno_boxes = post_process(pred_logits, pred_boxes, data)

    os.makedirs(args.out, exist_ok=True)
    scores = np.asarray(anno_scores[0, :, :-1])  # drop generic class
    boxes = np.asarray(anno_boxes[0])
    video = np.asarray(data["video"][0])
    L = video.shape[0]

    # Predicted future boxes over the (unseen) future frame.
    visualize(
        video[-1], scores, boxes,
        os.path.join(args.out, "future_predictions.png"),
        background_class=scores.shape[-1],
        score_threshold=args.score_threshold,
    )
    # Past frames for context.
    for l in range(L - 1):
        visualize(
            video[l], None, None,
            os.path.join(args.out, f"past_frame_{l}.png"), 0,
        )

    # Attention maps: for each confident object, the final decoder layer's
    # attention over each remembered frame's tokens (demo.ipynb cells 8-11).
    conf = scores.max(-1)
    top = np.argsort(-conf)[:4]
    h = w = None
    # feature map geometry: stride-32 backbone
    H, W = video.shape[1:3]
    h, w = H // 32, W // 32

    def find_attn(tree, path=""):
        """Collect sowed attention weights with their module paths."""
        found = {}
        if isinstance(tree, dict):
            for key, val in tree.items():
                sub = f"{path}/{key}" if path else key
                if key == "attention_weights":
                    found[path] = val
                else:
                    found.update(find_attn(val, sub))
        return found

    attn_maps = find_attn(intermediates)
    last_layer = sorted(k for k in attn_maps if "image_attend" in k)
    for key in last_layer:
        sows = attn_maps[key]  # tuple: one entry per decoder invocation (frame)
        for frame_idx, weights in enumerate(sows):
            weights = np.asarray(weights)  # (B, M, N_tokens)
            if weights.shape[-1] != h * w:
                continue
            for rank, q in enumerate(top):
                amap = weights[0, q].reshape(h, w)
                amap = amap / (amap.max() + 1e-8)
                img = (np.kron(amap, np.ones((8, 8))) * 255).astype(np.uint8)
                import cv2

                name = key.replace("/", "_")
                cv2.imwrite(
                    os.path.join(
                        args.out, f"attn_{name}_call{frame_idx}_obj{rank}.png"
                    ),
                    cv2.applyColorMap(img, cv2.COLORMAP_VIRIDIS),
                )
    print(f"wrote demo outputs to {args.out}")
    kept = (conf >= args.score_threshold).sum()
    print(f"{kept} objects above threshold {args.score_threshold}")


if __name__ == "__main__":
    main()
