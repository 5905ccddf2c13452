"""Full-model reference-checkpoint conversion test.

Fabricates a reference-shaped `state_dict` (torch layouts: Linear (out,in),
conv OIHW, packed MHA in_proj) for the tiny flagship config, converts it, and
checks structure, shapes, and the layout transposes leaf-by-leaf.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from future_od_tpu.models.build import build_flagship
from future_od_tpu.models.st_detr import SpatioTemporalDETRArgs
from future_od_tpu.utils.checkpoint_convert import convert_reference_checkpoint

TINY = dict(
    num_classes=8, num_queries=16, hidden_dim=32, enc_layers=2, dec_layers=2,
    dim_feedforward=64, enc_nheads=4, nheads=4,
)


def fabricate_reference_state_dict(rng, D=32, Dff=64, enc_layers=2, dec_layers=2,
                                   num_images=2, num_queries=16, num_classes=8):
    sd = {}

    def lin(prefix, out_d, in_d):
        sd[f"{prefix}.weight"] = rng.normal(size=(out_d, in_d)).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.normal(size=(out_d,)).astype(np.float32)

    def ln(prefix, d=None):
        d = d or D
        sd[f"{prefix}.weight"] = rng.normal(size=(d,)).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.normal(size=(d,)).astype(np.float32)

    def mha(prefix, d=None):
        d = d or D
        sd[f"{prefix}.in_proj_weight"] = rng.normal(size=(3 * d, d)).astype(np.float32)
        sd[f"{prefix}.in_proj_bias"] = rng.normal(size=(3 * d,)).astype(np.float32)
        lin(f"{prefix}.out_proj", d, d)

    def enc_attention(prefix):
        mha(f"{prefix}.attn")
        ln(f"{prefix}.norm1")
        ln(f"{prefix}.norm2")
        lin(f"{prefix}.mlp.0", Dff, D)
        lin(f"{prefix}.mlp.3", D, Dff)

    def slot_attention(prefix, query_pos=True, query_sine=False):
        for name in ["query_content", "key_content", "key_pos", "value"]:
            lin(f"{prefix}.{name}", D, D)
        if query_pos:
            lin(f"{prefix}.query_pos", D, D)
        if query_sine:
            lin(f"{prefix}.query_sine", D, D)
        lin(f"{prefix}.fun.out_proj", D, D)

    def egodeep(prefix, with_mlp):
        for name in ["query_content", "query_pos", "key", "value"]:
            lin(f"{prefix}.{name}", D, D)
        lin(f"{prefix}.fun.out_proj", D, D)
        if with_mlp:
            ln(f"{prefix}.norm1")
            ln(f"{prefix}.norm2")
            lin(f"{prefix}.mlp.0", Dff, D)
            lin(f"{prefix}.mlp.3", D, Dff)

    # torchvision resnet50 body
    import tests.test_torch_port as ttp

    for k, v in ttp.fake_torchvision_state_dict(rng).items():
        sd[f"_model.separate_encoder.backbone.body.{k}"] = v
    # input proj conv 1x1 (OIHW)
    sd["_model.separate_encoder.backbone.input_proj.weight"] = rng.normal(
        size=(D, 2048, 1, 1)
    ).astype(np.float32)
    sd["_model.separate_encoder.backbone.input_proj.bias"] = rng.normal(
        size=(D,)
    ).astype(np.float32)
    # imu mlp
    lin("_model.separate_encoder.imu_layers.0", 128, 14)
    lin("_model.separate_encoder.imu_layers.2", D, 128)
    # encoder layers
    for i in range(enc_layers):
        p = f"_model.separate_encoder.transformer.layers.{i}"
        enc_attention(f"{p}.self_attn")
        egodeep(f"{p}.egodeep_attend", with_mlp=True)
        ln(f"{p}.norm_eda")
    # detector heads
    lin("_model.detector.class_embed", num_classes, D)
    for li, (od, idim) in enumerate([(D, D), (D, D), (4, D)]):
        lin(f"_model.detector.bbox_embed.layers.{li}", od, idim)
    sd["_model.detector.query_embed.weight"] = rng.normal(
        size=(num_queries, D)
    ).astype(np.float32)
    # decoder
    dec = "_model.detector.decoder"
    for li, (od, idim) in enumerate([(D, D), (D, D)]):
        lin(f"{dec}.query_scale.layers.{li}", od, idim)
    for li, (od, idim) in enumerate([(D, D), (2, D)]):
        lin(f"{dec}.ref_point_head.layers.{li}", od, idim)
    ln(f"{dec}.norm")
    for i in range(dec_layers):
        p = f"{dec}.layers.{i}"
        slot_attention(f"{p}.self_attend")
        ln(f"{p}.norm_sa")
        for j in range(num_images):
            slot_attention(
                f"{p}.image_attend.{j}", query_pos=(i == 0), query_sine=True
            )
            ln(f"{p}.norm_ia.{j}")
        egodeep(f"{p}.egodeep_attend", with_mlp=False)
        ln(f"{p}.norm_eda")
        lin(f"{p}.feedforward.0", Dff, D)
        lin(f"{p}.feedforward.3", D, Dff)
        ln(f"{p}.norm_out")
    return sd


class TestReferenceCheckpointConvert:
    def test_full_conversion(self, rng):
        args = SpatioTemporalDETRArgs(**TINY)
        model = build_flagship(args)
        import tests.test_models as tm

        data = tm.make_data(np.random.default_rng(0))
        variables = model.init({"params": jax.random.key(0)}, data)
        sd = fabricate_reference_state_dict(rng)
        new_vars = convert_reference_checkpoint(sd, variables, dim=32)

        # spot-check layout transposes
        np.testing.assert_allclose(
            new_vars["params"]["core"]["detector"]["class_embed"]["kernel"],
            sd["_model.detector.class_embed.weight"].T,
        )
        enc0 = new_vars["params"]["core"]["separate_encoder"]["transformer"]["layer0"]
        np.testing.assert_allclose(
            enc0["self_attn"]["attn"]["q_proj"]["kernel"],
            sd["_model.separate_encoder.transformer.layers.0.self_attn.attn.in_proj_weight"][:32].T,
        )
        np.testing.assert_allclose(
            new_vars["params"]["core"]["separate_encoder"]["backbone"]["input_proj"]["kernel"],
            sd["_model.separate_encoder.backbone.input_proj.weight"].transpose(2, 3, 1, 0),
        )
        # layer >= 1 image attention has no query_pos (deleted in the reference)
        dec1 = new_vars["params"]["core"]["detector"]["decoder"]["layer1"]
        assert "query_pos" not in dec1["image_attend0"]

        # the model must run with converted weights
        out = model.apply(
            {"params": new_vars["params"], "frozen": new_vars["frozen"]},
            data, deterministic=True,
        )
        assert np.isfinite(np.asarray(out["pred_boxes"])).all()


class TestTrainerPthLoading:
    def test_trainer_loads_reference_pth_tar(self, tmp_path, rng):
        import torch

        from future_od_tpu.data.loader import Loader
        from future_od_tpu.data.synthetic import CATEGORY_DICT, SyntheticClipDataset
        from future_od_tpu.train.trainer import Trainer
        from future_od_tpu.utils.wandb import WandBConfig

        sd = fabricate_reference_state_dict(np.random.default_rng(1))
        blob = {"net": {k: torch.from_numpy(v) for k, v in sd.items()}, "epoch": 7}
        path = tmp_path / "ref_ckpt.pth.tar"
        torch.save(blob, path)

        args = SpatioTemporalDETRArgs(**{**TINY, "num_classes": 8})
        model = build_flagship(args)
        ds = SyntheticClipDataset(num_samples=4, image_size=(64, 96), num_classes=2)
        trainer = Trainer(
            model=model,
            detr_args=args,
            train_loader=Loader(ds, batch_size=2, num_workers=1),
            val_loaders={"val0": Loader(ds, batch_size=2, num_workers=1)},
            checkpoint_path=str(tmp_path),
            visualization_path=str(tmp_path),
            save_name="x",
            category_dict=CATEGORY_DICT,
            checkpoint_epochs=False,
            wandb_config=WandBConfig(enabled=False),
        )
        trainer.load_checkpoint(str(path), load_only_net=True)
        got = np.asarray(
            trainer.state.params["core"]["detector"]["class_embed"]["kernel"]
        )
        np.testing.assert_allclose(got, sd["_model.detector.class_embed.weight"].T)
