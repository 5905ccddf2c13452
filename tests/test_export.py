"""AOT serving export (serve/export.py): the serialized StableHLO artifact
reloads without the model code and reproduces the live jitted program."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from future_od_tpu.models.build import build_flagship
from future_od_tpu.models.st_detr import SpatioTemporalDETRArgs
from future_od_tpu.serve import (
    export_inference,
    export_streaming,
    load_serving,
)
from future_od_tpu.train.step import make_inference_fn


def tiny_args(**kw):
    return SpatioTemporalDETRArgs(
        num_classes=3, num_queries=8, hidden_dim=32, nheads=2, enc_nheads=2,
        dim_feedforward=64, enc_layers=1, dec_layers=2, lr_backbone=1e-4,
        **kw,
    )


def make_data(rng, B, L, H, W):
    data = {
        "video": jnp.asarray(
            rng.normal(size=(B, L, H, W, 3)).astype(np.float32)
        ),
        "annotated_frame_idx": jnp.asarray([L - 1] * B),
    }
    for key, d in [
        ("translation", 3), ("acceleration", 3), ("rotation", 4),
        ("rotation_rate", 3), ("speed", 1),
    ]:
        data[key] = jnp.asarray(
            rng.normal(size=(B, L, d)).astype(np.float32)
        )
    return data


@pytest.fixture(scope="module")
def tiny_model():
    rng = np.random.default_rng(0)
    B, L, H, W = 2, 3, 64, 96
    model = build_flagship(tiny_args())
    data = make_data(rng, B, L, H, W)
    variables = model.init(
        {"params": jax.random.key(0)}, data, deterministic=True
    )
    return model, variables, data


def test_export_inference_roundtrip(tiny_model, tmp_path):
    model, variables, data = tiny_model
    path = tmp_path / "infer.stablehlo"
    export_inference(
        model, variables, data, platforms=("cpu",), path=str(path)
    )
    served = load_serving(str(path))

    live = jax.jit(make_inference_fn(model))(variables, data)
    aot = served(variables, data)
    assert set(live.keys()) == set(aot.keys())
    for k in live:
        np.testing.assert_allclose(
            np.asarray(live[k]), np.asarray(aot[k]), rtol=1e-5, atol=1e-5
        )


def test_export_enforces_shapes(tiny_model):
    model, variables, data = tiny_model
    blob = export_inference(model, variables, data, platforms=("cpu",))
    served = load_serving(blob)
    bad = dict(data)
    bad["video"] = data["video"][:, :, :32]  # wrong H
    with pytest.raises(ValueError):
        served(variables, bad)


def test_export_multi_platform_blob(tiny_model):
    # a CPU release host can lower the TPU serving program AOT
    model, variables, data = tiny_model
    blob = export_inference(
        model, variables, data, platforms=("tpu", "cpu")
    )
    served = load_serving(blob)  # still callable on the cpu test platform
    out = served(variables, data)
    assert np.isfinite(np.asarray(out["boxes"])).all()


def test_export_streaming_pair(tiny_model):
    model, variables, data = tiny_model
    B, L, H, W = data["video"].shape[0], 3, 64, 96
    frame = {k: v[:, 0] for k, v in data.items()
             if k != "annotated_frame_idx"}
    enc_blob, det_blob = export_streaming(
        model, variables, frame, clip_frames=L, platforms=("cpu",)
    )
    encode = load_serving(enc_blob)
    detect = load_serving(det_blob)

    from future_od_tpu.serve import make_streaming_fns

    live_encode, live_detect = make_streaming_fns(
        model, clip_frames=L, image_hw=(H, W)
    )
    feats_frames, egos = [], []
    for t in range(L - 1):
        f = {k: data[k][:, t] for k in frame}
        got_f, got_e = encode(variables, f)
        want_f, want_e = live_encode(variables, f)
        np.testing.assert_allclose(
            np.asarray(got_f), np.asarray(want_f), rtol=1e-5, atol=1e-5
        )
        feats_frames.append(got_f)
        egos.append(got_e)

    features = jnp.stack(feats_frames, axis=1)
    egodeep = None if egos[0] is None else jnp.stack(egos, axis=1)
    offsets = jnp.zeros((B, L - 1), features.dtype)
    aot = detect(variables, features, egodeep, offsets)
    live = live_detect(variables, features, egodeep, offsets)
    for k in live:
        np.testing.assert_allclose(
            np.asarray(live[k]), np.asarray(aot[k]), rtol=1e-5, atol=1e-5
        )


def test_export_int8_backbone_roundtrip(tmp_path):
    # the int8 PTQ program (ops/quant.py) must export/reload like the float
    # one — quantize ops and int32-accumulation convs are plain StableHLO
    rng = np.random.default_rng(3)
    model = build_flagship(tiny_args(int8_backbone=True))
    data = make_data(rng, 1, 3, 64, 96)
    variables = model.init(
        {"params": jax.random.key(0)}, data, deterministic=True
    )
    path = tmp_path / "infer_int8.stablehlo"
    export_inference(
        model, variables, data, platforms=("cpu",), path=str(path)
    )
    served = load_serving(str(path))
    live = jax.jit(make_inference_fn(model))(variables, data)
    aot = served(variables, data)
    for k in live:
        np.testing.assert_allclose(
            np.asarray(live[k]), np.asarray(aot[k]), rtol=1e-5, atol=1e-5
        )
