"""Streaming serving path == batch inference (serve/streaming.py): same math,
identical up to XLA reassociation across the different fold shapes."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from future_od_tpu.models.build import build_flagship
from future_od_tpu.models.st_detr import SpatioTemporalDETRArgs
from future_od_tpu.serve import StreamingSession
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
    data["temporal_offsets"] = jnp.asarray(
        np.tile(np.linspace(-0.5 * (L - 1), 0, L, dtype=np.float32), (B, 1))
    )
    return data


@pytest.mark.parametrize("encode_offset", [False, True])
def test_streaming_matches_batch_infer(encode_offset):
    rng = np.random.default_rng(0)
    B, L, H, W = 2, 3, 64, 96
    args = tiny_args(encode_offset=encode_offset)
    model = build_flagship(args)
    data = make_data(rng, B, L, H, W)
    variables = model.init(
        {"params": jax.random.key(0)}, data, deterministic=True
    )

    batch_out = jax.jit(make_inference_fn(model))(variables, data)

    session = StreamingSession(model, variables, clip_frames=L)
    offsets = np.asarray(data["temporal_offsets"]) if encode_offset else None
    out = None
    for t in range(L - 1):  # the batch path drops the future frame
        frame = {
            "video": data["video"][:, t],
            **{
                k: data[k][:, t]
                for k in (
                    "translation", "acceleration", "rotation",
                    "rotation_rate", "speed",
                )
            },
        }
        out = session.step(
            frame,
            temporal_offset=float(offsets[0, t]) if offsets is not None else 0.0,
        )
    assert out is not None
    # identical math; tiny reassociation deltas from the different fold
    # shapes (B*L vs B*1) are permitted
    np.testing.assert_allclose(
        np.asarray(out["boxes"]), np.asarray(batch_out["boxes"]),
        rtol=0, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["class_scores"]), np.asarray(batch_out["class_scores"]),
        rtol=0, atol=1e-6,
    )


def test_streaming_sharded_dp_mesh():
    """Streaming serving over a data-parallel device mesh: frames sharded on
    the batch axis, outputs equal the single-device session."""
    from future_od_tpu.parallel.mesh import batch_sharding, make_mesh, replicate

    rng = np.random.default_rng(2)
    B, L, H, W = 8, 3, 64, 96
    args = tiny_args()
    model = build_flagship(args)
    data = make_data(rng, B, L, H, W)
    variables = model.init(
        {"params": jax.random.key(0)}, data, deterministic=True
    )

    mesh = make_mesh(num_data=8, num_model=1)
    sharded_vars = jax.device_put(
        variables, jax.tree.map(lambda _: replicate(mesh), variables)
    )

    def run(session):
        out = None
        for t in range(L - 1):
            frame = {
                "video": data["video"][:, t],
                **{
                    k: data[k][:, t]
                    for k in (
                        "translation", "acceleration", "rotation",
                        "rotation_rate", "speed",
                    )
                },
            }
            out = session.step(frame)
        return out

    ref = run(StreamingSession(model, variables, clip_frames=L))
    out = run(
        StreamingSession(
            model, sharded_vars, clip_frames=L,
            input_sharding=batch_sharding(mesh),
        )
    )
    assert len(out["boxes"].sharding.device_set) == 8
    np.testing.assert_allclose(
        np.asarray(out["boxes"]), np.asarray(ref["boxes"]), rtol=0, atol=1e-5
    )


def test_streaming_window_slides():
    """4-frame stream -> outputs at t=1,2,3; each equals batch infer on the
    matching 3-frame clip."""
    rng = np.random.default_rng(1)
    B, H, W = 1, 64, 96
    args = tiny_args()
    model = build_flagship(args)
    stream = make_data(rng, B, 5, H, W)  # 5 frames: clips end at t=1..3
    variables = model.init(
        {"params": jax.random.key(0)},
        {k: (v[:, :3] if np.asarray(v).ndim > 1 else v)
         for k, v in stream.items()},
        deterministic=True,
    )
    infer = jax.jit(make_inference_fn(model))
    session = StreamingSession(model, variables, clip_frames=3)

    for t in range(4):
        frame = {
            "video": stream["video"][:, t],
            **{
                k: stream[k][:, t]
                for k in (
                    "translation", "acceleration", "rotation",
                    "rotation_rate", "speed",
                )
            },
        }
        out = session.step(frame)
        if t == 0:
            assert out is None
            continue
        clip = {
            k: (v[:, t - 1 : t + 2] if np.asarray(v).ndim > 1 else v)
            for k, v in stream.items()
        }
        clip["annotated_frame_idx"] = jnp.asarray([2] * B)
        ref = infer(variables, clip)
        np.testing.assert_allclose(
            np.asarray(out["boxes"]), np.asarray(ref["boxes"]),
            rtol=0, atol=1e-5,
        )
