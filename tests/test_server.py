"""MultiStreamServer (serve/server.py): asynchronous multi-stream
micro-batching equals per-stream StreamingSession serving, padding never
leaks, streams can join/leave, and per-stream frame order is preserved."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from future_od_tpu.models.build import build_flagship
from future_od_tpu.models.st_detr import SpatioTemporalDETRArgs
from future_od_tpu.serve import MultiStreamServer, StreamingSession
from future_od_tpu.serve.server import split_results


def tiny_args(**kw):
    return SpatioTemporalDETRArgs(
        num_classes=3, num_queries=8, hidden_dim=32, nheads=2, enc_nheads=2,
        dim_feedforward=64, enc_layers=1, dec_layers=2, lr_backbone=1e-4,
        **kw,
    )


H, W, L = 64, 96, 3
IMU = [("translation", 3), ("acceleration", 3), ("rotation", 4),
       ("rotation_rate", 3), ("speed", 1)]


def make_frame(rng):
    frame = {"video": rng.normal(size=(H, W, 3)).astype(np.float32)}
    for key, d in IMU:
        frame[key] = rng.normal(size=(d,)).astype(np.float32)
    return frame


def make_model():
    model = build_flagship(tiny_args())
    data = {
        "video": jnp.zeros((1, L, H, W, 3), jnp.float32),
        "annotated_frame_idx": jnp.asarray([L - 1]),
    }
    for key, d in IMU:
        data[key] = jnp.zeros((1, L, d), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0)}, data, deterministic=True
    )
    return model, variables


def session_outputs(model, variables, frames):
    """Reference: one StreamingSession at B=1 over a stream's frames."""
    session = StreamingSession(model, variables, clip_frames=L)
    outs = []
    for frame in frames:
        batched = {k: jnp.asarray(v)[None] for k, v in frame.items()}
        out = session.step(batched)
        if out is not None:
            outs.append(jax.tree.map(lambda v: v[0], out))
    return outs


def test_multistream_matches_per_stream_sessions():
    """3 staggered streams through a max_batch=4 server == each stream
    served alone (tolerance covers the B=4-vs-B=1 program reassociation)."""
    rng = np.random.default_rng(0)
    model, variables = make_model()
    streams = {sid: [make_frame(rng) for _ in range(4)] for sid in "abc"}

    server = MultiStreamServer(model, variables, max_batch=4, clip_frames=L)
    got = {sid: [] for sid in streams}
    # interleave: a0 b0 c0 a1 b1 c1 ... (batches of 4 cut across streams)
    for t in range(4):
        for sid in "abc":
            for rsid, out in split_results(server.submit(sid, streams[sid][t])):
                got[rsid].append(out)
    for rsid, out in split_results(server.flush()):
        got[rsid].append(out)

    assert server.stats()["frames"] == 12
    for sid in streams:
        want = session_outputs(model, variables, streams[sid])
        assert len(got[sid]) == len(want) == 3  # clips end at t=1,2,3
        for g, w in zip(got[sid], want):
            np.testing.assert_allclose(
                np.asarray(g["boxes"]), np.asarray(w["boxes"]),
                rtol=0, atol=1e-5,
            )


def test_padding_is_bitwise_inert():
    """A stream served in a padded partial batch produces BITWISE the same
    outputs as the same stream sharing its batch with other streams: batch
    rows never mix, so pad contents are irrelevant."""
    rng = np.random.default_rng(1)
    model, variables = make_model()
    frames = [make_frame(rng) for _ in range(3)]
    other = [make_frame(rng) for _ in range(3)]

    # arm 1: stream "x" alone — every dispatch is 1 real row + 3 pad rows
    solo = MultiStreamServer(model, variables, max_batch=4, clip_frames=L)
    solo_outs = []
    for f in frames:
        solo_outs += [o for _, o in split_results(solo.submit("x", f))]
        solo_outs += [o for _, o in split_results(solo.flush())]
    assert solo.stats()["pad_fraction"] == pytest.approx(0.75)

    # arm 2: same frames for "x", interleaved with a second real stream
    mixed = MultiStreamServer(model, variables, max_batch=4, clip_frames=L)
    mixed_outs = []
    for f, g in zip(frames, other):
        res = mixed.submit("x", f) + mixed.submit("y", g) + mixed.flush()
        mixed_outs += [o for sid, o in split_results(res) if sid == "x"]

    assert len(solo_outs) == len(mixed_outs) == 2
    for s, m in zip(solo_outs, mixed_outs):
        for key in ("boxes", "class_scores"):
            np.testing.assert_array_equal(np.asarray(s[key]), np.asarray(m[key]))


def test_stream_join_leave():
    """Streams can join mid-run; close_stream drops the cached window so a
    rejoining stream warms up from scratch."""
    rng = np.random.default_rng(2)
    model, variables = make_model()
    server = MultiStreamServer(model, variables, max_batch=2, clip_frames=L)

    outs = server.submit("a", make_frame(rng)) + server.flush()
    assert split_results(outs) == []  # window not full yet
    outs = server.submit("a", make_frame(rng)) + server.flush()
    assert [sid for sid, _ in split_results(outs)] == ["a"]

    server.close_stream("a")
    assert server.stats()["active_streams"] == 0
    outs = server.submit("a", make_frame(rng)) + server.flush()
    assert split_results(outs) == []  # rewarming: old window must be gone


def test_flooding_stream_queues():
    """Many frames of ONE stream submitted back-to-back: one frame per
    stream per dispatch, so they spread over padded rounds — every clip
    still comes back, each against its own ring window, equal to the
    lockstep session fed the same frames."""
    rng = np.random.default_rng(3)
    model, variables = make_model()
    frames = [make_frame(rng) for _ in range(4)]

    server = MultiStreamServer(model, variables, max_batch=4, clip_frames=L)
    outs = []
    for f in frames:  # one distinct stream -> nothing dispatches until flush
        outs += [o for _, o in split_results(server.submit("s", f))]
    outs += [o for _, o in split_results(server.flush())]
    assert server.stats()["dispatches"] == 4  # one frame per dispatch round

    want = session_outputs(model, variables, frames)
    assert len(outs) == len(want) == 3
    for g, w in zip(outs, want):
        np.testing.assert_allclose(
            np.asarray(g["boxes"]), np.asarray(w["boxes"]),
            rtol=0, atol=1e-5,
        )


def test_sharded_server_matches_unsharded():
    """Streams pinned across an 8-chip data mesh (shard_map rings) produce
    the same outputs as the single-device server; the global batch is
    sharded over the mesh."""
    from future_od_tpu.parallel.mesh import make_mesh, replicate

    rng = np.random.default_rng(4)
    model, variables = make_model()
    streams = {sid: [make_frame(rng) for _ in range(3)] for sid in range(8)}

    def run(server):
        got = {}
        for t in range(3):
            for sid in streams:
                res = server.submit(sid, streams[sid][t])
                for rsid, out in split_results(res):
                    got.setdefault(rsid, []).append(out)
        for rsid, out in split_results(server.flush()):
            got.setdefault(rsid, []).append(out)
        return got

    ref = run(MultiStreamServer(model, variables, max_batch=8, clip_frames=L,
                                max_streams=16))

    mesh = make_mesh(num_data=8, num_model=1)
    sharded_vars = jax.device_put(
        variables, jax.tree.map(lambda _: replicate(mesh), variables)
    )
    server = MultiStreamServer(
        model, sharded_vars, max_batch=8, clip_frames=L, max_streams=16,
        mesh=mesh,
    )
    got = run(server)

    assert set(got) == set(ref) == set(streams)
    for sid in streams:
        assert len(got[sid]) == len(ref[sid]) == 2  # clips end at t=1,2
        for g, w in zip(got[sid], ref[sid]):
            np.testing.assert_allclose(
                np.asarray(g["boxes"]), np.asarray(w["boxes"]),
                rtol=0, atol=1e-5,
            )


def test_random_arrival_schedule_matches_sessions():
    """Property test of the dispatcher bookkeeping: a random arrival schedule
    (staggered joins, bursts, an early leave) yields exactly the per-stream
    session outputs for every surviving stream, in per-stream frame order."""
    rng = np.random.default_rng(5)
    model, variables = make_model()
    n_frames = {"a": 5, "b": 4, "c": 3, "d": 4}
    streams = {s: [make_frame(rng) for _ in range(n)] for s, n in n_frames.items()}

    # schedule: interleaved with a burst of "a" and "d" joining late
    schedule = ["a", "a", "b", "c", "a", "b", "d", "c", "b", "a", "d",
                "c", "b", "d", "a", "d"]
    assert {s: schedule.count(s) for s in n_frames} == n_frames

    server = MultiStreamServer(model, variables, max_batch=3, clip_frames=L,
                               max_streams=8)
    sent = {s: 0 for s in n_frames}
    got = {s: [] for s in n_frames}
    for s in schedule:
        res = server.submit(s, streams[s][sent[s]])
        sent[s] += 1
        for rsid, out in split_results(res):
            got[rsid].append(out)
        if s == "c" and sent[s] == n_frames["c"]:
            # drain, then drop "c" mid-run; later dispatches must be unaffected
            for rsid, out in split_results(server.flush()):
                got[rsid].append(out)
            server.close_stream("c")
    for rsid, out in split_results(server.flush()):
        got[rsid].append(out)

    for s in n_frames:
        want = session_outputs(model, variables, streams[s])
        assert len(got[s]) == len(want) == n_frames[s] - 1
        for g, w in zip(got[s], want):
            np.testing.assert_allclose(
                np.asarray(g["boxes"]), np.asarray(w["boxes"]),
                rtol=0, atol=1e-5,
            )


def test_mixed_imu_streams_rejected_before_bookkeeping():
    """IMU presence is a server-wide contract (one jitted encode signature):
    a frame disagreeing with the established mode must be rejected BEFORE
    any queue/slot bookkeeping mutates — previously the first stream latched
    the mode and later IMU-less frames KeyError'd mid-dispatch (or a later
    IMU stream was silently served without its IMU)."""
    import pytest

    model, variables = make_model()
    rng = np.random.default_rng(0)
    server = MultiStreamServer(model, variables, max_batch=2, clip_frames=L)
    server.submit("a", make_frame(rng))  # establishes IMU mode
    bare = {"video": rng.normal(size=(H, W, 3)).astype(np.float32)}
    with pytest.raises(ValueError, match="IMU"):
        server.submit("b", bare)
    # the offending stream must have left no state behind
    assert "b" not in server._streams
    # and the server still serves the conforming fleet
    for t in range(L):
        server.submit("a", make_frame(rng))
        server.submit("c", make_frame(rng))
    assert server.flush()


def test_imu_less_fleet_served():
    """The inverse mode: a fleet opened WITHOUT IMU keeps working, and an
    IMU-carrying late joiner is rejected."""
    import pytest

    model, variables = make_model()
    rng = np.random.default_rng(1)
    server = MultiStreamServer(model, variables, max_batch=2, clip_frames=L)
    bare = lambda: {"video": rng.normal(size=(H, W, 3)).astype(np.float32)}
    outs = []
    for t in range(L + 1):
        outs += server.submit("a", bare())
        outs += server.submit("b", bare())
    outs += server.flush()
    assert outs
    with pytest.raises(ValueError, match="IMU"):
        server.submit("late", make_frame(rng))
