"""Multi-stream serving: micro-batch many asynchronous video streams onto
one chip with STATIC shapes and a device-resident feature ring.

The reference has no serving runtime at all (its eval loop re-encodes full
clips from a torch DataLoader, future_od/models/paper.py:432-485 +
runs/eval/*). `StreamingSession` (serve/streaming.py) already exploits the
per-frame purity of everything before the recurrent decoder — but it serves
ONE lockstep batch of streams. Production serving is messier: N cameras
whose frames arrive independently, streams joining and leaving, and a TPU
that wants large fixed-shape batches (XLA compiles one program per shape;
dynamic batch sizes would recompile, and axon compiles are minutes).

Design (TPU-first; every hot step is ONE jitted program):
- encoded per-frame features live in a device ring buffer
  (max_streams x (window+1) frame slots + one scratch slot for padding);
  the host keeps only integer slot bookkeeping. Nothing is ever stacked or
  sliced eagerly on device — the first MultiStreamServer draft did exactly
  that (per-stream feature slices + per-clip output splits) and measured
  12 clips/s against the 172 clips/s lockstep session purely from
  per-dispatch op/sync overhead.
- `encode_store(variables, frames, ring, slots)`: encode a fixed
  (B, H, W, 3) frame batch and scatter the features into their ring slots
  (rings donated — updated in place, no copy).
- `detect_gather(variables, ring, idx, offsets)`: gather (B, window) slot
  windows from the ring and run the recurrent decoder + post-processing.
- a dispatch takes at most ONE frame per stream (the realistic regime —
  dispatch rate >> per-stream frame rate) so a clip's window slots are
  never overwritten within the dispatch that detects them.
- partial batches pad with the scratch slot / row 0; per-row ops never mix
  batch rows, so padding cannot leak into real rows — tests/test_server.py
  asserts bitwise equality against a solo run.

Results come back BATCHED: each dispatch yields `(sids, outputs)` where
`outputs` is the post-processed dict with leading batch dim — one host
sync materializes every clip of the dispatch (`split_results` unpacks to
per-stream dicts when ergonomics matter more than dispatch overhead).

Occupancy telemetry (`stats()`) reports how much of each dispatch was
padding; a server tuned so streams ~fill `max_batch` runs at the lockstep
streaming throughput (tools/bench_server.py measures both throughput and
p50/p95/p99 submit->result latency).
"""
from __future__ import annotations

from collections import deque
from typing import Any, Dict, Hashable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from future_od_tpu.serve.streaming import make_streaming_fns

IMU_KEYS = ("translation", "acceleration", "rotation", "rotation_rate", "speed")


def _stack(rows):
    """Stack frame rows into a batch: host-resident numpy stacks on the host
    (ONE device transfer); device-resident arrays stack on device."""
    if all(isinstance(r, np.ndarray) for r in rows):
        return jnp.asarray(np.stack(rows))
    return jnp.stack([jnp.asarray(r) for r in rows])


def split_results(
    results: List[Tuple[Tuple[Hashable, ...], Dict[str, jnp.ndarray]]],
) -> List[Tuple[Hashable, Dict[str, jnp.ndarray]]]:
    """Unpack batched dispatch results into per-stream output dicts."""
    out = []
    for sids, batched in results:
        for i, sid in enumerate(sids):
            out.append((sid, jax.tree.map(lambda v, i=i: v[i], batched)))
    return out


class _StreamState:
    __slots__ = ("base", "seen", "offsets", "queue")

    def __init__(self, base: int, window: int):
        self.base = base  # first ring slot of this stream's region
        self.seen = 0  # frames encoded so far
        self.offsets: deque = deque(maxlen=window)  # temporal offsets
        self.queue: deque = deque()  # frames waiting for a dispatch slot


class MultiStreamServer:
    """Serve many independent video streams with fixed-shape micro-batches.

    Args:
        model: a SpatioTemporalDETR (FuturePredCore-style core).
        variables: model variables (cast to bf16 by the caller for speed).
        max_batch: static batch size of the two jitted programs. Every
            dispatch runs at exactly this shape.
        clip_frames: L of the batch-eval clip being emulated (the decoder
            consumes L-1 past frames).
        max_streams: ring capacity in streams; `close_stream` frees a slot.
        jit: disable only for debugging.

    Usage:
        server = MultiStreamServer(model, variables, max_batch=12)
        results = server.submit("cam0", frame)   # frame: (H, W, 3) + imu (d,)
        ...
        results += server.flush()                # drain pending frames
        for sid, out in split_results(results): ...
    """

    def __init__(
        self,
        model,
        variables,
        max_batch: int,
        clip_frames: int = 3,
        max_streams: int = 64,
        jit: bool = True,
    ):
        self.max_batch = int(max_batch)
        self.window = clip_frames - 1
        self.max_streams = int(max_streams)
        self.variables = variables
        self._model = model
        self._clip_frames = clip_frames
        self._jit = jit
        self._encode_store = self._detect_gather = None
        self._ring = None  # (R, h, w, D) encoded frames; R = slots + scratch
        self._ego_ring = None  # (R, D) or a (1, 1) dummy when no IMU
        self._slots_per_stream = self.window + 1  # +1: the in-flight write
        self._scratch = self.max_streams * self._slots_per_stream  # pad slot
        self._streams: Dict[Hashable, _StreamState] = {}
        self._free = list(range(self.max_streams - 1, -1, -1))
        self._order: deque = deque()  # round-robin of sids with queued frames
        self._has_imu: Optional[bool] = None
        self._has_ego: Optional[bool] = None
        self._dispatches = 0
        self._padded_rows = 0
        self._real_rows = 0

    # -- lifecycle ---------------------------------------------------------

    def close_stream(self, stream_id: Hashable) -> None:
        """Forget a stream's cached window (frames still queued are dropped)."""
        state = self._streams.pop(stream_id, None)
        if state is not None:
            self._free.append(state.base // self._slots_per_stream)
        if stream_id in self._order:
            self._order.remove(stream_id)

    def stats(self) -> Dict[str, float]:
        rows = self._real_rows + self._padded_rows
        return {
            "dispatches": self._dispatches,
            "frames": self._real_rows,
            "pad_fraction": (self._padded_rows / rows) if rows else 0.0,
            "active_streams": len(self._streams),
        }

    # -- ingestion ---------------------------------------------------------

    def submit(
        self,
        stream_id: Hashable,
        frame: Dict[str, Any],
        temporal_offset: float = 0.0,
    ) -> List[Tuple[Tuple[Hashable, ...], Dict[str, jnp.ndarray]]]:
        """Queue one frame ((H, W, 3) video + per-key (d,) imu) for a stream.

        Returns batched results of any dispatch this submit triggered (empty
        while the batch is filling). A dispatch fires when `max_batch`
        DISTINCT streams have frames queued — one frame per stream per
        dispatch, so a flooding stream queues instead of starving others."""
        if self._has_imu is None:
            self._has_imu = frame.get("translation") is not None
        state = self._streams.get(stream_id)
        if state is None:
            if not self._free:
                raise RuntimeError(
                    f"more than max_streams={self.max_streams} active "
                    "streams; close_stream() finished ones or raise the cap"
                )
            state = _StreamState(
                self._free.pop() * self._slots_per_stream, self.window
            )
            self._streams[stream_id] = state
        state.queue.append((frame, float(temporal_offset)))
        if stream_id not in self._order:
            self._order.append(stream_id)
        results = []
        while len(self._order) >= self.max_batch:
            results.extend(self._dispatch_round(pad=False))
        return results

    def flush(self) -> List[Tuple[Tuple[Hashable, ...], Dict[str, jnp.ndarray]]]:
        """Dispatch everything pending (padding partial batches)."""
        results = []
        while self._order:
            results.extend(self._dispatch_round(pad=True))
        return results

    # -- dispatch ----------------------------------------------------------

    def _build(self, image_hw, feat_sds, ego_sds) -> None:
        encode, detect = make_streaming_fns(
            self._model, self._clip_frames, image_hw
        )
        R = self.max_streams * self._slots_per_stream + 1  # + scratch
        h, w, D = feat_sds.shape[1:]
        # ring dtype = the model's feature dtype (bf16 under bf16 variables)
        self._ring = jnp.zeros((R, h, w, D), feat_sds.dtype)
        self._ego_ring = jnp.zeros(
            (R, ego_sds.shape[-1]) if ego_sds is not None else (1, 1),
            ego_sds.dtype if ego_sds is not None else jnp.float32,
        )
        ego_dim = ego_sds.shape[-1] if ego_sds is not None else 0

        def encode_store(variables, batch, ring, ego_ring, slots):
            feats, ego = encode(variables, batch)
            ring = ring.at[slots].set(feats)
            if ego is not None:
                ego_ring = ego_ring.at[slots].set(ego)
            return ring, ego_ring

        def detect_gather(variables, ring, ego_ring, idx, offsets):
            feats = ring[idx]  # (B, window, h, w, D)
            ego = ego_ring[idx] if ego_dim else None
            return detect(variables, feats, ego, offsets)

        if self._jit:
            # rings are donated: updated in place every dispatch, no copy
            encode_store = jax.jit(encode_store, donate_argnums=(2, 3))
            detect_gather = jax.jit(detect_gather)
        self._encode_store = encode_store
        self._detect_gather = detect_gather

    def _probe_shapes(self, frame) -> None:
        """One unbatched encode to learn the feature/ego shapes."""
        encode, _ = make_streaming_fns(
            self._model, self._clip_frames, tuple(np.asarray(frame["video"]).shape[:2])
        )
        batch = {"video": jnp.asarray(frame["video"])[None]}
        if self._has_imu:
            for k in IMU_KEYS:
                batch[k] = jnp.asarray(frame[k])[None]
        else:
            batch["translation"] = None
        feats, ego = jax.eval_shape(encode, self.variables, batch)
        self._has_ego = ego is not None
        self._build(tuple(np.asarray(frame["video"]).shape[:2]), feats, ego)

    def _dispatch_round(self, pad: bool):
        """Encode one frame from up to max_batch distinct streams, then
        detect every clip that completed."""
        B = self.max_batch
        take = min(len(self._order), B)
        if take == 0 or (take < B and not pad):
            return []
        work: List[Tuple[Hashable, Dict[str, Any], float]] = []
        for _ in range(take):
            sid = self._order.popleft()
            state = self._streams[sid]
            frame, offset = state.queue.popleft()
            work.append((sid, frame, offset))
            if state.queue:
                self._order.append(sid)  # more frames -> next round
        if self._encode_store is None:
            self._probe_shapes(work[0][1])

        n = len(work)
        # pad the tail by repeating row 0's frame; its features land in the
        # scratch slot. Rows never mix, so pad contents are irrelevant
        # (asserted bitwise in tests).
        rows = [w[1] for w in work] + [work[0][1]] * (B - n)
        batch = {"video": _stack([r["video"] for r in rows])}
        if self._has_imu:
            for k in IMU_KEYS:
                batch[k] = _stack([r[k] for r in rows])
        else:
            batch["translation"] = None
        slots, ready = [], []
        for sid, _, offset in work:
            state = self._streams[sid]
            slot = state.base + state.seen % self._slots_per_stream
            slots.append(slot)
            state.seen += 1
            state.offsets.append(offset)
            if state.seen >= self.window:
                # window = the last `window` slots, oldest first
                idx = [
                    state.base + k % self._slots_per_stream
                    for k in range(state.seen - self.window, state.seen)
                ]
                ready.append((sid, idx, list(state.offsets)))
        slots += [self._scratch] * (B - n)
        self._ring, self._ego_ring = self._encode_store(
            self.variables, batch, self._ring, self._ego_ring,
            jnp.asarray(slots, jnp.int32),
        )
        self._dispatches += 1
        self._real_rows += n
        self._padded_rows += B - n

        results = []
        for at in range(0, len(ready), B):
            results.append(self._detect_batch(ready[at : at + B]))
        return results

    def _detect_batch(self, clips):
        B = self.max_batch
        n = len(clips)
        padded = list(clips) + [clips[0]] * (B - n)
        idx = jnp.asarray([c[1] for c in padded], jnp.int32)  # (B, window)
        offsets = jnp.asarray(
            [c[2] for c in padded], self._ring.dtype
        )  # (B, window)
        out = self._detect_gather(
            self.variables, self._ring, self._ego_ring, idx, offsets
        )
        return tuple(c[0] for c in clips), out
