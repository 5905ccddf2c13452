"""Multi-stream serving: micro-batch many asynchronous video streams onto
one chip — or a data-parallel mesh of chips — with STATIC shapes and
device-resident feature rings.

The reference has no serving runtime at all (its eval loop re-encodes full
clips from a torch DataLoader, future_od/models/paper.py:432-485 +
runs/eval/*). `StreamingSession` (serve/streaming.py) already exploits the
per-frame purity of everything before the recurrent decoder — but it serves
ONE lockstep batch of streams. Production serving is messier: N cameras
whose frames arrive independently, streams joining and leaving, and a TPU
that wants large fixed-shape batches (XLA compiles one program per shape;
dynamic batch sizes would recompile, and axon compiles are minutes).

Design (TPU-first; every hot step is ONE jitted program):
- encoded per-frame features live in a device ring buffer; the host keeps
  only integer slot bookkeeping. Nothing is stacked or sliced eagerly on
  device — the first MultiStreamServer draft did exactly that (per-stream
  feature slices + per-clip output splits) and measured 12 clips/s against
  the 172 clips/s lockstep session purely from per-dispatch op/sync
  overhead; the ring design measures 152 clips/s (BENCHMARKS.md round 3).
- `encode_store(variables, frames, ring, slots)`: encode a fixed
  (B, H, W, 3) frame batch and scatter the features into their ring slots
  (rings donated — updated in place, no copy).
- `detect_gather(variables, ring, idx, offsets)`: gather (B, window) slot
  windows from the ring and run the recurrent decoder + post-processing.
- a dispatch takes at most ONE frame per stream (the realistic regime —
  dispatch rate >> per-stream frame rate) so a clip's window slots are
  never overwritten within the dispatch that detects them.
- partial batches pad; per-row ops never mix batch rows, so padding cannot
  leak into real rows — tests/test_server.py asserts bitwise equality
  against a solo run. Pad rows write to a scratch ring slot.

Multi-chip (pass `mesh=`): streams are pinned to chips (each chip owns a
contiguous ring shard and max_batch/K batch rows), and the two programs run
under `shard_map` over the "data" axis — every ring scatter/gather is
PROVABLY chip-local, so scaling out adds zero collectives. This is the
sharding layout a GSPMD scatter could not infer (slot indices are dynamic;
XLA would emit a global scatter); pinning makes locality a structural fact.

Results come back BATCHED: each dispatch yields `(placements, outputs)` —
`placements` maps stream ids to rows of `outputs` (a post-processed dict
with leading batch dim), so one host sync materializes every clip of the
dispatch. `split_results` unpacks to per-stream dicts when ergonomics
matter more than dispatch overhead.

Occupancy telemetry (`stats()`) reports how much of each dispatch was
padding; tools/bench_server.py measures throughput and p50/p95/p99
submit->result latency.
"""
from __future__ import annotations

from collections import deque
from typing import Any, Dict, Hashable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from future_od_tpu.ops.flash_attention import flash_block_env
from future_od_tpu.serve.streaming import make_streaming_fns

IMU_KEYS = ("translation", "acceleration", "rotation", "rotation_rate", "speed")

Placement = Tuple[Hashable, int]  # (stream id, row in the batched outputs)


def split_results(
    results: List[Tuple[Tuple[Placement, ...], Dict[str, jnp.ndarray]]],
) -> List[Tuple[Hashable, Dict[str, jnp.ndarray]]]:
    """Unpack batched dispatch results into per-stream output dicts."""
    out = []
    for placements, batched in results:
        for sid, row in placements:
            out.append((sid, jax.tree.map(lambda v, r=row: v[r], batched)))
    return out


def _stack(rows):
    """Stack frame rows into a batch: host-resident numpy stacks on the host
    (ONE device transfer); device-resident arrays stack on device."""
    if all(isinstance(r, np.ndarray) for r in rows):
        return jnp.asarray(np.stack(rows))
    return jnp.stack([jnp.asarray(r) for r in rows])


class _StreamState:
    __slots__ = ("chip", "base", "seen", "offsets", "queue")

    def __init__(self, chip: int, base: int, window: int):
        self.chip = chip  # owning chip (data-axis index); 0 when unsharded
        self.base = base  # first LOCAL ring slot of this stream's region
        self.seen = 0  # frames encoded so far
        self.offsets: deque = deque(maxlen=window)  # temporal offsets
        self.queue: deque = deque()  # frames waiting for a dispatch slot


class _Chip:
    __slots__ = ("free", "order")

    def __init__(self, streams_per_chip: int):
        self.free = list(range(streams_per_chip - 1, -1, -1))
        self.order: deque = deque()  # sids with queued frames, FIFO


class MultiStreamServer:
    """Serve many independent video streams with fixed-shape micro-batches.

    Args:
        model: a SpatioTemporalDETR (FuturePredCore-style core).
        variables: model variables (cast to bf16 by the caller for speed;
            replicated across the mesh when sharded).
        max_batch: static GLOBAL batch size of the two jitted programs.
        clip_frames: L of the batch-eval clip being emulated (the decoder
            consumes L-1 past frames).
        max_streams: ring capacity in streams; `close_stream` frees a slot.
        mesh: optional jax.sharding.Mesh with a "data" axis — streams are
            pinned to chips and the programs run under shard_map (see module
            docstring). max_batch and max_streams must divide by the axis.
        jit: disable only for debugging (single-device only).
    """

    def __init__(
        self,
        model,
        variables,
        max_batch: int,
        clip_frames: int = 3,
        max_streams: int = 64,
        mesh=None,
        jit: bool = True,
    ):
        self.max_batch = int(max_batch)
        self.window = clip_frames - 1
        self.max_streams = int(max_streams)
        self.variables = variables
        self.mesh = mesh
        self._model = model
        self._clip_frames = clip_frames
        self._jit = jit
        self._num_chips = 1 if mesh is None else int(mesh.shape["data"])
        if mesh is not None:
            assert jit, "sharded serving requires jit"
            assert mesh.shape.get("model", 1) == 1, (
                "MultiStreamServer shards streams over 'data' only"
            )
            assert self.max_batch % self._num_chips == 0, (
                "max_batch must divide by the data axis"
            )
            assert self.max_streams % self._num_chips == 0, (
                "max_streams must divide by the data axis"
            )
        self._batch_local = self.max_batch // self._num_chips
        self._streams_local = self.max_streams // self._num_chips
        self._slots_per_stream = self.window + 1  # +1: the in-flight write
        # per-chip ring shard: stream regions + one scratch slot (pad rows)
        self._ring_local = self._streams_local * self._slots_per_stream + 1
        self._scratch = self._ring_local - 1  # LOCAL index of the pad slot
        self._chips = [_Chip(self._streams_local) for _ in range(self._num_chips)]
        self._streams: Dict[Hashable, _StreamState] = {}
        self._encode_store = self._detect_gather = None
        self._ring = None  # (num_chips * ring_local, h, w, D)
        self._ego_ring = None  # (same leading, D) or a dummy when no ego
        self._has_imu: Optional[bool] = None
        self._dispatches = 0
        self._padded_rows = 0
        self._real_rows = 0

    # -- lifecycle ---------------------------------------------------------

    def close_stream(self, stream_id: Hashable) -> None:
        """Forget a stream's cached window (frames still queued are dropped)."""
        state = self._streams.pop(stream_id, None)
        if state is None:
            return
        chip = self._chips[state.chip]
        chip.free.append(state.base // self._slots_per_stream)
        if stream_id in chip.order:
            chip.order.remove(stream_id)

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
    ) -> List[Tuple[Tuple[Placement, ...], Dict[str, jnp.ndarray]]]:
        """Queue one frame ((H, W, 3) video + per-key (d,) imu) for a stream.

        Returns batched results of any dispatch this submit triggered (empty
        while batches are filling). A dispatch fires when some chip has
        max_batch/num_chips DISTINCT streams with frames queued — one frame
        per stream per dispatch, so a flooding stream queues instead of
        starving others."""
        frame_has_imu = frame.get("translation") is not None
        if self._has_imu is None:
            self._has_imu = frame_has_imu
        elif frame_has_imu != self._has_imu:
            # fail BEFORE any bookkeeping mutates: a mixed fleet would
            # otherwise either silently drop a stream's IMU (first frame
            # had none) or KeyError mid-dispatch after queue pops
            raise ValueError(
                f"stream {stream_id!r} {'has' if frame_has_imu else 'lacks'} "
                f"IMU but this server was opened "
                f"{'with' if self._has_imu else 'without'} IMU — all streams "
                "must agree (the jitted encode has one signature)"
            )
        state = self._streams.get(stream_id)
        if state is None:
            # pin new streams to the least-loaded chip with free capacity
            candidates = [c for c in range(self._num_chips) if self._chips[c].free]
            if not candidates:
                raise RuntimeError(
                    f"more than max_streams={self.max_streams} active "
                    "streams; close_stream() finished ones or raise the cap"
                )
            chip_id = max(candidates, key=lambda c: len(self._chips[c].free))
            base = self._chips[chip_id].free.pop() * self._slots_per_stream
            state = _StreamState(chip_id, base, self.window)
            self._streams[stream_id] = state
        state.queue.append((frame, float(temporal_offset)))
        chip = self._chips[state.chip]
        if stream_id not in chip.order:
            chip.order.append(stream_id)
        results = []
        while any(len(c.order) >= self._batch_local for c in self._chips):
            results.extend(self._dispatch_round())
        return results

    def flush(self) -> List[Tuple[Tuple[Placement, ...], Dict[str, jnp.ndarray]]]:
        """Dispatch everything pending (padding partial batches)."""
        results = []
        while any(c.order for c in self._chips):
            results.extend(self._dispatch_round())
        return results

    # -- dispatch ----------------------------------------------------------

    def _shard(self, fn, donate=()):
        """jit fn; under a mesh, wrap in shard_map over "data" so the ring
        scatter/gather stays chip-local (variables replicated)."""
        if self.mesh is None:
            return jax.jit(fn, donate_argnums=donate) if self._jit else fn
        from jax import shard_map  # jax >= 0.8

        mapped = shard_map(
            fn, mesh=self.mesh,
            in_specs=(P(),) + (P("data"),) * 4,  # variables replicated
            out_specs=P("data"),
            check_vma=False,
        )
        return jax.jit(mapped, donate_argnums=donate)

    def _build(self, image_hw, feat_sds, ego_sds) -> None:
        encode, detect = make_streaming_fns(
            self._model, self._clip_frames, image_hw
        )
        R = self._num_chips * self._ring_local
        h, w, D = feat_sds.shape[1:]
        ego_dim = ego_sds.shape[-1] if ego_sds is not None else 0
        # ring dtype = the model's feature dtype (bf16 under bf16 variables)
        ring = jnp.zeros((R, h, w, D), feat_sds.dtype)
        ego_ring = jnp.zeros(
            (R, ego_dim) if ego_dim else (R, 1),
            ego_sds.dtype if ego_sds is not None else jnp.float32,
        )
        if self.mesh is not None:
            shard = NamedSharding(self.mesh, P("data"))
            ring = jax.device_put(ring, shard)
            ego_ring = jax.device_put(ego_ring, shard)
        self._ring, self._ego_ring = ring, ego_ring

        def encode_store(variables, batch_video, batch_imu, ring, slots):
            batch = {"video": batch_video}
            if batch_imu is not None:
                batch.update(batch_imu)
            else:
                batch["translation"] = None
            feats, ego = encode(variables, batch)
            new_ring = ring[0].at[slots].set(feats)
            new_ego = ring[1]
            if ego is not None:
                new_ego = new_ego.at[slots].set(ego)
            return new_ring, new_ego

        def detect_gather(variables, ring, ego_ring, idx, offsets):
            feats = ring[idx]  # (B_local, window, h, w, D)
            ego = ego_ring[idx] if ego_dim else None
            return detect(variables, feats, ego, offsets)

        # rings are donated: updated in place every dispatch, no copy
        jit_encode = self._shard(encode_store, donate=(3,))
        # the fused encode+ring-scatter program measures 35% FASTER with
        # moderate q-blocks than with the library default full-row blocks
        # (152 vs 98 clips/s pipelined, monotonic in block_q — the big f32
        # logits tile starves this program's surrounding fusions; see
        # ops/flash_attention.flash_block_env). Pin the measured geometry
        # at trace time; an explicit FUTURE_OD_FLASH_BQ/_BK env still wins.
        def pinned_encode(*args):
            with flash_block_env(block_q=512, block_k=1536):
                return jit_encode(*args)

        self._encode_store = pinned_encode
        self._detect_gather = self._shard(detect_gather)

    def _probe_shapes(self, frame) -> None:
        """Abstract-eval one unbatched encode to learn feature/ego shapes."""
        encode, _ = make_streaming_fns(
            self._model, self._clip_frames,
            tuple(np.asarray(frame["video"]).shape[:2]),
        )
        batch = {"video": jnp.asarray(np.asarray(frame["video"]))[None]}
        if self._has_imu:
            for k in IMU_KEYS:
                batch[k] = jnp.asarray(np.asarray(frame[k]))[None]
        else:
            batch["translation"] = None
        feats, ego = jax.eval_shape(encode, self.variables, batch)
        self._build(tuple(np.asarray(frame["video"]).shape[:2]), feats, ego)

    def _dispatch_round(self):
        """Encode one frame from up to batch_local streams PER CHIP, then
        detect every clip that completed."""
        # -- gather work, grouped by chip (row block c*B_local..(c+1)*B_local)
        work: List[Optional[Tuple[Hashable, Dict[str, Any], float]]] = []
        any_work = False
        for chip in self._chips:
            taken: set = set()
            # at most ONE frame per stream per round (the ring-slot safety
            # invariant): a re-appended sid waits for the next round
            while (
                chip.order
                and len(taken) < self._batch_local
                and chip.order[0] not in taken
            ):
                sid = chip.order.popleft()
                taken.add(sid)
                state = self._streams[sid]
                frame, offset = state.queue.popleft()
                work.append((sid, frame, offset))
                if state.queue:
                    chip.order.append(sid)  # more frames -> next round
            any_work = any_work or bool(taken)
            work.extend([None] * (self._batch_local - len(taken)))
        if not any_work:
            return []
        if self._encode_store is None:
            self._probe_shapes(next(w for w in work if w)[1])

        # -- assemble the fixed-shape frame batch; pad rows reuse any real
        # frame (rows never mix; pad features land in the chip's scratch slot)
        fallback = next(w for w in work if w)[1]
        rows = [w[1] if w else fallback for w in work]
        video = _stack([r["video"] for r in rows])
        imu = (
            {k: _stack([r[k] for r in rows]) for k in IMU_KEYS}
            if self._has_imu else None
        )
        # ring slot values are LOCAL to the owning chip's ring shard: under
        # shard_map each chip scatters into its own (ring_local, ...) view
        # (with no mesh there is exactly one chip, so local == global)
        slots, ready = [], []
        for c in range(self._num_chips):
            for j in range(self._batch_local):
                w = work[c * self._batch_local + j]
                if w is None:
                    slots.append(self._scratch)
                    continue
                sid, _, offset = w
                state = self._streams[sid]
                slots.append(
                    state.base + state.seen % self._slots_per_stream
                )
                state.seen += 1
                state.offsets.append(offset)
                if state.seen >= self.window:
                    # window = the last `window` LOCAL slots, oldest first
                    idx = [
                        state.base + k % self._slots_per_stream
                        for k in range(state.seen - self.window, state.seen)
                    ]
                    ready.append((sid, idx, list(state.offsets)))
        self._ring, self._ego_ring = self._encode_store(
            self.variables, video, imu, (self._ring, self._ego_ring),
            jnp.asarray(slots, jnp.int32),
        )
        self._dispatches += 1
        n_real = sum(1 for w in work if w)
        self._real_rows += n_real
        self._padded_rows += len(work) - n_real

        # -- detect: group completed clips by owning chip into row blocks
        results = []
        per_chip = [[] for _ in range(self._num_chips)]
        for clip in ready:
            per_chip[self._streams[clip[0]].chip].append(clip)
        while any(per_chip):
            placements, idx, offs = [], [], []
            for c in range(self._num_chips):
                batch_c = per_chip[c][: self._batch_local]
                per_chip[c] = per_chip[c][self._batch_local :]
                for j, (sid, slot_idx, offsets) in enumerate(batch_c):
                    placements.append((sid, c * self._batch_local + j))
                    idx.append(slot_idx)
                    offs.append(offsets)
                pad = self._batch_local - len(batch_c)
                idx.extend([[self._scratch] * self.window] * pad)
                offs.extend([[0.0] * self.window] * pad)
            out = self._detect_gather(
                self.variables, self._ring, self._ego_ring,
                jnp.asarray(idx, jnp.int32),
                jnp.asarray(np.asarray(offs, np.float32), self._ring.dtype),
            )
            results.append((tuple(placements), out))
        return results
