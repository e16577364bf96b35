"""Host-side SLAM engine: sweeps in, poses out.

Equivalent of the reference's `odometry_test` driver main loop (reference:
test/odometry_test.cpp:122-345) without the interactive visualization:
ingest a sweep, preprocess on device, run the fused odometry step, record
the trajectory.  In pipelined mode all device work per frame is ONE fused
dispatch (preprocess + step + PRNG split) and diagnostics are fetched in
batches — the TPU analog of the reference's capture-thread/main-loop
split, with the queue replaced by XLA's async dispatch.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bshot_slam_tpu.config import SlamConfig
from bshot_slam_tpu.io.velodyne import LaserSweep
from bshot_slam_tpu.odometry import mapstore, pipeline
from bshot_slam_tpu.ops import preprocess as pp
from bshot_slam_tpu.ops.rangeimage import build_range_image


@functools.partial(jax.jit, static_argnames=("cfg", "bucket"))
def _ingest(range_mm, azimuth_rad, vert_rad, selected, cfg, bucket: int):
    """Fused preprocess + cloud extraction + bucket slice + valid count —
    one device dispatch per frame (dispatch count is the host-side cost on
    remoted backends)."""
    res = pp.preprocess(range_mm, azimuth_rad, vert_rad, cfg)
    sel = jnp.asarray(selected) if selected is not None else jnp.ones_like(
        res.valid
    )
    points, pmask = pp.extract_cloud(res, sel, cfg.max_points)
    n_valid = jnp.sum(pmask.astype(jnp.int32))
    return points[:bucket], pmask[:bucket], n_valid


def pick_bucket(n_valid: int, cfg: SlamConfig) -> int:
    """Smallest configured cloud bucket holding n_valid points (capped at
    max_points; buckets above the cap are ignored)."""
    cap = cfg.preprocess.max_points
    for b in sorted(cfg.runtime.cloud_buckets):
        if n_valid <= b <= cap:
            return b
    return cap


@dataclasses.dataclass
class FrameRecord:
    pose: np.ndarray  # (4, 4)
    n_inliers: int
    n_mutual: int
    gated: bool
    map_size: int
    icp_rmse: float
    # (mean, SD, median) inlier correspondence distance in mm
    # (reference: lidar_odometry.cpp:304-330)
    corr_stats: np.ndarray
    # Cumulative keypoints lost to the map capacity ceiling as of this frame
    n_dropped: int = 0


class _Pending(NamedTuple):
    """One in-flight pipelined frame awaiting its diagnostics drain."""

    diag: object  # StepDiagnostics (device arrays; features for keyframing)
    packed: object  # (31,) device array: diag scalars + [n_valid, bucket, ok]
    ri: Optional[dict]  # host range image for lossless re-dispatch (fused)
    map_cap: int  # map capacity at dispatch time (tail block offset)


class SlamEngine:
    """Streaming scan-to-map odometry over a sweep source, with an optional
    keyframe/loop-closure/pose-graph backend (no reference counterpart).

    `pipelined=True` defers each frame's diagnostics fetch so host work
    overlaps device compute; the backend composes with it (keyframing runs
    at drain time from the packed diagnostics + retained device features,
    and periodic backend passes force a full drain so corrections apply at
    the exact same frame as the synchronous path)."""

    def __init__(self, cfg: SlamConfig, seed: int = 0, tile: int = 2048,
                 enable_backend: bool = False, backend_every: int = 0,
                 pipelined: bool = False, fetch_every: int = 1,
                 host_preprocess: bool = True, keep_corr: bool = False,
                 mesh=None, data_axis: str = "data", map_axis: str = "map"):
        from bshot_slam_tpu.backend import keyframes as kf_mod

        self.cfg = cfg
        self.tile = tile
        # Multi-device execution (SURVEY §7 phase 6): with a
        # jax.sharding.Mesh the engine keeps the map sharded over
        # `map_axis` and uploads each frame's cloud sharded over
        # `data_axis`; the SAME jitted step then compiles as a GSPMD
        # program (jit propagates committed input shardings), and every
        # host-side state surgery (init, growth, eviction, backend
        # corrections, resume) re-places the state on the mesh.  On a
        # multi-process ("hosts", "devices") mesh pass data_axis="devices",
        # map_axis="hosts".
        self.mesh = mesh
        self._data_axis, self._map_axis = data_axis, map_axis
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as _P

            from bshot_slam_tpu.parallel.sharded import mesh_runtime_overrides

            self.cfg = cfg = mesh_runtime_overrides(
                cfg, mesh.shape[data_axis]
            )
            self._pts_sharding = NamedSharding(mesh, _P(data_axis, None))
            self._mask_sharding = NamedSharding(mesh, _P(data_axis))
            # The device-preprocessed FUSED ingest (host_preprocess=False
            # + pipelined) uploads range images un-sharded; on a
            # process-spanning mesh that mixes locally-committed inputs
            # with globally-sharded state.  Mesh mode supports the
            # host-preprocess (default) and process_cloud ingests.
            if not host_preprocess and pipelined:
                raise ValueError(
                    "mesh mode requires the host-preprocess ingest "
                    "(host_preprocess=True) in pipelined mode; the fused "
                    "device-preprocess path is single-device-only"
                )
        # Default ingest: preprocess on the HOST (numpy) and upload the
        # compact cloud.  The 32-step ground walk is microseconds of ALU
        # work that costs milliseconds (and minutes of XLA compile) on the
        # accelerator, and host-side counting makes the cloud bucket exact
        # per frame — no overflow machinery on this path (see
        # ops.preprocess_host).  host_preprocess=False keeps the fully
        # device-resident fused path (odometry_step_fused).
        self.host_preprocess = host_preprocess
        # Run loop closure + pose graph + map re-anchoring every N frames
        # during the run (0 = only when the caller asks), so later frames
        # match against the corrected map.
        self.backend_every = backend_every
        # Pipelined mode defers each frame's diagnostics fetch, so host
        # work (range-image build, upload) overlaps the device executing
        # the previous step — the TPU analog of the reference's
        # capture-thread/main-loop overlap (VelodyneCapture.h:172-212).
        # process_* then returns the newest FINALIZED frame's record (None
        # until one exists); call flush() at the end.
        self.pipelined = pipelined
        # Pipelined mode: stack and fetch diagnostics for this many frames
        # in ONE device->host transfer (records lag up to fetch_every-1
        # frames until the next drain/flush).  Each transfer is one RPC on
        # remoted backends, so this divides the dominant per-frame latency.
        self.fetch_every = max(1, fetch_every)
        self._pending: List[_Pending] = []
        self._vert_cache: dict = {}  # vert-angle bytes -> device array
        self._cursor_ub = None
        self._next_bucket = None  # deferred-count bucket (pipelined mode)
        self._bucket_floor = 0
        # Lossless-bucketing state: device-side "pipeline healthy" flag
        # (cleared by an overflowing fused step, cascading the abort to all
        # later in-flight frames) and the count of frames re-dispatched at
        # their exact bucket after an overflow.  No data is ever dropped
        # (the reference emits every kept return: preprocess.cpp:201-216).
        self._ok = jnp.asarray(True)
        self.n_redispatched = 0
        self._frames_in = 0  # frames submitted (dispatched), host-side
        self.state = pipeline.init_state(cfg)
        # Start the map at the smallest capacity bucket; _maybe_grow_map
        # widens it (one recompile per bucket) as the map fills.
        first = min(
            [b for b in cfg.runtime.map_buckets if b <= cfg.map.capacity]
            or [cfg.map.capacity]
        )
        self.state = self.state._replace(map=mapstore.init_map(cfg.map, first))
        self._place_state()
        self.key = jax.random.PRNGKey(seed)
        self.records: List[FrameRecord] = []
        self.enable_backend = enable_backend
        self.keyframes = kf_mod.init_keyframes(cfg)
        self._last_kf_pose = np.eye(4, dtype=np.float32)
        self._frames_since_kf = 10**9  # force a keyframe on frame 0
        self.optimized_keyframe_poses: np.ndarray | None = None
        self.loop_edges: list = []  # last verified closures (checkpointed)
        self._warned_drop = False
        self._warned_evict = False
        self.n_evicted = 0  # cumulative keypoints evicted at capacity
        # Keyframe saturation: host mirrors of keyframes.count and the
        # keyframe positions (so neither the pipelined path nor the
        # eviction slot picker ever syncs on the device store — each
        # device->host fetch is a ~25 ms RPC on remoted backends),
        # cumulative evictions, and the one-time warning flag.
        self._kf_count = 0
        self._kf_positions: List[np.ndarray] = []
        self.n_kf_evicted = 0
        self._warned_kf_evict = False
        # keep_corr: retain each finalized frame's correspondence pairs
        # (world-frame source keypoints + matched candidate indices +
        # inlier flags) for visualization — the reference's second viewer
        # draws exactly these every frame (odometry_test.cpp:281-345,
        # updateCorrespondence lidar_odometry.cpp:378-390).  Costs extra
        # small device fetches per frame; off unless a viewer wants it.
        self.keep_corr = keep_corr
        self.last_corr: Optional[dict] = None
        self._prev_kp_world: Optional[np.ndarray] = None

    def _place_state(self) -> None:
        """Sharded mode: (re-)commit the odometry state to the mesh
        (map rows over the map axis, the rest replicated).  Called after
        every host-side state surgery; no-op on a single device."""
        if self.mesh is None:
            return
        from bshot_slam_tpu.parallel.sharded import state_shardings

        self.state = jax.device_put(
            self.state, state_shardings(self.mesh, self._map_axis)
        )

    def _device_points(self, points) -> jnp.ndarray:
        """Upload a frame's cloud, sharded over the data axis on a mesh."""
        if self.mesh is None:
            return jnp.asarray(points)
        return jax.device_put(np.asarray(points), self._pts_sharding)

    def process_sweep(self, sweep: LaserSweep,
                      selected: Optional[np.ndarray] = None) -> FrameRecord:
        ri = build_range_image(sweep, self.cfg.sensor, selected)
        return self.process_range_image(
            ri.range_mm, ri.azimuth_rad, ri.vert_rad, ri.selected
        )

    def process_frame(self, frame):
        """Dispatch on ingest type: a raw LaserSweep (host-side binning) or
        an upload-ready RangeImage (e.g. from io.native_decoder.
        NativeSweepStream, where the C++ producer thread already binned)."""
        from bshot_slam_tpu.ops.rangeimage import RangeImage

        if isinstance(frame, RangeImage):
            return self.process_range_image(
                frame.range_mm, frame.azimuth_rad, frame.vert_rad
            )
        return self.process_sweep(frame)

    def process_range_image(
        self,
        range_mm: np.ndarray,
        azimuth_rad: np.ndarray,
        vert_rad: np.ndarray,
        selected: Optional[np.ndarray] = None,
    ) -> FrameRecord:
        # Capacity bucketing: extract_cloud front-compacts kept points, so
        # slicing to the smallest bucket >= n_valid preserves every valid
        # point while shrinking the O(N^2) neighborhood grids (~4-8x fewer
        # Pallas grid steps on typical urban frames).
        if self.host_preprocess:
            # Native C++ classify+extract when built (~2 ms/frame vs ~11 ms
            # numpy; cell-exact classes — cross-tested), numpy fallback.
            from bshot_slam_tpu.io import native_decoder as nd

            out = nd.preprocess_extract_native(
                range_mm, azimuth_rad, vert_rad, self.cfg.preprocess,
                selected, self.cfg.preprocess.max_points,
            )
            if out is not None:
                pts, nv, _ = out
            else:
                from bshot_slam_tpu.ops import preprocess_host as ph

                classes, xyz, valid = ph.preprocess_host(
                    range_mm, azimuth_rad, vert_rad, self.cfg.preprocess
                )
                pts, nv = ph.extract_cloud_host(
                    classes, xyz, valid, selected,
                    self.cfg.preprocess.max_points,
                )
            b = pick_bucket(nv, self.cfg)
            points = np.zeros((b, 3), np.float32)
            points[:nv] = pts
            return self.process_compact(points, nv)
        if self.pipelined:
            # Remote fetches are the per-frame bottleneck (one tunnel RPC
            # each); bucket from the PREVIOUS frame's count (delivered free
            # inside its packed diagnostics) with 15% headroom instead of
            # syncing on this frame's count.  Overflows never lose data:
            # the fused step aborts (state passthrough) and the host
            # re-dispatches at the exact bucket (see _redispatch).
            range_az = np.stack(
                [np.asarray(range_mm, np.float32),
                 np.asarray(azimuth_rad, np.float32)]
            )
            if self._next_bucket is None:
                # One-time bootstrap: sync on this frame's exact count to
                # seed the bucket feedback loop (the only count sync in a
                # pipelined run).
                _, _, n_valid_dev = _ingest(
                    jnp.asarray(range_mm), jnp.asarray(azimuth_rad),
                    jnp.asarray(vert_rad),
                    jnp.asarray(selected) if selected is not None else None,
                    self.cfg.preprocess, self.cfg.preprocess.max_points,
                )
                nv = int(n_valid_dev)
                self._bucket_floor = nv
                self._next_bucket = pick_bucket(
                    int(self.cfg.runtime.bucket_headroom * nv), self.cfg
                )
            bucket = self._next_bucket
            self._maybe_grow_map()
            # The default select mask is all-True; skip its upload (the
            # fused step treats None as select-everything).
            sel = selected
            if sel is not None and bool(np.all(sel)):
                sel = None
            vert_np = np.asarray(vert_rad, np.float32)
            cap = self.state.map.positions.shape[0]
            self.state, self.key, self._ok, diag = pipeline.odometry_step_fused(
                self.state, self.key, self._ok, jnp.asarray(range_az),
                self._device_vert(vert_np),
                jnp.asarray(sel) if sel is not None else None,
                self.cfg.preprocess, self.cfg, bucket, self.tile,
            )
            ri = {"range_az": range_az, "vert": vert_np, "sel": sel}
            return self._enqueue(diag, ri, cap)
        points, pmask, n_valid_dev = _ingest(
            jnp.asarray(range_mm), jnp.asarray(azimuth_rad),
            jnp.asarray(vert_rad),
            jnp.asarray(selected) if selected is not None else None,
            self.cfg.preprocess, self.cfg.preprocess.max_points,
        )
        nv = int(n_valid_dev)
        b = pick_bucket(nv, self.cfg)
        if b < points.shape[0]:
            points, pmask = points[:b], pmask[:b]
        return self.process_cloud(points, pmask, n_valid_dev)

    def process_compact(self, points: np.ndarray, n_valid: int):
        """One frame from a host-preprocessed compact cloud: points
        (bucket, 3) front-compacted, n_valid exact.  One (bucket, 3)
        upload + one dispatch; the validity mask is derived on device."""
        if self.pipelined and any(e.ri is not None for e in self._pending):
            # Mixed fused/compact usage: the compact step has no abort
            # cascade, so an in-flight fused overflow could be silently
            # built upon — drain the fused frames first (rare path).
            self._drain(keep=0)
        self._maybe_grow_map()
        self.key, sub = jax.random.split(self.key)
        cap = self.state.map.positions.shape[0]
        self.state, diag = pipeline.odometry_step_compact(
            self.state, self._device_points(points), np.int32(n_valid), sub,
            self.cfg, self.tile,
        )
        if self.pipelined:
            return self._enqueue(diag, None, cap)
        return self._finalize(diag, np.asarray(diag.packed), cap)

    def process_cloud(self, points: jnp.ndarray, pmask: jnp.ndarray,
                      n_valid_dev: Optional[jnp.ndarray] = None):
        if self.mesh is not None:
            points = self._device_points(points)
            pmask = jax.device_put(np.asarray(pmask), self._mask_sharding)
        if self.pipelined and any(e.ri is not None for e in self._pending):
            # Mixed fused/pre-sliced usage: the plain step below has no
            # abort cascade, so an in-flight fused overflow could be
            # silently built upon.  Drain the fused frames first (rare:
            # callers normally stick to one ingest path).
            self._drain(keep=0)
        self._maybe_grow_map()
        self.key, sub = jax.random.split(self.key)
        if self.pipelined:
            # The pre-slice cloud count rides inside packed (one fetch
            # covers diagnostics + the bucket feedback loop).  Points are
            # already sliced to a bucket >= n_valid by the caller, so this
            # path cannot overflow (committed is constant 1).
            nv = (
                n_valid_dev if n_valid_dev is not None
                else jnp.sum(pmask.astype(jnp.int32))
            )
            cap = self.state.map.positions.shape[0]
            self.state, diag = pipeline.odometry_step(
                self.state, points, pmask, sub, self.cfg, self.tile,
                n_valid=nv,
            )
            return self._enqueue(diag, None, cap)
        self.state, diag = pipeline.odometry_step(
            self.state, points, pmask, sub, self.cfg, self.tile
        )
        return self._finalize(diag, np.asarray(diag.packed),
                              self.state.map.positions.shape[0])

    def _enqueue(self, diag, ri: Optional[dict],
                 map_cap: int) -> Optional[FrameRecord]:
        """Pipelined mode: queue a frame's diagnostics for a later batched
        fetch; returns the newest already-finalized record (lagged)."""
        try:
            # Start the device->host copy now so the drain reads a landed
            # buffer instead of paying the RPC latency.
            diag.packed.copy_to_host_async()
        except Exception:
            pass  # backend without async host copies
        self._pending.append(_Pending(diag, diag.packed, ri, map_cap))
        self._frames_in += 1
        rec = None
        if (
            self.enable_backend
            and self.backend_every
            and self._frames_in % self.backend_every == 0
        ):
            # Periodic backend pass: drain the whole pipeline first so the
            # corrections land at exactly the same frame as in synchronous
            # mode (one stall every backend_every frames).
            rec = self._drain(keep=0)
        elif len(self._pending) > self.fetch_every:
            # (Eagerly draining rows whose async copy has landed sounds
            # attractive but measured 2x SLOWER through the axon tunnel —
            # every is_ready poll/fetch is an RPC.  Batched drains it is.)
            rec = self._drain(keep=1)
        if rec is not None:
            return rec
        return self.records[-1] if self.records else None

    def _device_vert(self, vert_rad: np.ndarray) -> jnp.ndarray:
        """Cache the (tiny, per-sensor-constant) vertical-angle vector on
        device so the fused path never re-uploads it."""
        k = np.asarray(vert_rad, np.float32).tobytes()
        dev = self._vert_cache.get(k)
        if dev is None:
            dev = jnp.asarray(np.frombuffer(k, np.float32))
            self._vert_cache[k] = dev
        return dev

    def flush(self) -> Optional[FrameRecord]:
        """Pipelined mode: finalize all in-flight frames (call after the
        last process_* call; returns the final record, or None)."""
        return self._drain(keep=0)

    def _drain(self, keep: int) -> Optional[FrameRecord]:
        """Fetch + finalize pending diagnostics down to `keep` in flight,
        oldest first, as one stacked device->host transfer.  An uncommitted
        row (bucket overflow) diverts every later in-flight frame to the
        lossless re-dispatch path."""
        n = len(self._pending) - keep
        if n <= 0:
            return None
        batch, self._pending = self._pending[:n], self._pending[n:]
        pks = np.asarray(jnp.stack([e.packed for e in batch]))
        rec = None
        for i, (entry, pk) in enumerate(zip(batch, pks)):
            if (pk.shape[0] > pipeline.PACKED_LEN
                    and pk[pipeline.IDX_COMMITTED] == 0.0):
                # This frame overflowed its predicted bucket (or aborted in
                # cascade).  Everything from here on — fetched or still in
                # flight — was a device no-op; re-run it losslessly.
                stalled = batch[i:] + self._pending
                self._pending = []
                redo = self._redispatch(stalled, keep)
                return redo if redo is not None else rec
            last = i == len(batch) - 1 and not self._pending
            rec = self._finalize_row(entry, pk, can_backend=last)
        return rec

    def _finalize_row(self, entry: _Pending, pk: np.ndarray,
                      can_backend: bool = True) -> FrameRecord:
        """Finalize one packed row with its [n_valid, bucket, ok] tail:
        bucket feedback, then the standard record build."""
        n_valid = int(pk[pipeline.IDX_N_VALID])
        # Decaying floor: one spike should not inflate every later frame's
        # bucket forever, but repeated overflow thrash is damped.
        rt = self.cfg.runtime
        self._bucket_floor = max(
            n_valid, int(self._bucket_floor * rt.bucket_floor_decay)
        )
        self._next_bucket = pick_bucket(
            max(int(rt.bucket_headroom * n_valid), self._bucket_floor),
            self.cfg,
        )
        return self._finalize(entry.diag, pk, entry.map_cap, can_backend)

    def _redispatch(self, stalled: List[_Pending],
                    keep: int) -> Optional[FrameRecord]:
        """Lossless overflow recovery: re-run the stalled frames, in order,
        each at the exact bucket its (already computed) point count needs.
        The aborted steps never touched state or the PRNG key, so the
        result is exactly what a synchronous run would have produced.  The
        re-dispatches re-enter the normal pending queue (drained back down
        to `keep`), so the pipeline keeps flowing."""
        self._ok = jnp.asarray(True)
        rows = np.asarray(jnp.stack([e.packed for e in stalled]))
        self.n_redispatched += len(stalled)
        for entry, pk in zip(stalled, rows):
            assert entry.ri is not None, (
                "non-fused pipelined rows carry pre-sliced clouds and "
                "cannot overflow"
            )
            nv = int(pk[pipeline.IDX_N_VALID])
            b = pick_bucket(nv, self.cfg)
            self._maybe_grow_map()
            cap = self.state.map.positions.shape[0]
            ri = entry.ri
            self.state, self.key, self._ok, diag = pipeline.odometry_step_fused(
                self.state, self.key, self._ok, jnp.asarray(ri["range_az"]),
                self._device_vert(ri["vert"]),
                jnp.asarray(ri["sel"]) if ri["sel"] is not None else None,
                self.cfg.preprocess, self.cfg, b, self.tile,
            )
            self._pending.append(_Pending(diag, diag.packed, ri, cap))
        # Exact buckets cannot overflow again, so this recursion is bounded.
        return self._drain(keep=keep)

    def _finalize(self, diag, pk: np.ndarray, map_cap: int,
                  can_backend: bool = True) -> FrameRecord:
        # One host fetch for all scalar diagnostics (pipeline packs them),
        # instead of seven round trips — dominant cost on remoted devices.
        P = pipeline
        rec = FrameRecord(
            pose=pk[:16].reshape(4, 4).astype(np.float32),
            n_inliers=int(pk[P.IDX_N_INLIERS]),
            n_mutual=int(pk[P.IDX_N_MUTUAL]),
            gated=bool(pk[P.IDX_GATED] > 0),
            map_size=int(pk[P.IDX_MAP_SIZE]),
            icp_rmse=float(pk[P.IDX_ICP_RMSE]),
            corr_stats=pk[P.IDX_CORR_STATS:P.IDX_CORR_STATS + 3].copy(),
            n_dropped=int(pk[P.IDX_N_DROPPED]),
        )
        if rec.n_dropped > 0 and not self._warned_drop:
            self._warned_drop = True
            import warnings

            warnings.warn(
                f"map capacity {self.cfg.map.capacity} saturated at frame "
                f"{len(self.records)}: {rec.n_dropped} keypoint(s) dropped "
                "(raise MapConfig.capacity or rely on eviction)",
                stacklevel=2,
            )
        if self.enable_backend:
            self._maybe_keyframe(diag, rec,
                                 abs_frame=int(pk[pipeline.IDX_FRAME]),
                                 map_cap=map_cap)
        if self.keep_corr and diag is not None:
            kp = np.asarray(diag.features.keypoints)
            kp_w = kp @ rec.pose[:3, :3].T + rec.pose[:3, 3]
            self.last_corr = {
                "src_world": kp_w,
                "index": np.asarray(diag.corr_index),
                "inlier": np.asarray(diag.corr_inlier)
                & np.asarray(diag.features.mask),
                "map_cap": map_cap,
                "prev_src_world": self._prev_kp_world,
            }
            self._prev_kp_world = kp_w
        self.records.append(rec)
        if (
            can_backend
            and self.enable_backend
            and self.backend_every
            and len(self.records) % self.backend_every == 0
            and int(self.keyframes.count) >= 2
        ):
            self.optimize_backend()
            self.apply_backend_corrections()
            rec = self.records[-1]  # pose may have been corrected
        return rec

    def _maybe_grow_map(self) -> None:
        """Pad the map to the next capacity bucket when this frame's insert
        could overflow it (map ops scale with live capacity, so starting
        small and growing keeps matching/ICP/dedup grids minimal).  At the
        hard capacity ceiling, evict lowest-seg-ratio-in-densest-block
        keypoints instead of letting inserts drop silently."""
        cap = self.state.map.positions.shape[0]
        hard_cap = self.cfg.map.capacity
        inc = self.cfg.keypoints.top_k
        if self.pipelined:
            # Host-side cursor upper bound (each step appends <= top_k), so
            # growth decisions never force a device sync mid-pipeline;
            # growing a few frames early is harmless.
            if self._cursor_ub is None:
                self._cursor_ub = int(self.state.map.cursor)
            cursor = self._cursor_ub
            if cursor + inc > min(cap, hard_cap):
                # The bound is pessimistic (insert dedup rejects most
                # revisited keypoints), so before an expensive grow/evict
                # decision re-sync it to the true cursor — one rare fetch
                # instead of unnecessarily evicting live landmarks.
                cursor = int(self.state.map.cursor)
                self._cursor_ub = cursor
            self._cursor_ub += inc
        else:
            cursor = int(self.state.map.cursor)
        need = cursor + inc
        if need <= cap:
            return
        for b in sorted(set(self.cfg.runtime.map_buckets) | {hard_cap}):
            if b >= min(need, hard_cap) and b <= hard_cap and b > cap:
                self.state = self.state._replace(
                    map=mapstore.grow_map(self.state.map, b)
                )
                self._place_state()
                return
        if need <= hard_cap:
            return
        # At the ceiling: make room for this frame (fixed n_evict so the
        # eviction kernel compiles once).
        n_evict = min(2 * self.cfg.keypoints.top_k, hard_cap // 2)
        before = int(self.state.map.cursor)
        self.state = self.state._replace(
            map=mapstore.evict_keypoints(self.state.map, n_evict)
        )
        self._place_state()
        evicted = before - int(self.state.map.cursor)
        self.n_evicted += evicted
        if self.pipelined:  # re-sync the host bound to the true cursor
            self._cursor_ub = int(self.state.map.cursor)
        if evicted and not self._warned_evict:
            self._warned_evict = True
            import warnings

            warnings.warn(
                f"map at hard capacity {hard_cap}: evicting weakest "
                f"keypoints of the densest blocks ({evicted} this frame)",
                stacklevel=2,
            )

    def _maybe_keyframe(self, diag, rec: FrameRecord, abs_frame: int,
                        map_cap: int) -> None:
        from bshot_slam_tpu.backend import keyframes as kf_mod

        if not kf_mod.should_add_keyframe(
            self._last_kf_pose, rec.pose, self._frames_since_kf, self.cfg.backend
        ):
            self._frames_since_kf += 1
            return
        # Saturation: evict the most redundant keyframe (smallest created
        # pose gap, anchor + recent quarter protected) instead of silently
        # dropping new loop-closure/BA material at max_keyframes.
        Mk = self.cfg.backend.max_keyframes
        if self._kf_count >= Mk:
            slot = kf_mod.pick_eviction_slot(
                np.asarray(self._kf_positions), self._kf_count
            )
            self.keyframes = kf_mod.evict_keyframe(
                self.keyframes, jnp.asarray(slot, jnp.int32)
            )
            del self._kf_positions[slot]
            self._kf_count -= 1
            self.n_kf_evicted += 1
            if not self._warned_kf_evict:
                self._warned_kf_evict = True
                import warnings

                warnings.warn(
                    f"keyframe store saturated at {Mk}: evicting the most "
                    "redundant keyframe per new add (raise "
                    "BackendConfig.max_keyframes for long sequences)",
                    stacklevel=2,
                )
        # Landmark observations: inlier matches whose candidate index falls
        # inside the map capacity AT STEP TIME (the rest matched the
        # previous frame's keypoint block appended after it; the map may
        # have grown since dispatch in pipelined mode, hence map_cap).
        obs_lm = jnp.where(
            diag.corr_inlier & (diag.corr_index < map_cap), diag.corr_index, -1
        )
        # Absolute frame index (consistent with MapState.frame_born, which
        # odometry_step stamps with the pre-increment state.frame_idx) —
        # rides inside the packed diagnostics, so no device sync here.
        self.keyframes = kf_mod.add_keyframe(
            self.keyframes, jnp.asarray(rec.pose), diag.features,
            jnp.asarray(abs_frame), obs_lm,
        )
        self._kf_count += 1
        self._kf_positions.append(np.asarray(rec.pose[:3, 3]))
        self._last_kf_pose = rec.pose
        self._frames_since_kf = 1

    def optimize_backend(self, max_candidates: int = 8):
        """Loop-closure detection + pose-graph optimization over keyframes.

        Returns (optimized keyframe poses (n,4,4), loop edges).  Also keeps
        them on self.optimized_keyframe_poses.
        """
        from bshot_slam_tpu.backend import loop_closure, posegraph

        n = int(self.keyframes.count)
        if n < 2:
            # Degenerate graph: nothing to optimize; return only the real
            # keyframe poses (0 or 1) so callers can slice frame_idx safely.
            return np.asarray(self.keyframes.poses[:n]), []
        self.key, sub = jax.random.split(self.key)
        edges = loop_closure.find_loop_closures(self.keyframes, self.cfg, sub,
                                                max_candidates)
        self.loop_edges = edges
        # Pad nodes to a power-of-two bucket (repeating the last pose; the
        # implied identity chain edges are self-consistent and inert) and
        # loop edges to a multiple of 4 (mask False), so periodic backend
        # invocation compiles one solver per bucket, not one per call.
        kf_np = np.asarray(self.keyframes.poses[:n])
        bucket = 8
        while bucket < n:
            bucket *= 2
        bucket = min(bucket, max(self.cfg.backend.max_keyframes, n))
        if bucket > n:
            kf_np = np.concatenate(
                [kf_np, np.tile(kf_np[-1], (bucket - n, 1, 1))]
            )
        bcfg = self.cfg.backend
        w_odom = (1000.0 / bcfg.odom_edge_sigma_mm) ** 2
        g = posegraph.odometry_edges(jnp.asarray(kf_np), weight=w_odom)
        if edges:
            e_pad = (-len(edges)) % 4
            ei = [e.kf_i for e in edges] + [0] * e_pad
            ej = [e.kf_j for e in edges] + [0] * e_pad
            ez = np.stack(
                [e.z for e in edges]
                + [np.eye(4, dtype=np.float32)] * e_pad
            )
            ew = [
                (1000.0 / max(e.rmse_mm, bcfg.lc_sigma_floor_mm)) ** 2
                for e in edges
            ] + [0.0] * e_pad
            emask = jnp.asarray([True] * len(edges) + [False] * e_pad)
            g = posegraph.add_edges(
                g, jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(ez),
                jnp.asarray(ew),
            )
            g = g._replace(
                edge_mask=g.edge_mask.at[-len(emask):].set(emask)
            )
        res = posegraph.optimize_pose_graph(
            g, iterations=self.cfg.backend.gn_iterations
        )
        self.optimized_keyframe_poses = np.asarray(res.poses)[:n]
        return self.optimized_keyframe_poses, edges

    def apply_backend_corrections(self) -> dict:
        """Propagate optimized keyframe poses into the recorded trajectory,
        the live reference pose, and the global map.

        Per-keyframe corrections ``T_opt @ inv(T_raw)`` are interpolated to
        every frame by se3 twist interpolation and landmarks are re-anchored
        by their `frame_born` provenance, so frames processed after this
        call match against the corrected map (no reference counterpart: the
        reference map is never corrected, SURVEY §5).
        """
        from bshot_slam_tpu.backend import corrections as corr_mod

        if self.optimized_keyframe_poses is None:
            self.optimize_backend()
        n_kf = int(self.keyframes.count)
        if n_kf < 2 or not self.records:
            return {"max_correction_mm": 0.0, "n_landmarks_moved": 0}
        kf_opt = self.optimized_keyframe_poses.astype(np.float32)
        kf_raw = np.asarray(self.keyframes.poses[:n_kf])
        corr_kf = kf_opt @ np.linalg.inv(kf_raw)
        frame0 = int(self.state.frame_idx) - len(self.records)
        kf_frames = np.asarray(self.keyframes.frame_idx[:n_kf]) - frame0
        F = len(self.records)
        corr = np.asarray(
            corr_mod.interpolate_corrections(
                jnp.asarray(corr_kf),
                jnp.asarray(kf_frames.astype(np.int32)),
                jnp.arange(F, dtype=jnp.int32),
            )
        )
        for f, r in enumerate(self.records):
            r.pose = (corr[f] @ r.pose).astype(np.float32)
        new_map = corr_mod.reanchor_map(
            self.state.map, jnp.asarray(corr),
            jnp.asarray(frame0, jnp.int32), self.cfg.map,
        )
        self.state = self.state._replace(
            map=new_map,
            ref_pose=jnp.asarray(
                (corr[-1] @ np.asarray(self.state.ref_pose)).astype(np.float32)
            ),
        )
        self._place_state()
        # Keyframe store poses become the optimized ones so the next graph
        # build does not double-correct.
        self.keyframes = self.keyframes._replace(
            poses=self.keyframes.poses.at[:n_kf].set(jnp.asarray(kf_opt))
        )
        # Host position mirror follows (it feeds the eviction slot picker).
        self._kf_positions[:n_kf] = list(kf_opt[:, :3, 3])
        self._last_kf_pose = (corr_kf[-1] @ self._last_kf_pose).astype(
            np.float32
        )
        self.optimized_keyframe_poses = None  # consumed
        n_moved = int(
            np.sum(
                np.asarray(self.state.map.valid)
                & (np.asarray(self.state.map.frame_born) >= 0)
            )
        )
        return {
            "max_correction_mm": float(
                np.max(np.linalg.norm(corr[:, :3, 3], axis=-1))
            ),
            "n_landmarks_moved": n_moved,
        }

    def build_ba_problem(self):
        """Assemble a bundle-adjustment problem from keyframe landmark
        observations (map landmarks seen as RANSAC inliers at keyframes)."""
        from bshot_slam_tpu.backend.ba import BAProblem

        n = int(self.keyframes.count)
        kf_poses = np.asarray(self.keyframes.poses[:n])
        obs_lm = np.asarray(self.keyframes.obs_lm[:n])  # (n, K)
        kp = np.asarray(self.keyframes.keypoints[:n])  # (n, K, 3)
        kf_idx, kp_idx = np.nonzero(obs_lm >= 0)
        lm_raw = obs_lm[kf_idx, kp_idx]
        uniq, compact = np.unique(lm_raw, return_inverse=True)
        L = min(len(uniq), self.cfg.backend.ba_max_landmarks)
        keep = compact < L
        kf_idx, kp_idx, compact = kf_idx[keep], kp_idx[keep], compact[keep]
        landmarks = np.asarray(self.state.map.positions)[uniq[:L]]
        return BAProblem(
            poses=jnp.asarray(kf_poses),
            landmarks=jnp.asarray(landmarks.astype(np.float32)),
            obs_kf=jnp.asarray(kf_idx.astype(np.int32)),
            obs_lm=jnp.asarray(compact.astype(np.int32)),
            obs_p=jnp.asarray(kp[kf_idx, kp_idx].astype(np.float32)),
            obs_mask=jnp.ones(len(kf_idx), bool),
        )

    @property
    def trajectory(self) -> np.ndarray:
        """(n, 3) positions, the reference's saved-trajectory content
        (reference: odometry_test.cpp:348-361)."""
        if not self.records:
            return np.zeros((0, 3))
        return np.stack([r.pose[:3, 3] for r in self.records])

    @property
    def poses(self) -> np.ndarray:
        if not self.records:
            return np.zeros((0, 4, 4))
        return np.stack([r.pose for r in self.records])
