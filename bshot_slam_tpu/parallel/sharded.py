"""Multi-chip sharding of the SLAM step over a JAX device mesh.

The reference is strictly single-process (SURVEY §2: no distributed backend
of any kind; its only parallelism is OpenMP loops and a capture thread).
The TPU rebuild scales along two axes of a `jax.sharding.Mesh`:

  * ``data``  — shards the point cloud rows: seg-ratio scoring, normal
    estimation and the neighborhood sweeps each evaluate a query-row shard
    per device while reference tiles stream to all devices (the SPMD analog
    of the reference's OpenMP parallel-for, bshot_bits.h:61-63).
  * ``map``   — shards the global map capacity: Hamming matching evaluates
    each map shard locally, and the mutual-NN argmin reduces across shards
    (XLA inserts the min/argmin collectives); map insertion scatters into
    the owning shard.

Shardings are declared with `NamedSharding`/`PartitionSpec` on the step's
inputs and outputs and GSPMD propagates them through the whole program —
the "pick a mesh, annotate, let XLA insert collectives" recipe.  Collectives
ride ICI inside a slice; nothing here assumes host count.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bshot_slam_tpu.config import SlamConfig
from bshot_slam_tpu.odometry import pipeline
from bshot_slam_tpu.odometry.mapstore import MapState
from bshot_slam_tpu.odometry.pipeline import FrameFeatures, OdometryState


def make_mesh(devices: Sequence[jax.Device] | None = None,
              axes: Tuple[str, str] = ("data", "map")) -> Mesh:
    """2D mesh over the given devices; the device count is factored as
    evenly as possible between the two axes.

    Use power-of-two device counts: every sharded dimension (cloud buckets,
    map capacities, BA observation padding) is a power of two, so each mesh
    axis must be one too or GSPMD rejects the sharding.  TPU slices come in
    powers of two, so this costs nothing in practice."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    d_data = 1
    for f in range(int(np.sqrt(n)), 0, -1):
        if n % f == 0:
            d_data = f
            break
    mesh_devs = np.asarray(devices).reshape(d_data, n // d_data)
    return Mesh(mesh_devs, axes)


def state_shardings(mesh: Mesh, map_axis: str = "map") -> OdometryState:
    """PartitionSpec pytree for OdometryState: map rows on `map_axis`,
    rest replicated.  `map_axis` is "map" on a single-host chip mesh and
    "hosts" on a multi-process ("hosts", "devices") mesh (the SURVEY §7
    phase-6 layout: map voxel blocks sharded across hosts)."""
    def ns(spec):
        return NamedSharding(mesh, spec)

    map_spec = MapState(
        positions=ns(P(map_axis, None)),
        descriptors=ns(P(map_axis, None)),
        seg_ratios=ns(P(map_axis)),
        blocks=ns(P(map_axis, None)),
        valid=ns(P(map_axis)),
        cursor=ns(P()),
        frame_born=ns(P(map_axis)),
        n_dropped=ns(P()),
    )
    ref_spec = FrameFeatures(
        keypoints=ns(P()), scores=ns(P()), descriptors=ns(P()), mask=ns(P()),
    )
    return OdometryState(
        map=map_spec, ref=ref_spec, ref_pose=ns(P()), frame_idx=ns(P()),
    )


def mesh_runtime_overrides(cfg: SlamConfig, n_data: int) -> SlamConfig:
    """Config overrides for MESH execution (single-chip and mesh optima
    differ; used by both sharded_odometry_step and SlamEngine mesh mode):

      * window compaction OFF — its widx gather would all-gather the map
        arrays across the map axis (~7 MB/step measured), while the dense
        masked scan it replaces is ALREADY partitioned over that axis.
      * two-stage top-k ON, chunk count a multiple of the data-shard
        count — makes stage one shard-local, replacing GSPMD's
        approx_top_k resharding all-to-all (59 MB/step, r4) with one
        small survivor gather (COLLECTIVES_r05: 71.8 -> 22.7 MB/step).
    """
    import dataclasses as _dc

    chunks = n_data * max(1, 8 // n_data)
    return _dc.replace(
        cfg,
        runtime=_dc.replace(
            cfg.runtime, window_compact=False, topk_chunks=chunks
        ),
    )


def sharded_odometry_step(
    mesh: Mesh, cfg: SlamConfig, tile: int = 2048,
    data_axis: str = "data", map_axis: str = "map",
) -> Tuple[Callable, Callable]:
    """Returns (step, shard_state).

    step(state, points, pmask, key) is the full odometry step jitted with
    data/map shardings; shard_state places an OdometryState onto the mesh.
    On a multi-host mesh pass data_axis="devices", map_axis="hosts".
    """
    st_sh = state_shardings(mesh, map_axis)
    pts_sh = NamedSharding(mesh, P(data_axis, None))
    mask_sh = NamedSharding(mesh, P(data_axis))
    repl = NamedSharding(mesh, P())

    cfg = mesh_runtime_overrides(cfg, mesh.shape[data_axis])

    def _step(state, points, pmask, key):
        return pipeline.odometry_step.__wrapped__(
            state, points, pmask, key, cfg, tile
        )

    step = jax.jit(
        _step,
        in_shardings=(st_sh, pts_sh, mask_sh, repl),
        out_shardings=(st_sh, None),
        static_argnums=(),
    )

    def shard_state(state: OdometryState) -> OdometryState:
        return jax.device_put(state, st_sh)

    return step, shard_state


import functools as _ft


@_ft.lru_cache(maxsize=16)
def _ba_solver(mesh: Mesh, gn_iterations: int, cg_iterations: int):
    """Cached jitted sharded BA solver for a mesh (jit caches by function
    identity, so building a fresh partial per call would recompile every
    solve)."""
    from bshot_slam_tpu.backend import ba as ba_mod

    repl = NamedSharding(mesh, P())
    obs = NamedSharding(mesh, P(mesh.axis_names))
    obs2 = NamedSharding(mesh, P(mesh.axis_names, None))
    in_sh = ba_mod.BAProblem(
        poses=repl, landmarks=repl, obs_kf=obs, obs_lm=obs, obs_p=obs2,
        obs_mask=obs,
    )
    solve = jax.jit(
        _ft.partial(
            ba_mod.ba_solve.__wrapped__,
            gn_iterations=gn_iterations,
            cg_iterations=cg_iterations,
        ),
        in_shardings=(in_sh,),
        out_shardings=None,
    )
    return solve, in_sh


def sharded_ba_solve(
    mesh: Mesh,
    prob,
    gn_iterations: int = 5,
    cg_iterations: int = 20,
):
    """Bundle adjustment with the observation axis sharded over every mesh
    device (SURVEY §7 phase 6): the per-observation residual/Jacobian math
    runs shard-local and GSPMD turns each `segment_sum` into the
    reduce/psum of the reduced camera system.  Pose/landmark states stay
    replicated (they are tiny next to the observation set).

    Observations are zero-mask padded to a multiple of the device count.
    """
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    O = prob.obs_kf.shape[0]
    pad = (-O) % n_dev
    if pad:
        prob = prob._replace(
            obs_kf=jnp.concatenate(
                [prob.obs_kf, jnp.zeros(pad, prob.obs_kf.dtype)]
            ),
            obs_lm=jnp.concatenate(
                [prob.obs_lm, jnp.zeros(pad, prob.obs_lm.dtype)]
            ),
            obs_p=jnp.concatenate(
                [prob.obs_p, jnp.zeros((pad, 3), prob.obs_p.dtype)]
            ),
            obs_mask=jnp.concatenate([prob.obs_mask, jnp.zeros(pad, bool)]),
        )
    solve, in_sh = _ba_solver(mesh, gn_iterations, cg_iterations)
    return solve(jax.device_put(prob, in_sh))
