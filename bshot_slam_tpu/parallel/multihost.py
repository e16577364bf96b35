"""Multi-HOST execution: the sharded SLAM step over a process-spanning mesh.

The reference is a single process end to end (SURVEY §2: no distributed
backend of any kind).  This module opens the host dimension the TPU way
(SURVEY §7 phase 6): `jax.distributed` initialization, a
("hosts", "devices") mesh whose first axis spans processes, and the SAME
odometry-step program as `parallel.sharded` with the global map's rows
sharded across hosts — GSPMD inserts the cross-host collectives, which
ride DCN between hosts and ICI within a host's slice.

What actually crosses DCN per frame (cost model, default config, H hosts):

  * mutual-NN Hamming argmin reduce: each host scores its C/H map rows
    locally; combining per-host (best distance, index) pairs for the
    K=600 source keypoints moves ~K * 8 B per direction ≈ 10 KB/frame.
  * ICP nearest-neighbor reduce: same shape per iteration ≈ 10 KB x 10.
  * map insert scatter: <= K keypoints' rows (pos 12 B + packed
    descriptor 44 B + seg 4 B + block 12 B + flags) ≈ 45 KB to the
    owning host.
  * ref-frame feature broadcast: ~36 KB replicated.

  Total ≈ 200 KB/frame — microseconds of DCN, so the host axis scales
  map CAPACITY (each host holds C/H rows) at negligible per-frame
  communication cost; the matching/dedup grids also shrink by H per
  host, which is where the compute speedup comes from.

Verified by a real two-process CPU test (tests/test_multihost.py) that
runs one coordinator + two workers over localhost, asserts each process
holds only its own map shard, and checks the step's outputs against the
single-process reference.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from bshot_slam_tpu.config import SlamConfig
from bshot_slam_tpu.parallel import sharded

HOST_AXES: Tuple[str, str] = ("hosts", "devices")


def initialize(coordinator_address: str, num_processes: int,
               process_id: int) -> None:
    """Join the jax.distributed runtime (call before any jax computation).

    For TPU pods the three arguments are inferred from the environment and
    `jax.distributed.initialize()` may be called bare; this explicit form
    also serves CPU/localhost process sets (the test harness)."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_mesh(axes: Tuple[str, str] = HOST_AXES) -> Mesh:
    """("hosts", "devices") mesh: first axis spans processes, second the
    devices local to each process.  Requires every process to hold the
    same local device count (true on TPU slices and the CPU test rig)."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n_proc = jax.process_count()
    per = len(devs) // n_proc
    grid = np.asarray(devs).reshape(n_proc, per)
    return Mesh(grid, axes)


def multihost_odometry_step(mesh: Mesh, cfg: SlamConfig, tile: int = 2048):
    """The sharded odometry step with map rows across HOSTS and cloud rows
    across each host's local devices — same program as the single-host
    mesh, different axis mapping (that is the point)."""
    return sharded.sharded_odometry_step(
        mesh, cfg, tile, data_axis="devices", map_axis="hosts"
    )


def make_global(mesh: Mesh, spec_tree, host_tree):
    """Build global jax.Arrays from identical host-local numpy pytrees.

    Every process passes the same full-size host array; each device picks
    out its shard via the sharding's index map (the standard
    make_array_from_callback pattern)."""
    def one(sharding, arr):
        arr = np.asarray(arr)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    return jax.tree.map(one, spec_tree, host_tree)
