"""Worker process for the two-process multi-host test (run by
tests/test_multihost.py, not by pytest directly).

Usage: python tests/multihost_worker.py <process_id> <num_processes> <port>

Joins the jax.distributed runtime over localhost, builds the
("hosts", "devices") mesh (each process contributing 4 virtual CPU
devices), and checks:

  * ONE sharded odometry step's pose/diagnostics match this process's own
    single-process reference run (GSPMD correctness across processes);
  * the global map is PHYSICALLY partitioned: this process addresses only
    its own half of the map rows (sharding across hosts, SURVEY §7
    phase 6 — not silent replication);
  * the ENGINE runs a short multi-frame SEQUENCE over the process-spanning
    mesh (SPMD host loop: both processes execute identical host code) and
    its trajectory matches the single-process engine (r4 weak #1's
    multihost leg: the worker used to run exactly one step).

Prints "MULTIHOST_OK pid=<i>" on success; any assertion kills the rc.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # axon sitecustomize override


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    # Join the distributed runtime BEFORE any import that might touch the
    # XLA backend (the package __init__ sets up the compile cache).
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )

    from bshot_slam_tpu.parallel import multihost, sharded

    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, len(jax.devices())

    from bshot_slam_tpu.config import tiny_config
    from bshot_slam_tpu.odometry import pipeline

    cfg = tiny_config()
    mesh = multihost.host_mesh()
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "hosts": nproc, "devices": 4,
    }

    rng = np.random.default_rng(0)
    P_ = cfg.preprocess.max_points
    n = 512
    pts = np.zeros((P_, 3), np.float32)
    pts[:n] = rng.uniform(-15000, 15000, (n, 3)).astype(np.float32)
    pm = np.zeros(P_, bool)
    pm[:n] = True
    key = np.asarray(jax.random.PRNGKey(0))

    # Single-process reference (plain local arrays, unsharded).
    ref_state, ref_diag = pipeline.odometry_step(
        pipeline.init_state(cfg), pts, pm, jax.numpy.asarray(key), cfg, 256
    )
    ref_packed = np.asarray(ref_diag.packed)

    # Global sharded run over the process-spanning mesh.
    from jax.sharding import NamedSharding, PartitionSpec as P

    step, _ = multihost.multihost_odometry_step(mesh, cfg, tile=256)
    st_sh = sharded.state_shardings(mesh, map_axis="hosts")
    state_np = jax.tree.map(np.asarray, pipeline.init_state(cfg))
    gstate = multihost.make_global(mesh, st_sh, state_np)
    gpts = multihost.make_global(
        mesh, NamedSharding(mesh, P("devices", None)), pts
    )
    gpm = multihost.make_global(mesh, NamedSharding(mesh, P("devices")), pm)
    gkey = multihost.make_global(mesh, NamedSharding(mesh, P()), key)

    new_state, diag = step(gstate, gpts, gpm, gkey)

    # Physical partitioning: this process addresses exactly its local
    # devices' shards, and map rows are split across the host axis.
    pos = new_state.map.positions
    local = pos.addressable_shards
    assert len(local) == 4, len(local)
    C = cfg.map.capacity
    for sh in local:
        assert sh.data.shape == (C // nproc, 3), sh.data.shape
        lo = sh.index[0].start or 0
        expect = (C // nproc) * pid
        assert lo == expect, (lo, expect)

    # Numerical agreement with the single-process reference (replicated
    # outputs are addressable everywhere).
    packed = np.asarray(diag.packed)
    np.testing.assert_allclose(packed[:16], ref_packed[:16], atol=1e-4)
    assert int(packed[21]) == int(ref_packed[21])  # map_size identical

    # --- ENGINE sequence over the process-spanning mesh (SPMD host loop:
    # every process executes the same host code; replicated scalars are
    # addressable everywhere, map rows only on their owner host) ---
    from bshot_slam_tpu.io import synthetic
    from bshot_slam_tpu.odometry.engine import SlamEngine

    n_frames = 4
    sweeps, _ = synthetic.render_sequence(
        n_frames, cfg.sensor, step_mm=350.0, noise_mm=10.0, seed=5,
        n_firings=cfg.sensor.n_azimuth,
    )
    local_eng = SlamEngine(cfg, seed=0, tile=256)
    for sw in sweeps:
        local_eng.process_sweep(sw)

    dist_eng = SlamEngine(cfg, seed=0, tile=256, mesh=mesh,
                          data_axis="devices", map_axis="hosts")
    for sw in sweeps:
        dist_eng.process_sweep(sw)
    assert len(dist_eng.records) == n_frames
    dev = np.linalg.norm(dist_eng.trajectory - local_eng.trajectory, axis=-1)
    assert dev.max() < 10.0, dev
    # Map still physically split across hosts after the sequence.
    pos = dist_eng.state.map.positions
    Ceng = pos.shape[0]
    for sh in pos.addressable_shards:
        assert sh.data.shape[0] == Ceng // nproc, sh.data.shape
        assert (sh.index[0].start or 0) == (Ceng // nproc) * pid

    print(f"MULTIHOST_OK pid={pid}", flush=True)


if __name__ == "__main__":
    main()
