"""The ENGINE running sharded, end to end (VERDICT r4 weak #1).

parallel/sharded.py proved the *step* partitions; these tests drive a full
synthetic sequence through `SlamEngine(mesh=...)` on the 8-virtual-CPU-
device mesh — through cloud bucketing, map GROWTH, capacity-ceiling
EVICTION, the pose-graph backend, and checkpoint/resume — asserting
trajectory agreement with the single-device run and that the map stays
physically partitioned the whole way.
"""

import dataclasses

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from bshot_slam_tpu.config import (
    BackendConfig, DescriptorConfig, KeypointConfig, MapConfig, MatchConfig,
    PreprocessConfig, RuntimeConfig, SensorConfig, SlamConfig,
)
from bshot_slam_tpu.io import synthetic
from bshot_slam_tpu.odometry.engine import SlamEngine
from bshot_slam_tpu.parallel.sharded import make_mesh


def _cfg(capacity=256):
    """Small shapes; map capacity low enough that a 20+ frame drive grows
    through the bucket ladder and hits ceiling eviction."""
    return SlamConfig(
        sensor=SensorConfig(n_azimuth=256),
        preprocess=PreprocessConfig(max_points=2048),
        keypoints=KeypointConfig(top_k=64),
        descriptor=DescriptorConfig(max_neighbors=64),
        match=MatchConfig(ransac_iterations=128),
        map=MapConfig(capacity=capacity),
        backend=BackendConfig(max_keyframes=16, keyframe_every=2),
        runtime=RuntimeConfig(
            point_tile=256,
            cloud_buckets=(1024, 2048),
            map_buckets=(128, 256, 512, 1024),
        ),
    )


def _drive(eng, sweeps):
    for sw in sweeps:
        eng.process_sweep(sw)
    if eng.pipelined:
        eng.flush()
    return eng


@pytest.mark.slow
def test_engine_sharded_full_sequence_matches_single_device():
    """>=20 frames through growth + eviction + backend on an 8-device
    mesh: trajectory agrees with the single-device engine (GSPMD reduction
    order is the only difference) and the map arrays stay partitioned."""
    n = 22
    cfg = _cfg()
    sweeps, _ = synthetic.render_sequence(
        n, cfg.sensor, step_mm=350.0, noise_mm=10.0, seed=13,
        n_firings=cfg.sensor.n_azimuth, yaw_rate_rad=2 * np.pi / (3 * n),
    )
    single = _drive(
        SlamEngine(cfg, seed=0, tile=256, enable_backend=True,
                   backend_every=8),
        sweeps,
    )
    mesh = make_mesh(jax.devices()[:8])
    shard = _drive(
        SlamEngine(cfg, seed=0, tile=256, enable_backend=True,
                   backend_every=8, mesh=mesh),
        sweeps,
    )

    # The drive actually exercised the saturation machinery.
    assert single.n_evicted > 0 and shard.n_evicted > 0
    assert shard.state.map.positions.shape[0] == cfg.map.capacity  # grew

    # The map is REALLY partitioned after growth/eviction/corrections.
    n_map = mesh.shape["map"]
    pos = shard.state.map.positions
    assert pos.sharding.spec == P("map", None)
    C = cfg.map.capacity
    assert {s.data.shape for s in pos.addressable_shards} == {
        (C // n_map, 3)
    }

    # Trajectory agreement, frame by frame.
    assert len(shard.records) == len(single.records) == n
    t_s = shard.trajectory
    t_1 = single.trajectory
    dev = np.linalg.norm(t_s - t_1, axis=-1)
    assert dev.max() < 30.0, dev
    for a, b in zip(shard.records, single.records):
        assert a.gated == b.gated
        assert abs(a.map_size - b.map_size) <= 5
    assert int(shard.keyframes.count) == int(single.keyframes.count)


@pytest.mark.slow
def test_engine_sharded_checkpoint_resume():
    """Sharded run -> checkpoint -> fresh sharded engine -> resume: the
    continuation reproduces the uninterrupted sharded run exactly."""
    import tempfile

    from bshot_slam_tpu import checkpoint as ckpt

    n_a, n_b = 6, 6
    cfg = _cfg(capacity=1024)
    sweeps, _ = synthetic.render_sequence(
        n_a + n_b, cfg.sensor, step_mm=350.0, noise_mm=10.0, seed=3,
        n_firings=cfg.sensor.n_azimuth,
    )
    mesh = make_mesh(jax.devices()[:8])

    straight = _drive(
        SlamEngine(cfg, seed=0, tile=256, enable_backend=True), sweeps
    )

    first = _drive(
        SlamEngine(cfg, seed=0, tile=256, enable_backend=True),
        sweeps[:n_a],
    )
    with tempfile.TemporaryDirectory() as d:
        ckpt.save_state(d, first.state, first.poses)
        ckpt.save_backend(d, first)
        resumed = SlamEngine(cfg, seed=0, tile=256, enable_backend=True,
                             mesh=mesh)
        resumed.state, _ = ckpt.load_state(d)
        resumed._place_state()
        assert ckpt.load_backend(d, resumed)
        # (load_backend restores _kf_count itself — don't re-derive it
        # here, that would mask a regression in the restore.)
        assert resumed._kf_count == int(resumed.keyframes.count)
        _drive(resumed, sweeps[n_a:])

    assert len(resumed.records) == n_b
    tail = straight.poses[n_a:]
    np.testing.assert_allclose(resumed.poses, tail, atol=1e-3)
    assert resumed.state.map.positions.sharding.spec == P("map", None)


def test_engine_sharded_pipelined_smoke():
    """Pipelined mode composes with the mesh (deferred fetches over
    sharded state)."""
    n = 5
    cfg = _cfg(capacity=1024)
    sweeps, _ = synthetic.render_sequence(
        n, cfg.sensor, step_mm=350.0, noise_mm=10.0, seed=5,
        n_firings=cfg.sensor.n_azimuth,
    )
    mesh = make_mesh(jax.devices()[:8])
    eng = _drive(
        SlamEngine(cfg, seed=0, tile=256, pipelined=True, fetch_every=3,
                   mesh=mesh),
        sweeps,
    )
    sync = _drive(SlamEngine(cfg, seed=0, tile=256), sweeps)
    assert len(eng.records) == n
    for a, b in zip(eng.records, sync.records):
        np.testing.assert_allclose(a.pose, b.pose, atol=1e-3)
