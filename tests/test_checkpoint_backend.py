"""Interrupt/resume parity for the backend: a run checkpointed mid-way and
resumed must reproduce the uninterrupted run's keyframes, loop edges, and
BA problem (VERDICT r2 item 6; the odometry-state half already round-trips
through checkpoint.save_state/load_state)."""

import numpy as np
import pytest

from bshot_slam_tpu.checkpoint import (
    load_backend, load_state, save_backend, save_state,
)
from bshot_slam_tpu.io import synthetic
from bshot_slam_tpu.odometry.engine import SlamEngine

from tests.test_odometry_e2e import small_cfg


@pytest.fixture(scope="module")
def sweeps():
    cfg = small_cfg()
    sw, _ = synthetic.render_sequence(
        6, cfg.sensor, step_mm=300.0, noise_mm=10.0, seed=11,
        n_firings=cfg.sensor.n_azimuth,
    )
    return sw


def _run(cfg, sweeps):
    eng = SlamEngine(cfg, seed=0, tile=1024, enable_backend=True)
    for sw in sweeps:
        eng.process_sweep(sw)
    return eng


def test_backend_resume_reproduces_uninterrupted_run(tmp_path, sweeps):
    cfg = small_cfg()
    # Uninterrupted reference run.
    full = _run(cfg, sweeps)

    # Interrupted: 3 frames, checkpoint, fresh engine, resume, 3 more.
    half = SlamEngine(cfg, seed=0, tile=1024, enable_backend=True)
    for sw in sweeps[:3]:
        half.process_sweep(sw)
    ckpt = str(tmp_path / "ck")
    save_state(ckpt, half.state, half.poses)
    save_backend(ckpt, half)

    res = SlamEngine(cfg, seed=0, tile=1024, enable_backend=True)
    res.state, prior_poses = load_state(ckpt)
    assert load_backend(ckpt, res)
    assert prior_poses.shape[0] == 3
    for sw in sweeps[3:]:
        res.process_sweep(sw)

    # Keyframe stores must match exactly (PRNG key was checkpointed, so the
    # resumed run consumed the same key sequence).
    n = int(full.keyframes.count)
    assert int(res.keyframes.count) == n
    np.testing.assert_array_equal(
        np.asarray(res.keyframes.frame_idx[:n]),
        np.asarray(full.keyframes.frame_idx[:n]),
    )
    np.testing.assert_allclose(
        np.asarray(res.keyframes.poses[:n]),
        np.asarray(full.keyframes.poses[:n]), atol=1e-3,
    )
    np.testing.assert_array_equal(
        np.asarray(res.keyframes.obs_lm[:n]),
        np.asarray(full.keyframes.obs_lm[:n]),
    )
    np.testing.assert_array_equal(
        np.asarray(res.keyframes.descriptors[:n]),
        np.asarray(full.keyframes.descriptors[:n]),
    )

    # Map state matches.
    np.testing.assert_array_equal(
        np.asarray(res.state.map.valid), np.asarray(full.state.map.valid)
    )
    np.testing.assert_allclose(
        np.asarray(res.state.map.positions),
        np.asarray(full.state.map.positions), atol=1e-3,
    )
    np.testing.assert_array_equal(
        np.asarray(res.state.map.frame_born),
        np.asarray(full.state.map.frame_born),
    )

    # Same BA problem (same observations -> same solve).
    pf = full.build_ba_problem()
    pr = res.build_ba_problem()
    np.testing.assert_array_equal(np.asarray(pf.obs_kf), np.asarray(pr.obs_kf))
    np.testing.assert_array_equal(np.asarray(pf.obs_lm), np.asarray(pr.obs_lm))
    np.testing.assert_allclose(
        np.asarray(pf.landmarks), np.asarray(pr.landmarks), atol=1e-3
    )

    # Loop-edge detection agrees (usually empty on a 6-frame straight path,
    # but the call paths must agree either way).
    ef, _ = full.optimize_backend(), None
    er, _ = res.optimize_backend(), None
    assert len(full.loop_edges) == len(res.loop_edges)
    np.testing.assert_allclose(
        full.optimized_keyframe_poses, res.optimized_keyframe_poses,
        atol=1.0,
    )


def test_backend_checkpoint_roundtrips_loop_edges(tmp_path, sweeps):
    from bshot_slam_tpu.backend.loop_closure import LoopEdge

    cfg = small_cfg()
    eng = SlamEngine(cfg, seed=0, tile=1024, enable_backend=True)
    for sw in sweeps[:2]:
        eng.process_sweep(sw)
    z = np.eye(4, dtype=np.float32)
    z[:3, 3] = [100.0, -50.0, 10.0]
    eng.loop_edges = [LoopEdge(kf_i=1, kf_j=0, z=z, n_inliers=42,
                               rmse_mm=87.5)]
    ckpt = str(tmp_path / "ck2")
    save_state(ckpt, eng.state, eng.poses)
    save_backend(ckpt, eng)

    other = SlamEngine(cfg, seed=3, tile=1024, enable_backend=True)
    assert load_backend(ckpt, other)
    assert len(other.loop_edges) == 1
    e = other.loop_edges[0]
    assert (e.kf_i, e.kf_j, e.n_inliers) == (1, 0, 42)
    assert e.rmse_mm == pytest.approx(87.5)
    np.testing.assert_allclose(e.z, z)
    np.testing.assert_array_equal(np.asarray(other.key), np.asarray(eng.key))
