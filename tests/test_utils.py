import numpy as np

from bshot_slam_tpu.utils import trajectory as traj_io
from bshot_slam_tpu.utils.metrics import ate_rmse, ground_accuracy, relative_pose_errors
from bshot_slam_tpu.viz import export


def test_trajectory_roundtrip(tmp_path, rng):
    t = rng.uniform(-1e5, 1e5, (20, 3))
    p = str(tmp_path / "t.txt")
    traj_io.save_xyz(p, t)
    back = traj_io.load_xyz(p)
    np.testing.assert_allclose(back, t, rtol=1e-6)


def test_ate_rmse_aligned_invariance(rng):
    t = rng.uniform(-1e4, 1e4, (30, 3))
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    t2 = t @ R.T + np.array([500.0, -200.0, 100.0])
    assert ate_rmse(t2, t, align=True) < 1e-3
    assert ate_rmse(t2, t, align=False) > 100.0
    assert ate_rmse(t + 10.0, t, align=False) == np.float64(np.sqrt(300.0))


def test_ground_accuracy():
    cls = np.array([0, 0, 1, 1, 2])
    valid = np.ones(5, bool)
    keep_truth = np.array([True, True, True, False, False])
    assert abs(ground_accuracy(cls, valid, keep_truth) - 2.0 / 3.0) < 1e-9


def test_relative_pose_errors_zero_for_identical(rng):
    poses = np.tile(np.eye(4), (5, 1, 1))
    for i in range(5):
        poses[i, :3, 3] = [i * 100.0, 0, 0]
    rot, trans = relative_pose_errors(poses, poses)
    assert rot.max() < 1e-6 and trans.max() < 1e-6


def test_ply_and_svg_export(tmp_path, rng):
    pts = rng.uniform(-1000, 1000, (50, 3)).astype(np.float32)
    ply = str(tmp_path / "c.ply")
    export.save_ply(ply, pts, np.full((50, 3), 128, np.uint8))
    text = open(ply).read()
    assert "element vertex 50" in text and text.count("\n") > 55

    cls = rng.integers(0, 4, (4, 8))
    xyz = rng.uniform(-1000, 1000, (4, 8, 3))
    export.save_classified_cloud(str(tmp_path / "cl.ply"), xyz, cls, np.ones((4, 8), bool))

    svg = str(tmp_path / "t.svg")
    export.save_trajectory_svg(svg, [pts, pts + 100], labels=["est", "gt"])
    s = open(svg).read()
    assert "polyline" in s and "est" in s


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from bshot_slam_tpu.checkpoint import load_state, save_state
    from bshot_slam_tpu.config import tiny_config
    from bshot_slam_tpu.odometry import pipeline

    cfg = tiny_config()
    state = pipeline.init_state(cfg)
    state = state._replace(
        frame_idx=jnp.asarray(7, jnp.int32),
        ref_pose=jnp.eye(4).at[0, 3].set(123.0),
    )
    poses = np.random.default_rng(0).uniform(size=(7, 4, 4))
    d = str(tmp_path / "ckpt")
    save_state(d, state, poses)
    state2, poses2 = load_state(d)
    assert int(state2.frame_idx) == 7
    np.testing.assert_allclose(np.asarray(state2.ref_pose), np.asarray(state.ref_pose))
    np.testing.assert_allclose(poses2, poses)
    np.testing.assert_array_equal(
        np.asarray(state2.map.valid), np.asarray(state.map.valid)
    )
