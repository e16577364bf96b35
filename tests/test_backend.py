import jax.numpy as jnp
import numpy as np

from bshot_slam_tpu.backend import ba, posegraph
from bshot_slam_tpu.geometry import se3


def _circle_poses(n, radius=20000.0):
    """Ground-truth poses around a circle (heading tangent, +y forward)."""
    poses = np.zeros((n, 4, 4), np.float32)
    for i in range(n):
        th = 2 * np.pi * i / n
        c, s = np.cos(th), np.sin(th)
        poses[i, :3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        poses[i, :3, 3] = [radius * (1 - np.cos(th)), radius * np.sin(th), 0]
        poses[i, 3, 3] = 1
    return poses


def _drifted(gt, rng, rot_sigma=0.01, t_sigma=60.0):
    """Integrate noisy odometry deltas -> drifted trajectory."""
    n = len(gt)
    drift = [gt[0]]
    for i in range(1, n):
        dz = np.linalg.inv(gt[i - 1]) @ gt[i]
        noise = np.concatenate([rng.normal(0, t_sigma, 3), rng.normal(0, rot_sigma, 3)])
        dz = dz @ np.asarray(se3.se3_exp(jnp.asarray(noise, jnp.float32)))
        drift.append(drift[-1] @ dz)
    return np.stack(drift).astype(np.float32)


def test_posegraph_loop_closure_reduces_error(rng):
    n = 24
    gt = _circle_poses(n)
    noisy = _drifted(gt, rng)
    g = posegraph.odometry_edges(jnp.asarray(noisy))
    # Loop closures: ground-truth relative poses between far-apart nodes.
    # (A single closure only redistributes drift; several pin the shape.)
    pairs = [(n - 1, 0), (12, 0), (18, 6), (20, 2)]
    z = jnp.asarray(
        np.stack([np.linalg.inv(gt[i]) @ gt[j] for i, j in pairs]).astype(np.float32)
    )
    g = posegraph.add_edges(
        g,
        jnp.asarray([i for i, _ in pairs]),
        jnp.asarray([j for _, j in pairs]),
        z,
        jnp.full((len(pairs),), 20.0),
    )
    res = posegraph.optimize_pose_graph(g, iterations=15)
    assert float(res.final_cost) < 0.1 * float(res.initial_cost)
    # the last loop edge must now be satisfied
    P = np.asarray(res.poses)
    loop_err = np.linalg.inv(np.asarray(z[0])) @ (np.linalg.inv(P[-1]) @ P[0])
    assert np.linalg.norm(loop_err[:3, 3]) < 100.0
    err_before = np.linalg.norm(noisy[:, :3, 3] - gt[:, :3, 3], axis=1).mean()
    err_after = np.linalg.norm(
        np.asarray(res.poses)[:, :3, 3] - gt[:, :3, 3], axis=1
    ).mean()
    assert err_after < 0.6 * err_before, (err_before, err_after)


def test_posegraph_consistent_chain_stays_put():
    poses = _circle_poses(10)
    g = posegraph.odometry_edges(jnp.asarray(poses))
    res = posegraph.optimize_pose_graph(g, iterations=5)
    np.testing.assert_allclose(np.asarray(res.poses), poses, atol=5.0)


def _ba_problem(rng, M=6, L=40, noise_lm=150.0, noise_pose=80.0):
    gt_poses = _circle_poses(M, radius=8000.0)
    gt_lm = rng.uniform(-15000, 15000, (L, 3)).astype(np.float32)
    gt_lm[:, 2] = rng.uniform(0, 4000, L)
    obs_kf, obs_lm, obs_p = [], [], []
    for k in range(M):
        Tinv = np.linalg.inv(gt_poses[k])
        for l in range(L):
            p_s = Tinv[:3, :3] @ gt_lm[l] + Tinv[:3, 3]
            obs_kf.append(k)
            obs_lm.append(l)
            obs_p.append(p_s + rng.normal(0, 5.0, 3))
    O = len(obs_kf)
    noisy_poses = _drifted(gt_poses, rng, rot_sigma=0.005, t_sigma=noise_pose)
    noisy_lm = gt_lm + rng.normal(0, noise_lm, (L, 3)).astype(np.float32)
    return ba.BAProblem(
        poses=jnp.asarray(noisy_poses),
        landmarks=jnp.asarray(noisy_lm.astype(np.float32)),
        obs_kf=jnp.asarray(obs_kf, jnp.int32),
        obs_lm=jnp.asarray(obs_lm, jnp.int32),
        obs_p=jnp.asarray(np.asarray(obs_p, np.float32)),
        obs_mask=jnp.ones(O, bool),
    ), gt_poses, gt_lm


def test_ba_reduces_cost_and_error(rng):
    prob, gt_poses, gt_lm = _ba_problem(rng)
    res = ba.ba_solve(prob, gn_iterations=8, cg_iterations=30)
    assert float(res.final_cost) < 0.05 * float(res.initial_cost), (
        float(res.initial_cost), float(res.final_cost))
    # pose error vs ground truth (anchor = node 0)
    before = np.linalg.norm(np.asarray(prob.poses)[:, :3, 3] - gt_poses[:, :3, 3], axis=1).mean()
    after = np.linalg.norm(np.asarray(res.poses)[:, :3, 3] - gt_poses[:, :3, 3], axis=1).mean()
    assert after < 0.5 * before, (before, after)


def test_ba_respects_obs_mask(rng):
    prob, _, _ = _ba_problem(rng, M=4, L=10)
    # poison half the observations but mask them out: solution must not blow up
    bad_p = np.asarray(prob.obs_p).copy()
    O = bad_p.shape[0]
    bad = np.zeros(O, bool)
    bad[::2] = True
    bad_p[bad] += 1e6
    mask = jnp.asarray(~bad)
    prob2 = prob._replace(obs_p=jnp.asarray(bad_p), obs_mask=mask)
    res = ba.ba_solve(prob2, gn_iterations=4, cg_iterations=20)
    assert np.isfinite(np.asarray(res.poses)).all()
    assert float(res.final_cost) <= float(res.initial_cost)
