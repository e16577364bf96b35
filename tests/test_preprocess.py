import jax.numpy as jnp
import numpy as np

from bshot_slam_tpu.config import CLASS_GROUND, CLASS_KEEP, PreprocessConfig, SensorConfig
from bshot_slam_tpu.io import synthetic
from bshot_slam_tpu.ops import preprocess as pp
from bshot_slam_tpu.ops.rangeimage import build_range_image

from tests.oracles import ground_walk_oracle, occlusion_oracle


def _render_ri(seed=0, n_az=96, boxes=True):
    sensor = SensorConfig(n_azimuth=n_az)
    scene = synthetic.default_scene(seed) if boxes else synthetic.Scene(boxes=[])
    pose = synthetic.straight_trajectory(1)[0]
    sweep = synthetic.render_sweep(scene, sensor, pose, n_firings=n_az, noise_mm=15.0, seed=seed)
    return build_range_image(sweep, sensor), sensor


def test_ground_scan_matches_oracle():
    ri, sensor = _render_ri(seed=3)
    cfg = PreprocessConfig()
    xyz = pp.polar_to_xyz(jnp.asarray(ri.range_mm), jnp.asarray(ri.azimuth_rad), jnp.asarray(ri.vert_rad))
    got = np.asarray(pp._ground_scan(jnp.asarray(ri.range_mm), jnp.asarray(ri.azimuth_rad), jnp.asarray(ri.vert_rad), xyz, cfg))
    want = ground_walk_oracle(ri.range_mm, ri.azimuth_rad, ri.vert_rad, cfg)
    mismatch = (got != want).mean()
    assert mismatch < 0.01, f"class mismatch rate {mismatch:.4f}"


def test_occlusion_matches_oracle():
    ri, sensor = _render_ri(seed=4)
    cfg = PreprocessConfig()
    base = ground_walk_oracle(ri.range_mm, ri.azimuth_rad, ri.vert_rad, cfg)
    got = np.asarray(
        pp._occlusion_pass(jnp.asarray(ri.range_mm), jnp.asarray(ri.azimuth_rad), jnp.asarray(base), cfg)
    )
    want = occlusion_oracle(ri.range_mm, ri.azimuth_rad, base, cfg)
    np.testing.assert_array_equal(got, want)


def test_flat_ground_is_removed():
    # Scene with only ground: nearly every return must classify as ground.
    ri, sensor = _render_ri(seed=0, boxes=False)
    cfg = PreprocessConfig()
    res = pp.preprocess(jnp.asarray(ri.range_mm), jnp.asarray(ri.azimuth_rad), jnp.asarray(ri.vert_rad), cfg)
    cls = np.asarray(res.classes)
    valid = ri.range_mm > 0
    outside_car = np.asarray(res.xyz[..., 0] ** 2 + res.xyz[..., 1] ** 2) > 3000**2
    m = valid & outside_car
    frac_ground = (cls[m] == CLASS_GROUND).mean()
    assert frac_ground > 0.97, frac_ground


def test_walls_are_kept():
    # A big wall in front must survive preprocessing as keep-class points.
    sensor = SensorConfig(n_azimuth=96)
    scene = synthetic.Scene(boxes=[synthetic.Box((-20000, 9000, 0), (20000, 12000, 12000))])
    pose = synthetic.straight_trajectory(1)[0]
    sweep = synthetic.render_sweep(scene, sensor, pose, n_firings=96)
    ri = build_range_image(sweep, sensor)
    cfg = PreprocessConfig()
    res = pp.preprocess(jnp.asarray(ri.range_mm), jnp.asarray(ri.azimuth_rad), jnp.asarray(ri.vert_rad), cfg)
    cls = np.asarray(res.classes)
    xyz = np.asarray(res.xyz)
    on_wall = (ri.range_mm > 0) & (xyz[..., 2] > -1000) & (np.abs(xyz[..., 1] - 9000) < 500)
    assert on_wall.sum() > 50
    assert (cls[on_wall] == CLASS_KEEP).mean() > 0.8


def test_extract_cloud_padding():
    ri, sensor = _render_ri(seed=5)
    cfg = PreprocessConfig()
    res = pp.preprocess(jnp.asarray(ri.range_mm), jnp.asarray(ri.azimuth_rad), jnp.asarray(ri.vert_rad), cfg)
    sel = jnp.ones_like(res.valid)
    pts, mask = pp.extract_cloud(res, sel, max_points=4096)
    n_keep = int(np.asarray((res.valid & (res.classes == CLASS_KEEP))).sum())
    assert int(mask.sum()) == min(n_keep, 4096)
    assert pts.shape == (4096, 3)
    assert np.all(np.asarray(pts)[~np.asarray(mask)] == 0)
    # kept points are nonzero ranges
    kept = np.asarray(pts)[np.asarray(mask)]
    assert (np.linalg.norm(kept, axis=1) > 1).all()


def test_host_preprocess_matches_jax():
    """The engine's default host-side (numpy) preprocessing must classify
    every cell exactly like the JAX implementation, and its compact
    extraction must match extract_cloud's count and order (coordinates to
    f32 trig ulps) — on realistic scenes and a pathological random one."""
    from bshot_slam_tpu.ops import preprocess_host as ph

    cfg = PreprocessConfig()
    sensor = SensorConfig(n_azimuth=512)
    sweeps, _ = synthetic.render_sequence(
        2, sensor, step_mm=400.0, noise_mm=20.0, seed=3, n_firings=512
    )
    cases = []
    for sw in sweeps:
        ri = build_range_image(sw, sensor)
        cases.append((ri.range_mm, ri.azimuth_rad, ri.vert_rad))
    # Random scene: dropouts, extreme ranges, exercises every walk rule.
    rng = np.random.default_rng(9)
    R, A = sensor.n_rings, sensor.n_azimuth
    r = rng.uniform(0, 40000, (R, A)).astype(np.float32)
    r[rng.random((R, A)) < 0.3] = 0.0
    az = np.broadcast_to(
        np.linspace(0, 2 * np.pi, A, endpoint=False, dtype=np.float32), (R, A)
    ).copy()
    vert = np.deg2rad(np.sort(np.asarray(sensor.vertical_angles_deg))).astype(
        np.float32
    )
    cases.append((r, az, vert))

    for r_mm, a_rad, v_rad in cases:
        res = pp.preprocess(
            jnp.asarray(r_mm), jnp.asarray(a_rad), jnp.asarray(v_rad), cfg
        )
        cls_h, xyz_h, valid_h = ph.preprocess_host(r_mm, a_rad, v_rad, cfg)
        np.testing.assert_array_equal(cls_h, np.asarray(res.classes))
        np.testing.assert_array_equal(valid_h, np.asarray(res.valid))
        pts_j, m_j = pp.extract_cloud(
            res, jnp.ones_like(res.valid), cfg.max_points
        )
        pts_h, nv_h = ph.extract_cloud_host(
            cls_h, xyz_h, valid_h, None, cfg.max_points
        )
        assert nv_h == int(jnp.sum(m_j))
        # Same cells in the same order; coordinates agree to trig ulps.
        np.testing.assert_allclose(
            pts_h, np.asarray(pts_j)[:nv_h], rtol=0, atol=0.05
        )


def test_host_extract_respects_select_list():
    """Select-list filtering (reference: preprocess.cpp:58-67) applies on
    the host path exactly as on the device path."""
    from bshot_slam_tpu.ops import preprocess_host as ph

    cfg = PreprocessConfig()
    sensor = SensorConfig(n_azimuth=256)
    sweeps, _ = synthetic.render_sequence(1, sensor, seed=5, n_firings=256)
    ri = build_range_image(sweeps[0], sensor)
    rng = np.random.default_rng(0)
    sel = rng.random(ri.range_mm.shape) < 0.5
    res = pp.preprocess(
        jnp.asarray(ri.range_mm), jnp.asarray(ri.azimuth_rad),
        jnp.asarray(ri.vert_rad), cfg,
    )
    cls_h, xyz_h, valid_h = ph.preprocess_host(
        ri.range_mm, ri.azimuth_rad, ri.vert_rad, cfg
    )
    _, m_j = pp.extract_cloud(res, jnp.asarray(sel), cfg.max_points)
    _, nv_h = ph.extract_cloud_host(cls_h, xyz_h, valid_h, sel, cfg.max_points)
    assert nv_h == int(jnp.sum(m_j)) > 0
