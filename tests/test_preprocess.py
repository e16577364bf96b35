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
