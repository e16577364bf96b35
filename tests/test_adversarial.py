"""Adversarial synthetic evaluation (VERDICT r2 item 9): ground undulation,
low clutter, and self-car returns, with per-ray ground-truth labels derived
from the same ray-cast the renderer uses.  Checks the preprocessing
classifier where it can actually fail, and reproduces the vert_init
sensitivity curve shape of the reference's experiment
(PCP_SP_initpos_analysis.m:7-15: accuracy high near -0.6, degraded at
-1.57)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from bshot_slam_tpu.config import (
    CLASS_GROUND, CLASS_KEEP, CLASS_SELFCAR, PreprocessConfig, SensorConfig,
)
from bshot_slam_tpu.io import synthetic
from bshot_slam_tpu.ops import preprocess as pp
from bshot_slam_tpu.ops.rangeimage import build_range_image


@pytest.fixture(scope="module")
def labeled_sweep():
    """One adversarial sweep + per-cell ground-truth labels on the exact
    (R, A) grid preprocess consumes."""
    sensor = SensorConfig(n_azimuth=512)
    scene = synthetic.adversarial_scene(0)
    pose = synthetic.straight_trajectory(1)[0]
    sweep = synthetic.render_sweep(scene, sensor, pose, noise_mm=0.0,
                                   n_firings=512, self_car=True)
    ri = build_range_image(sweep, sensor)

    # Re-derive each grid cell's ray and ask the scene which surface it hit.
    az = ri.azimuth_rad  # (R, A) full grid
    vert = ri.vert_rad[:, None]
    d_local = np.stack(
        [
            np.cos(vert) * np.sin(az) * np.ones_like(az),
            np.cos(vert) * np.cos(az) * np.ones_like(az),
            np.sin(vert) * np.ones_like(az),
        ],
        axis=-1,
    )
    R = pose[:3, :3]
    origin = pose[:3, 3]
    d_world = d_local @ R.T
    t_ground = synthetic._ray_ground(origin, d_world, scene)
    t_obj = np.full(t_ground.shape, np.inf)
    for box in scene.boxes:
        t_obj = np.minimum(t_obj, synthetic._ray_box(origin, d_world, box))
    t_car = synthetic._ray_box(
        np.zeros(3), d_local,
        synthetic.Box(tuple(synthetic._SELF_CAR_LO),
                      tuple(synthetic._SELF_CAR_HI)),
    )
    t_car = np.where(t_car > 0, t_car, np.inf)
    stacked = np.stack([t_ground, t_obj, t_car])  # 0=ground 1=object 2=car
    label = np.argmin(stacked, axis=0)
    has_return = np.isfinite(np.min(stacked, axis=0)) & (ri.range_mm > 0)
    return ri, label, has_return


def _classes(ri, vert_init):
    cfg = PreprocessConfig(vert_init_rad=vert_init)
    res = pp.preprocess(
        jnp.asarray(ri.range_mm), jnp.asarray(ri.azimuth_rad),
        jnp.asarray(ri.vert_rad), cfg,
    )
    return np.asarray(res.classes), np.asarray(res.valid)


def test_self_car_returns_cropped(labeled_sweep):
    ri, label, has = labeled_sweep
    classes, valid = _classes(ri, -0.6)
    car = has & (label == 2)
    assert car.sum() > 50  # the renderer actually produced body returns
    frac = (classes[car] == CLASS_SELFCAR).mean()
    assert frac > 0.95, frac


def test_undulating_ground_mostly_removed(labeled_sweep):
    ri, label, has = labeled_sweep
    classes, valid = _classes(ri, -0.6)
    gnd = has & (label == 0)
    assert gnd.sum() > 1000
    frac = (classes[gnd] == CLASS_GROUND).mean()
    assert frac > 0.85, frac


def test_vert_init_sensitivity_curve_shape(labeled_sweep):
    """Object-survival accuracy (the reference's keep/(keep+ground) over
    labeled object points, pointcloud_preprocessing.cpp:285) must be high at
    the tuned vert_init=-0.6 and degrade at -1.57 — the curve shape of
    PCP_SP_initpos_analysis.m:7-15."""
    ri, label, has = labeled_sweep
    obj = has & (label == 1)
    assert obj.sum() > 300

    def accuracy(vi):
        classes, _ = _classes(ri, vi)
        keep = (classes[obj] == CLASS_KEEP).sum()
        eaten = (classes[obj] == CLASS_GROUND).sum()
        return keep / max(keep + eaten, 1)

    acc = {vi: accuracy(vi) for vi in (-0.6, -0.9, -1.2, -1.57)}
    assert acc[-0.6] > 0.85, acc
    # The tuned seed strictly beats the degenerate straight-down seed: the
    # direction of the reference curve (0.938-1.0 at -0.6 vs 0.588-0.973 at
    # -1.57; magnitudes differ — theirs came from hand-labeled real logs).
    assert acc[-0.6] > acc[-1.57], acc
    # Monotone-ish degradation end to end (allow mid-curve wiggle).
    assert acc[-0.9] >= acc[-1.57] - 0.02, acc
