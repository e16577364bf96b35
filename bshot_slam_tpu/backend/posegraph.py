"""Pose-graph optimization: Gauss-Newton / Levenberg-Marquardt on SE(3) (JAX).

New capability: the reference links g2o but never calls it — there is no
backend at all (reference: CMakeLists.txt:86; SURVEY §5).  This module is
the real thing, built TPU-first: fixed-shape edge arrays, batched residuals
and closed-form Jacobians, one dense damped normal-equation solve per LM
iteration inside a `lax.scan` (graphs of <= ~1k keyframes give systems of
<= 6k unknowns — comfortably dense on the MXU; larger graphs use the
matrix-free CG machinery in backend.ba).

Parameterization: T_i = T0_i * exp(xi_i) with per-node twists xi; edge
residual r_e = log( Z_e^{-1} * T_i^{-1} * T_j ) for measured relative pose
Z_e.  Jacobians come from jax.jacrev of the batched residual — exactness
over hand-derived approximations, and XLA fuses the batch.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bshot_slam_tpu.geometry import se3


class PoseGraph(NamedTuple):
    poses0: jnp.ndarray  # (M, 4, 4) initial node poses
    edge_i: jnp.ndarray  # (E,) int32 source node
    edge_j: jnp.ndarray  # (E,) int32 target node
    edge_z: jnp.ndarray  # (E, 4, 4) measured T_i^-1 T_j
    edge_weight: jnp.ndarray  # (E,) scalar information weight
    edge_mask: jnp.ndarray  # (E,) bool


class PoseGraphResult(NamedTuple):
    poses: jnp.ndarray  # (M, 4, 4) optimized
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray


# Huber threshold on the WEIGHTED edge residual norm (i.e. in sigmas:
# weights are 1/sigma^2, so a residual at its own sigma has norm ~1).
# Within _HUBER_DELTA the cost is quadratic — consistent graphs (all the
# unit tests, genuine closures) behave exactly as before; beyond it an
# edge's influence grows only linearly, so a CONTRADICTORY measurement
# (an aliased loop closure verified against repetitive structure —
# observed corrupting multi-lap drives, R5_NOTES "known limitation")
# cannot bend the whole trajectory around itself.
_HUBER_DELTA = 2.0


def _residuals(xi: jnp.ndarray, g: PoseGraph) -> jnp.ndarray:
    """(E, 6) weighted (non-robustified) edge residuals for (M, 6) node
    twists."""
    T = jnp.matmul(g.poses0, se3.se3_exp(xi))
    Ti = T[g.edge_i]
    Tj = T[g.edge_j]
    rel = jnp.matmul(se3.inverse(Ti), Tj)
    err = jnp.matmul(se3.inverse(g.edge_z), rel)
    r = se3.se3_log(err)
    w = jnp.sqrt(g.edge_weight) * g.edge_mask.astype(jnp.float32)
    return r * w[:, None]


def _huber_rho(rn: jnp.ndarray) -> jnp.ndarray:
    """Huber loss of a weighted residual norm (quadratic within
    _HUBER_DELTA, linear beyond)."""
    d = _HUBER_DELTA
    return jnp.where(rn <= d, rn * rn, d * (2.0 * rn - d))


def _huber_weights(rw: jnp.ndarray) -> jnp.ndarray:
    """(E,) IRLS sqrt-weights for the current residuals — FROZEN per LM
    iteration (differentiating through the weight cancels the descent
    direction and stalls LM; standard iteratively-reweighted practice)."""
    rn = jnp.linalg.norm(rw, axis=-1)
    return jnp.sqrt(jnp.minimum(1.0, _HUBER_DELTA / jnp.maximum(rn, 1e-12)))


_MM_PER_M = 1000.0


def _scale_pose(T: jnp.ndarray, s: float) -> jnp.ndarray:
    return T.at[..., :3, 3].multiply(s)


@functools.partial(jax.jit, static_argnames=("iterations",))
def optimize_pose_graph(
    g: PoseGraph,
    iterations: int = 10,
    lm_lambda: float = 1.0e-4,
    anchor_weight: float = 1.0e6,
) -> PoseGraphResult:
    """LM iterations with an anchor prior on node 0 fixing the gauge.

    Internally the problem is solved in meters: mm-scale translations
    (~1e4) against radian rotations (~1) make the f32 normal equations
    numerically singular, so poses and measurements are rescaled on entry
    and the result rescaled back.
    """
    g = g._replace(
        poses0=_scale_pose(g.poses0, 1.0 / _MM_PER_M),
        edge_z=_scale_pose(g.edge_z, 1.0 / _MM_PER_M),
    )
    M = g.poses0.shape[0]

    def cost(xi):
        # True robust objective: Huber on the weighted residual norms.
        rn = jnp.linalg.norm(_residuals(xi, g), axis=-1)
        return (
            0.5 * jnp.sum(_huber_rho(rn))
            + 0.5 * anchor_weight * jnp.sum(xi[0] ** 2)
        )

    def lm_step(carry, _):
        xi, lam = carry
        rw = _residuals(xi, g)  # (E, 6)
        hub = _huber_weights(rw)  # frozen IRLS weights this iteration
        r = rw * hub[:, None]
        J = jax.jacrev(
            lambda x: (_residuals(x, g) * hub[:, None]).reshape(-1)
        )(xi)  # (6E, M, 6)
        Jf = J.reshape(-1, M * 6)
        H = Jf.T @ Jf
        b = -Jf.T @ r.reshape(-1)
        # Gauge anchor on node 0.
        H = H.at[:6, :6].add(anchor_weight * jnp.eye(6))
        b = b.at[:6].add(-anchor_weight * xi[0])
        Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(M * 6)
        dx = jnp.linalg.solve(Hd, b).reshape(M, 6)
        xi_new = xi + dx
        improved = cost(xi_new) < cost(xi)
        xi = jnp.where(improved, xi_new, xi)
        lam = jnp.where(improved, lam * 0.3, lam * 5.0)
        return (xi, lam), None

    xi0 = jnp.zeros((M, 6), jnp.float32)
    c0 = cost(xi0)
    (xi, _), _ = jax.lax.scan(
        lm_step, (xi0, jnp.float32(lm_lambda)), None, length=iterations
    )
    return PoseGraphResult(
        poses=_scale_pose(jnp.matmul(g.poses0, se3.se3_exp(xi)), _MM_PER_M),
        initial_cost=c0,
        final_cost=cost(xi),
    )


def odometry_edges(poses: jnp.ndarray, weight: float = 1.0) -> PoseGraph:
    """Build a chain pose graph from an (M, 4, 4) odometry trajectory."""
    M = poses.shape[0]
    i = jnp.arange(M - 1, dtype=jnp.int32)
    j = i + 1
    z = jnp.matmul(se3.inverse(poses[i]), poses[j])
    return PoseGraph(
        poses0=poses,
        edge_i=i,
        edge_j=j,
        edge_z=z,
        edge_weight=jnp.full((M - 1,), weight, jnp.float32),
        edge_mask=jnp.ones((M - 1,), bool),
    )


def add_edges(
    g: PoseGraph,
    edge_i: jnp.ndarray,
    edge_j: jnp.ndarray,
    edge_z: jnp.ndarray,
    weight: jnp.ndarray,
) -> PoseGraph:
    """Append (loop-closure) edges to a graph (host-side convenience)."""
    mask = jnp.ones(edge_i.shape[0], bool)
    return PoseGraph(
        poses0=g.poses0,
        edge_i=jnp.concatenate([g.edge_i, edge_i.astype(jnp.int32)]),
        edge_j=jnp.concatenate([g.edge_j, edge_j.astype(jnp.int32)]),
        edge_z=jnp.concatenate([g.edge_z, edge_z]),
        edge_weight=jnp.concatenate([g.edge_weight, weight]),
        edge_mask=jnp.concatenate([g.edge_mask, mask]),
    )
