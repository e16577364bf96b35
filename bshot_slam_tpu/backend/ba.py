"""Bundle adjustment with Schur-complement reduction and matrix-free PCG (JAX).

New capability (the reference has no optimizer at all — SURVEY §5): joint
refinement of keyframe poses and landmark positions from sensor-frame
point observations,

    r_o = T_{kf(o)}^{-1} . l_{lm(o)} - z_o          (3-vector, mm)

solved by damped Gauss-Newton where each iteration eliminates the landmark
block in closed form (Hll is 3x3 block-diagonal) and solves the reduced
camera system S dx = b with preconditioned conjugate gradients whose
matvec never materializes S:

    S v = sum_obs Jp^T (Jp v - Jl Hll^{-1} sum_obs' Jl^T Jp v)

Everything is obs-level batched tensor math + `segment_sum`, so sharding
the observation axis across a device mesh turns the reductions into psums —
the distributed-BA design of SURVEY §2/§7 (phase 6).  Jacobians are closed
form: Jl = R^T, Jp = [-I, [p_s]x] for the right-perturbation T exp(xi).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from bshot_slam_tpu.geometry import se3


class BAProblem(NamedTuple):
    poses: jnp.ndarray  # (M, 4, 4)
    landmarks: jnp.ndarray  # (L, 3) world
    obs_kf: jnp.ndarray  # (O,) int32
    obs_lm: jnp.ndarray  # (O,) int32
    obs_p: jnp.ndarray  # (O, 3) measured sensor-frame position
    obs_mask: jnp.ndarray  # (O,)


class BAResult(NamedTuple):
    poses: jnp.ndarray
    landmarks: jnp.ndarray
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray


def _inv3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form batched 3x3 inverse (adjugate / determinant).

    TPU-batched `jnp.linalg.inv` lowers to per-matrix LU loops with
    terrible throughput at (L, 3, 3) scale; the cofactor formula is pure
    fused elementwise math.  Inputs here are damped SPD blocks, so the
    determinant is safely positive.
    """
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co_a = e * i - f * h
    co_b = f * g - d * i
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
    adj = jnp.stack(
        [
            jnp.stack([co_a, c * h - b * i, b * f - c * e], axis=-1),
            jnp.stack([co_b, a * i - c * g, c * d - a * f], axis=-1),
            jnp.stack([co_c, b * g - a * h, a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def _prepare(poses, landmarks, prob: BAProblem):
    R = poses[prob.obs_kf, :3, :3]  # (O, 3, 3)
    t = poses[prob.obs_kf, :3, 3]
    l = landmarks[prob.obs_lm]
    p_s = jnp.einsum("oji,oj->oi", R, l - t)  # R^T (l - t)
    r = (p_s - prob.obs_p) * prob.obs_mask[:, None]
    Jl = jnp.swapaxes(R, -1, -2)  # (O, 3, 3) = R^T
    Jp = jnp.concatenate(
        [
            -jnp.broadcast_to(jnp.eye(3, dtype=poses.dtype), Jl.shape),
            se3.hat(p_s),
        ],
        axis=-1,
    )  # (O, 3, 6)
    m = prob.obs_mask[:, None, None]
    return r, Jl * m, Jp * m


@functools.partial(
    jax.jit, static_argnames=("gn_iterations", "cg_iterations")
)
def ba_solve(
    prob: BAProblem,
    gn_iterations: int = 5,
    cg_iterations: int = 20,
    lm_lambda: float = 1.0e-4,
    anchor_weight: float = 1.0e6,
) -> BAResult:
    # Solve in meters: see backend.posegraph for the f32 conditioning note.
    s = 1.0 / 1000.0
    prob = prob._replace(
        poses=prob.poses.at[..., :3, 3].multiply(s),
        landmarks=prob.landmarks * s,
        obs_p=prob.obs_p * s,
    )
    M = prob.poses.shape[0]
    L = prob.landmarks.shape[0]

    def cost(poses, landmarks):
        r, _, _ = _prepare(poses, landmarks, prob)
        return 0.5 * jnp.sum(r * r)

    # TPU scatter-adds with duplicate unsorted indices serialize badly;
    # pre-sorting each reduction axis once per solve turns every
    # segment_sum in the CG loop into a sorted (fast-path) reduction at the
    # cost of one 0(O)-row gather.
    perm_kf = jnp.argsort(prob.obs_kf, stable=True)
    ids_kf = prob.obs_kf[perm_kf]
    perm_lm = jnp.argsort(prob.obs_lm, stable=True)
    ids_lm = prob.obs_lm[perm_lm]

    def seg_kf(x):
        return jax.ops.segment_sum(
            x[perm_kf], ids_kf, num_segments=M, indices_are_sorted=True
        )

    def seg_lm(x):
        return jax.ops.segment_sum(
            x[perm_lm], ids_lm, num_segments=L, indices_are_sorted=True
        )

    def gn_step(carry, _):
        poses, landmarks, lam = carry
        r, Jl, Jp = _prepare(poses, landmarks, prob)

        b_p = -seg_kf(jnp.einsum("oij,oi->oj", Jp, r))  # (M, 6)
        b_l = -seg_lm(jnp.einsum("oij,oi->oj", Jl, r))  # (L, 3)

        Hll = seg_lm(jnp.einsum("oik,oij->okj", Jl, Jl))  # (L, 3, 3)
        Hll = Hll + (lam + 1e-6) * jnp.broadcast_to(jnp.eye(3), Hll.shape)
        Hll_inv = _inv3(Hll)

        # Block-diag of the pose Hessian (preconditioner + damping).
        Hpp_blk = seg_kf(jnp.einsum("oik,oij->okj", Jp, Jp))  # (M, 6, 6)
        damp = lam * jnp.eye(6)[None] * (1.0 + jnp.trace(Hpp_blk, axis1=-2, axis2=-1))[:, None, None] / 6.0
        anchor = jnp.zeros((M, 6, 6)).at[0].set(anchor_weight * jnp.eye(6))
        P_blk = Hpp_blk + damp + anchor + 1e-3 * jnp.eye(6)[None]
        P_inv = jnp.linalg.inv(P_blk)

        w_l = jnp.einsum("lij,lj->li", Hll_inv, b_l)
        b_schur = b_p - seg_kf(
            jnp.einsum("oij,oi->oj", Jp, jnp.einsum("oij,oj->oi", Jl, w_l[prob.obs_lm]))
        )

        def S_matvec(v):  # v: (M, 6)
            u = jnp.einsum("oij,oj->oi", Jp, v[prob.obs_kf])  # (O, 3)
            t_l = seg_lm(jnp.einsum("oij,oi->oj", Jl, u))  # (L, 3)
            wl = jnp.einsum("lij,lj->li", Hll_inv, t_l)
            corr = jnp.einsum("oij,oj->oi", Jl, wl[prob.obs_lm])
            Sv = seg_kf(jnp.einsum("oij,oi->oj", Jp, u - corr))
            Sv = Sv + jnp.einsum("mij,mj->mi", damp + anchor, v)
            return Sv

        def pc(v):
            return jnp.einsum("mij,mj->mi", P_inv, v)

        # Preconditioned CG on S dx = b_schur.
        x = jnp.zeros((M, 6))
        rr = b_schur - S_matvec(x)
        z = pc(rr)
        p = z

        def cg_body(c, _):
            x, rr, z, p = c
            Sp = S_matvec(p)
            rz = jnp.sum(rr * z)
            alpha = rz / jnp.maximum(jnp.sum(p * Sp), 1e-12)
            x = x + alpha * p
            rr_new = rr - alpha * Sp
            z_new = pc(rr_new)
            beta = jnp.sum(rr_new * z_new) / jnp.maximum(rz, 1e-12)
            p = z_new + beta * p
            return (x, rr_new, z_new, p), None

        (dx, _, _, _), _ = jax.lax.scan(
            cg_body, (x, rr, z, p), None, length=cg_iterations
        )

        # Back-substitute landmarks.
        u = jnp.einsum("oij,oj->oi", Jp, dx[prob.obs_kf])
        t_l = seg_lm(jnp.einsum("oij,oi->oj", Jl, u))
        dl = jnp.einsum("lij,lj->li", Hll_inv, b_l - t_l)

        poses_new = jnp.matmul(poses, se3.se3_exp(dx))
        lm_new = landmarks + dl
        improved = cost(poses_new, lm_new) < cost(poses, landmarks)
        poses = jnp.where(improved, poses_new, poses)
        landmarks = jnp.where(improved, lm_new, landmarks)
        lam = jnp.where(improved, lam * 0.3, lam * 5.0)
        return (poses, landmarks, lam), None

    c0 = cost(prob.poses, prob.landmarks)
    (poses, landmarks, _), _ = jax.lax.scan(
        gn_step, (prob.poses, prob.landmarks, jnp.float32(lm_lambda)), None,
        length=gn_iterations,
    )
    return BAResult(
        poses=poses.at[..., :3, 3].divide(s),
        landmarks=landmarks / s,
        initial_cost=c0,
        final_cost=cost(poses, landmarks),
    )
