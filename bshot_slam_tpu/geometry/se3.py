"""SE(3) utilities: 4x4 pose matrices, exp/log maps, and masked rigid fits.

The reference stores poses as raw `Eigen::Matrix4f` (reference: include/frame.h
`T_c_w_`) and never needs a Lie algebra because it has no optimizer (g2o is
linked but unused — reference CMakeLists.txt:86).  The rebuild's Gauss-Newton /
LM backend and batched RANSAC both need differentiable, batch-friendly SE(3)
operations, so everything here is pure jnp and `vmap`/`jit` safe.

Conventions: poses are (4, 4) float32 row-matrices T such that
`p_world = T[:3, :3] @ p_local + T[:3, 3]`, matching the reference's use of
`pcl::transformPointCloud` (reference: src/lidar_odometry.cpp:292).
Units are mm (positions) and radians (angles).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def identity() -> jnp.ndarray:
    return jnp.eye(4, dtype=jnp.float32)


def from_rt(rotation: jnp.ndarray, translation: jnp.ndarray) -> jnp.ndarray:
    """Build (..., 4, 4) from (..., 3, 3) rotation and (..., 3) translation."""
    batch = jnp.broadcast_shapes(rotation.shape[:-2], translation.shape[:-1])
    rotation = jnp.broadcast_to(rotation, batch + (3, 3))
    translation = jnp.broadcast_to(translation, batch + (3,))
    top = jnp.concatenate([rotation, translation[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=rotation.dtype), batch + (4,)
    )
    return jnp.concatenate([top, bottom[..., None, :]], axis=-2)


def rotation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, :3]


def translation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, 3]


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    R = rotation(T)
    t = translation(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return from_rt(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(A, B)


def apply(T: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Transform (..., N, 3) points by (..., 4, 4) pose."""
    R = rotation(T)
    t = translation(T)
    return jnp.einsum("...ij,...nj->...ni", R, points) + t[..., None, :]


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula, (..., 3) -> (..., 3, 3); Taylor-safe near zero.

    Untaken `where` branches must stay finite (no /theta2 at 0) or their
    NaN leaks into autodiff — the backend differentiates through here.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    safe2 = jnp.maximum(theta2, _EPS)
    theta = jnp.sqrt(safe2)
    W = hat(w)
    W2 = jnp.matmul(W, W)
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 3) rotation vector; stable away from theta=pi.

    cos(theta) is clamped strictly inside (-1, 1): arccos has infinite
    derivative at +-1, which would leak NaN into `jax.jacrev` of any
    residual that is exactly zero (identity relative pose) — the pose-graph
    optimizer differentiates through here.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_theta)
    vee = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    small = theta < 1e-5
    # 0.5 * theta / sin(theta), Taylor for small theta.
    scale = jnp.where(
        small, 0.5 + theta * theta / 12.0, 0.5 * theta / jnp.where(small, 1.0, sin_theta)
    )
    return scale[..., None] * vee


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) twist [rho, w] -> (..., 4, 4)."""
    rho = xi[..., :3]
    w = xi[..., 3:]
    R = so3_exp(w)
    theta2 = jnp.sum(w * w, axis=-1)
    safe2 = jnp.maximum(theta2, _EPS)
    theta = jnp.sqrt(safe2)
    W = hat(w)
    W2 = jnp.matmul(W, W)
    small = theta2 < 1e-8
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe2)
    c = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (safe2 * theta)
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    V = eye + b[..., None, None] * W + c[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return from_rt(R, t)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) -> (..., 6) twist [rho, w]."""
    w = so3_log(rotation(T))
    theta2 = jnp.sum(w * w, axis=-1)
    safe2 = jnp.maximum(theta2, _EPS)
    theta = jnp.sqrt(safe2)
    W = hat(w)
    W2 = jnp.matmul(W, W)
    small = theta2 < 1e-8
    # V^{-1} = I - W/2 + (1/theta^2 - (1+cos)/(2 theta sin)) W^2
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        1.0 / safe2
        - (1.0 + jnp.cos(theta)) / (2.0 * theta * jnp.sin(theta) + _EPS),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    Vinv = eye - 0.5 * W + coef[..., None, None] * W2
    rho = jnp.einsum("...ij,...j->...i", Vinv, translation(T))
    return jnp.concatenate([rho, w], axis=-1)


def heading_angle(T_delta: jnp.ndarray) -> jnp.ndarray:
    """Angle between the +y heading vector pre/post rotation, radians.

    Mirrors the reference gate metric `acos(h^T R h)` with h = (0, 1, 0)
    (reference: src/lidar_odometry.cpp:272-273).
    """
    R = rotation(T_delta)
    return jnp.arccos(jnp.clip(R[..., 1, 1], -1.0, 1.0))


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) [w, x, y, z] -> (..., 3, 3) rotation."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                       2 * (x * z + w * y)], axis=-1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                       2 * (y * z - w * x)], axis=-1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                       1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )


def kabsch(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Weighted least-squares rigid transform T with dst ~= T(src).

    src, dst: (..., N, 3); weights: (..., N) nonnegative (mask or soft).
    Returns (..., 4, 4).

    Solved by Horn's quaternion method: the optimal rotation is the top
    eigenvector of a 4x4 symmetric matrix built from the cross-covariance,
    found here by shifted power iteration — branch-free, batched, and far
    lighter to compile on TPU than an iterative SVD (this runs 2000x per
    RANSAC batch).  Degenerate inputs (all-zero weights, rank-deficient
    covariance) return a finite best-effort solution rather than NaN.
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], dtype=src.dtype)
    w = weights / (jnp.sum(weights, axis=-1, keepdims=True) + _EPS)
    mu_src = jnp.sum(src * w[..., None], axis=-2)
    mu_dst = jnp.sum(dst * w[..., None], axis=-2)
    src_c = src - mu_src[..., None, :]
    dst_c = dst - mu_dst[..., None, :]
    # Cross-covariance H[a, b] = sum_i w_i src_i[a] dst_i[b].
    H = jnp.einsum("...n,...na,...nb->...ab", w, src_c, dst_c)
    # Normalize scale so the power-iteration shift is well conditioned.
    scale = jnp.sqrt(jnp.sum(H * H, axis=(-2, -1), keepdims=True)) + _EPS
    Hn = H / scale
    Sxx, Sxy, Sxz = Hn[..., 0, 0], Hn[..., 0, 1], Hn[..., 0, 2]
    Syx, Syy, Syz = Hn[..., 1, 0], Hn[..., 1, 1], Hn[..., 1, 2]
    Szx, Szy, Szz = Hn[..., 2, 0], Hn[..., 2, 1], Hn[..., 2, 2]
    K = jnp.stack(
        [
            jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
            jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
            jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1),
            jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1),
        ],
        axis=-2,
    )
    # Shift by 2*I (eigenvalues of K/|H| lie in [-2, 2]) -> top eigenpair.
    Ks = K + 2.0 * jnp.eye(4, dtype=K.dtype)
    q = jnp.ones(K.shape[:-1], dtype=K.dtype)
    for _ in range(30):
        q = jnp.einsum("...ij,...j->...i", Ks, q)
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)
    R = quat_to_matrix(q)
    t = mu_dst - jnp.einsum("...ij,...j->...i", R, mu_src)
    return from_rt(R, t)
