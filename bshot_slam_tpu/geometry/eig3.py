"""Closed-form batched 3x3 symmetric eigendecomposition (JAX).

The pipeline needs eigenvalues/vectors of tens of thousands of tiny
symmetric matrices per frame (normal PCA, ISS saliency, SHOT LRFs).  XLA's
general `eigh` lowers to an iterative algorithm that is both slow to
compile and heavyweight at these shapes; this module uses the
trigonometric closed form (Smith's algorithm / Eberly's "A Robust
Eigensolver for 3x3 Symmetric Matrices") with cross-product eigenvectors —
branch-free, fully batched, and exact enough for geometry at f32.

TPU layout note: all math runs on the six independent matrix components as
(...,)-shaped arrays (structure-of-arrays).  Keeping a trailing (3, 3)
axis would put the 9 elements on the 128-wide lane dimension and waste
~93% of every vector op; component form keeps the batch axis on lanes.

Returns eigenvalues ascending to match `jnp.linalg.eigh`'s convention.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def _components(A: jnp.ndarray):
    """(..., 3, 3) symmetric -> six (...,) components a00,a11,a22,a01,a12,a02."""
    return (
        A[..., 0, 0], A[..., 1, 1], A[..., 2, 2],
        A[..., 0, 1], A[..., 1, 2], A[..., 0, 2],
    )


def _eigvals_c(a00, a11, a22, a01, a12, a02):
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = (
        b00 * b00 + b11 * b11 + b22 * b22
        + 2.0 * (a01 * a01 + a12 * a12 + a02 * a02)
    ) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, _EPS))
    detB = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    )
    r = jnp.clip(detB / jnp.maximum(2.0 * p * p * p, _EPS), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    l1 = q + 2.0 * p * jnp.cos(phi)  # largest
    l3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    l2 = 3.0 * q - l1 - l3
    # Degenerate (p2 ~ 0): all eigenvalues equal q.
    iso = p2 < 1e-10 * jnp.maximum(q * q, 1.0)
    l1 = jnp.where(iso, q, l1)
    l2 = jnp.where(iso, q, l2)
    l3 = jnp.where(iso, q, l3)
    return l3, l2, l1


def eigvalsh3(A: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues of (..., 3, 3) symmetric matrices, ascending."""
    l3, l2, l1 = _eigvals_c(*_components(A))
    return jnp.stack([l3, l2, l1], axis=-1)


def _eigvec_c(c, lam):
    """Eigenvector (three (...,) components) of symmetric A for eigenvalue
    lam via the largest cross product of rows of (A - lam I)."""
    a00, a11, a22, a01, a12, a02 = c
    m00, m11, m22 = a00 - lam, a11 - lam, a22 - lam
    # rows: r0 = (m00, a01, a02), r1 = (a01, m11, a12), r2 = (a02, a12, m22)
    # c01 = r0 x r1, c02 = r0 x r2, c12 = r1 x r2
    c01x = a01 * a12 - a02 * m11
    c01y = a02 * a01 - m00 * a12
    c01z = m00 * m11 - a01 * a01
    c02x = a01 * m22 - a02 * a12
    c02y = a02 * a02 - m00 * m22
    c02z = m00 * a12 - a01 * a02
    c12x = m11 * m22 - a12 * a12
    c12y = a12 * a02 - a01 * m22
    c12z = a01 * a12 - m11 * a02
    n01 = c01x * c01x + c01y * c01y + c01z * c01z
    n02 = c02x * c02x + c02y * c02y + c02z * c02z
    n12 = c12x * c12x + c12y * c12y + c12z * c12z
    use02 = n02 > n01
    bx = jnp.where(use02, c02x, c01x)
    by = jnp.where(use02, c02y, c01y)
    bz = jnp.where(use02, c02z, c01z)
    bn = jnp.where(use02, n02, n01)
    use12 = n12 > bn
    bx = jnp.where(use12, c12x, bx)
    by = jnp.where(use12, c12y, by)
    bz = jnp.where(use12, c12z, bz)
    bn = jnp.where(use12, n12, bn)
    # Repeated eigenvalue: row cross products vanish (rank-1 M), but any
    # vector orthogonal to the largest row of M spans the eigenplane.
    n0 = m00 * m00 + a01 * a01 + a02 * a02
    n1 = a01 * a01 + m11 * m11 + a12 * a12
    n2 = a02 * a02 + a12 * a12 + m22 * m22
    rx, ry, rz, rn = m00, a01, a02, n0
    take1 = n1 > rn
    rx = jnp.where(take1, a01, rx)
    ry = jnp.where(take1, m11, ry)
    rz = jnp.where(take1, a12, rz)
    rn = jnp.where(take1, n1, rn)
    take2 = n2 > rn
    rx = jnp.where(take2, a02, rx)
    ry = jnp.where(take2, a12, ry)
    rz = jnp.where(take2, m22, rz)
    rn = jnp.where(take2, n2, rn)
    # r x x_hat = (0, rz, -ry);  r x y_hat = (-rz, 0, rx): pick the larger.
    na = ry * ry + rz * rz
    nb = rx * rx + rz * rz
    use_b = nb > na
    ox = jnp.where(use_b, -rz, 0.0)
    oy = jnp.where(use_b, 0.0, rz)
    oz = jnp.where(use_b, rx, -ry)
    on = jnp.where(use_b, nb, na)

    norm = jnp.sqrt(jnp.maximum(bn, 1e-40))
    onorm = jnp.sqrt(jnp.maximum(on, 1e-40))
    # Relative test: the cross products of near-parallel rows scale like
    # rn * eps, so compare bn against rn^2 at f32 precision.
    ok = bn > 1e-12 * rn * rn + 1e-40
    ok2 = on > 1e-40  # rows nonzero -> eigenplane fallback valid
    vx = jnp.where(ok, bx / norm, jnp.where(ok2, ox / onorm, 1.0))
    vy = jnp.where(ok, by / norm, jnp.where(ok2, oy / onorm, 0.0))
    vz = jnp.where(ok, bz / norm, jnp.where(ok2, oz / onorm, 0.0))
    return vx, vy, vz


def _rayleigh_c(c, v):
    a00, a11, a22, a01, a12, a02 = c
    vx, vy, vz = v
    avx = a00 * vx + a01 * vy + a02 * vz
    avy = a01 * vx + a11 * vy + a12 * vz
    avz = a02 * vx + a12 * vy + a22 * vz
    return vx * avx + vy * avy + vz * avz


def eigh3(A: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(eigenvalues ascending (..., 3), eigenvectors (..., 3, 3) columns),
    matching jnp.linalg.eigh's layout: evecs[..., :, i] pairs evals[..., i].

    One Rayleigh-quotient polish per extreme eigenpair recovers the
    precision the f32 trigonometric eigenvalues lose on near-rank-deficient
    inputs.
    """
    c = _components(A)
    l3, l2, l1 = _eigvals_c(*c)
    v0 = _eigvec_c(c, l3)
    v2 = _eigvec_c(c, l1)
    v0 = _eigvec_c(c, _rayleigh_c(c, v0))
    v2 = _eigvec_c(c, _rayleigh_c(c, v2))
    l3 = _rayleigh_c(c, v0)
    l1 = _rayleigh_c(c, v2)
    l2 = (c[0] + c[1] + c[2]) - l3 - l1
    # Orthogonalize: middle vector as cross of extremes (exact for symmetric).
    v0x, v0y, v0z = v0
    v2x, v2y, v2z = v2
    dot = v0x * v2x + v0y * v2y + v0z * v2z
    v2x, v2y, v2z = v2x - dot * v0x, v2y - dot * v0y, v2z - dot * v0z
    n2 = jnp.maximum(
        jnp.sqrt(v2x * v2x + v2y * v2y + v2z * v2z), 1e-20
    )
    v2x, v2y, v2z = v2x / n2, v2y / n2, v2z / n2
    v1x = v2y * v0z - v2z * v0y
    v1y = v2z * v0x - v2x * v0z
    v1z = v2x * v0y - v2y * v0x
    lam = jnp.stack([l3, l2, l1], axis=-1)
    V = jnp.stack(
        [
            jnp.stack([v0x, v1x, v2x], axis=-1),
            jnp.stack([v0y, v1y, v2y], axis=-1),
            jnp.stack([v0z, v1z, v2z], axis=-1),
        ],
        axis=-2,
    )
    return lam, V
