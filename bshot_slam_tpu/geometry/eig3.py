"""Closed-form batched 3x3 symmetric eigendecomposition (JAX).

The pipeline needs eigenvalues/vectors of millions of tiny symmetric
matrices per frame (normal PCA, ISS saliency, SHOT LRFs).  XLA's general
`eigh` lowers to an iterative algorithm that is both slow to compile and
heavyweight at these shapes; this module uses the trigonometric closed form
(Smith's algorithm / Eberly's "A Robust Eigensolver for 3x3 Symmetric
Matrices") with cross-product eigenvectors — branch-free, fully batched,
and exact enough for geometry at f32.

Returns eigenvalues ascending to match `jnp.linalg.eigh`'s convention.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def eigvalsh3(A: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues of (..., 3, 3) symmetric matrices, ascending."""
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    B = A - q[..., None, None] * jnp.eye(3, dtype=A.dtype)
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, _EPS))
    detB = jnp.linalg.det(B)
    r = jnp.clip(detB / (2.0 * p * p2 + _EPS) * p2, -1.0, 1.0)
    # r = det(B/p)/2 computed stably:
    r = jnp.clip(detB / jnp.maximum(2.0 * p * p * p, _EPS), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    l1 = q + 2.0 * p * jnp.cos(phi)  # largest
    l3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    l2 = 3.0 * q - l1 - l3
    lam = jnp.stack([l3, l2, l1], axis=-1)
    # Degenerate (p2 ~ 0): all eigenvalues equal q.
    iso = p2 < 1e-10 * jnp.maximum(q * q, 1.0)
    return jnp.where(iso[..., None], q[..., None], lam)


def _eigvec(A: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Eigenvector of symmetric A for eigenvalue lam via the largest cross
    product of rows of (A - lam I)."""
    M = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best = jnp.argmax(jnp.stack([n01, n02, n12], axis=-1), axis=-1)
    cand = jnp.stack([c01, c02, c12], axis=-2)
    v = jnp.take_along_axis(cand, best[..., None, None].repeat(3, -1), axis=-2)[
        ..., 0, :
    ]
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    # Degenerate direction: fall back to a fixed axis (isotropic matrix).
    fallback = jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0], A.dtype), v.shape
    )
    return jnp.where(norm > 1e-20, v / jnp.maximum(norm, 1e-20), fallback)


def _rayleigh(A: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    Av = jnp.einsum("...ij,...j->...i", A, v)
    return jnp.sum(v * Av, axis=-1)


def eigh3(A: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(eigenvalues ascending (..., 3), eigenvectors (..., 3, 3) columns),
    matching jnp.linalg.eigh's layout: evecs[..., :, i] pairs evals[..., i].

    One Rayleigh-quotient polish per extreme eigenpair recovers the
    precision the f32 trigonometric eigenvalues lose on near-rank-deficient
    inputs.
    """
    lam = eigvalsh3(A)
    v0 = _eigvec(A, lam[..., 0])
    v2 = _eigvec(A, lam[..., 2])
    v0 = _eigvec(A, _rayleigh(A, v0))
    v2 = _eigvec(A, _rayleigh(A, v2))
    lam = lam.at[..., 0].set(_rayleigh(A, v0))
    lam = lam.at[..., 2].set(_rayleigh(A, v2))
    lam = lam.at[..., 1].set(
        jnp.trace(A, axis1=-2, axis2=-1) - lam[..., 0] - lam[..., 2]
    )
    # Orthogonalize: middle vector as cross of extremes (exact for symmetric).
    v2 = v2 - v0 * jnp.sum(v0 * v2, axis=-1, keepdims=True)
    v2 = v2 / jnp.maximum(jnp.linalg.norm(v2, axis=-1, keepdims=True), 1e-20)
    v1 = jnp.cross(v2, v0)
    return lam, jnp.stack([v0, v1, v2], axis=-1)
