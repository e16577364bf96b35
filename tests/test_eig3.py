import jax.numpy as jnp
import numpy as np

from bshot_slam_tpu.geometry.eig3 import eigh3, eigvalsh3


def _random_sym(rng, n=500, scale=1e6):
    X = rng.normal(size=(n, 3, 5)) * np.sqrt(scale)
    return (X @ np.swapaxes(X, 1, 2)).astype(np.float32)


def test_eigvals_match_lapack(rng):
    A = _random_sym(rng)
    got = np.asarray(eigvalsh3(jnp.asarray(A)))
    want = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3 * np.abs(want).max())


def test_eigvecs_satisfy_definition(rng):
    A = _random_sym(rng, n=300)
    lam, V = eigh3(jnp.asarray(A))
    lam, V = np.asarray(lam), np.asarray(V)
    for i in range(3):
        res = np.einsum("nij,nj->ni", A, V[:, :, i]) - lam[:, i : i + 1] * V[:, :, i]
        scale = np.abs(lam).max(axis=1) + 1.0
        assert (np.linalg.norm(res, axis=1) / scale).max() < 5e-2
    # orthonormal
    G = np.einsum("nij,nik->njk", V, V)
    np.testing.assert_allclose(G, np.tile(np.eye(3), (300, 1, 1)), atol=1e-4)


def test_degenerate_isotropic():
    A = jnp.tile(2.5 * jnp.eye(3), (4, 1, 1))
    lam, V = eigh3(A)
    np.testing.assert_allclose(np.asarray(lam), 2.5, rtol=1e-6)
    assert np.isfinite(np.asarray(V)).all()


def test_rank_one():
    v = np.array([1.0, 2.0, 3.0], np.float32)
    A = jnp.asarray(np.outer(v, v)[None])
    lam, V = eigh3(A)
    lam = np.asarray(lam)[0]
    np.testing.assert_allclose(lam[2], float(v @ v), rtol=1e-5)
    assert abs(lam[0]) < 1e-4 and abs(lam[1]) < 1e-4
    top = np.asarray(V)[0, :, 2]
    cos = abs(top @ (v / np.linalg.norm(v)))
    assert cos > 0.9999
