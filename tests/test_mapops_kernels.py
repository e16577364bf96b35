"""mapops Pallas kernels vs the plain-XLA implementations (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest


from bshot_slam_tpu.kernels import mapops
from bshot_slam_tpu.ops import hamming
from bshot_slam_tpu.ops.bshot import unpack_bits
from bshot_slam_tpu.ops.keypoints import _pair_d2


@pytest.fixture
def rng():
    return np.random.default_rng(77)


@pytest.fixture
def descriptors(rng):
    Ka, Cb = 37, 300
    aw = jnp.asarray(rng.integers(0, 2**32, (Ka, 11), dtype=np.uint64)
                     .astype(np.uint32))
    bw = jnp.asarray(rng.integers(0, 2**32, (Cb, 11), dtype=np.uint64)
                     .astype(np.uint32))
    am = jnp.asarray(rng.random(Ka) > 0.1)
    # valid rows front-compacted with a hole pattern inside the bound
    bm_np = np.zeros(Cb, bool)
    bm_np[:200] = rng.random(200) > 0.15
    return aw, am, bw, jnp.asarray(bm_np), 200


def test_hamming_nn_matches_dense(descriptors):
    aw, am, bw, bm, nv = descriptors
    a_bits = unpack_bits(aw).astype(jnp.float32)
    amin, aarg, bmin, barg = mapops.hamming_nn_bounded(
        a_bits, am, bw, bm, jnp.int32(nv), interpret=True
    )
    d = np.asarray(hamming.popcount_distances(aw, bw)).astype(np.float64)
    d[~np.asarray(am)] = np.inf
    d[:, ~np.asarray(bm)] = np.inf
    want_arg = d.argmin(axis=1)
    want_min = d.min(axis=1)
    ok = np.isfinite(want_min)
    np.testing.assert_array_equal(np.asarray(aarg)[ok], want_arg[ok])
    np.testing.assert_allclose(np.asarray(amin)[ok], want_min[ok])
    wb_arg = d.argmin(axis=0)
    wb_min = d.min(axis=0)
    okb = np.isfinite(wb_min)
    np.testing.assert_array_equal(np.asarray(barg)[okb], wb_arg[okb])
    np.testing.assert_allclose(np.asarray(bmin)[okb], wb_min[okb])
    # skipped region reports _BIG
    assert (np.asarray(bmin)[nv:] > 1e30).all()


def test_hamming_nn_tie_lowest_index(rng):
    aw = jnp.zeros((8, 11), jnp.uint32)
    bw = jnp.zeros((64, 11), jnp.uint32)  # all identical -> all ties
    am = jnp.ones(8, bool)
    bm = jnp.ones(64, bool)
    a_bits = unpack_bits(aw).astype(jnp.float32)
    _, aarg, _, barg = mapops.hamming_nn_bounded(
        a_bits, am, bw, bm, jnp.int32(64), interpret=True
    )
    assert (np.asarray(aarg) == 0).all()
    assert (np.asarray(barg) == 0).all()


def test_euclid_nn_matches_dense(rng):
    Kq, Cr, nv = 29, 280, 190
    q = jnp.asarray(rng.normal(0, 5000, (Kq, 3)).astype(np.float32))
    r = jnp.asarray(rng.normal(0, 5000, (Cr, 3)).astype(np.float32))
    qm = jnp.asarray(rng.random(Kq) > 0.1)
    rm_np = np.zeros(Cr, bool)
    rm_np[:nv] = rng.random(nv) > 0.1
    rm = jnp.asarray(rm_np)
    d2, idx = mapops.euclid_nn_bounded(q, qm, r, rm, jnp.int32(nv),
                                       interpret=True)
    dref = np.asarray(_pair_d2(q, r)).astype(np.float64)
    dref[:, ~rm_np] = np.inf
    dref[~np.asarray(qm)] = np.inf
    ok = np.isfinite(dref.min(axis=1))
    np.testing.assert_array_equal(np.asarray(idx)[ok], dref.argmin(axis=1)[ok])
    np.testing.assert_allclose(np.asarray(d2)[ok], dref.min(axis=1)[ok],
                               rtol=1e-4, atol=1e-2)


def test_dedup_matches_reference_rule(rng):
    K, C, nv = 33, 260, 180
    pos = jnp.asarray((rng.normal(0, 3000, (K, 3)) // 10 * 10)
                      .astype(np.float32))
    seg = jnp.asarray(rng.random(K).astype(np.float32))
    mpos_np = (rng.normal(0, 3000, (C, 3)) // 10 * 10).astype(np.float32)
    mpos_np[:K] = np.asarray(pos) + rng.normal(0, 500, (K, 3)).astype(
        np.float32)  # force near-collisions
    mseg = rng.random(C).astype(np.float32)
    mval_np = np.zeros(C, bool)
    mval_np[:nv] = True
    blk = jnp.asarray(np.round(np.asarray(pos) / 10000.0).astype(np.int32))
    mblk_np = np.round(mpos_np / 10000.0).astype(np.int32)

    got = mapops.dedup_blocked_bounded(
        pos, blk, seg, jnp.asarray(mpos_np), jnp.asarray(mblk_np),
        jnp.asarray(mseg), jnp.asarray(mval_np), jnp.int32(nv),
        dedup_radius=800.0, interpret=True,
    )
    d2 = ((np.asarray(pos)[:, None] - mpos_np[None]) ** 2).sum(-1)
    same = (np.asarray(blk)[:, None] == mblk_np[None]).all(-1)
    want = (
        mval_np[None, :] & same & (d2 < 800.0**2)
        & (mseg[None, :] >= np.asarray(seg)[:, None])
    ).any(1)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_hamming_nn_tail_region(rng):
    """Candidates: map prefix [0, nv) + always-live tail [tail_start, end);
    the empty middle must be skipped but the tail searched."""
    Cb, nv, K = 2048, 100, 40
    aw = jnp.asarray(rng.integers(0, 2**32, (8, 11), dtype=np.uint64)
                     .astype(np.uint32))
    bw_np = rng.integers(0, 2**32, (Cb + K, 11), dtype=np.uint64).astype(
        np.uint32)
    bm_np = np.zeros(Cb + K, bool)
    bm_np[:nv] = True
    bm_np[Cb:] = True
    # plant an exact duplicate of src row 0 in the tail
    a_np = np.asarray(aw)
    bw_np[Cb + 5] = a_np[0]
    am = jnp.ones(8, bool)
    a_bits = unpack_bits(aw).astype(jnp.float32)
    amin, aarg, _, _ = mapops.hamming_nn_bounded(
        a_bits, am, jnp.asarray(bw_np), jnp.asarray(bm_np), jnp.int32(nv),
        tail_start=Cb, interpret=True,
    )
    d = np.asarray(hamming.popcount_distances(aw, jnp.asarray(bw_np)))
    d = d.astype(np.float64)
    d[:, ~bm_np] = np.inf
    np.testing.assert_array_equal(np.asarray(aarg), d.argmin(axis=1))
    assert int(np.asarray(aarg)[0]) == Cb + 5 and float(amin[0]) == 0.0
