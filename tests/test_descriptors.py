import jax.numpy as jnp
import numpy as np
import pytest

from bshot_slam_tpu.config import DescriptorConfig
from bshot_slam_tpu.ops import bshot, hamming, shot
from bshot_slam_tpu.ops.normals import surface_normals

from tests.oracles import bshot_binarize_oracle


# ---------- B-SHOT binarization ----------

def test_binarize_matches_oracle_random(rng):
    x = rng.uniform(0, 1, (64, 352)).astype(np.float32)
    x[x < 0.3] = 0.0  # plenty of zeros, like sparse SHOT histograms
    got = np.asarray(bshot.binarize(jnp.asarray(x)))
    want = bshot_binarize_oracle(x)
    np.testing.assert_array_equal(got, want)


def test_binarize_edge_cases():
    cases = np.zeros((6, 352), np.float32)
    cases[0, 0:4] = [1.0, 0.0, 0.0, 0.0]        # single dominant -> 1000
    cases[1, 0:4] = [0.5, 0.5, 0.0, 0.0]        # pair 01 -> 1100
    cases[2, 0:4] = [0.34, 0.33, 0.33, 0.0]     # triple 012 -> 1110
    cases[3, 0:4] = [0.25, 0.25, 0.25, 0.25]    # fallback -> 1111
    cases[4, 0:4] = [0.0, 0.0, 0.0, 0.0]        # zeros -> 0000
    cases[5, 0:4] = [0.05, 0.0, 0.95, 0.0]      # v2 > 0.9 sum -> 0010
    got = np.asarray(bshot.binarize(jnp.asarray(cases)))[:, :4]
    want = np.array(
        [[1, 0, 0, 0], [1, 1, 0, 0], [1, 1, 1, 0], [1, 1, 1, 1], [0, 0, 0, 0], [0, 0, 1, 0]],
        np.uint8,
    )
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got, bshot_binarize_oracle(cases)[:, :4])


def test_pack_unpack_roundtrip(rng):
    bits = (rng.uniform(size=(20, 352)) < 0.5).astype(np.uint8)
    words = bshot.pack_bits(jnp.asarray(bits))
    assert words.shape == (20, 11)
    back = np.asarray(bshot.unpack_bits(words))
    np.testing.assert_array_equal(back, bits)


# ---------- Hamming matching ----------

def test_matmul_equals_popcount(rng):
    a = (rng.uniform(size=(40, 352)) < 0.4).astype(np.uint8)
    b = (rng.uniform(size=(70, 352)) < 0.4).astype(np.uint8)
    aw = bshot.pack_bits(jnp.asarray(a))
    bw = bshot.pack_bits(jnp.asarray(b))
    d_pop = np.asarray(hamming.popcount_distances(aw, bw))
    d_mm = np.asarray(hamming.matmul_distances(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(d_mm, d_pop)
    # cross-check a couple against pure numpy
    want = (a[5] != b[17]).sum()
    assert d_pop[5, 17] == want


def test_mutual_nn_semantics(rng):
    a = (rng.uniform(size=(30, 352)) < 0.5).astype(np.uint8)
    # b = shuffled copies of a plus distractors: mutual NN must invert the shuffle
    perm = rng.permutation(30)
    b = np.concatenate([a[perm], (rng.uniform(size=(20, 352)) < 0.5).astype(np.uint8)])
    aw = bshot.pack_bits(jnp.asarray(a))
    bw = bshot.pack_bits(jnp.asarray(b))
    am = jnp.ones(30, bool)
    bm = jnp.ones(50, bool)
    m = hamming.mutual_nn(aw, am, bw, bm)
    assert bool(m.mutual.all())
    np.testing.assert_array_equal(np.asarray(m.src_to_ref), np.argsort(perm))
    # equivalent check: b[src_to_ref[i]] == a[i]
    np.testing.assert_array_equal(b[np.asarray(m.src_to_ref)], a)
    assert (np.asarray(m.distances) == 0).all()


def test_mutual_nn_masks(rng):
    a = (rng.uniform(size=(8, 352)) < 0.5).astype(np.uint8)
    b = a.copy()
    aw = bshot.pack_bits(jnp.asarray(a))
    bw = bshot.pack_bits(jnp.asarray(b))
    am = jnp.asarray(np.array([True] * 6 + [False] * 2))
    bm = jnp.asarray(np.array([True] * 8))
    m = hamming.mutual_nn(aw, am, bw, bm)
    assert not bool(m.mutual[6]) and not bool(m.mutual[7])
    assert bool(m.mutual[:6].all())


# ---------- Normals ----------

def test_normals_on_plane(rng):
    pts = np.zeros((600, 3), np.float32)
    pts[:500, :2] = rng.uniform(-3000, 3000, (500, 2))
    pts[:500, 2] = 100.0 + rng.normal(0, 1.0, 500)
    mask = np.zeros(600, bool)
    mask[:500] = True
    n, curv, valid = surface_normals(jnp.asarray(pts), jnp.asarray(mask), 1500.0, tile=256)
    n = np.asarray(n)[:500]
    # plane at z=100 above origin-viewpoint: flipped normal must point down (n.p<0 => nz<0)
    assert np.all(np.abs(n[:, 2]) > 0.99)
    assert np.all(n[:, 2] < 0)
    assert np.asarray(curv)[:500].max() < 0.01
    assert not bool(np.asarray(valid)[500:].any())


# ---------- SHOT ----------

def _scene_cloud(rng, n=800):
    # corner of two walls + floor: structured enough for stable LRFs
    f = rng.uniform([-2000, -2000, -10], [2000, 2000, 10], (n // 2, 3))
    w1 = rng.uniform([-2000, 1900, 0], [2000, 2000, 2500], (n // 4, 3))
    w2 = rng.uniform([1900, -2000, 0], [2000, 2000, 2500], (n - n // 2 - n // 4, 3))
    return np.concatenate([f, w1, w2]).astype(np.float32)


def test_shot_valid_and_normalized(rng):
    cfg = DescriptorConfig(max_neighbors=128)
    pts = _scene_cloud(rng)
    mask = np.ones(len(pts), bool)
    nrm, _, _ = surface_normals(jnp.asarray(pts), jnp.asarray(mask), cfg.normal_radius_mm, tile=256)
    kps = pts[:24]
    kmask = np.ones(24, bool)
    desc, valid = shot.shot_descriptors(
        jnp.asarray(kps), jnp.asarray(kmask), jnp.asarray(pts), jnp.asarray(mask), nrm, cfg
    )
    desc = np.asarray(desc)
    assert bool(np.asarray(valid).all())
    np.testing.assert_allclose(np.linalg.norm(desc, axis=1), 1.0, rtol=1e-5)
    assert (desc >= 0).all()


def test_shot_rotation_invariance(rng):
    """Descriptors must be (approximately) invariant to a rigid rotation of
    the whole scene — the point of the LRF."""
    cfg = DescriptorConfig(max_neighbors=128)
    pts = _scene_cloud(rng)
    mask = np.ones(len(pts), bool)
    kps = pts[100:110]
    kmask = np.ones(10, bool)

    def describe(p, k):
        nrm, _, _ = surface_normals(jnp.asarray(p), jnp.asarray(mask), cfg.normal_radius_mm, tile=256)
        d, v = shot.shot_descriptors(
            jnp.asarray(k), jnp.asarray(kmask), jnp.asarray(p), jnp.asarray(mask), nrm, cfg
        )
        return np.asarray(d), np.asarray(v)

    d0, v0 = describe(pts, kps)
    th = 0.7
    R = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32
    )
    d1, v1 = describe(pts @ R.T, kps @ R.T)
    ok = v0 & v1
    assert ok.sum() >= 8
    cos_sim = (d0[ok] * d1[ok]).sum(1)
    # A keypoint with a near-degenerate LRF (flat symmetric neighborhood)
    # can legitimately flip axes under rotation — SHOT's known instability;
    # require the bulk to be invariant rather than every single one.
    assert np.median(cos_sim) > 0.97, cos_sim
    assert (cos_sim > 0.9).mean() >= 0.8, cos_sim


def test_bshot_pipeline_discriminates(rng):
    """End-to-end descriptor check: binarized descriptors of the same
    physical point across a rotated copy match better than random pairs."""
    cfg = DescriptorConfig(max_neighbors=128)
    pts = _scene_cloud(rng)
    mask = np.ones(len(pts), bool)
    kps = pts[::40][:16]
    kmask = np.ones(len(kps), bool)

    def words(p, k):
        nrm, _, _ = surface_normals(jnp.asarray(p), jnp.asarray(mask), cfg.normal_radius_mm, tile=256)
        d, v = shot.shot_descriptors(
            jnp.asarray(k), jnp.asarray(kmask), jnp.asarray(p), jnp.asarray(mask), nrm, cfg
        )
        return bshot.bshot_from_shot(d, cfg), v

    th = 0.4
    R = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32
    )
    w0, v0 = words(pts, kps)
    w1, v1 = words(pts @ R.T, kps @ R.T)
    d = np.asarray(hamming.popcount_distances(w0, w1))
    ok = np.asarray(v0) & np.asarray(v1)
    same = np.diag(d)[ok]
    off = d[np.ix_(ok, ok)][~np.eye(ok.sum(), dtype=bool)]
    assert same.mean() < off.mean() - 10, (same.mean(), off.mean())


# ---------- two-stage (chunked) top-k ----------

def test_chunked_top_k_exact_matches_global(rng):
    """Exact chunked selection returns the same member SET (and sorted
    values) as a single global top-k — the correctness premise of the
    two-stage distributed top-k (chunk-local top-k is a superset of the
    global top-k's members in that chunk)."""
    score = rng.normal(0, 1, (7, 512)).astype(np.float32)
    score[rng.uniform(size=score.shape) < 0.3] = -np.inf
    for chunks in (2, 4, 8):
        v, i = shot.chunked_top_k(jnp.asarray(score), 32, chunks, exact=True)
        gv, gi = shot.chunked_top_k(jnp.asarray(score), 32, 1, exact=True)
        np.testing.assert_allclose(np.asarray(v), np.asarray(gv))
        for r in range(score.shape[0]):
            got = np.asarray(i[r])
            want = np.asarray(gi[r])
            fin = np.isfinite(np.asarray(v[r]))
            assert set(got[fin]) == set(want[fin])


def test_chunked_top_k_falls_back_on_bad_split(rng):
    """Non-dividing chunk counts / too-small chunks use the single-stage
    path (no shape errors, same results)."""
    score = rng.normal(0, 1, (3, 100)).astype(np.float32)
    v1, i1 = shot.chunked_top_k(jnp.asarray(score), 10, 7, exact=True)
    v0, i0 = shot.chunked_top_k(jnp.asarray(score), 10, 1, exact=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))
    # chunk size would be < k: falls back too
    v2, _ = shot.chunked_top_k(jnp.asarray(score), 60, 4, exact=True)
    want = np.sort(score, axis=-1)[:, ::-1][:, :60]
    np.testing.assert_allclose(np.asarray(v2), want)


def test_shot_descriptors_chunked_matches_single_stage(rng):
    """Descriptors from chunked neighbor selection must match the
    single-stage exact path (same neighbor set; accumulation order may
    differ, so tolerance is float-roundoff scale)."""
    n = 1024
    pts = rng.uniform(-4000, 4000, (n, 3)).astype(np.float32)
    mask = np.ones(n, bool)
    cfg = DescriptorConfig(max_neighbors=96)
    normals, _, _ = surface_normals(jnp.asarray(pts), jnp.asarray(mask),
                                    cfg.normal_radius_mm, 256)
    kp = pts[:16]
    kpm = np.ones(16, bool)
    d1, v1 = shot.shot_descriptors(
        jnp.asarray(kp), jnp.asarray(kpm), jnp.asarray(pts),
        jnp.asarray(mask), normals, cfg, exact_topk=True, topk_chunks=1,
    )
    d8, v8 = shot.shot_descriptors(
        jnp.asarray(kp), jnp.asarray(kpm), jnp.asarray(pts),
        jnp.asarray(mask), normals, cfg, exact_topk=True, topk_chunks=8,
    )
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v8))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d8), atol=1e-5)
