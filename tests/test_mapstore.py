import dataclasses

import jax.numpy as jnp
import numpy as np

from bshot_slam_tpu.config import MapConfig
from bshot_slam_tpu.odometry import mapstore as ms


CFG = MapConfig(capacity=256)


def _insert(state, pos, seg=None, mask=None):
    K = len(pos)
    pos = np.asarray(pos, np.float32)
    seg = np.ones(K, np.float32) if seg is None else np.asarray(seg, np.float32)
    mask = np.ones(K, bool) if mask is None else np.asarray(mask, bool)
    desc = np.zeros((K, 11), np.uint32)
    return ms.insert_keypoints(state, jnp.asarray(pos), jnp.asarray(desc), jnp.asarray(seg), jnp.asarray(mask), CFG)


def sequential_oracle(inserts):
    """Reference Map::addKeypoint semantics, sequential (mymap.cpp:4-26)."""
    store = {}  # block -> list of [pos, seg]
    for pos, seg in inserts:
        pos = np.trunc(np.asarray(pos) / 10.0) * 10.0
        blk = tuple(int(round(p / 10000.0)) for p in pos)
        if blk not in store:
            store[blk] = {tuple(pos): seg}
        else:
            ok = True
            for p2, s2 in store[blk].items():
                if np.linalg.norm(pos - np.array(p2)) < 800 and seg <= s2:
                    ok = False
            if ok:
                store[blk][tuple(pos)] = seg
    return store


def test_snap_truncates_toward_zero():
    p = jnp.asarray(np.array([[19.0, -19.0, 5.0]], np.float32))
    got = np.asarray(ms.snap_positions(p, 10.0))
    np.testing.assert_array_equal(got, [[10.0, -10.0, 0.0]])


def test_insert_and_dedup_matches_oracle(rng):
    state = ms.init_map(CFG)
    batches = []
    for b in range(3):
        pts = rng.uniform(-15000, 15000, (40, 3))
        seg = rng.uniform(0, 1, 40)
        batches.append((pts, seg))
        state = _insert(state, pts, seg)
    inserts = [(p, s) for pts, segs in batches for p, s in zip(pts, segs)]
    oracle = sequential_oracle(inserts)
    n_oracle = sum(len(v) for v in oracle.values())
    n_got = int(ms.map_size(state))
    # batched dedup may differ from sequential on tie-chains; allow small slack
    assert abs(n_got - n_oracle) <= max(2, 0.03 * n_oracle), (n_got, n_oracle)


def test_dedup_rejects_lower_quality():
    state = ms.init_map(CFG)
    state = _insert(state, [[100.0, 100.0, 100.0]], seg=[0.9])
    # same block, within 800mm, lower seg -> rejected
    state = _insert(state, [[300.0, 100.0, 100.0]], seg=[0.5])
    assert int(ms.map_size(state)) == 1
    # same block, within 800mm, higher seg -> accepted
    state = _insert(state, [[300.0, 100.0, 100.0]], seg=[0.95])
    assert int(ms.map_size(state)) == 2
    # far away in same block -> accepted
    state = _insert(state, [[3000.0, 100.0, 100.0]], seg=[0.1])
    assert int(ms.map_size(state)) == 3


def test_dedup_is_block_scoped():
    state = ms.init_map(CFG)
    # Two points 600mm apart straddling a block boundary (5000mm): blocks
    # differ, so no dedup even though distance < 800.
    state = _insert(state, [[4700.0, 0.0, 0.0]], seg=[0.9])
    state = _insert(state, [[5300.0, 0.0, 0.0]], seg=[0.1])
    assert int(ms.map_size(state)) == 2


def test_query_mask_block_granularity():
    state = ms.init_map(CFG)
    state = _insert(state, [[0.0, 0.0, 0.0], [20000.0, 0.0, 0.0], [70000.0, 0.0, 0.0]])
    m = np.asarray(ms.query_mask(state, jnp.asarray([0.0, 0.0, 0.0]), 30000.0, CFG))
    assert m[:3].tolist() == [True, True, False]
    # block granularity: a point at 34000 is in block 3 (34000/10000 -> 3),
    # and round((0+30000)/10000)=3 so it IS included despite being > range.
    state2 = _insert(state, [[34000.0, 0.0, 0.0]])
    m2 = np.asarray(ms.query_mask(state2, jnp.asarray([0.0, 0.0, 0.0]), 30000.0, CFG))
    assert m2[3]


def test_capacity_overflow_drops():
    cfg = MapConfig(capacity=8)
    state = ms.init_map(cfg)
    pts = np.arange(12, dtype=np.float32)[:, None] * np.array([5000.0, 0, 0]) + 100000.0
    desc = np.zeros((12, 11), np.uint32)
    state = ms.insert_keypoints(
        state, jnp.asarray(pts.astype(np.float32)), jnp.asarray(desc),
        jnp.ones(12), jnp.ones(12, bool), cfg,
    )
    assert int(ms.map_size(state)) == 8
    assert int(state.cursor) == 8
    # further inserts are no-ops, not corruption
    state = ms.insert_keypoints(
        state, jnp.asarray(pts.astype(np.float32)), jnp.asarray(desc),
        jnp.ones(12), jnp.ones(12, bool), cfg,
    )
    assert int(ms.map_size(state)) == 8


def test_masked_rows_never_insert():
    state = ms.init_map(CFG)
    state = _insert(state, [[1000.0, 0, 0], [2000.0, 0, 0]], mask=[True, False])
    assert int(ms.map_size(state)) == 1


def test_evict_lowest_seg_in_densest_block():
    cfg = MapConfig(capacity=16)
    state = ms.init_map(cfg)
    # Dense block: 6 points in block (0,0,0), >800mm apart (no dedup),
    # seg ratios 0.1..0.6.
    dense = np.array(
        [[1000.0 * i, 0.0, 0.0] for i in range(6)], np.float32
    ) - np.array([2500.0, 0.0, 0.0], np.float32)
    seg_dense = np.linspace(0.1, 0.6, 6)
    # Sparse block far away: 3 points with LOWER seg ratios than some dense.
    sparse = np.array(
        [[90000.0 + 1000.0 * i, 0.0, 0.0] for i in range(3)], np.float32
    )
    seg_sparse = np.array([0.01, 0.02, 0.03])
    desc = np.zeros((6, 11), np.uint32)
    state = ms.insert_keypoints(
        state, jnp.asarray(dense), jnp.asarray(desc),
        jnp.asarray(seg_dense.astype(np.float32)), jnp.ones(6, bool), cfg,
    )
    state = ms.insert_keypoints(
        state, jnp.asarray(sparse), jnp.asarray(desc[:3]),
        jnp.asarray(seg_sparse.astype(np.float32)), jnp.ones(3, bool), cfg,
    )
    assert int(ms.map_size(state)) == 9
    out = ms.evict_keypoints(state, 2)
    # The two weakest DENSE-block points go, even though the sparse block
    # has globally lower seg ratios (densest-block-first policy).
    assert int(ms.map_size(out)) == 7
    assert int(out.cursor) == 7
    segs = np.sort(np.asarray(out.seg_ratios)[np.asarray(out.valid)])
    expected = np.sort(np.concatenate([seg_sparse, seg_dense[2:]]))
    np.testing.assert_allclose(segs, expected, atol=1e-6)
    # Front-compaction invariant: valid rows are exactly [0, cursor).
    v = np.asarray(out.valid)
    assert v[:7].all() and not v[7:].any()
    # frame_born cleared on evicted rows' former slots
    assert (np.asarray(out.frame_born)[7:] == -1).all()


def test_evict_more_than_valid_is_safe():
    cfg = MapConfig(capacity=8)
    state = ms.init_map(cfg)
    state = _insert(state, [[100000.0, 0, 0], [200000.0, 0, 0]])
    out = ms.evict_keypoints(state._replace(), 6)
    assert int(ms.map_size(out)) == 0
    assert int(out.cursor) == 0


def test_engine_evicts_at_hard_capacity():
    """A long run at tiny capacity engages eviction instead of silent loss."""
    import dataclasses as dc

    import jax

    from bshot_slam_tpu.config import tiny_config
    from bshot_slam_tpu.odometry.engine import SlamEngine

    cfg = tiny_config()
    cfg = dc.replace(
        cfg,
        map=dc.replace(cfg.map, capacity=128),
        runtime=dc.replace(cfg.runtime, map_buckets=(128,)),
    )
    eng = SlamEngine(cfg, seed=0, tile=256)
    rng = np.random.default_rng(7)
    P = cfg.preprocess.max_points
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for f in range(6):
            pts = np.zeros((P, 3), np.float32)
            n = P // 2
            # fresh region each frame so dedup can't absorb the load
            pts[:n] = rng.uniform(-2e4, 2e4, (n, 3)) + f * 5.0e4
            mask = np.zeros(P, bool)
            mask[:n] = True
            eng.process_cloud(jnp.asarray(pts), jnp.asarray(mask))
    assert eng.n_evicted > 0
    assert int(eng.state.map.cursor) <= 128
    v = np.asarray(eng.state.map.valid)
    c = int(eng.state.map.cursor)
    assert v[:c].all() and not v[c:].any()


def test_grow_map_preserves_entries():
    """Engine map growth: padding to a wider bucket keeps every entry and
    the step result (the capacity only bounds the scan grids)."""
    import jax
    import jax.numpy as jnp

    from bshot_slam_tpu.config import tiny_config
    from bshot_slam_tpu.odometry import mapstore, pipeline

    cfg = tiny_config()
    rng = np.random.default_rng(5)
    st = mapstore.init_map(cfg.map, 1024)
    K = 64
    pos = jnp.asarray(rng.uniform(-2e4, 2e4, (K, 3)).astype(np.float32))
    desc = jnp.asarray(rng.integers(0, 2**32, (K, 11), dtype=np.uint32))
    seg = jnp.asarray(rng.uniform(0, 1, K).astype(np.float32))
    st = mapstore.insert_keypoints(st, pos, desc, seg, jnp.ones(K, bool),
                                   cfg.map)
    grown = mapstore.grow_map(st, 2048)
    assert grown.positions.shape[0] == 2048
    assert int(grown.cursor) == int(st.cursor)
    n = int(st.cursor)
    np.testing.assert_array_equal(np.asarray(grown.positions[:n]),
                                  np.asarray(st.positions[:n]))
    np.testing.assert_array_equal(np.asarray(grown.valid[:n]),
                                  np.asarray(st.valid[:n]))
    assert not np.asarray(grown.valid[n:]).any()
