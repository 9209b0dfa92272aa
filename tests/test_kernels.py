import jax.numpy as jnp
import numpy as np

from datafusion_tpu.ops import kernels as K


def test_hash64_deterministic_and_spread():
    a = jnp.arange(1000, dtype=jnp.int64)
    h1 = K.hash64([a], seed=0)
    h2 = K.hash64([a], seed=0)
    assert (np.asarray(h1) == np.asarray(h2)).all()
    h3 = K.hash64([a], seed=1)
    assert (np.asarray(h1) != np.asarray(h3)).any()
    # partitions roughly balanced
    parts = np.asarray(h1 % np.uint64(8)).astype(np.int64)
    counts = np.bincount(parts, minlength=8)
    assert counts.min() > 60


def test_sort_rows_basic_and_desc():
    data = jnp.array([5, 3, 9, 1, 7], dtype=jnp.int64)
    sel = jnp.array([True, True, False, True, True])
    payload, ssel = K.sort_rows([(data, None, False, False)], [data], sel)
    live = np.asarray(payload[0])[np.asarray(ssel)]
    assert list(live) == [1, 3, 5, 7]
    payload, ssel = K.sort_rows([(data, None, True, False)], [data], sel)
    live = np.asarray(payload[0])[np.asarray(ssel)]
    assert list(live) == [7, 5, 3, 1]


def test_sort_rows_nulls():
    data = jnp.array([5, 3, 9, 1], dtype=jnp.int64)
    valid = jnp.array([True, False, True, True])
    sel = jnp.ones(4, dtype=bool)
    payload, ssel = K.sort_rows([(data, valid, False, False)], [data], sel)
    # nulls last by default
    assert list(np.asarray(payload[0])) == [1, 5, 9, 3]
    payload, _ = K.sort_rows([(data, valid, False, True)], [data], sel)
    assert list(np.asarray(payload[0])) == [3, 1, 5, 9]


def test_segments():
    keys = jnp.array([1, 1, 2, 2, 2, 5, 0, 0], dtype=jnp.int64)
    sel = jnp.array([True] * 6 + [False, False])
    seg, start, ng = K.segments_from_sorted_keys([keys], [None], sel)
    assert int(ng) == 3
    assert list(np.asarray(seg))[:6] == [0, 0, 1, 1, 1, 2]
    s = K.segment_sum(jnp.ones(8, jnp.int64), seg, sel, 8)
    assert list(np.asarray(s))[:3] == [2, 3, 1]


def test_canonical_ids_and_join_core():
    lk = jnp.array([10, 20, 30, 10, 0], dtype=jnp.int64)
    lsel = jnp.array([True, True, True, True, False])
    rk = jnp.array([20, 10, 40, 0], dtype=jnp.int64)
    rsel = jnp.array([True, True, True, False])
    lid, rid = K.canonical_ids_two_sided(
        [(lk, None)], [(rk, None)], lsel, rsel
    )
    lid, rid = np.asarray(lid), np.asarray(rid)
    assert lid[0] == lid[3] == rid[1]
    assert lid[1] == rid[0]
    assert rid[3] == -1 or rsel[3] == False  # dead row id is -1
    # build = left, probe = right
    perm, lo, cnt, total = K.join_match_counts(
        jnp.asarray(lid).astype(jnp.int64), lsel & (jnp.asarray(lid) >= 0),
        jnp.asarray(rid).astype(jnp.int64), rsel & (jnp.asarray(rid) >= 0),
    )
    cnt = np.asarray(cnt)
    assert list(cnt) == [1, 2, 0, 0]
    assert int(total) == 3
    probe_row, build_row, valid = K.join_expand(perm, lo, jnp.asarray(cnt), 8)
    pr = np.asarray(probe_row)[np.asarray(valid)]
    br = np.asarray(build_row)[np.asarray(valid)]
    got = sorted(zip(pr.tolist(), np.asarray(lk)[br].tolist()))
    assert got == [(0, 20), (1, 10), (1, 10)]


def test_join_null_keys_never_match():
    lk = jnp.array([1, 2], dtype=jnp.int64)
    lv = jnp.array([True, False])
    rk = jnp.array([1, 2], dtype=jnp.int64)
    rv = jnp.array([True, False])
    sel2 = jnp.ones(2, dtype=bool)
    lid, rid = K.canonical_ids_two_sided([(lk, lv)], [(rk, rv)], sel2, sel2)
    assert int(lid[1]) == -1 and int(rid[1]) == -1
    assert int(lid[0]) == int(rid[0]) >= 0


def test_ranks_in_sorted_matches_searchsorted():
    rng = np.random.default_rng(3)
    for trial in range(5):
        a = np.sort(rng.integers(0, 50, rng.integers(5, 200)))
        q = rng.integers(-5, 55, rng.integers(3, 300))
        for side in ("left", "right"):
            got = np.asarray(K.ranks_in_sorted(
                jnp.asarray(a.astype(np.int64)), jnp.asarray(q.astype(np.int64)), side))
            want = np.searchsorted(a, q, side=side)
            assert (got == want).all(), (side, a[:10], q[:10])


def test_packed_sort_key_matches_multi_operand():
    """Property: when every key carries bounds, the packed single-int64
    sort must order rows exactly like the multi-operand fallback, for
    every (desc, nulls_first, validity) combination."""
    rng = np.random.default_rng(7)
    n = 257
    for trial in range(8):
        desc1, nf1 = bool(trial & 1), bool(trial & 2)
        desc2, nf2 = bool(trial & 4), not bool(trial & 1)
        k1 = jnp.asarray(rng.integers(-5, 50, n), dtype=jnp.int64)
        v1 = jnp.asarray(rng.random(n) > 0.2)
        k2 = jnp.asarray(rng.integers(0, 7, n), dtype=jnp.int64)
        k3 = jnp.asarray(rng.random(n) > 0.5)  # bool key
        sel = jnp.asarray(rng.random(n) > 0.1)
        bounded = [(k1, v1, desc1, nf1, (-5, 49)),
                   (k2, None, desc2, nf2, (0, 6)),
                   (k3, None, False, False, (0, 1))]
        unbounded = [(d, v, de, nfi) for d, v, de, nfi, _ in bounded]
        p_fast = np.asarray(K.sort_permutation(bounded, sel))
        p_ref = np.asarray(K.sort_permutation(unbounded, sel))
        assert (p_fast == p_ref).all(), (trial, p_fast[:10], p_ref[:10])


def test_packed_sort_key_falls_back_when_unbounded():
    n = 64
    data = jnp.arange(n, dtype=jnp.int64)
    f = jnp.linspace(0.0, 1.0, n)
    sel = jnp.ones(n, dtype=bool)
    # float key has no bounds: must still sort correctly via fallback
    perm = np.asarray(K.sort_permutation(
        [(f, None, True, False, None), (data, None, False, False, (0, n - 1))],
        sel))
    assert perm[0] == n - 1 and perm[-1] == 0
