"""Single-sort join phase-1 and scatter-fill phase-2 vs a numpy oracle
(reference behavior contract: joins/hash_join lookup + expansion)."""
import numpy as np
import pytest

import jax.numpy as jnp

from datafusion_tpu.ops.kernels import join_expand, join_match_counts


def _oracle(build_ids, build_live, probe_ids, probe_live):
    """Brute force: per live probe, positions of equal live build keys in
    (key, original index) sorted order."""
    order = sorted((k, i) for i, k in enumerate(build_ids) if build_live[i])
    skeys = [k for k, _ in order]
    perm = [i for _, i in order]
    lo, cnt = [], []
    for p, k in enumerate(probe_ids):
        if not probe_live[p]:
            lo.append(None)
            cnt.append(0)
            continue
        first = np.searchsorted(skeys, k, side="left")
        last = np.searchsorted(skeys, k, side="right")
        lo.append(int(first))
        cnt.append(int(last - first))
    return perm, lo, cnt


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("dup", [1, 4, 50])
def test_match_counts_random(seed, dup):
    rng = np.random.default_rng(seed)
    nb, npr = 257, 389
    build = rng.integers(0, max(nb // dup, 2), nb).astype(np.int64)
    probe = rng.integers(0, max(nb // dup, 2), npr).astype(np.int64)
    blive = rng.random(nb) > 0.2
    plive = rng.random(npr) > 0.2
    perm, lo, cnt, total = join_match_counts(
        jnp.asarray(build), jnp.asarray(blive),
        jnp.asarray(probe), jnp.asarray(plive))
    operm, olo, ocnt = _oracle(build, blive, probe, plive)
    perm, lo, cnt = np.asarray(perm), np.asarray(lo), np.asarray(cnt)
    assert cnt.tolist() == ocnt
    assert int(total) == sum(ocnt)
    # where matches exist, the window [lo, lo+cnt) in OUR sorted build must
    # hold exactly the oracle's matching original rows (as a set)
    for p in range(npr):
        if ocnt[p]:
            ours = set(perm[lo[p]:lo[p] + cnt[p]].tolist())
            ref = set(operm[olo[p]:olo[p] + ocnt[p]])
            assert ours == ref, p


def test_match_counts_extreme_keys():
    """INT64_MAX/MIN are ordinary key values (no in-band sentinels)."""
    M = np.iinfo(np.int64).max
    m = np.iinfo(np.int64).min
    build = np.array([M, m, 0, M, 7], dtype=np.int64)
    blive = np.array([True, True, True, True, False])
    probe = np.array([M, m, 7, 1], dtype=np.int64)
    plive = np.array([True, True, True, True])
    perm, lo, cnt, total = join_match_counts(
        jnp.asarray(build), jnp.asarray(blive),
        jnp.asarray(probe), jnp.asarray(plive))
    assert np.asarray(cnt).tolist() == [2, 1, 0, 0]  # dead 7 not matched
    assert int(total) == 3


def test_match_counts_all_dead_build():
    build = np.array([1, 2, 3], dtype=np.int64)
    perm, lo, cnt, total = join_match_counts(
        jnp.asarray(build), jnp.zeros(3, bool),
        jnp.asarray(build), jnp.ones(3, bool))
    assert np.asarray(cnt).tolist() == [0, 0, 0] and int(total) == 0


def test_expand_matches_counts():
    rng = np.random.default_rng(7)
    nb, npr = 64, 100
    build = rng.integers(0, 20, nb).astype(np.int64)
    probe = rng.integers(0, 20, npr).astype(np.int64)
    blive = rng.random(nb) > 0.3
    plive = rng.random(npr) > 0.3
    perm, lo, cnt, total = join_match_counts(
        jnp.asarray(build), jnp.asarray(blive),
        jnp.asarray(probe), jnp.asarray(plive))
    cap = 1 << int(np.ceil(np.log2(max(int(total), 1))))
    probe_row, build_row, out_valid = join_expand(perm, lo, cnt, cap)
    probe_row = np.asarray(probe_row)
    build_row = np.asarray(build_row)
    out_valid = np.asarray(out_valid)
    assert out_valid.sum() == int(total)
    # every valid output pair joins equal live keys
    for j in np.flatnonzero(out_valid):
        p, b = probe_row[j], build_row[j]
        assert plive[p] and blive[b] and probe[p] == build[b]
    # pair multiset matches the cross product per key
    pairs = {(int(probe_row[j]), int(build_row[j]))
             for j in np.flatnonzero(out_valid)}
    expect = {(p, b) for p in range(npr) if plive[p]
              for b in range(nb) if blive[b] and probe[p] == build[b]}
    assert pairs == expect


def test_expand_zero_total():
    perm = jnp.arange(4, dtype=jnp.int32)
    lo = jnp.zeros(5, jnp.int32)
    cnt = jnp.zeros(5, jnp.int32)
    probe_row, build_row, out_valid = join_expand(perm, lo, cnt, 8)
    assert not np.asarray(out_valid).any()


# -- bucketed direct-address join ------------------------------------------

def _mkcol(vals, bounds=None):
    from datafusion_tpu.common import types as T
    from datafusion_tpu.data.device import DeviceColumn
    data = jnp.asarray(np.asarray(vals, np.int64))
    b = bounds or (int(np.min(vals)), int(np.max(vals)))
    return DeviceColumn(data, None, T.INT64, None, b)


def test_bucket_domain_prefers_largest_span():
    from datafusion_tpu.ops.joinimpl import bucket_domain
    a = _mkcol([0], bounds=(0, 199))      # span 200
    b = _mkcol([0], bounds=(0, 999))      # span 1000 > limit alone? no: fits
    info = bucket_domain([a, b], [a, b], prefix_limit=1000)
    assert info is not None
    order, spans, nprefix, d1 = info
    assert order[0] == 1 and nprefix == 1 and d1 == 1000


def test_bucket_lookup_matches_bruteforce():
    from datafusion_tpu.ops.joinimpl import (bucket_domain, bucket_max_count,
                                             join_bucket_lookup)
    rng = np.random.default_rng(3)
    nb, npr = 128, 256
    bk1 = rng.integers(0, 40, nb)
    bk2 = rng.integers(0, 37, nb)
    # dedupe composite keys (unique build required for the lookup path)
    seen, keep = set(), []
    for i, kv in enumerate(zip(bk1.tolist(), bk2.tolist())):
        keep.append(kv not in seen)
        seen.add(kv)
    blive = np.asarray(keep) & (rng.random(nb) > 0.2)
    pk1 = rng.integers(0, 40, npr)
    pk2 = rng.integers(0, 37, npr)
    plive = rng.random(npr) > 0.2
    bounds1, bounds2 = (0, 39), (0, 36)
    lk = [_mkcol(pk1, bounds1), _mkcol(pk2, bounds2)]
    rk = [_mkcol(bk1, bounds1), _mkcol(bk2, bounds2)]
    info = bucket_domain(lk, rk, prefix_limit=64)
    assert info is not None
    order, spans, nprefix, d1 = info
    maxb = int(bucket_max_count([rk[i] for i in order], jnp.asarray(blive),
                                spans, nprefix, d1))
    B = 1
    while B < maxb:
        B *= 2
    brow, matched, bad = join_bucket_lookup(
        [lk[i] for i in order], [rk[i] for i in order],
        jnp.asarray(plive), jnp.asarray(blive), spans, nprefix, d1, B)
    assert not bool(bad)
    brow, matched = np.asarray(brow), np.asarray(matched)
    for p in range(npr):
        ref = [b for b in range(nb) if blive[b] and plive[p]
               and bk1[b] == pk1[p] and bk2[b] == pk2[p]]
        if ref:
            assert matched[p] and brow[p] == ref[0], p
        else:
            assert not matched[p], p


def test_bucket_lookup_flags_duplicates_and_overflow():
    from datafusion_tpu.ops.joinimpl import join_bucket_lookup
    spans = ((0, 8), (0, 8))
    k1 = _mkcol([1, 1, 2], bounds=(0, 7))
    k2 = _mkcol([3, 3, 4], bounds=(0, 7))
    live = jnp.ones(3, bool)
    _, _, bad = join_bucket_lookup([k1, k2], [k1, k2], live, live,
                                   spans, 1, 8, 4)
    assert bool(bad)  # duplicate (1,3) build key
    # overflow: 3 rows share prefix 1 with B=2
    k1o = _mkcol([1, 1, 1], bounds=(0, 7))
    k2o = _mkcol([0, 1, 2], bounds=(0, 7))
    _, _, bad2 = join_bucket_lookup([k1o, k2o], [k1o, k2o], live, live,
                                    spans, 1, 8, 2)
    assert bool(bad2)
    _, m, bad3 = join_bucket_lookup([k1o, k2o], [k1o, k2o], live, live,
                                    spans, 1, 8, 4)
    assert not bool(bad3) and np.asarray(m).all()


def test_join_exists_minmax_matches_bruteforce():
    """Semi/anti with a single cross-side comparison residual via per-key
    scatter-min/max (TPC-H Q21's pattern)."""
    import pandas as pd

    from datafusion_tpu.context import SessionContext

    rng = np.random.default_rng(11)
    n = 3000
    ok_ = rng.integers(0, 300, n)
    sk = rng.integers(0, 8, n)
    rd = rng.integers(0, 50, n)
    # sprinkle NULLs into the compared column
    sk_list = [None if rng.random() < 0.05 else int(v) for v in sk]
    ctx = SessionContext()
    ctx.register_table("t", {"ok": ok_.tolist(), "sk": sk_list,
                             "rd": rd.tolist()})
    df = pd.DataFrame({"i": range(n), "ok": ok_,
                       "sk": [np.nan if v is None else v for v in sk_list],
                       "rd": rd})
    for op, f in [("<>", lambda a, b: a != b), ("<", lambda a, b: a < b),
                  (">=", lambda a, b: a >= b)]:
        q = (f"SELECT count(*) AS n FROM t a WHERE EXISTS ("
             f"SELECT 1 FROM t b WHERE b.ok = a.ok AND a.sk {op} b.sk)")
        got = ctx.sql(q).collect().to_pydict()["n"][0]
        m = df.merge(df, on="ok", suffixes=("", "_b"))
        m = m.dropna(subset=["sk", "sk_b"])
        want = m[f(m.sk, m.sk_b)]["i"].nunique()
        assert got == want, (op, got, want)
        qa = (f"SELECT count(*) AS n FROM t a WHERE NOT EXISTS ("
              f"SELECT 1 FROM t b WHERE b.ok = a.ok AND a.sk {op} b.sk)")
        got_a = ctx.sql(qa).collect().to_pydict()["n"][0]
        assert got_a == n - want, (op, got_a, n - want)
