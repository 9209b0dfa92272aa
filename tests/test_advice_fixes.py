"""Regression tests for the round-1 advisor findings (ADVICE.md):

1. last_value/cume_dist wrong for the final peer run when dead padded rows
   follow (physical/window.py is_peer_end).
2. COUNT/SUM(DISTINCT x) FILTER(...) missing values whose run-first row fails
   the filter (ops/groupby.py distinct markers).
3. Correlated scalar COUNT subquery compared to 0 dropped empty groups
   (optimizer/decorrelate.py INNER -> LEFT + COALESCE).
4. NOT IN (subquery) was not null-aware (decorrelate.py).
5. join keys equal to INT64_MAX were silently dropped (ops/kernels.py in-band
   sentinels -> liveness sort keys).
"""
import numpy as np
import pytest

from datafusion_tpu.context import SessionContext
from datafusion_tpu.expr import nodes as E
from datafusion_tpu.expr.nodes import col, lit


def test_last_value_with_padding():
    ctx = SessionContext()
    ctx.register_table("t", {
        "g": [1, 1, 1, 2, 2, 2],
        "id": [1, 2, 2, 1, 2, 3],
        "v": [10, 20, 20, 5, 15, 7],
    })
    out = ctx.sql(
        "SELECT g, id, last_value(v) OVER (PARTITION BY g ORDER BY id) lv "
        "FROM t ORDER BY g, id, v").to_pydict()
    # default frame = up to last peer of current row
    assert out["lv"] == [10, 20, 20, 5, 15, 7]


def test_cume_dist_with_padding():
    ctx = SessionContext()
    ctx.register_table("t", {
        "g": [1, 1, 1, 1],
        "id": [1, 2, 2, 3],
    })
    out = ctx.sql(
        "SELECT id, cume_dist() OVER (PARTITION BY g ORDER BY id) cd "
        "FROM t ORDER BY id").to_pydict()
    assert out["cd"] == [0.25, 0.75, 0.75, 1.0]


def test_count_distinct_with_filter():
    ctx = SessionContext()
    # value 5's first run row fails the filter; a later row of value 5 passes
    ctx.register_table("t", {
        "g": [1, 1, 1, 1],
        "x": [5, 5, 7, 7],
        "y": [-1, 3, 2, -4],
    })
    df = ctx.table("t").aggregate(
        [col("g")],
        [E.AggregateFunction("count", (col("x"),), distinct=True,
                             filter=col("y") > lit(0)).alias("cd"),
         E.AggregateFunction("sum", (col("x"),), distinct=True,
                             filter=col("y") > lit(0)).alias("sd")],
    )
    out = df.to_pydict()
    assert out["cd"] == [2]
    assert out["sd"] == [12]


def test_percentile_with_filter_raises():
    ctx = SessionContext()
    ctx.register_table("t", {"g": [1, 1], "x": [1.0, 2.0], "y": [1, -1]})
    df = ctx.table("t").aggregate(
        [col("g")],
        [E.AggregateFunction("median", (col("x"),),
                             filter=col("y") > lit(0)).alias("m")],
    )
    from datafusion_tpu.common.errors import PlanError
    with pytest.raises((PlanError, Exception)):
        df.collect()


def test_scalar_count_subquery_zero():
    ctx = SessionContext()
    ctx.register_table("t", {"k": [1, 2, 3]})
    ctx.register_table("s", {"k": [1, 1, 3]})
    out = ctx.sql(
        "SELECT t.k FROM t WHERE (SELECT count(*) FROM s WHERE s.k = t.k) = 0 "
        "ORDER BY t.k").to_pydict()
    assert out["k"] == [2]
    out2 = ctx.sql(
        "SELECT t.k FROM t WHERE (SELECT count(*) FROM s WHERE s.k = t.k) = 2 "
        "ORDER BY t.k").to_pydict()
    assert out2["k"] == [1]


def test_not_in_null_aware():
    ctx = SessionContext()
    ctx.register_table("t", {"k": [1, 2, None]})
    ctx.register_table("s_with_null", {"v": [2, None]})
    ctx.register_table("s_no_null", {"v": [2, 3]})
    ctx.register_table("s_empty", {"v": [1]})
    # subquery contains NULL -> NOT IN never true
    out = ctx.sql(
        "SELECT k FROM t WHERE k NOT IN (SELECT v FROM s_with_null)").to_pydict()
    assert out["k"] == []
    # no NULLs: non-matching non-null probes pass; NULL probe does not
    out = ctx.sql(
        "SELECT k FROM t WHERE k NOT IN (SELECT v FROM s_no_null) ORDER BY k"
    ).to_pydict()
    assert out["k"] == [1]
    # empty subquery: every probe passes (even NULL)
    out = ctx.sql(
        "SELECT k FROM t WHERE k NOT IN (SELECT v FROM s_empty WHERE v > 100)"
    ).to_pydict()
    assert len(out["k"]) == 3


def test_not_in_correlated_null_aware():
    ctx = SessionContext()
    ctx.register_table("t", {"g": [1, 1, 2, 3], "k": [5, 6, 5, 9]})
    # group 1 contains a NULL value; group 2 does not; group 3 is absent
    ctx.register_table("s", {"g": [1, 1, 2], "v": [5, None, 7]})
    out = ctx.sql(
        "SELECT t.g, t.k FROM t WHERE t.k NOT IN "
        "(SELECT v FROM s WHERE s.g = t.g) ORDER BY t.g, t.k").to_pydict()
    # g=1: subquery has NULL -> both rows dropped; g=2: 5 not in {7} -> kept;
    # g=3: empty subquery -> kept
    assert list(zip(out["g"], out["k"])) == [(2, 5), (3, 9)]


def test_join_key_int64_max():
    big = np.iinfo(np.int64).max
    ctx = SessionContext()
    ctx.register_table("l", {"k": np.array([1, big], dtype=np.int64),
                             "a": [10, 20]})
    ctx.register_table("r", {"k": np.array([big, 2], dtype=np.int64),
                             "b": [100, 200]})
    out = ctx.sql(
        "SELECT l.a, r.b FROM l JOIN r ON l.k = r.k").to_pydict()
    assert out["a"] == [20]
    assert out["b"] == [100]


def test_join_two_keys_int32_max():
    # packed two-key path: both keys INT32_MAX packs to INT64_MAX
    m = np.iinfo(np.int32).max
    ctx = SessionContext()
    ctx.register_table("l", {"k1": np.array([m, 1], dtype=np.int32),
                             "k2": np.array([m, 2], dtype=np.int32),
                             "a": [7, 8]})
    ctx.register_table("r", {"k1": np.array([m], dtype=np.int32),
                             "k2": np.array([m], dtype=np.int32),
                             "b": [9]})
    out = ctx.sql(
        "SELECT l.a, r.b FROM l JOIN r ON l.k1 = r.k1 AND l.k2 = r.k2"
    ).to_pydict()
    assert out["a"] == [7]
    assert out["b"] == [9]
