import numpy as np
import pytest

from datafusion_tpu.context import SessionContext


@pytest.fixture
def ctx():
    c = SessionContext()
    c.register_table("t", {
        "g": ["a", "a", "a", "b", "b", "c"],
        "x": [10, 20, 20, 5, 15, 7],
        "id": [1, 2, 3, 4, 5, 6],
    })
    return c


def q(ctx, sql):
    return ctx.sql(sql).to_pydict()


def test_row_number_rank(ctx):
    out = q(ctx, """
        SELECT id,
               row_number() OVER (PARTITION BY g ORDER BY x) AS rn,
               rank() OVER (PARTITION BY g ORDER BY x) AS rk,
               dense_rank() OVER (PARTITION BY g ORDER BY x) AS dr
        FROM t ORDER BY id
    """)
    assert out["rn"] == [1, 2, 3, 1, 2, 1]
    assert out["rk"] == [1, 2, 2, 1, 2, 1]
    assert out["dr"] == [1, 2, 2, 1, 2, 1]


def test_running_sum_and_partition_agg(ctx):
    out = q(ctx, """
        SELECT id,
               sum(x) OVER (PARTITION BY g ORDER BY id) AS rs,
               sum(x) OVER (PARTITION BY g) AS ts,
               count(*) OVER (PARTITION BY g) AS n
        FROM t ORDER BY id
    """)
    assert out["rs"] == [10, 30, 50, 5, 20, 7]
    assert out["ts"] == [50, 50, 50, 20, 20, 7]
    assert out["n"] == [3, 3, 3, 2, 2, 1]


def test_running_sum_peers(ctx):
    # ties in ORDER BY are peers: RANGE frame includes the whole peer group
    out = q(ctx, """
        SELECT id, sum(x) OVER (PARTITION BY g ORDER BY x) AS rs
        FROM t ORDER BY id
    """)
    assert out["rs"] == [10, 50, 50, 5, 20, 7]


def test_lead_lag(ctx):
    out = q(ctx, """
        SELECT id,
               lag(x) OVER (PARTITION BY g ORDER BY id) AS lg,
               lead(x) OVER (PARTITION BY g ORDER BY id) AS ld
        FROM t ORDER BY id
    """)
    assert out["lg"] == [None, 10, 20, None, 5, None]
    assert out["ld"] == [20, 20, None, 15, None, None]


def test_global_window(ctx):
    out = q(ctx, "SELECT id, row_number() OVER (ORDER BY x DESC) AS rn FROM t ORDER BY id")
    assert out["rn"] == [4, 1, 2, 6, 3, 5]


def test_first_last_min_max(ctx):
    out = q(ctx, """
        SELECT id,
               first_value(x) OVER (PARTITION BY g ORDER BY id) AS fv,
               max(x) OVER (PARTITION BY g ORDER BY id) AS mx,
               min(x) OVER (PARTITION BY g ORDER BY id) AS mn,
               avg(x) OVER (PARTITION BY g) AS av
        FROM t ORDER BY id
    """)
    assert out["fv"] == [10, 10, 10, 5, 5, 7]
    assert out["mx"] == [10, 20, 20, 5, 15, 7]
    assert out["mn"] == [10, 10, 10, 5, 5, 7]
    assert out["av"] == [50 / 3, 50 / 3, 50 / 3, 10.0, 10.0, 7.0]


def test_window_filter_clause():
    """FILTER (WHERE ...) on window aggregates (reference:
    Expr::WindowFunction params.filter): rows failing the predicate
    contribute nothing but still receive output; NULL predicate counts as
    false; ranking functions reject FILTER."""
    from datafusion_tpu.common.errors import PlanError
    import pytest as _pytest

    ctx = SessionContext()
    ctx.register_table("t", {"g": [1, 1, 2, 2], "x": [1, 2, 3, 4]})
    out = ctx.sql(
        "SELECT g, x, count(*) FILTER (WHERE x % 2 = 0) OVER (PARTITION BY g) c, "
        "sum(x) FILTER (WHERE x > 1) OVER (PARTITION BY g) s, "
        "count(*) FILTER (WHERE NULL) OVER () z FROM t ORDER BY x").to_pandas()
    assert list(out["c"]) == [1, 1, 1, 1]
    assert list(out["s"]) == [2, 2, 7, 7]
    assert list(out["z"]) == [0, 0, 0, 0]
    with _pytest.raises(PlanError):
        ctx.sql("SELECT row_number() FILTER (WHERE x > 1) OVER () FROM t").collect()


def test_count_null_literal_is_zero():
    ctx = SessionContext()
    ctx.register_table("t", {"x": [1, 2, 3]})
    out = ctx.sql("SELECT count(NULL) a, count(1) b, count(*) c FROM t").to_pandas()
    assert out.values.tolist() == [[0, 3, 3]]


def test_ignore_nulls():
    """lead/lag/first_value/last_value IGNORE NULLS (reference:
    NullTreatment::IgnoreNulls, functions-window/src/lead_lag.rs);
    expectations are PostgreSQL's."""
    ctx = SessionContext()
    ctx.register_table("t", {"id": [1, 2, 3, 4, 5, 6, 7, 8],
                             "g": [1, 1, 1, 1, 2, 2, 2, 2],
                             "a": [None, 10, None, 30, 5, None, None, 8]})
    out = ctx.sql("""SELECT
      lag(a) IGNORE NULLS OVER (PARTITION BY g ORDER BY id) AS lg,
      lag(a, 2) IGNORE NULLS OVER (PARTITION BY g ORDER BY id) AS lg2,
      lead(a) IGNORE NULLS OVER (PARTITION BY g ORDER BY id) AS ld,
      first_value(a) IGNORE NULLS OVER (PARTITION BY g ORDER BY id) AS fv,
      last_value(a) IGNORE NULLS OVER (PARTITION BY g ORDER BY id) AS lv,
      lag(a, 1, -1) IGNORE NULLS OVER (PARTITION BY g ORDER BY id) AS lgd
    FROM t ORDER BY id""").to_pydict()
    assert out["lg"] == [None, None, 10, 10, None, 5, 5, 5]
    assert out["lg2"] == [None] * 8
    assert out["ld"] == [10, 30, 30, None, 8, 8, 8, None]
    assert out["fv"] == [None, 10, 10, 10, 5, 5, 5, 5]
    assert out["lv"] == [None, 10, 10, 30, 5, 5, 5, 8]
    assert out["lgd"] == [-1, -1, 10, 10, -1, 5, 5, 5]
    # RESPECT NULLS is the default spelling
    out = ctx.sql("SELECT lag(a) RESPECT NULLS OVER (ORDER BY id) AS x"
                  " FROM t ORDER BY id").to_pydict()
    assert out["x"] == [None, None, 10, None, 30, 5, None, None]
