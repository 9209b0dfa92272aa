"""Plan-cleanup optimizer rules (optimizer/cleanup.py): constant filters,
empty propagation, degenerate limits, duplicate keys, constant group keys,
null join keys. Reference analogs: optimizer/src/{eliminate_filter,
propagate_empty_relation, eliminate_limit, eliminate_duplicated_expr,
filter_null_join_keys, eliminate_group_by_constant}.rs."""
import pytest

from datafusion_tpu.context import SessionContext


@pytest.fixture()
def ctx():
    c = SessionContext()
    c.register_table("t", {"a": [1, 2, 3], "b": [10, 20, 30]})
    c.register_table("u", {"a": [2, 3, 4], "c": [200, 300, 400]})
    return c


def _explain(ctx, sql):
    return ctx.sql(sql).explain()


def test_false_filter_erases_plan(ctx):
    plan = _explain(ctx, "SELECT a FROM t WHERE 1 = 0")
    assert "EmptyExec" in plan or "Empty" in plan
    assert "ScanExec" not in plan
    assert ctx.sql("SELECT a FROM t WHERE 1 = 0").collect().num_rows == 0


def test_true_filter_dropped(ctx):
    plan = _explain(ctx, "SELECT a FROM t WHERE 1 = 1")
    assert "FilterExec" not in plan
    r = ctx.sql("SELECT a FROM t WHERE 1 = 1").collect().to_pydict()
    assert r["a"] == [1, 2, 3]


def test_empty_propagates_through_inner_join(ctx):
    sql = ("SELECT t.a, u.c FROM t JOIN u ON t.a = u.a WHERE 1 = 0")
    plan = _explain(ctx, sql)
    assert "JoinExec" not in plan
    assert ctx.sql(sql).collect().num_rows == 0


def test_empty_union_branch_dropped(ctx):
    sql = ("SELECT a FROM t WHERE a > 100 AND 1=0 "
           "UNION ALL SELECT a FROM u")
    plan = _explain(ctx, sql)
    assert "UnionExec" not in plan
    r = ctx.sql(sql).collect().to_pydict()
    assert sorted(r["a"]) == [2, 3, 4]


def test_anti_join_empty_build_passthrough(ctx):
    sql = ("SELECT a FROM t WHERE NOT EXISTS "
           "(SELECT 1 FROM u WHERE u.a = t.a AND 1 = 0)")
    r = ctx.sql(sql).collect().to_pydict()
    assert sorted(r["a"]) == [1, 2, 3]


def test_limit_zero_is_empty(ctx):
    sql = "SELECT a FROM t LIMIT 0"
    plan = _explain(ctx, sql)
    assert "ScanExec" not in plan
    assert ctx.sql(sql).collect().num_rows == 0


def test_duplicate_sort_and_group_keys(ctx):
    plan = _explain(ctx, "SELECT a FROM t ORDER BY a, a, a")
    # once in the logical section, once in the physical section
    assert plan.count("a ASC") == 2, plan
    r = ctx.sql("SELECT a, count(*) AS n FROM t GROUP BY a, a ORDER BY a"
                ).collect().to_pydict()
    assert r["a"] == [1, 2, 3] and r["n"] == [1, 1, 1]


def test_constant_group_key_eliminated(ctx):
    sql = "SELECT 'x' AS tag, a, sum(b) AS s FROM t GROUP BY tag, a ORDER BY a"
    plan = _explain(ctx, sql)
    assert "groupBy=[a]" in plan.replace("t.a", "a"), plan
    r = ctx.sql(sql).collect().to_pydict()
    assert r["tag"] == ["x", "x", "x"]
    assert r["a"] == [1, 2, 3] and r["s"] == [10, 20, 30]


def test_all_constant_group_keys_kept(ctx):
    # removing every key would turn 0 groups into 1 row on empty input
    r = ctx.sql("SELECT 1 AS k, count(*) AS n FROM t WHERE a > 100 GROUP BY k"
                ).collect().to_pydict()
    assert r["n"] == []


def test_filter_null_join_keys_optin(ctx):
    ctx.sql("SET optimizer.filter_null_join_keys = true")
    c2 = ctx
    c2.register_table("n1", {"k": [1, None, 2], "v": [1, 2, 3]})
    c2.register_table("n2", {"k": [1, 2, None], "w": [10, 20, 30]})
    r = c2.sql("SELECT n1.v, n2.w FROM n1 JOIN n2 ON n1.k = n2.k "
               "ORDER BY n1.v").collect().to_pydict()
    assert r == {"v": [1, 3], "w": [10, 20]}


def test_count_star_from_statistics(ctx):
    plan = _explain(ctx, "SELECT count(*) AS n FROM t")
    assert "ScanExec" not in plan and "AggregateExec" not in plan, plan
    r = ctx.sql("SELECT count(*) AS n FROM t").collect().to_pydict()
    assert r["n"] == [3]
    # with a filter the scan must run
    r = ctx.sql("SELECT count(*) AS n FROM t WHERE a > 1").collect().to_pydict()
    assert r["n"] == [2]
    # count(col) is NOT answerable from row-count stats
    plan2 = _explain(ctx, "SELECT count(a) FROM t")
    assert "ScanExec" in plan2
    # stays correct after INSERT (provider replaced, stats not stale)
    ctx.sql("INSERT INTO t VALUES (4, 40)")
    r = ctx.sql("SELECT count(*) AS n FROM t").collect().to_pydict()
    assert r["n"] == [4]


def test_join_reorder_transitive_equality_closure():
    """a.k = b.k and b.k = c.k implies a.k = c.k: the reorderer may join a
    with c directly, and results must match the unreordered semantics."""
    from datafusion_tpu import SessionContext

    ctx = SessionContext()
    ctx.register_table("ta", {"k": [1, 2, 3, 4], "x": [10, 20, 30, 40]})
    ctx.register_table("tb", {"k": [2, 3, 4, 5], "y": [200, 300, 400, 500]})
    ctx.register_table("tc", {"k": [3, 4, 5, 6], "z": [31, 41, 51, 61]})
    out = ctx.sql("""
        select ta.k, x, y, z from ta, tb, tc
        where ta.k = tb.k and tb.k = tc.k and z < 51
        order by ta.k
    """).collect().to_pydict()
    assert out == {"k": [3, 4], "x": [30, 40], "y": [300, 400], "z": [31, 41]}
