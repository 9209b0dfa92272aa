"""Reference DataFrame API surface (core/src/dataframe/mod.rs):
with_column, drop/rename, set ops, distinct_on, fill_null, describe,
cache, into_view, join_on, union_by_name."""
import math

import pytest

from datafusion_tpu.context import SessionContext
from datafusion_tpu.expr import nodes as E


@pytest.fixture()
def ctx():
    c = SessionContext()
    c.register_table("t", {"a": [1, 2, 3, 2], "b": [10.0, None, 30.0, 20.0],
                           "s": ["x", "y", "x", "y"]})
    return c


def test_with_column_and_rename(ctx):
    df = ctx.table("t").with_column("a2", E.BinaryOp(E.Op.MUL, E.col("a"), E.lit(2)))
    r = df.with_column_renamed("a2", "double_a").collect().to_pydict()
    assert r["double_a"] == [2, 4, 6, 4]
    r2 = ctx.table("t").with_column("a", E.lit(0)).collect().to_pydict()
    assert r2["a"] == [0, 0, 0, 0]


def test_drop_and_select_columns(ctx):
    r = ctx.table("t").drop_columns("b").collect().to_pydict()
    assert set(r) == {"a", "s"}
    r2 = ctx.table("t").select_columns("s").collect().to_pydict()
    assert list(r2) == ["s"]


def test_set_ops(ctx):
    ctx.register_table("u", {"a": [2, 3], "b": [20.0, 99.0], "s": ["y", "z"]})
    t, u = ctx.table("t"), ctx.table("u")
    inter = t.select("a").intersect(u.select("a")).collect().to_pydict()
    assert sorted(inter["a"]) == [2, 3]
    exc = t.select("a").except_all(u.select("a")).collect().to_pydict()
    assert sorted(exc["a"]) == [1]
    ud = t.select("a").union_distinct(u.select("a")).collect().to_pydict()
    assert sorted(ud["a"]) == [1, 2, 3]


def test_union_by_name(ctx):
    ctx.register_table("v", {"s": ["q"], "b": [1.0], "a": [9]})  # reordered
    r = ctx.table("t").union_by_name(ctx.table("v")).collect().to_pydict()
    assert 9 in r["a"] and "q" in r["s"]


def test_distinct_on(ctx):
    df = ctx.table("t").distinct_on(
        [E.col("s")], [E.col("s"), E.col("a")],
        [E.SortSpec(E.col("a"), asc=True)])
    r = df.sort(E.col("s")).collect().to_pydict()
    assert r == {"s": ["x", "y"], "a": [1, 2]}


def test_fill_null(ctx):
    r = ctx.table("t").fill_null(0.0, ["b"]).sort(E.col("a"), E.col("b")).collect().to_pydict()
    assert None not in r["b"] and 0.0 in r["b"]


def test_describe(ctx):
    t = ctx.table("t").describe().to_pydict()
    assert t["describe"] == ["count", "null_count", "mean", "std", "min",
                             "max", "median"]
    assert t["a"][0] == 4.0 and t["b"][1] == 1.0
    assert t["a"][4] == 1.0 and t["a"][5] == 3.0
    assert math.isnan(t["s"][2])


def test_cache_and_into_view(ctx):
    c = ctx.table("t").filter(E.BinaryOp(E.Op.GT, E.col("a"), E.lit(1))).cache()
    assert c.count() == 3
    ctx.table("t").select("a").into_view("ta")
    r = ctx.sql("SELECT count(*) AS n FROM ta").collect().to_pydict()
    assert r["n"] == [4]


def test_join_on(ctx):
    ctx.register_table("w", {"k": [1, 2], "lbl": ["one", "two"]})
    df = ctx.table("t").join_on(
        ctx.table("w"), "inner",
        E.BinaryOp(E.Op.EQ, E.col("a"), E.col("k")))
    r = df.sort(E.col("a")).collect().to_pydict()
    assert r["lbl"] == ["one", "two", "two"]


def test_unnest_columns(ctx):
    ctx.sql("CREATE TABLE lt AS SELECT 1 AS id, [10, 20] AS xs")
    r = ctx.table("lt").unnest_columns("xs").collect().to_pydict()
    assert r["xs"] == [10, 20]
