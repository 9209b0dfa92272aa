import numpy as np
import pytest

from datafusion_tpu.common import types as T
from datafusion_tpu.context import SessionContext
from datafusion_tpu.expr import nodes as E
from datafusion_tpu.expr.nodes import col, lit


@pytest.fixture
def ctx():
    c = SessionContext()
    c.register_table("t", {
        "k": [1, 2, 1, 3, 2, 1],
        "v": [10.0, 20.0, 30.0, 40.0, 50.0, 60.0],
        "s": ["a", "b", "a", "c", "b", "a"],
    })
    c.register_table("d", {
        "k": [1, 2, 4],
        "name": ["one", "two", "four"],
    })
    return c


def test_filter_project(ctx):
    out = ctx.table("t").filter(col("v") > 25).select(col("k"), (col("v") * 2).alias("vv")).to_pydict()
    assert out["k"] == [1, 3, 2, 1]
    assert out["vv"] == [60.0, 80.0, 100.0, 120.0]


def test_aggregate_grouped(ctx):
    agg = ctx.table("t").aggregate(
        [col("k")],
        [E.AggregateFunction("sum", (col("v"),)).alias("sv"),
         E.AggregateFunction("count", (col("v"),)).alias("cv"),
         E.AggregateFunction("min", (col("s"),)).alias("ms")],
    ).sort(col("k")).to_pydict()
    assert agg["k"] == [1, 2, 3]
    assert agg["sv"] == [100.0, 70.0, 40.0]
    assert agg["cv"] == [3, 2, 1]
    assert agg["ms"] == ["a", "b", "c"]


def test_aggregate_global(ctx):
    out = ctx.table("t").aggregate(
        [],
        [E.AggregateFunction("sum", (col("v"),)).alias("sv"),
         E.AggregateFunction("count", (), False).alias("n"),
         E.AggregateFunction("avg", (col("v"),)).alias("av"),
         E.AggregateFunction("count", (col("k"),), True).alias("dk")],
    ).to_pydict()
    assert out["sv"] == [210.0]
    assert out["n"] == [6]
    assert out["av"] == [35.0]
    assert out["dk"] == [3]


def test_join_inner(ctx):
    out = (
        ctx.table("t")
        .join(ctx.table("d"), on=[("t.k", "d.k")], how="inner")
        .select(col("t.k"), col("v"), col("name"))
        .sort(col("v"))
        .to_pydict()
    )
    assert out["v"] == [10.0, 20.0, 30.0, 50.0, 60.0]
    assert out["name"] == ["one", "two", "one", "two", "one"]


def test_join_left_and_semi_anti(ctx):
    left = ctx.table("d").join(ctx.table("t"), on=[("d.k", "t.k")], how="left")
    out = left.select(col("d.k"), col("name"), col("v")).sort(col("d.k"), col("v")).to_pydict()
    assert out["k"] == [1, 1, 1, 2, 2, 4]
    assert out["v"] == [10.0, 30.0, 60.0, 20.0, 50.0, None]

    semi = ctx.table("d").join(ctx.table("t"), on=[("d.k", "t.k")], how="semi").sort(col("d.k")).to_pydict()
    assert semi["k"] == [1, 2]
    anti = ctx.table("d").join(ctx.table("t"), on=[("d.k", "t.k")], how="anti").to_pydict()
    assert anti["k"] == [4]


def test_sort_desc_limit(ctx):
    out = ctx.table("t").sort(col("v").sort(asc=False)).limit(2).to_pydict()
    assert out["v"] == [60.0, 50.0]


def test_distinct_union(ctx):
    out = ctx.table("t").select(col("s")).distinct().sort(col("s")).to_pydict()
    assert out["s"] == ["a", "b", "c"]
    u = ctx.table("t").select(col("k")).union(ctx.table("d").select(col("k"))).to_pydict()
    assert sorted(u["k"]) == [1, 1, 1, 1, 2, 2, 2, 3, 4]


def test_cross_join(ctx):
    out = ctx.table("d").join(ctx.table("d").alias("d2"), on=[], how="cross")
    assert out.count() == 9


def test_count_star_and_having_style(ctx):
    agg = ctx.table("t").aggregate(
        [col("s")],
        [E.AggregateFunction("count", ()).alias("n")],
    ).filter(col("n") > 1).sort(col("s")).to_pydict()
    assert agg["s"] == ["a", "b"]
    assert agg["n"] == [3, 2]
