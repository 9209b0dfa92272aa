"""User-defined function registration: scalar, aggregate, window (VERDICT
item 7; reference: datafusion/expr/src/udf.rs ScalarUDF / udaf.rs /
udwf.rs + user-defined function examples), plus the multi-DISTINCT lift
(reference: optimizer/src/single_distinct_to_groupby.rs generalized)."""
import math

import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from datafusion_tpu.common import types as T
from datafusion_tpu.context import SessionContext


@pytest.fixture
def ctx():
    c = SessionContext()
    c.register_table("t", {
        "g": [1, 1, 1, 2, 2, 3, 3, 3, 3],
        "x": [2.0, -3.0, 2.0, 5.0, 5.0, -1.0, 0.0, -1.0, 4.0],
        "y": [1, 2, 2, 3, 3, 3, 4, 4, 5],
        "z": [10, 10, 20, 20, 20, 30, 40, 40, 40],
    })
    return c


def df(ctx):
    return pd.DataFrame(ctx.sql("SELECT * FROM t").to_pydict())


# ---------------------------------------------------------------------------
# scalar UDFs
# ---------------------------------------------------------------------------

def test_scalar_udf_sql(ctx):
    ctx.register_udf("plus_one", lambda a: a + 1.0, T.FLOAT64)
    out = ctx.sql("SELECT plus_one(x) AS p FROM t ORDER BY y, x").to_pydict()
    ref = sorted(zip([1, 2, 2, 3, 3, 3, 4, 4, 5],
                     [2.0, -3.0, 2.0, 5.0, 5.0, -1.0, 0.0, -1.0, 4.0]))
    assert out["p"] == [x + 1.0 for _, x in ref]


def test_scalar_udf_two_args_in_expression(ctx):
    ctx.register_udf("hyp", lambda a, b: jnp.sqrt(a * a + b * b), T.FLOAT64)
    out = ctx.sql(
        "SELECT g, sum(hyp(x, y)) AS s FROM t GROUP BY g ORDER BY g"
    ).to_pydict()
    d = df(ctx)
    ref = d.assign(h=np.hypot(d.x, d.y)).groupby("g").h.sum()
    assert np.allclose(out["s"], ref.values)


def test_scalar_udf_custom_validity(ctx):
    # safe_log returns NULL for non-positive inputs
    ctx.register_udf(
        "safe_log",
        lambda a: (jnp.log(jnp.maximum(a, 1e-300)), a > 0),
        T.FLOAT64)
    out = ctx.sql("SELECT safe_log(x) AS l FROM t ORDER BY y, x").to_pydict()
    xs = [x for _, x in sorted(zip([1, 2, 2, 3, 3, 3, 4, 4, 5],
                                   [2.0, -3.0, 2.0, 5.0, 5.0, -1.0, 0.0, -1.0, 4.0]))]
    for got, x in zip(out["l"], xs):
        if x > 0:
            assert got == pytest.approx(math.log(x))
        else:
            assert got is None


def test_scalar_udf_null_propagation(ctx):
    ctx.register_table("n", {"v": [1.0, None, 3.0]})
    ctx.register_udf("dbl", lambda a: a * 2.0, T.FLOAT64)
    out = ctx.sql("SELECT dbl(v) AS d FROM n ORDER BY v NULLS LAST").to_pydict()
    assert out["d"] == [2.0, 6.0, None]


def test_scalar_udf_session_scoped(ctx):
    ctx.register_udf("plus_one", lambda a: a + 1.0, T.FLOAT64)
    other = SessionContext()
    other.register_table("t", {"x": [1.0]})
    with pytest.raises(Exception):
        other.sql("SELECT plus_one(x) FROM t").collect()


def test_scalar_udf_dataframe_api(ctx):
    from datafusion_tpu.expr import nodes as E

    ctx.register_udf("sq", lambda a: a * a, T.FLOAT64)
    out = (ctx.table("t")
           .select(E.ScalarFunction("sq", (E.col("x"),)).alias("s"))
           .to_pydict())
    assert sorted(out["s"]) == sorted(
        [x * x for x in [2.0, -3.0, 2.0, 5.0, 5.0, -1.0, 0.0, -1.0, 4.0]])


# ---------------------------------------------------------------------------
# aggregate UDFs (monoid spec)
# ---------------------------------------------------------------------------

def register_geomean(ctx):
    ctx.register_udaf(
        "geomean",
        state=lambda x: {"logsum": jnp.log(jnp.maximum(jnp.abs(x), 1e-300)),
                         "n": jnp.ones_like(x)},
        combine=lambda a, b: {"logsum": a["logsum"] + b["logsum"],
                              "n": a["n"] + b["n"]},
        identity={"logsum": 0.0, "n": 0.0},
        finalize=lambda s: jnp.exp(s["logsum"] / jnp.maximum(s["n"], 1.0)),
        return_type=T.FLOAT64)


def test_udaf_grouped(ctx):
    register_geomean(ctx)
    out = ctx.sql(
        "SELECT g, geomean(y) AS gm FROM t GROUP BY g ORDER BY g").to_pydict()
    d = df(ctx)
    ref = d.groupby("g").y.apply(
        lambda s: math.exp(np.log(np.abs(s)).mean()))
    assert np.allclose(out["gm"], ref.values)


def test_udaf_global(ctx):
    register_geomean(ctx)
    out = ctx.sql("SELECT geomean(y) AS gm FROM t").to_pydict()
    d = df(ctx)
    assert out["gm"][0] == pytest.approx(
        math.exp(np.log(np.abs(d.y)).mean()))


def test_udaf_logical_or_monoid(ctx):
    ctx.register_udaf(
        "bit_or_agg",
        state=lambda x: x.astype(jnp.int64),
        combine=lambda a, b: a | b,
        identity=0,
        finalize=lambda s: s,
        return_type=T.INT64, nullable=False)
    out = ctx.sql(
        "SELECT g, bit_or_agg(z) AS b FROM t GROUP BY g ORDER BY g").to_pydict()
    d = df(ctx)
    ref = d.groupby("g").z.apply(lambda s: int(np.bitwise_or.reduce(s)))
    assert out["b"] == list(ref.values)


def test_udaf_empty_group_null():
    ctx = SessionContext()
    ctx.register_table("e", {"g": [1, 2], "v": [1.0, None]})
    register_geomean(ctx)
    out = ctx.sql(
        "SELECT g, geomean(v) AS gm FROM e GROUP BY g ORDER BY g").to_pydict()
    assert out["gm"][0] == pytest.approx(1.0)
    assert out["gm"][1] is None


def test_udaf_as_window_function(ctx):
    register_geomean(ctx)
    out = ctx.sql("""
        SELECT g, y, geomean(y) OVER (PARTITION BY g ORDER BY y) AS gm
        FROM t ORDER BY g, y
    """).to_pydict()
    d = df(ctx).sort_values(["g", "y"])
    # running geomean over peers <= current (default frame)
    ref = []
    for g, grp in d.groupby("g"):
        for yv in grp.y:
            vals = grp.y[grp.y <= yv]
            ref.append(math.exp(np.log(np.abs(vals)).mean()))
    assert np.allclose(out["gm"], ref)


def test_udwf_registration(ctx):
    ctx.register_udwf(
        "run_prod",
        state=lambda x: x.astype(jnp.float64),
        combine=lambda a, b: a * b,
        identity=1.0,
        finalize=lambda s: s,
        return_type=T.FLOAT64)
    out = ctx.sql("""
        SELECT g, y, run_prod(y) OVER (PARTITION BY g ORDER BY y, x) AS rp
        FROM t ORDER BY g, y, x
    """).to_pydict()
    d = df(ctx).sort_values(["g", "y", "x"])
    # default frame = RANGE UNBOUNDED..CURRENT ROW: peers (equal order keys)
    # all see the full peer-run product
    cp = d.groupby("g").y.cumprod()
    ref = cp.groupby([d.g, d.y, d.x]).transform("max")
    assert np.allclose(out["rp"], ref.values)


# ---------------------------------------------------------------------------
# multiple DISTINCT / order-statistic arguments (multi-bucket aggregation)
# ---------------------------------------------------------------------------

def test_two_count_distinct(ctx):
    out = ctx.sql("""
        SELECT g, count(DISTINCT y) AS cy, count(DISTINCT z) AS cz, count(*) AS n
        FROM t GROUP BY g ORDER BY g
    """).to_pydict()
    d = df(ctx)
    ref = d.groupby("g").agg(cy=("y", "nunique"), cz=("z", "nunique"),
                             n=("y", "size"))
    assert out["cy"] == list(ref.cy)
    assert out["cz"] == list(ref.cz)
    assert out["n"] == list(ref.n)


def test_distinct_sum_and_count_mixed_args(ctx):
    out = ctx.sql("""
        SELECT g, sum(DISTINCT y) AS sy, count(DISTINCT z) AS cz,
               sum(x) AS sx
        FROM t GROUP BY g ORDER BY g
    """).to_pydict()
    d = df(ctx)
    ref = d.groupby("g").agg(
        sy=("y", lambda s: s.drop_duplicates().sum()),
        cz=("z", "nunique"), sx=("x", "sum"))
    assert out["sy"] == list(ref.sy)
    assert out["cz"] == list(ref.cz)
    assert np.allclose(out["sx"], ref.sx.values)


def test_global_two_distinct(ctx):
    out = ctx.sql("""
        SELECT count(DISTINCT y) AS cy, count(DISTINCT z) AS cz,
               avg(x) AS ax FROM t
    """).to_pydict()
    d = df(ctx)
    assert out["cy"] == [d.y.nunique()]
    assert out["cz"] == [d.z.nunique()]
    assert out["ax"][0] == pytest.approx(d.x.mean())


def test_median_plus_count_distinct(ctx):
    out = ctx.sql("""
        SELECT g, median(x) AS mx, count(DISTINCT z) AS cz
        FROM t GROUP BY g ORDER BY g
    """).to_pydict()
    d = df(ctx)
    ref = d.groupby("g").agg(mx=("x", "median"), cz=("z", "nunique"))
    assert np.allclose(out["mx"], ref.mx.values)
    assert out["cz"] == list(ref.cz)


def test_async_udf(ctx_factory=None):
    """Async scalar UDF through a host callback (reference: AsyncFuncExec,
    physical-plan/src/async_func.rs)."""
    import asyncio

    import numpy as np

    from datafusion_tpu.common import types as T
    from datafusion_tpu.context import SessionContext

    async def remote_score(xs):
        async def one(v):
            await asyncio.sleep(0)
            return float(v) * 2 + 1

        return np.array(await asyncio.gather(*[one(v) for v in xs]))

    ctx = SessionContext()
    ctx.register_table("t", {"k": [1, 2, 3, 4], "x": [1.0, 2.0, 3.0, 4.0]})
    ctx.register_async_udf("remote_score", remote_score, T.FLOAT64)
    out = ctx.sql("SELECT k, remote_score(x) s FROM t WHERE k > 1 "
                  "ORDER BY k").to_pydict()
    assert out["s"] == [5.0, 7.0, 9.0]
    ctx.register_async_udf("twice", lambda xs: xs * 2, T.FLOAT64)
    assert ctx.sql("SELECT sum(twice(x)) s FROM t").to_pydict()["s"] == [20.0]
