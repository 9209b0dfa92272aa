"""Aggregate function breadth: bit ops, regression family, nth_value,
string_agg (reference: functions-aggregate/src/{bit_and_or_xor,regr,
nth_value,string_agg}.rs)."""
import numpy as np
import pandas as pd
import pytest

from datafusion_tpu.context import SessionContext


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(11)
    n = 600
    k = rng.integers(0, 9, n)
    v = rng.integers(0, 4096, n)
    s = rng.choice(["red", "green", "blue", None], n)
    x = np.round(rng.random(n) * 10, 3)
    y = 1.75 * x + rng.normal(0, 0.6, n)
    return k, v, s, x, y


@pytest.fixture(scope="module")
def ctx(data):
    k, v, s, x, y = data
    c = SessionContext()
    c.register_table("t", {"k": k.tolist(), "v": v.tolist(), "s": s.tolist(),
                           "x": x.tolist(), "y": y.tolist()})
    return c


def test_bit_ops(ctx, data):
    k, v, *_ = data
    out = ctx.sql("SELECT k, bit_and(v) a, bit_or(v) o, bit_xor(v) x "
                  "FROM t GROUP BY k ORDER BY k").to_pydict()
    df = pd.DataFrame({"k": k, "v": v})
    for i, (_, g) in enumerate(sorted(df.groupby("k"))):
        assert out["a"][i] == np.bitwise_and.reduce(g.v.values)
        assert out["o"][i] == np.bitwise_or.reduce(g.v.values)
        assert out["x"][i] == np.bitwise_xor.reduce(g.v.values)


def test_regr_family(ctx, data):
    k, _, _, x, y = data
    out = ctx.sql(
        "SELECT k, regr_slope(y,x) sl, regr_intercept(y,x) ic, "
        "regr_count(y,x) c, regr_r2(y,x) r2, regr_avgx(y,x) ax, "
        "regr_avgy(y,x) ay, regr_sxx(y,x) xx, regr_syy(y,x) yy, "
        "regr_sxy(y,x) xy FROM t GROUP BY k ORDER BY k").to_pydict()
    df = pd.DataFrame({"k": k, "x": x, "y": y})
    for i, (_, g) in enumerate(sorted(df.groupby("k"))):
        gx, gy = g.x.values, g.y.values
        mx, my = gx.mean(), gy.mean()
        Sxx = ((gx - mx) ** 2).sum()
        Syy = ((gy - my) ** 2).sum()
        Sxy = ((gx - mx) * (gy - my)).sum()
        assert out["c"][i] == len(g)
        assert abs(out["sl"][i] - Sxy / Sxx) < 1e-9
        assert abs(out["ic"][i] - (my - Sxy / Sxx * mx)) < 1e-9
        assert abs(out["r2"][i] - Sxy * Sxy / (Sxx * Syy)) < 1e-9
        assert abs(out["ax"][i] - mx) < 1e-9
        assert abs(out["ay"][i] - my) < 1e-9
        assert abs(out["xx"][i] - Sxx) < 1e-6
        assert abs(out["yy"][i] - Syy) < 1e-6
        assert abs(out["xy"][i] - Sxy) < 1e-6


def test_nth_value_input_order(ctx, data):
    k, v, *_ = data
    out = ctx.sql("SELECT k, nth_value(v, 3) nv, nth_value(v, -2) nb "
                  "FROM t GROUP BY k ORDER BY k").to_pydict()
    df = pd.DataFrame({"k": k, "v": v})
    for i, (_, g) in enumerate(sorted(df.groupby("k"))):
        assert out["nv"][i] == g.v.values[2]
        assert out["nb"][i] == g.v.values[-2]


def test_nth_value_beside_value_sorted_agg(ctx, data):
    """nth/first/last must keep INPUT order even when another aggregate in
    the same query forces a value-sorted bucket."""
    k, v, *_ = data
    out = ctx.sql("SELECT k, first_value(v) f, nth_value(v, 2) nv, median(v) m "
                  "FROM t GROUP BY k ORDER BY k").to_pydict()
    df = pd.DataFrame({"k": k, "v": v})
    for i, (_, g) in enumerate(sorted(df.groupby("k"))):
        assert out["f"][i] == g.v.values[0]
        assert out["nv"][i] == g.v.values[1]
        assert out["m"][i] == np.median(g.v.values)


def test_string_agg(ctx, data):
    k, _, s, *_ = data
    out = ctx.sql("SELECT k, string_agg(s, '|') sa FROM t "
                  "GROUP BY k ORDER BY k").to_pydict()
    df = pd.DataFrame({"k": k, "s": s})
    for i, (_, g) in enumerate(sorted(df.groupby("k", dropna=False))):
        want = "|".join(sorted(x for x in g.s if isinstance(x, str)))
        assert out["sa"][i] == want


def test_string_agg_distinct_and_global(ctx, data):
    _, _, s, *_ = data
    got = ctx.sql("SELECT string_agg(DISTINCT s, ',') FROM t").to_pydict()
    want = ",".join(sorted({x for x in s if isinstance(x, str)}))
    assert list(got.values())[0][0] == want


def test_percentile_cont(ctx, data):
    *_, x, _ = data[:4], data[4]
    k, v, s, x, y = data
    got = ctx.sql("SELECT percentile_cont(x, 0.25) FROM t").to_pydict()
    assert abs(list(got.values())[0][0] - np.percentile(x, 25)) < 1e-9


def test_regr_bit_distributed(ctx, data):
    """Decomposable split: regr/bit aggregates through the 8-device mesh
    engine must match the single-device run."""
    import jax

    from datafusion_tpu.data.device import to_host
    from datafusion_tpu.parallel.distributed import make_mesh
    from datafusion_tpu.parallel.engine import DistributedQuery

    df = ctx.sql("SELECT k, regr_slope(y,x) sl, regr_count(y,x) c, "
                 "bit_xor(v) bx, bit_and(v) ba FROM t GROUP BY k ORDER BY k")
    ref = df.to_pydict()
    dq = DistributedQuery(df.physical_plan(), make_mesh(8))
    rel = dq.execute(ctx.exec_context())
    jax.block_until_ready(rel.sel)
    got = to_host(rel).to_pydict()
    assert got["c"] == ref["c"]
    assert got["bx"] == ref["bx"]
    assert got["ba"] == ref["ba"]
    np.testing.assert_allclose(got["sl"], ref["sl"], rtol=1e-9)


def test_grouping_function(ctx, data):
    """grouping() bitmask under ROLLUP and plain GROUP BY (reference:
    analyzer/resolve_grouping_function.rs)."""
    c = SessionContext()
    c.register_table("g", {"a": ["x", "x", "y"], "b": [1, 2, 1],
                           "v": [10, 20, 30]})
    out = c.sql("SELECT a, b, grouping(a, b) gab, sum(v) sv FROM g "
                "GROUP BY ROLLUP(a, b) ORDER BY gab, a, b").to_pydict()
    assert out["gab"] == [0, 0, 0, 1, 1, 3]
    assert out["sv"] == [10, 20, 30, 30, 30, 60]
    plain = c.sql("SELECT a, grouping(a) g0 FROM g GROUP BY a ORDER BY a").to_pydict()
    assert plain["g0"] == [0, 0]
