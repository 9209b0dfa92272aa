"""Piecewise merge join: single range-predicate joins take the sorted-build
prefix/suffix path instead of filtering a cartesian expansion (reference:
PiecewiseMergeJoinExec, joins/piecewise_merge_join/exec.rs)."""
import numpy as np
import pandas as pd
import pytest

from datafusion_tpu.context import SessionContext
from datafusion_tpu.physical import plan as P


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(5)
    n, m = 300, 200
    a = rng.integers(0, 100, n)
    av = rng.integers(0, 10, n)
    b = rng.integers(0, 100, m)
    bv = rng.integers(0, 10, m)
    ctx = SessionContext()
    ctx.register_table("l", {"x": a.tolist(), "lv": av.tolist()})
    ctx.register_table("r", {"y": b.tolist(), "rv": bv.tolist()})
    return ctx, a, av, b, bv


def _lines(p, out=None):
    out = [] if out is None else out
    out.append(p._line())
    for c in p.children():
        _lines(c, out)
    return out


@pytest.mark.parametrize("sql,cond", [
    ("SELECT * FROM l, r WHERE x < y", lambda d: d.x < d.y),
    ("SELECT * FROM l, r WHERE x >= y", lambda d: d.x >= d.y),
    ("SELECT * FROM l, r WHERE y > x", lambda d: d.y > d.x),
    ("SELECT * FROM l, r WHERE x <= y AND lv = 3",
     lambda d: (d.x <= d.y) & (d.lv == 3)),
])
def test_inner_range_join_matches_pandas(setup, sql, cond):
    ctx, a, av, b, bv = setup
    df = ctx.sql(sql)
    assert any("piecewise" in s for s in _lines(df.physical_plan())), \
        "\n".join(_lines(df.physical_plan()))
    got = df.to_pydict()
    ref = pd.DataFrame({"x": a, "lv": av}).merge(
        pd.DataFrame({"y": b, "rv": bv}), how="cross")
    ref = ref[cond(ref)]
    assert sorted(zip(got["x"], got["y"])) == sorted(zip(ref.x, ref.y))


def test_left_range_join_null_extends(setup):
    ctx, a, _, b, _ = setup
    out = ctx.sql("SELECT l.x, r.y FROM l LEFT JOIN r ON l.x > r.y + 95"
                  ).to_pydict()
    ref = pd.DataFrame({"x": a}).merge(pd.DataFrame({"y": b}), how="cross")
    matched = ref[ref.x > ref.y + 95]
    m_x = set(matched.x)
    expect = len(matched) + sum(1 for v in a if v not in m_x)
    assert len(out["x"]) == expect
    assert sum(1 for y in out["y"] if y is None) == \
        sum(1 for v in a if v not in m_x)


def test_semi_range_join(setup):
    ctx, a, _, b, _ = setup
    out = ctx.sql("SELECT x FROM l WHERE EXISTS "
                  "(SELECT 1 FROM r WHERE l.x < r.y)").to_pydict()
    want = sorted(v for v in a if (b > v).any())
    assert sorted(out["x"]) == want


def test_range_join_with_nulls():
    ctx = SessionContext()
    ctx.register_table("l", {"x": [1, None, 50]})
    ctx.register_table("r", {"y": [10, None, 40]})
    out = ctx.sql("SELECT x, y FROM l, r WHERE x < y").to_pydict()
    assert sorted(zip(out["x"], out["y"])) == [(1, 10), (1, 40)]


def test_range_join_empty_sides():
    ctx = SessionContext()
    ctx.register_table("l", {"x": [1, 2]})
    ctx.register_table("r", {"y": [5, 9]})
    out = ctx.sql("SELECT x, y FROM l, r WHERE x > y").to_pydict()
    assert out["x"] == []
