"""DataFusion protobuf plan interchange tests (reference analog:
proto/tests/cases/roundtrip_logical_plan.rs).

Round-trip: every plan -> LogicalPlanNode bytes -> plan must execute to the
same result against the same catalog.  Foreign-consumption: a message
authored field-by-field the way the reference's to_proto.rs emits it
(aggregate_udf_expr/scalar_udf_expr envelopes, chained binary operands,
bare TableReference) must bind and execute."""
import numpy as np
import pandas as pd
import pytest

from datafusion_tpu.context import SessionContext


@pytest.fixture(scope="module")
def ctx():
    rng = np.random.default_rng(7)
    n = 2000
    c = SessionContext()
    c.register_table("t", {
        "k": rng.integers(0, 10, n).tolist(),
        "s": rng.choice(["aa", "bb", "cc", None], n).tolist(),
        "v": np.round(rng.normal(5, 2, n), 3).tolist(),
    })
    c.register_table("d", {"k": list(range(10)),
                           "nm": [f"g{i:02d}" for i in range(10)]})
    return c


ROUNDTRIP_QUERIES = [
    "SELECT k, v FROM t WHERE v > 5 ORDER BY v DESC, k LIMIT 7",
    "SELECT s, count(*) c, sum(v) sv, avg(v) av FROM t GROUP BY s ORDER BY s NULLS FIRST",
    "SELECT d.nm, count(DISTINCT t.s) cd FROM t JOIN d ON t.k = d.k GROUP BY d.nm ORDER BY d.nm",
    "SELECT t.k, v FROM t LEFT JOIN d ON t.k = d.k AND d.k > 3 WHERE v < 2 ORDER BY v, t.k LIMIT 5",
    "SELECT DISTINCT s FROM t ORDER BY s NULLS LAST",
    "SELECT k FROM t WHERE k < 3 UNION ALL SELECT k FROM d ORDER BY k",
    "SELECT CASE WHEN v > 5 THEN 'hi' ELSE 'lo' END b, count(*) FROM t GROUP BY b ORDER BY b",
    "SELECT k, v, sum(v) OVER (PARTITION BY k ORDER BY v) rs FROM t WHERE k < 2 ORDER BY k, v LIMIT 9",
    "SELECT upper(s) u, abs(v - 5.0) a FROM t WHERE s IS NOT NULL AND s IN ('aa','bb') ORDER BY a DESC, u LIMIT 4",
    "SELECT k, avg(v) FILTER (WHERE s = 'aa') fa FROM t GROUP BY k ORDER BY k",
    "SELECT sum(v * CAST(k AS DOUBLE)) x FROM t WHERE s LIKE 'a%' OR v BETWEEN 4 AND 6",
    "SELECT k FROM t WHERE NOT (v > 5) AND k NOT IN (1,2) ORDER BY k LIMIT 6",
    "SELECT k, CAST(sum(v) AS DECIMAL(12,2)) sv FROM t GROUP BY k ORDER BY k OFFSET 2",
    "SELECT k, row_number() OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) rn"
    " FROM t WHERE k = 3 ORDER BY rn LIMIT 5",
    "SELECT 1 AS one",
]


@pytest.mark.parametrize("qi", range(len(ROUNDTRIP_QUERIES)))
def test_roundtrip(ctx, qi):
    q = ROUNDTRIP_QUERIES[qi]
    df = ctx.sql(q)
    want = df.to_pandas()
    data = df.to_proto()
    assert isinstance(data, bytes) and data
    got = ctx.from_proto(data).to_pandas()
    got.columns = want.columns
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False, atol=1e-9)


def test_roundtrip_tpch():
    from datafusion_tpu.models.tpch.datagen import generate_tpch
    from datafusion_tpu.models.tpch.queries import query

    tables = generate_tpch(0.005)
    c = SessionContext()
    for name, t in tables.items():
        c.register_table(name, t)
    for qid in (1, 3, 5, 6, 10, 12, 19):
        df = c.sql(query(qid, 0.005))
        want = df.to_pandas()
        got = c.from_proto(df.to_proto()).to_pandas()
        got.columns = want.columns
        pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                      want.reset_index(drop=True),
                                      check_dtype=False, atol=1e-6,
                                      obj=f"q{qid}")


def test_foreign_message(ctx):
    """A plan authored the way the reference's to_proto.rs writes it:
    scan -> selection -> aggregate with UDF envelopes."""
    from datafusion_tpu.interchange.proto import common_pb2 as C
    from datafusion_tpu.interchange.proto import plan_pb2 as P

    scan = P.LogicalPlanNode()
    scan.custom_scan.table_name.bare.table = "t"

    sel = P.LogicalPlanNode()
    sel.selection.input.CopyFrom(scan)
    be = sel.selection.expr.binary_expr
    be.op = "Gt"
    be.operands.add().column.name = "v"
    be.operands.add().literal.float64_value = 4.0

    agg = P.LogicalPlanNode()
    agg.aggregate.input.CopyFrom(sel)
    agg.aggregate.group_expr.add().column.name = "k"
    a = agg.aggregate.aggr_expr.add().aggregate_udf_expr
    a.fun_name = "sum"
    a.args.add().column.name = "v"

    srt = P.LogicalPlanNode()
    srt.sort.input.CopyFrom(agg)
    se = srt.sort.expr.add()
    se.expr.column.name = "k"
    se.asc = True
    se.nulls_first = False
    srt.sort.fetch = -1

    out = ctx.from_proto(srt.SerializeToString()).to_pandas()
    tp = ctx.sql("SELECT k, sum(v) FROM t WHERE v > 4 GROUP BY k ORDER BY k").to_pandas()
    out.columns = tp.columns
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  tp.reset_index(drop=True),
                                  check_dtype=False, atol=1e-9)


def test_scalar_value_fidelity():
    from datafusion_tpu.common import types as T
    from datafusion_tpu.interchange.dfproto import scalar_from_pb, scalar_to_pb

    cases = [
        (True, T.BOOL), ("hi", T.STRING), (42, T.INT64), (-3, T.INT32),
        (1.5, T.FLOAT64), (None, T.INT64), (18262, T.DATE32),
        (-12.75, T.decimal(10, 2)),
    ]
    for v, t in cases:
        got, gt = scalar_from_pb(scalar_to_pb(v, t))
        if v is None:
            assert got is None
        elif t.is_decimal:
            assert abs(got - v) < 1e-9 and gt.scale == t.scale
        else:
            assert got == v, (v, t, got)
