"""All 99 TPC-DS queries plan (logical + physical) against schema-only
tables — the parity analog of the reference's tpcds_planning suite
(reference: core/tests/tpcds_planning.rs tpcds_logical_q*/tpcds_physical_q*,
schemas from test-utils/src/tpcds.rs). A representative subset also
executes end-to-end on the empty tables to cover the runtime layer."""
import pytest

from datafusion_tpu.context import SessionContext
from datafusion_tpu.models.tpcds import (ALL_QUERY_IDS, SCHEMAS,
                                         register_tpcds_tables, query)


@pytest.fixture(scope="module")
def ctx():
    c = SessionContext()
    register_tpcds_tables(c)
    return c


def test_schema_inventory():
    assert len(SCHEMAS) == 24
    assert sum(len(v) for v in SCHEMAS.values()) == 425


@pytest.mark.parametrize("qid", ALL_QUERY_IDS)
def test_tpcds_plans(ctx, qid):
    df = ctx.sql(query(qid))
    phys = df.physical_plan()
    assert phys is not None
    assert len(df.schema.fields) >= 1


# spread across join-heavy / rollup / window / subquery shapes; 36/70/86
# (rollup + grouping() window partition keys) and 54 (two scalar subqueries
# in one BETWEEN) regressed once each. All 99 execute (run the loop in
# models/tpcds to reverify); this subset keeps suite time bounded.
_EXEC_SUBSET = [1, 3, 6, 7, 15, 19, 25, 32, 36, 37, 42, 48, 52, 54, 62, 70,
                82, 84, 86, 91, 92, 96, 99]


@pytest.mark.parametrize("qid", _EXEC_SUBSET)
def test_tpcds_executes_empty(ctx, qid):
    out = ctx.sql(query(qid)).collect()
    # global aggregates (q32/q48/q92/q96: SELECT <agg> with no GROUP BY) and
    # ROLLUP queries (q36/q70/q86: the grand-total branch is a global
    # aggregate) produce exactly one row over empty input; everything else:
    # none
    assert out.num_rows == (1 if qid in (32, 36, 48, 70, 86, 92, 96) else 0)


def test_rollup_grouping_window_partition():
    """grouping(col) and NULL-filled absent group columns inside window
    PARTITION BY keys on ROLLUP branches (the TPC-DS q36/q70/q86 shape)."""
    from datafusion_tpu.context import SessionContext

    c = SessionContext()
    c.register_table("t", {"a": ["x", "y", "x"], "b": ["p", "q", "p"],
                           "v": [1.0, 2.0, 4.0]})
    out = c.sql(
        """select sum(v) s, a, b, grouping(a)+grouping(b) as lochierarchy,
           rank() over (partition by grouping(a)+grouping(b),
             case when grouping(b)=0 then a end order by sum(v) desc) as rk
           from t group by rollup(a, b)
           order by lochierarchy desc, rk, a nulls first""").to_pydict()
    assert out["s"] == [7.0, 5.0, 2.0, 5.0, 2.0]
    assert out["lochierarchy"] == [2, 1, 1, 0, 0]
    assert out["rk"] == [1, 1, 2, 1, 1]


def test_between_two_scalar_subqueries():
    from datafusion_tpu.context import SessionContext

    c = SessionContext()
    c.register_table("t", {"x": [1, 2, 3, 4, 5]})
    c.register_table("r", {"lo": [2], "hi": [4]})
    out = c.sql("select x from t where x between (select lo from r) "
                "and (select hi from r) order by x").to_pydict()
    assert out["x"] == [2, 3, 4]


def test_q88_plan_is_deterministic(ctx):
    """TPC-DS q88's eight structurally-identical derived tables exposed an
    id()-reuse bug in the transform memos (stale rewrites after GC produced
    a store-joined-with-itself plan, nondeterministically). Guard it."""
    for _ in range(10):
        c = SessionContext()
        register_tpcds_tables(c)
        c.sql(query(88)).physical_plan()
