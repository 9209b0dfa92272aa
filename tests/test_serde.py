"""Plan serde round-trip tests (reference: proto round-trip tests,
datafusion/proto/tests/ + substrait round-trip engine)."""
import pytest

from datafusion_tpu.context import SessionContext
from datafusion_tpu.logical.serde import plan_from_json, plan_to_json
from datafusion_tpu.models.tpch.datagen import register_tpch
from datafusion_tpu.models.tpch.queries import query


@pytest.fixture(scope="module")
def ctx():
    c = SessionContext()
    register_tpch(c, 0.002)
    return c


@pytest.mark.parametrize("qid", [1, 3, 5, 7, 12, 13, 19])
def test_tpch_plan_roundtrip_executes_identically(ctx, qid):
    from datafusion_tpu.context import DataFrame

    df = ctx.sql(query(qid, 0.002))
    plan = df.optimized_plan()
    js = plan_to_json(plan)
    plan2 = plan_from_json(js, ctx.catalog)
    out1 = DataFrame(ctx, plan).to_pydict()
    out2 = DataFrame(ctx, plan2).to_pydict()
    assert out1 == out2


def test_serde_preserves_structure(ctx):
    df = ctx.sql("SELECT l_returnflag, count(*) FROM lineitem GROUP BY l_returnflag")
    p = df.optimized_plan()
    js = plan_to_json(p)
    p2 = plan_from_json(js, ctx.catalog)
    assert p.display() == p2.display()
