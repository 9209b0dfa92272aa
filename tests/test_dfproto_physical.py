"""Physical-plan protobuf interchange: PhysicalPlanNode producer/consumer
(reference: proto-models/proto/datafusion.proto:862-903,
datafusion/proto/src/physical_plan/). Round-trips are verified by executing
both the original and the decoded plan and comparing results."""
import numpy as np
import pytest

from datafusion_tpu import SessionContext
from datafusion_tpu.data.device import to_host
from datafusion_tpu.interchange.dfproto_physical import (
    physical_plan_from_proto_bytes, physical_plan_to_proto_bytes)
from datafusion_tpu.models.tpch.compare import LIMIT_QUERIES, frames_diff
from datafusion_tpu.models.tpch.datagen import register_tpch
from datafusion_tpu.models.tpch.queries import query


@pytest.fixture(scope="module")
def ctx():
    c = SessionContext()
    c.register_table("t", {"k": [1, 2, 2, 3], "s": ["a", "b", "b", None],
                           "v": [1.5, 2.5, 3.0, 4.0]})
    c.register_table("d", {"k": [1, 2], "name": ["one", "two"]})
    return c


def roundtrip(ctx, sql, ordered=False):
    phys = ctx.sql(sql).physical_plan()
    data = physical_plan_to_proto_bytes(phys, ctx.catalog)
    back = physical_plan_from_proto_bytes(data, ctx.catalog)
    r1 = to_host(phys.execute(ctx.exec_context())).to_pandas()
    r2 = to_host(back.execute(ctx.exec_context())).to_pandas()
    assert frames_diff(r2, r1, ordered=ordered) is None, sql
    return data


QUERIES = [
    "SELECT k, sum(v) s, count(*) c FROM t GROUP BY k ORDER BY k",
    "SELECT t.s, d.name FROM t LEFT JOIN d ON t.k = d.k WHERE v > 1 "
    "ORDER BY v LIMIT 3",
    "SELECT DISTINCT k FROM t ORDER BY k",
    "SELECT k, v, row_number() OVER (PARTITION BY k ORDER BY v DESC) rn "
    "FROM t QUALIFY rn = 1 ORDER BY k",
    "SELECT k, avg(v) OVER (PARTITION BY k) a FROM t ORDER BY k, a",
    "SELECT CASE WHEN k = 1 THEN 'one' ELSE upper(s) END x, k + 1 FROM t "
    "WHERE s IS NOT NULL ORDER BY k",
    "SELECT * FROM (VALUES (1,'x'),(2,'y')) val(a,b) "
    "UNION ALL SELECT k, s FROM t ORDER BY 1, 2",
    "SELECT k FROM t WHERE v BETWEEN 2 AND 3.5 ORDER BY k",
    "SELECT a.k FROM t a JOIN t b ON a.k = b.k AND a.v < b.v ORDER BY a.k",
]


@pytest.mark.parametrize("sql", QUERIES)
def test_roundtrip_operators(ctx, sql):
    roundtrip(ctx, sql, ordered="ORDER BY" in sql)


def test_bytes_are_stable(ctx):
    sql = QUERIES[0]
    phys = ctx.sql(sql).physical_plan()
    b1 = physical_plan_to_proto_bytes(phys, ctx.catalog)
    b2 = physical_plan_to_proto_bytes(phys, ctx.catalog)
    assert b1 == b2 and len(b1) > 20


@pytest.mark.parametrize("qid", list(range(1, 23)))
def test_tpch_physical_roundtrip(qid):
    ctx = SessionContext()
    register_tpch(ctx, 0.005)
    phys = ctx.sql(query(qid, 0.005)).physical_plan()
    data = physical_plan_to_proto_bytes(phys, ctx.catalog)
    back = physical_plan_from_proto_bytes(data, ctx.catalog)
    r1 = to_host(phys.execute(ctx.exec_context())).to_pandas()
    r2 = to_host(back.execute(ctx.exec_context())).to_pandas()
    assert frames_diff(r2, r1, ordered=qid in LIMIT_QUERIES) is None
