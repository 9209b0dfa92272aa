"""Distributed engine execution: the REAL physical plans of TPC-H queries run
SPMD over the 8-device virtual mesh (parallel/engine.DistributedQuery) and
must match the single-device engine result exactly (decimals bit-equal,
floats to tolerance). This is the engine-level analog of the reference's
RepartitionExec + EnforceDistribution machinery
(physical-plan/src/repartition/mod.rs, physical-optimizer/src/
ensure_requirements/), validated the way the reference validates operators:
differentially (SURVEY.md §4)."""
import numpy as np
import pytest

import jax

from datafusion_tpu.context import SessionContext
from datafusion_tpu.data.device import to_host
from datafusion_tpu.models.tpch.datagen import generate_tpch
from datafusion_tpu.models.tpch.queries import ALL_QUERY_IDS, query
from datafusion_tpu.parallel.distributed import make_mesh
from datafusion_tpu.parallel.engine import DistributedQuery

from test_tpch import assert_frames_match, LIMIT_QUERIES

SF = 0.01


@pytest.fixture(scope="module")
def tpch_ctx():
    tables = generate_tpch(SF)
    ctx = SessionContext()
    for name, t in tables.items():
        ctx.register_table(name, t)
    return ctx


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


# every TPC-H query shape: dense agg (1), multi-join (3,5,10), semi/anti and
# correlated subqueries (4,21,22), global agg (6,14), distinct-ish (16),
# high-cardinality groups (18)
DIST_QUERY_IDS = [1, 3, 4, 5, 6, 10, 14, 16, 18, 21, 22]


@pytest.mark.parametrize("qid", DIST_QUERY_IDS)
def test_tpch_distributed_matches_single_device(tpch_ctx, mesh, qid):
    ctx = tpch_ctx
    df = ctx.sql(query(qid, SF))
    ref = df.to_pandas()  # single-device engine result (fused path)
    dq = DistributedQuery(df.physical_plan(), mesh)
    rel = dq.execute(ctx.exec_context())
    ours = to_host(rel).to_pandas()
    assert_frames_match(ours, ref, ordered=qid in LIMIT_QUERIES, qid=qid)


def test_distributed_full_outer_join(mesh):
    ctx = SessionContext()
    ctx.register_table("a", {"k": [1, 2, 3], "x": [1.0, 2.0, 3.0]})
    ctx.register_table("b", {"k": [2, 3, 4], "y": [20.0, 30.0, 40.0]})
    df = ctx.sql("SELECT a.k, b.k, x, y FROM a FULL JOIN b ON a.k = b.k")
    ref = df.to_pandas()
    dq = DistributedQuery(df.physical_plan(), mesh)
    ours = to_host(dq.execute(ctx.exec_context())).to_pandas()
    assert_frames_match(ours, ref, ordered=False, qid=-1)


def test_distributed_union_and_window(mesh):
    ctx = SessionContext()
    ctx.register_table("t", {"g": [1, 1, 2, 2, 2], "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    df = ctx.sql(
        "SELECT g, v, sum(v) OVER (PARTITION BY g ORDER BY v) rs FROM t "
        "UNION ALL SELECT g, v, v FROM t")
    ref = df.to_pandas()
    dq = DistributedQuery(df.physical_plan(), mesh)
    ours = to_host(dq.execute(ctx.exec_context())).to_pandas()
    assert_frames_match(ours, ref, ordered=False, qid=-2)


def test_partial_final_split_is_used(mesh, monkeypatch):
    """Decomposable aggregates must go through the Partial/Final state split
    (states cross the wire), NOT the row-exchange fallback."""
    from datafusion_tpu.parallel import engine as EN

    def boom(*a, **k):
        raise AssertionError("row-exchange fallback used for decomposable aggs")

    monkeypatch.setattr(EN, "_exchange_by_group", boom)
    ctx = SessionContext()
    n = 64
    ctx.register_table("t", {
        "k": [i % 7 for i in range(n)],
        "g": ["ab"[i % 2] for i in range(n)],
        "x": [float(i) for i in range(n)],
        "y": [float(i * i % 11) for i in range(n)],
    })
    # sorted-path split (int keys, many aggregate families)
    df = ctx.sql(
        "SELECT k, count(*) c, sum(x) sx, avg(x) ax, min(x) mn, max(x) mx, "
        "var_samp(x) v, stddev(x) sd, corr(x, y) r FROM t GROUP BY k")
    ref = df.to_pandas()
    dq = DistributedQuery(df.physical_plan(), mesh)
    ours = to_host(dq.execute(ctx.exec_context())).to_pandas()
    assert_frames_match(ours, ref, ordered=False, qid=-3)
    # dense-path split (dictionary key -> psum merge, round-robin ownership)
    df2 = ctx.sql("SELECT g, sum(x) s, count(*) c, avg(y) a FROM t GROUP BY g")
    dq2 = DistributedQuery(df2.physical_plan(), mesh)
    ours2 = to_host(dq2.execute(ctx.exec_context())).to_pandas()
    assert_frames_match(ours2, df2.to_pandas(), ordered=False, qid=-4)


def test_distributed_count_distinct_fallback(mesh):
    """DISTINCT aggregates use the exact row-exchange path."""
    ctx = SessionContext()
    ctx.register_table("t", {"k": [i % 5 for i in range(40)],
                             "v": [i % 3 for i in range(40)]})
    df = ctx.sql("SELECT k, count(DISTINCT v) cd, median(v) m FROM t GROUP BY k")
    ref = df.to_pandas()
    dq = DistributedQuery(df.physical_plan(), mesh)
    ours = to_host(dq.execute(ctx.exec_context())).to_pandas()
    assert_frames_match(ours, ref, ordered=False, qid=-5)


def test_distributed_output_is_sharded(tpch_ctx, mesh):
    """Partitioned outputs really live distributed: the result of a grouped
    aggregate (no final sort) is sharded over the mesh axis."""
    ctx = tpch_ctx
    df = ctx.sql("SELECT l_orderkey, count(*) c FROM lineitem GROUP BY l_orderkey")
    dq = DistributedQuery(df.physical_plan(), mesh)
    assert dq.out_dist == "part"
    rel = dq.execute(ctx.exec_context())
    shards = {s.device for s in rel.sel.addressable_shards}
    assert len(shards) == 8
