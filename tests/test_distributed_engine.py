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


# ALL 22 TPC-H queries run distributed and match the single-device engine
DIST_QUERY_IDS = list(ALL_QUERY_IDS)


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


# ---------------------------------------------------------------------------
# PartitionMode::Partitioned analog (joins/mod.rs:96, hash_join/exec.rs:735):
# both sides hash-exchanged on the join keys, joined shard-locally.

PARTITIONED_QUERY_IDS = [3, 5, 10, 18, 21]


@pytest.mark.parametrize("qid", PARTITIONED_QUERY_IDS)
def test_tpch_partitioned_joins_match(tpch_ctx, mesh, qid):
    """Force every equi-join onto the partitioned path and compare against
    the single-device engine (differential, SURVEY.md §4)."""
    ctx = tpch_ctx
    df = ctx.sql(query(qid, SF))
    ref = df.to_pandas()
    dq = DistributedQuery(df.physical_plan(), mesh,
                          options={"join_mode": "partitioned"})
    ours = to_host(dq.execute(ctx.exec_context())).to_pandas()
    assert_frames_match(ours, ref, ordered=qid in LIMIT_QUERIES, qid=qid)


def test_partitioned_full_outer_join(mesh):
    ctx = SessionContext()
    n = 200
    ctx.register_table("a", {"k": [i % 60 for i in range(n)],
                             "x": [float(i) for i in range(n)]})
    ctx.register_table("b", {"k": [i % 90 + 30 for i in range(n)],
                             "y": [float(i * 2) for i in range(n)]})
    df = ctx.sql("SELECT a.k, b.k, x, y FROM a FULL JOIN b ON a.k = b.k")
    ref = df.to_pandas()
    dq = DistributedQuery(df.physical_plan(), mesh,
                          options={"join_mode": "partitioned"})
    ours = to_host(dq.execute(ctx.exec_context())).to_pandas()
    assert_frames_match(ours, ref, ordered=False, qid=-10)


def test_partitioned_join_triggers_on_large_build(tpch_ctx, mesh):
    """With a small broadcast threshold the build side exceeds the budget and
    the engine must choose PartitionMode::Partitioned on its own (the
    JoinSelection analog), still matching the single-device result."""
    ctx = tpch_ctx
    df = ctx.sql(query(3, SF))
    ref = df.to_pandas()
    dq = DistributedQuery(df.physical_plan(), mesh,
                          options={"broadcast_cap": 512})
    rel = dq.execute(ctx.exec_context())
    ours = to_host(rel).to_pandas()
    assert_frames_match(ours, ref, ordered=True, qid=3)
    # the decision is recorded: at least one join resolved to partitioned
    from datafusion_tpu.parallel.engine import _join_mode
    from datafusion_tpu.physical import plan as PP

    modes = []

    def walk(p):
        if isinstance(p, PP.JoinExec):
            modes.append(_join_mode(p, dq.options))
        for c in p.children():
            walk(c)

    walk(dq.plan)
    assert "partitioned" in modes


def test_distributed_topk_bounded_memory(tpch_ctx, mesh):
    """Distributed Q18 (high-cardinality group + ORDER BY ... LIMIT): the
    TopK path must gather only n*fetch rows, keeping every comm-created
    relation well under the gathered-global size (VERDICT r3 #4)."""
    ctx = tpch_ctx
    df = ctx.sql(query(18, SF))
    ref = df.to_pandas()
    dq = DistributedQuery(df.physical_plan(), mesh,
                          options={"join_mode": "partitioned"})
    ours = to_host(dq.execute(ctx.exec_context())).to_pandas()
    assert_frames_match(ours, ref, ordered=True, qid=18)
    # global lineitem capacity at SF0.01 is 65536; per-shard 8192. With
    # partitioned joins + partial/final aggs + TopK merge, nothing the
    # comms create may approach the replicated-global 65536.
    assert dq.trace_stats["max_capacity"] <= 4 * 8192


def test_exchange_skew_detect_and_regrow(mesh):
    """Zipf-hot group keys overflow the 2x-even-split exchange slots; the
    engine must detect the in-program drop counter, double the slot factor,
    re-run, and produce the exact answer WITHOUT starting from the n-x
    worst-case buffers (SURVEY.md §6 'Skewed keys')."""
    ctx = SessionContext()
    n = 4096
    # ~33% of rows share one group key -> one shard receives ~3x the even
    # split; factor 2 drops rows, factor 4 fits (stays below factor 8 = n)
    keys = [0 if i % 9 < 3 else i % 97 for i in range(n)]
    vals = [i % 23 for i in range(n)]
    ctx.register_table("t", {"k": keys, "v": vals})
    # count(DISTINCT) forces the exact row-exchange fallback
    df = ctx.sql("SELECT k, count(DISTINCT v) c, median(v) m FROM t GROUP BY k")
    ref = df.to_pandas()
    dq = DistributedQuery(df.physical_plan(), mesh)
    ours = to_host(dq.execute(ctx.exec_context())).to_pandas()
    assert_frames_match(ours, ref, ordered=False, qid=-11)
    assert 2 < dq.slot_factor < mesh.shape["dp"], \
        f"expected mid-ladder slot factor, got {dq.slot_factor}"


def test_exchange_null_group_keys_colocate(mesh):
    """NULL group keys must land on ONE shard even though the data stored
    under invalid slots is arbitrary: the exchange hash masks data by
    validity (engine._row_hash)."""
    ctx = SessionContext()
    n = 160
    ctx.register_table("t", {
        "k": [None if i % 3 == 0 else i % 5 for i in range(n)],
        "v": [i % 7 for i in range(n)],
    })
    df = ctx.sql("SELECT k, count(DISTINCT v) c FROM t GROUP BY k")
    ref = df.to_pandas()
    dq = DistributedQuery(df.physical_plan(), mesh)
    ours = to_host(dq.execute(ctx.exec_context())).to_pandas()
    assert_frames_match(ours, ref, ordered=False, qid=-12)
