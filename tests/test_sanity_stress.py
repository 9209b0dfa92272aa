"""Plan sanity checking + hash-collision stress (reference: SanityCheckPlan,
physical-optimizer/src/sanity_checker.rs; the force_hash_collisions CI
feature exercising collision paths of every hash table)."""
import numpy as np
import pytest

from datafusion_tpu.common.errors import PlanError
from datafusion_tpu.common.schema import Field, Schema
from datafusion_tpu.common import types as T
from datafusion_tpu.context import SessionContext
from datafusion_tpu.expr import nodes as E
from datafusion_tpu.physical import plan as P
from datafusion_tpu.physical.sanity import validate_plan


def _scan():
    ctx = SessionContext()
    ctx.register_table("t", {"k": [1, 2, 3], "v": [1.0, 2.0, 3.0]})
    return ctx, ctx.table("t").physical_plan()


def test_good_plan_passes():
    _, p = _scan()
    validate_plan(p)  # no raise


def test_projection_arity_mismatch():
    _, scan = _scan()
    bad_schema = Schema([Field("a", T.INT64), Field("b", T.INT64)])
    bad = P.ProjectionExec(scan, [E.col("k")], bad_schema)
    with pytest.raises(PlanError, match="exprs vs"):
        validate_plan(bad)


def test_unresolvable_column():
    _, scan = _scan()
    bad = P.FilterExec(scan, E.col("nope") > E.lit(1))
    with pytest.raises(PlanError, match="nope"):
        validate_plan(bad)


def test_union_arity_mismatch():
    _, scan = _scan()
    one = P.ProjectionExec(scan, [E.col("k")],
                           Schema([Field("k", T.INT64)]))
    bad = P.UnionExec([scan, one], scan.schema)
    with pytest.raises(PlanError, match="union"):
        validate_plan(bad)


def test_sql_plans_all_validate():
    ctx = SessionContext()
    ctx.register_table("t", {"k": [1, 2, 2], "s": ["a", "b", "b"],
                             "v": [1.0, 2.0, 3.0]})
    for sql in [
        "SELECT k, sum(v) FROM t GROUP BY k ORDER BY k",
        "SELECT a.k FROM t a JOIN t b ON a.k = b.k WHERE a.v > 1",
        "SELECT DISTINCT s FROM t",
        "SELECT k, row_number() OVER (ORDER BY v) FROM t",
    ]:
        validate_plan(ctx.sql(sql).physical_plan())


def test_forced_collisions_distributed_exact(monkeypatch):
    """With every hash identical, the hash exchange routes all rows to one
    shard; results must stay exact (slot capacity is overflow-proof)."""
    monkeypatch.setenv("DATAFUSION_TPU_FORCE_HASH_COLLISIONS", "1")
    import jax

    from datafusion_tpu.data.device import to_host
    from datafusion_tpu.parallel.distributed import make_mesh
    from datafusion_tpu.parallel.engine import DistributedQuery

    rng = np.random.default_rng(3)
    n = 500
    ctx = SessionContext()
    ctx.register_table("t", {"k": (rng.integers(0, 37, n)).tolist(),
                             "v": rng.integers(0, 100, n).tolist()})
    df = ctx.sql("SELECT k, count(*) c, sum(v) s FROM t GROUP BY k ORDER BY k")
    ref = df.collect().to_pydict()
    dq = DistributedQuery(df.physical_plan(), make_mesh(8))
    rel = dq.execute(ctx.exec_context())
    jax.block_until_ready(rel.sel)
    ours = to_host(rel).to_pydict()
    assert ours == ref


def test_forced_collisions_join_exact(monkeypatch):
    monkeypatch.setenv("DATAFUSION_TPU_FORCE_HASH_COLLISIONS", "1")
    ctx = SessionContext()
    ctx.register_table("l", {"k": [1, 2, 3, 3], "a": [10, 20, 30, 31]})
    ctx.register_table("r", {"k": [3, 3, 1], "b": [7, 8, 9]})
    out = ctx.sql(
        "SELECT a, b FROM l JOIN r ON l.k = r.k ORDER BY a, b").to_pydict()
    assert out == {"a": [10, 30, 30, 31, 31], "b": [9, 7, 8, 7, 8]}
