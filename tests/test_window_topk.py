"""WindowTopKExec: per-group top-k rewrite of Filter(rank) over Window
(reference: physical-plan/src/sorts/partitioned_topk.rs:175 and the window
top-k rewrite in physical-optimizer/src/optimizer.rs)."""
import numpy as np
import pandas as pd
import pytest

from datafusion_tpu import SessionContext
from datafusion_tpu.physical.window import WindowTopKExec


def _find(plan, cls):
    if isinstance(plan, cls):
        return plan
    for c in plan.children():
        hit = _find(c, cls)
        if hit is not None:
            return hit
    return None


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    n = 4000
    return {
        "g": rng.integers(0, 37, n).tolist(),
        "v": rng.normal(size=n).round(6).tolist(),
        "s": [f"s{i % 11}" for i in range(n)],
    }


@pytest.fixture(scope="module")
def ctx(data):
    c = SessionContext()
    c.register_table("t", data)
    return c


@pytest.fixture(scope="module")
def pdf(data):
    return pd.DataFrame(data)


def test_qualify_row_number_topk_plan_and_values(ctx, pdf):
    q = ("SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v DESC) rn "
         "FROM t QUALIFY rn <= 4 ORDER BY g, rn")
    df = ctx.sql(q)
    assert _find(df.physical_plan(), WindowTopKExec) is not None
    r = pd.DataFrame(df.collect().to_pydict())
    exp = pdf.copy()
    exp["rn"] = (exp.groupby("g")["v"].rank(method="first", ascending=False)
                 .astype(int))
    exp = exp[exp.rn <= 4].sort_values(["g", "rn"]).reset_index(drop=True)
    assert len(r) == len(exp)
    np.testing.assert_allclose(r["v"].values, exp["v"].values)
    np.testing.assert_array_equal(r["rn"].values, exp["rn"].values)


def test_derived_table_rank_lt(ctx, pdf):
    q = ("SELECT * FROM (SELECT g, v, rank() OVER (PARTITION BY g ORDER BY v)"
         " rk FROM t) sub WHERE rk < 3 ORDER BY g, rk, v")
    df = ctx.sql(q)
    assert _find(df.physical_plan(), WindowTopKExec) is not None
    r = pd.DataFrame(df.collect().to_pydict())
    exp = pdf.copy()
    exp["rk"] = exp.groupby("g")["v"].rank(method="min").astype(int)
    exp = exp[exp.rk < 3].sort_values(["g", "rk", "v"]).reset_index(drop=True)
    np.testing.assert_allclose(r["v"].values, exp["v"].values)


def test_dense_rank_eq_one_with_string_partition(ctx, pdf):
    q = ("SELECT s, v FROM t QUALIFY dense_rank() OVER "
         "(PARTITION BY s ORDER BY v DESC) = 1 ORDER BY s")
    df = ctx.sql(q)
    assert _find(df.physical_plan(), WindowTopKExec) is not None
    r = pd.DataFrame(df.collect().to_pydict())
    exp = pdf.loc[pdf.groupby("s")["v"].idxmax()].sort_values("s")
    np.testing.assert_allclose(r["v"].values, exp["v"].values)


def test_no_rewrite_for_non_rank_fn(ctx):
    q = ("SELECT g, v, sum(v) OVER (PARTITION BY g ORDER BY v) sv FROM t "
         "QUALIFY sv < 10 ORDER BY g, v LIMIT 5")
    assert _find(ctx.sql(q).physical_plan(), WindowTopKExec) is None


def test_no_rewrite_for_rank_eq_k_gt_one(ctx, pdf):
    q = ("SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) rn "
         "FROM t QUALIFY rn = 2 ORDER BY g")
    df = ctx.sql(q)
    assert _find(df.physical_plan(), WindowTopKExec) is None
    r = pd.DataFrame(df.collect().to_pydict())
    exp = pdf.copy()
    exp["rn"] = exp.groupby("g")["v"].rank(method="first").astype(int)
    exp = exp[exp.rn == 2]
    assert len(r) == len(exp)


def test_fused_overflow_rediscovers(data):
    # a filter that passes almost nothing at discovery, then a table where
    # far more rows survive: the fused overflow flag must force re-discovery
    ctx = SessionContext()
    ctx.register_table("t", data)
    from datafusion_tpu.data.device import to_host
    from datafusion_tpu.physical.fused import FusedQuery

    q = ("SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) rn "
         "FROM t QUALIFY rn <= 2 ORDER BY g, rn")
    fq = FusedQuery(ctx.sql(q).physical_plan())
    r1 = to_host(fq.execute(ctx.exec_context())).to_pandas()
    assert fq._fused not in (None, False)
    tk = _find(fq.plan, WindowTopKExec)
    assert tk is not None and tk._last_cap is not None
    assert len(r1) == len(set(data["g"])) * 2


def test_empty_input():
    ctx = SessionContext()
    ctx.register_table("t", {"g": [1, 2], "v": [1.0, 2.0]})
    q = ("SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) rn "
         "FROM t WHERE v > 100 QUALIFY rn <= 2")
    r = ctx.sql(q).collect().to_pydict()
    assert r["g"] == []


def test_distributed_topk(data):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from datafusion_tpu.data.device import to_host
    from datafusion_tpu.parallel.distributed import make_mesh
    from datafusion_tpu.parallel.engine import DistributedQuery

    ctx = SessionContext()
    ctx.register_table("t", data)
    q = ("SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v DESC) rn "
         "FROM t QUALIFY rn <= 3 ORDER BY g, rn")
    df = ctx.sql(q)
    single = pd.DataFrame(df.collect().to_pydict())
    dq = DistributedQuery(df.physical_plan(), make_mesh(8))
    dist = to_host(dq.execute(ctx.exec_context())).to_pandas()
    assert len(single) == len(dist)
    np.testing.assert_allclose(
        np.sort(single["v"].values), np.sort(dist["v"].values))
