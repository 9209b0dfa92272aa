"""Distributed approx_distinct via HyperLogLog register planes (reference:
functions-aggregate/src/approx_distinct.rs + hyperloglog.rs). Opt-in by
execution.approx_distinct_hll; sketches merge across shards with one pmax
collective instead of exchanging distinct values."""
import numpy as np
import pandas as pd
import pytest

from datafusion_tpu.context import SessionContext
from datafusion_tpu.data.device import to_host
from datafusion_tpu.parallel.engine import DistributedQuery, make_mesh

HLL_ON = {"execution.approx_distinct_hll": True}


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    n = 400_000
    g = rng.integers(0, 8, n)
    v = rng.integers(0, 1_000_000, n)
    ctx = SessionContext()
    ctx.register_table("t", {"g": g.tolist(), "v": v.tolist()})
    truth = pd.DataFrame({"g": g, "v": v}).groupby("g")["v"].nunique() \
        .sort_index().to_numpy()
    return ctx, truth


def _run(ctx, mesh_n, options=None):
    df = ctx.sql("SELECT g, approx_distinct(v) ad, count(*) c FROM t "
                 "GROUP BY g ORDER BY g")
    dq = DistributedQuery(df.physical_plan(), make_mesh(mesh_n),
                          options=options)
    return to_host(dq.execute(ctx.exec_context())).to_pandas().sort_values("g")


def test_hll_estimate_within_error(data):
    ctx, truth = data
    out = _run(ctx, 8, HLL_ON)
    est = out["ad"].to_numpy().astype(float)
    err = np.abs(est - truth) / truth
    # 4096 registers: ~1.6% standard error; allow 4 sigma across 8 groups
    assert err.max() < 0.065, err
    # estimates differ from exact (the sketch really ran)
    assert (est != truth).any()


def test_hll_mesh_size_invariant(data):
    ctx, _ = data
    a = _run(ctx, 8, HLL_ON)["ad"].to_numpy()
    b = _run(ctx, 4, HLL_ON)["ad"].to_numpy()
    assert (a == b).all()


def test_default_stays_exact(data):
    ctx, truth = data
    out = _run(ctx, 8)
    assert (out["ad"].to_numpy() == truth).all()


def test_hll_coexists_with_decomposable_aggs(data):
    ctx, truth = data
    out = _run(ctx, 8, HLL_ON)
    # the exact count column is untouched by the sketch path
    assert out["c"].sum() == 400_000


def test_hll_estimator_unit():
    from datafusion_tpu.ops import hll
    import jax.numpy as jnp
    from datafusion_tpu.ops.kernels import hash64

    for ndv in (100, 5_000, 200_000):
        vals = jnp.arange(ndv, dtype=jnp.int64)
        h = hash64([vals])
        seg = jnp.zeros(ndv, jnp.int32)
        regs = hll.build_registers(h, seg, jnp.ones(ndv, bool), 1)
        est = float(hll.estimate(regs)[0])
        assert abs(est - ndv) / ndv < 0.05, (ndv, est)
