"""Sort elision over known output orderings (reference: EnforceSorting /
ordering equivalence, physical-expr/src/equivalence/ordering.rs)."""
import numpy as np

from datafusion_tpu.context import SessionContext
from datafusion_tpu.physical import plan as P
from datafusion_tpu.physical.ordering import ordering_satisfies, output_ordering


def _ctx(n=500, seed=0):
    rng = np.random.default_rng(seed)
    ctx = SessionContext()
    ctx.register_table("t", {
        "k": rng.integers(0, 23, n).tolist(),
        "s": rng.choice(["a", "b", "c", None], n).tolist(),
        "v": np.round(rng.random(n) * 100, 2).tolist(),
    })
    return ctx


def _find_sorts(p, out):
    if isinstance(p, P.SortExec):
        out.append(p)
    for c in p.children():
        _find_sorts(c, out)


def test_sort_after_groupby_marked_presorted():
    ctx = _ctx()
    df = ctx.sql("SELECT k, sum(v) sv FROM t GROUP BY k ORDER BY k")
    sorts = []
    _find_sorts(df.physical_plan(), sorts)
    assert sorts and all(s.presorted for s in sorts)
    out = df.to_pydict()
    assert out["k"] == sorted(out["k"])


def test_sort_after_groupby_result_exact():
    ctx = _ctx(seed=7)
    got = ctx.sql(
        "SELECT k, s, count(*) c, sum(v) sv FROM t GROUP BY k, s "
        "ORDER BY k, s").to_pydict()
    # engine order: k asc, s asc NULLS LAST within k
    import pandas as pd

    df = pd.DataFrame(ctx.sql("SELECT k, s, count(*) c, sum(v) sv FROM t "
                              "GROUP BY k, s").to_pydict())
    ref = df.sort_values(["k", "s"], na_position="last", kind="stable")
    assert got["k"] == ref.k.tolist()
    assert got["s"] == [None if pd.isna(x) else x for x in ref.s.tolist()]


def test_desc_or_wrong_prefix_not_elided():
    ctx = _ctx()
    for sql in ["SELECT k, sum(v) sv FROM t GROUP BY k ORDER BY k DESC",
                "SELECT k, sum(v) sv FROM t GROUP BY k ORDER BY sv",
                "SELECT k, s, count(*) c FROM t GROUP BY k, s ORDER BY s"]:
        sorts = []
        _find_sorts(ctx.sql(sql).physical_plan(), sorts)
        assert sorts and not any(s.presorted for s in sorts), sql


def test_presorted_with_limit():
    ctx = _ctx()
    full = ctx.sql("SELECT DISTINCT k FROM t ORDER BY k").to_pydict()["k"]
    lim = ctx.sql("SELECT DISTINCT k FROM t ORDER BY k LIMIT 5").to_pydict()["k"]
    assert lim == full[:5]


def test_distributed_still_sorts(monkeypatch):
    import jax

    from datafusion_tpu.data.device import to_host
    from datafusion_tpu.parallel.distributed import make_mesh
    from datafusion_tpu.parallel.engine import DistributedQuery

    ctx = _ctx(seed=3)
    df = ctx.sql("SELECT k, count(*) c FROM t GROUP BY k ORDER BY k")
    ref = df.to_pydict()
    dq = DistributedQuery(df.physical_plan(), make_mesh(8))
    rel = dq.execute(ctx.exec_context())
    jax.block_until_ready(rel.sel)
    assert to_host(rel).to_pydict() == ref
