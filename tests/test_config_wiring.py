"""Config flags must change real behavior, not just docs (reference:
config_namespace! options consumed throughout, common/src/config.rs)."""
import numpy as np
import pytest

from datafusion_tpu.common.errors import ParseError
from datafusion_tpu.context import SessionContext


def _ctx():
    ctx = SessionContext()
    ctx.register_table("a", {"k": [1, 2, 3, 4], "v": [1.0, 2.0, 3.0, 4.0]})
    ctx.register_table("b", {"k": [2, 3], "w": [20.0, 30.0]})
    return ctx


def test_optimizer_toggles_change_plan_not_results():
    q = ("SELECT a.k, a.v * b.w AS x FROM a, b "
         "WHERE a.k = b.k AND a.v > 1 ORDER BY a.k LIMIT 2")
    ctx = _ctx()
    want = ctx.sql(q).to_pydict()
    base_plan = ctx.sql(q).explain()
    for flag in ("optimizer.filter_pushdown", "optimizer.join_reorder",
                 "optimizer.limit_into_sort", "optimizer.simplify_expressions",
                 "optimizer.common_subplan_dedup",
                 "optimizer.eliminate_outer_joins"):
        ctx2 = _ctx()
        ctx2.sql(f"SET {flag} = false")
        got = ctx2.sql(q).to_pydict()
        assert got == want, flag
    # at least filter pushdown visibly changes the plan shape
    ctx3 = _ctx()
    ctx3.sql("SET optimizer.filter_pushdown = false")
    assert ctx3.sql(q).explain() != base_plan


def test_decorrelate_toggle_still_correct():
    ctx = _ctx()
    q = "SELECT k FROM a WHERE EXISTS (SELECT 1 FROM b WHERE b.k = a.k) ORDER BY k"
    want = ctx.sql(q).to_pydict()
    assert want == {"k": [2, 3]}


def test_parser_recursion_limit():
    ctx = SessionContext()
    ctx.register_table("t", {"x": [1.0]})
    deep = "(" * 100 + "x" + ")" * 100
    with pytest.raises(ParseError, match="recursion_limit"):
        ctx.sql(f"SELECT {deep} FROM t")
    ctx.sql("SET sql_parser.recursion_limit = 40")
    with pytest.raises(ParseError, match="recursion_limit"):
        ctx.sql("SELECT " + "(" * 50 + "x" + ")" * 50 + " FROM t")
    shallow = "(" * 30 + "x" + ")" * 30
    out = ctx.sql(f"SELECT {shallow} AS y FROM t").to_pydict()
    assert out["y"] == [1.0]


def test_spill_host_budget_demotes_to_disk(tmp_path):
    from datafusion_tpu.data.device import to_device
    from datafusion_tpu.data.table import Table
    from datafusion_tpu.runtime.spill import SpillManager

    rel = to_device(Table.from_pydict(
        {"v": np.arange(4096, dtype=np.int64)}))
    mgr = SpillManager(str(tmp_path), max_host_bytes=rel.sel.nbytes,
                       compress=True)
    for _ in range(4):
        mgr.spill(rel)
    assert mgr.disk_spill_count >= 2          # oldest demoted to .npz
    assert any(s.path is not None for s in mgr.spilled)
    files = list(tmp_path.glob("*.npz"))
    assert files
    # demoted relations restore losslessly
    demoted = next(s for s in mgr.spilled if s.path is not None)
    back = demoted.restore()
    assert np.asarray(back.columns[0].data)[:5].tolist() == [0, 1, 2, 3, 4]


def test_dynamic_filter_toggle(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "probe.parquet")
    pq.write_table(pa.table({"k": list(range(10_000)),
                             "v": [float(i) for i in range(10_000)]}),
                   p, row_group_size=1000)
    for flag, expect_prune in (("true", True), ("false", False)):
        ctx = SessionContext()
        ctx.sql(f"CREATE EXTERNAL TABLE probe STORED AS PARQUET LOCATION '{p}'")
        ctx.register_table("build", {"k": [4500, 4600]})
        ctx.sql("SET execution.out_of_core = on")
        ctx.sql("SET execution.chunk_rows = 4096")
        ctx.sql(f"SET optimizer.dynamic_filter_pushdown = {flag}")
        out = ctx.sql("SELECT sum(p.v) AS s FROM probe p "
                      "JOIN build b ON p.k = b.k").to_pydict()
        assert out["s"] == [9100.0], (flag, out)
