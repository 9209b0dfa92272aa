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
