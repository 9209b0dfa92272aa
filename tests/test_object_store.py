"""Object-store registry: scans resolve paths through registered stores
(reference: ObjectStoreRegistry, execution/src/object_store.rs:1-334). The
in-memory store plays the remote-store role (no egress in CI), exactly as
the reference's own tests use object_store::memory::InMemory."""
import io

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datafusion_tpu.common.errors import PlanError
from datafusion_tpu.context import SessionContext
from datafusion_tpu.io.object_store import InMemoryStore


def _parquet_bytes(table, **kw):
    buf = io.BytesIO()
    pq.write_table(table, buf, **kw)
    return buf.getvalue()


@pytest.fixture()
def mem_ctx():
    store = InMemoryStore()
    n = 5000
    t = pa.table({"k": np.arange(n, dtype=np.int64),
                  "v": np.arange(n, dtype=np.float64) * 2.0})
    store.put("data/part.parquet",
              _parquet_bytes(t, row_group_size=1024, write_page_index=True))
    ctx = SessionContext()
    ctx.register_object_store("mem://", store)
    return ctx, store, n


def test_memory_store_scan(mem_ctx):
    ctx, store, n = mem_ctx
    ctx.sql("CREATE EXTERNAL TABLE m STORED AS PARQUET "
            "LOCATION 'mem:///data/part.parquet'")
    out = ctx.sql("SELECT count(*) c, sum(k) s FROM m").to_pandas()
    assert int(out["c"][0]) == n
    assert int(out["s"][0]) == n * (n - 1) // 2


def test_memory_store_pruning(mem_ctx):
    """Row-group + page pruning work through the store's range reads."""
    ctx, store, n = mem_ctx
    ctx.sql("CREATE EXTERNAL TABLE m STORED AS PARQUET "
            "LOCATION 'mem:///data/part.parquet'")
    out = ctx.sql("SELECT count(*) FROM m WHERE k < 100").to_pandas()
    assert int(out.iloc[0, 0]) == 100


def test_memory_store_hive_listing():
    store = InMemoryStore()
    for y in (2023, 2024):
        t = pa.table({"v": np.arange(10, dtype=np.int64) + y})
        store.put(f"lake/year={y}/f.parquet", _parquet_bytes(t))
    ctx = SessionContext()
    ctx.register_object_store("mem://", store)
    ctx.sql("CREATE EXTERNAL TABLE lake STORED AS PARQUET "
            "LOCATION 'mem:///lake'")
    out = ctx.sql("SELECT year, count(*) c FROM lake GROUP BY year "
                  "ORDER BY year").to_pandas()
    assert out.values.tolist() == [[2023, 10], [2024, 10]]


def test_unregistered_scheme_errors():
    ctx = SessionContext()
    with pytest.raises(PlanError, match="no object store"):
        ctx.sql("CREATE EXTERNAL TABLE x STORED AS PARQUET "
                "LOCATION 's3://bucket/path'")
        ctx.sql("SELECT * FROM x").collect()
