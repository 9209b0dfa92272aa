"""CacheManager analog (reference: execution/src/cache/cache_manager.rs:307
list-files / file-statistics / parquet-metadata caches + lru_queue.rs)."""
import os

import pyarrow as pa
import pyarrow.parquet as pq

from datafusion_tpu.io.parquet import ParquetDataset, discover
from datafusion_tpu.runtime.cache import (CacheManager, LruCache,
                                          default_cache_manager,
                                          set_default_cache_manager)


def test_lru_eviction_and_counters():
    c = LruCache(max_entries=2)
    c.put("a", 1)
    c.put("b", 2)
    assert c.get("a") == 1      # refreshes a
    c.put("c", 3)               # evicts b (LRU)
    assert c.get("b") is None
    assert c.get("a") == 1 and c.get("c") == 3
    assert c.hits == 3 and c.misses == 1
    assert c.get_or("d", lambda: 4) == 4 and len(c) == 2


def test_parquet_footer_cached_across_datasets(tmp_path):
    p = str(tmp_path / "t.parquet")
    pq.write_table(pa.table({"v": list(range(100))}), p)
    mgr = CacheManager()
    set_default_cache_manager(mgr)
    try:
        ds1 = ParquetDataset(p)
        ds1.num_rows()
        ds2 = ParquetDataset(p)  # second dataset, same file
        ds2.num_rows()
        m = mgr.metrics()["parquet_meta"]
        assert m["entries"] == 1 and m["hits"] >= 1
        # footer object is literally shared
        assert ds1._pf(p) is ds2._pf(p)
    finally:
        set_default_cache_manager(None)


def test_file_change_invalidates(tmp_path):
    p = str(tmp_path / "t.parquet")
    pq.write_table(pa.table({"v": [1, 2, 3]}), p)
    mgr = CacheManager()
    set_default_cache_manager(mgr)
    try:
        assert ParquetDataset(p).num_rows() == 3
        pq.write_table(pa.table({"v": [1, 2, 3, 4]}), p)
        os.utime(p, (1e9, 2e9))  # force a different fingerprint
        assert ParquetDataset(p).num_rows() == 4
    finally:
        set_default_cache_manager(None)


def test_listing_cache_and_invalidation(tmp_path):
    d = tmp_path / "ds"
    d.mkdir()
    pq.write_table(pa.table({"v": [1]}), str(d / "a.parquet"))
    mgr = CacheManager()
    set_default_cache_manager(mgr)
    try:
        files, _ = discover(str(d))
        assert len(files) == 1
        files2, _ = discover(str(d))
        assert [f.path for f in files2] == [f.path for f in files]
        assert mgr.list_files.hits >= 1
        # adding a file bumps the directory mtime -> fresh walk
        pq.write_table(pa.table({"v": [2]}), str(d / "b.parquet"))
        os.utime(str(d), (1e9, 2e9))
        files3, _ = discover(str(d))
        assert len(files3) == 2
    finally:
        set_default_cache_manager(None)


def test_stats_cache(tmp_path):
    p = str(tmp_path / "t.parquet")
    pq.write_table(pa.table({"v": list(range(50))}), p)
    mgr = CacheManager()
    set_default_cache_manager(mgr)
    try:
        ds = ParquetDataset(p)
        s1 = ds.column_stats()
        s2 = ds.column_stats()
        assert s1 is s2  # second call is the cached dict
        assert s1["v"].lo == 0 and s1["v"].hi == 49
        assert mgr.file_stats.hits == 1
    finally:
        set_default_cache_manager(None)
