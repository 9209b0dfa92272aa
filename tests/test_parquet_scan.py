"""Native parquet scan path: file groups, row-group pruning, predicate
pushdown, hive partitions (VERDICT item 5; reference:
datasource-parquet/src/opener/mod.rs:388-593 multi-stage pruning,
pruning/src/pruning_predicate.rs:365, datasource/src/file_scan_config/)."""
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datafusion_tpu.common import types as T
from datafusion_tpu.context import SessionContext
from datafusion_tpu.expr import nodes as E
from datafusion_tpu.io.parquet import (FALSE, TRUE, UNKNOWN, ColStats,
                                       ParquetDataset, discover,
                                       eval_predicate)


# ---------------------------------------------------------------------------
# tri-state predicate evaluation over statistics (unit level)
# ---------------------------------------------------------------------------

def _c(name):
    return E.Column(name)


def _lit(v, kind=T.TypeKind.INT64):
    return E.Literal(v, T.DataType(kind))


STATS = {
    "x": ColStats(10, 20, 0, 100),         # null-free [10, 20]
    "n": ColStats(10, 20, 5, 100),         # has nulls
    "all_null": ColStats(None, None, 100, 100),
    "s": ColStats("apple", "mango", 0, 100),
}


@pytest.mark.parametrize("pred,want", [
    (E.BinaryOp(E.Op.LT, _c("x"), _lit(5)), FALSE),     # max-possible x >= 10
    (E.BinaryOp(E.Op.LT, _c("x"), _lit(25)), TRUE),
    (E.BinaryOp(E.Op.LT, _c("x"), _lit(15)), UNKNOWN),
    (E.BinaryOp(E.Op.GE, _c("x"), _lit(10)), TRUE),
    (E.BinaryOp(E.Op.GT, _c("x"), _lit(20)), FALSE),
    (E.BinaryOp(E.Op.EQ, _c("x"), _lit(30)), FALSE),
    (E.BinaryOp(E.Op.EQ, _c("x"), _lit(15)), UNKNOWN),
    # nulls demote TRUE to UNKNOWN but never rescue FALSE
    (E.BinaryOp(E.Op.LT, _c("n"), _lit(25)), UNKNOWN),
    (E.BinaryOp(E.Op.LT, _c("n"), _lit(5)), FALSE),
    (E.BinaryOp(E.Op.LT, _c("all_null"), _lit(5)), FALSE),
    # string stats
    (E.BinaryOp(E.Op.GT, _c("s"), _lit("zebra", T.TypeKind.STRING)), FALSE),
    (E.BinaryOp(E.Op.EQ, _c("s"), _lit("cherry", T.TypeKind.STRING)), UNKNOWN),
    # IS NULL
    (E.IsNull(_c("x")), FALSE),
    (E.IsNull(_c("all_null")), TRUE),
    (E.IsNull(_c("n")), UNKNOWN),
    (E.Not(E.IsNull(_c("x"))), TRUE),
    # boolean structure
    (E.BinaryOp(E.Op.AND,
                E.BinaryOp(E.Op.LT, _c("x"), _lit(25)),
                E.BinaryOp(E.Op.GT, _c("x"), _lit(20))), FALSE),
    (E.BinaryOp(E.Op.OR,
                E.BinaryOp(E.Op.GT, _c("x"), _lit(20)),
                E.BinaryOp(E.Op.LT, _c("x"), _lit(5))), FALSE),
    (E.BinaryOp(E.Op.OR,
                E.BinaryOp(E.Op.GT, _c("x"), _lit(20)),
                E.BinaryOp(E.Op.LT, _c("x"), _lit(25))), TRUE),
    # BETWEEN / IN
    (E.Between(_c("x"), _lit(30), _lit(40)), FALSE),
    (E.Between(_c("x"), _lit(0), _lit(100)), TRUE),
    (E.InList(_c("x"), (_lit(1), _lit(2))), FALSE),
    (E.InList(_c("x"), (_lit(1), _lit(15))), UNKNOWN),
    # arithmetic interval propagation: x + 5 in [15, 25]
    (E.BinaryOp(E.Op.LT,
                E.BinaryOp(E.Op.ADD, _c("x"), _lit(5)), _lit(10)), FALSE),
    # comparison with NULL literal never passes
    (E.BinaryOp(E.Op.EQ, _c("x"), E.Literal(None, T.DataType(T.TypeKind.INT64))), FALSE),
])
def test_eval_predicate(pred, want):
    assert eval_predicate(pred, STATS) is want


# ---------------------------------------------------------------------------
# dataset-level pruning + reads
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hive")
    for year in (2022, 2023):
        for region in ("east", "west"):
            sub = d / f"year={year}" / f"region={region}"
            os.makedirs(sub, exist_ok=True)
            n = 4000
            base = (year - 2022) * 1_000_000 + (0 if region == "east" else 500_000)
            t = pa.table({
                "id": np.arange(base, base + n),
                "v": np.linspace(0.0, 10.0, n),
                "tag": [f"t{i % 7}" for i in range(n)],
            })
            pq.write_table(t, str(sub / "part.parquet"), row_group_size=500)
    return str(d)


def test_discover_hive(dataset_dir):
    files, pkeys = discover(dataset_dir)
    assert len(files) == 4
    assert pkeys == ["year", "region"]
    assert files[0].partitions == {"year": 2022, "region": "east"}


def test_row_group_pruning_counts(dataset_dir):
    ds = ParquetDataset(dataset_dir)
    # id in [1200, 1799] lives in row groups 2 and 3 of year=2022/east only
    pred = E.Between(_c("id"), _lit(1200), _lit(1799))
    units = ds.plan_units([pred])
    assert len(units) == 1
    assert units[0][1] == [2, 3]
    assert ds.last_scan["files_pruned"] == 3
    assert ds.last_scan["row_groups_pruned"] == 30  # 32 total - 2 kept
    t = ds.read([pred])
    assert t.num_rows == 1000  # rows of the surviving groups (pre-filter)


def test_partition_pruning_sql(dataset_dir):
    ctx = SessionContext()
    ctx.sql(f"CREATE EXTERNAL TABLE ev STORED AS PARQUET LOCATION '{dataset_dir}'")
    prov = ctx.catalog.get("ev")
    out = ctx.sql(
        "SELECT count(*) AS n, min(id) AS m FROM ev "
        "WHERE year = 2023 AND region = 'west'").to_pydict()
    assert out["n"] == [4000]
    assert out["m"] == [1_500_000]
    assert prov.last_scan["files_pruned"] == 3


def test_pruned_results_match_unpruned(dataset_dir):
    """Differential: pruning must not change results, only IO."""
    ctx = SessionContext()
    ctx.sql(f"CREATE EXTERNAL TABLE ev STORED AS PARQUET LOCATION '{dataset_dir}'")
    full = ctx.sql("SELECT year, region, tag, count(*) AS n, sum(v) AS s "
                   "FROM ev GROUP BY year, region, tag "
                   "ORDER BY year, region, tag").to_pydict()
    sub = ctx.sql("SELECT tag, count(*) AS n, sum(v) AS s FROM ev "
                  "WHERE year = 2022 AND region = 'east' AND id < 2000 "
                  "GROUP BY tag ORDER BY tag").to_pydict()
    # oracle with pandas over the full read
    import pandas as pd

    df = pd.DataFrame(ctx.catalog.get("ev").host_table().to_pydict())
    ref = (df[(df.year == 2022) & (df.region == "east") & (df.id < 2000)]
           .groupby("tag").agg(n=("id", "size"), s=("v", "sum")).reset_index())
    assert sub["tag"] == list(ref.tag)
    assert sub["n"] == list(ref.n)
    assert np.allclose(sub["s"], ref.s.values)
    assert len(full["tag"]) == 4 * 7


def test_projection_pushdown_reads_fewer_columns(dataset_dir):
    ds = ParquetDataset(dataset_dir)
    t = ds.read(columns=["id"])
    assert t.column_names == ["id"]
    t2 = ds.read(columns=["v", "region"])
    assert set(t2.column_names) == {"v", "region"}


def test_statistics_from_footers(dataset_dir):
    ds = ParquetDataset(dataset_dir)
    assert ds.num_rows() == 16000
    cs = ds.column_stats()
    assert cs["id"].lo == 0 and cs["id"].hi == 1_503_999
    assert cs["v"].null_count == 0


def test_single_file_no_hive(tmp_path):
    p = str(tmp_path / "one.parquet")
    pq.write_table(pa.table({"a": [1, 2, 3]}), p)
    ctx = SessionContext()
    ctx.sql(f"CREATE EXTERNAL TABLE one STORED AS PARQUET LOCATION '{p}'")
    out = ctx.sql("SELECT sum(a) AS s FROM one").to_pydict()
    assert out["s"] == [6]


def test_all_pruned_empty_result(dataset_dir):
    ctx = SessionContext()
    ctx.sql(f"CREATE EXTERNAL TABLE ev STORED AS PARQUET LOCATION '{dataset_dir}'")
    out = ctx.sql("SELECT count(*) AS n FROM ev WHERE id < 0").to_pydict()
    assert out["n"] == [0]
    out2 = ctx.sql("SELECT id FROM ev WHERE year = 1999").to_pydict()
    assert out2["id"] == []


# ---------------------------------------------------------------------------
# page-index pruning (reference: datasource-parquet/src/page_filter.rs)
# ---------------------------------------------------------------------------

@pytest.fixture()
def paged_file(tmp_path):
    """One file, ONE row group, many small pages over a sorted column: page
    min/max must prune inside the kept row group."""
    n = 40_000
    t = pa.table({
        "k": np.arange(n, dtype=np.int64),           # sorted -> tight pages
        "v": np.arange(n, dtype=np.float64) * 0.5,
        "s": pa.array((["aa", "bb", "cc", "dd"] * (n // 4))),
    })
    path = os.path.join(tmp_path, "paged.parquet")
    pq.write_table(t, path, row_group_size=n, data_page_size=2048,
                   write_page_index=True)
    return path


def test_page_index_prunes_within_row_group(paged_file):
    ds = ParquetDataset(paged_file)
    filt = E.BinaryOp(E.Op.LT, _c("k"), _lit(1000))
    out = ds.read([filt])
    scan = ds.last_scan
    # the single row group survives, but most of its pages cannot match
    assert scan["row_groups_pruned"] == 0
    assert scan["row_groups_page_masked"] == 1
    assert scan["rows_page_pruned"] > 30_000
    # exact-safe: every qualifying row survives the page mask
    ks = out.column("k").to_numpy()
    assert (np.sort(ks[ks < 1000]) == np.arange(1000)).all()


def test_page_index_range_predicate_between(paged_file):
    ds = ParquetDataset(paged_file)
    lo = E.BinaryOp(E.Op.GE, _c("k"), _lit(20_000))
    hi = E.BinaryOp(E.Op.LE, _c("k"), _lit(20_100))
    out = ds.read([lo, hi])
    assert ds.last_scan["rows_page_pruned"] > 35_000
    ks = np.sort(out.column("k").to_numpy())
    got = ks[(ks >= 20_000) & (ks <= 20_100)]
    assert (got == np.arange(20_000, 20_101)).all()


def test_page_index_sql_end_to_end(paged_file, tmp_path):
    ctx = SessionContext()
    ctx.sql(f"CREATE EXTERNAL TABLE pg STORED AS PARQUET LOCATION '{paged_file}'")
    out = ctx.sql("SELECT count(*) c, sum(k) s FROM pg WHERE k < 512").to_pandas()
    assert int(out["c"][0]) == 512
    assert int(out["s"][0]) == 512 * 511 // 2
