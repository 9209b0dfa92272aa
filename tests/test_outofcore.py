"""Out-of-core execution tests: the chunked executor (physical/chunked.py)
must produce results identical to the resident engine while streaming scans
in bounded chunks, merging Partial aggregation states across chunks, and
spilling to host under memory-pool pressure (reference analogs:
ExternalSorter sorts/sort.rs:110-202, aggregation spill
grouped_hash_stream.rs:1167, core/tests/memory_limit/)."""
import numpy as np
import pandas as pd
import pytest

from datafusion_tpu.context import SessionContext


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    n = 6000
    return {
        "k": rng.integers(0, 80, n).tolist(),
        "s": rng.choice(["aa", "bb", "cc", None], n).tolist(),
        "v": np.round(rng.normal(10, 3, n), 3).tolist(),
        "d": np.round(rng.uniform(0, 100, n), 2).tolist(),
    }


@pytest.fixture(scope="module")
def dim():
    return {"k": list(range(0, 80, 3)), "name": [f"n{i:02d}" for i in range(0, 80, 3)]}


def _pair(data, dim, chunk_rows=512, **extra):
    ref = SessionContext(config={"execution.out_of_core": "off"})
    ooc = SessionContext(config={"execution.out_of_core": "on",
                                 "execution.chunk_rows": chunk_rows, **extra})
    for c in (ref, ooc):
        c.register_table("t", data)
        c.register_table("dm", dim)
    return ref, ooc


QUERIES = [
    # pipeline + grouped aggregation (sorted path: int keys)
    "SELECT k, count(*) c, sum(v) sv, min(v), max(v), avg(d) FROM t GROUP BY k ORDER BY k",
    # dense path (dictionary string keys), NULL group
    "SELECT s, count(*) c, sum(v) sv FROM t GROUP BY s ORDER BY s",
    # global aggregation
    "SELECT count(*), sum(v), avg(d), min(k), max(k) FROM t WHERE v > 10",
    # global over empty input
    "SELECT count(*), sum(v) FROM t WHERE v > 1e9",
    # top-k streaming
    "SELECT k, v FROM t ORDER BY v DESC, k LIMIT 17",
    # external sort (top-level full ORDER BY)
    "SELECT s, v FROM t WHERE k < 9 ORDER BY s NULLS FIRST, v DESC",
    # limit + offset streaming
    "SELECT k, v FROM t ORDER BY v, k LIMIT 10 OFFSET 4",
    # joins: build side materialized, probe streamed
    "SELECT dm.name, sum(t.v) sv FROM t JOIN dm ON t.k = dm.k GROUP BY dm.name ORDER BY dm.name",
    "SELECT t.k, t.v, dm.name FROM t LEFT JOIN dm ON t.k = dm.k WHERE t.k BETWEEN 5 AND 12",
    "SELECT k FROM t WHERE k IN (SELECT k FROM dm) AND v < 8",
    "SELECT k FROM t WHERE k NOT IN (SELECT k FROM dm) AND v < 6",
    # DISTINCT (host-merged at top level)
    "SELECT DISTINCT k, s FROM t",
    # DISTINCT aggregates + order statistics (materialized fallback)
    "SELECT count(DISTINCT k) cd, median(v) md FROM t",
    "SELECT s, count(DISTINCT k) cd FROM t GROUP BY s ORDER BY s",
    # window (materialized fallback)
    "SELECT k, v, sum(v) OVER (PARTITION BY k ORDER BY v) rs FROM t WHERE k < 4",
    # union all of streams
    "SELECT k FROM t WHERE k < 5 UNION ALL SELECT k FROM dm",
]


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_chunked_matches_resident(data, dim, qi):
    q = QUERIES[qi]
    ref, ooc = _pair(data, dim)
    a = ref.sql(q).to_pandas()
    b = ooc.sql(q).to_pandas()
    ordered = "ORDER BY" in q and "GROUP BY" not in q.split("ORDER BY")[-1]
    if not ordered and len(a):
        cols = list(a.columns)
        a = a.sort_values(cols).reset_index(drop=True)
        b = b.sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(b.reset_index(drop=True),
                                  a.reset_index(drop=True),
                                  check_dtype=False, atol=1e-9)


def test_memory_limited_aggregation_succeeds(data, dim):
    """A grouped aggregation whose scan exceeds the memory budget must still
    succeed (auto mode engages the chunked path; partial states merge under
    pressure instead of ResourceExhausted)."""
    rng = np.random.default_rng(3)
    n = 200_000
    big = {"g": rng.integers(0, 500, n).tolist(), "x": rng.normal(0, 1, n).tolist()}
    ref = SessionContext(config={"execution.out_of_core": "off"})
    ref.register_table("b", big)
    want = ref.sql("SELECT g, count(*) c, sum(x) s FROM b GROUP BY g ORDER BY g").to_pandas()
    lim = SessionContext(config={"execution.out_of_core": "auto",
                                 "execution.memory_limit_bytes": 1 << 20,
                                 "execution.chunk_rows": 16384})
    lim.register_table("b", big)
    got = lim.sql("SELECT g, count(*) c, sum(x) s FROM b GROUP BY g ORDER BY g").to_pandas()
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9)


def test_memory_limited_sort_spills_not_crashes():
    """ORDER BY over data larger than the memory budget: chunks spill to the
    host tier (ExternalSorter pattern) and the result is exact."""
    rng = np.random.default_rng(4)
    n = 120_000
    big = {"a": rng.permutation(n).tolist(), "b": rng.integers(0, 5, n).tolist()}
    ctx = SessionContext(config={"execution.out_of_core": "on",
                                 "execution.memory_limit_bytes": 600_000,
                                 "execution.chunk_rows": 8192})
    ctx.register_table("t", big)
    df = ctx.sql("SELECT a, b FROM t ORDER BY a DESC")
    ec = ctx.exec_context()
    out = df._chunked_query(ec).collect(ec)
    assert out.num_rows == n
    assert out.to_pydict()["a"][:3] == [n - 1, n - 2, n - 3]
    assert ec.spill_manager.spill_count > 0, "expected device->host spills"


def test_memory_limited_distinct_bigger_than_budget():
    """DISTINCT whose result alone exceeds the device budget finishes via the
    host merge; values are exact."""
    rng = np.random.default_rng(5)
    n = 120_000
    big = {"a": rng.permutation(n).tolist(), "b": rng.integers(0, 5, n).tolist()}
    ctx = SessionContext(config={"execution.out_of_core": "on",
                                 "execution.memory_limit_bytes": 600_000,
                                 "execution.chunk_rows": 8192})
    ctx.register_table("t", big)
    df = ctx.sql("SELECT DISTINCT a, b FROM t")
    ec = ctx.exec_context()
    out = df._chunked_query(ec).collect(ec)
    assert out.num_rows == n
    assert ec.spill_manager.spill_count > 0


def test_grace_join_build_exceeds_budget(monkeypatch):
    """A join whose build side cannot be materialized within the memory
    budget must degrade to a grace (partitioned) hash join: both sides hash-
    bucketed to host, joined bucket by bucket (reference analog:
    PartitionMode::Partitioned, joins/hash_join/exec.rs)."""
    from datafusion_tpu.physical.chunked import ChunkedQuery

    rng = np.random.default_rng(8)
    n = 50_000
    pk = rng.integers(0, 20_000, n).tolist()
    pv = rng.normal(size=n).tolist()
    bw = rng.normal(size=20_000).tolist()
    bs = [f"name_{i % 97}" for i in range(20_000)]
    q = ("SELECT b.s, count(*) AS c, sum(p.v*b.w) AS sv FROM probe p "
         "JOIN build b ON p.k = b.k GROUP BY b.s ORDER BY c DESC, s LIMIT 5")

    def run(cfg):
        ctx = SessionContext(config=cfg)
        ctx.register_table("probe", {"k": pk, "v": pv})
        ctx.register_table("build", {"k": list(range(20_000)), "w": bw, "s": bs})
        return ctx.sql(q).to_pandas()

    calls = []
    orig = ChunkedQuery._grace_join

    def spy(self, *a, **kw):
        calls.append(1)
        return orig(self, *a, **kw)

    monkeypatch.setattr(ChunkedQuery, "_grace_join", spy)
    want = run({"execution.out_of_core": "off"})
    got = run({"execution.out_of_core": "on", "execution.chunk_rows": 4096,
               "execution.memory_limit_bytes": 400_000})
    assert calls, "grace join path was not taken"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9)


def test_chunked_parquet_hive_partitions(tmp_path):
    """Chunked parquet scans: row-group batches stream from disk; global
    string dictionaries keep chunk metadata stable; hive partition columns
    and pruning survive chunking."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(6)
    for yr in (2023, 2024):
        sub = tmp_path / f"year={yr}"
        sub.mkdir()
        m = 3000
        pdf = pd.DataFrame({
            "id": np.arange(m) + yr * 10000,
            "cat": rng.choice([f"c{i}" for i in range(20)], m),
            "val": np.round(rng.normal(0, 1, m), 3),
        })
        pq.write_table(pa.Table.from_pandas(pdf), str(sub / "part.parquet"),
                       row_group_size=500)
    ref = SessionContext(config={"execution.out_of_core": "off"})
    ooc = SessionContext(config={"execution.out_of_core": "on",
                                 "execution.chunk_rows": 700})
    ref.register_parquet("p", str(tmp_path))
    ooc.register_parquet("p", str(tmp_path))
    q = ("SELECT year, cat, count(*) c, sum(val) s FROM p WHERE val > -0.5 "
         "GROUP BY year, cat ORDER BY year, cat")
    pd.testing.assert_frame_equal(ooc.sql(q).to_pandas(), ref.sql(q).to_pandas(),
                                  check_dtype=False, atol=1e-9)
    q2 = "SELECT count(*) FROM p WHERE year = 2024"
    assert ooc.sql(q2).to_pydict() == ref.sql(q2).to_pydict()
    q3 = "SELECT cat, id FROM p WHERE id < 20100 ORDER BY id LIMIT 7"
    assert ooc.sql(q3).to_pydict() == ref.sql(q3).to_pydict()


def test_tpch_queries_chunked():
    """A TPC-H sample through the chunked executor must be value-identical to
    the resident engine (multi-join chains, semi/anti joins, decimals)."""
    from datafusion_tpu.models.tpch.datagen import generate_tpch
    from datafusion_tpu.models.tpch.queries import query

    tables = generate_tpch(0.005)
    ref = SessionContext(config={"execution.out_of_core": "off"})
    ooc = SessionContext(config={"execution.out_of_core": "on",
                                 "execution.chunk_rows": 1024})
    for name, t in tables.items():
        ref.register_table(name, t)
        ooc.register_table(name, t)
    for qid in (1, 3, 4, 5, 6, 10, 12, 13, 18, 19):
        sql = query(qid, 0.005)
        a = ref.sql(sql).to_pandas()
        b = ooc.sql(sql).to_pandas()
        pd.testing.assert_frame_equal(b, a, check_dtype=False, atol=1e-6,
                                      obj=f"q{qid}")


def test_fair_spill_pool():
    """FairSpillPool divides the budget among spillable consumers
    (reference: memory_pool/pool.rs FairSpillPool); unspillable consumers
    allocate greedily and shrink returns their share."""
    from datafusion_tpu.common.errors import ResourceExhausted
    from datafusion_tpu.runtime.memory import FairSpillPool

    pool = FairSpillPool(1000)
    pool.register("sortA", True)
    pool.register("sortB", True)
    pool.try_grow("pins", 200)  # unspillable
    assert pool._fair_share() == 400
    assert pool.headroom_for("sortA") == 400
    pool.try_grow("sortA", 400)
    with pytest.raises(ResourceExhausted):
        pool.try_grow("sortA", 1)  # over its share, sortB's is protected
    pool.try_grow("sortB", 400)
    pool.shrink("sortA", 400)
    assert pool.headroom_for("sortA") == 400
    pool.shrink("pins", 200)
    assert pool._fair_share() == 500


def test_fair_spill_pool_query_end_to_end():
    """A memory-limited aggregation under the fair_spill policy still
    completes (consumers spill within their shares)."""
    rng = np.random.default_rng(5)
    n = 100_000
    big = {"g": rng.integers(0, 200, n).tolist(),
           "x": rng.normal(0, 1, n).tolist()}
    ref = SessionContext(config={"execution.out_of_core": "off"})
    ref.register_table("b", big)
    want = ref.sql("SELECT g, count(*) c, sum(x) s FROM b GROUP BY g ORDER BY g").to_pandas()
    ctx = SessionContext(config={"execution.out_of_core": "auto",
                                 "execution.memory_limit_bytes": 1 << 20,
                                 "execution.memory_pool": "fair_spill",
                                 "execution.chunk_rows": 16384})
    ctx.register_table("b", big)
    got = ctx.sql("SELECT g, count(*) c, sum(x) s FROM b GROUP BY g ORDER BY g").to_pandas()
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9)


def test_merge_run_indices_matches_sort():
    import numpy as np

    from datafusion_tpu.physical.chunked import (merge_run_indices,
                                                 pack_key_rows)

    rng = np.random.default_rng(3)
    runs = [np.sort(rng.integers(0, 50, rng.integers(0, 40))) for _ in range(7)]
    runs.append(np.array([], dtype=np.int64))  # empty run
    data = np.concatenate(runs).astype(np.int64)
    valid = rng.random(len(data)) > 0.2
    # runs must be sorted under the SAME key (validity rank major): re-sort
    # each run with nulls-last ordering
    lens, off = [], 0
    fixed = []
    for r in runs:
        n = len(r)
        v = valid[off:off + n]
        order = np.lexsort((data[off:off + n], (~v).astype(int)))  # nulls last
        fixed.append((data[off:off + n][order], v[order]))
        lens.append(n)
        off += n
    data = np.concatenate([d for d, _ in fixed]) if fixed else data
    valid = np.concatenate([v for _, v in fixed]) if fixed else valid
    packed = pack_key_rows([(data, valid, False, False)])
    idx = merge_run_indices(packed, lens)
    merged = packed[idx]
    assert (np.sort(packed, kind="stable") == merged).all()
    # stability: equal keys keep run order
    assert len(idx) == len(data)
