import os

import numpy as np
import pytest

from datafusion_tpu.context import SessionContext


@pytest.fixture
def ctx():
    c = SessionContext()
    c.register_table("t", {
        "k": [1, 2, 3],
        "s": ["a", "b", None],
        "v": [1.5, 2.5, 3.5],
    })
    return c


def test_parquet_roundtrip(ctx, tmp_path):
    p = str(tmp_path / "t.parquet")
    ctx.sql(f"COPY t TO '{p}'")
    ctx.sql(f"CREATE EXTERNAL TABLE t2 STORED AS PARQUET LOCATION '{p}'")
    out = ctx.sql("SELECT * FROM t2 ORDER BY k").to_pydict()
    assert out["k"] == [1, 2, 3]
    assert out["s"] == ["a", "b", None]
    assert out["v"] == [1.5, 2.5, 3.5]


def test_csv_roundtrip(ctx, tmp_path):
    p = str(tmp_path / "t.csv")
    ctx.sql(f"COPY (SELECT k, v FROM t) TO '{p}' STORED AS CSV")
    ctx.register_csv("t3", p)
    out = ctx.sql("SELECT * FROM t3 ORDER BY k").to_pydict()
    assert out["k"] == [1, 2, 3]


def test_insert_values_and_select(ctx):
    ctx.sql("INSERT INTO t VALUES (4, 'd', 4.5), (5, 'e', 5.5)")
    assert ctx.sql("SELECT count(*) AS n FROM t").to_pydict()["n"] == [5]
    ctx.sql("CREATE TABLE t4 AS SELECT * FROM t WHERE k <= 2")
    ctx.sql("INSERT INTO t4 SELECT * FROM t WHERE k >= 4")
    out = ctx.sql("SELECT k FROM t4 ORDER BY k").to_pydict()
    assert out["k"] == [1, 2, 4, 5]


def test_information_schema(ctx):
    out = ctx.sql("SELECT table_name FROM information_schema.tables ORDER BY table_name").to_pydict()
    assert "t" in out["table_name"]
    cols = ctx.sql(
        "SELECT column_name FROM information_schema.columns WHERE table_name = 't' ORDER BY ordinal_position"
    ).to_pydict()
    assert cols["column_name"] == ["k", "s", "v"]


def test_explain_analyze(ctx):
    out = ctx.sql("EXPLAIN ANALYZE SELECT k, sum(v) FROM t GROUP BY k").to_pydict()
    text = "\n".join(out["plan"])
    assert "EXPLAIN ANALYZE" in text and "ms" in text


def test_memory_limit_errors(ctx):
    from datafusion_tpu.common.errors import ResourceExhausted

    ctx.config["memory_limit_bytes"] = 64
    # with out-of-core disabled, exceeding the pool raises with top consumers
    ctx.config["execution.out_of_core"] = "off"
    try:
        with pytest.raises(ResourceExhausted) as e:
            ctx.sql("SELECT * FROM t").collect()
        assert "top consumers" in str(e.value)
        # default (auto) engages the chunked executor: same query succeeds by
        # streaming instead of dying (spill-not-crash)
        ctx.config["execution.out_of_core"] = "auto"
        n = ctx.catalog.get("t").host_table().num_rows
        assert ctx.sql("SELECT * FROM t").collect().num_rows == n
    finally:
        del ctx.config["memory_limit_bytes"]
        del ctx.config["execution.out_of_core"]


def test_spill_roundtrip(ctx):
    from datafusion_tpu.data.device import to_device, to_host
    from datafusion_tpu.runtime.spill import SpillManager

    rel = to_device(ctx.catalog.get("t").host_table())
    sm = SpillManager()
    s = sm.spill(rel)
    path = s.to_disk()
    back = s.restore()
    t = to_host(back)
    assert t.to_pydict()["k"] == [1, 2, 3]
    s.release()
    assert not os.path.exists(path)


def test_json_source(ctx, tmp_path):
    p = tmp_path / "d.ndjson"
    p.write_text('{"a": 1, "s": "x"}\n{"a": 2, "s": "y"}\n')
    ctx.register_json("j", str(p))
    out = ctx.sql("SELECT a, s FROM j ORDER BY a").to_pydict()
    assert out["a"] == [1, 2] and out["s"] == ["x", "y"]
    ctx.sql(f"CREATE EXTERNAL TABLE j2 STORED AS JSON LOCATION '{p}'")
    assert ctx.sql("SELECT count(*) AS n FROM j2").to_pydict()["n"] == [2]


def test_arrow_ipc_and_json_copy_roundtrip(tmp_path):
    """Arrow IPC read/write + COPY TO JSON (reference: datasource-arrow,
    features.md Arrow-IPC read+write)."""
    from datafusion_tpu.context import SessionContext

    ctx = SessionContext()
    ctx.register_table("t", {"k": [1, 2, 3], "s": ["a", "b", None],
                             "v": [1.5, 2.5, 3.5]})
    ctx.sql(f"COPY t TO '{tmp_path}/t.arrow' STORED AS ARROW")
    ctx.sql(f"COPY (SELECT k, v FROM t WHERE k > 1) TO '{tmp_path}/t2.json' "
            "STORED AS JSON")
    ctx.sql(f"CREATE EXTERNAL TABLE ta STORED AS ARROW LOCATION "
            f"'{tmp_path}/t.arrow'")
    out = ctx.sql("SELECT * FROM ta ORDER BY k").to_pydict()
    assert out == {"k": [1, 2, 3], "s": ["a", "b", None], "v": [1.5, 2.5, 3.5]}
    ctx.sql(f"CREATE EXTERNAL TABLE tj STORED AS JSON LOCATION "
            f"'{tmp_path}/t2.json'")
    assert ctx.sql("SELECT sum(v) sv FROM tj").to_pydict()["sv"] == [6.0]
