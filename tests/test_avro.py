"""Avro data source (reference: datasource-avro crate, read-only Avro per
docs/source/user-guide/features.md:84-111; ours also writes via COPY TO)."""
import datetime

import pyarrow as pa
import pytest

from datafusion_tpu.common.errors import PlanError
from datafusion_tpu.context import SessionContext
from datafusion_tpu.io.avro import read_avro, write_avro


def _sample_table():
    return pa.table({
        "id": pa.array([1, 2, 3, None], pa.int64()),
        "small": pa.array([10, None, 30, 40], pa.int32()),
        "name": pa.array(["alpha", "beta", None, "delta"]),
        "score": pa.array([1.5, None, 3.25, -0.5], pa.float64()),
        "flag": pa.array([True, False, None, True]),
        "day": pa.array([datetime.date(2024, 1, 1), None,
                         datetime.date(1969, 12, 31),
                         datetime.date(2000, 2, 29)], pa.date32()),
    })


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_avro_roundtrip(tmp_path, codec):
    t = _sample_table()
    p = str(tmp_path / f"t_{codec}.avro")
    write_avro(t, p, codec=codec)
    back = read_avro(p)
    assert back.column("id").to_pylist() == [1, 2, 3, None]
    assert back.column("small").to_pylist() == [10, None, 30, 40]
    assert back.column("name").to_pylist() == ["alpha", "beta", None, "delta"]
    assert back.column("score").to_pylist() == [1.5, None, 3.25, -0.5]
    assert back.column("flag").to_pylist() == [True, False, None, True]
    assert back.column("day").to_pylist() == t.column("day").to_pylist()
    # avro int stays 32-bit, long 64-bit
    assert back.schema.field("small").type == pa.int32()
    assert back.schema.field("id").type == pa.int64()


def test_avro_multi_block(tmp_path):
    n = 10_000
    t = pa.table({"v": pa.array(range(n), pa.int64())})
    p = str(tmp_path / "blocks.avro")
    write_avro(t, p, codec="deflate", block_rows=1000)
    back = read_avro(p)
    assert back.column("v").to_pylist() == list(range(n))


def test_avro_sql_external_table(tmp_path):
    p = str(tmp_path / "t.avro")
    write_avro(_sample_table(), p)
    ctx = SessionContext()
    ctx.sql(f"CREATE EXTERNAL TABLE av STORED AS AVRO LOCATION '{p}'")
    out = ctx.sql("SELECT name, id + small AS t FROM av "
                  "WHERE flag IS NOT NULL ORDER BY id").to_pydict()
    assert out["name"] == ["alpha", "beta", "delta"]
    assert out["t"] == [11, None, None]  # row 2 small NULL, row 4 id NULL
    agg = ctx.sql("SELECT count(*) AS n, sum(score) AS s FROM av").to_pydict()
    assert agg["n"] == [4]
    assert agg["s"] == [pytest.approx(4.25)]


def test_copy_to_avro_roundtrip(tmp_path):
    ctx = SessionContext()
    ctx.register_table("src", {"k": [1, 2, 2], "s": ["x", "y", "z"],
                               "v": [0.5, 1.5, 2.5]})
    p = str(tmp_path / "out.avro")
    ctx.sql(f"COPY (SELECT k, s, sum(v) AS sv FROM src GROUP BY k, s) "
            f"TO '{p}' STORED AS AVRO")
    ctx.sql(f"CREATE EXTERNAL TABLE back STORED AS AVRO LOCATION '{p}'")
    out = ctx.sql("SELECT k, s, sv FROM back ORDER BY k, s").to_pydict()
    assert out["k"] == [1, 2, 2]
    assert out["s"] == ["x", "y", "z"]
    assert out["sv"] == [0.5, 1.5, 2.5]


def test_avro_bad_magic(tmp_path):
    p = tmp_path / "junk.avro"
    p.write_bytes(b"not an avro file")
    with pytest.raises(PlanError, match="container"):
        read_avro(str(p))
