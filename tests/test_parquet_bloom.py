"""Parquet bloom-filter pruning (reference: bloom-filter stage of
datasource-parquet/src/opener/mod.rs:388-593, row_group_filter.rs).

pyarrow writes split-block bloom filters but exposes no reader, so
io/bloom.py parses the footer thrift itself; these tests exercise that
parser, the SBBF membership check, and the row-group pruning it drives."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datafusion_tpu.common import types as T
from datafusion_tpu.context import SessionContext
from datafusion_tpu.expr import nodes as E
from datafusion_tpu.io.bloom import BloomIndex, encode_plain, parse_struct
from datafusion_tpu.io.parquet import ParquetDataset


@pytest.fixture(scope="module")
def bloom_file(tmp_path_factory):
    """Two row groups with overlapping [min, max] ranges (stats cannot
    prune) but disjoint value sets (bloom can): evens vs odds."""
    d = tmp_path_factory.mktemp("bloomds")
    # string values interleave lexicographically so min/max stats overlap
    # between the groups and only bloom filters can distinguish them
    t1 = pa.table({
        "v": pa.array(range(0, 2000, 2), pa.int64()),
        "s": pa.array([f"val{2 * i:04d}" for i in range(1000)]),
        "f": pa.array(np.arange(0.0, 2000.0, 2.0)),
    })
    t2 = pa.table({
        "v": pa.array(range(1, 2000, 2), pa.int64()),
        "s": pa.array([f"val{2 * i + 1:04d}" for i in range(1000)]),
        "f": pa.array(np.arange(1.0, 2000.0, 2.0)),
    })
    p = str(d / "t.parquet")
    pq.write_table(pa.concat_tables([t1, t2]), p, row_group_size=1000,
                   bloom_filter_options={"v": True, "s": True, "f": True})
    return p


def test_footer_parse_finds_bloom_offsets(bloom_file):
    bi = BloomIndex(bloom_file)
    offsets = bi._load_offsets()
    assert {(rg, c) for rg, c in offsets} == {
        (0, "v"), (0, "s"), (0, "f"), (1, "v"), (1, "s"), (1, "f")}
    # offsets live before the footer and are distinct
    assert len({o for o, _l in offsets.values()}) == 6


def test_no_bloom_filters_written(tmp_path):
    p = str(tmp_path / "plain.parquet")
    pq.write_table(pa.table({"v": [1, 2, 3]}), p)
    bi = BloomIndex(p)
    assert bi._load_offsets() == {}
    assert bi.might_contain_any(0, "v", [encode_plain(1, "INT64")]) is None


def test_membership_no_false_negatives(bloom_file):
    bi = BloomIndex(bloom_file)
    for i in range(0, 2000, 20):
        assert bi.might_contain_any(0, "v", [encode_plain(i, "INT64")]) is True
        assert bi.might_contain_any(1, "v", [encode_plain(i + 1, "INT64")]) is True
    for i in range(0, 200):
        assert bi.might_contain_any(
            0, "s", [encode_plain(f"val{2 * i:04d}", "BYTE_ARRAY")]) is True
    # absents mostly excluded (allow bloom false-positive rate)
    fp = sum(bool(bi.might_contain_any(0, "v", [encode_plain(i, "INT64")]))
             for i in range(1, 2000, 2))
    assert fp < 150  # default fpp is ~1-5%


def test_plan_units_bloom_prunes(bloom_file):
    ds = ParquetDataset(bloom_file)
    i64 = T.DataType(T.TypeKind.INT64)
    # 11 is odd: stats ranges overlap, only bloom prunes row group 0
    units = ds.plan_units([E.BinaryOp(E.Op.EQ, E.Column("v"),
                                      E.Literal(11, i64))])
    assert units == [(bloom_file, [1])]
    assert ds.last_scan["row_groups_bloom_pruned"] == 1
    # IN-list: all-odd values prune the even group
    units = ds.plan_units([E.InList(E.Column("v"),
                                    [E.Literal(11, i64), E.Literal(13, i64)],
                                    negated=False)])
    assert units == [(bloom_file, [1])]
    # mixed IN-list cannot prune either group
    units = ds.plan_units([E.InList(E.Column("v"),
                                    [E.Literal(10, i64), E.Literal(13, i64)],
                                    negated=False)])
    assert [u[1] for u in units] == [[0, 1]]
    # disabled -> no bloom pruning
    units = ds.plan_units([E.BinaryOp(E.Op.EQ, E.Column("v"),
                                      E.Literal(11, i64))], use_bloom=False)
    assert [u[1] for u in units] == [[0, 1]]
    assert ds.last_scan["row_groups_bloom_pruned"] == 0


def test_bloom_pruning_sql_correctness(bloom_file):
    """End-to-end: equality predicate through SQL prunes a row group and the
    result still matches the unpruned run."""
    ctx = SessionContext()
    ctx.sql(f"CREATE EXTERNAL TABLE bt STORED AS PARQUET LOCATION '{bloom_file}'")
    prov = ctx.catalog.get("bt")
    out = ctx.sql("SELECT v, s FROM bt WHERE s = 'val0013'").to_pydict()
    assert out["v"] == [13] and out["s"] == ["val0013"]
    assert prov.last_scan["row_groups_bloom_pruned"] == 1

    ctx.sql("SET execution.parquet_bloom_pruning = false")
    out2 = ctx.sql("SELECT v, s FROM bt WHERE s = 'val0013'").to_pydict()
    assert out2 == out
    assert prov.last_scan["row_groups_bloom_pruned"] == 0


def test_thrift_parser_roundtrip_types():
    """Compact-protocol parser on a hand-built struct: bool/int/binary/list/
    nested struct, including the long-form field header (delta 0)."""
    import struct as st

    def varint(n):
        out = b""
        while True:
            b = n & 0x7F
            n >>= 7
            out += bytes([b | (0x80 if n else 0)])
            if not n:
                return out

    def zz(n):
        return (n << 1) ^ (n >> 63)

    buf = b""
    buf += bytes([0x11])                      # field 1, BOOLEAN_TRUE
    buf += bytes([0x15]) + varint(zz(-7))     # field 2, i32 = -7
    buf += bytes([0x18]) + varint(3) + b"abc"  # field 3, binary
    buf += bytes([0x19, 0x25]) + varint(zz(4)) + varint(zz(5))  # field 4, list<i32>[2]
    buf += bytes([0x1C, 0x16]) + varint(zz(99)) + bytes([0])    # field 5, struct{1: i64}
    buf += bytes([0x05]) + varint(zz(20)) + varint(zz(123))     # field 20 via long form
    buf += bytes([0x27])                      # field 22 (delta 2), double
    buf += st.pack("<d", 2.5)
    buf += bytes([0])
    fields, pos = parse_struct(buf)
    assert pos == len(buf)
    assert fields[1] is True and fields[2] == -7 and fields[3] == b"abc"
    assert fields[4] == [4, 5] and fields[5] == {1: 99}
    assert fields[20] == 123 and fields[22] == 2.5
