"""Struct/map types + functions over the opaque sorted-dictionary encoding
(reference: functions-nested/src/{map.rs,map_extract.rs,map_keys.rs,
map_values.rs}, functions/src/core/{getfield.rs,named_struct.rs};
VERDICT r3 item #9). Oracle: pandas-side recomputation over the same rows."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from datafusion_tpu.common.errors import PlanError
from datafusion_tpu.context import SessionContext
from datafusion_tpu.data.table import Table

ROWS_S = [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}, None, {"a": 1, "b": "x"},
          {"a": 5, "b": None}]
ROWS_M = [{"k1": 10, "k2": 20}, {"k1": 5}, {"k3": 7}, None, {"k1": 1, "k9": 9}]


@pytest.fixture()
def ctx():
    c = SessionContext()
    c.register_table("t", {"s": ROWS_S, "m": ROWS_M,
                           "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    return c


def test_get_field_struct(ctx):
    out = ctx.sql("SELECT s['a'] a, s['b'] b, get_field(s, 'a') ga FROM t").to_pandas()
    want_a = [None if r is None else r["a"] for r in ROWS_S]
    assert [None if pd.isna(x) else int(x) for x in out["a"]] == want_a
    assert [None if x is None else x for x in out["b"]] == \
        [None if r is None else r["b"] for r in ROWS_S]
    assert list(out["a"].fillna(-1)) == list(out["ga"].fillna(-1))


def test_map_access_and_fns(ctx):
    out = ctx.sql(
        "SELECT m['k1'] k1, element_at(m, 'k1') e1, map_keys(m) mk, "
        "map_values(m) mv, cardinality(m) c, map_contains_key(m, 'k1') h, "
        "map_extract(m, 'k2') me FROM t").to_pandas()
    for i, r in enumerate(ROWS_M):
        if r is None:
            assert out["mk"][i] is None and pd.isna(out["c"][i])
            continue
        assert out["mk"][i] == sorted(r.keys())
        assert out["mv"][i] == [r[k] for k in sorted(r.keys())]
        assert int(out["c"][i]) == len(r)
        assert bool(out["h"][i]) == ("k1" in r)
        want = [r["k2"]] if "k2" in r else []
        assert out["me"][i] == want
        k1 = r.get("k1")
        assert (pd.isna(out["k1"][i]) and k1 is None) or out["k1"][i] == k1


def test_struct_group_sort_distinct(ctx):
    out = ctx.sql("SELECT s, count(*) c FROM t GROUP BY s ORDER BY c DESC, s['a']").to_pandas()
    # pandas oracle
    ser = pd.Series([None if r is None else tuple(sorted(r.items()))
                     for r in ROWS_S])
    vc = ser.value_counts(dropna=False)
    assert sorted(out["c"]) == sorted(vc.values)
    d = ctx.sql("SELECT count(DISTINCT s) FROM t").to_pandas()
    assert int(d.iloc[0, 0]) == len({x for x in ser.dropna()})


def test_constructors_and_nested_access(ctx):
    out = ctx.sql("SELECT named_struct('x', 7, 'y', 'hi')['x'] nx, "
                  "struct(1, 'two')['c1'] s1, "
                  "map(['a','b'], [10, 20])['b'] mb, "
                  "make_map('p', 1, 'q', 2)['q'] mq FROM t LIMIT 1").to_pandas()
    assert out.values.tolist() == [[7, "two", 20, 2]]


def test_arrow_struct_roundtrip():
    at = pa.table({"s": [{"a": 1}, {"a": 2}],
                   "m": pa.array([[("k", 1)], None],
                                 type=pa.map_(pa.string(), pa.int64()))})
    t = Table.from_arrow(at)
    ctx = SessionContext()
    ctx.register_table("x", t)
    out = ctx.sql("SELECT s['a'] a, m['k'] k FROM x").to_pandas()
    assert [int(x) for x in out["a"]] == [1, 2]
    assert int(out["k"][0]) == 1 and pd.isna(out["k"][1])


def test_struct_filter_and_join_key_error(ctx):
    out = ctx.sql("SELECT v FROM t WHERE s['a'] = 1 ORDER BY v").to_pandas()
    assert list(out["v"]) == [1.0, 4.0]
    # constructing from non-literal columns is explicitly unsupported
    with pytest.raises(PlanError, match="literal"):
        ctx.sql("SELECT named_struct('a', v) FROM t").collect()
