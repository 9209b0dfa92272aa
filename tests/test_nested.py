"""Array/nested-type function tests (reference analog: functions-nested
crate tests and sqllogictest test_files/array.slt). The engine represents a
list as a fixed max-width padded 2-D device array + per-row lengths; these
tests assert the SQL-visible semantics match the reference's."""
import numpy as np
import pandas as pd
import pytest

from datafusion_tpu.common.errors import PlanError
from datafusion_tpu.context import SessionContext


@pytest.fixture(scope="module")
def ctx():
    c = SessionContext()
    c.register_table("t", {
        "k": [1, 2, 3, 4],
        "s": ["a,b", "c", None, "d,e,f"],
        "arr": [[10, 20], [], None, [30]],
        "strs": [["x", "y"], ["y"], None, []],
    })
    return c


def q(ctx, sql):
    return ctx.sql(sql).collect().to_pydict()


def test_array_literal_and_make_array(ctx):
    assert q(ctx, "SELECT [1, 2, k] a FROM t WHERE k = 2") == {"a": [[1, 2, 2]]}
    assert q(ctx, "SELECT make_array(k, k*2) m FROM t WHERE k = 3") == {"m": [[3, 6]]}
    out = q(ctx, "SELECT ['p', s] m FROM t WHERE k = 2")
    assert out == {"m": [["p", "c"]]}


def test_element_and_length(ctx):
    out = q(ctx, "SELECT arr[1] e1, arr[-1] em, arr[5] oob, array_length(arr) n, "
                 "cardinality(arr) c, empty(arr) emp FROM t")
    assert out["e1"] == [10, None, None, 30]
    assert out["em"] == [20, None, None, 30]
    assert out["oob"] == [None, None, None, None]
    assert out["n"] == [2, 0, None, 1]
    assert out["c"] == [2, 0, None, 1]
    assert out["emp"] == [False, True, None, False]


def test_membership(ctx):
    out = q(ctx, "SELECT array_has(arr, 20) h, array_position(arr, 30) p, "
                 "array_has_all(arr, [10, 20]) ha, array_has_any(arr, [99, 20]) hy "
                 "FROM t")
    assert out["h"] == [True, False, None, False]
    assert out["p"] == [None, None, None, 1]
    assert out["ha"] == [True, False, None, False]
    assert out["hy"] == [True, False, None, False]
    # string membership
    out = q(ctx, "SELECT array_has(strs, 'y') h FROM t")
    assert out["h"] == [True, True, None, False]


def test_append_prepend_concat(ctx):
    out = q(ctx, "SELECT array_append(arr, 99) ap, array_prepend(0, arr) pre, "
                 "array_concat(arr, [7, 8]) cc FROM t WHERE k IN (1, 2)")
    assert out["ap"] == [[10, 20, 99], [99]]
    assert out["pre"] == [[0, 10, 20], [0]]
    assert out["cc"] == [[10, 20, 7, 8], [7, 8]]


def test_slice_reverse_pop(ctx):
    out = q(ctx, "SELECT array_slice([1,2,3,4,5], 2, 4) sl, "
                 "array_slice([1,2,3,4,5], -2, -1) sn, "
                 "array_reverse(arr) rv, array_pop_back([1,2,3]) pb, "
                 "array_pop_front([1,2,3]) pf FROM t WHERE k = 1")
    assert out == {"sl": [[2, 3, 4]], "sn": [[4, 5]], "rv": [[20, 10]],
                   "pb": [[1, 2]], "pf": [[2, 3]]}


def test_sort_distinct_setops(ctx):
    out = q(ctx, "SELECT array_sort([3,1,2]) s, array_sort([3,1,2], 'desc') sd, "
                 "array_distinct([2,1,2,3,1]) d FROM t WHERE k = 1")
    assert out == {"s": [[1, 2, 3]], "sd": [[3, 2, 1]], "d": [[2, 1, 3]]}
    out = q(ctx, "SELECT array_union([1,2], [2,3]) u, "
                 "array_intersect([1,2,3], [2,3,9]) i, "
                 "array_except([1,2,3], [2]) x FROM t WHERE k = 1")
    assert out == {"u": [[1, 2, 3]], "i": [[2, 3]], "x": [[1, 3]]}


def test_remove_repeat_resize(ctx):
    out = q(ctx, "SELECT array_remove([1,2,2,3,2], 2) r1, "
                 "array_remove_n([1,2,2,3,2], 2, 2) r2, "
                 "array_remove_all([1,2,2,3,2], 2) ra, "
                 "array_repeat(7, 3) rp, array_resize([1,2], 4, 0) rs "
                 "FROM t WHERE k = 1")
    assert out == {"r1": [[1, 2, 3, 2]], "r2": [[1, 3, 2]], "ra": [[1, 3]],
                   "rp": [[7, 7, 7]], "rs": [[1, 2, 0, 0]]}


def test_array_reductions(ctx):
    out = q(ctx, "SELECT array_min(arr) mn, array_max(arr) mx, array_sum(arr) sm, "
                 "array_mean(arr) av, array_any_value(arr) anyv FROM t")
    assert out["mn"] == [10, None, None, 30]
    assert out["mx"] == [20, None, None, 30]
    assert out["sm"] == [30, None, None, 30]
    assert out["av"] == [15.0, None, None, 30.0]
    assert out["anyv"] == [10, None, None, 30]


def test_string_to_array_and_range(ctx):
    out = q(ctx, "SELECT string_to_array(s, ',') sp FROM t")
    assert out["sp"] == [["a", "b"], ["c"], None, ["d", "e", "f"]]
    out = q(ctx, "SELECT range(1, 7, 2) r, range(3) r0 FROM t WHERE k = 1")
    assert out == {"r": [[1, 3, 5]], "r0": [[0, 1, 2]]}


def test_unnest_basics(ctx):
    out = q(ctx, "SELECT k, unnest(arr) v FROM t")
    assert out == {"k": [1, 1, 4], "v": [10, 20, 30]}
    # empty and NULL lists produce no rows
    out = q(ctx, "SELECT k, unnest(string_to_array(s, ',')) p FROM t")
    assert out == {"k": [1, 1, 2, 4, 4, 4],
                   "p": ["a", "b", "c", "d", "e", "f"]}


def test_unnest_zip(ctx):
    out = q(ctx, "SELECT k, unnest(arr) a, unnest(strs) b FROM t")
    assert out == {"k": [1, 1, 2, 4], "a": [10, 20, None, 30],
                   "b": ["x", "y", "y", None]}


def test_unnest_through_engine(ctx):
    out = q(ctx, "SELECT sum(u) su, count(*) c FROM (SELECT unnest(arr) u FROM t)")
    assert out == {"su": [60], "c": [3]}
    out = q(ctx, "SELECT p, count(*) c FROM "
                 "(SELECT unnest(string_to_array(s, ',')) p FROM t) "
                 "GROUP BY p ORDER BY p")
    assert out["p"] == ["a", "b", "c", "d", "e", "f"]
    out = q(ctx, "SELECT k, unnest(arr) v FROM t ORDER BY v DESC LIMIT 2")
    assert out == {"k": [4, 1], "v": [30, 20]}


def test_unnest_matches_pandas_explode():
    rng = np.random.default_rng(9)
    rows = [list(rng.integers(0, 50, rng.integers(0, 5)).tolist())
            for _ in range(300)]
    ks = list(range(300))
    c = SessionContext()
    c.register_table("u", {"k": ks, "a": rows})
    got = c.sql("SELECT k, unnest(a) v FROM u").to_pandas()
    want = (pd.DataFrame({"k": ks, "a": rows}).explode("a").dropna()
            .rename(columns={"a": "v"}).reset_index(drop=True))
    want["v"] = want["v"].astype(np.int64)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)


def test_list_keys_rejected(ctx):
    for sql in ["SELECT arr, count(*) FROM t GROUP BY arr",
                "SELECT * FROM t ORDER BY arr",
                "SELECT DISTINCT arr FROM t"]:
        with pytest.raises(PlanError, match="list"):
            ctx.sql(sql).collect()


def test_lists_through_join_and_union(ctx):
    # list columns PASS THROUGH joins/unions fine (only keys are restricted)
    out = q(ctx, "SELECT a.k, b.arr FROM t a JOIN t b ON a.k = b.k "
                 "WHERE a.k <= 2 ORDER BY a.k")
    assert out == {"k": [1, 2], "arr": [[10, 20], []]}
    out = q(ctx, "SELECT arr FROM t WHERE k = 1 UNION ALL SELECT arr FROM t WHERE k = 4")
    assert sorted(out["arr"], key=len) == [[30], [10, 20]]


def test_nested_roundtrip_parquet(tmp_path, ctx):
    import pyarrow as pa
    import pyarrow.parquet as pq

    tab = pa.table({"id": [1, 2, 3],
                    "vals": pa.array([[1.5, 2.5], None, []],
                                     type=pa.list_(pa.float64()))})
    pq.write_table(tab, str(tmp_path / "x.parquet"))
    c = SessionContext()
    c.register_parquet("p", str(tmp_path / "x.parquet"))
    out = c.sql("SELECT id, vals, array_length(vals) n FROM p ORDER BY id").collect().to_pydict()
    assert out["vals"] == [[1.5, 2.5], None, []]
    assert out["n"] == [2, None, 0]


def test_array_agg_grouped():
    c = SessionContext()
    c.register_table("g", {"k": [1, 1, 2, 2, 2, 3],
                           "v": [10, 20, 30, None, 50, 60],
                           "s": ["a", "b", "c", "d", "e", "f"]})
    out = c.sql("SELECT k, array_agg(v) vs FROM g GROUP BY k ORDER BY k").collect().to_pydict()
    assert out["k"] == [1, 2, 3]
    # element order within a group is unspecified; NULL elements are kept
    assert sorted(out["vs"][0]) == [10, 20]
    assert sorted(x for x in out["vs"][1] if x is not None) == [30, 50]
    assert None in out["vs"][1] and out["vs"][2] == [60]
    out = c.sql("SELECT k, array_agg(s) ss FROM g GROUP BY k ORDER BY k").collect().to_pydict()
    assert sorted(out["ss"][1]) == ["c", "d", "e"]


def test_array_agg_global_and_roundtrip():
    c = SessionContext()
    c.register_table("g", {"k": [1, 1, 2], "v": [10, 20, 30]})
    out = c.sql("SELECT array_agg(k) ks FROM g").collect().to_pydict()
    assert sorted(out["ks"][0]) == [1, 1, 2]
    # empty input -> NULL (Postgres/reference semantics)
    assert c.sql("SELECT array_agg(v) e FROM g WHERE k > 99").collect().to_pydict() == {"e": [None]}
    assert c.sql("SELECT sum(u) su FROM (SELECT unnest(array_agg(v)) u FROM g)").collect().to_pydict() == {"su": [60]}


# ---------------------------------------------------------------------------
# lambda higher-order functions (reference: functions-nested lambda fns)
# ---------------------------------------------------------------------------


class TestLambdaFunctions:
    def _q(self, ctx, sql):
        return ctx.sql(sql).collect().to_pydict()

    def test_transform(self, ctx):
        r = self._q(ctx, "SELECT array_transform(make_array(1,2,3), x -> x * 2) a")
        assert r["a"] == [[2, 4, 6]]

    def test_transform_index_param(self, ctx):
        r = self._q(ctx, "SELECT array_transform(make_array(10,20), (x, i) -> x + i) a")
        assert r["a"] == [[11, 22]]

    def test_transform_capture(self, ctx):
        ctx.register_table("lam_t", {"id": [1, 2], "m": [5, 10]})
        r = self._q(ctx, "SELECT array_transform(make_array(1,2), x -> x * m) a "
                         "FROM lam_t ORDER BY id")
        assert r["a"] == [[5, 10], [10, 20]]

    def test_transform_string(self, ctx):
        r = self._q(ctx, "SELECT list_transform(string_to_array('a,b', ','), "
                         "s -> upper(s)) a")
        assert r["a"] == [["A", "B"]]

    def test_filter(self, ctx):
        r = self._q(ctx, "SELECT array_filter(make_array(1,2,3,4), x -> x % 2 = 0) a")
        assert r["a"] == [[2, 4]]

    def test_filter_strings(self, ctx):
        r = self._q(ctx, "SELECT array_filter(make_array('aa','b','cc'), "
                         "s -> length(s) = 2) a")
        assert r["a"] == [["aa", "cc"]]

    def test_any_all_match(self, ctx):
        r = self._q(ctx, "SELECT array_any_match(make_array(1,2,3), x -> x > 2) a, "
                         "array_all_match(make_array(1,2,3), x -> x > 0) b, "
                         "array_any_match(make_array(1,2), x -> x > 5) c, "
                         "array_all_match(make_array(1,2), x -> x > 1) d")
        assert (r["a"], r["b"], r["c"], r["d"]) == ([True], [True], [False], [False])

    def test_lambda_param_shadows_column(self, ctx):
        ctx.register_table("lam_s", {"x": [100], "arr_src": [1]})
        r = self._q(ctx, "SELECT array_transform(make_array(1,2), x -> x + 1) a "
                         "FROM lam_s")
        assert r["a"] == [[2, 3]]

    def test_lambda_null_3vl(self, ctx):
        r = self._q(ctx, "SELECT array_any_match(make_array(1, NULL), x -> x > 5) a, "
                         "array_any_match(make_array(1, NULL), x -> x > 0) b, "
                         "array_all_match(make_array(1, NULL), x -> x > 0) c, "
                         "array_all_match(make_array(1, NULL), x -> x > 5) d")
        assert (r["a"], r["b"], r["c"], r["d"]) == ([None], [True], [None], [False])

    def test_lambda_null_elements(self, ctx):
        r = self._q(ctx, "SELECT array_transform(make_array(1, NULL, 3), x -> x + 1) a, "
                         "array_filter(make_array(1, NULL, 3), x -> x > 0) b")
        assert r["a"] == [[2, None, 4]]
        assert r["b"] == [[1, 3]]
