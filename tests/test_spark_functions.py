"""Spark-compat function library (reference: datafusion/spark/src/function/),
opt-in via ctx.enable_spark_functions()."""
import base64
import binascii
import datetime as dt
import hashlib

import pytest

from datafusion_tpu.context import SessionContext


@pytest.fixture()
def ctx():
    c = SessionContext()
    c.register_table("t", {"k": [1, 2, 3, 4], "x": [2.5, -2.5, 3.45, 1.15],
                           "s": ["hello", "WORLD", "abc", "1234567812345670"],
                           "d": ["2024-01-31", "2024-02-29", "2023-12-15",
                                 "2024-07-04"],
                           "n": [5, 12, 255, 1]})
    c.sql("CREATE TABLE t2 AS SELECT k, x, s, CAST(d AS DATE) d, n FROM t")
    c.enable_spark_functions()
    return c


def test_opt_in_required():
    c = SessionContext()
    c.register_table("t", {"s": ["x"]})
    with pytest.raises(Exception):
        c.sql("SELECT sha2(s, 256) FROM t").to_pydict()


def test_round_half_up_vs_bround(ctx):
    o = ctx.sql("SELECT round(x) r, bround(x) b FROM t2").to_pydict()
    assert o["r"] == [3.0, -3.0, 3.0, 1.0]   # Spark round: HALF_UP
    assert o["b"] == [2.0, -2.0, 3.0, 1.0]   # bround: HALF_EVEN


def test_math_and_bitwise(ctx):
    o = ctx.sql("SELECT pmod(-7, 3) p, hypot(3.0, 4.0) h FROM t2 LIMIT 1").to_pydict()
    assert o["p"] == [2] and o["h"] == [5.0]
    o = ctx.sql("SELECT bit_count(n) bc, shiftleft(n, 2) sl, bit_get(n, 2) bg, "
                "bitwise_not(n) bn FROM t2 ORDER BY k").to_pydict()
    assert o["bc"] == [2, 2, 8, 1] and o["sl"] == [20, 48, 1020, 4]
    assert o["bg"] == [1, 1, 1, 0] and o["bn"] == [-6, -13, -256, -2]
    o = ctx.sql("SELECT width_bucket(x, 0.0, 4.0, 4) wb FROM t2 ORDER BY k").to_pydict()
    assert o["wb"] == [3, 0, 4, 2]


def test_int_to_string_lut(ctx):
    o = ctx.sql("SELECT hex(n) h, bin(n) b FROM t2 ORDER BY k").to_pydict()
    assert o["h"] == ["5", "C", "FF", "1"]
    assert o["b"] == ["101", "1100", "11111111", "1"]


def test_hashes(ctx):
    o = ctx.sql("SELECT sha1(s) a, sha2(s, 256) b, crc32(s) c FROM t2 "
                "WHERE k = 1").to_pydict()
    assert o["a"] == [hashlib.sha1(b"hello").hexdigest()]
    assert o["b"] == [hashlib.sha256(b"hello").hexdigest()]
    assert o["c"] == [binascii.crc32(b"hello")]


def test_string_fns(ctx):
    o = ctx.sql("SELECT base64(s) e, unbase64(base64(s)) rt, soundex(s) sx "
                "FROM t2 WHERE k = 1").to_pydict()
    assert o["e"] == [base64.b64encode(b"hello").decode()]
    assert o["rt"] == ["hello"] and o["sx"] == ["H400"]
    o = ctx.sql("SELECT luhn_check(s) l FROM t2 ORDER BY k").to_pydict()
    assert o["l"] == [False, False, False, True]
    o = ctx.sql("SELECT substring(s, -3) t1, substring(s, 2, 3) t2 FROM t2 "
                "WHERE k = 1").to_pydict()
    assert o["t1"] == ["llo"] and o["t2"] == ["ell"]
    o = ctx.sql("SELECT elt(2, 'a', 'b', 'c') e FROM t2 LIMIT 1").to_pydict()
    assert o["e"] == ["b"]


def test_datetime_fns(ctx):
    o = ctx.sql("SELECT add_months(d, 1) am, date_add(d, 10) da, "
                "datediff(d, d) z, last_day(d) ld, weekday(d) wd, "
                "dayofweek(d) dw FROM t2 WHERE k = 3").to_pydict()
    assert o["am"] == [dt.date(2024, 1, 15)]
    assert o["da"] == [dt.date(2023, 12, 25)]
    assert o["z"] == [0] and o["ld"] == [dt.date(2023, 12, 31)]
    assert o["wd"] == [4] and o["dw"] == [6]  # 2023-12-15 is a Friday
    o = ctx.sql("SELECT next_day(d, 'Mon') nd FROM t2 WHERE k = 3").to_pydict()
    assert o["nd"] == [dt.date(2023, 12, 18)]


def test_conditional_misc(ctx):
    o = ctx.sql("SELECT if(x > 0, 'pos', 'neg') c, nvl2(s, 'has', 'nul') nv, "
                "isnull(x) i1, isnotnull(x) i2 FROM t2 ORDER BY k").to_pydict()
    assert o["c"] == ["pos", "neg", "pos", "pos"]
    assert o["nv"] == ["has"] * 4
    assert o["i1"] == [False] * 4 and o["i2"] == [True] * 4
    o = ctx.sql("SELECT monotonically_increasing_id() id, k FROM t2 "
                "ORDER BY k").to_pydict()
    assert o["id"] == [0, 1, 2, 3]


def test_aggregate_aliases(ctx):
    o = ctx.sql("SELECT try_sum(n) ts, collect_list(k) cl FROM t2").to_pydict()
    assert o["ts"] == [273] and o["cl"] == [[1, 2, 3, 4]]


def test_core_round_unchanged_without_spark():
    c = SessionContext()
    c.register_table("t", {"x": [2.5, 3.5]})
    assert c.sql("SELECT round(x) r FROM t").to_pydict()["r"] == [2.0, 4.0]
