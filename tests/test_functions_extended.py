import hashlib

import numpy as np
import pytest

from datafusion_tpu.context import SessionContext


@pytest.fixture
def ctx():
    c = SessionContext()
    c.register_table("t", {
        "s": ["apple", "banana", "cherry", "apple"],
        "x": [1.0, 4.0, 9.0, 16.0],
        "g": ["a", "a", "b", "b"],
        "v": [10.0, 20.0, 30.0, 50.0],
    })
    return c


def q(ctx, sql):
    return ctx.sql(sql).to_pydict()


def test_crypto_and_regex(ctx):
    out = q(ctx, "SELECT md5(s) AS h, regexp_like(s, 'an.*a') AS r FROM t ORDER BY s LIMIT 3")
    assert out["h"][0] == hashlib.md5(b"apple").hexdigest()
    assert out["r"] == [False, False, True]  # apple, apple, banana
    out = q(ctx, "SELECT regexp_replace(s, '[aeiou]', '_') AS rr FROM t ORDER BY s LIMIT 1")
    assert out["rr"] == ["_ppl_"]


def test_math_functions(ctx):
    out = q(ctx, "SELECT sqrt(x) AS r, ln(x) AS l, power(x, 2) AS p FROM t ORDER BY x LIMIT 2")
    assert out["r"] == [1.0, 2.0]
    assert abs(out["l"][1] - np.log(4.0)) < 1e-12
    assert out["p"] == [1.0, 16.0]


def test_pad_repeat_translate(ctx):
    out = q(ctx, """
        SELECT lpad(g, 3, '_') AS lp, repeat(g, 2) AS rp, translate(s, 'ab', 'xy') AS tr
        FROM t ORDER BY s LIMIT 1
    """)
    assert out["lp"] == ["__a"]
    assert out["rp"] == ["aa"]
    assert out["tr"] == ["xpple"]


def test_median_percentile(ctx):
    out = q(ctx, "SELECT g, median(v) AS m FROM t GROUP BY g ORDER BY g")
    assert out["m"] == [15.0, 40.0]
    out = q(ctx, "SELECT median(v) AS m, approx_percentile_cont(v, 0.25) AS p25 FROM t")
    assert out["m"] == [25.0]
    assert out["p25"] == [17.5]


def test_corr_covar(ctx):
    out = q(ctx, "SELECT corr(x, v) AS c, covar(x, v) AS cv FROM t")
    x = np.array([1.0, 4.0, 9.0, 16.0])
    v = np.array([10.0, 20.0, 30.0, 50.0])
    assert abs(out["c"][0] - np.corrcoef(x, v)[0, 1]) < 1e-12
    assert abs(out["cv"][0] - np.cov(x, v, ddof=1)[0, 1]) < 1e-12


def test_approx_distinct(ctx):
    out = q(ctx, "SELECT approx_distinct(s) AS d FROM t")
    assert out["d"] == [3]
    out = q(ctx, "SELECT g, approx_distinct(s) AS d FROM t GROUP BY g ORDER BY g")
    assert out["d"] == [2, 2]


def test_string_cast_numeric():
    """CAST(non-string AS VARCHAR): discovery-built dictionaries
    (expr_compiler.string_cast_column; reference: Arrow cast-to-utf8)."""
    c = SessionContext()
    c.register_table("n", {
        "i": [1, 22, None, -5, 22],
        "f": [1.5, 2.0, None, -0.25, 2.0],
        "b": [True, False, None, True, False],
    })
    out = c.sql("SELECT CAST(i AS VARCHAR) AS si, CAST(f AS VARCHAR) AS sf,"
                " CAST(b AS VARCHAR) AS sb FROM n").to_pydict()
    assert out["si"] == ["1", "22", None, "-5", "22"]
    assert out["sf"] == ["1.5", "2.0", None, "-0.25", "2.0"]
    assert out["sb"] == ["true", "false", None, "true", "false"]
    # casts flow through grouping / ordering / concat like native strings
    out = c.sql("SELECT CAST(i AS VARCHAR) AS k, count(*) AS c FROM n"
                " GROUP BY 1 ORDER BY 1").to_pydict()
    assert out["k"] == ["-5", "1", "22", None] and out["c"] == [1, 1, 2, 1]
    out = c.sql("SELECT CAST(i AS VARCHAR) || '/' || CAST(b AS VARCHAR) AS j"
                " FROM n WHERE i = 22").to_pydict()
    assert out["j"] == ["22/false", "22/false"]


def test_string_cast_temporal_decimal():
    c = SessionContext()
    c.register_table("d", {"s": ["2020-05-06", "1999-12-31"], "x": [1.25, 3.5]})
    out = c.sql("SELECT CAST(CAST(s AS DATE) AS VARCHAR) AS sd,"
                " CAST(CAST(x AS DECIMAL(10,2)) AS VARCHAR) AS dx,"
                " to_char(CAST(s AS DATE), '%d/%m/%Y') AS fmt FROM d").to_pydict()
    assert out["sd"] == ["2020-05-06", "1999-12-31"]
    assert out["dx"] == ["1.25", "3.50"]
    assert out["fmt"] == ["06/05/2020", "31/12/1999"]
    out = c.sql("SELECT CAST(CAST('2020-05-06 07:08:09' AS TIMESTAMP)"
                " AS VARCHAR) AS ts").to_pydict()
    assert out["ts"] == ["2020-05-06T07:08:09"]


def test_substr_index_regexp_tail(ctx):
    out = q(ctx, "SELECT substr_index('www.apache.org', '.', 2) AS a,"
                 " substr_index('www.apache.org', '.', -2) AS b,"
                 " substr_index('www.apache.org', '.', 99) AS c")
    assert out["a"] == ["www.apache"]
    assert out["b"] == ["apache.org"]
    assert out["c"] == ["www.apache.org"]
    out = q(ctx, "SELECT regexp_count(s, 'a') AS c, regexp_instr(s, 'an') AS i"
                 " FROM t ORDER BY s LIMIT 3")
    assert out["c"] == [1, 1, 3]   # apple, apple, banana
    assert out["i"] == [0, 0, 2]
    out = q(ctx, "SELECT to_local_time(CAST('2020-01-01 10:00:00' AS TIMESTAMP)) AS t")
    assert str(out["t"][0]).startswith("2020-01-01 10:00:00")


def test_time_type():
    """TIME (us-since-midnight, reference Time64): literals, casts, extract,
    to_time/make_time, ordering/grouping (datetime/{to_time,make_time}.rs)."""
    import datetime

    c = SessionContext()
    out = c.sql("SELECT TIME '13:45:30' AS t, to_time('07:08:09.5') AS tt,"
                " make_time(1, 2, 3) AS mt").to_pydict()
    assert out["t"] == [datetime.time(13, 45, 30)]
    assert out["tt"] == [datetime.time(7, 8, 9, 500000)]
    assert out["mt"] == [datetime.time(1, 2, 3)]
    out = c.sql("SELECT CAST('10:20:30' AS TIME) AS a,"
                " CAST(TIME '10:20:30' AS VARCHAR) AS s").to_pydict()
    assert out["a"] == [datetime.time(10, 20, 30)] and out["s"] == ["10:20:30"]
    out = c.sql("SELECT extract(hour FROM TIME '13:45:30') h,"
                " extract(second FROM TIME '13:45:30') s").to_pydict()
    assert out["h"] == [13] and out["s"] == [30]
    out = c.sql("SELECT to_time(CAST('2020-01-01 22:33:44' AS TIMESTAMP)) AS t").to_pydict()
    assert out["t"] == [datetime.time(22, 33, 44)]
    c.register_table("u", {"s": ["12:00:00", "01:30:00", "12:00:00"]})
    c.sql("CREATE TABLE v AS SELECT CAST(s AS TIME) AS tm FROM u").collect()
    out = c.sql("SELECT tm, count(*) c FROM v GROUP BY tm ORDER BY tm").to_pydict()
    assert out["tm"] == [datetime.time(1, 30), datetime.time(12, 0)]
    assert out["c"] == [1, 2]
    # arrow round-trip keeps time64
    at = c.sql("SELECT TIME '05:06:07' AS t").collect().to_arrow()
    import pyarrow as pa
    assert at.schema.field("t").type == pa.time64("us")


def test_subday_intervals():
    """INTERVAL hour/minute/second arithmetic on timestamps and RANGE frames
    (reference: IntervalDayTime, window RANGE with interval offsets)."""
    import datetime

    c = SessionContext()
    out = c.sql("SELECT CAST('2020-01-01 10:00:00' AS TIMESTAMP)"
                " + INTERVAL '90' minute AS ts,"
                " TIME '23:30:00' + INTERVAL '45' minute AS tt").to_pydict()
    assert out["ts"] == [datetime.datetime(2020, 1, 1, 11, 30)]
    assert out["tt"] == [datetime.time(0, 15)]
    c.register_table("ev", {"k": [1, 1, 1],
                            "t": ["2020-01-01 10:00:00", "2020-01-01 10:03:00",
                                  "2020-01-01 10:20:00"], "v": [1, 2, 3]})
    c.sql("CREATE TABLE e2 AS SELECT k, CAST(t AS TIMESTAMP) AS time, v FROM ev").collect()
    out = c.sql("""SELECT v, COUNT(v) OVER (PARTITION BY k ORDER BY time
      RANGE BETWEEN INTERVAL '5' minute PRECEDING AND CURRENT ROW) AS c
      FROM e2 ORDER BY time""").to_pydict()
    assert out["c"] == [1, 2, 1]


def test_named_window_clause():
    c = SessionContext()
    c.register_table("t", {"g": [1, 1, 2, 2], "v": [10.0, 20.0, 5.0, 7.0]})
    out = c.sql("""SELECT g, v, max(v) OVER w1 AS mx, row_number() OVER w2 AS rn
      FROM t WINDOW w1 AS (PARTITION BY g), w2 AS (ORDER BY v)
      ORDER BY g, v""").to_pydict()
    assert out["mx"] == [20.0, 20.0, 7.0, 7.0]
    assert out["rn"] == [3, 4, 1, 2]
