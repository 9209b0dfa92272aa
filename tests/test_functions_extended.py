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
