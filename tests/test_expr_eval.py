import numpy as np
import pytest

from datafusion_tpu.common import types as T
from datafusion_tpu.data.device import to_device
from datafusion_tpu.data.table import Table
from datafusion_tpu.expr import nodes as E
from datafusion_tpu.expr.nodes import col, lit
from datafusion_tpu.physical.expr_compiler import eval_expr, eval_predicate


def rel_of(data, types=None):
    return to_device(Table.from_pydict(data, types))


def live(rel, colv):
    sel = np.asarray(rel.sel)
    out = np.asarray(colv.data)[sel]
    if colv.validity is not None:
        v = np.asarray(colv.validity)[sel]
        return [d if vv else None for d, vv in zip(out.tolist(), v.tolist())]
    return out.tolist()


def test_arithmetic_and_comparison():
    rel = rel_of({"a": [1, 2, 3], "b": [10.0, 20.0, 30.0]})
    c = eval_expr(col("a") + col("b"), rel)
    assert c.dtype == T.FLOAT64
    assert live(rel, c) == [11.0, 22.0, 33.0]
    p = eval_predicate(col("a") > 1, rel)
    assert np.asarray(p)[np.asarray(rel.sel)].tolist() == [False, True, True]


def test_decimal_arith():
    rel = rel_of({"p": [10.00, 20.00], "d": [0.05, 0.10]},
                 {"p": T.decimal(15, 2), "d": T.decimal(15, 2)})
    e = col("p") * (lit(1.0, T.decimal(15, 2)) - col("d"))
    c = eval_expr(e, rel)
    assert c.dtype.is_decimal and c.dtype.scale == 4
    assert live(rel, c) == [95000, 180000]  # 9.50, 18.00 at scale 4


def test_null_propagation_and_3vl():
    rel = rel_of({"a": [1, None, 3], "b": [True, None, False]})
    c = eval_expr(col("a") + lit(1), rel)
    assert live(rel, c) == [2, None, 4]
    both = eval_expr(col("b") | (col("a") > 0), rel)
    assert live(rel, both) == [True, None, True]  # null OR null = null
    tr = eval_expr(col("b") | lit(True), rel)
    assert live(rel, tr) == [True, True, True]  # null OR true = true
    a = eval_expr(col("b") & lit(True), rel)
    assert live(rel, a) == [True, None, False]


def test_string_compare_and_like():
    rel = rel_of({"s": ["apple", "banana", "cherry"]})
    assert live(rel, eval_expr(col("s").eq(lit("banana")), rel)) == [False, True, False]
    assert live(rel, eval_expr(col("s") > lit("b"), rel)) == [False, True, True]
    lk = eval_expr(E.Like(col("s"), lit("%an%")), rel)
    assert live(rel, lk) == [False, True, False]


def test_case_and_inlist():
    rel = rel_of({"x": [1, 2, 3, 4]})
    e = E.Case(None, ((col("x") < 2, lit(10)), (col("x") < 4, lit(20))), lit(0))
    assert live(rel, eval_expr(e, rel)) == [10, 20, 20, 0]
    inl = E.InList(col("x"), (lit(2), lit(4)), False)
    assert live(rel, eval_expr(inl, rel)) == [False, True, False, True]


def test_dates_extract_and_interval():
    rel = rel_of({"d": ["1994-01-15", "1996-12-31"]}, None)
    # ingest as strings then cast
    dcol = eval_expr(E.Cast(col("d"), T.DATE32), rel)
    assert np.asarray(dcol.data)[:2].tolist() == [
        (np.datetime64("1994-01-15") - np.datetime64("1970-01-01")).astype(int),
        (np.datetime64("1996-12-31") - np.datetime64("1970-01-01")).astype(int),
    ]
    yr = eval_expr(E.ScalarFunction("year", (E.Cast(col("d"), T.DATE32),)), rel)
    assert live(rel, yr) == [1994, 1996]
    plus = eval_expr(
        E.BinaryOp(E.Op.ADD, E.Cast(col("d"), T.DATE32), lit(17, T.INTERVAL_DAYS)),
        rel,
    )
    y2, m2, dd2 = [int(x) for x in np.asarray(plus.data)[:1]], None, None
    from datafusion_tpu.utils.dates import civil_from_days
    import jax.numpy as jnp
    y, m, d = civil_from_days(jnp.asarray(plus.data[:2]))
    assert (np.asarray(y).tolist(), np.asarray(m).tolist(), np.asarray(d).tolist()) == (
        [1994, 1997], [2, 1], [1, 17])


def test_substring_and_functions():
    rel = rel_of({"phone": ["13-555-123", "31-777-456", "13-999-000"]})
    sub = eval_expr(E.ScalarFunction("substr", (col("phone"), lit(1), lit(2))), rel)
    assert sub.dtype.is_string
    vals = [sub.dictionary.values[c] for c in np.asarray(sub.data)[:3]]
    assert vals == ["13", "31", "13"]
