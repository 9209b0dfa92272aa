"""Table functions in FROM position (reference: functions-table/src/
generate_series.rs + TableFunctionImpl, catalog/src/table.rs)."""
import pytest

from datafusion_tpu.common.errors import PlanError
from datafusion_tpu.context import SessionContext


@pytest.fixture()
def ctx():
    c = SessionContext()
    c.register_table("t", {"k": [1, 2, 3], "v": [10, 20, 30]})
    return c


def test_generate_series_inclusive(ctx):
    assert ctx.sql("SELECT * FROM generate_series(1, 5)").to_pydict() == \
        {"value": [1, 2, 3, 4, 5]}


def test_range_exclusive(ctx):
    assert ctx.sql("SELECT * FROM range(1, 5)").to_pydict() == \
        {"value": [1, 2, 3, 4]}


def test_negative_step_and_alias(ctx):
    out = ctx.sql("SELECT n*n sq FROM generate_series(10, 1, -3) AS t(n) "
                  "ORDER BY n").to_pydict()
    assert out == {"sq": [1, 16, 49, 100]}


def test_aggregate_over_series(ctx):
    assert ctx.sql("SELECT sum(value) s FROM range(100)").to_pydict()["s"] == [4950]


def test_join_with_table(ctx):
    out = ctx.sql("SELECT t.v FROM t JOIN generate_series(2, 3) g "
                  "ON t.k = g.value ORDER BY t.v").to_pydict()
    assert out == {"v": [20, 30]}


def test_registered_udtf(ctx):
    ctx.register_udtf("fib", lambda n: {"f": [1, 1, 2, 3, 5, 8, 13][:int(n)]})
    assert ctx.sql("SELECT * FROM fib(5)").to_pydict() == {"f": [1, 1, 2, 3, 5]}


def test_unknown_function_errors(ctx):
    with pytest.raises(PlanError, match="nosuch"):
        ctx.sql("SELECT * FROM nosuch(1)")


def test_zero_step_errors(ctx):
    with pytest.raises(PlanError, match="step"):
        ctx.sql("SELECT * FROM generate_series(1, 5, 0)")


def test_null_arg_empty(ctx):
    assert ctx.sql("SELECT * FROM generate_series(1, NULL)").to_pydict() == \
        {"value": []}
