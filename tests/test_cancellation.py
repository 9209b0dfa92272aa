"""Cancellation / timeout (reference analog: stream-drop cancellation and
the cancellation benchmark, benchmarks/src/cancellation.rs). Cooperative:
checks run at every operator dispatch, scan chunk, and recursion step."""
import threading

import pytest

from datafusion_tpu.common.errors import QueryCancelled
from datafusion_tpu.context import SessionContext

SLOW = ("WITH RECURSIVE s(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM s "
        "WHERE n < 99) SELECT count(*) c FROM s")


def test_timeout_cancels():
    ctx = SessionContext()
    ctx.config["execution.timeout_seconds"] = 1e-4
    with pytest.raises(QueryCancelled, match="timeout"):
        ctx.sql(SLOW).collect()


def test_interrupt_cancels():
    ctx = SessionContext()
    df = ctx.sql(SLOW)
    t = threading.Timer(0.03, ctx.interrupt)
    t.start()
    try:
        with pytest.raises(QueryCancelled, match="interrupt"):
            df.collect()
    finally:
        t.cancel()


def test_next_query_runs_after_interrupt():
    ctx = SessionContext()
    ctx.interrupt()  # stale interrupt must not poison the next query
    assert ctx.sql("SELECT 1 + 1 AS x").collect().to_pydict() == {"x": [2]}
