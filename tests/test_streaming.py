"""Streaming / unbounded sources (reference: StreamingTableExec,
physical-plan/src/streaming.rs; Boundedness planning checks,
execution_plan.rs:1022; FIFO tests in core/tests/fifo/)."""
import itertools

import pytest

from datafusion_tpu.common import types as T
from datafusion_tpu.common.errors import PlanError
from datafusion_tpu.context import SessionContext

SCHEMA = {"k": T.INT64, "v": T.FLOAT64}


def bounded_batches():
    yield {"k": [1, 2, 3], "v": [1.0, 2.0, 3.0]}
    yield {"k": [4, 5], "v": [4.0, 5.0]}


def infinite_batches():
    for i in itertools.count():
        yield {"k": list(range(i * 10, i * 10 + 10)),
               "v": [float(x) for x in range(10)]}


def test_bounded_stream_full_query():
    ctx = SessionContext()
    ctx.register_streaming_table("s", bounded_batches, SCHEMA)
    out = ctx.sql("SELECT k, v FROM s ORDER BY k").to_pydict()
    assert out["k"] == [1, 2, 3, 4, 5]
    agg = ctx.sql("SELECT count(*) n, sum(v) sv FROM s").to_pydict()
    assert agg == {"n": [5], "sv": [15.0]}


def test_unbounded_limit_early_stops():
    ctx = SessionContext()
    ctx.register_streaming_table("s", infinite_batches, SCHEMA, unbounded=True)
    out = ctx.sql("SELECT k FROM s WHERE k % 2 = 0 LIMIT 4").to_pydict()
    assert out["k"] == [0, 2, 4, 6]


def test_unbounded_without_limit_rejected():
    ctx = SessionContext()
    ctx.register_streaming_table("s", infinite_batches, SCHEMA, unbounded=True)
    with pytest.raises(PlanError, match="unbounded"):
        ctx.sql("SELECT * FROM s").collect()
    with pytest.raises(PlanError, match="pipeline breaker|unbounded"):
        ctx.sql("SELECT k, count(*) FROM s GROUP BY k").collect()


def test_execute_stream_incremental():
    ctx = SessionContext()
    ctx.register_streaming_table("s", infinite_batches, SCHEMA, unbounded=True)
    df = ctx.sql("SELECT k FROM s WHERE k < 25")
    got = []
    for t in df.execute_stream(chunk_rows=8):
        got.extend(t.to_pydict()["k"])
        if len(got) >= 25:
            break  # the consumer decides when to stop an unbounded stream
    assert got[:25] == list(range(25))


def test_stream_joins_against_bounded_table():
    ctx = SessionContext()
    ctx.register_streaming_table("s", bounded_batches, SCHEMA)
    ctx.register_table("dim", {"k": [2, 4], "name": ["two", "four"]})
    out = ctx.sql(
        "SELECT s.k, name FROM s JOIN dim ON s.k = dim.k ORDER BY s.k"
    ).to_pydict()
    assert out == {"k": [2, 4], "name": ["two", "four"]}


def test_unbounded_build_side_rejected():
    ctx = SessionContext()
    ctx.register_streaming_table("s", infinite_batches, SCHEMA, unbounded=True)
    ctx.register_table("dim", {"k": [2, 4]})
    with pytest.raises(PlanError, match="unbounded|build side"):
        ctx.sql("SELECT dim.k FROM dim JOIN s ON dim.k = s.k").collect()


def test_symmetric_stream_stream_join():
    """INNER join of two unbounded streams runs incrementally via the
    symmetric join (reference: SymmetricHashJoinExec,
    joins/symmetric_hash_join.rs)."""
    from datafusion_tpu.common import types as T
    from datafusion_tpu.common.schema import Field, Schema
    from datafusion_tpu.context import SessionContext

    s1 = Schema([Field("k", T.INT64), Field("a", T.INT64)])
    s2 = Schema([Field("k2", T.INT64), Field("b", T.INT64)])

    def left_batches():
        for i in range(5):
            yield {"k": [i, i + 1, i + 2], "a": [10 * i, 10 * i + 1, 10 * i + 2]}

    def right_batches():
        for j in range(4):
            yield {"k2": [j, j + 5], "b": [100 * j, 100 * j + 5]}

    ctx = SessionContext()
    ctx.register_streaming_table("l", left_batches, s1, unbounded=True)
    ctx.register_streaming_table("r", right_batches, s2, unbounded=True)
    rows = []
    for t in ctx.sql("SELECT k, a, b FROM l JOIN r ON l.k = r.k2"
                     ).execute_stream(chunk_rows=4):
        d = t.to_pydict()
        rows.extend(zip(d["k"], d["a"], d["b"]))
    left = [(i + d, 10 * i + d) for i in range(5) for d in range(3)]
    right = [(j, 100 * j) for j in range(4)] + \
        [(j + 5, 100 * j + 5) for j in range(4)]
    want = sorted((k, a, b) for k, a in left for k2, b in right if k == k2)
    assert sorted(rows) == want

    got = ctx.sql("SELECT k FROM l JOIN r ON l.k = r.k2 LIMIT 3").to_pydict()
    assert len(got["k"]) == 3


def test_unbounded_outer_join_still_rejected():
    from datafusion_tpu.common import types as T
    from datafusion_tpu.common.errors import PlanError
    from datafusion_tpu.common.schema import Field, Schema
    from datafusion_tpu.context import SessionContext

    s1 = Schema([Field("k", T.INT64)])

    def batches():
        while True:
            yield {"k": [1, 2]}

    ctx = SessionContext()
    ctx.register_streaming_table("l", batches, s1, unbounded=True)
    ctx.register_streaming_table("r", batches, s1, unbounded=True)
    with pytest.raises(PlanError, match="unbounded"):
        list(ctx.sql("SELECT l.k FROM l LEFT JOIN r ON l.k = r.k"
                     ).execute_stream(chunk_rows=4))
