"""ClickBench: all 43 queries execute, 38 value-checked against a sqlite
differential oracle (BASELINE config #5: high-cardinality group-bys, string
filters, skewed keys)."""
import sqlite3

import numpy as np
import pandas as pd
import pytest

from datafusion_tpu.context import SessionContext
from datafusion_tpu.models.clickbench.datagen import generate_hits
from datafusion_tpu.models.clickbench.queries import QUERIES, query

N_ROWS = 20_000

# sqlite cannot run these: 18 extract(minute ...), 28 regexp_replace,
# 42 date_trunc; 36/37 are ORDER BY ... LIMIT with ties at the cutoff, so
# the retained rows are legitimately engine-dependent (both engines'
# results are valid answers).
SQLITE_SKIP = {18, 28, 36, 37, 42}


@pytest.fixture(scope="module")
def cb():
    t = generate_hits(N_ROWS)
    ctx = SessionContext()
    ctx.register_table("hits", t)
    return ctx, t.to_pandas()


@pytest.fixture(scope="module")
def cb_sqlite(cb):
    _, df = cb
    conn = sqlite3.connect(":memory:")
    conn.create_function("length", 1,
                         lambda s: len(s) if s is not None else None)
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c].dtype):
            fmt = ("%Y-%m-%d %H:%M:%S"
                   if (df[c].dt.hour.fillna(0) != 0).any() else "%Y-%m-%d")
            df[c] = df[c].dt.strftime(fmt).where(df[c].notna(), None)
    df.to_sql("hits", conn, index=False)
    yield conn
    conn.close()


@pytest.mark.parametrize("qid", range(len(QUERIES)))
def test_clickbench_query(cb, cb_sqlite, qid):
    """Execute; when sqlite can run the query too, the frames must agree
    (the TPC-DS differential-oracle discipline, models/tpcds/sqlite_oracle)."""
    from datafusion_tpu.models.tpcds.sqlite_oracle import (frames_match,
                                                           run_sqlite)

    ctx, _ = cb
    ours = ctx.sql(query(qid, N_ROWS)).to_pandas()
    assert ours is not None
    if qid in SQLITE_SKIP:
        return
    ref = run_sqlite(cb_sqlite, query(qid, N_ROWS))
    mismatch = frames_match(ours, ref, ordered=False)
    assert mismatch is None, mismatch


def test_oracle_counts_and_distinct(cb):
    ctx, df = cb
    out = ctx.sql(query(0, N_ROWS)).to_pydict()
    assert out[list(out)[0]] == [len(df)]
    out = ctx.sql(query(1, N_ROWS)).to_pydict()
    assert out[list(out)[0]] == [int((df.AdvEngineID != 0).sum())]
    out = ctx.sql(query(4, N_ROWS)).to_pydict()
    assert out[list(out)[0]] == [df.UserID.nunique()]
    out = ctx.sql(query(5, N_ROWS)).to_pydict()
    assert out[list(out)[0]] == [df.SearchPhrase.nunique()]


def test_oracle_topk_groupby(cb):
    ctx, df = cb
    out = ctx.sql(query(12, N_ROWS)).to_pydict()
    ref = (df[df.SearchPhrase != ""].groupby("SearchPhrase").size()
           .sort_values(ascending=False).head(10))
    assert out["c"] == ref.tolist()
    assert set(out["SearchPhrase"]) == set(ref.index)


def test_oracle_like_filter(cb):
    ctx, df = cb
    out = ctx.sql(query(20, N_ROWS)).to_pydict()
    assert out[list(out)[0]] == [int(df.URL.str.contains("example").sum())]


def test_oracle_skewed_user_counts(cb):
    ctx, df = cb
    out = ctx.sql(query(15, N_ROWS)).to_pydict()
    ref = df.groupby("UserID").size().sort_values(ascending=False).head(10)
    assert out["c"] == ref.tolist()


def test_oracle_date_window(cb):
    ctx, df = cb
    out = ctx.sql(query(36, N_ROWS)).to_pydict()
    d = df[(df.CounterID == 62)
           & (df.EventDate >= np.datetime64("2013-07-01"))
           & (df.EventDate <= np.datetime64("2013-07-31"))
           & (df.DontCountHits == 0) & (df.IsRefresh == 0) & (df.URL != "")]
    ref = d.groupby("URL").size().sort_values(ascending=False).head(10)
    assert out["pv"] == ref.tolist()
