"""ClickBench: all 43 queries execute; oracle spot-checks vs pandas
(BASELINE config #5: high-cardinality group-bys, string filters, skewed keys)."""
import numpy as np
import pandas as pd
import pytest

from datafusion_tpu.context import SessionContext
from datafusion_tpu.models.clickbench.datagen import generate_hits
from datafusion_tpu.models.clickbench.queries import QUERIES, query

N_ROWS = 20_000


@pytest.fixture(scope="module")
def cb():
    t = generate_hits(N_ROWS)
    ctx = SessionContext()
    ctx.register_table("hits", t)
    return ctx, t.to_pandas()


@pytest.mark.parametrize("qid", range(len(QUERIES)))
def test_clickbench_query_executes(cb, qid):
    ctx, _ = cb
    out = ctx.sql(query(qid, N_ROWS)).collect()
    assert out.num_rows >= 0  # executed without error


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
