"""h2o db-benchmark workload, differential vs pandas (reference:
benchmarks/src/h2o.rs groupby/join suites)."""
import numpy as np
import pandas as pd
import pytest

from datafusion_tpu.context import SessionContext
from datafusion_tpu.models.h2o.datagen import generate_groupby, generate_join
from datafusion_tpu.models.h2o.queries import GROUPBY_QUERIES, JOIN_QUERIES

N = 20_000


@pytest.fixture(scope="module")
def gctx():
    t = generate_groupby(N, k=25)
    ctx = SessionContext()
    ctx.register_table("x", t)
    return ctx, t.to_pandas()


@pytest.fixture(scope="module")
def jctx():
    tables = generate_join(5_000)
    ctx = SessionContext()
    pdfs = {}
    for name, t in tables.items():
        ctx.register_table(name, t)
        pdfs[name] = t.to_pandas()
    return ctx, pdfs


def _norm(df):
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def _cmp(ours: pd.DataFrame, ref: pd.DataFrame):
    ours, ref = _norm(ours), _norm(ref)
    assert len(ours) == len(ref), (len(ours), len(ref))
    for c in ref.columns:
        a, b = ours[c].to_numpy(), ref[c].to_numpy()
        if isinstance(b.dtype, np.dtype) and np.issubdtype(b.dtype, np.floating):
            np.testing.assert_allclose(a.astype(float), b, rtol=1e-9, atol=1e-9)
        else:
            assert (a == b).all(), c


def test_h2o_groupby_q1(gctx):
    ctx, pdf = gctx
    ours = ctx.sql(GROUPBY_QUERIES[0]).to_pandas()
    ref = pdf.groupby("id1", as_index=False).agg(v1=("v1", "sum"))
    _cmp(ours, ref)


def test_h2o_groupby_q2(gctx):
    ctx, pdf = gctx
    ours = ctx.sql(GROUPBY_QUERIES[1]).to_pandas()
    ref = pdf.groupby(["id1", "id2"], as_index=False).agg(v1=("v1", "sum"))
    _cmp(ours, ref)


def test_h2o_groupby_q3(gctx):
    ctx, pdf = gctx
    ours = ctx.sql(GROUPBY_QUERIES[2]).to_pandas()
    ref = pdf.groupby("id3", as_index=False).agg(v1=("v1", "sum"),
                                                 v3=("v3", "mean"))
    _cmp(ours, ref)


def test_h2o_groupby_q4(gctx):
    ctx, pdf = gctx
    ours = ctx.sql(GROUPBY_QUERIES[3]).to_pandas()
    ref = pdf.groupby("id4", as_index=False).agg(v1=("v1", "mean"),
                                                 v2=("v2", "mean"),
                                                 v3=("v3", "mean"))
    _cmp(ours, ref)


def test_h2o_groupby_q5(gctx):
    ctx, pdf = gctx
    ours = ctx.sql(GROUPBY_QUERIES[4]).to_pandas()
    ref = pdf.groupby("id6", as_index=False).agg(v1=("v1", "sum"),
                                                 v2=("v2", "sum"),
                                                 v3=("v3", "sum"))
    _cmp(ours, ref)


def test_h2o_groupby_q6(gctx):
    ctx, pdf = gctx
    ours = ctx.sql(GROUPBY_QUERIES[5]).to_pandas()
    ref = pdf.groupby(["id4", "id5"], as_index=False).agg(
        median_v3=("v3", "median"), sd_v3=("v3", "std"))
    _cmp(ours, ref)


def test_h2o_groupby_q7(gctx):
    ctx, pdf = gctx
    ours = ctx.sql(GROUPBY_QUERIES[6]).to_pandas()
    g = pdf.groupby("id3", as_index=False)
    ref = g.agg(mx=("v1", "max"), mn=("v2", "min"))
    ref["range_v1_v2"] = ref.pop("mx") - ref.pop("mn")
    _cmp(ours, ref)


def test_h2o_groupby_q8(gctx):
    ctx, pdf = gctx
    ours = ctx.sql(GROUPBY_QUERIES[7]).to_pandas()
    ref = (pdf.sort_values("v3", ascending=False).groupby("id6")
           .head(2)[["id6", "v3"]].rename(columns={"v3": "largest2_v3"}))
    _cmp(ours, ref)


def test_h2o_groupby_q9(gctx):
    ctx, pdf = gctx
    ours = ctx.sql(GROUPBY_QUERIES[8]).to_pandas()
    def r2(g):
        c = np.corrcoef(g["v1"], g["v2"])[0, 1]
        return c * c
    ref = (pdf.groupby(["id2", "id4"]).apply(r2, include_groups=False)
           .reset_index(name="r2"))
    _cmp(ours, ref)


def test_h2o_groupby_q10(gctx):
    ctx, pdf = gctx
    ours = ctx.sql(GROUPBY_QUERIES[9]).to_pandas()
    ref = pdf.groupby(["id1", "id2", "id3", "id4", "id5", "id6"],
                      as_index=False).agg(v3=("v3", "sum"), cnt=("v1", "size"))
    _cmp(ours, ref)


@pytest.mark.parametrize("qid", range(len(JOIN_QUERIES)))
def test_h2o_joins(jctx, qid):
    ctx, pdfs = jctx
    ours = ctx.sql(JOIN_QUERIES[qid]).to_pandas()
    x = pdfs["x"]
    if qid == 0:
        ref = x.merge(pdfs["small"], left_on="id1", right_on="id")
        ref = ref[["id1", "v1", "v"]].rename(columns={"v": "v2"})
    elif qid in (1, 3):
        ref = x.merge(pdfs["medium"], left_on="id2", right_on="id")
        ref = ref[["id2", "v1", "v"]].rename(columns={"v": "v2"})
    elif qid == 2:
        ref = x.merge(pdfs["medium"], left_on="id2", right_on="id", how="left")
        ref = ref[["id2", "v1", "v"]].rename(columns={"v": "v2"})
    else:
        ref = x.merge(pdfs["big"], left_on="id3", right_on="id")
        ref = ref[["id3", "v1", "v"]].rename(columns={"v": "v2"})
    _cmp(ours, ref)
