"""TPC-H differential tests: engine vs pandas reference on generated data
(SF 0.01). The analog of the reference's sqllogictest TPC-H answer files +
fuzz differential runs (SURVEY.md §4)."""
import numpy as np
import pandas as pd
import pytest

from datafusion_tpu.context import SessionContext
from datafusion_tpu.models.tpch.datagen import generate_tpch
from datafusion_tpu.models.tpch.queries import ALL_QUERY_IDS, query
from datafusion_tpu.models.tpch.queries_ref import ref_query

import os

SF = float(os.environ.get("TPCH_TEST_SF", "0.01"))


@pytest.fixture(scope="module")
def tpch():
    tables = generate_tpch(SF)
    ctx = SessionContext()
    for name, t in tables.items():
        ctx.register_table(name, t)
    pdt = {name: t.to_pandas() for name, t in tables.items()}
    return ctx, pdt


def _norm_col(s: pd.Series) -> pd.Series:
    if pd.api.types.is_datetime64_any_dtype(s.dtype):
        return s.astype("datetime64[s]")
    if pd.api.types.is_string_dtype(s.dtype) and s.dtype != object:
        return s.astype(object)
    return s


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = range(len(df.columns))
    for c in df.columns:
        df[c] = _norm_col(df[c])
    sort_cols = []
    for c in df.columns:
        if df[c].dtype == np.float64:
            df[f"_r{c}"] = df[c].round(4)
            sort_cols.append(f"_r{c}")
        else:
            sort_cols.append(c)
    df = df.sort_values(sort_cols, kind="stable").reset_index(drop=True)
    return df[[c for c in df.columns if not str(c).startswith("_r")]]


def assert_frames_match(ours: pd.DataFrame, ref: pd.DataFrame, ordered: bool, qid: int):
    assert len(ours.columns) == len(ref.columns), (
        f"q{qid}: column count {len(ours.columns)} vs {len(ref.columns)}"
    )
    assert len(ours) == len(ref), f"q{qid}: row count {len(ours)} vs {len(ref)}"
    a = ours.copy()
    b = ref.copy()
    a.columns = range(len(a.columns))
    b.columns = range(len(b.columns))
    if not ordered:
        a, b = _canon(a), _canon(b)
    else:
        for c in a.columns:
            a[c] = _norm_col(a[c])
            b[c] = _norm_col(b[c])
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype == np.float64 or bv.dtype == np.float64:
            av = av.astype(np.float64)
            bv = bv.astype(np.float64)
            ok = np.isclose(av, bv, rtol=1e-6, atol=1e-4, equal_nan=True)
            assert ok.all(), (
                f"q{qid} col {c}: float mismatch at rows "
                f"{np.nonzero(~ok)[0][:5]}: {av[~ok].head(3).tolist()} vs {bv[~ok].head(3).tolist()}"
            )
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            assert eq.all(), (
                f"q{qid} col {c}: mismatch at rows {np.nonzero(~eq.values)[0][:5]}: "
                f"{av[~eq].head(3).tolist()} vs {bv[~eq].head(3).tolist()}"
            )


LIMIT_QUERIES = {2, 3, 10, 18, 21}


@pytest.mark.parametrize("qid", ALL_QUERY_IDS)
def test_tpch_query(tpch, qid):
    ctx, pdt = tpch
    sql = query(qid, SF)
    ours = ctx.sql(sql).to_pandas()
    ref = ref_query(qid, pdt, SF)
    assert_frames_match(ours, ref, ordered=qid in LIMIT_QUERIES, qid=qid)
