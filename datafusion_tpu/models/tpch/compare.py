"""Result comparison + cached answer files for TPC-H.

The analog of the reference's checked-in TPC-H answer fixtures
(datafusion/sqllogictest/test_files/tpch/answers/q*.slt.part): the pandas
reference implementation (queries_ref.py) is the oracle; its results are
cached as parquet answer files per scale factor so bench runs can
value-check every query without re-running pandas each time.

Comparison semantics: decimals/ints/strings/dates exact; floats to
rtol=1e-6/atol=1e-4 (matches the float tolerance the reference's
sqllogictest normalization allows); rows canonicalized by sorting unless the
query's ORDER BY fully determines the output order (LIMIT queries).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np
import pandas as pd

# queries whose LIMIT makes row order load-bearing
LIMIT_QUERIES = {2, 3, 10, 18, 21}

_ANSWER_DIR = os.path.join(os.path.dirname(__file__), "answers")


def _norm_col(s: pd.Series) -> pd.Series:
    if pd.api.types.is_datetime64_any_dtype(s.dtype):
        return s.astype("datetime64[s]")
    if pd.api.types.is_string_dtype(s.dtype) and s.dtype != object:
        return s.astype(object)
    return s


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Order-insensitive canonical form: positional columns, rows sorted
    (floats rounded for the sort key only)."""
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


def frames_diff(ours: pd.DataFrame, ref: pd.DataFrame,
                ordered: bool) -> Optional[str]:
    """None if equal (floats to tolerance), else a short mismatch message."""
    if len(ours.columns) != len(ref.columns):
        return f"column count {len(ours.columns)} vs {len(ref.columns)}"
    if len(ours) != len(ref):
        return f"row count {len(ours)} vs {len(ref)}"
    a, b = ours.copy(), ref.copy()
    a.columns = range(len(a.columns))
    b.columns = range(len(b.columns))
    if not ordered:
        a, b = canon(a), canon(b)
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
            if not ok.all():
                i = int(np.nonzero(~ok)[0][0])
                return (f"col {c} float mismatch at row {i}: "
                        f"{av.iloc[i]} vs {bv.iloc[i]}")
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                i = int(np.nonzero(~eq.values)[0][0])
                return (f"col {c} mismatch at row {i}: "
                        f"{av.iloc[i]!r} vs {bv.iloc[i]!r}")
    return None


def answer_path(qid: int, sf: float) -> str:
    return os.path.join(_ANSWER_DIR, f"sf{sf:g}", f"q{qid}.parquet")


def load_or_compute_answer(qid: int, sf: float,
                           pdt_factory) -> pd.DataFrame:
    """Load the cached oracle answer; compute via the pandas reference and
    cache it on first use. pdt_factory() -> dict of pandas tables (lazy so
    cached runs never pay the conversion)."""
    path = answer_path(qid, sf)
    if os.path.exists(path):
        return pd.read_parquet(path)
    from .queries_ref import ref_query

    ref = ref_query(qid, pdt_factory(), sf).reset_index(drop=True)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    ref.to_parquet(path)
    return ref
