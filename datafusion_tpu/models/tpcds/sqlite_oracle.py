"""SQLite as an independent differential oracle for TPC-DS execution.

The reference checks TPC benchmark answers against committed fixtures
(sqllogictest/test_files/tpch/answers) and runs a postgres differential for
compatibility files (SURVEY.md §4). We have no dsdgen answer fixtures, so the
oracle is a second, unrelated SQL engine: the same generated data (datagen.py)
is loaded into sqlite and every supported query's result frames are compared
(floats to tolerance, rows canonicalized).

Queries are transpiled only where sqlite lacks the syntax:
  * `cast('d' as date) +/- INTERVAL 'n days'` -> `date('d', '+n days')`
    (DATE32 columns surface as ISO text in sqlite, which compares
    lexicographically, so date arithmetic stays correct);
  * `cast(x as decimal(p,s))` -> `cast(x as real)` (sqlite NUMERIC affinity
    would keep integer division semantics);
  * ROLLUP / GROUPING / stddev queries are out of oracle scope (sqlite has
    no equivalents) -- those shapes are covered by the engine's own SLT and
    fuzz suites instead.
"""
from __future__ import annotations

import re
import sqlite3
from typing import Dict, Optional

import numpy as np
import pandas as pd


def _pad_date(d: str) -> str:
    y, m, day = d.split("-")
    return f"{y}-{int(m):02d}-{int(day):02d}"


def to_sqlite_sql(sql: str) -> str:
    # strip the license header comment lines
    sql = "\n".join(l for l in sql.splitlines()
                    if not l.strip().startswith("--"))

    def interval_repl(m):
        return f"date('{_pad_date(m.group(1))}', '{m.group(2)}{m.group(3)} days')"

    sql = re.sub(
        r"cast\s*\(\s*'([0-9-]+)'\s+as\s+date\s*\)\s*([+-])\s*"
        r"INTERVAL\s*'(\d+)\s*days?'",
        interval_repl, sql, flags=re.IGNORECASE)
    sql = re.sub(
        r"cast\s*\(\s*'([0-9-]+)'\s+as\s+date\s*\)\s*([+-])\s*(\d+)\s+days?",
        interval_repl, sql, flags=re.IGNORECASE)
    sql = re.sub(r"cast\s*\(\s*'([0-9-]+)'\s+as\s+date\s*\)",
                 lambda m: f"date('{_pad_date(m.group(1))}')", sql,
                 flags=re.IGNORECASE)
    # (d_date + 5) day arithmetic on columns: sqlite date(col, '+5 days')
    sql = re.sub(r"\(\s*([\w.]+)\s*\+\s*(\d+)\s+days?\s*\)",
                 r"date(\1, '+\2 days')", sql, flags=re.IGNORECASE)
    sql = re.sub(r"\bas\s+decimal\s*\(\s*\d+\s*,\s*\d+\s*\)", "as real", sql,
                 flags=re.IGNORECASE)
    sql = re.sub(r"\bas\s+decimal\b", "as real", sql, flags=re.IGNORECASE)
    # bare date literals must be zero-padded: DATE32 columns are ISO text in
    # sqlite and compare lexicographically ('1999-2-01' > '1999-02-01')
    sql = re.sub(r"'(\d{4})-(\d{1,2})-(\d{1,2})'",
                 lambda m: f"'{m.group(1)}-{int(m.group(2)):02d}-{int(m.group(3)):02d}'",
                 sql)
    return sql


def load_sqlite(tables: Dict) -> sqlite3.Connection:
    """Load generated Tables into an in-memory sqlite database. DATE32
    columns become ISO text (lexicographically date-ordered); decimals
    become floats."""
    conn = sqlite3.connect(":memory:")
    for name, t in tables.items():
        df = t.to_pandas()
        for c in df.columns:
            if pd.api.types.is_datetime64_any_dtype(df[c].dtype):
                s = df[c].dt.strftime("%Y-%m-%d")
                df[c] = s.where(df[c].notna(), None)
        df.to_sql(name, conn, index=False)
    return conn


def run_sqlite(conn: sqlite3.Connection, sql: str) -> pd.DataFrame:
    return pd.read_sql_query(to_sqlite_sql(sql), conn)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Shared canonical form for engine/sqlite frames: positional column
    names (duplicate output names are legal SQL), dates as ISO strings."""
    df = df.copy()
    df.columns = range(len(df.columns))
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s.dtype):
            df[c] = s.dt.strftime("%Y-%m-%d").where(s.notna(), None)
    return df


def frames_match(ours: pd.DataFrame, ref: pd.DataFrame,
                 ordered: bool = False) -> Optional[str]:
    """None when frames agree (column-positional, floats to 1e-6 rtol);
    otherwise a short mismatch description."""
    from ..tpch.compare import frames_diff

    a, b = normalize(ours), normalize(ref)
    # unify numeric column dtypes: sqlite returns int64 where we produce
    # float (avg of ints) and vice versa
    for i in range(min(len(a.columns), len(b.columns))):
        ca, cb = a.columns[i], b.columns[i]
        na = pd.api.types.is_numeric_dtype(a[ca].dtype)
        nb = pd.api.types.is_numeric_dtype(b[cb].dtype)
        if na and nb and a[ca].dtype != b[cb].dtype:
            a[ca] = a[ca].astype(np.float64)
            b[cb] = b[cb].astype(np.float64)
    return frames_diff(a, b, ordered=ordered)
