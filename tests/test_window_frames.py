"""Window frame clauses (ROWS / RANGE / GROUPS BETWEEN) — differential vs a
Python row-at-a-time oracle, including NULL arguments, NULL order keys,
DESC ordering, and a randomized fuzz sweep.

Reference semantics: datafusion/expr/src/window_frame.rs +
physical-plan/src/windows/window_agg_exec.rs; test strategy mirrors the
reference's window.slt frame cases (SURVEY.md §4)."""
import math

import numpy as np
import pandas as pd
import pytest

from datafusion_tpu.context import SessionContext


def _oracle_frames(sub: pd.DataFrame, units: str, s_kind: str, s_off, e_kind, e_off,
                   key: str = "k", desc: bool = False):
    """Yield, for each row of the (already partition-sorted) frame, the list of
    positional indices inside the frame."""
    n = len(sub)
    keys = sub[key].tolist()

    def peers(i):
        lo = i
        while lo > 0 and _eq(keys[lo - 1], keys[i]):
            lo -= 1
        hi = i
        while hi < n - 1 and _eq(keys[hi + 1], keys[i]):
            hi += 1
        return lo, hi

    def _eq(a, b):
        if a is None or (isinstance(a, float) and math.isnan(a)):
            return b is None or (isinstance(b, float) and math.isnan(b))
        if b is None or (isinstance(b, float) and math.isnan(b)):
            return False
        return a == b

    # group (peer-run) ids for GROUPS
    gid = [0] * n
    for i in range(1, n):
        gid[i] = gid[i - 1] + (0 if _eq(keys[i], keys[i - 1]) else 1)

    out = []
    for i in range(n):
        if units == "rows":
            lo = 0 if s_kind == "unbounded_preceding" else (
                i if s_kind == "current_row" else
                i - s_off if s_kind == "preceding" else i + s_off)
            hi = n - 1 if e_kind == "unbounded_following" else (
                i if e_kind == "current_row" else
                i - e_off if e_kind == "preceding" else i + e_off)
        elif units == "groups":
            tgt_lo = gid[i] - s_off if s_kind == "preceding" else (
                gid[i] + s_off if s_kind == "following" else None)
            tgt_hi = gid[i] - e_off if e_kind == "preceding" else (
                gid[i] + e_off if e_kind == "following" else None)
            if s_kind == "unbounded_preceding":
                lo = 0
            elif s_kind == "current_row":
                lo = peers(i)[0]
            else:
                lo = next((j for j in range(n) if gid[j] == tgt_lo), None)
                if lo is None:
                    lo = 0 if tgt_lo < 0 else n  # empty when past the end
            if e_kind == "unbounded_following":
                hi = n - 1
            elif e_kind == "current_row":
                hi = peers(i)[1]
            else:
                hi = next((j for j in range(n - 1, -1, -1) if gid[j] == tgt_hi), None)
                if hi is None:
                    hi = n - 1 if tgt_hi > gid[-1] else -1
        else:  # range
            # Total-order semantics: null keys are parked at the end they sort
            # to (nulls-last → +inf for ASC, -inf for DESC), matching the
            # engine's (and the reference's row-comparator bisect) behavior.
            sent = (math.inf if not desc else -math.inf)
            pk = [sent if (x is None or (isinstance(x, float) and math.isnan(x)))
                  else x for x in keys]
            k = pk[i]
            isnull = math.isinf(k)
            if s_kind == "unbounded_preceding":
                lo = 0
            elif s_kind == "current_row" or isnull:
                lo = peers(i)[0]
            else:
                d = s_off if s_kind == "preceding" else -s_off
                bnd = k - d if not desc else k + d
                if not desc:
                    lo = next((j for j in range(n) if pk[j] >= bnd), n)
                else:
                    lo = next((j for j in range(n) if pk[j] <= bnd), n)
            if e_kind == "unbounded_following":
                hi = n - 1
            elif e_kind == "current_row" or isnull:
                hi = peers(i)[1]
            else:
                d = e_off if e_kind == "following" else -e_off
                bnd = k + d if not desc else k - d
                if not desc:
                    hi = next((j for j in range(n - 1, -1, -1) if pk[j] <= bnd), -1)
                else:
                    hi = next((j for j in range(n - 1, -1, -1) if pk[j] >= bnd), -1)
        lo, hi = max(lo, 0), min(hi, n - 1)
        out.append(list(range(lo, hi + 1)) if lo <= hi else [])
    return out


def _agg(vals, idxs, fn):
    xs = [vals[j] for j in idxs]
    live = [x for x in xs if x is not None and not (isinstance(x, float) and math.isnan(x))]
    if fn == "count":
        return len(live)
    if not live:
        return None
    if fn == "sum":
        return sum(live)
    if fn == "avg":
        return sum(live) / len(live)
    if fn == "min":
        return min(live)
    if fn == "max":
        return max(live)
    raise AssertionError(fn)


def _run(ctx, sql):
    return ctx.sql(sql).to_pandas()


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    n = 61
    df = pd.DataFrame({
        "g": rng.integers(0, 4, n),
        "k": rng.integers(0, 15, n).astype(float),
        "v": rng.normal(size=n).round(3),
        "id": np.arange(n),
    })
    # sprinkle NULLs into v and k
    df.loc[rng.choice(n, 8, replace=False), "v"] = np.nan
    df.loc[rng.choice(n, 5, replace=False), "k"] = np.nan
    return df


@pytest.fixture(scope="module")
def ctx(data):
    c = SessionContext()
    c.register_table("t", data)
    return c


def _check(ctx, data, units, s_kind, s_off, e_kind, e_off, fn="sum", desc=False):
    def bsql(kind, off):
        return {"unbounded_preceding": "UNBOUNDED PRECEDING",
                "current_row": "CURRENT ROW",
                "unbounded_following": "UNBOUNDED FOLLOWING",
                "preceding": f"{off} PRECEDING",
                "following": f"{off} FOLLOWING"}[kind]
    order = f"k {'DESC' if desc else 'ASC'}, id" if units == "rows" else (
        f"k {'DESC' if desc else 'ASC'}")
    frame = f"{units.upper()} BETWEEN {bsql(s_kind, s_off)} AND {bsql(e_kind, e_off)}"
    sql = (f"SELECT id, {fn}(v) OVER (PARTITION BY g ORDER BY {order} {frame}) AS o "
           f"FROM t ORDER BY id")
    ours = _run(ctx, sql).set_index("id")["o"]

    want = {}
    for g, sub in data.groupby("g"):
        sub = sub.sort_values(["k", "id"], ascending=[not desc, True],
                              na_position="last").reset_index(drop=True)
        vals = [None if (isinstance(x, float) and math.isnan(x)) else x
                for x in sub["v"].tolist()]
        keys_nn = [None if (isinstance(x, float) and math.isnan(x)) else x
                   for x in sub["k"].tolist()]
        sub2 = sub.copy()
        sub2["k"] = keys_nn
        frames = _oracle_frames(sub2, units, s_kind, s_off, e_kind, e_off, desc=desc)
        for i, idxs in enumerate(frames):
            want[int(sub["id"].iloc[i])] = _agg(vals, idxs, fn)

    for rid in data["id"]:
        got = ours.loc[rid]
        exp = want[int(rid)]
        if exp is None:
            assert got is None or (isinstance(got, float) and math.isnan(got)), \
                (units, fn, rid, got)
        else:
            assert got is not None and abs(float(got) - exp) < 1e-9, \
                (units, fn, rid, float(got), exp)


def test_rows_frames_all_aggs(ctx, data):
    for fn in ("sum", "count", "avg", "min", "max"):
        _check(ctx, data, "rows", "preceding", 2, "following", 1, fn)


def test_rows_unbounded_and_shifted(ctx, data):
    _check(ctx, data, "rows", "unbounded_preceding", None, "following", 2)
    _check(ctx, data, "rows", "preceding", 3, "unbounded_following", None)
    _check(ctx, data, "rows", "following", 1, "following", 3)   # frame ahead of row
    _check(ctx, data, "rows", "preceding", 4, "preceding", 2)   # frame behind row
    _check(ctx, data, "rows", "current_row", None, "current_row", None)


def test_range_offset_frames(ctx, data):
    for fn in ("sum", "count", "min", "max"):
        _check(ctx, data, "range", "preceding", 3, "following", 2, fn)
    _check(ctx, data, "range", "preceding", 2, "current_row", None)
    _check(ctx, data, "range", "current_row", None, "following", 4)


def test_range_desc_order(ctx, data):
    _check(ctx, data, "range", "preceding", 3, "following", 2, "sum", desc=True)
    _check(ctx, data, "range", "preceding", 2, "current_row", None, "count", desc=True)


def test_groups_frames(ctx, data):
    for fn in ("sum", "count"):
        _check(ctx, data, "groups", "preceding", 1, "following", 1, fn)
    _check(ctx, data, "groups", "unbounded_preceding", None, "current_row", None)
    _check(ctx, data, "groups", "current_row", None, "following", 2)


def test_frame_fuzz(ctx, data):
    rng = np.random.default_rng(11)
    kinds = ["unbounded_preceding", "preceding", "current_row", "following"]
    for trial in range(12):
        units = ["rows", "range", "groups"][trial % 3]
        s_kind = kinds[rng.integers(0, 4)]
        e_choices = ["preceding", "current_row", "following", "unbounded_following"]
        e_kind = e_choices[rng.integers(0, 4)]
        s_off = int(rng.integers(0, 5)) if s_kind in ("preceding", "following") else None
        e_off = int(rng.integers(0, 5)) if e_kind in ("preceding", "following") else None
        fn = ["sum", "count", "min", "max", "avg"][int(rng.integers(0, 5))]
        _check(ctx, data, units, s_kind, s_off, e_kind, e_off, fn)


def test_first_last_nth_with_frame():
    c = SessionContext()
    c.register_table("t", {"g": [1, 1, 1, 1, 2, 2], "x": [10, 20, 30, 40, 5, 6],
                           "id": [1, 2, 3, 4, 5, 6]})
    out = c.sql("""
        SELECT id,
          first_value(x) OVER (PARTITION BY g ORDER BY id
                               ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS fv,
          last_value(x)  OVER (PARTITION BY g ORDER BY id
                               ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS lv,
          nth_value(x, 2) OVER (PARTITION BY g ORDER BY id
                               ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS nv
        FROM t ORDER BY id""").to_pydict()
    assert out["fv"] == [10, 10, 20, 30, 5, 5]
    assert out["lv"] == [20, 30, 40, 40, 6, 6]
    assert out["nv"] == [20, 20, 30, 40, 6, 6]


def test_default_frame_unchanged():
    # no frame clause → running (RANGE UNBOUNDED PRECEDING..CURRENT ROW)
    c = SessionContext()
    c.register_table("t", {"x": [1, 2, 2, 3]})
    out = c.sql("SELECT sum(x) OVER (ORDER BY x) AS s FROM t ORDER BY x").to_pydict()
    assert out["s"] == [1, 5, 5, 8]


def test_frame_sql_roundtrip():
    from datafusion_tpu.logical.serde import plan_to_json, plan_from_json
    from datafusion_tpu.sql.unparser import plan_to_sql
    c = SessionContext()
    c.register_table("t", {"g": [1, 1], "x": [1, 2]})
    sql = ("SELECT sum(x) OVER (PARTITION BY g ORDER BY x "
           "ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING) AS s FROM t")
    df = c.sql(sql)
    plan = df.logical_plan()
    assert "ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING" in plan_to_sql(plan)
    # JSON serde preserves the frame
    plan2 = plan_from_json(plan_to_json(plan), c.catalog)
    assert "ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING" in plan_to_sql(plan2)
    assert c.sql(sql).to_pydict()["s"] == [3, 3]
