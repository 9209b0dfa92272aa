"""Differential fuzzing against SQLite as an independent SQL oracle
(the reference fuzzes with SQLancer-style tooling and sqllogictest
comparisons against other engines; pandas-based oracles share our
translation blind spots, sqlite does not).

Deterministic seeds generate random tables (ints/floats/strings with
NULLs) and random queries over a dialect subset both engines agree on:
filters (comparisons, AND/OR, IS NULL, IN, BETWEEN), inner/left joins,
grouped aggregates (count/sum/min/max/avg, count distinct), ORDER BY
with explicit NULLS LAST, LIMIT. Results compare as multisets with
float tolerance."""
import math
import random
import sqlite3

import pytest

from datafusion_tpu.context import SessionContext

ROWS = 120


def _gen_tables(rng: random.Random):
    def ints():
        return [rng.choice([None, rng.randint(-5, 20)]) if rng.random() < 0.15
                else rng.randint(-5, 20) for _ in range(ROWS)]

    def floats():
        return [None if rng.random() < 0.1
                else round(rng.uniform(-50, 50), 3) for _ in range(ROWS)]

    def strings():
        words = ["red", "green", "blue", "teal", "gray", "pink"]
        return [None if rng.random() < 0.1 else rng.choice(words)
                for _ in range(ROWS)]

    t1 = {"a": ints(), "b": ints(), "x": floats(), "s": strings()}
    t2 = {"a": ints(), "c": ints(), "y": floats(), "t": strings()}
    return {"t1": t1, "t2": t2}


def _lit(rng):
    return rng.choice(["0", "3", "7", "-2", "15"])


def _pred(rng, cols):
    c = rng.choice(cols)
    kind = rng.random()
    if kind < 0.4:
        return f"{c} {rng.choice(['<', '<=', '>', '>=', '=', '<>'])} {_lit(rng)}"
    if kind < 0.55:
        return f"{c} IS {'NOT ' if rng.random() < 0.5 else ''}NULL"
    if kind < 0.75:
        return f"{c} IN ({_lit(rng)}, {_lit(rng)}, {_lit(rng)})"
    return f"{c} BETWEEN {rng.choice(['-2', '0', '2'])} AND {rng.choice(['5', '9', '18'])}"


def _where(rng, cols):
    preds = [_pred(rng, cols) for _ in range(rng.randint(1, 3))]
    return " AND ".join(preds) if rng.random() < 0.7 else " OR ".join(preds)


def _gen_query(rng: random.Random) -> str:
    joined = rng.random() < 0.4
    if joined:
        how = rng.choice(["JOIN", "LEFT JOIN"])
        frm = f"t1 {how} t2 ON t1.a = t2.a"
        icols = ["t1.a", "t1.b", "t2.c"]
        fcols = ["t1.x", "t2.y"]
    else:
        frm = "t1"
        icols = ["a", "b"]
        fcols = ["x"]
    grouped = rng.random() < 0.5
    if grouped:
        g = rng.choice(icols)
        aggs = rng.sample(
            [f"count(*)", f"count({icols[-1]})",
             f"count(DISTINCT {icols[0]})", f"sum({icols[-1]})",
             f"min({fcols[0]})", f"max({fcols[0]})", f"avg({fcols[-1]})"],
            k=rng.randint(1, 3))
        sel = [g] + aggs
        cols = ", ".join(f"{e} AS c{i}" for i, e in enumerate(sel))
        q = f"SELECT {cols} FROM {frm}"
        if rng.random() < 0.7:
            q += f" WHERE {_where(rng, icols + fcols)}"
        q += f" GROUP BY {g}"
        q += f" ORDER BY {g} ASC NULLS LAST"
        for i in range(1, len(sel)):
            q += f", c{i} ASC NULLS LAST"
    else:
        sel = rng.sample(icols + fcols, k=rng.randint(1, len(icols + fcols)))
        cols = ", ".join(f"{e} AS c{i}" for i, e in enumerate(sel))
        q = f"SELECT {cols} FROM {frm}"
        if rng.random() < 0.8:
            q += f" WHERE {_where(rng, icols + fcols)}"
        q += " ORDER BY " + ", ".join(
            f"c{i} ASC NULLS LAST" for i in range(len(sel)))
        if rng.random() < 0.3:
            q += f" LIMIT {rng.randint(1, 40)}"
    return q


def _norm(rows):
    out = []
    for r in rows:
        nr = []
        for v in r:
            if v is None:
                nr.append(None)
            elif isinstance(v, float):
                nr.append(round(v, 6))
            else:
                nr.append(v)
        out.append(tuple(nr))
    return out


def _close(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return abs(fa - fb) <= 1e-6 * max(1.0, abs(fa), abs(fb))
    return a == b


@pytest.mark.parametrize("seed", range(12))
def test_sqlite_differential(seed):
    rng = random.Random(seed * 7919 + 13)
    tables = _gen_tables(rng)

    ctx = SessionContext()
    con = sqlite3.connect(":memory:")
    con.execute("PRAGMA case_sensitive_like=ON")
    for name, data in tables.items():
        ctx.register_table(name, data)
        colnames = list(data)
        con.execute(f"CREATE TABLE {name} ({', '.join(colnames)})")
        rows = list(zip(*(data[c] for c in colnames)))
        con.executemany(
            f"INSERT INTO {name} VALUES ({', '.join('?' * len(colnames))})",
            rows)

    for qi in range(8):
        q = _gen_query(rng)
        got_d = ctx.sql(q).collect().to_pydict()
        names = list(got_d)
        got = _norm(list(zip(*(got_d[c] for c in names))) if names else [])
        want = _norm(con.execute(q).fetchall())
        assert len(got) == len(want), (q, len(got), len(want))
        # ORDER BY may leave ties: compare as sorted multisets
        keyf = lambda r: tuple((v is None, v if not isinstance(v, float)
                                else round(v, 5)) if v is not None
                               else (True, 0) for v in r)
        for g, w in zip(sorted(got, key=keyf), sorted(want, key=keyf)):
            assert len(g) == len(w) and all(
                _close(a, b) for a, b in zip(g, w)), (q, g, w)
