"""Differential fuzzing vs pandas (the reference's fuzz_cases analog:
aggregation_fuzzer/, join_fuzz.rs, sort_fuzz.rs under
datafusion/core/tests/fuzz_cases/). Random data incl. NULLs and strings runs
through the engine and through pandas; results must agree."""
import numpy as np
import pandas as pd
import pytest

from datafusion_tpu.context import SessionContext
from datafusion_tpu.expr import nodes as E
from datafusion_tpu.expr.nodes import col


def random_table(rng, n, null_frac=0.1):
    def maybe_null(vals):
        out = list(vals)
        for i in np.nonzero(rng.random(n) < null_frac)[0]:
            out[i] = None
        return out

    return {
        "k1": rng.integers(0, 8, n).tolist(),
        "k2": maybe_null(rng.choice(["x", "y", "z", "w"], n).tolist()),
        "v1": maybe_null(rng.integers(-100, 100, n).tolist()),
        "v2": maybe_null(np.round(rng.random(n) * 100, 3).tolist()),
    }


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_aggregation(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(50, 400))
    data = random_table(rng, n)
    ctx = SessionContext()
    ctx.register_table("t", data)
    df = pd.DataFrame(data)

    out = ctx.sql("""
        SELECT k1, k2, count(*) AS n, count(v1) AS c1, sum(v1) AS s1,
               min(v2) AS mn, max(v2) AS mx, avg(v2) AS av
        FROM t GROUP BY k1, k2 ORDER BY k1, k2
    """).to_pandas()

    g = df.groupby(["k1", "k2"], dropna=False, as_index=False).agg(
        n=("k1", "size"), c1=("v1", "count"), s1=("v1", "sum"),
        mn=("v2", "min"), mx=("v2", "max"), av=("v2", "mean"))
    g["k2"] = g.k2.astype(object).where(pd.notna(g.k2), None)
    g = g.sort_values(["k1", "k2"], na_position="last").reset_index(drop=True)

    def norm(xs):
        return [None if pd.isna(x) else x for x in xs]

    assert len(out) == len(g), f"rows {len(out)} vs {len(g)}"
    assert out.k1.tolist() == g.k1.tolist()
    assert norm(out.k2.tolist()) == norm(g.k2.tolist())
    assert out.n.tolist() == g.n.tolist()
    assert out.c1.tolist() == g.c1.tolist()
    # sums of nullable ints: pandas gives 0.0/NaN for all-null; ours NULL
    for a, b in zip(out.s1.tolist(), g.s1.tolist()):
        if a is None:
            continue
        assert a == b
    assert np.allclose(out.av.astype(float), g.av.astype(float), equal_nan=True)


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("how", ["inner", "left", "full", "semi", "anti"])
def test_fuzz_join(seed, how):
    rng = np.random.default_rng(seed * 100 + 7)
    nl = int(rng.integers(20, 200))
    nr = int(rng.integers(20, 200))
    left = {"k": rng.integers(0, 30, nl).tolist(), "a": list(range(nl))}
    right = {"k": rng.integers(0, 30, nr).tolist(), "b": list(range(nr))}
    ctx = SessionContext()
    ctx.register_table("l", left)
    ctx.register_table("r", right)
    ldf, rdf = pd.DataFrame(left), pd.DataFrame(right)

    df = ctx.table("l").join(ctx.table("r"), on=[("l.k", "r.k")], how=how)
    ours = df.to_pandas()

    if how in ("inner", "left"):
        ref = ldf.merge(rdf, on="k", how=how, suffixes=("", "_r"))
        assert len(ours) == len(ref)
        assert sorted(ours.a.tolist()) == sorted(ref.a.tolist())
    elif how == "full":
        ref = ldf.merge(rdf, on="k", how="outer")
        assert len(ours) == len(ref)
    elif how == "semi":
        ref = ldf[ldf.k.isin(rdf.k)]
        assert sorted(ours.a.tolist()) == sorted(ref.a.tolist())
    else:
        ref = ldf[~ldf.k.isin(rdf.k)]
        assert sorted(ours.a.tolist()) == sorted(ref.a.tolist())


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_sort(seed):
    rng = np.random.default_rng(seed + 500)
    n = int(rng.integers(30, 300))
    data = random_table(rng, n)
    ctx = SessionContext()
    ctx.register_table("t", data)
    asc1 = bool(rng.integers(0, 2))
    asc2 = bool(rng.integers(0, 2))
    ours = ctx.table("t").sort(
        E.SortSpec(col("v1"), asc1, nulls_first=not asc1),
        E.SortSpec(col("k1"), asc2, nulls_first=False),
    ).to_pandas()
    ref = pd.DataFrame(data).sort_values(
        ["v1", "k1"], ascending=[asc1, asc2],
        na_position="first" if not asc1 else "last", kind="stable",
    ).reset_index(drop=True)
    assert [x if x is not None else None for x in ours.v1.tolist()] == \
        [None if pd.isna(x) else x for x in ref.v1.tolist()]


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_window_vs_pandas(seed):
    rng = np.random.default_rng(seed + 900)
    n = int(rng.integers(30, 200))
    data = {
        "g": rng.integers(0, 5, n).tolist(),
        "o": rng.permutation(n).tolist(),
        "v": np.round(rng.random(n), 3).tolist(),
    }
    ctx = SessionContext()
    ctx.register_table("t", data)
    ours = ctx.sql("""
        SELECT o, row_number() OVER (PARTITION BY g ORDER BY o) AS rn,
               sum(v) OVER (PARTITION BY g ORDER BY o) AS rs
        FROM t ORDER BY o
    """).to_pandas()
    df = pd.DataFrame(data).sort_values("o")
    df["rn"] = df.groupby("g").cumcount() + 1
    df["rs"] = df.groupby("g")["v"].cumsum()
    df = df.sort_values("o").reset_index(drop=True)
    assert ours.rn.tolist() == df.rn.tolist()
    assert np.allclose(ours.rs, df.rs)
