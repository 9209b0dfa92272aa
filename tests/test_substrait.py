"""Substrait interchange tests (reference analog: the substrait round-trip
sqllogictest engine, datafusion/sqllogictest/src/engines/
datafusion_substrait_roundtrip_engine/, and substrait/tests/).

Round-trip: every plan -> substrait proto3-JSON -> plan must execute to the
same result. Foreign-consumption: a document authored the way another
producer would emit it (compound function names, emit mappings, i64-as-string
literals) must bind and execute."""
import json

import numpy as np
import pandas as pd
import pytest

from datafusion_tpu.context import SessionContext


@pytest.fixture(scope="module")
def ctx():
    rng = np.random.default_rng(11)
    n = 3000
    c = SessionContext()
    c.register_table("t", {
        "k": rng.integers(0, 12, n).tolist(),
        "s": rng.choice(["aa", "bb", "cc", None], n).tolist(),
        "v": np.round(rng.normal(5, 2, n), 3).tolist(),
    })
    c.register_table("d", {"k": list(range(12)),
                           "nm": [f"g{i:02d}" for i in range(12)]})
    return c


ROUNDTRIP_QUERIES = [
    "SELECT k, v FROM t WHERE v > 5 ORDER BY v DESC, k LIMIT 7",
    "SELECT s, count(*) c, sum(v) sv, avg(v) av FROM t GROUP BY s ORDER BY s NULLS FIRST",
    "SELECT d.nm, count(DISTINCT t.s) cd FROM t JOIN d ON t.k = d.k GROUP BY d.nm ORDER BY d.nm",
    "SELECT t.k, v FROM t LEFT JOIN d ON t.k = d.k AND d.k > 3 WHERE v < 2 ORDER BY v, t.k LIMIT 5",
    "SELECT DISTINCT s FROM t ORDER BY s NULLS LAST",
    "SELECT k FROM t WHERE k < 3 UNION ALL SELECT k FROM d ORDER BY k",
    "SELECT CASE WHEN v > 5 THEN 'hi' ELSE 'lo' END b, count(*) FROM t GROUP BY b ORDER BY b",
    "SELECT k, v, sum(v) OVER (PARTITION BY k ORDER BY v) rs FROM t WHERE k < 2 ORDER BY k, v LIMIT 9",
    "SELECT upper(s) u, abs(v - 5.0) a FROM t WHERE s IS NOT NULL AND s IN ('aa','bb') ORDER BY a DESC, u LIMIT 4",
    "SELECT k, avg(v) FILTER (WHERE s = 'aa') fa FROM t GROUP BY k ORDER BY k",
    "SELECT sum(v * CAST(k AS DOUBLE)) x FROM t WHERE s LIKE 'a%' OR v BETWEEN 4 AND 6",
    "SELECT k FROM t WHERE NOT (v > 5) AND k NOT IN (1,2) ORDER BY k LIMIT 6",
    "SELECT k, CAST(sum(v) AS DECIMAL(12,2)) sv FROM t GROUP BY k ORDER BY k OFFSET 2",
]


@pytest.mark.parametrize("qi", range(len(ROUNDTRIP_QUERIES)))
def test_roundtrip(ctx, qi):
    q = ROUNDTRIP_QUERIES[qi]
    df = ctx.sql(q)
    want = df.to_pandas()
    doc = json.dumps(df.to_substrait())  # must be pure JSON
    got = ctx.from_substrait(doc).to_pandas()
    got.columns = want.columns
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False, atol=1e-9)


def test_roundtrip_tpch():
    from datafusion_tpu.models.tpch.datagen import generate_tpch
    from datafusion_tpu.models.tpch.queries import query

    tables = generate_tpch(0.005)
    c = SessionContext()
    for name, t in tables.items():
        c.register_table(name, t)
    for qid in (1, 3, 5, 6, 10, 12, 19):
        df = c.sql(query(qid, 0.005))
        want = df.to_pandas()
        got = c.from_substrait(df.to_substrait()).to_pandas()
        got.columns = want.columns
        pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                      want.reset_index(drop=True),
                                      check_dtype=False, atol=1e-6,
                                      obj=f"q{qid}")


def test_root_names_rename(ctx):
    doc = ctx.sql("SELECT k AS key, sum(v) AS total FROM t GROUP BY k").to_substrait()
    names = doc["relations"][0]["root"]["names"]
    assert names == ["key", "total"]
    out = ctx.from_substrait(doc).to_pandas()
    assert list(out.columns) == ["key", "total"]


def test_extension_declarations(ctx):
    doc = ctx.sql("SELECT sum(v) FROM t WHERE k = 3").to_substrait()
    decls = {d["extensionFunction"]["name"] for d in doc["extensions"]}
    assert any(n.startswith("sum:") for n in decls)
    assert any(n.startswith("equal:") for n in decls)
    uris = {u["uri"] for u in doc["extensionUris"]}
    assert any("functions_arithmetic" in u for u in uris)
    # proto3 JSON: int64 literals are strings
    txt = json.dumps(doc)
    assert '"i64": "3"' in txt


def test_foreign_document(ctx):
    """A document authored as another engine's producer would emit it:
    compound signatures, read projection mask, emit output mapping."""
    doc = {
        "extensionUris": [{"extensionUriAnchor": 1,
                           "uri": "https://github.com/substrait-io/substrait/"
                                  "blob/main/extensions/functions_comparison.yaml"},
                          {"extensionUriAnchor": 2,
                           "uri": "https://github.com/substrait-io/substrait/"
                                  "blob/main/extensions/functions_arithmetic.yaml"}],
        "extensions": [
            {"extensionFunction": {"extensionUriReference": 1,
                                   "functionAnchor": 4,
                                   "name": "gt:fp64_fp64"}},
            {"extensionFunction": {"extensionUriReference": 2,
                                   "functionAnchor": 9,
                                   "name": "sum:opt_fp64"}},
        ],
        "relations": [{"root": {
            "input": {"aggregate": {
                "input": {"filter": {
                    "input": {"read": {
                        "common": {"direct": {}},
                        "baseSchema": {
                            "names": ["k", "s", "v"],
                            "struct": {"types": [
                                {"i64": {"nullability": "NULLABILITY_NULLABLE"}},
                                {"string": {"nullability": "NULLABILITY_NULLABLE"}},
                                {"fp64": {"nullability": "NULLABILITY_NULLABLE"}},
                            ]}},
                        "namedTable": {"names": ["t"]},
                        "projection": {"select": {"structItems": [
                            {"field": 0}, {"field": 2}]},
                            "maintainSingularStruct": True},
                    }},
                    "condition": {"scalarFunction": {
                        "functionReference": 4,
                        "outputType": {"bool": {}},
                        "arguments": [
                            {"value": {"selection": {
                                "directReference": {"structField": {"field": 1}},
                                "rootReference": {}}}},
                            {"value": {"literal": {"fp64": 5.0}}},
                        ]}},
                }},
                "groupings": [{"groupingExpressions": [
                    {"selection": {"directReference": {"structField": {"field": 0}},
                                   "rootReference": {}}}]}],
                "measures": [{"measure": {
                    "functionReference": 9,
                    "arguments": [{"value": {"selection": {
                        "directReference": {"structField": {"field": 1}},
                        "rootReference": {}}}}],
                    "outputType": {"fp64": {}},
                    "phase": "AGGREGATION_PHASE_INITIAL_TO_RESULT",
                    "invocation": "AGGREGATION_INVOCATION_ALL",
                }}],
            }},
            "names": ["k", "total"],
        }}],
    }
    got = ctx.from_substrait(doc).to_pandas().sort_values("k").reset_index(drop=True)
    t = ctx.catalog.get("t").host_table().to_pandas()
    want = (t[t.v > 5].groupby("k").v.sum().rename("total").reset_index()
            .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9)


def test_unsupported_surfaces_error(ctx):
    from datafusion_tpu.common.errors import PlanError

    with pytest.raises(PlanError):
        ctx.from_substrait({"relations": []})
    with pytest.raises(PlanError):
        ctx.from_substrait({"relations": [{"root": {
            "input": {"exchange": {}}, "names": []}}]})


def test_filter_clause_sql_matches_pandas(ctx):
    """The FILTER (WHERE ...) aggregate clause (added for substrait parity)
    must match pandas."""
    got = ctx.sql("SELECT k, count(v) FILTER (WHERE s = 'aa') c, sum(v) sv "
                  "FROM t GROUP BY k ORDER BY k").to_pandas()
    t = ctx.catalog.get("t").host_table().to_pandas()
    want = t.groupby("k").apply(
        lambda g: pd.Series({"c": int((g.s == "aa").sum() - (g.v[g.s == "aa"].isna()).sum()),
                             "sv": g.v.sum()}),
        include_groups=False).reset_index().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9)
