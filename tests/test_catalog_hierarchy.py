"""Three-level catalog namespace (reference: CatalogProviderList ->
CatalogProvider -> SchemaProvider -> TableProvider,
datafusion/catalog/src/{catalog,schema}.rs)."""
from datafusion_tpu.context import SessionContext


def test_qualified_registration_and_query():
    ctx = SessionContext()
    ctx.register_table("t", {"k": [1]})
    ctx.register_table("staging.t", {"k": [2]})
    ctx.register_table("prod.sales.t", {"k": [3]})
    assert ctx.sql("SELECT k FROM t").to_pydict()["k"] == [1]
    assert ctx.sql("SELECT k FROM staging.t").to_pydict()["k"] == [2]
    assert ctx.sql("SELECT k FROM prod.sales.t AS x").to_pydict()["k"] == [3]


def test_names_and_information_schema():
    ctx = SessionContext()
    ctx.register_table("a", {"k": [1]})
    ctx.register_table("s2.b", {"k": [1]})
    ctx.register_table("c1.s3.c", {"k": [1]})
    assert ctx.catalog.names() == ["a", "c1.s3.c", "s2.b"]
    out = ctx.sql("SELECT table_catalog, table_schema, table_name "
                  "FROM information_schema.tables ORDER BY table_name").to_pydict()
    assert out["table_name"] == ["a", "b", "c"]
    assert out["table_schema"] == ["public", "s2", "s3"]
    assert out["table_catalog"] == ["datafusion", "datafusion", "c1"]
    sch = ctx.sql("SELECT catalog_name, schema_name FROM "
                  "information_schema.schemata ORDER BY catalog_name, schema_name"
                  ).to_pydict()
    assert ("c1", "s3") in list(zip(sch["catalog_name"], sch["schema_name"]))


def test_same_bare_name_different_schemas():
    ctx = SessionContext()
    ctx.register_table("x.t", {"k": [10]})
    ctx.register_table("y.t", {"k": [20]})
    out = ctx.sql("SELECT a.k ka, b.k kb FROM x.t a JOIN y.t b ON 1=1").to_pydict()
    assert out == {"ka": [10], "kb": [20]}


def test_drop_qualified():
    ctx = SessionContext()
    ctx.register_table("s.t", {"k": [1]})
    assert "s.t" in ctx.catalog
    ctx.sql("DROP TABLE s.t")
    assert "s.t" not in ctx.catalog


def test_information_schema_df_settings_and_routines():
    """Session-scoped virtual tables (reference: information_schema.rs
    df_settings + routines views)."""
    from datafusion_tpu.context import SessionContext

    ctx = SessionContext()
    ctx.register_table("t", {"x": [1]})
    s = ctx.sql("SELECT name, value FROM information_schema.df_settings "
                "WHERE name LIKE 'execution%'").to_pydict()
    assert len(s["name"]) >= 3
    ctx.sql("SET execution.chunk_rows = 4096")
    s2 = ctx.sql("SELECT value FROM information_schema.df_settings "
                 "WHERE name = 'execution.chunk_rows'").to_pydict()
    assert s2["value"] == ["4096"]
    r = ctx.sql("SELECT count(*) c FROM information_schema.routines "
                "WHERE routine_type = 'AGGREGATE'").to_pydict()
    assert r["c"][0] > 20
    ctx.register_udtf("myfunc", lambda: {"a": [1]})
    r2 = ctx.sql("SELECT routine_type FROM information_schema.routines "
                 "WHERE routine_name = 'myfunc'").to_pydict()
    assert r2["routine_type"] == ["TABLE"]
