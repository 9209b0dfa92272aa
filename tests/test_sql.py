import numpy as np
import pytest

from datafusion_tpu.context import SessionContext


@pytest.fixture
def ctx():
    c = SessionContext()
    c.register_table("emp", {
        "id": [1, 2, 3, 4, 5],
        "name": ["ann", "bob", "cat", "dan", "eve"],
        "dept": [10, 20, 10, 30, 20],
        "salary": [100.0, 200.0, 150.0, 300.0, 250.0],
    })
    c.register_table("dept", {
        "dept_id": [10, 20, 40],
        "dept_name": ["eng", "ops", "hr"],
    })
    return c


def q(ctx, sql):
    return ctx.sql(sql).to_pydict()


def test_basic_select(ctx):
    out = q(ctx, "SELECT name, salary * 2 AS ss FROM emp WHERE dept = 10 ORDER BY id")
    assert out["name"] == ["ann", "cat"]
    assert out["ss"] == [200.0, 300.0]


def test_group_by_having(ctx):
    out = q(ctx, """
        SELECT dept, count(*) AS n, sum(salary) AS total, avg(salary) AS a
        FROM emp GROUP BY dept HAVING count(*) > 1 ORDER BY dept
    """)
    assert out["dept"] == [10, 20]
    assert out["n"] == [2, 2]
    assert out["total"] == [250.0, 450.0]
    assert out["a"] == [125.0, 225.0]


def test_join_explicit_and_comma(ctx):
    out1 = q(ctx, """
        SELECT e.name, d.dept_name FROM emp e JOIN dept d ON e.dept = d.dept_id
        ORDER BY e.id
    """)
    out2 = q(ctx, """
        SELECT e.name, d.dept_name FROM emp e, dept d WHERE e.dept = d.dept_id
        ORDER BY e.id
    """)
    assert out1 == out2
    assert out1["name"] == ["ann", "bob", "cat", "eve"]
    assert out1["dept_name"] == ["eng", "ops", "eng", "ops"]


def test_left_join_nulls(ctx):
    out = q(ctx, """
        SELECT d.dept_name, e.name FROM dept d LEFT JOIN emp e ON d.dept_id = e.dept
        ORDER BY d.dept_name, e.name
    """)
    assert out["dept_name"] == ["eng", "eng", "hr", "ops", "ops"]
    assert out["name"] == ["ann", "cat", None, "bob", "eve"]


def test_subquery_scalar_uncorrelated(ctx):
    out = q(ctx, "SELECT name FROM emp WHERE salary > (SELECT avg(salary) FROM emp) ORDER BY name")
    assert out["name"] == ["dan", "eve"]


def test_subquery_in(ctx):
    out = q(ctx, "SELECT name FROM emp WHERE dept IN (SELECT dept_id FROM dept WHERE dept_name = 'eng') ORDER BY name")
    assert out["name"] == ["ann", "cat"]
    out = q(ctx, "SELECT name FROM emp WHERE dept NOT IN (SELECT dept_id FROM dept) ORDER BY name")
    assert out["name"] == ["dan"]


def test_subquery_exists_correlated(ctx):
    out = q(ctx, """
        SELECT d.dept_name FROM dept d
        WHERE EXISTS (SELECT * FROM emp e WHERE e.dept = d.dept_id AND e.salary > 140)
        ORDER BY d.dept_name
    """)
    assert out["dept_name"] == ["eng", "ops"]
    out = q(ctx, """
        SELECT d.dept_name FROM dept d
        WHERE NOT EXISTS (SELECT * FROM emp e WHERE e.dept = d.dept_id)
    """)
    assert out["dept_name"] == ["hr"]


def test_correlated_scalar_subquery(ctx):
    out = q(ctx, """
        SELECT e.name FROM emp e
        WHERE e.salary > (SELECT avg(e2.salary) FROM emp e2 WHERE e2.dept = e.dept)
        ORDER BY e.name
    """)
    assert out["name"] == ["cat", "eve"]


def test_case_cast_between_like(ctx):
    out = q(ctx, """
        SELECT name,
               CASE WHEN salary >= 250 THEN 'high' WHEN salary >= 150 THEN 'mid' ELSE 'low' END AS band,
               CAST(salary AS bigint) AS sal_int
        FROM emp WHERE name LIKE '%a%' AND salary BETWEEN 50 AND 350 ORDER BY id
    """)
    assert out["name"] == ["ann", "cat", "dan"]
    assert out["band"] == ["low", "mid", "high"]
    assert out["sal_int"] == [100, 150, 300]


def test_distinct_union_limit(ctx):
    out = q(ctx, "SELECT DISTINCT dept FROM emp ORDER BY dept")
    assert out["dept"] == [10, 20, 30]
    out = q(ctx, "SELECT dept_id AS d FROM dept UNION ALL SELECT dept FROM emp ORDER BY d LIMIT 3")
    assert out["d"] == [10, 10, 10]


def test_derived_table_and_cte(ctx):
    out = q(ctx, """
        SELECT t.dept, t.total FROM
            (SELECT dept, sum(salary) AS total FROM emp GROUP BY dept) AS t
        WHERE t.total > 260 ORDER BY t.dept
    """)
    assert out["dept"] == [20, 30]
    out = q(ctx, """
        WITH top_paid AS (SELECT dept, max(salary) AS m FROM emp GROUP BY dept)
        SELECT e.name FROM emp e, top_paid t WHERE e.dept = t.dept AND e.salary = t.m
        ORDER BY e.name
    """)
    assert out["name"] == ["cat", "dan", "eve"]


def test_order_by_ordinal_and_expr(ctx):
    out = q(ctx, "SELECT name, salary FROM emp ORDER BY 2 DESC LIMIT 2")
    assert out["name"] == ["dan", "eve"]
    out = q(ctx, "SELECT name FROM emp ORDER BY salary * -1 LIMIT 1")
    assert out["name"] == ["dan"]


def test_ddl_create_as_and_show(ctx):
    ctx.sql("CREATE TABLE rich AS SELECT * FROM emp WHERE salary > 200")
    out = q(ctx, "SELECT name FROM rich ORDER BY name")
    assert out["name"] == ["dan", "eve"]
    ctx.sql("DROP TABLE rich")
    ctx.sql("CREATE VIEW v AS SELECT dept, count(*) AS n FROM emp GROUP BY dept")
    out = q(ctx, "SELECT * FROM v ORDER BY dept")
    assert out["n"] == [2, 2, 1]


def test_scalar_functions(ctx):
    out = q(ctx, "SELECT upper(name) AS u, substring(name, 1, 2) AS s2, length(name) AS l FROM emp ORDER BY id LIMIT 2")
    assert out["u"] == ["ANN", "BOB"]
    assert out["s2"] == ["an", "bo"]
    assert out["l"] == [3, 3]


def test_count_distinct_sql(ctx):
    out = q(ctx, "SELECT count(DISTINCT dept) AS d, count(*) AS n FROM emp")
    assert out["d"] == [3]
    assert out["n"] == [5]


def test_rollup_and_grouping_sets(ctx):
    out = q(ctx, """
        SELECT dept, count(*) AS n FROM emp GROUP BY ROLLUP (dept) ORDER BY dept
    """)
    assert out["dept"] == [10, 20, 30, None]
    assert out["n"] == [2, 2, 1, 5]
    out = q(ctx, """
        SELECT dept, name, sum(salary) AS s FROM emp
        GROUP BY GROUPING SETS ((dept), (name))
        ORDER BY dept, name
    """)
    assert len(out["s"]) == 8  # 3 depts + 5 names


def test_prepare_execute_deallocate():
    """PREPARE/EXECUTE/DEALLOCATE with $N parameters (reference:
    sql/src/statement.rs Statement::Prepare + replace_params_with_values)."""
    import pytest

    from datafusion_tpu.common.errors import PlanError

    ctx = SessionContext()
    ctx.register_table("t", {"x": [1, 2, 3], "s": ["a", "b", "c"]})
    ctx.sql("PREPARE p AS SELECT x, s FROM t WHERE x > $1 ORDER BY x").collect()
    assert ctx.sql("EXECUTE p(1)").to_pydict()["x"] == [2, 3]
    assert ctx.sql("EXECUTE p(2)").to_pydict()["x"] == [3]
    ctx.sql("PREPARE q (DOUBLE, VARCHAR) AS"
            " SELECT x FROM t WHERE x < $1 AND s <> $2").collect()
    assert ctx.sql("EXECUTE q(2.5, 'b')").to_pydict()["x"] == [1]
    ctx.sql("DEALLOCATE p").collect()
    with pytest.raises(PlanError):
        ctx.sql("EXECUTE p(1)").collect()
