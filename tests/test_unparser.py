"""Unparser round-trip: plan -> SQL -> plan executes identically
(reference: unparser round-trip usage for federation)."""
import pytest

from datafusion_tpu.context import DataFrame, SessionContext
from datafusion_tpu.sql.unparser import plan_to_sql


@pytest.fixture
def ctx():
    c = SessionContext()
    c.register_table("emp", {
        "id": [1, 2, 3, 4],
        "name": ["a", "b", "c", "d"],
        "dept": [10, 20, 10, 30],
        "sal": [5.0, 6.0, 7.0, 8.0],
    })
    c.register_table("dept", {"dept_id": [10, 20], "dn": ["x", "y"]})
    return c


QUERIES = [
    "SELECT name, sal * 2 AS s2 FROM emp WHERE dept = 10 ORDER BY id ASC NULLS LAST",
    "SELECT dept, count(*) AS n, sum(sal) AS t FROM emp GROUP BY dept ORDER BY dept ASC NULLS LAST",
    "SELECT e.name, d.dn FROM emp e JOIN dept d ON e.dept = d.dept_id ORDER BY e.id ASC NULLS LAST",
    "SELECT DISTINCT dept FROM emp ORDER BY dept ASC NULLS LAST",
    "SELECT CASE WHEN sal > 6 THEN 'hi' ELSE 'lo' END AS band FROM emp ORDER BY id ASC NULLS LAST",
]


@pytest.mark.parametrize("sql", QUERIES)
def test_roundtrip_executes_identically(ctx, sql):
    df = ctx.sql(sql)
    plan = df.logical_plan()
    sql2 = plan_to_sql(plan)
    out1 = df.to_pydict()
    out2 = ctx.sql(sql2).to_pydict()
    assert list(out1.values()) == list(out2.values()), sql2
