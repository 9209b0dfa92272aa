"""WITH RECURSIVE tests (reference analog: RecursiveQueryExec,
physical-plan/src/recursive_query.rs + sqllogictest test_files/cte.slt)."""
import pytest

from datafusion_tpu.common.errors import PlanError
from datafusion_tpu.context import SessionContext


def q(c, sql):
    return c.sql(sql).collect().to_pydict()


def test_sequence():
    c = SessionContext()
    out = q(c, "WITH RECURSIVE seq(n) AS ("
               "SELECT 1 UNION ALL SELECT n + 1 FROM seq WHERE n < 10) "
               "SELECT sum(n) s, count(*) cnt FROM seq")
    assert out == {"s": [55], "cnt": [10]}


def test_graph_reachability():
    c = SessionContext()
    c.register_table("edges", {"src": [1, 1, 2, 3, 4], "dst": [2, 3, 4, 4, 5]})
    out = q(c, "WITH RECURSIVE reach(node) AS ("
               "SELECT 1 UNION ALL "
               "SELECT e.dst FROM reach r, edges e WHERE e.src = r.node) "
               "SELECT node, count(*) paths FROM reach GROUP BY node ORDER BY node")
    assert out == {"node": [1, 2, 3, 4, 5], "paths": [1, 1, 1, 2, 2]}


def test_multi_column_state():
    c = SessionContext()
    out = q(c, "WITH RECURSIVE fib(a, b) AS ("
               "SELECT 0, 1 UNION ALL SELECT b, a + b FROM fib WHERE b < 100) "
               "SELECT max(b) m FROM fib")
    assert out == {"m": [144]}


def test_cte_column_alias_list_non_recursive():
    c = SessionContext()
    assert q(c, "WITH t(a) AS (SELECT 41) SELECT a + 1 b FROM t") == {"b": [42]}


def test_union_distinct_rejected():
    c = SessionContext()
    with pytest.raises(PlanError, match="UNION ALL"):
        c.sql("WITH RECURSIVE s(n) AS (SELECT 1 UNION SELECT n + 1 FROM s "
              "WHERE n < 3) SELECT * FROM s").collect()


def test_runaway_recursion_capped():
    c = SessionContext()
    with pytest.raises(Exception, match="exceeded"):
        c.sql("WITH RECURSIVE s(n) AS (SELECT 1 UNION ALL SELECT n + 1 "
              "FROM s) SELECT count(*) FROM s").collect()
