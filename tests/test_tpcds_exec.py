"""TPC-DS execution on REAL (non-empty) synthetic data, value-checked
against sqlite as an independent differential oracle.

The reference checks TPC answers against committed fixtures
(sqllogictest/test_files/tpch/answers/) and runs pg_compat files against
real Postgres (SURVEY.md §4); here the same generated data
(models/tpcds/datagen.py) is loaded into both this engine and sqlite and
the result frames must agree (floats to tolerance, rows canonicalized).

81 of the 99 public queries agree with sqlite end-to-end (the other 18 use
ROLLUP / GROUPING / stddev / FROM-compound shapes sqlite cannot run --
those still execute under test_tpcds_planning.py and the SLT suite). The
default run covers a 44-query subset spread over the suite's plan shapes;
DATAFUSION_TPU_TPCDS_FULL=1 runs all 81.
"""
import os
import sqlite3

import pytest

from datafusion_tpu.context import SessionContext
from datafusion_tpu.models.tpcds import query
from datafusion_tpu.models.tpcds.datagen import generate_tpcds
from datafusion_tpu.models.tpcds.sqlite_oracle import (frames_match,
                                                       load_sqlite,
                                                       run_sqlite)

# every query that matches sqlite on the generated data (98/99). ROLLUP
# queries run through expand_rollup (sqlite_oracle.py); stddev_samp is a
# registered Python aggregate; q23/q24 are multi-statement. The one
# exclusion is q67: its rank() ties on float sums at the LIMIT boundary,
# so the float (sqlite) and exact-decimal (engine) oracles legitimately
# disagree about the 100th row.
SQLITE_OK = [q for q in range(1, 100) if q != 67]

# default subset: joins (3,19,25), CTE year-over-year (2,4,31), subqueries
# (1,6,30,32,54,81), windows (47,51,57), exists/in (10,35,16,94), returns
# (25,30,50,85), inventory (21,37,82), multi-channel unions (33,56,60,76),
# time_dim (88,90,96), ticket grouping (46,68,73,79)
SUBSET = [1, 2, 3, 4, 6, 10, 13, 15, 16, 19, 20, 21, 25, 26, 28, 30, 31,
          32, 33, 35, 37, 38, 42, 45, 46, 47, 51, 54, 56, 57, 59, 60, 62,
          65, 68, 73, 76, 79, 84, 88, 90, 94, 96, 99]

# default subset widened with the newly-oracled shapes (rollup/grouping,
# stddev, multi-statement, EXCEPT); DATAFUSION_TPU_TPCDS_FULL=1 runs all 98
SUBSET = SUBSET + [5, 17, 18, 22, 27, 36, 39, 58, 70, 72, 77, 80, 86, 87]
QIDS = SQLITE_OK if os.environ.get("DATAFUSION_TPU_TPCDS_FULL") else sorted(SUBSET)


@pytest.fixture(scope="module")
def tpcds():
    tables = generate_tpcds(0.05)
    ctx = SessionContext()
    for n, t in tables.items():
        ctx.register_table(n, t)
    conn = load_sqlite(tables)
    yield ctx, conn
    conn.close()


@pytest.mark.parametrize("qid", QIDS)
def test_tpcds_matches_sqlite(tpcds, qid):
    ctx, conn = tpcds
    sql = query(qid)
    ref = run_sqlite(conn, sql)
    ours = ctx.sql(sql).to_pandas()
    diff = frames_match(ours, ref)
    assert diff is None, f"q{qid}: {diff}"


def test_enough_queries_nonempty(tpcds):
    """The generated domains must actually intersect the queries' literal
    predicates -- an all-empty differential would be vacuous."""
    ctx, conn = tpcds
    nonempty = 0
    probe = [2, 19, 20, 26, 31, 33, 35, 38, 45, 46, 47, 51, 56, 57, 59, 60,
             62, 65, 68, 73, 79, 88, 90, 94, 96, 99]
    for qid in probe:
        if len(run_sqlite(conn, query(qid))):
            nonempty += 1
    assert nonempty >= len(probe) * 2 // 3, f"only {nonempty} non-empty"
