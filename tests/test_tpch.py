"""TPC-H differential tests: engine vs pandas reference on generated data
(SF 0.01). The analog of the reference's sqllogictest TPC-H answer files +
fuzz differential runs (SURVEY.md §4)."""
import numpy as np
import pandas as pd
import pytest

from datafusion_tpu.context import SessionContext
from datafusion_tpu.models.tpch.datagen import generate_tpch
from datafusion_tpu.models.tpch.queries import ALL_QUERY_IDS, query
from datafusion_tpu.models.tpch.queries_ref import ref_query

import os

SF = float(os.environ.get("TPCH_TEST_SF", "0.01"))


@pytest.fixture(scope="module")
def tpch():
    tables = generate_tpch(SF)
    ctx = SessionContext()
    for name, t in tables.items():
        ctx.register_table(name, t)
    pdt = {name: t.to_pandas() for name, t in tables.items()}
    return ctx, pdt


from datafusion_tpu.models.tpch.compare import LIMIT_QUERIES, frames_diff


def assert_frames_match(ours: pd.DataFrame, ref: pd.DataFrame, ordered: bool, qid: int):
    diff = frames_diff(ours, ref, ordered)
    assert diff is None, f"q{qid}: {diff}"


@pytest.mark.parametrize("qid", ALL_QUERY_IDS)
def test_tpch_query(tpch, qid):
    ctx, pdt = tpch
    sql = query(qid, SF)
    ours = ctx.sql(sql).to_pandas()
    ref = ref_query(qid, pdt, SF)
    assert_frames_match(ours, ref, ordered=qid in LIMIT_QUERIES, qid=qid)
