"""Golden-file SQL tests (the reference's sqllogictest analog, SURVEY §4).

Each tests/slt/*.slt file runs against a fresh SessionContext; expected
blocks were generated with the runner's completion mode
(datafusion_tpu.testing.slt.run_slt_file(path, complete=True)) and are
reviewed/checked in. To regenerate after an intentional behavior change:

    python -c "from datafusion_tpu.testing.slt import run_slt_file; \
               import glob; [run_slt_file(p, complete=True) \
               for p in glob.glob('tests/slt/*.slt')]"
"""
import glob
import os

import pytest

from datafusion_tpu.testing.slt import parse_slt, render, run_slt_file

SLT_DIR = os.path.join(os.path.dirname(__file__), "slt")
# hand-written goldens + files ported from the reference corpus
# (testing/port_slt.py: every kept query's values were verified against the
# reference's committed expected output at port time)
FILES = sorted(glob.glob(os.path.join(SLT_DIR, "*.slt"))
               + glob.glob(os.path.join(SLT_DIR, "ported", "*.slt")))


@pytest.mark.parametrize("path", FILES, ids=[os.path.relpath(p, SLT_DIR) for p in FILES])
def test_slt_file(path):
    failures = run_slt_file(path)
    assert not failures, "\n".join(str(f) for f in failures)


def test_parse_render_roundtrip():
    for path in FILES:
        with open(path) as f:
            text = f.read()
        records = parse_slt(text)
        assert records, path
        # render -> parse is a fixpoint (completion mode rewrites are
        # stable); line numbers shift with header comments, so compare
        # records with line normalized
        import dataclasses

        def norm(rs):
            return [dataclasses.replace(r, line=0) for r in rs]

        assert norm(parse_slt(render(records))) == norm(records)
