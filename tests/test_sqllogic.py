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
FILES = sorted(glob.glob(os.path.join(SLT_DIR, "*.slt")))


@pytest.mark.parametrize("path", FILES, ids=[os.path.basename(p) for p in FILES])
def test_slt_file(path):
    failures = run_slt_file(path)
    assert not failures, "\n".join(str(f) for f in failures)


def test_parse_render_roundtrip():
    for path in FILES:
        with open(path) as f:
            text = f.read()
        records = parse_slt(text)
        assert records, path
        # render -> parse is a fixpoint (completion mode rewrites are stable)
        assert parse_slt(render(records)) == records
