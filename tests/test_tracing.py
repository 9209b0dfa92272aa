import json

from datafusion_tpu.context import SessionContext
from datafusion_tpu.runtime.tracing import TRACER, disable_tracing, enable_tracing


def test_span_tracing_chrome_dump(tmp_path):
    ctx = SessionContext()
    ctx.register_table("t", {"k": [1, 2, 1], "v": [1.0, 2.0, 3.0]})
    enable_tracing()
    try:
        ctx.sql("SELECT k, sum(v) FROM t GROUP BY k ORDER BY k").collect()
    finally:
        disable_tracing()
    assert any("FilterExec" in e["name"] or "ScanExec" in e["name"]
               or "Projection" in e["name"] for e in TRACER.events)
    p = tmp_path / "trace.json"
    TRACER.dump_chrome_trace(str(p))
    data = json.loads(p.read_text())
    assert data["traceEvents"] and all("dur" in e for e in data["traceEvents"])
