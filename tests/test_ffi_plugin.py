"""Native plugin ABI (reference: datafusion-ffi crate, ffi/src/lib.rs:28-55 —
stable C ABI over the Arrow C Data Interface).

Compiles the in-tree example plugin with g++ and loads it through
SessionContext.register_plugin."""
import os
import subprocess

import numpy as np
import pytest

from datafusion_tpu.common.errors import PlanError
from datafusion_tpu.context import SessionContext

_SRC_DIR = os.path.join(os.path.dirname(__file__), "..", "datafusion_tpu",
                        "native")


@pytest.fixture(scope="module")
def plugin_so(tmp_path_factory):
    src = os.path.join(_SRC_DIR, "example_plugin.cpp")
    out = str(tmp_path_factory.mktemp("plugin") / "example_plugin.so")
    try:
        subprocess.run(["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                        src, "-o", out], check=True, capture_output=True,
                       timeout=120)
    except (OSError, subprocess.SubprocessError) as e:
        pytest.skip(f"cannot build example plugin: {e}")
    return out


def test_plugin_registers(plugin_so):
    ctx = SessionContext()
    names = ctx.register_plugin(plugin_so)
    assert names == {"tables": ["plugin_numbers"], "scalars": ["plugin_hypot"]}


def test_plugin_table_scan(plugin_so):
    ctx = SessionContext()
    ctx.register_plugin(plugin_so)
    out = ctx.sql("SELECT count(*) AS n, sum(id) AS s, max(val) AS m "
                  "FROM plugin_numbers").to_pydict()
    assert out == {"n": [100], "s": [4950], "m": [49.5]}
    # utf8 column crossed the C boundary; dictionary path works
    out = ctx.sql("SELECT name FROM plugin_numbers WHERE id = 42").to_pydict()
    assert out["name"] == ["row42"]


def test_plugin_table_joins_engine_tables(plugin_so):
    ctx = SessionContext()
    ctx.register_plugin(plugin_so)
    ctx.register_table("local", {"id": [1, 2, 3], "w": [10.0, 20.0, 30.0]})
    out = ctx.sql("SELECT p.id, p.val * l.w AS x FROM plugin_numbers p "
                  "JOIN local l ON p.id = l.id ORDER BY p.id").to_pydict()
    assert out["id"] == [1, 2, 3]
    assert out["x"] == [5.0, 20.0, 45.0]


def test_plugin_scalar_function(plugin_so):
    ctx = SessionContext()
    ctx.register_plugin(plugin_so)
    ctx.register_table("t", {"a": [3.0, 5.0, 8.0], "b": [4.0, 12.0, 15.0]})
    out = ctx.sql("SELECT plugin_hypot(a, b) AS h FROM t").to_pydict()
    assert out["h"] == pytest.approx([5.0, 13.0, 17.0])
    # compose with engine expressions
    out = ctx.sql("SELECT sum(plugin_hypot(a, b) + 1) AS s FROM t").to_pydict()
    assert out["s"] == pytest.approx([38.0])


def test_missing_entry_point(tmp_path):
    src = tmp_path / "empty.cpp"
    src.write_text("extern \"C\" int unrelated() { return 0; }\n")
    out = str(tmp_path / "empty.so")
    try:
        subprocess.run(["g++", "-O2", "-shared", "-fPIC", str(src), "-o", out],
                       check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError) as e:
        pytest.skip(f"no toolchain: {e}")
    ctx = SessionContext()
    with pytest.raises(PlanError, match="dft_plugin_init"):
        ctx.register_plugin(out)
