"""CLI end-to-end tests (subprocess, CPU backend) -- the datafusion-cli
surface analog (reference: datafusion-cli/tests)."""
import json
import subprocess
import sys


def run_cli(*args, input_text=None):
    return subprocess.run(
        [sys.executable, "-m", "datafusion_tpu.cli", "--cpu", *args],
        capture_output=True, text=True, timeout=300, input=input_text,
        cwd="/root/repo",
    )


def test_cli_command_mode():
    r = run_cli("-c", "SELECT 1 + 2 AS three")
    assert r.returncode == 0, r.stderr
    assert "three" in r.stdout and "3" in r.stdout
    assert "1 row(s)" in r.stdout


def test_cli_file_mode(tmp_path):
    f = tmp_path / "q.sql"
    f.write_text(
        "CREATE TABLE t AS SELECT 1 AS a UNION ALL SELECT 2; "
        "SELECT sum(a) AS s FROM t"
    )
    r = run_cli("-f", str(f))
    assert r.returncode == 0, r.stderr
    assert "3" in r.stdout


def test_cli_repl_pipeline():
    script = "\\tpch 0.002\nSELECT count(*) AS n FROM nation;\n\\d\n\\q\n"
    r = run_cli(input_text=script)
    assert r.returncode == 0, r.stderr
    assert "25" in r.stdout
    assert "lineitem" in r.stdout  # \d listing
    assert "registered" in r.stdout


def test_bench_smoke_cpu():
    r = subprocess.run(
        [sys.executable, "bench.py", "--cpu", "--sf", "0.005", "--queries", "1,6",
         "--repeat", "1"],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    line = r.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["unit"] == "ms" and out["value"] > 0
    assert set(out["queries"]) == {"1", "6"}
