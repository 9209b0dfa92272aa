#!/usr/bin/env python
"""Replay a reference .slt file and report every dropped record with WHY.

Usage:
  python scripts/slt_debug.py decimal.slt [--limit 40] [--grep TEXT]

The porter (datafusion_tpu/testing/port_slt.py) silently drops failing
records; this tool prints the exception / first-diff for each so drop
causes can be burned down. Reference corpus root:
/root/reference/datafusion/sqllogictest/test_files/.
"""
from __future__ import annotations

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from datafusion_tpu.context import SessionContext
from datafusion_tpu.testing.port_slt import (
    _SKIP_SQL, _inline_includes, _match, _record_deadline,
    parse_reference_slt, rewrite_fixture_paths)
from datafusion_tpu.testing.slt import format_rows

REF_ROOT = "/root/reference/datafusion/sqllogictest/test_files"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("file")
    ap.add_argument("--limit", type=int, default=40,
                    help="max failures to print in full")
    ap.add_argument("--grep", default="", help="only show failures whose SQL "
                    "or error matches this regex")
    args = ap.parse_args()
    path = args.file if os.path.exists(args.file) else os.path.join(
        REF_ROOT, args.file)
    refs = parse_reference_slt(_inline_includes(path))
    import tempfile

    data_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "slt", "data")
    scratch = tempfile.mkdtemp(prefix="slt_dbg_scratch_")
    for r in refs:
        if "'" in r.sql:
            r.sql = (rewrite_fixture_paths(r.sql, data_dir)
                     .replace("$SLTDATA", data_dir)
                     .replace("$SCRATCH", scratch))
    ctx = SessionContext()
    if "/spark/" in path or path.endswith("spark.slt"):
        ctx.enable_spark_functions()
    shown = 0
    reasons = collections.Counter()
    grep = re.compile(args.grep, re.I) if args.grep else None

    def show(kind, r, detail):
        nonlocal shown
        if grep and not (grep.search(r.sql) or grep.search(detail)):
            return
        if shown >= args.limit:
            return
        shown += 1
        print(f"--- [{kind}] line {r.line}\n{r.sql}\n  => {detail}\n")

    for r in refs:
        if r.condition == "drop":
            reasons["dropped_cond"] += 1
            continue
        if r.kind == "statement_ok":
            if _SKIP_SQL.match(r.sql):
                reasons["skipped_stmt"] += 1
                continue
            try:
                with _record_deadline(30):
                    ctx.sql(r.sql).collect()
                reasons["kept"] += 1
            except Exception as e:  # noqa: BLE001
                reasons["failed_stmt"] += 1
                show("failed_stmt", r, f"{type(e).__name__}: {e}")
            continue
        if r.kind in ("statement_error", "query_error"):
            try:
                with _record_deadline(30):
                    ctx.sql(r.sql).collect()
                reasons["error_not_raised"] += 1
                show("error_not_raised", r, "(reference expects an error; "
                     "we succeeded)")
            except TimeoutError:
                reasons["error_timeout"] += 1
            except Exception:  # noqa: BLE001
                reasons["kept"] += 1
            continue
        types = re.sub(r"[^IRTBD]", "T", r.types)
        try:
            with _record_deadline(30):
                table = ctx.sql(r.sql).collect()
                actual = format_rows(table, types, r.sort_mode)
        except Exception as e:  # noqa: BLE001
            reasons["query_failed"] += 1
            show("query_failed", r, f"{type(e).__name__}: {e}")
            continue
        if not _match(actual, r.expected, types, r.sort_mode):
            reasons["mismatch"] += 1
            exp = list(r.expected)[:4]
            show("mismatch", r, f"expected {exp} ... got {actual[:4]}")
            continue
        reasons["kept"] += 1

    print("== reasons ==")
    for k, v in reasons.most_common():
        print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
