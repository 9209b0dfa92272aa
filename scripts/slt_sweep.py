#!/usr/bin/env python
"""Port the reference sqllogictest corpus and update SLT_PARITY.json.

Usage:
  python scripts/slt_sweep.py                  # every reference file
  python scripts/slt_sweep.py decimal.slt ...  # named files only
  python scripts/slt_sweep.py --min-drop 50    # only files whose recorded
                                               # drop count is >= N
  python scripts/slt_sweep.py --jobs 8         # parallel worker processes

Each file is ported in a subprocess (fresh interpreter: no cross-file
engine state, hard timeout survives hangs). SLT_PARITY.json accumulates
per-file {kept, dropped, reason} stats plus a _summary block.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_ROOT = "/root/reference/datafusion/sqllogictest/test_files"
OUT_DIR = os.path.join(REPO, "tests", "slt", "ported")
PARITY = os.path.join(REPO, "SLT_PARITY.json")

_CHILD = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, {repo!r})
from datafusion_tpu.context import SessionContext
from datafusion_tpu.testing.port_slt import port_file

def ctx_factory():
    ctx = SessionContext()
    if "/spark/" in {ref!r} or {ref!r}.endswith("spark.slt"):
        ctx.enable_spark_functions()
    return ctx

stats = port_file({ref!r}, {out!r}, ctx_factory)
print("PORT_STATS " + json.dumps(stats))
"""


def ref_files():
    out = []
    for d, _dirs, fs in os.walk(REF_ROOT):
        for f in fs:
            if f.endswith(".slt"):
                rel = os.path.relpath(os.path.join(d, f), REF_ROOT)
                out.append(rel)
    return sorted(out)


def out_name(rel: str) -> str:
    return rel.replace("/", "__")


def port_one(rel: str, timeout_s: int):
    ref = os.path.join(REF_ROOT, rel)
    out = os.path.join(OUT_DIR, out_name(rel))
    code = _CHILD.format(repo=REPO, ref=ref, out=out)
    t0 = time.time()
    try:
        p = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                           capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return rel, {"timeout": True, "seconds": round(time.time() - t0, 1)}
    stats = None
    for line in p.stdout.splitlines():
        if line.startswith("PORT_STATS "):
            stats = json.loads(line[len("PORT_STATS "):])
    if stats is None:
        return rel, {"crashed": True,
                     "stderr": p.stderr.strip().splitlines()[-1][:200]
                     if p.stderr.strip() else "",
                     "seconds": round(time.time() - t0, 1)}
    stats["seconds"] = round(time.time() - t0, 1)
    return rel, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="*")
    ap.add_argument("--min-drop", type=int, default=0)
    ap.add_argument("--jobs", type=int, default=max(os.cpu_count() - 2, 1))
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args()

    parity = {}
    if os.path.exists(PARITY):
        with open(PARITY) as f:
            parity = json.load(f)

    if args.files:
        todo = [f for f in ref_files()
                if f in args.files or out_name(f) in args.files
                or os.path.basename(f) in args.files]
    else:
        todo = ref_files()
    if args.min_drop:
        def drop_of(rel):
            v = parity.get(rel, {})
            if not isinstance(v, dict) or "kept" not in v:
                return 10**9  # never ported / crashed: always retry
            return (v.get("query_failed", 0) + v.get("mismatch", 0)
                    + v.get("failed_stmt", 0))
        todo = [f for f in todo if drop_of(f) >= args.min_drop]

    print(f"porting {len(todo)} files with {args.jobs} workers")
    from concurrent.futures import ThreadPoolExecutor

    t0 = time.time()
    done = 0
    with ThreadPoolExecutor(args.jobs) as ex:
        for rel, stats in ex.map(
                lambda r: port_one(r, args.timeout), todo):
            done += 1
            old = parity.get(rel, {})
            delta = ""
            if isinstance(old, dict) and "kept" in old and "kept" in stats:
                delta = f" ({stats['kept'] - old['kept']:+d})"
            parity[rel] = stats
            print(f"[{done}/{len(todo)}] {rel}: "
                  f"kept={stats.get('kept', 0)}/{stats.get('total', '?')}"
                  f"{delta}  {stats.get('seconds', 0)}s", flush=True)

    # summary
    files = [k for k, v in parity.items()
             if k != "_summary" and isinstance(v, dict)]
    kept = sum(parity[k].get("kept", 0) for k in files)
    total = sum(parity[k].get("total", 0) for k in files)
    nlines = 0
    nfiles = 0
    for f in os.listdir(OUT_DIR):
        if f.endswith(".slt"):
            nfiles += 1
            with open(os.path.join(OUT_DIR, f)) as fh:
                nlines += sum(1 for _ in fh)
    parity["_summary"] = {
        "corpus_files": nfiles, "corpus_lines": nlines, "files": len(files),
        "kept_fraction": round(kept / max(total, 1), 4),
        "records_kept": kept, "records_total": total,
    }
    with open(PARITY, "w") as f:
        json.dump(parity, f, indent=1, sort_keys=True)
    print(f"summary: {json.dumps(parity['_summary'])} "
          f"in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
