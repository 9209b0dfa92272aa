#!/usr/bin/env python
"""Profile one TPC-H query's fused program on the current backend.

Usage: python scripts/profile_query.py 17 [--sf 1] [--repeat 3] [--trace]

Prints per-repeat wall times and, with --trace, the top device ops from the
captured xplane profile (utils/xplane.py).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("qid", type=int)
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--repeat", type=int, default=5)
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import datafusion_tpu

    datafusion_tpu.enable_compilation_cache()
    from datafusion_tpu.context import SessionContext
    from datafusion_tpu.models.tpch.datagen import generate_tpch
    from datafusion_tpu.models.tpch.queries import query
    from datafusion_tpu.physical.fused import FusedQuery

    t0 = time.time()
    tables = generate_tpch(args.sf)
    ctx = SessionContext()
    for name, t in tables.items():
        ctx.register_table(name, t)
    print(f"# datagen {time.time() - t0:.1f}s backend={jax.devices()[0].platform}")

    ectx = ctx.exec_context()
    phys = FusedQuery(ctx.sql(query(args.qid, args.sf)).physical_plan())
    t0 = time.time()
    rel = phys.execute(ectx)
    jax.block_until_ready(rel)
    print(f"# compile+first {time.time() - t0:.1f}s")

    for _ in range(args.repeat):
        t0 = time.perf_counter()
        rel = phys.execute(ectx)
        jax.block_until_ready(rel)
        print(f"# run {(time.perf_counter() - t0) * 1000:.2f} ms")

    if args.trace:
        from datafusion_tpu.utils import xplane

        d = f"/tmp/q{args.qid}_trace"
        with jax.profiler.trace(d):
            rel = phys.execute(ectx)
            jax.block_until_ready(rel)
        time.sleep(1)
        print(xplane.top_ops(d, n=30))


if __name__ == "__main__":
    main()
