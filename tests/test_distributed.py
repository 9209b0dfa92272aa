"""Distributed execution tests on the 8-device virtual CPU mesh (the
reference's multi-node proxy role, SURVEY.md §4 'Multi-node testing')."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from datafusion_tpu.parallel.distributed import (distributed_query_step,
                                                 exchange_by_key, make_mesh,
                                                 shard_rows)


def test_exchange_by_key_routes_correctly():
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(4)
    n = 4
    cap = 128
    total = n * cap
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 1000, total).astype(np.int64)
    keys = rng.integers(0, 16, total).astype(np.uint64)
    sel = rng.random(total) < 0.7

    sh = NamedSharding(mesh, P("dp"))
    dvals = jax.device_put(vals, sh)
    dkeys = jax.device_put(keys, sh)
    dsel = jax.device_put(sel, sh)

    def f(v, k, s):
        (out_v, out_k), out_sel, dropped = exchange_by_key([v, k.astype(jnp.int64)], k, s)
        return out_v, out_k, out_sel, dropped[None]

    g = shard_map(f, mesh=mesh, in_specs=(P("dp"), P("dp"), P("dp")),
                  out_specs=(P("dp"), P("dp"), P("dp"), P("dp")))
    out_v, out_k, out_sel, dropped = jax.jit(g)(dvals, dkeys, dsel)
    assert int(np.sum(np.asarray(dropped))) == 0
    ov = np.asarray(out_v)
    ok = np.asarray(out_k).astype(np.uint64)
    osel = np.asarray(out_sel)
    # every live row delivered exactly once
    assert osel.sum() == sel.sum()
    got = sorted(ov[osel].tolist())
    want = sorted(vals[sel].tolist())
    assert got == want
    # rows landed on the shard their key hashes to
    shard_of_row = np.repeat(np.arange(n), cap)
    from datafusion_tpu.ops import kernels as K

    h = np.asarray(K.hash64([jnp.asarray(ok[osel].astype(np.int64))])).astype(np.uint64)
    # keys were already hashed upstream in this test (exchange hashes % n on
    # the provided key), so expected shard = key % n
    assert (ok[osel] % n == shard_of_row[osel]).all()


def test_distributed_step_matches_single_device():
    mesh = make_mesh(8)
    step = jax.jit(distributed_query_step(mesh))
    from jax.sharding import NamedSharding, PartitionSpec as P

    n, cap = 8, 128
    total = n * cap
    rng = np.random.default_rng(1)
    qty = rng.integers(100, 5100, total).astype(np.int64)
    price = rng.integers(90_000, 200_000, total).astype(np.int64)
    disc = rng.integers(0, 1100, total).astype(np.int64)
    gkey = rng.integers(0, 8, total).astype(np.int64)
    jkey = rng.integers(0, 64, total).astype(np.int64)
    sel = rng.random(total) < 0.9
    dim_key = np.arange(64, dtype=np.int64)
    dim_factor = rng.integers(1, 5, 64).astype(np.int64)

    sh = NamedSharding(mesh, P("dp"))
    outs = step(*[jax.device_put(a, sh) for a in
                  (qty, price, disc, gkey, jkey, sel)],
                jax.device_put(dim_key, sh), jax.device_put(dim_factor, sh))
    final_sum, final_cnt, total_rows, dropped = outs
    assert int(np.sum(np.asarray(dropped))) == 0

    # single-device reference
    keep = sel & (qty < 2400) & (disc > 0)
    factor = dim_factor[jkey]  # all jkey in range
    revenue = price * (10000 - disc) // 10000 * factor
    ref_sum = np.zeros(8, dtype=np.int64)
    ref_cnt = np.zeros(8, dtype=np.int64)
    np.add.at(ref_sum, gkey[keep], revenue[keep])
    np.add.at(ref_cnt, gkey[keep], 1)

    # distributed outputs: per-shard [G] blocks, each group nonzero on exactly
    # its home shard
    fs = np.asarray(final_sum).reshape(n, -1)
    fc = np.asarray(final_cnt).reshape(n, -1)
    assert fs.sum(axis=0)[: 8].tolist() == ref_sum.tolist()
    assert fc.sum(axis=0)[: 8].tolist() == ref_cnt.tolist()
    assert int(total_rows) == int(keep.sum())


def test_shard_rows_partitions_by_hash():
    mesh = make_mesh(4)
    key = np.arange(1000, dtype=np.int64)
    arrays = {"v": key * 2}
    dev, sel = shard_rows(arrays, key, mesh)
    v = np.asarray(dev["v"])
    s = np.asarray(sel)
    assert s.sum() == 1000
    assert sorted(v[s].tolist()) == sorted((key * 2).tolist())
