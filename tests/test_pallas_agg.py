"""Pallas fused 64-bit grouped product-sum kernel: interpret-mode correctness
(real-TPU execution is covered by bench.py runs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from datafusion_tpu.ops import pallas_agg as PA


def test_emulated_mul_and_pair_roundtrip():
    rng = np.random.default_rng(0)
    a = rng.integers(-(2**31), 2**31, 4096).astype(np.int32)
    b = rng.integers(-(2**31), 2**31, 4096).astype(np.int32)
    hi, lo = PA.smul32x32(jnp.asarray(a).reshape(32, 128), jnp.asarray(b).reshape(32, 128))
    got = np.asarray(PA.pair_to_i64(hi, lo)).reshape(-1)
    want = a.astype(np.int64) * b.astype(np.int64)
    assert (got == want).all()


@pytest.mark.parametrize("seed", range(3))
def test_dense_groupby_sums_interpret(seed):
    rng = np.random.default_rng(seed)
    N = 4096
    G = 6
    seg = rng.integers(0, G + 1, N).astype(np.int32)  # G = dropped
    mask = rng.random(N) < 0.9
    a1 = rng.integers(-10_000_000, 10_000_000, N).astype(np.int32)
    b1 = rng.integers(0, 10_000, N).astype(np.int32)
    a2 = rng.integers(0, 2**31 - 1, N).astype(np.int32)

    sums, cnt = PA.dense_groupby_sums(
        jnp.asarray(seg), jnp.asarray(mask),
        [(jnp.asarray(a1), jnp.asarray(b1)), (jnp.asarray(a2), None)],
        G, interpret=True,
    )
    sums = np.asarray(sums)
    cnt = np.asarray(cnt)

    live = mask & (seg < G)
    want1 = np.zeros(G, dtype=np.int64)
    want2 = np.zeros(G, dtype=np.int64)
    wcnt = np.zeros(G, dtype=np.int64)
    np.add.at(want1, seg[live], a1[live].astype(np.int64) * b1[live])
    np.add.at(want2, seg[live], a2[live].astype(np.int64))
    np.add.at(wcnt, seg[live], 1)
    assert sums[:, 0].tolist() == want1.tolist()
    assert sums[:, 1].tolist() == want2.tolist()
    assert cnt.tolist() == wcnt.tolist()


def test_dense_groupby_sums_big_values_no_overflow():
    # sums far beyond 2^32: exercise the carry path
    N = 2048
    G = 2
    seg = np.zeros(N, dtype=np.int32)
    mask = np.ones(N, dtype=bool)
    a = np.full(N, 2**30, dtype=np.int32)
    b = np.full(N, 1000, dtype=np.int32)
    sums, cnt = PA.dense_groupby_sums(
        jnp.asarray(seg), jnp.asarray(mask), [(jnp.asarray(a), jnp.asarray(b))],
        G, interpret=True,
    )
    want = N * (2**30) * 1000
    assert int(sums[0, 0]) == want
    assert int(cnt[0]) == N


def test_global_aggregate_routes_through_pallas(monkeypatch):
    """A no-GROUP-BY sum of a decimal product takes the single-segment
    Pallas path (exact i64 accumulation); empty input still yields one row."""
    monkeypatch.setenv("DATAFUSION_TPU_FORCE_PALLAS", "interpret")
    from datafusion_tpu.context import SessionContext

    ctx = SessionContext()
    n = 2048  # capacity must be a multiple of 2048 for the kernel
    price = [round(10.0 + i * 0.01, 2) for i in range(n)]
    disc = [round((i % 10) * 0.01, 2) for i in range(n)]
    from datafusion_tpu.common import types as T
    from datafusion_tpu.data.table import Table

    ctx.register_table("l", Table.from_pydict(
        {"p": price, "d": disc, "q": list(range(n))},
        types={"p": T.decimal(12, 2), "d": T.decimal(12, 2)}))
    out = ctx.sql("select sum(p * (1 - d)) s, count(*) c, avg(q) a from l").to_pydict()
    want = sum(p * (1 - d) for p, d in zip(price, disc))
    assert abs(out["s"][0] - want) < 1e-6
    assert out["c"][0] == n
    assert abs(out["a"][0] - (n - 1) / 2) < 1e-9
    empty = ctx.sql("select sum(p) s, count(*) c from l where q < 0").to_pydict()
    assert empty["s"] == [None] and empty["c"] == [0]
