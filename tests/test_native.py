"""Native C++ dictionary encoder: correctness vs the numpy path + speed."""
import time

import numpy as np
import pytest

from datafusion_tpu.native import dict_encode_arrow, load_library


@pytest.mark.skipif(load_library() is None, reason="no C++ toolchain")
def test_native_dict_encode_matches_numpy():
    import pyarrow as pa

    rng = np.random.default_rng(0)
    words = np.array([f"w{i:04d}" for i in range(500)])
    vals = words[rng.integers(0, len(words), 20000)]
    arr = pa.array(vals.tolist(), type=pa.string())
    codes, uniq = dict_encode_arrow(arr)
    # sorted dictionary, order-preserving codes
    assert list(uniq) == sorted(set(vals.tolist()))
    decoded = np.asarray(uniq, dtype=object)[codes]
    assert (decoded == vals).all()


@pytest.mark.skipif(load_library() is None, reason="no C++ toolchain")
def test_native_encode_speed_vs_numpy():
    import pyarrow as pa

    rng = np.random.default_rng(1)
    words = np.array([f"value_{i:06d}" for i in range(50_000)])
    vals = words[rng.integers(0, len(words), 1_000_000)]
    arr = pa.array(vals.tolist(), type=pa.string())

    t0 = time.perf_counter()
    codes, uniq = dict_encode_arrow(arr)
    native_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    nuniq = np.unique(vals)
    ncodes = np.searchsorted(nuniq, vals)
    numpy_s = time.perf_counter() - t0

    assert (codes == ncodes).all()
    assert list(uniq) == nuniq.tolist()
    # informational; native should win clearly on realistic data
    print(f"native {native_s*1000:.0f}ms vs numpy {numpy_s*1000:.0f}ms")
    assert native_s < numpy_s * 2  # never pathologically slower


def test_engine_uses_native_path_transparently():
    from datafusion_tpu.context import SessionContext

    n = 5000
    data = {"s": [f"k{i % 97}" for i in range(n)], "v": list(range(n))}
    ctx = SessionContext()
    ctx.register_table("t", data)
    out = ctx.sql("SELECT s, count(*) AS c FROM t GROUP BY s ORDER BY s LIMIT 3").to_pydict()
    assert out["s"] == ["k0", "k1", "k10"]
