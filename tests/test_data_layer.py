import numpy as np
import pytest

from datafusion_tpu.common import types as T
from datafusion_tpu.data.column import column_from_values
from datafusion_tpu.data.device import bucket_capacity, to_device, to_host
from datafusion_tpu.data.table import Table


def test_bucket_capacity():
    assert bucket_capacity(0) == 128
    assert bucket_capacity(128) == 128
    assert bucket_capacity(129) == 256
    assert bucket_capacity(6_001_215) == 2**23


def test_table_roundtrip_ints_floats():
    t = Table.from_pydict({"a": [1, 2, 3], "b": [1.5, None, 2.5]})
    assert t.num_rows == 3
    rel = to_device(t)
    assert rel.capacity == 128
    back = to_host(rel)
    d = back.to_pydict()
    assert d["a"] == [1, 2, 3]
    assert d["b"][0] == 1.5 and d["b"][1] is None


def test_string_dictionary_sorted():
    t = Table.from_pydict({"s": ["pear", "apple", "pear", None, "fig"]})
    c = t.column("s")
    assert c.dtype.is_string
    assert list(c.dictionary.values) == ["apple", "fig", "pear"]
    # codes preserve lexicographic order
    assert c.data[1] < c.data[4] < c.data[0]
    vals = c.to_numpy_logical()
    assert vals[0] == "pear" and vals[3] is None


def test_decimal_scaled_int():
    t = Table.from_pydict({"d": [1.25, 2.5]}, {"d": T.decimal(15, 2)})
    c = t.column("d")
    assert c.data.dtype == np.int64
    assert list(c.data) == [125, 250]
    assert list(c.to_numpy_logical()) == [1.25, 2.5]


def test_arrow_roundtrip():
    import pyarrow as pa

    at = pa.table({
        "i": pa.array([1, 2, None], pa.int64()),
        "s": pa.array(["x", None, "y"]),
        "d": pa.array([1, 2, 3], pa.int32()),
    })
    t = Table.from_arrow(at)
    d = t.to_pydict()
    assert d["i"] == [1, 2, None]
    assert d["s"] == ["x", None, "y"]
    assert d["d"] == [1, 2, 3]
