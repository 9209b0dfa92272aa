"""Device-resident relations: capacity-padded columns + selection masks.

THE core data layout of the engine (the TPU answer to Arrow RecordBatches as
consumed by the reference's ExecutionPlan operators):

* a DeviceRelation holds one device array per column, all padded to ONE
  power-of-two `capacity` (bucket_capacity), plus a boolean selection mask
  `sel` marking live rows. Filters only flip mask bits; data-dependent row
  counts never change shapes, so every operator jits once per capacity.
* a DeviceColumn is (data, validity, dtype, dictionary, bounds, lengths,
  elem_valid):
    - scalar columns: data [capacity], optional validity [capacity]
      (Arrow-style NULL mask; padded/NULL slots hold 0 in data);
    - string columns: data are int32 codes into a host-side SORTED
      Dictionary (order-preserving, so comparisons/sorts work on codes);
    - list columns: data [capacity, width] (static max width), int32
      `lengths` per row, `elem_valid` [capacity, width] slot mask;
    - `bounds` is optional (lo, hi) interval metadata over the device
      representation (always containing 0, the padding value); interval
      propagation in the expression compiler keeps it alive, and the Pallas
      exact-i64 aggregation path uses it to prove factors fit int32.
* both are registered JAX pytrees: arrays are children (traced / sharded /
  transferred as a unit), while schema / dtype / dictionary (identity hash)
  / bounds ride as STATIC aux data — so a compiled program is reused exactly
  when the static metadata matches.

Reference analogs: selection-mask model replaces batch re-compaction
(CoalesceBatchesExec, physical-plan/src/coalesce_batches.rs); dictionary
encoding replaces ArrowBytesMap interning (physical-expr-common/src/
binary_map.rs:210); bounds replace interval_arithmetic metadata
(expr-common/src/interval_arithmetic.rs).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..common import types as T
from ..common.errors import PlanError
from ..common.schema import Schema
from .column import Dictionary, HostColumn
from .table import Table

_I32_MIN, _I32_MAX = -(2 ** 31), 2 ** 31 - 1


def bucket_capacity(n: int) -> int:
    """Smallest power of two >= n, with a floor of 128 (one TPU lane tile)."""
    n = max(int(n), 1)
    return max(1 << (n - 1).bit_length(), 128)


class DeviceColumn:
    """One column on device; see module docstring for the layout."""

    __slots__ = ("data", "validity", "dtype", "dictionary", "bounds",
                 "lengths", "elem_valid", "meta")

    def __init__(self, data, validity=None, dtype: Optional[T.DataType] = None,
                 dictionary: Optional[Dictionary] = None,
                 bounds: Optional[Tuple[int, int]] = None,
                 lengths=None, elem_valid=None, meta=None):
        self.data = data
        self.validity = validity
        self.dtype = dtype
        self.dictionary = dictionary
        self.bounds = bounds
        self.lengths = lengths
        self.elem_valid = elem_valid
        # static aux tag for host-side materialization, e.g.
        # ("string_agg", delim): 2-D code rows are dictionary-decoded and
        # joined with delim on download (to_host)
        self.meta = meta

    def sort_bounds(self) -> Optional[Tuple[int, int]]:
        """(lo, hi) covering the column's whole physical device array (dead
        slots included), for packing this column as a fixed-width field of a
        single int64 sort key: integer interval bounds, the code range of
        dictionary-encoded strings (codes are order-preserving), (0, 1) for
        bools. None when unbounded (floats / raw i64 with no metadata)."""
        if self.data.ndim != 1:
            return None
        if self.dictionary is not None:
            return (0, max(int(self.dictionary.size) - 1, 0))
        if self.data.dtype == jnp.bool_:
            return (0, 1)
        if self.bounds is not None and jnp.issubdtype(self.data.dtype,
                                                      jnp.integer):
            return (int(self.bounds[0]), int(self.bounds[1]))
        return None

    # ---- shape -----------------------------------------------------------
    @property
    def capacity(self) -> int:
        return int(self.data.shape[0])

    @property
    def width(self) -> int:
        """Static max list width (1 for scalar columns)."""
        return int(self.data.shape[1]) if self.data.ndim == 2 else 1

    # ---- masks -------------------------------------------------------------
    def valid(self):
        """Row validity as a concrete mask (all-true when validity is None)."""
        if self.validity is not None:
            return self.validity
        return jnp.ones(self.data.shape[0], dtype=jnp.bool_)

    def slot_valid(self):
        """[capacity, width] mask of live list slots."""
        if self.elem_valid is not None:
            return self.elem_valid
        cap, w = self.data.shape[0], self.width
        if self.lengths is not None:
            iota = jnp.arange(w, dtype=jnp.int32)[None, :]
            return iota < self.lengths[:, None]
        return jnp.ones((cap, w), dtype=jnp.bool_)

    def list_lengths(self):
        """Per-row list length (int32)."""
        if self.lengths is not None:
            return self.lengths
        cap, w = self.data.shape[0], self.width
        if self.elem_valid is not None:
            return jnp.sum(self.elem_valid, axis=1, dtype=jnp.int32)
        return jnp.full(cap, w, dtype=jnp.int32)

    # ---- metadata ----------------------------------------------------------
    def fits_i32(self) -> bool:
        """True when every value (including the 0 padding) provably fits
        int32 — from the device dtype or the static bounds interval."""
        dt = np.dtype(self.data.dtype)
        if dt.kind in ("b", "i") and dt.itemsize <= 4:
            return True
        if self.bounds is None:
            return False
        lo, hi = self.bounds
        return lo >= _I32_MIN and hi <= _I32_MAX

    def __repr__(self) -> str:
        shape = getattr(self.data, "shape", None)
        return (f"DeviceColumn({self.dtype!r}, shape={shape}, "
                f"nullable={self.validity is not None})")


def _col_flatten(c: DeviceColumn):
    return ((c.data, c.validity, c.lengths, c.elem_valid),
            (c.dtype, c.dictionary, c.bounds, c.meta))


def _col_unflatten(aux, children):
    data, validity, lengths, elem_valid = children
    dtype, dictionary, bounds, meta = aux
    return DeviceColumn(data, validity, dtype, dictionary, bounds,
                        lengths, elem_valid, meta)


jax.tree_util.register_pytree_node(DeviceColumn, _col_flatten, _col_unflatten)


class DeviceRelation:
    """A set of equally-padded DeviceColumns + the live-row selection mask."""

    __slots__ = ("schema", "columns", "sel")

    def __init__(self, schema: Schema, columns: Sequence[DeviceColumn], sel):
        self.schema = schema
        self.columns = tuple(columns)
        self.sel = sel

    @property
    def capacity(self) -> int:
        return int(self.sel.shape[0])

    def num_rows(self):
        """Live row count (traced scalar under jit)."""
        return jnp.sum(self.sel.astype(jnp.int64))

    def with_sel(self, sel) -> "DeviceRelation":
        return DeviceRelation(self.schema, self.columns, sel)

    def column(self, name: str) -> DeviceColumn:
        i = self.schema.find(name)
        if i is None:
            raise PlanError(
                f"column {name!r} not found; available: "
                f"{[f.qualified_name for f in self.schema.fields]}")
        return self.columns[i]

    def __repr__(self) -> str:
        return f"DeviceRelation[cap={self.sel.shape[0]}, {self.schema!r}]"


def _rel_flatten(r: DeviceRelation):
    return ((r.columns, r.sel), r.schema)


def _rel_unflatten(schema, children):
    columns, sel = children
    return DeviceRelation(schema, columns, sel)


jax.tree_util.register_pytree_node(DeviceRelation, _rel_flatten, _rel_unflatten)


# ---------------------------------------------------------------------------
# host <-> device conversion
# ---------------------------------------------------------------------------


def table_bounds(table: Table) -> List[Optional[Tuple[int, int]]]:
    """Per-column (lo, hi) device-representation bounds for integer-like
    columns (always containing 0, the padding value); None elsewhere.
    Shared by every chunk of a chunked scan so per-chunk static metadata is
    identical (one compile per transform)."""
    out: List[Optional[Tuple[int, int]]] = []
    for f, c in zip(table.schema.fields, table.columns):
        t = f.dtype
        if not (t.is_integer or t.is_decimal or t.is_temporal):
            out.append(None)
            continue
        data = np.asarray(c.data)
        if data.dtype == object or data.ndim != 1:
            out.append(None)
            continue
        live = data if c.validity is None else data[c.validity]
        if live.size == 0:
            out.append((0, 0))
            continue
        out.append((min(int(live.min()), 0), max(int(live.max()), 0)))
    return out


def _list_device_arrays(rows: np.ndarray, elem: T.DataType, cap: int):
    """Pad an object array of per-row lists to [cap, width] + lengths +
    elem_valid."""
    n = len(rows)
    width = 1
    for r in rows:
        if r is not None and len(r) > width:
            width = len(r)
    if elem.is_list:
        # nested list: recurse to inner [cap*width, w2] then fold to 3-D
        # (cap, width, w2). Inner lengths collapse to full-width rendering
        # (one nesting level of length metadata in the lane-matrix layout).
        inner_rows = np.empty(n * width, dtype=object)
        for i in range(n):
            r = rows[i]
            for j in range(width):
                inner_rows[i * width + j] = (
                    r[j] if r is not None and j < len(r) else None)
        idata, _il, _iev = _list_device_arrays(
            inner_rows, elem.elem, n * width)
        w2 = idata.shape[1]
        data = np.zeros((cap, width, w2), dtype=idata.dtype)
        data[:n] = idata.reshape(n, width, w2)
    else:
        data = np.zeros((cap, width), dtype=elem.np_dtype())
    ev = np.zeros((cap, width), dtype=bool)
    lengths = np.zeros(cap, dtype=np.int32)
    for i in range(n):
        r = rows[i]
        if r is None:
            continue
        lengths[i] = len(r)
        for j, x in enumerate(r):
            if x is None:
                continue
            if not elem.is_list:
                data[i, j] = x
            ev[i, j] = True
    return data, lengths, ev


def to_device(table: Table, capacity: Optional[int] = None, device=None,
              row_range: Optional[Tuple[int, int]] = None,
              bounds: Optional[List[Optional[Tuple[int, int]]]] = None
              ) -> DeviceRelation:
    """Upload a host Table as a capacity-padded DeviceRelation.

    row_range=(lo, hi) uploads only that slice (chunked scans); `bounds`
    overrides the computed per-column bounds so all chunks of one scan share
    identical static metadata. NULL slots are normalized to 0 in data (the
    padding value), so bounds always contain 0 and hashing/packing never
    sees uninitialized values."""
    lo, hi = row_range if row_range is not None else (0, table.num_rows)
    n = hi - lo
    cap = capacity if capacity is not None else bucket_capacity(max(n, 1))
    if n > cap:
        raise PlanError(f"row range {n} exceeds capacity {cap}")
    if bounds is None:
        bounds = table_bounds(table)

    cols: List[DeviceColumn] = []
    for f, c, b in zip(table.schema.fields, table.columns, bounds):
        t = f.dtype
        validity = None
        if c.validity is not None:
            validity = np.zeros(cap, dtype=bool)
            validity[:n] = c.validity[lo:hi]
        if t.is_list:
            data, lengths, ev = _list_device_arrays(c.data[lo:hi], t.elem, cap)
            cols.append(DeviceColumn(data, validity, t, c.dictionary, None,
                                     lengths, ev))
            continue
        data = np.zeros(cap, dtype=t.np_dtype())
        chunk = np.asarray(c.data[lo:hi])
        if chunk.dtype != data.dtype:
            chunk = chunk.astype(data.dtype)
        if c.validity is not None:
            chunk = np.where(c.validity[lo:hi], chunk, data.dtype.type(0))
        data[:n] = chunk
        cols.append(DeviceColumn(data, validity, t, c.dictionary, b))

    sel = np.zeros(cap, dtype=bool)
    sel[:n] = True
    rel = DeviceRelation(table.schema, tuple(cols), sel)
    if device is not None:
        return jax.device_put(rel, device)
    return jax.device_put(rel)


def to_host(rel: DeviceRelation) -> Table:
    """Download a DeviceRelation as a host Table holding only the LIVE rows
    (in capacity order)."""
    host = jax.device_get(rel)
    sel = np.asarray(host.sel)
    cols: List[HostColumn] = []
    for f, c in zip(rel.schema.fields, host.columns):
        data = np.asarray(c.data)
        v = None if c.validity is None else np.asarray(c.validity)[sel]
        if c.meta is not None and c.meta[0] == "string_agg":
            # [cap, W] dictionary codes + lengths: decode and join with the
            # delimiter host-side (device cannot mint new strings)
            delim = c.meta[1]
            words = c.dictionary.values if c.dictionary is not None else np.array([], object)
            lengths = np.asarray(c.lengths)[sel] if c.lengths is not None else \
                np.full(int(sel.sum()), data.shape[1], dtype=np.int32)
            d2 = data[sel]
            rows = np.empty(len(d2), dtype=object)
            for i in range(len(d2)):
                if v is not None and not v[i]:
                    rows[i] = None
                else:
                    rows[i] = delim.join(str(words[d2[i, j]])
                                         for j in range(int(lengths[i])))
            from .column import column_from_values

            cols.append(column_from_values(list(rows), f.dtype))
            continue
        if f.dtype.is_list:
            if c.lengths is not None:
                lengths = np.asarray(c.lengths)
            elif c.elem_valid is not None:
                lengths = np.sum(np.asarray(c.elem_valid), axis=1).astype(np.int32)
            else:
                lengths = np.full(data.shape[0], data.shape[1], dtype=np.int32)
            if c.elem_valid is not None:
                ev = np.asarray(c.elem_valid)
            else:
                ev = (np.arange(data.shape[1])[None, :] < lengths[:, None])
            data2, lengths2, ev2 = data[sel], lengths[sel], ev[sel]
            rows = np.empty(len(data2), dtype=object)
            for i in range(len(data2)):
                ln = int(lengths2[i])
                # nested lists (List(List(..)): 3-D+ lane tensor) render the
                # inner dims at full width — inner lengths are not tracked
                # past one nesting level in the lane-matrix layout
                rows[i] = [(data2[i, j].item() if data2.ndim == 2
                            else data2[i, j].tolist()) if ev2[i, j] else None
                           for j in range(ln)]
            if v is not None:
                for i in np.nonzero(~v)[0]:
                    rows[i] = None
            cols.append(HostColumn(f.dtype, rows, v, c.dictionary))
            continue
        cols.append(HostColumn(f.dtype, data[sel], v, c.dictionary))
    return Table(rel.schema, cols)


def empty_relation(schema: Schema) -> DeviceRelation:
    """An all-dead relation of minimal capacity (every column NULL-capable,
    so PlaceholderRow semantics read NULL from any column)."""
    cap = bucket_capacity(1)
    validity = np.zeros(cap, dtype=bool)
    cols: List[DeviceColumn] = []
    for f in schema.fields:
        t = f.dtype
        d = Dictionary(np.array([], dtype=object)) if t.is_string else None
        if t.is_list:
            cols.append(DeviceColumn(
                np.zeros((cap, 1), dtype=t.elem.np_dtype()), validity, t, d,
                None, np.zeros(cap, dtype=np.int32),
                np.zeros((cap, 1), dtype=bool)))
        else:
            cols.append(DeviceColumn(np.zeros(cap, dtype=t.np_dtype()),
                                     validity, t, d, (0, 0) if _boundable(t) else None))
    sel = np.zeros(cap, dtype=bool)
    return jax.device_put(DeviceRelation(schema, tuple(cols), sel))


def _boundable(t: T.DataType) -> bool:
    return t.is_integer or t.is_decimal or t.is_temporal
