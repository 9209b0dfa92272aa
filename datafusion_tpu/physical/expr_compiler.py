"""Vectorized expression evaluation over device relations.

Capability analog of the reference's PhysicalExpr tree
(datafusion/physical-expr/src/physical_expr.rs + expressions/*): each logical
Expr is evaluated into a DeviceColumn with Arrow-style null semantics
(three-valued logic for AND/OR, null-propagating arithmetic/comparison).

Evaluation is *traceable*: all dictionary work (string literal encoding, LIKE
lookup tables, dictionary merges) runs at trace time on static metadata and
becomes device constants; all row-wise work is jnp ops that XLA fuses.  An
operator wraps eval_expr in jit, so each distinct (plan, capacity) pair
compiles once -- the analog of the reference compiling a PhysicalExpr once per
plan rather than per batch.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..common import types as T
from ..common.errors import PlanError
from ..common.schema import Schema
from ..data.column import Dictionary
from ..data.device import DeviceColumn, DeviceRelation
from ..expr import nodes as E
from ..expr.typing import arith_result, infer
from ..utils import dates as DU
from . import functions as F

# dictionary-merge memo keyed by identity of the two dictionaries; bounded
# LRU so long-lived sessions over many files cannot pin dictionaries forever
import collections

_MERGE_CACHE: "collections.OrderedDict" = collections.OrderedDict()
_MERGE_CACHE_LIMIT = 256


def merge_dictionaries(a: Dictionary, b: Dictionary):
    """Merged sorted dictionary + code translation arrays for both inputs.

    A live cache entry PINS the input dictionaries: the key is id()-based,
    so letting cached inputs be garbage-collected would allow address reuse
    to serve a stale (wrong) mapping for a different dictionary.  Evicted
    entries release their pins safely (the key disappears with the entry)."""
    key = (id(a), id(b))
    hit = _MERGE_CACHE.get(key)
    if hit is not None:
        _MERGE_CACHE.move_to_end(key)
        return hit[2:]
    from ..data.column import as_text_array, is_bytes_values

    if is_bytes_values(a.values) or is_bytes_values(b.values):
        # bytes dictionaries merge in Python (numpy "S" drops trailing NULs)
        mlist = sorted({bytes(v) for v in a.values}
                       | {bytes(v) for v in b.values})
        lut = {v: i for i, v in enumerate(mlist)}
        amap = np.array([lut[bytes(v)] for v in a.values], dtype=np.int32)
        bmap = np.array([lut[bytes(v)] for v in b.values], dtype=np.int32)
        entry = (a, b, Dictionary(np.array(mlist, dtype=object)), amap, bmap)
        _MERGE_CACHE[key] = entry
        while len(_MERGE_CACHE) > _MERGE_CACHE_LIMIT:
            _MERGE_CACHE.popitem(last=False)
        return entry[2:]
    av = as_text_array(a.values) if len(a.values) else np.array([], "U1")
    bv = as_text_array(b.values) if len(b.values) else np.array([], "U1")
    merged = np.union1d(av, bv)
    amap = np.searchsorted(merged, av).astype(np.int32)
    bmap = np.searchsorted(merged, bv).astype(np.int32)
    entry = (a, b, Dictionary(merged.astype(object)), amap, bmap)
    _MERGE_CACHE[key] = entry
    while len(_MERGE_CACHE) > _MERGE_CACHE_LIMIT:
        _MERGE_CACHE.popitem(last=False)
    return entry[2:]


def _translate_codes(col: DeviceColumn, mapping: np.ndarray, merged: Dictionary) -> DeviceColumn:
    t = col.dtype if col.dtype is not None and col.dtype.is_string else T.STRING
    if len(mapping) == 0:
        return DeviceColumn(jnp.zeros_like(col.data), col.validity, t, merged)
    codes = jnp.asarray(mapping)[jnp.clip(col.data, 0, len(mapping) - 1)]
    return DeviceColumn(codes, col.validity, t, merged)


def unify_many_string_columns(cols):
    """Re-encode string columns onto one merged dictionary (n-way)."""
    dicts = [c.dictionary for c in cols]
    ids = {id(d) for d in dicts if d is not None}
    if len(ids) <= 1 and all(d is not None for d in dicts):
        return list(cols)
    uniq = []
    seen = set()
    for d in dicts:
        if d is not None and id(d) not in seen:
            seen.add(id(d))
            uniq.append(d)
    from ..data.column import as_text_array, is_bytes_values

    if any(is_bytes_values(d.values) for d in uniq):
        mlist = sorted({bytes(v) for d in uniq for v in d.values})
        lut = {v: i for i, v in enumerate(mlist)}
        merged = Dictionary(np.array(mlist, dtype=object))
        maps = {id(d): np.array([lut[bytes(v)] for v in d.values],
                                dtype=np.int32) for d in uniq}
    else:
        vals = [as_text_array(d.values) for d in uniq if len(d.values)]
        merged_np = (np.unique(np.concatenate(vals)) if vals
                     else np.array([], "U1"))
        merged = Dictionary(merged_np.astype(object))
        maps = {}
        for d in uniq:
            dv = (as_text_array(d.values) if len(d.values)
                  else np.array([], merged_np.dtype))
            maps[id(d)] = np.searchsorted(merged_np, dv).astype(np.int32)
    out = []
    for c in cols:
        if c.dictionary is None:
            out.append(DeviceColumn(jnp.zeros_like(c.data), c.validity, T.STRING, merged))
        else:
            out.append(_translate_codes(c, maps[id(c.dictionary)], merged))
    return out


def unify_string_columns(l: DeviceColumn, r: DeviceColumn) -> Tuple[DeviceColumn, DeviceColumn]:
    if l.dictionary is r.dictionary and l.dictionary is not None:
        return l, r
    dl = l.dictionary or Dictionary(np.array([], dtype=object))
    dr = r.dictionary or Dictionary(np.array([], dtype=object))
    merged, ml, mr = merge_dictionaries(dl, dr)
    return _translate_codes(l, ml, merged), _translate_codes(r, mr, merged)


def _combine_validity(*vs: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    out = None
    for v in vs:
        if v is not None:
            out = v if out is None else (out & v)
    return out


def _to_float(col: DeviceColumn) -> jnp.ndarray:
    if col.dtype.is_decimal:
        return col.data.astype(jnp.float64) / (10.0 ** col.dtype.scale)
    return col.data.astype(jnp.float64)


def _bounds_binop(op, b1, b2):
    """Interval propagation for +,-,* (reference analog: interval_arithmetic,
    datafusion/expr-common/src/interval_arithmetic.rs)."""
    if b1 is None or b2 is None:
        return None
    lo1, hi1 = b1
    lo2, hi2 = b2
    if op is E.Op.ADD:
        return (lo1 + lo2, hi1 + hi2)
    if op is E.Op.SUB:
        return (lo1 - hi2, hi1 - lo2)
    if op is E.Op.MUL:
        corners = (lo1 * lo2, lo1 * hi2, hi1 * lo2, hi1 * hi2)
        return (min(corners), max(corners))
    return None


def _scale_bounds(b, from_scale: int, to_scale: int):
    if b is None:
        return None
    if to_scale >= from_scale:
        f = 10 ** (to_scale - from_scale)
        return (b[0] * f, b[1] * f)
    f = 10 ** (from_scale - to_scale)
    return (b[0] // f - 1, b[1] // f + 1)


def _rescale_decimal(data: jnp.ndarray, from_scale: int, to_scale: int) -> jnp.ndarray:
    if to_scale == from_scale:
        return data
    if to_scale > from_scale:
        return data * (10 ** (to_scale - from_scale))
    return data // (10 ** (from_scale - to_scale))


def cast_column(col: DeviceColumn, dtype: T.DataType, capacity: int) -> DeviceColumn:
    if col.dtype == dtype:
        return col
    v = col.validity
    if dtype.is_string:
        if col.dtype.is_string:
            if col.dtype.kind == dtype.kind:
                return col
            # utf8 <-> bytes: re-encode the dictionary host-side; byte order
            # can differ from str order, so codes re-map through a sorted
            # new dictionary
            d = col.dictionary
            old = (list(d.values) if d is not None and len(d.values) else [])
            new_vals = []
            ok = []
            for s in old:
                try:
                    new_vals.append(s.encode("utf-8") if dtype.is_binary
                                    else s.decode("utf-8"))
                    ok.append(True)
                except (UnicodeDecodeError, UnicodeEncodeError, AttributeError):
                    new_vals.append(b"" if dtype.is_binary else "")
                    ok.append(False)
            uniq = sorted(set(new_vals))
            lutmap = {s: i for i, s in enumerate(uniq)}
            code_map = np.array([lutmap[s] for s in new_vals] or [0],
                                dtype=np.int32)
            okarr = np.array(ok or [True])
            codes = jnp.asarray(code_map)[jnp.clip(col.data, 0,
                                                   len(code_map) - 1)]
            valid2 = jnp.asarray(okarr)[jnp.clip(col.data, 0,
                                                 len(okarr) - 1)]
            v2 = _combine_validity(v, valid2) if not all(ok) else v
            return DeviceColumn(codes, v2, dtype,
                                Dictionary(np.array(uniq, dtype=object)))
        if col.dtype.kind is T.TypeKind.NULL:
            # cast of an untyped NULL (arrow_cast(NULL, 'Utf8')): all-null
            # string column
            return DeviceColumn(jnp.zeros(capacity, jnp.int32),
                                jnp.zeros(capacity, jnp.bool_), dtype,
                                Dictionary(np.array([], object)))
        raise PlanError(f"cast {col.dtype} -> string not supported on device")
    if col.dtype.is_string:
        d = col.dictionary
        if col.dtype.is_binary:
            raise PlanError(f"cast binary -> {dtype} not supported")
        vals = np.asarray(d.values, dtype="U") if d and len(d.values) else np.array([], "U1")
        if dtype.kind is T.TypeKind.DATE32:
            lut = DU.dates_from_strings(vals) if len(vals) else np.zeros(1, np.int32)
        elif dtype.kind is T.TypeKind.TIMESTAMP:
            lut = vals.astype("datetime64[us]").astype(np.int64) if len(vals) else np.zeros(1, np.int64)
        elif dtype.kind is T.TypeKind.TIME:
            lut = DU.times_from_strings(vals) if len(vals) else np.zeros(1, np.int64)
        elif dtype.is_numeric:
            fl = vals.astype(np.float64) if len(vals) else np.zeros(1)
            if dtype.is_decimal:
                lut = np.rint(fl * 10 ** dtype.scale).astype(np.int64)
            else:
                lut = fl.astype(dtype.np_dtype())
        else:
            raise PlanError(f"cast string -> {dtype} not supported")
        data = jnp.asarray(lut)[jnp.clip(col.data, 0, len(lut) - 1)]
        return DeviceColumn(data, v, dtype)
    if dtype.is_decimal:
        if col.dtype.is_decimal:
            return DeviceColumn(_rescale_decimal(col.data, col.dtype.scale, dtype.scale), v, dtype,
                                bounds=_scale_bounds(col.bounds, col.dtype.scale, dtype.scale))
        if col.dtype.is_float:
            return DeviceColumn(jnp.rint(col.data * 10 ** dtype.scale).astype(jnp.int64), v, dtype)
        return DeviceColumn(col.data.astype(jnp.int64) * (10 ** dtype.scale), v, dtype)
    if col.dtype.is_decimal:
        if dtype.is_float:
            return DeviceColumn(_to_float(col).astype(dtype.np_dtype()), v, dtype)
        # decimal -> int truncates toward zero
        q = col.data // (10 ** col.dtype.scale)
        neg_fix = ((col.data % (10 ** col.dtype.scale)) != 0) & (col.data < 0)
        return DeviceColumn((q + neg_fix.astype(q.dtype)).astype(dtype.np_dtype()), v, dtype)
    if dtype.kind is T.TypeKind.TIME and col.dtype.kind is T.TypeKind.TIMESTAMP:
        us_day = np.int64(86_400_000_000)
        return DeviceColumn(((col.data % us_day) + us_day) % us_day, v, dtype)
    if dtype.kind is T.TypeKind.TIMESTAMP and col.dtype.kind is T.TypeKind.DATE32:
        return DeviceColumn(col.data.astype(jnp.int64) * np.int64(86_400_000_000), v, dtype)
    if dtype.kind is T.TypeKind.DATE32 and col.dtype.kind is T.TypeKind.TIMESTAMP:
        return DeviceColumn((col.data // np.int64(86_400_000_000)).astype(jnp.int32), v, dtype)
    # integer-representation casts (int widths, int<->date) keep the ordinal
    # value, so interval bounds carry over -- this is what lets
    # extract()/joins/dense grouping see through CASTs
    b = None
    if col.bounds is not None \
            and jnp.issubdtype(col.data.dtype, jnp.integer) \
            and not col.dtype.is_float and dtype.np_dtype().kind in "iu" \
            and not dtype.is_float:
        info = np.iinfo(dtype.np_dtype())
        try:
            if info.min <= int(col.bounds[0]) and int(col.bounds[1]) <= info.max:
                b = col.bounds  # narrowing can't wrap: bounds prove fit
        except Exception:
            b = None
    return DeviceColumn(col.data.astype(dtype.np_dtype()), v, dtype, bounds=b)


# ---------------------------------------------------------------------------
# numeric/temporal -> string casts (discovery-time dictionaries)
# ---------------------------------------------------------------------------

# Overflow-flag sink for expression-level discovery caches: the fused
# executor (physical/fused.py) installs its _TraceCtx.flags list here while
# tracing, so a string-cast whose cached value table misses a live value can
# request re-discovery through the same protocol direct-join tables use.
_FLAG_SINK: Optional[list] = None


def set_flag_sink(sink):
    global _FLAG_SINK
    prev = _FLAG_SINK
    _FLAG_SINK = sink
    return prev


def render_strings(vals: np.ndarray, dtype: T.DataType,
                   fmt: Optional[str] = None) -> np.ndarray:
    """Host-side SQL rendering of concrete values: CAST(x AS VARCHAR) and
    to_char(x, fmt). Mirrors the Arrow display conventions the reference
    inherits (bool 'true'/'false', dates ISO, decimals at full scale;
    to_char: functions/src/datetime/to_char.rs, chrono = strftime here)."""
    k = dtype.kind
    if fmt is not None:
        if k is T.TypeKind.DATE32:
            objs = vals.astype("datetime64[D]").tolist()
        elif k is T.TypeKind.TIMESTAMP:
            objs = vals.astype("datetime64[us]").tolist()
        else:
            raise PlanError(f"to_char: unsupported input type {dtype}")
        return np.array([o.strftime(fmt) if o is not None else ""
                         for o in objs], dtype=object)
    if k is T.TypeKind.BOOL:
        return np.array(["true" if v else "false" for v in vals], dtype=object)
    if dtype.is_decimal:
        s = dtype.scale
        out = []
        for v in vals:
            v = int(v)
            if s == 0:
                out.append(str(v))
            else:
                sign = "-" if v < 0 else ""
                a = abs(v)
                out.append(f"{sign}{a // 10 ** s}.{a % 10 ** s:0{s}d}")
        return np.array(out, dtype=object)
    if dtype.is_integer:
        return np.array([str(int(v)) for v in vals], dtype=object)
    if dtype.is_float:
        return np.array([str(float(v)) for v in vals], dtype=object)
    if k is T.TypeKind.DATE32:
        return np.datetime_as_string(vals.astype("datetime64[D]")).astype(object)
    if k is T.TypeKind.TIMESTAMP:
        return np.datetime_as_string(vals.astype("datetime64[us]"),
                                     unit="auto").astype(object)
    if k is T.TypeKind.TIME:
        return np.array([DU.us_to_time_str(v) for v in vals], dtype=object)
    raise PlanError(f"cast {dtype} -> string not supported")


def string_cast_column(node, col: DeviceColumn, rel: DeviceRelation,
                       fmt: Optional[str] = None) -> DeviceColumn:
    """CAST(non-string AS VARCHAR) / to_char under the static-dictionary
    model: dictionaries are static pytree aux, so the value->string table is
    built host-side from the column's live DISTINCT values whenever data is
    concrete (discovery / per-op execution) and cached on the expr node; the
    traced program maps values to codes with a sorted-table lookup.  A live
    value absent from the cached table raises the fused overflow flag ->
    re-discovery rebuilds the dictionary (the direct-join staleness
    protocol, fused.py)."""
    import jax

    live = rel.sel
    if col.validity is not None:
        live = live & col.validity
    data = col.data
    if data.dtype == jnp.bool_:
        data = data.astype(jnp.int8)
    cache_key = (fmt, col.dtype)
    state = getattr(node, "_str_cast_state", None)
    if state is not None and state[0] != cache_key:
        state = None
    if not isinstance(data, jax.core.Tracer):
        vals = np.asarray(data)
        lv = vals[np.asarray(live)]
        uniq = np.unique(lv) if lv.size else np.zeros(1, vals.dtype)
        strs = render_strings(uniq, col.dtype, fmt)
        dict_vals, codes = np.unique(strs, return_inverse=True)
        state = (cache_key, uniq, codes.astype(np.int32),
                 Dictionary(np.asarray(dict_vals, dtype=object)))
        object.__setattr__(node, "_str_cast_state", state)  # frozen dataclass
    if state is None:
        raise PlanError(
            "string cast requires a concrete discovery pass before tracing")
    _, uniq, codes, dictionary = state
    table = jnp.asarray(uniq)
    d = data.astype(table.dtype)
    idx = jnp.clip(jnp.searchsorted(table, d), 0, len(uniq) - 1)
    got = table[idx]
    hit = got == d
    if jnp.issubdtype(table.dtype, jnp.floating):
        hit = hit | (jnp.isnan(got) & jnp.isnan(d))
    if _FLAG_SINK is not None:
        _FLAG_SINK.append(jnp.any(~hit & live))
    out_codes = jnp.where(hit, jnp.asarray(codes)[idx], 0).astype(jnp.int32)
    return DeviceColumn(out_codes, col.validity, T.STRING, dictionary)


def collect_string_cast_nodes(operator) -> Tuple[E.Expr, ...]:
    """Expr nodes inside an operator's expression attributes that need a
    host-built string dictionary (CAST(x AS VARCHAR) / to_char): operators
    evaluate expressions under jit, so PhysicalPlan._timed pre-builds their
    state against the concrete input relation before tracing."""
    out, seen = [], set()

    def walk(x):
        if id(x) in seen:
            return
        seen.add(id(x))
        if isinstance(x, E.Cast) and x.dtype.is_string:
            out.append(x)
        elif isinstance(x, E.ScalarFunction) and x.fname == "to_char":
            out.append(x)
        for c in x.children():
            walk(c)

    for v in vars(operator).values():
        if isinstance(v, E.Expr):
            walk(v)
        elif isinstance(v, (tuple, list)):
            for x in v:
                if isinstance(x, E.Expr):
                    walk(x)
    return tuple(out)


def prepare_string_casts(nodes: Tuple[E.Expr, ...], args) -> None:
    """Eagerly evaluate each node's input sub-expression against the first
    compatible concrete relation in args and (re)build its cached
    dictionary state via string_cast_column."""
    rels = [a for a in args if isinstance(a, DeviceRelation)]
    for node in nodes:
        src_expr = node.expr if isinstance(node, E.Cast) else node.args[0]
        fmt = None
        if isinstance(node, E.ScalarFunction):
            f = node.args[1]
            fmt = str(f.value) if isinstance(f, E.Literal) else None
        for rel in rels:
            try:
                src = eval_expr(src_expr, rel)
                if not src.dtype.is_string:
                    string_cast_column(node, src, rel, fmt=fmt)
                break
            except Exception:  # noqa: BLE001 -- try the next relation
                continue


def _literal_column(e: E.Literal, capacity: int) -> DeviceColumn:
    t = e.dtype
    if e.value is None:
        dt = t if t.kind is not T.TypeKind.NULL else T.INT64
        return DeviceColumn(
            jnp.zeros(capacity, dtype=dt.np_dtype()),
            jnp.zeros(capacity, dtype=jnp.bool_),
            dt,
        )
    if t.is_binary:
        d = Dictionary(np.array([bytes(e.value)], dtype=object))
        return DeviceColumn(jnp.zeros(capacity, dtype=jnp.int32), None,
                            T.BINARY, d)
    if t.is_string:
        d = Dictionary(np.array([str(e.value)], dtype=object))
        return DeviceColumn(jnp.zeros(capacity, dtype=jnp.int32), None, T.STRING, d)
    if t.is_decimal:
        raw = int(round(float(e.value) * 10 ** t.scale))
        return DeviceColumn(jnp.full(capacity, raw, jnp.int64), None, t,
                            bounds=(raw, raw))
    if t.kind is T.TypeKind.DATE32:
        v = e.value if isinstance(e.value, (int, np.integer)) else DU.date_str_to_days(str(e.value))
        return DeviceColumn(jnp.full(capacity, v, jnp.int32), None, t)
    if t.kind is T.TypeKind.TIMESTAMP:
        v = e.value if isinstance(e.value, (int, np.integer)) else int(np.datetime64(str(e.value), "us").astype(np.int64))
        return DeviceColumn(jnp.full(capacity, v, jnp.int64), None, t)
    b = (int(e.value), int(e.value)) if t.is_integer else None
    return DeviceColumn(jnp.full(capacity, e.value, t.np_dtype()), None, t, bounds=b)


_CMP = {
    E.Op.EQ: lambda a, b: a == b,
    E.Op.NEQ: lambda a, b: a != b,
    E.Op.LT: lambda a, b: a < b,
    E.Op.LE: lambda a, b: a <= b,
    E.Op.GT: lambda a, b: a > b,
    E.Op.GE: lambda a, b: a >= b,
}


def _unwrap_cast_comparison(e: E.BinaryOp, schema: Schema) -> E.BinaryOp:
    """Reference unwrap_cast_in_comparison analog (optimizer/src/
    simplify_expressions/unwrap_cast.rs): a float literal compared against a
    decimal expression is rewritten to a decimal literal AT THE DECIMAL
    SIDE'S SCALE (round half away from zero). The reference plans TPC-H Q6's
    `l_discount <= 0.06 + 0.01` as `l_discount <= Decimal128(0.07,15,2)` —
    without this, f64(0.06)+f64(0.01) = 0.0699..93 silently excludes the
    0.07 rows. Also restores exact int64 compares (bounds pruning) on TPU."""
    from ..expr.typing import infer

    def rewrite(lit: E.Literal, other: E.Expr):
        try:
            dt, _ = infer(other, schema)
        except Exception:  # noqa: BLE001 -- untypeable side: leave as-is
            return None
        if not dt.is_decimal or lit.value is None:
            return None
        import math

        v = float(lit.value)
        raw = math.floor(abs(v) * 10 ** dt.scale + 0.5)
        raw = -raw if v < 0 else raw
        return E.Literal(raw / 10 ** dt.scale, T.decimal(dt.precision,
                                                         dt.scale))

    l, r = e.left, e.right
    if isinstance(l, E.Literal) and l.dtype.is_float \
            and not isinstance(r, E.Literal):
        nl = rewrite(l, r)
        if nl is not None:
            return E.BinaryOp(e.op, nl, r)
    if isinstance(r, E.Literal) and r.dtype.is_float \
            and not isinstance(l, E.Literal):
        nr = rewrite(r, l)
        if nr is not None:
            return E.BinaryOp(e.op, l, nr)
    return e


def eval_binary(e: E.BinaryOp, l: DeviceColumn, r: DeviceColumn, schema: Schema) -> DeviceColumn:
    op = e.op
    if op.is_logic:
        vl = l.validity if l.validity is not None else None
        vr = r.validity if r.validity is not None else None
        ld, rd = l.data, r.data
        if op is E.Op.AND:
            lT = ld if vl is None else (ld | ~vl)
            rT = rd if vr is None else (rd | ~vr)
            data = lT & rT
            if vl is None and vr is None:
                valid = None
            else:
                vl_ = vl if vl is not None else jnp.ones_like(ld)
                vr_ = vr if vr is not None else jnp.ones_like(rd)
                valid = (vl_ & vr_) | (vl_ & ~ld) | (vr_ & ~rd)
        else:
            lF = ld if vl is None else (ld & vl)
            rF = rd if vr is None else (rd & vr)
            data = lF | rF
            if vl is None and vr is None:
                valid = None
            else:
                vl_ = vl if vl is not None else jnp.ones_like(ld)
                vr_ = vr if vr is not None else jnp.ones_like(rd)
                valid = (vl_ & vr_) | (vl_ & ld) | (vr_ & rd)
        return DeviceColumn(data, valid, T.BOOL)

    if op.is_comparison:
        # string literal vs temporal column: parse the string side as a date
        if l.dtype.is_string != r.dtype.is_string and (
                l.dtype.is_temporal or r.dtype.is_temporal):
            if l.dtype.is_string:
                l = cast_column(l, r.dtype, l.data.shape[0])
            else:
                r = cast_column(r, l.dtype, r.data.shape[0])
        if l.dtype.is_string or r.dtype.is_string:
            # binary vs utf8: coerce the utf8 side to bytes (reference
            # comparison coercion, binary.slt)
            if l.dtype.is_binary != r.dtype.is_binary \
                    and l.dtype.is_string and r.dtype.is_string:
                if l.dtype.is_binary:
                    r = cast_column(r, T.BINARY, r.data.shape[0])
                else:
                    l = cast_column(l, T.BINARY, l.data.shape[0])
            l2, r2 = unify_string_columns(l, r)
            data = _CMP[op](l2.data, r2.data)
        else:
            ld, rd = _align_numeric(l, r)
            data = _CMP[op](ld, rd)
        return DeviceColumn(data, _combine_validity(l.validity, r.validity), T.BOOL)

    # arithmetic
    valid = _combine_validity(l.validity, r.validity)
    lt, rt = l.dtype, r.dtype
    out_t = arith_result(op, lt, rt)

    # temporal arithmetic
    if lt.kind is T.TypeKind.DATE32 and rt.kind is T.TypeKind.INTERVAL_DAYS:
        delta = r.data if op is E.Op.ADD else -r.data
        return DeviceColumn(l.data + delta.astype(jnp.int32), valid, T.DATE32)
    if lt.kind is T.TypeKind.DATE32 and rt.kind is T.TypeKind.INTERVAL_MONTHS:
        months = r.data.astype(jnp.int64) if op is E.Op.ADD else -r.data.astype(jnp.int64)
        return DeviceColumn(DU.add_months(l.data, months), valid, T.DATE32)
    if lt.kind is T.TypeKind.DATE32 and rt.kind is T.TypeKind.INTERVAL_US:
        # date +/- sub-day interval stays Date32; arrow truncates the
        # interval to WHOLE days toward zero (arith_date_interval.slt:
        # '2001-09-28' - 25h -> 2001-09-27, +1h -> same date)
        day = np.int64(86_400_000_000)
        us = r.data.astype(jnp.int64)
        wd = (jnp.sign(us) * (jnp.abs(us) // day)).astype(jnp.int32)
        delta = wd if op is E.Op.ADD else -wd
        return DeviceColumn(l.data + delta, valid, T.DATE32)
    if lt.kind is T.TypeKind.INTERVAL_DAYS and rt.kind is T.TypeKind.DATE32 and op is E.Op.ADD:
        return DeviceColumn(r.data + l.data.astype(jnp.int32), valid, T.DATE32)
    if lt.kind is T.TypeKind.DATE32 and rt.kind is T.TypeKind.DATE32 and op is E.Op.SUB:
        return DeviceColumn(l.data - r.data, valid, T.INT32)
    if lt.kind is T.TypeKind.TIMESTAMP and rt.kind in (T.TypeKind.INTERVAL_US,
                                                       T.TypeKind.INTERVAL_DAYS):
        us = r.data.astype(jnp.int64)
        if rt.kind is T.TypeKind.INTERVAL_DAYS:
            us = us * np.int64(86_400_000_000)
        delta = us if op is E.Op.ADD else -us
        return DeviceColumn(l.data + delta, valid, T.TIMESTAMP)
    if lt.kind is T.TypeKind.TIME and rt.kind is T.TypeKind.INTERVAL_US:
        day = np.int64(86_400_000_000)
        delta = r.data.astype(jnp.int64) if op is E.Op.ADD else -r.data.astype(jnp.int64)
        return DeviceColumn(((l.data + delta) % day + day) % day, valid, T.TIME)

    if op is E.Op.DIV:
        if lt.is_integer and rt.is_integer:
            ld, rd = _align_numeric(l, r)
            safe = jnp.where(rd == 0, jnp.ones_like(rd), rd)
            q = jnp.where(rd == 0, jnp.zeros_like(ld), ld // safe)
            # SQL integer division truncates toward zero
            rem = ld - q * safe
            q = q + ((rem != 0) & ((ld < 0) != (rd < 0))).astype(q.dtype)
            return DeviceColumn(q, valid, out_t)
        if out_t.is_decimal:
            # decimal / decimal-or-int at scale s1+4 (arrow-rs decimal div):
            # raw = round(l_raw * 10^(so - ls + rs) / r_raw), computed in f64
            # (exact to 53 bits; the reference divides in i256)
            ls = lt.scale if lt.is_decimal else 0
            rs = rt.scale if rt.is_decimal else 0
            num = l.data.astype(jnp.float64) * (10.0 ** (out_t.scale - ls + rs))
            den = r.data.astype(jnp.float64)
            safe = jnp.where(den == 0.0, 1.0, den)
            q = jnp.where(den == 0.0, 0.0, num / safe)
            return DeviceColumn(jnp.rint(q).astype(jnp.int64), valid, out_t)
        lf, rf = _to_float(l), _to_float(r)
        return DeviceColumn(lf / rf, valid, T.FLOAT64)

    if op is E.Op.MOD:
        ld, rd = _align_numeric(l, r)
        safe = jnp.where(rd == 0, jnp.ones_like(rd), rd)
        m = jnp.where(rd == 0, jnp.zeros_like(ld), jnp.fmod(ld, safe) if jnp.issubdtype(ld.dtype, jnp.floating) else ld - (ld // safe) * safe)
        if jnp.issubdtype(ld.dtype, jnp.integer):
            # truncated (C-style) remainder to match SQL
            tq = ld // safe + (((ld - (ld // safe) * safe) != 0) & ((ld < 0) != (rd < 0))).astype(ld.dtype)
            m = ld - tq * safe
        return DeviceColumn(m, valid, out_t)

    if out_t.is_decimal and op is E.Op.MUL:
        ld = l.data if lt.is_decimal else l.data.astype(jnp.int64)
        rd = r.data if rt.is_decimal else r.data.astype(jnp.int64)
        nb = _bounds_binop(op, l.bounds, r.bounds)
        return DeviceColumn(ld.astype(jnp.int64) * rd.astype(jnp.int64), valid, out_t,
                            bounds=nb)

    if out_t.is_decimal:
        s = out_t.scale
        ls = lt.scale if lt.is_decimal else 0
        rs = rt.scale if rt.is_decimal else 0
        ld = _rescale_decimal(l.data.astype(jnp.int64), ls, s)
        rd = _rescale_decimal(r.data.astype(jnp.int64), rs, s)
        data = ld + rd if op is E.Op.ADD else ld - rd
        nb = _bounds_binop(op, _scale_bounds(l.bounds, ls, s), _scale_bounds(r.bounds, rs, s))
        return DeviceColumn(data, valid, out_t, bounds=nb)

    if out_t.is_float:
        lf, rf = _to_float(l), _to_float(r)
        data = {E.Op.ADD: lf + rf, E.Op.SUB: lf - rf, E.Op.MUL: lf * rf}[op]
        return DeviceColumn(data.astype(out_t.np_dtype()), valid, out_t)

    ld = l.data.astype(out_t.np_dtype())
    rd = r.data.astype(out_t.np_dtype())
    data = {E.Op.ADD: ld + rd, E.Op.SUB: ld - rd, E.Op.MUL: ld * rd}[op]
    return DeviceColumn(data, valid, out_t, bounds=_bounds_binop(op, l.bounds, r.bounds))


def _align_numeric(l: DeviceColumn, r: DeviceColumn) -> Tuple[jnp.ndarray, jnp.ndarray]:
    lt, rt = l.dtype, r.dtype
    if lt == rt:
        return l.data, r.data
    if lt.is_float or rt.is_float:
        return _to_float(l), _to_float(r)
    if lt.is_decimal or rt.is_decimal:
        s = max(lt.scale if lt.is_decimal else 0, rt.scale if rt.is_decimal else 0)
        ld = _rescale_decimal(l.data.astype(jnp.int64), lt.scale if lt.is_decimal else 0, s)
        rd = _rescale_decimal(r.data.astype(jnp.int64), rt.scale if rt.is_decimal else 0, s)
        return ld, rd
    if lt.is_temporal or rt.is_temporal:
        return l.data.astype(jnp.int64), r.data.astype(jnp.int64)
    common = T.common_numeric_type(lt, rt)
    return l.data.astype(common.np_dtype()), r.data.astype(common.np_dtype())


def eval_expr(e: E.Expr, rel: DeviceRelation) -> DeviceColumn:
    """Evaluate expression over a relation (traceable)."""
    cap = rel.capacity
    schema = rel.schema

    if isinstance(e, E.Column):
        return rel.column(e.flat_name)
    if isinstance(e, E.Literal):
        return _literal_column(e, cap)
    if isinstance(e, E.Alias):
        return eval_expr(e.expr, rel)
    if isinstance(e, E.SortSpec):
        return eval_expr(e.expr, rel)
    if isinstance(e, E.Cast):
        src = eval_expr(e.expr, rel)
        if e.dtype.is_string and not src.dtype.is_string:
            return string_cast_column(e, src, rel)
        return cast_column(src, e.dtype, cap)
    if isinstance(e, E.Negative):
        c = eval_expr(e.expr, rel)
        return DeviceColumn(-c.data, c.validity, c.dtype)
    if isinstance(e, E.Not):
        c = eval_expr(e.expr, rel)
        return DeviceColumn(~c.data, c.validity, T.BOOL)
    if isinstance(e, E.IsNull):
        c = eval_expr(e.expr, rel)
        data = jnp.zeros(cap, jnp.bool_) if c.validity is None else ~c.validity
        return DeviceColumn(data, None, T.BOOL)
    if isinstance(e, E.BinaryOp):
        if e.op.is_comparison:
            e = _unwrap_cast_comparison(e, rel.schema)
        return eval_binary(e, eval_expr(e.left, rel), eval_expr(e.right, rel), schema)
    if isinstance(e, E.Between):
        low = E.BinaryOp(E.Op.GE, e.expr, e.low)
        high = E.BinaryOp(E.Op.LE, e.expr, e.high)
        both = E.BinaryOp(E.Op.AND, low, high)
        out = eval_expr(both, rel)
        if e.negated:
            out = DeviceColumn(~out.data, out.validity, T.BOOL)
        return out
    if isinstance(e, E.InList):
        c = eval_expr(e.expr, rel)
        acc = None
        for v in e.values:
            eq = eval_binary(E.BinaryOp(E.Op.EQ, e.expr, v), c, eval_expr(v, rel), schema)
            acc = eq if acc is None else eval_binary(
                E.BinaryOp(E.Op.OR, e.expr, v), acc, eq, schema
            )
        if acc is None:
            return DeviceColumn(jnp.zeros(cap, jnp.bool_), None, T.BOOL)
        data = ~acc.data if e.negated else acc.data
        return DeviceColumn(data, acc.validity, T.BOOL)
    if isinstance(e, E.Like):
        c = eval_expr(e.expr, rel)
        if not isinstance(e.pattern, E.Literal):
            raise PlanError("LIKE pattern must be a literal")
        data = F.eval_like(c, str(e.pattern.value), e.case_insensitive)
        if e.negated:
            data = ~data
        return DeviceColumn(data, c.validity, T.BOOL)
    if isinstance(e, E.Case):
        return _eval_case(e, rel)
    if isinstance(e, E.ScalarFunction):
        if any(isinstance(a, E.Lambda) for a in e.args):
            from . import nested

            out_t, _ = infer(e, schema)
            return nested.eval_lambda_function(e.fname, e.args, rel, out_t)
        if e.fname == "to_char" and len(e.args) == 2:
            src = eval_expr(e.args[0], rel)
            if src.dtype.is_string:
                return src
            fmt = e.args[1]
            if not isinstance(fmt, E.Literal):
                raise PlanError("to_char format must be a literal")
            return string_cast_column(e, src, rel, fmt=str(fmt.value))
        args = [eval_expr(a, rel) for a in e.args]
        from ..expr.udf import active_registry, eval_scalar_udf

        udf = active_registry().scalar(e.fname)
        if udf is not None:
            return eval_scalar_udf(udf, args)
        out_t, _ = infer(e, schema)
        return F.eval_scalar_function(e.fname, args, e.args, out_t, cap)
    raise PlanError(f"cannot evaluate {type(e).__name__} on device: {e!r}")


def _eval_case(e: E.Case, rel: DeviceRelation) -> DeviceColumn:
    cap = rel.capacity
    out_t, _ = infer(e, rel.schema)

    def branch_cond(w: E.Expr) -> DeviceColumn:
        if e.operand is not None:
            return eval_expr(E.BinaryOp(E.Op.EQ, e.operand, w), rel)
        return eval_expr(w, rel)

    then_cols = [cast_column(eval_expr(t, rel), out_t, cap) for _, t in e.branches]
    else_col = cast_column(eval_expr(e.else_expr, rel), out_t, cap) if e.else_expr is not None else None
    dictionary = None
    if out_t.is_string:
        allc = then_cols + ([else_col] if else_col is not None else [])
        unified = unify_many_string_columns(allc)
        then_cols = unified[: len(then_cols)]
        else_col = unified[len(then_cols)] if else_col is not None else None
        dictionary = then_cols[0].dictionary if then_cols else None

    if else_col is not None:
        data, valid = else_col.data, else_col.validity
    else:
        data = jnp.zeros(cap, out_t.np_dtype())
        valid = jnp.zeros(cap, jnp.bool_)

    for (w, _), tcol in zip(reversed(e.branches), reversed(then_cols)):
        cond = branch_cond(w)
        cmask = cond.data if cond.validity is None else (cond.data & cond.validity)
        data = jnp.where(cmask, tcol.data, data)
        tvalid = tcol.validity if tcol.validity is not None else jnp.ones(cap, jnp.bool_)
        cur_valid = valid if valid is not None else jnp.ones(cap, jnp.bool_)
        valid = jnp.where(cmask, tvalid, cur_valid)

    return DeviceColumn(data, valid, out_t, dictionary)


def eval_predicate(e: E.Expr, rel: DeviceRelation) -> jnp.ndarray:
    """Evaluate a boolean predicate to a keep-mask (NULL -> False)."""
    c = eval_expr(e, rel)
    mask = c.data
    if c.validity is not None:
        mask = mask & c.validity
    return mask
