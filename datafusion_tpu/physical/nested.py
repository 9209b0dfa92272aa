"""Array (nested-type) functions.

Capability analog of the reference's functions-nested crate
(datafusion/functions-nested/src/, ~50 array functions). TPU-native design:
a list value is a fixed max-width padded row of a 2-D [capacity, width]
device array plus an int32 length (data/device.py DeviceColumn). Every
function below is a static-shape vectorized transform -- per-row "dynamic"
list sizes are just length scalars and slot masks, so the whole family jits
into the same fused query programs as scalar expressions:

  make_array          stack args along a new width axis
  array_element       take_along_axis gather
  array_slice/reverse shifted-iota gathers
  array_append/...    width grows by a STATIC amount; value placed by mask
  array_distinct/...  per-row sort + neighbor-dedup + stable compaction
  array_union/...     width-concat + membership masks + compaction
  string_to_array     host-side split of the (static) dictionary, device
                      gather by code -- zero string work on device

Lambda higher-order functions (array_transform/array_filter/
array_any_match/array_all_match; reference: functions-nested lambda fns)
evaluate the lambda body over the FLATTENED [capacity*width] element axis as
an ordinary vectorized expression -- outer-column captures broadcast by
jnp.repeat -- then reshape back; array_filter compacts per row by a stable
within-row argsort on the keep mask.

Out of scope (documented): nested list-of-list (flatten/array_ndims beyond
depth 1), map/struct types.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..common import types as T
from ..common.errors import PlanError
from ..data.column import Dictionary
from ..data.device import DeviceColumn
from ..expr import nodes as E

# every name this module evaluates (aliases included, reference:
# functions-nested/src/lib.rs exported names)
NESTED_FNS = {
    "make_array", "make_list", "array", "list",
    "array_element", "list_element", "array_extract", "list_extract",
    "array_length", "list_length", "cardinality", "array_dims", "array_ndims",
    "empty", "array_empty", "list_empty",
    "array_has", "array_contains", "list_has", "list_contains",
    "array_has_all", "array_has_any",
    "array_position", "list_position", "array_indexof", "list_indexof",
    "array_positions", "list_positions",
    "array_append", "list_append", "array_push_back",
    "array_prepend", "list_prepend", "array_push_front",
    "array_concat", "array_cat", "list_concat", "list_cat",
    "array_slice", "list_slice",
    "array_reverse", "list_reverse",
    "array_distinct", "list_distinct",
    "array_sort", "list_sort",
    "array_union", "array_intersect", "array_except",
    "array_remove", "list_remove", "array_remove_all", "list_remove_all",
    "array_remove_n", "list_remove_n",
    "array_repeat", "list_repeat",
    "array_resize", "list_resize",
    "array_pop_back", "array_pop_front",
    "array_any_value", "array_max", "array_min", "array_sum", "array_mean",
    "range", "generate_series",
    "string_to_array", "string_to_list", "split_part_list",
    "array_transform", "list_transform", "array_map",
    "array_filter", "list_filter",
    "array_any_match", "any_match", "list_any_match",
    "array_all_match", "all_match", "list_all_match",
    # struct / map (reference: functions-nested/src/{map.rs,map_extract.rs,
    # map_keys.rs,map_values.rs}, functions/src/core/{getfield,named_struct})
    "get_field", "named_struct", "struct", "row",
    "map", "make_map", "map_keys", "map_values", "map_extract",
    "map_contains_key", "element_at", "map_entries",
}

# higher-order functions: arg1 is a Lambda, evaluated by
# eval_lambda_function (not through the column-args path)
LAMBDA_FNS = {"array_transform", "array_filter",
              "array_any_match", "array_all_match"}

_CANON = {
    "make_list": "make_array", "array": "make_array", "list": "make_array",
    "list_element": "array_element", "array_extract": "array_element",
    "list_extract": "array_element",
    "list_length": "array_length",
    "list_empty": "empty", "array_empty": "empty",
    "array_contains": "array_has", "list_has": "array_has",
    "list_contains": "array_has",
    "list_position": "array_position", "array_indexof": "array_position",
    "list_indexof": "array_position",
    "list_positions": "array_positions",
    "list_append": "array_append", "array_push_back": "array_append",
    "list_prepend": "array_prepend", "array_push_front": "array_prepend",
    "array_cat": "array_concat", "list_concat": "array_concat",
    "list_cat": "array_concat",
    "list_slice": "array_slice",
    "list_transform": "array_transform", "array_map": "array_transform",
    "list_filter": "array_filter",
    "any_match": "array_any_match", "list_any_match": "array_any_match",
    "all_match": "array_all_match", "list_all_match": "array_all_match",
    "list_reverse": "array_reverse",
    "list_distinct": "array_distinct",
    "list_sort": "array_sort",
    "list_remove": "array_remove", "list_remove_all": "array_remove_all",
    "list_remove_n": "array_remove_n",
    "list_repeat": "array_repeat",
    "list_resize": "array_resize",
    "generate_series": "range",
    "string_to_list": "string_to_array",
}


def canon(fname: str) -> str:
    return _CANON.get(fname, fname)


# ---------------------------------------------------------------------------
# typing (hooked from functions.scalar_function_type)
# ---------------------------------------------------------------------------


def _lambda_body_schema(lam: E.Lambda, elem: T.DataType, schema):
    """Schema for typing/evaluating a lambda body: (value, index) params
    shadow, outer columns remain visible (captures)."""
    from ..common.schema import Field, Schema

    fields = [Field(lam.params[0], elem, nullable=True)]
    if len(lam.params) > 1:
        fields.append(Field(lam.params[1], T.INT64, nullable=False))
    return Schema(fields + [fld for fld in schema.fields
                            if fld.name not in lam.params])


def nested_function_type(e: E.ScalarFunction, schema) -> Tuple[T.DataType, bool]:
    from ..expr.typing import infer

    f = canon(e.fname)
    if f in LAMBDA_FNS:
        lt, ln = infer(e.args[0], schema)
        _need_list(lt, f)
        lam = e.args[1]
        if not isinstance(lam, E.Lambda):
            raise PlanError(f"{e.fname} expects a lambda as 2nd argument")
        if f in ("array_any_match", "array_all_match"):
            return T.BOOL, True
        if f == "array_filter":
            return lt, ln
        body_t, _ = infer(lam.body, _lambda_body_schema(lam, lt.elem, schema))
        return T.list_of(body_t), ln
    argt = [infer(a, schema) for a in e.args]
    nullable = any(n for _, n in argt)
    if f in _STRUCT_MAP_FNS:
        return _struct_map_type(f, e, argt, nullable)
    if f == "make_array":
        elem = T.NULL
        for t, _ in argt:
            elem = t if elem.kind is T.TypeKind.NULL else (
                T.common_numeric_type(elem, t) if elem.is_numeric and t.is_numeric
                else elem)
        if elem.kind is T.TypeKind.NULL:
            elem = T.INT64
        return T.list_of(elem), False
    if f == "array_element":
        lt = argt[0][0]
        _need_list(lt, f)
        return lt.elem, True
    if f in ("array_length", "cardinality", "array_position",
             "array_ndims"):
        return T.INT64, True
    if f == "array_dims":
        return T.list_of(T.INT64), nullable
    if f in ("empty", "array_has", "array_has_all", "array_has_any"):
        return T.BOOL, nullable
    if f in ("array_append", "array_prepend"):
        li = 0 if f == "array_append" else 1
        lt = argt[li][0]
        _need_list(lt, f)
        return lt, argt[li][1]
    if f in ("array_concat", "array_union", "array_intersect", "array_except"):
        lt = argt[0][0]
        _need_list(lt, f)
        return lt, nullable
    if f in ("array_slice", "array_reverse", "array_distinct", "array_sort",
             "array_remove", "array_remove_all", "array_remove_n",
             "array_resize", "array_pop_back", "array_pop_front"):
        lt = argt[0][0]
        _need_list(lt, f)
        return lt, argt[0][1]
    if f == "array_positions":
        return T.list_of(T.INT64), nullable
    if f == "array_repeat":
        return T.list_of(argt[0][0]), False
    if f in ("array_any_value", "array_max", "array_min"):
        lt = argt[0][0]
        _need_list(lt, f)
        return lt.elem, True
    if f == "array_sum":
        lt = argt[0][0]
        _need_list(lt, f)
        return (lt.elem if lt.elem.is_decimal else
                (T.INT64 if lt.elem.is_integer else T.FLOAT64)), True
    if f == "array_mean":
        return T.FLOAT64, True
    if f == "range":
        return T.list_of(T.INT64), False
    if f == "string_to_array":
        return T.list_of(T.STRING), True
    raise PlanError(f"unknown nested function {e.fname!r}")


def _need_list(t: T.DataType, f: str):
    if not t.is_list:
        raise PlanError(f"{f} expects a list argument, got {t}")


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _iota(cap: int, w: int) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[None, :], (cap, w))


def _compact_rows(col: DeviceColumn, keep: jnp.ndarray) -> DeviceColumn:
    """Stable per-row compaction: kept slots move to the front, lengths are
    the kept counts. keep: [cap, width] bool over the ORIGINAL slot grid."""
    keep = keep & col.slot_valid()
    order = jnp.argsort(~keep, axis=1, stable=True)
    data = jnp.take_along_axis(col.data, order, axis=1)
    ev = jnp.take_along_axis(keep, order, axis=1)
    lengths = jnp.sum(keep, axis=1, dtype=jnp.int32)
    return DeviceColumn(data, col.validity, col.dtype, col.dictionary,
                        None, lengths, ev)


def _elem_eq(col: DeviceColumn, value: DeviceColumn) -> jnp.ndarray:
    """[cap, width] mask: slot element == per-row scalar value (NULL-safe:
    NULL never equals)."""
    v = value.data
    if col.dictionary is not None and value.dictionary is not None \
            and col.dictionary is not value.dictionary:
        # remap probe codes onto the list's dictionary (exact match or miss)
        src = value.dictionary.values.astype(str)
        tgt = col.dictionary.values.astype(str)
        pos = np.searchsorted(tgt, src).clip(0, max(len(tgt) - 1, 0))
        hit = (tgt[pos] == src) if len(tgt) else np.zeros(len(src), bool)
        remap = np.where(hit, pos, -1).astype(np.int32)
        v = jnp.asarray(remap)[jnp.clip(v, 0, max(len(src) - 1, 0))]
    eq = col.data == v[:, None]
    eq = eq & col.slot_valid()
    eq = eq & value.valid()[:, None]
    return eq


def _pair_widen(a: DeviceColumn, b: DeviceColumn):
    """Align two list columns' dictionaries (strings) for slot comparison."""
    if a.dictionary is not None and b.dictionary is not None \
            and a.dictionary is not b.dictionary:
        av = a.dictionary.values.astype(str)
        bv = b.dictionary.values.astype(str)
        merged = np.array(sorted(set(av) | set(bv)), dtype=object)
        d = Dictionary(merged)
        ra = jnp.asarray(np.searchsorted(merged.astype(str), av).astype(np.int32))
        rb = jnp.asarray(np.searchsorted(merged.astype(str), bv).astype(np.int32))
        a = DeviceColumn(ra[jnp.clip(a.data, 0, max(len(av) - 1, 0))], a.validity,
                         a.dtype, d, None, a.lengths, a.elem_valid)
        b = DeviceColumn(rb[jnp.clip(b.data, 0, max(len(bv) - 1, 0))], b.validity,
                         b.dtype, d, None, b.lengths, b.elem_valid)
    return a, b


def _sort_key(col: DeviceColumn, descending=False) -> jnp.ndarray:
    """Per-slot sort key; padding/NULL slots sort last."""
    x = col.data
    if jnp.issubdtype(x.dtype, jnp.bool_):
        x = x.astype(jnp.int32)
    if descending and not jnp.issubdtype(x.dtype, jnp.floating):
        x = -x
    elif descending:
        x = -x
    big = (jnp.asarray(jnp.inf, x.dtype) if jnp.issubdtype(x.dtype, jnp.floating)
           else jnp.asarray(jnp.iinfo(x.dtype).max, x.dtype))
    return jnp.where(col.slot_valid(), x, big)


def _literal_int(e: Optional[E.Expr], what: str) -> int:
    le = e
    while isinstance(le, (E.Alias, E.Cast)):
        le = le.expr
    if not isinstance(le, E.Literal) or le.value is None:
        raise PlanError(f"{what} must be an integer literal (static width)")
    return int(le.value)


# ---------------------------------------------------------------------------
# evaluation (hooked from functions.eval_scalar_function)
# ---------------------------------------------------------------------------


_STRUCT_MAP_FNS = frozenset({
    "get_field", "named_struct", "struct", "row", "map", "make_map",
    "map_keys", "map_values", "map_extract", "map_contains_key",
    "element_at", "map_entries",
})


def _literal_py(e: E.Expr):
    """Python value of a literal expression tree (literals, negatives,
    make_array of literals); None-able. Raises PlanError otherwise."""
    if isinstance(e, E.Alias):
        return _literal_py(e.expr)
    if isinstance(e, E.Literal):
        return e.value
    if isinstance(e, E.Negative):
        return -_literal_py(e.expr)
    if isinstance(e, E.ScalarFunction) and canon(e.fname) == "make_array":
        return [_literal_py(a) for a in e.args]
    raise PlanError(
        "struct/map construction supports literal arguments only; "
        "struct-typed table columns ingest from pydict/arrow data")


def _field_name(e: E.Expr) -> str:
    v = _literal_py(e)
    if not isinstance(v, str):
        raise PlanError("get_field expects a literal field name")
    return v


def _pytype(v) -> T.DataType:
    from ..data.column import _infer_scalar_type

    t = _infer_scalar_type(v)
    return t if t is not None else T.NULL


def _struct_map_type(f: str, e: E.ScalarFunction, argt, nullable):

    if f == "get_field":
        base = argt[0][0]
        if base.is_struct:
            name = _field_name(e.args[1])
            for n, t in base.fields:
                if n == name:
                    return t, True
            raise PlanError(f"struct has no field {name!r}; fields: "
                            f"{[n for n, _ in base.fields]}")
        if base.is_map:
            return base.elem, True
        raise PlanError(f"get_field on non-struct/map type {base!r}")
    if f == "element_at":
        base = argt[0][0]
        if base.is_map:
            return base.elem, True
        if base.is_list:
            return base.elem, True
        raise PlanError(f"element_at on non-map/list type {base!r}")
    if f == "map_keys":
        _need_map(argt[0][0], f)
        return T.list_of(argt[0][0].fields[0][1]), nullable
    if f in ("map_values", "map_extract"):
        _need_map(argt[0][0], f)
        return T.list_of(argt[0][0].elem), nullable
    if f == "map_contains_key":
        _need_map(argt[0][0], f)
        return T.BOOL, nullable
    if f == "map_entries":
        _need_map(argt[0][0], f)
        kt = argt[0][0].fields[0][1]
        return T.list_of(T.struct((("key", kt), ("value", argt[0][0].elem)))), nullable
    if f in ("named_struct", "struct", "row"):
        if f == "named_struct":
            pairs = [( _field_name(e.args[i]), e.args[i + 1])
                     for i in range(0, len(e.args), 2)]
        else:
            pairs = [(a.aname if isinstance(a, E.Alias) else f"c{i}", a)
                     for i, a in enumerate(e.args)]
        fields = []
        for n, a in pairs:
            v = _literal_py(a)
            fields.append((n, _pytype(v)))
        return T.struct(fields), False
    # map / make_map
    if f == "map" and len(e.args) == 2:
        ks = _literal_py(e.args[0]) or []
        vs = _literal_py(e.args[1]) or []
        pairs = list(zip(ks, vs))
    else:
        vals = [_literal_py(a) for a in e.args]
        pairs = list(zip(vals[0::2], vals[1::2]))
    kt = vt = T.NULL
    for k, v in pairs:
        kt = _pytype(k) if kt.kind is T.TypeKind.NULL else kt
        vt = _pytype(v) if vt.kind is T.TypeKind.NULL else vt
    return T.map_of(kt if kt.kind is not T.TypeKind.NULL else T.INT64,
                    vt if vt.kind is not T.TypeKind.NULL else T.INT64), False


def _need_map(dt, f):
    if not dt.is_map:
        raise PlanError(f"{f} expects a map argument, got {dt!r}")


def eval_nested_function(fname: str, args: List[DeviceColumn],
                         arg_exprs: Tuple[E.Expr, ...],
                         out_dtype: T.DataType, cap: int) -> DeviceColumn:
    f = canon(fname)

    if f in _STRUCT_MAP_FNS and not (
            f == "element_at" and args and args[0].dtype.is_list):
        return _eval_struct_map(f, args, arg_exprs, out_dtype, cap)
    if f == "element_at":
        f = "array_element"
    if f == "cardinality" and args and args[0].dtype.is_map:
        col = args[0]
        lens = [len(t) for t in col.dictionary.values] \
            if col.dictionary is not None and col.dictionary.size else [0]
        lut = jnp.asarray(np.asarray(lens, dtype=np.int64))
        codes = jnp.clip(col.data.astype(jnp.int32), 0, lut.shape[0] - 1)
        return DeviceColumn(lut[codes], col.validity, T.INT64)

    if f == "make_array":
        if not args:
            # [] / make_array(): empty list of the inferred element type
            return DeviceColumn(
                jnp.zeros((cap, 1), out_dtype.elem.np_dtype()), None,
                out_dtype, None, None, jnp.zeros(cap, jnp.int32),
                jnp.zeros((cap, 1), bool))
        elem = out_dtype.elem
        datas, valids = [], []
        dictionary = None
        from .expr_compiler import cast_column, unify_many_string_columns

        if elem.is_string:
            args = unify_many_string_columns(list(args))
            dictionary = args[0].dictionary
        for a in args:
            c = a if a.dtype == elem else cast_column(a, elem, cap)
            datas.append(c.data)
            valids.append(c.valid())
        data = jnp.stack(datas, axis=1)
        ev = jnp.stack(valids, axis=1)
        lengths = jnp.full(cap, len(args), dtype=jnp.int32)
        return DeviceColumn(data, None, out_dtype, dictionary, None,
                            lengths, ev)

    col = args[0]
    if f == "array_prepend":
        col = args[1]
    if not col.dtype.is_list and f not in ("array_repeat", "range",
                                           "string_to_array"):
        raise PlanError(f"{fname} expects a list argument")

    if f == "array_element":
        idx = args[1].data.astype(jnp.int32)
        w = col.width
        lens = col.list_lengths()
        j = jnp.where(idx < 0, lens + idx, idx - 1)  # 1-based; negative=from end
        ok = (j >= 0) & (j < lens) & col.valid() & args[1].valid()
        jc = jnp.clip(j, 0, w - 1)
        data = jnp.take_along_axis(col.data, jc[:, None], axis=1)[:, 0]
        sv = jnp.take_along_axis(col.slot_valid(), jc[:, None], axis=1)[:, 0]
        return DeviceColumn(data, ok & sv, out_dtype, col.dictionary)

    if f in ("array_length", "cardinality"):
        return DeviceColumn(col.list_lengths().astype(jnp.int64),
                            col.validity, T.INT64)
    if f == "array_ndims":
        return DeviceColumn(jnp.ones(cap, jnp.int64), col.validity, T.INT64)
    if f == "array_dims":
        lens = col.list_lengths().astype(jnp.int64)
        return DeviceColumn(lens[:, None], col.validity, out_dtype, None,
                            None, jnp.ones(cap, jnp.int32), None)
    if f == "empty":
        return DeviceColumn(col.list_lengths() == 0, col.validity, T.BOOL)

    if f == "array_has":
        eq = _elem_eq(col, args[1])
        return DeviceColumn(jnp.any(eq, axis=1), col.validity, T.BOOL)

    if f in ("array_has_all", "array_has_any"):
        a, b = _pair_widen(col, args[1])
        # membership of each b-slot in a: [cap, wb]
        hit = jnp.any(
            (b.data[:, :, None] == a.data[:, None, :])
            & a.slot_valid()[:, None, :], axis=2) & b.slot_valid()
        if f == "array_has_any":
            out = jnp.any(hit, axis=1)
        else:
            out = jnp.all(hit | ~b.slot_valid(), axis=1)
        return DeviceColumn(out, col.validity, T.BOOL)

    if f == "array_position":
        eq = _elem_eq(col, args[1])
        pos = jnp.argmax(eq, axis=1).astype(jnp.int64) + 1
        found = jnp.any(eq, axis=1)
        return DeviceColumn(pos, found & col.valid(), T.INT64)

    if f == "array_positions":
        eq = _elem_eq(col, args[1])
        positions = (_iota(cap, col.width) + 1).astype(jnp.int64)
        out = DeviceColumn(positions, col.validity, out_dtype, None, None,
                           jnp.full(cap, col.width, jnp.int32), None)
        return _compact_rows(out, eq)

    if f in ("array_append", "array_prepend"):
        lst, val = (args[0], args[1]) if f == "array_append" else (args[1], args[0])
        from .expr_compiler import cast_column, unify_many_string_columns

        if lst.dtype.elem.is_string:
            flat = DeviceColumn(lst.data.reshape(-1), None, T.STRING,
                                lst.dictionary)
            flat2, val = unify_many_string_columns([flat, val])
            lst = DeviceColumn(flat2.data.reshape(lst.data.shape), lst.validity,
                               lst.dtype, flat2.dictionary, None, lst.lengths,
                               lst.elem_valid)
        elif val.dtype != lst.dtype.elem:
            val = cast_column(val, lst.dtype.elem, cap)
        w = lst.width + 1
        if f == "array_append":
            data = jnp.concatenate(
                [lst.data, jnp.zeros((cap, 1), lst.data.dtype)], axis=1)
            ev = jnp.concatenate(
                [lst.slot_valid(), jnp.zeros((cap, 1), jnp.bool_)], axis=1)
            at = lst.list_lengths()[:, None]
            grid = _iota(cap, w)
            data = jnp.where(grid == at, val.data[:, None], data)
            ev = jnp.where(grid == at, val.valid()[:, None], ev)
        else:
            data = jnp.concatenate([val.data[:, None], lst.data], axis=1)
            ev = jnp.concatenate([val.valid()[:, None], lst.slot_valid()],
                                 axis=1)
        return DeviceColumn(data, lst.validity, out_dtype, lst.dictionary,
                            None, lst.list_lengths() + 1, ev)

    if f == "array_concat":
        a = col
        for b in args[1:]:
            a, b = _pair_widen(a, b)
            wa, wb = a.width, b.width
            la = a.list_lengths()
            grid = _iota(cap, wa + wb)
            from_b = grid - la[:, None]  # >=0 -> index into b
            gather_a = jnp.clip(grid, 0, wa - 1)
            gather_b = jnp.clip(from_b, 0, wb - 1)
            da = jnp.take_along_axis(a.data, gather_a, axis=1)
            db = jnp.take_along_axis(b.data, gather_b, axis=1)
            ea = jnp.take_along_axis(a.slot_valid(), gather_a, axis=1)
            eb = jnp.take_along_axis(b.slot_valid(), gather_b, axis=1)
            use_a = grid < la[:, None]
            data = jnp.where(use_a, da, db)
            ev = jnp.where(use_a, ea, eb)
            a = DeviceColumn(data, None, out_dtype, a.dictionary, None,
                             la + b.list_lengths(), ev)
        validity = None
        if any(c.validity is not None for c in args):
            v = jnp.ones(cap, jnp.bool_)
            for c in args:
                v = v & c.valid()
            validity = v
        return DeviceColumn(a.data, validity, out_dtype, a.dictionary, None,
                            a.lengths, a.elem_valid)

    if f == "array_slice":
        start = args[1].data.astype(jnp.int32)
        stop = args[2].data.astype(jnp.int32)
        lens = col.list_lengths()
        start = jnp.where(start < 0, lens + start + 1, start)
        stop = jnp.where(stop < 0, lens + stop + 1, stop)
        start = jnp.maximum(start, 1)
        stop = jnp.minimum(stop, lens)
        w = col.width
        grid = _iota(cap, w)
        src = grid + start[:, None] - 1
        data = jnp.take_along_axis(col.data, jnp.clip(src, 0, w - 1), axis=1)
        ev = jnp.take_along_axis(col.slot_valid(), jnp.clip(src, 0, w - 1),
                                 axis=1)
        newlen = jnp.maximum(stop - start + 1, 0)
        ev = ev & (grid < newlen[:, None])
        return DeviceColumn(data, col.validity, out_dtype, col.dictionary,
                            None, newlen, ev)

    if f == "array_reverse":
        w = col.width
        lens = col.list_lengths()
        src = lens[:, None] - 1 - _iota(cap, w)
        srcc = jnp.clip(src, 0, w - 1)
        data = jnp.take_along_axis(col.data, srcc, axis=1)
        ev = jnp.take_along_axis(col.slot_valid(), srcc, axis=1) & (src >= 0)
        return DeviceColumn(data, col.validity, out_dtype, col.dictionary,
                            None, lens, ev)

    if f in ("array_pop_back", "array_pop_front"):
        lens = col.list_lengths()
        grid = _iota(cap, col.width)
        if f == "array_pop_back":
            keep = grid < (lens - 1)[:, None]
            return _compact_rows(col, keep)
        keep = (grid >= 1) & (grid < lens[:, None])
        return _compact_rows(col, keep)

    if f == "array_sort":
        desc = False
        if len(args) > 1:
            desc = str(_literal_str(arg_exprs[1])).lower().startswith("desc")
        key = _sort_key(col, descending=desc)
        order = jnp.argsort(key, axis=1, stable=True)
        data = jnp.take_along_axis(col.data, order, axis=1)
        ev = jnp.take_along_axis(col.slot_valid(), order, axis=1)
        return DeviceColumn(data, col.validity, out_dtype, col.dictionary,
                            None, col.list_lengths(), ev)

    if f == "array_distinct":
        # first-occurrence order, like the reference's array_distinct
        out = DeviceColumn(col.data, col.validity, out_dtype, col.dictionary,
                           None, col.lengths, col.elem_valid)
        return _compact_rows(out, _first_occurrence(col))

    if f in ("array_union", "array_intersect", "array_except"):
        a, b = _pair_widen(col, args[1])
        in_b = jnp.any((a.data[:, :, None] == b.data[:, None, :])
                       & b.slot_valid()[:, None, :], axis=2)
        first_a = _first_occurrence(a)
        if f == "array_intersect":
            return _compact_rows(
                DeviceColumn(a.data, a.validity, out_dtype, a.dictionary,
                             None, a.lengths, a.elem_valid),
                in_b & first_a)
        if f == "array_except":
            return _compact_rows(
                DeviceColumn(a.data, a.validity, out_dtype, a.dictionary,
                             None, a.lengths, a.elem_valid),
                ~in_b & first_a)
        # union: a's firsts ++ b's firsts not in a
        cat = eval_nested_function(
            "array_concat",
            [DeviceColumn(a.data, a.validity, a.dtype, a.dictionary, None,
                          a.lengths, a.elem_valid),
             DeviceColumn(b.data, b.validity, b.dtype, b.dictionary, None,
                          b.lengths, b.elem_valid)],
            arg_exprs, out_dtype, cap)
        return eval_nested_function("array_distinct", [cat], arg_exprs,
                                    out_dtype, cap)

    if f in ("array_remove", "array_remove_all", "array_remove_n"):
        eq = _elem_eq(col, args[1])
        if f == "array_remove_all":
            keep = ~eq
        else:
            n = (args[2].data.astype(jnp.int32) if f == "array_remove_n"
                 else jnp.ones(cap, jnp.int32))
            nth = jnp.cumsum(eq, axis=1)
            keep = ~(eq & (nth <= n[:, None]))
        return _compact_rows(col, keep)

    if f == "array_repeat":
        w = max(_literal_int(arg_exprs[1], "array_repeat count"), 1)
        n = args[1].data.astype(jnp.int32)
        data = jnp.broadcast_to(args[0].data[:, None], (cap, w))
        ev = jnp.broadcast_to(args[0].valid()[:, None], (cap, w)) \
            & (_iota(cap, w) < n[:, None])
        return DeviceColumn(data, None, out_dtype, args[0].dictionary, None,
                            jnp.clip(n, 0, w), ev)

    if f == "array_resize":
        size = max(_literal_int(arg_exprs[1], "array_resize size"), 1)
        if size * max(cap, 1) > (1 << 28):
            # a [capacity, size] buffer this large would abort inside the
            # runtime (reference errors too: array_resize.slt i64::MAX /
            # 3e9-element cases)
            raise PlanError(
                f"array_resize: new size {size} too large for capacity {cap}")
        n = jnp.clip(args[1].data.astype(jnp.int32), 0, size)
        w = col.width
        grid = _iota(cap, size)
        src = jnp.clip(grid, 0, w - 1)
        data = jnp.take_along_axis(col.data, src, axis=1) if size != w else col.data
        ev = jnp.take_along_axis(col.slot_valid(), src, axis=1)
        ev = ev & (grid < col.list_lengths()[:, None])
        if len(args) > 2:
            fill = args[2]
            beyond = (grid >= col.list_lengths()[:, None]) & (grid < n[:, None])
            data = jnp.where(beyond, fill.data[:, None], data)
            ev = ev | (beyond & fill.valid()[:, None])
        return DeviceColumn(data, col.validity, out_dtype, col.dictionary,
                            None, n, ev)

    if f in ("array_any_value", "array_max", "array_min", "array_sum",
             "array_mean"):
        sv = col.slot_valid()
        if f == "array_any_value":
            first = _first_valid_index(sv)
            data = jnp.take_along_axis(col.data, first[:, None], axis=1)[:, 0]
            ok = jnp.any(sv, axis=1) & col.valid()
            return DeviceColumn(data, ok, out_dtype, col.dictionary)
        x = col.data
        any_valid = jnp.any(sv, axis=1) & col.valid()
        if f in ("array_max", "array_min"):
            if jnp.issubdtype(x.dtype, jnp.floating):
                neutral = -jnp.inf if f == "array_max" else jnp.inf
            else:
                info = jnp.iinfo(x.dtype if x.dtype != jnp.bool_ else jnp.int32)
                neutral = info.min if f == "array_max" else info.max
                if x.dtype == jnp.bool_:
                    x = x.astype(jnp.int32)
            masked = jnp.where(sv, x, neutral)
            out = (jnp.max(masked, axis=1) if f == "array_max"
                   else jnp.min(masked, axis=1))
            if col.dtype.elem.kind is T.TypeKind.BOOL:
                out = out.astype(jnp.bool_)
            return DeviceColumn(out, any_valid, out_dtype, col.dictionary)
        acc = jnp.sum(jnp.where(sv, x, 0).astype(
            jnp.float64 if out_dtype.is_float else jnp.int64), axis=1)
        if f == "array_mean":
            cnt = jnp.sum(sv, axis=1)
            return DeviceColumn(acc.astype(jnp.float64)
                                / jnp.maximum(cnt, 1),
                                any_valid & (cnt > 0), T.FLOAT64)
        if out_dtype.is_decimal or not out_dtype.is_float:
            return DeviceColumn(acc.astype(jnp.int64), any_valid, out_dtype)
        return DeviceColumn(acc.astype(jnp.float64), any_valid, out_dtype)

    if f == "range":
        # range(stop) / range(start, stop[, step]); bounds must be literals
        # (they set the STATIC list width)
        exprs = list(arg_exprs)
        if len(exprs) == 1:
            lo, hi, st = 0, _literal_int(exprs[0], "range stop"), 1
        else:
            lo = _literal_int(exprs[0], "range start")
            hi = _literal_int(exprs[1], "range stop")
            st = _literal_int(exprs[2], "range step") if len(exprs) > 2 else 1
        if st == 0:
            raise PlanError("range step must be nonzero")
        count = max((hi - lo + st - (1 if st > 0 else -1)) // st, 0)
        w = max(count, 1)
        grid = _iota(cap, w).astype(jnp.int64)
        data = lo + grid * st
        ev = grid < count
        return DeviceColumn(data, None, out_dtype, None, None,
                            jnp.full(cap, count, jnp.int32), ev)

    if f == "string_to_array":
        return _string_to_array(col, arg_exprs, out_dtype, cap)

    raise PlanError(f"unhandled nested function {fname!r}")


def _first_occurrence(a: DeviceColumn) -> jnp.ndarray:
    """[cap, w] mask of the FIRST slot of each distinct value in each row."""
    eqs = (a.data[:, :, None] == a.data[:, None, :]) \
        & a.slot_valid()[:, None, :]
    w = a.width
    earlier = jnp.tril(jnp.ones((w, w), jnp.bool_), k=-1)[None, :, :]
    dup = jnp.any(eqs & earlier, axis=2)
    return a.slot_valid() & ~dup


def _first_valid_index(sv: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(sv, axis=1).astype(jnp.int32)


def _literal_str(e: E.Expr) -> str:
    le = e
    while isinstance(le, (E.Alias, E.Cast)):
        le = le.expr
    if not isinstance(le, E.Literal):
        raise PlanError("expected a string literal")
    return str(le.value)


def _string_to_array(col: DeviceColumn, arg_exprs, out_dtype: T.DataType,
                     cap: int) -> DeviceColumn:
    """Split a string column on a literal delimiter. The dictionary is
    static, so the splitting happens HOST-side over the distinct values; the
    device does one gather by code (same trick as transform_dictionary)."""
    if col.dictionary is None:
        raise PlanError("string_to_array needs a dictionary-encoded column")
    delim = _literal_str(arg_exprs[1])
    vals = [str(v) for v in col.dictionary.values]
    splits = [v.split(delim) if delim else list(v) for v in vals]
    w = max([len(s) for s in splits] or [1]) or 1
    pieces = sorted({p for s in splits for p in s})
    d = Dictionary(np.array(pieces, dtype=object))
    table = np.zeros((max(len(vals), 1), w), dtype=np.int32)
    lens = np.zeros(max(len(vals), 1), dtype=np.int32)
    lut = {p: i for i, p in enumerate(pieces)}
    for i, s in enumerate(splits):
        lens[i] = len(s)
        for j, p in enumerate(s):
            table[i, j] = lut[p]
    codes = jnp.clip(col.data, 0, max(len(vals) - 1, 0))
    data = jnp.asarray(table)[codes]
    lengths = jnp.asarray(lens)[codes]
    ev = _iota(cap, w) < lengths[:, None]
    return DeviceColumn(data, col.validity, out_dtype, d, None, lengths, ev)


# ---------------------------------------------------------------------------
# lambda higher-order functions
# ---------------------------------------------------------------------------


def eval_lambda_function(fname: str, arg_exprs, rel, out_dtype: T.DataType
                         ) -> DeviceColumn:
    """array_transform / array_filter / array_any_match / array_all_match
    (reference: functions-nested lambda functions). The lambda body runs as a
    plain vectorized expression over the flattened [capacity*width] element
    axis; outer columns are visible as captures (broadcast per element)."""
    from ..common.schema import Field, Schema
    from ..data.device import DeviceRelation
    from .expr_compiler import cast_column, eval_expr

    f = canon(fname)
    lam = arg_exprs[1]
    if not isinstance(lam, E.Lambda):
        raise PlanError(f"{fname} expects a lambda as 2nd argument")
    col = eval_expr(arg_exprs[0], rel)
    _need_list(col.dtype, f)
    cap, w = col.capacity, col.width
    elem = col.dtype.elem

    flat = col.data.reshape(cap * w)
    # `present`: the slot exists (within the list length); `value_ok`: it
    # exists AND holds a non-NULL value. A present-but-NULL element must
    # reach the body as NULL (not vanish) for 3VL any/all to see it.
    present = (_iota(cap, w) < col.list_lengths()[:, None]).reshape(cap * w)
    value_ok = col.slot_valid().reshape(cap * w) & present
    fields = [Field(lam.params[0], elem, nullable=True)]
    cols = [DeviceColumn(flat, value_ok, elem, col.dictionary)]
    if len(lam.params) > 1:  # (value, index): 1-based element index
        fields.append(Field(lam.params[1], T.INT64, nullable=False))
        cols.append(DeviceColumn(
            jnp.tile(jnp.arange(1, w + 1, dtype=jnp.int64), cap), None, T.INT64))
    for fld, c in zip(rel.schema.fields, rel.columns):
        if fld.name in lam.params:
            continue  # shadowed capture
        fields.append(fld)
        cols.append(DeviceColumn(
            jnp.repeat(c.data, w, axis=0),
            jnp.repeat(c.validity, w) if c.validity is not None else None,
            c.dtype, c.dictionary, c.bounds,
            jnp.repeat(c.lengths, w) if c.lengths is not None else None,
            jnp.repeat(c.elem_valid, w, axis=0) if c.elem_valid is not None else None))
    synth = DeviceRelation(Schema(fields), cols,
                           jnp.repeat(rel.sel, w) & present)
    body = eval_expr(lam.body, synth)

    lengths = col.list_lengths()
    if f == "array_transform":
        out_elem = out_dtype.elem
        b = body if body.dtype == out_elem else cast_column(body, out_elem,
                                                            cap * w)
        ev = (b.valid() & present).reshape(cap, w)
        return DeviceColumn(b.data.reshape((cap, w) + b.data.shape[1:]),
                            col.validity, out_dtype, b.dictionary, None,
                            lengths, ev)
    mask2 = (body.data & body.valid() & present).reshape(cap, w)
    if f == "array_filter":
        order = jnp.argsort(~mask2, axis=1, stable=True)
        data = jnp.take_along_axis(col.data, order, axis=1)
        new_len = jnp.sum(mask2, axis=1, dtype=jnp.int32)
        ev = _iota(cap, w) < new_len[:, None]
        return DeviceColumn(data, col.validity, out_dtype, col.dictionary,
                            None, new_len, ev)
    # any/all with SQL 3VL: a NULL body over a present slot makes the
    # reduction NULL unless decided by a TRUE (any) / FALSE (all)
    null2 = (~body.valid() & present).reshape(cap, w)
    any_null = jnp.any(null2, axis=1)
    if f == "array_any_match":
        any_true = jnp.any(mask2, axis=1)
        validity = col.valid() & (any_true | ~any_null)
        return DeviceColumn(any_true, validity, T.BOOL)
    false2 = ((~body.data) & body.valid() & present).reshape(cap, w)
    any_false = jnp.any(false2, axis=1)
    all_true = ~any_false & ~any_null
    validity = col.valid() & (any_false | ~any_null)
    return DeviceColumn(all_true, validity, T.BOOL)


# ---------------------------------------------------------------------------
# struct / map evaluation: opaque sorted-dictionary codes + host-built LUTs
# gathered on device (codes are per-column consistent, so every lookup is
# one small-table gather -- the dictionary-encoded-strings playbook applied
# to composite values)
# ---------------------------------------------------------------------------


def _lut_column(col: DeviceColumn, values, ft: T.DataType,
                cap: int) -> DeviceColumn:
    """Column of `values[code]` for a dictionary-coded struct/map column:
    values is one python value per dictionary entry (None = NULL)."""
    if ft.is_list or ft.is_struct or ft.is_map:
        from ..data.column import column_from_values

        if ft.is_list:
            raise PlanError("nested list fields inside struct are not "
                            "supported (depth-1 lists only)")
        hc = column_from_values(list(values), ft)  # nested struct: re-encode
        lut = np.asarray(hc.data, dtype=ft.np_dtype())
        lut_valid = hc.valid_mask()
        d = hc.dictionary
    else:
        from ..data.column import column_from_values

        hc = column_from_values(list(values), ft)
        lut = np.asarray(hc.data, dtype=ft.np_dtype())
        lut_valid = hc.valid_mask()
        d = hc.dictionary
    if lut.size == 0:
        lut = np.zeros(1, dtype=ft.np_dtype())
        lut_valid = np.zeros(1, dtype=bool)
    codes = jnp.clip(col.data.astype(jnp.int32), 0, lut.shape[0] - 1)
    data = jnp.asarray(lut)[codes]
    valid = col.valid() & jnp.asarray(lut_valid)[codes]
    return DeviceColumn(data, valid, ft, d)


def _entry_list_arrays(entries, elem: T.DataType):
    """Per-dictionary-entry python lists -> (data2d, lengths, elem_valid,
    dictionary) host arrays for a device list column LUT."""
    D = max(len(entries), 1)
    W = max([len(x) for x in entries] + [1])
    dictionary = None
    if elem.is_string:
        flat = sorted({str(v) for row in entries for v in row if v is not None})
        dictionary = Dictionary(np.array(flat, dtype=object))
        lut = {v: i for i, v in enumerate(flat)}
        entries = [[None if v is None else lut[str(v)] for v in row]
                   for row in entries]
    data = np.zeros((D, W), dtype=elem.np_dtype())
    ev = np.zeros((D, W), dtype=bool)
    lengths = np.zeros(D, dtype=np.int32)
    from ..data.column import _coerce_elem

    for i, row in enumerate(entries):
        lengths[i] = len(row)
        for j, v in enumerate(row):
            if v is None:
                continue
            ev[i, j] = True
            data[i, j] = v if elem.is_string else _coerce_elem(v, elem)
    return data, lengths, ev, dictionary


def _map_pairs(col: DeviceColumn):
    return [list(t) for t in col.dictionary.values] \
        if col.dictionary is not None and col.dictionary.size else [[]]


def _eval_struct_map(f: str, args: List[DeviceColumn],
                     arg_exprs: Tuple[E.Expr, ...], out_dtype: T.DataType,
                     cap: int) -> DeviceColumn:
    if f in ("named_struct", "struct", "row", "map", "make_map"):
        # literal construction: one dictionary entry, constant codes
        from ..data.column import _canon_struct

        if f == "named_struct":
            vals = [_literal_py(a) for a in arg_exprs]
            value = {str(vals[i]): vals[i + 1] for i in range(0, len(vals), 2)}
        elif f in ("struct", "row"):
            value = {(a.aname if isinstance(a, E.Alias) else f"c{i}"):
                     _literal_py(a) for i, a in enumerate(arg_exprs)}
        elif f == "map" and len(arg_exprs) == 2:
            ks = _literal_py(arg_exprs[0]) or []
            vs = _literal_py(arg_exprs[1]) or []
            if len(set(ks)) != len(ks):
                # reference default map_key_dedup_policy = Exception
                raise PlanError("map keys must be unique")
            value = dict(zip(ks, vs))
        else:
            vals = [_literal_py(a) for a in arg_exprs]
            if len(set(vals[0::2])) != len(vals[0::2]):
                raise PlanError("map keys must be unique")
            value = dict(zip(vals[0::2], vals[1::2]))
        tup = _canon_struct(value, out_dtype)
        dvals = np.empty(1, dtype=object)
        dvals[0] = tup
        return DeviceColumn(jnp.zeros(cap, jnp.int32), None, out_dtype,
                            Dictionary(dvals))

    col = args[0]
    dt = col.dtype

    if f == "get_field" and dt.is_struct:
        name = _field_name(arg_exprs[1])
        idx = [n for n, _t in dt.fields].index(name)
        ft = dict(dt.fields)[name]
        entries = col.dictionary.values if col.dictionary is not None else []
        vals = [t[idx] for t in entries]
        return _lut_column(col, vals, ft, cap)

    _need_map(dt, f)
    pairs = _map_pairs(col)
    kt, vt = dt.fields[0][1], dt.elem

    if f in ("get_field", "element_at", "map_contains_key"):
        key = _literal_py(arg_exprs[1])
        vals = [dict(t).get(key) for t in pairs]
        if f == "map_contains_key":
            has = [key in dict(t) for t in pairs]
            lut = jnp.asarray(np.asarray(has, dtype=bool))
            codes = jnp.clip(col.data.astype(jnp.int32), 0, lut.shape[0] - 1)
            return DeviceColumn(lut[codes], col.validity, T.BOOL)
        return _lut_column(col, vals, vt, cap)

    if f == "map_extract":
        # reference semantics: a 0/1-element LIST of the value
        key = _literal_py(arg_exprs[1])
        rows = [([dict(t)[key]] if key in dict(t) else []) for t in pairs]
        data, lengths, ev, d = _entry_list_arrays(rows, vt)
        codes = jnp.clip(col.data.astype(jnp.int32), 0, data.shape[0] - 1)
        return DeviceColumn(jnp.asarray(data)[codes], col.validity,
                            T.list_of(vt), d, None,
                            jnp.asarray(lengths)[codes],
                            jnp.asarray(ev)[codes])

    if f in ("map_keys", "map_values"):
        j = 0 if f == "map_keys" else 1
        elem = kt if f == "map_keys" else vt
        rows = [[kv[j] for kv in t] for t in pairs]
        data, lengths, ev, d = _entry_list_arrays(rows, elem)
        codes = jnp.clip(col.data.astype(jnp.int32), 0, data.shape[0] - 1)
        return DeviceColumn(jnp.asarray(data)[codes], col.validity,
                            T.list_of(elem), d, None,
                            jnp.asarray(lengths)[codes],
                            jnp.asarray(ev)[codes])

    if f == "map_entries":
        # list of {key, value} structs: re-encode each pair tuple opaquely
        st = out_dtype.elem
        from ..data.column import _encode_opaque

        flat_rows = [[tuple(kv) for kv in t] for t in pairs]
        # encode every distinct pair across entries
        distinct = sorted({p for row in flat_rows for p in row},
                          key=lambda x: (str(x),))
        lutp = {p: i for i, p in enumerate(distinct)}
        rows = [[lutp[p] for p in row] for row in flat_rows]
        data, lengths, ev, _ = _entry_list_arrays(rows, T.INT32)
        dvals = np.empty(max(len(distinct), 1), dtype=object)
        for i, p in enumerate(distinct):
            dvals[i] = p
        codes = jnp.clip(col.data.astype(jnp.int32), 0, data.shape[0] - 1)
        return DeviceColumn(jnp.asarray(data)[codes], col.validity,
                            T.list_of(st), Dictionary(dvals), None,
                            jnp.asarray(lengths)[codes],
                            jnp.asarray(ev)[codes])

    raise PlanError(f"struct/map function {f!r} not implemented")
