"""Scalar function library: typing + vectorized device implementations.

Capability analog of the reference function crates (datafusion/functions/src/:
math, string, datetime, core modules; registered via all_default_functions(),
functions/src/lib.rs:169).

String functions operate on the *dictionary* (host-side, vectorized numpy
char ops over the distinct values) producing a code-remap that is applied on
device as a constant gather -- O(distinct) host work at compile time, O(rows)
device work at run time.
"""
from __future__ import annotations

import re
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..common import types as T
from ..common.errors import PlanError
from ..common.schema import Schema
from ..data.column import Dictionary
from ..data.device import DeviceColumn
from ..expr import nodes as E
from ..utils import dates as DU


def _nested():
    from . import nested

    return nested


# ---------------------------------------------------------------------------
# typing
# ---------------------------------------------------------------------------

_NUMERIC_UNARY = {
    "abs", "ceil", "floor", "round", "trunc", "sqrt", "cbrt", "exp", "ln",
    "log10", "log2", "sin", "cos", "tan", "asin", "acos", "atan", "sinh",
    "cosh", "tanh", "degrees", "radians", "signum", "sign",
}
_STRING_UNARY = {"upper", "lower", "trim", "ltrim", "rtrim", "reverse", "initcap", "btrim"}


def builtin_function_names() -> set:
    """Every scalar-function name the evaluator accepts (for
    information_schema.routines; reference: all_default_functions(),
    functions/src/lib.rs:169)."""
    out = set(_NUMERIC_UNARY) | set(_STRING_UNARY) | set(_nested().NESTED_FNS)
    out |= {
        "date_part", "extract", "year", "month", "day", "date_trunc",
        "power", "pow", "atan2", "log", "pi", "substr", "substring", "left",
        "right", "concat", "concat_ws", "replace", "translate", "lpad",
        "rpad", "repeat", "length", "char_length", "character_length",
        "octet_length", "bit_length", "strpos", "position", "ascii",
        "levenshtein", "starts_with", "ends_with", "contains", "coalesce",
        "nullif", "isnan", "iszero", "nvl", "ifnull", "md5", "sha224",
        "sha256", "sha384", "sha512", "regexp_replace", "regexp_like",
        "regexp_match", "to_date", "now", "current_timestamp",
        "current_date", "today", "random", "split_part", "overlay", "chr",
        "char", "to_hex", "uuid", "encode", "decode", "find_in_set",
        "factorial", "gcd", "lcm", "to_unixtime", "cot", "nanvl",
        "make_date", "to_timestamp", "from_unixtime", "date_bin", "greatest",
        "least", "arrow_typeof", "arrow_cast", "version", "to_char",
        "to_local_time", "substr_index", "substring_index", "regexp_count",
        "regexp_instr", "to_time", "make_time", "current_time",
        "to_timestamp_seconds", "to_timestamp_millis", "to_timestamp_micros",
        "to_timestamp_nanos", "nvl2", "date_format",
    }
    return out


def arrow_type_name(dt: T.DataType) -> str:
    """Arrow-style type rendering (the reference's arrow_typeof output,
    functions/src/core/arrowtypeof.rs): Int64 / Float64 / Utf8 / Boolean /
    Date32 / Decimal128(p, s) / Timestamp(Nanosecond, None)."""
    k = dt.kind
    if k is T.TypeKind.DECIMAL:
        return f"Decimal128({dt.precision}, {dt.scale})"
    if k is T.TypeKind.LIST:
        return f"List({arrow_type_name(dt.elem)})"
    return {
        T.TypeKind.NULL: "Null", T.TypeKind.BOOL: "Boolean",
        T.TypeKind.INT8: "Int8", T.TypeKind.INT16: "Int16",
        T.TypeKind.INT32: "Int32", T.TypeKind.INT64: "Int64",
        T.TypeKind.FLOAT32: "Float32", T.TypeKind.FLOAT64: "Float64",
        T.TypeKind.STRING: "Utf8", T.TypeKind.BINARY: "Binary",
        T.TypeKind.DATE32: "Date32",
        T.TypeKind.TIMESTAMP: "Timestamp(Nanosecond, None)",
        T.TypeKind.INTERVAL_DAYS: "Interval(DayTime)",
        T.TypeKind.INTERVAL_MONTHS: "Interval(YearMonth)",
    }.get(k, k.value)


_ARROW_PARSE = {
    "null": T.NULL, "boolean": T.BOOL, "bool": T.BOOL,
    "int8": T.INT8, "int16": T.INT16, "int32": T.INT32, "int64": T.INT64,
    # unsigned widths widen into the next signed type this engine carries
    "uint8": T.INT16, "uint16": T.INT32, "uint32": T.INT64,
    "uint64": T.INT64,
    "float16": T.FLOAT32, "float32": T.FLOAT32, "float64": T.FLOAT64,
    "utf8": T.STRING, "largeutf8": T.STRING, "utf8view": T.STRING,
    "binary": T.BINARY, "largebinary": T.BINARY, "binaryview": T.BINARY,
    "date32": T.DATE32,
}


def parse_arrow_type(s: str) -> T.DataType:
    """Parse the reference's arrow_cast type-name argument
    (functions/src/core/arrow_cast.rs)."""
    t = s.strip()
    low = t.lower()
    if low in _ARROW_PARSE:
        return _ARROW_PARSE[low]
    if re.match(r"fixedsizebinary\s*\(\s*\d+\s*\)", low):
        return T.BINARY  # fixed width is metadata-only in this engine
    m = re.match(r"decimal(?:128|256)?\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", low)
    if m:
        return T.decimal(int(m.group(1)), int(m.group(2)))
    if low.startswith("timestamp"):
        return T.TIMESTAMP
    if low.startswith("date64"):
        return T.DATE32  # ms-date carries no extra info for this engine
    if low.startswith("time32") or low.startswith("time64"):
        return T.TIME
    if low.startswith("duration"):
        return T.INTERVAL_US
    if low.startswith("interval"):
        return (T.INTERVAL_MONTHS if "yearmonth" in low.replace(" ", "")
                else T.INTERVAL_US)
    m = re.match(r"dictionary\s*\(\s*\w+\s*,\s*(.+)\)\s*$", low)
    if m:
        # Dictionary(K, V) casts behave as V (dictionary encoding is this
        # engine's default string representation anyway)
        return parse_arrow_type(m.group(1))
    m = re.match(r"(?:large)?list\s*\(\s*(.+)\)\s*$", low)
    if m:
        # List/LargeList collapse: offsets are 64-bit host-side anyway
        return T.list_of(parse_arrow_type(m.group(1)))
    m = re.match(r"fixedsizelist\s*\(\s*(\d+)\s*,\s*(.+)\)\s*$", low)
    if m:
        # fixed width is metadata-only in the lane-matrix representation
        return T.list_of(parse_arrow_type(m.group(2)))
    raise PlanError(f"arrow_cast: unsupported type {s!r}")


def _spark_active(fname: str) -> bool:
    """True when the session opted into Spark-semantics functions
    (ctx.enable_spark_functions(); reference: datafusion-spark crate
    registration) and `fname` is one of them."""
    from ..expr.udf import active_registry

    if not getattr(active_registry(), "spark", False):
        return False
    from ..spark import SPARK_FNS

    return fname in SPARK_FNS


def scalar_function_type(e: E.ScalarFunction, schema: Schema) -> Tuple[T.DataType, bool]:
    from ..expr.typing import infer

    f = e.fname
    if f in _nested().NESTED_FNS:
        return _nested().nested_function_type(e, schema)
    if _spark_active(f):
        from ..spark import functions as SK

        return SK.spark_function_type(e, schema)
    argt = [infer(a, schema) for a in e.args]
    nullable = any(n for _, n in argt)
    if f in ("date_part", "extract"):
        return T.INT64, nullable
    if f in ("year", "month", "day"):
        return T.INT64, nullable
    if f == "date_trunc":
        return argt[1][0], nullable
    if f in _NUMERIC_UNARY:
        # arity + input-type validation (the reference's signature checks:
        # `abs('foo')` / `round(1, 2, 3)` are plan-time errors)
        maxa = 2 if f in ("round", "trunc") else 1
        if not (1 <= len(argt) <= maxa):
            raise PlanError(f"{f} expects {'1-2' if maxa == 2 else '1'} "
                            f"argument(s), got {len(argt)}")
        t = argt[0][0]
        if not (t.is_numeric or t.kind is T.TypeKind.NULL):
            raise PlanError(f"{f} expects a numeric argument, got {t!r}")
        if f == "abs":
            return t, nullable
        if f in ("ceil", "floor", "round", "trunc", "sign", "signum"):
            return (t if t.is_integer or t.is_decimal else T.FLOAT64), nullable
        return T.FLOAT64, nullable
    if f in ("power", "pow", "atan2", "log"):
        return T.FLOAT64, nullable
    if f in ("substr", "substring", "left", "right", "concat", "concat_ws",
             "replace", "translate", "lpad", "rpad", "repeat") or f in _STRING_UNARY:
        if f == "concat" and any(t.is_binary for t, _ in argt):
            return T.BINARY, nullable  # one binary operand binarizes concat
        return T.STRING, nullable
    if f in ("length", "char_length", "character_length", "octet_length",
             "bit_length", "strpos", "position", "ascii", "levenshtein"):
        return T.INT64, nullable
    if f in ("starts_with", "ends_with", "contains"):
        return T.BOOL, nullable
    if f == "coalesce":
        base = argt[0][0]
        for t, _ in argt[1:]:
            if base.is_numeric and t.is_numeric and t != base:
                base = T.common_numeric_type(base, t)
            elif base.kind is T.TypeKind.NULL:
                base = t
        return base, all(n for _, n in argt)
    if f == "nullif":
        return argt[0][0], True
    if f in ("isnan", "iszero"):
        return T.BOOL, False
    if f == "nvl" or f == "ifnull":
        return argt[0][0], nullable
    if f in ("md5", "sha224", "sha256", "sha384", "sha512", "regexp_replace"):
        return T.STRING, nullable
    if f in ("regexp_like", "regexp_match"):
        return T.BOOL, nullable
    if f == "to_date":
        return T.DATE32, nullable
    if f == "now" or f == "current_timestamp":
        return T.TIMESTAMP, False
    if f == "current_date" or f == "today":
        return T.DATE32, False
    if f == "random":
        return T.FLOAT64, False
    if f == "pi":
        return T.FLOAT64, False
    if f in ("split_part", "overlay", "chr", "char", "to_hex", "uuid",
             "encode", "decode"):
        return T.STRING, nullable if f != "uuid" else False
    if f in ("find_in_set", "factorial", "gcd", "lcm", "to_unixtime"):
        return T.INT64, nullable
    if f == "cot":
        return T.FLOAT64, nullable
    if f == "nanvl":
        return T.FLOAT64, nullable
    if f == "make_date":
        return T.DATE32, nullable
    if f in ("to_timestamp", "from_unixtime", "date_bin",
             "to_timestamp_seconds", "to_timestamp_millis",
             "to_timestamp_micros", "to_timestamp_nanos"):
        return T.TIMESTAMP, nullable
    if f == "nvl2":
        return argt[1][0], nullable
    if f == "at_time_zone":
        return T.TIMESTAMP, nullable
    if f in ("greatest", "least"):
        base = argt[0][0]
        for t, _ in argt[1:]:
            if base.is_numeric and t.is_numeric and t != base:
                base = T.common_numeric_type(base, t)
        return base, all(n for _, n in argt)
    if f == "to_char":
        return T.STRING, nullable
    if f in ("to_time", "make_time"):
        return T.TIME, nullable
    if f == "current_time":
        return T.TIME, False
    if f == "to_local_time":
        return argt[0][0], nullable
    if f in ("substr_index", "substring_index"):
        return T.STRING, nullable
    if f in ("regexp_count", "regexp_instr"):
        return T.INT64, nullable
    if f == "arrow_typeof":
        return T.STRING, False
    if f == "arrow_cast":
        return parse_arrow_type(str(_literal_value(e.args[1]))), argt[0][1]
    if f == "version":
        return T.STRING, False
    raise PlanError(f"unknown scalar function {f!r}")


# ---------------------------------------------------------------------------
# dictionary transforms
# ---------------------------------------------------------------------------


def transform_dictionary(col: DeviceColumn, values_fn) -> DeviceColumn:
    """Apply a host-side transform over the dictionary's distinct values and
    re-encode: new sorted dictionary + on-device constant-gather code remap."""
    d = col.dictionary
    if d is None:
        raise PlanError("string op on non-dictionary column")
    if col.dtype is not None and col.dtype.is_binary:
        raise PlanError("string function not supported on BINARY")
    old = np.asarray(d.values, dtype="U") if len(d.values) else np.array([], "U1")
    new_vals = values_fn(old)
    uniq = np.unique(new_vals) if len(new_vals) else np.array([], "U1")
    remap = np.searchsorted(uniq, new_vals).astype(np.int32) if len(new_vals) else np.zeros(0, np.int32)
    codes = jnp.asarray(remap)[jnp.clip(col.data, 0, max(len(remap) - 1, 0))] if len(remap) else jnp.zeros_like(col.data)
    return DeviceColumn(codes, col.validity, T.STRING, Dictionary(uniq.astype(object)))


def dict_predicate(col: DeviceColumn, pred_fn) -> jnp.ndarray:
    """Evaluate a host predicate over dictionary values -> device bool column
    (constant lookup-table gather). Used for LIKE / regex / contains."""
    d = col.dictionary
    old = np.asarray(d.values, dtype="U") if d is not None and len(d.values) else np.array([], "U1")
    lut = pred_fn(old).astype(bool) if len(old) else np.zeros(0, bool)
    if len(lut) == 0:
        return jnp.zeros(col.data.shape[0], dtype=jnp.bool_)
    return jnp.asarray(lut)[jnp.clip(col.data, 0, len(lut) - 1)]


def like_to_regex(pattern: str) -> str:
    out = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        elif ch == "\\" and i + 1 < len(pattern):
            out.append(re.escape(pattern[i + 1]))
            i += 1
        else:
            out.append(re.escape(ch))
        i += 1
    return "^" + "".join(out) + "$"


def eval_like(col: DeviceColumn, pattern: str, case_insensitive: bool = False) -> jnp.ndarray:
    rx = re.compile(like_to_regex(pattern), re.IGNORECASE if case_insensitive else 0)

    def pred(vals: np.ndarray) -> np.ndarray:
        return np.fromiter((rx.match(v) is not None for v in vals), dtype=bool, count=len(vals))

    return dict_predicate(col, pred)


# ---------------------------------------------------------------------------
# implementations
# ---------------------------------------------------------------------------


def _to_float(col: DeviceColumn) -> jnp.ndarray:
    if col.dtype.is_decimal:
        return col.data.astype(jnp.float64) / (10.0 ** col.dtype.scale)
    return col.data.astype(jnp.float64)


def _and_validity(cols: List[DeviceColumn]):
    v = None
    for c in cols:
        if c.validity is not None:
            v = c.validity if v is None else (v & c.validity)
    return v


def eval_scalar_function(
    fname: str,
    args: List[DeviceColumn],
    arg_exprs: Tuple[E.Expr, ...],
    out_dtype: T.DataType,
    capacity: int,
) -> DeviceColumn:
    f = fname
    if f in _nested().NESTED_FNS:
        return _nested().eval_nested_function(f, args, arg_exprs, out_dtype,
                                              capacity)
    if _spark_active(f):
        from ..spark import functions as SK

        return SK.eval_spark_function(f, args, arg_exprs, out_dtype, capacity)
    validity = _and_validity(args)

    if f in ("date_part", "extract", "year", "month", "day"):
        if f in ("date_part", "extract"):
            part_expr = arg_exprs[0]
            if not isinstance(part_expr, E.Literal):
                raise PlanError("extract part must be a literal")
            part = str(part_expr.value).lower()
            datecol = args[1]
        else:
            part, datecol = f, args[0]
        days = datecol.data
        if datecol.dtype.kind is T.TypeKind.TIME:
            us = datecol.data
            secs = us // np.int64(1_000_000)
            try:
                val = {"hour": (secs // 3600) % 24,
                       "minute": (secs // 60) % 60,
                       "second": secs % 60,
                       "microsecond": us % np.int64(60_000_000),
                       "millisecond": (us % np.int64(60_000_000)) // 1000}[part]
            except KeyError:
                raise PlanError(f"unsupported TIME part {part!r}") from None
            return DeviceColumn(val.astype(jnp.int64), validity, T.INT64)
        if datecol.dtype.kind is T.TypeKind.TIMESTAMP:
            us = days
            if part in ("hour", "minute", "second"):
                secs = us // np.int64(1_000_000)
                val = {"hour": (secs // 3600) % 24, "minute": (secs // 60) % 60,
                       "second": secs % 60}[part]
                return DeviceColumn(val.astype(jnp.int64), validity, T.INT64)
            days = (us // np.int64(86_400_000_000)).astype(jnp.int32)
        y, m, d = DU.civil_from_days(days)
        val = {"year": y, "month": m, "day": d}.get(part)
        bounds = None
        if val is not None and datecol.bounds is not None \
                and datecol.dtype.kind is not T.TypeKind.TIMESTAMP:
            # interval propagation: year is monotone in days, so the bounds
            # of extract(year) are extract at the day bounds; month/day just
            # take their full cyclic ranges.  This is what lets GROUP BY
            # year/month and joins on them prove small dense domains
            # (the reference's interval analysis on temporal exprs,
            # physical-expr/src/intervals/cp_solver.rs).
            import numpy as _np

            def _year_of(day: int) -> int:  # pure host math (trace-safe)
                d64 = _np.datetime64("1970-01-01") + _np.timedelta64(int(day), "D")
                return int(d64.astype("datetime64[Y]").astype(int)) + 1970

            bounds = {"year": (_year_of(datecol.bounds[0]),
                               _year_of(datecol.bounds[1])),
                      "month": (1, 12), "day": (1, 31)}[part]
        elif part == "quarter":
            bounds = (1, 4)
        elif part in ("dow", "dayofweek"):
            bounds = (0, 6)
        elif part in ("doy", "dayofyear"):
            bounds = (1, 366)
        if val is None:
            if part == "quarter":
                val = (m - 1) // 3 + 1
            elif part in ("dow", "dayofweek"):
                val = (days.astype(jnp.int64) + 4) % 7
            elif part in ("doy", "dayofyear"):
                val = days - DU.days_from_civil(y, jnp.ones_like(m), jnp.ones_like(d)) + 1
            else:
                raise PlanError(f"unsupported date part {part!r}")
        return DeviceColumn(val.astype(jnp.int64), validity, T.INT64,
                            bounds=bounds)

    if f == "date_trunc":
        unit = str(_literal_value(arg_exprs[0])).lower()
        datecol = args[1]
        if datecol.dtype.kind is T.TypeKind.TIME:
            raise PlanError("date_trunc does not support TIME input "
                            "(reference: datetime/date_trunc.rs signatures)")
        if datecol.dtype.kind is T.TypeKind.TIMESTAMP:
            us = datecol.data
            divs = {"microsecond": 1, "microseconds": 1,
                    "millisecond": 1_000, "milliseconds": 1_000,
                    "second": 1_000_000, "seconds": 1_000_000,
                    "minute": 60_000_000, "minutes": 60_000_000,
                    "hour": 3_600_000_000, "hours": 3_600_000_000,
                    "day": 86_400_000_000, "days": 86_400_000_000}
            if unit in divs:
                d = np.int64(divs[unit])
                return DeviceColumn((us // d) * d, validity, T.TIMESTAMP)
            days32 = (us // np.int64(86_400_000_000)).astype(jnp.int32)
            trunc_days = eval_scalar_function(
                "date_trunc", [args[0], DeviceColumn(days32, validity, T.DATE32)],
                arg_exprs, T.DATE32, capacity)
            return DeviceColumn(trunc_days.data.astype(jnp.int64) * np.int64(86_400_000_000),
                                validity, T.TIMESTAMP)
        days = datecol.data
        y, m, d = DU.civil_from_days(days)
        one = jnp.ones_like(m)
        if unit == "year":
            out = DU.days_from_civil(y, one, one)
        elif unit == "quarter":
            qm = ((m - 1) // 3) * 3 + 1
            out = DU.days_from_civil(y, qm, one)
        elif unit == "month":
            out = DU.days_from_civil(y, m, one)
        elif unit == "week":
            out = (days - ((days.astype(jnp.int64) + 3) % 7).astype(days.dtype))
        elif unit in ("day", "hour", "minute", "second", "millisecond",
                      "microsecond"):
            out = days  # sub-day truncation of a DATE32 is the identity
        else:
            raise PlanError(f"unsupported date_trunc unit {unit!r}")
        return DeviceColumn(out, validity, T.DATE32)

    if f == "round" and len(args) == 2:
        # two-arg round must run BEFORE the unary-numeric dispatch (which
        # would round to zero digits: round(1.21, 2) used to return 1.0);
        # decimals round exactly in scaled-int arithmetic, half away from
        # zero (the reference's round semantics, functions/src/math/round.rs)
        a = args[0]
        nd = int(_literal_value(arg_exprs[1]))
        if a.dtype.is_decimal or a.dtype.is_integer:
            s = a.dtype.scale if a.dtype.is_decimal else 0
            if nd >= s:
                return DeviceColumn(a.data, validity, a.dtype)
            q = 10 ** (s - nd)
            d = a.data.astype(jnp.int64)
            out = jnp.sign(d) * ((jnp.abs(d) + q // 2) // q) * q
            return DeviceColumn(out.astype(a.data.dtype), validity, a.dtype)
        x = _to_float(a)
        scale = 10.0 ** nd
        return DeviceColumn(jnp.round(x * scale) / scale, validity, T.FLOAT64)

    if f in _NUMERIC_UNARY:
        a = args[0]
        if f == "abs":
            return DeviceColumn(jnp.abs(a.data), validity, a.dtype)
        if f in ("sign", "signum"):
            return DeviceColumn(jnp.sign(a.data), validity, a.dtype)
        x = _to_float(a)
        impl = {
            "ceil": jnp.ceil, "floor": jnp.floor, "trunc": jnp.trunc,
            "sqrt": jnp.sqrt, "cbrt": jnp.cbrt, "exp": jnp.exp, "ln": jnp.log,
            "log10": jnp.log10, "log2": jnp.log2, "sin": jnp.sin,
            "cos": jnp.cos, "tan": jnp.tan, "asin": jnp.arcsin,
            "acos": jnp.arccos, "atan": jnp.arctan, "sinh": jnp.sinh,
            "cosh": jnp.cosh, "tanh": jnp.tanh, "degrees": jnp.degrees,
            "radians": jnp.radians, "round": jnp.round,
        }[f]
        out = impl(x)
        if f in ("ceil", "floor", "round", "trunc") and (a.dtype.is_integer or a.dtype.is_decimal):
            if a.dtype.is_decimal:
                s = 10 ** a.dtype.scale
                sc = _to_float(a)
                out = impl(sc) if f != "round" else jnp.round(sc)
                return DeviceColumn(jnp.rint(out * s).astype(jnp.int64), validity, a.dtype)
            return DeviceColumn(a.data, validity, a.dtype)
        return DeviceColumn(out, validity, T.FLOAT64)

    if f == "round" and len(args) == 2:
        x = _to_float(args[0])
        nd = _literal_value(arg_exprs[1])
        scale = 10.0 ** int(nd)
        return DeviceColumn(jnp.round(x * scale) / scale, validity, T.FLOAT64)

    if f in ("power", "pow"):
        return DeviceColumn(jnp.power(_to_float(args[0]), _to_float(args[1])), validity, T.FLOAT64)
    if f == "atan2":
        return DeviceColumn(jnp.arctan2(_to_float(args[0]), _to_float(args[1])), validity, T.FLOAT64)
    if f == "log" and len(args) == 2:
        b, x = _to_float(args[0]), _to_float(args[1])
        return DeviceColumn(jnp.log(x) / jnp.log(b), validity, T.FLOAT64)
    if f == "pi":
        return DeviceColumn(jnp.full(capacity, np.pi, jnp.float64), None, T.FLOAT64)

    if f in _STRING_UNARY:
        a = args[0]
        impl = {
            "upper": np.char.upper, "lower": np.char.lower,
            "trim": np.char.strip, "btrim": np.char.strip,
            "ltrim": np.char.lstrip, "rtrim": np.char.rstrip,
            "initcap": np.char.title,
            "reverse": lambda v: np.array([s[::-1] for s in v], dtype="U"),
        }[f]
        return transform_dictionary(a, impl)

    if f in ("substr", "substring"):
        a = args[0]
        start = int(_literal_value(arg_exprs[1]))
        length = int(_literal_value(arg_exprs[2])) if len(arg_exprs) > 2 else None
        i0 = max(start - 1, 0)
        i1 = None if length is None else i0 + max(length, 0)

        def fn(vals):
            return np.array([v[i0:i1] for v in vals], dtype="U")

        return transform_dictionary(a, fn)

    if f in ("left", "right"):
        a = args[0]
        n = int(_literal_value(arg_exprs[1]))
        fn = (lambda vals: np.array([v[:n] for v in vals], "U")) if f == "left" else (
            lambda vals: np.array([v[-n:] if n else "" for v in vals], "U"))
        return transform_dictionary(a, fn)

    if f == "replace":
        a = args[0]
        old = str(_literal_value(arg_exprs[1]))
        new = str(_literal_value(arg_exprs[2]))
        return transform_dictionary(a, lambda vals: np.char.replace(vals, old, new))

    if f == "concat":
        # Any mix of literals and dictionary-encoded columns: literals fold
        # into the dictionary host-side; each column multiplies the composite
        # dictionary (codes = base * |d| + code). The product is capped --
        # concat of two high-cardinality columns would need a row-wise string
        # kernel, which the dictionary model deliberately avoids.
        from ..common.errors import NotImplementedYet

        CAP = 1 << 18
        # one BINARY operand makes the whole concat binary (reference
        # coerces utf8 operands to binary, binary.slt || cases). Binary
        # composites build with Python bytes — numpy "S" arrays drop
        # trailing NUL bytes.
        binmode = any(a.dtype is not None and a.dtype.is_binary
                      for a in args)

        def _as_bytes(v):
            return v if isinstance(v, bytes) else str(v).encode("utf-8")

        if binmode:
            vals_b = [b""]
        else:
            vals = np.array([""], dtype="U1")
        codes = None  # jnp codes into vals; None = single value 0
        for a, ae in zip(args, arg_exprs):
            if not (a.dtype.is_string and a.dictionary is not None
                    and len(a.dictionary.values)):
                lit = _literal_value(ae) if isinstance(
                    ae.expr if isinstance(ae, E.Alias) else ae, E.Literal) else None
                if lit is None and a.dtype.is_string:
                    continue  # empty-dictionary column contributes nothing
                if lit is None:
                    raise NotImplementedYet(
                        "concat of non-string non-literal argument")
                if binmode:
                    vals_b = [v + _as_bytes(lit) for v in vals_b]
                else:
                    vals = np.char.add(vals, np.array([str(lit)], "U"))
                continue
            if binmode:
                dvl = [_as_bytes(v) for v in a.dictionary.values]
                if len(vals_b) * len(dvl) > CAP:
                    raise NotImplementedYet(
                        f"concat dictionary product {len(vals_b)}x{len(dvl)} "
                        f"exceeds {CAP}")
                vals_b = [v + d for v in vals_b for d in dvl]
                cc = jnp.clip(a.data, 0, len(dvl) - 1)
                codes = cc if codes is None else codes * len(dvl) + cc
                continue
            dv = np.asarray(a.dictionary.values, dtype="U")
            if len(vals) * len(dv) > CAP:
                raise NotImplementedYet(
                    f"concat dictionary product {len(vals)}x{len(dv)} "
                    f"exceeds {CAP}")
            vals = np.char.add(
                np.repeat(vals, len(dv)),
                np.tile(dv, len(vals)))
            cc = jnp.clip(a.data, 0, len(dv) - 1)
            codes = cc if codes is None else codes * len(dv) + cc
        if codes is None:
            codes = jnp.zeros(capacity, dtype=jnp.int32)
        # restore the sorted-unique dictionary invariant
        if binmode:
            uniq_l = sorted(set(vals_b))
            lutmap = {v: i for i, v in enumerate(uniq_l)}
            inv = np.array([lutmap[v] for v in vals_b], dtype=np.int32)
            out_codes = jnp.asarray(inv)[codes]
            return DeviceColumn(out_codes.astype(jnp.int32), validity,
                                T.BINARY,
                                Dictionary(np.array(uniq_l, dtype=object)))
        uniq, inv = np.unique(vals, return_inverse=True)
        out_codes = jnp.asarray(inv.astype(np.int32))[codes]
        return DeviceColumn(out_codes.astype(jnp.int32), validity, T.STRING,
                            Dictionary(uniq.astype(object)))

    if f == "concat_ws":
        # concat_ws(sep, ...): NULL args are skipped (no separator), NULL
        # sep -> NULL (reference functions/src/string/concat_ws.rs). Same
        # composite-dictionary scheme as concat, but pieces stay tuples so
        # per-row NULL columns can drop their separator at join time.
        from ..common.errors import NotImplementedYet

        CAP = 1 << 18
        if not arg_exprs:
            raise PlanError("concat_ws needs a separator argument")
        sep_node = arg_exprs[0]
        sep_node = sep_node.expr if isinstance(sep_node, E.Alias) else sep_node
        while isinstance(sep_node, E.Cast):
            sep_node = sep_node.expr
        if not isinstance(sep_node, E.Literal):
            raise NotImplementedYet("concat_ws with a non-constant separator")
        if sep_node.value is None:
            return DeviceColumn(jnp.zeros(capacity, jnp.int32),
                                jnp.zeros(capacity, bool), T.STRING,
                                Dictionary(np.array([], object)))
        sep = str(sep_node.value)
        combos = [()]  # tuples of str-or-None pieces
        codes = None
        for a, ae in zip(args[1:], arg_exprs[1:]):
            node = ae.expr if isinstance(ae, E.Alias) else ae
            while isinstance(node, E.Cast):
                node = node.expr
            const_pieces = None
            if isinstance(node, E.Literal):
                const_pieces = [None if node.value is None
                                else str(node.value)]
            elif isinstance(node, E.ScalarFunction) \
                    and node.fname in ("make_array", "array", "make_list"):
                try:
                    from .nested import _literal_py

                    lst = _literal_py(node)
                    const_pieces = [None if x is None else str(x)
                                    for x in (lst or [])]
                except PlanError:
                    const_pieces = None
            if const_pieces is not None:
                combos = [c + tuple(const_pieces) for c in combos]
                continue
            if not (a.dtype.is_string and a.dictionary is not None):
                raise NotImplementedYet(
                    "concat_ws of non-string non-constant argument")
            dv = [str(v) for v in a.dictionary.values]
            cc = jnp.clip(a.data, 0, max(len(dv) - 1, 0))
            if a.validity is not None:
                dv = dv + [None]
                cc = jnp.where(a.validity, cc, len(dv) - 1)
            if not dv:
                continue
            if len(combos) * len(dv) > CAP:
                raise NotImplementedYet(
                    f"concat_ws dictionary product {len(combos)}x{len(dv)} "
                    f"exceeds {CAP}")
            combos = [c + (d,) for c in combos for d in dv]
            codes = cc if codes is None else codes * len(dv) + cc
        if codes is None:
            codes = jnp.zeros(capacity, dtype=jnp.int32)
        vals = np.array([sep.join(p for p in c if p is not None)
                         for c in combos], dtype=object)
        uniq, inv = np.unique(vals.astype("U")), None
        lutmap = {v: i for i, v in enumerate(uniq)}
        invarr = np.array([lutmap[str(v)] for v in vals], dtype=np.int32)
        out_codes = jnp.asarray(invarr)[codes]
        return DeviceColumn(out_codes.astype(jnp.int32), None, T.STRING,
                            Dictionary(uniq.astype(object)))

    if f in ("length", "char_length", "character_length", "octet_length"):
        a = args[0]
        d = a.dictionary
        if a.dtype is not None and a.dtype.is_binary:
            # byte length of the dictionary's bytes values
            lens = (np.array([len(v) for v in d.values], dtype=np.int64)
                    if d and len(d.values) else np.zeros(1, np.int64))
            lut = jnp.asarray(lens)
            out = lut[jnp.clip(a.data, 0, len(lens) - 1)]
            return DeviceColumn(out, validity, T.INT64)
        lens = np.char.str_len(np.asarray(d.values, dtype="U")) if d and len(d.values) else np.zeros(1, np.int64)
        lut = jnp.asarray(lens.astype(np.int64))
        out = lut[jnp.clip(a.data, 0, len(lens) - 1)]
        return DeviceColumn(out, validity, T.INT64)

    if f in ("starts_with", "ends_with", "contains"):
        a = args[0]
        pat = str(_literal_value(arg_exprs[1]))
        impl = {
            "starts_with": lambda v: np.char.startswith(v, pat),
            "ends_with": lambda v: np.char.endswith(v, pat),
            "contains": lambda v: np.char.find(v, pat) >= 0,
        }[f]
        return DeviceColumn(dict_predicate(a, impl), validity, T.BOOL)

    if f == "strpos" or f == "position":
        a = args[0]
        pat = str(_literal_value(arg_exprs[1]))
        d = a.dictionary
        pos = (np.char.find(np.asarray(d.values, "U"), pat) + 1).astype(np.int64) if d and len(d.values) else np.zeros(1, np.int64)
        out = jnp.asarray(pos)[jnp.clip(a.data, 0, len(pos) - 1)]
        return DeviceColumn(out, validity, T.INT64)

    if f == "coalesce":
        dictionary = None
        if out_dtype.is_string:
            from .expr_compiler import unify_many_string_columns

            args = unify_many_string_columns(list(args))
            dictionary = args[0].dictionary
        out = args[-1]
        data, valid = out.data, out.valid()
        for c in reversed(args[:-1]):
            cd = c.data if dictionary is not None else _coerce_to(c, out_dtype)
            data = jnp.where(c.valid(), cd, data)
            valid = c.valid() | valid
        all_valid = bool(all(a.validity is None for a in args))
        return DeviceColumn(data, None if all_valid else valid, out_dtype,
                            dictionary)

    if f in ("nvl", "ifnull"):
        a, b = args
        if a.dtype.is_string:
            from .expr_compiler import unify_string_columns

            a, b = unify_string_columns(a, b)
            bd = b.data
        else:
            bd = _coerce_to(b, a.dtype)
        data = jnp.where(a.valid(), a.data, bd)
        valid = a.valid() | b.valid()
        return DeviceColumn(data, None if (a.validity is None or b.validity is None) else valid, a.dtype,
                            a.dictionary)

    if f == "nullif":
        a, b = args
        if a.dtype.is_string:
            from .expr_compiler import unify_string_columns

            ua, ub = unify_string_columns(a, b)
            eqmask = (ua.data == ub.data) & ua.valid() & ub.valid()
        else:
            eqmask = (a.data == _coerce_to(b, a.dtype)) & a.valid() & b.valid()
        valid = a.valid() & ~eqmask
        return DeviceColumn(a.data, valid, a.dtype, a.dictionary)

    if f in ("md5", "sha224", "sha256", "sha384", "sha512"):
        import hashlib

        def fn(vals):
            h = getattr(hashlib, f)
            return np.array([h(v.encode()).hexdigest() for v in vals], "U")

        return transform_dictionary(args[0], fn)

    if f in ("regexp_like", "regexp_match"):
        pat = str(_literal_value(arg_exprs[1]))
        rx = re.compile(pat)

        def pred(vals):
            return np.fromiter((rx.search(v) is not None for v in vals),
                               dtype=bool, count=len(vals))

        return DeviceColumn(dict_predicate(args[0], pred), validity, T.BOOL)

    if f == "regexp_replace":
        pat = str(_literal_value(arg_exprs[1]))
        repl = str(_literal_value(arg_exprs[2]))
        rx = re.compile(pat)
        return transform_dictionary(
            args[0], lambda vals: np.array([rx.sub(repl, v) for v in vals], "U"))

    if f == "to_date":
        a = args[0]
        d = a.dictionary
        vals = np.asarray(d.values, "U") if d and len(d.values) else np.array([], "U1")
        lut = (vals.astype("datetime64[D]").astype(np.int32)
               if len(vals) else np.zeros(1, np.int32))
        out = jnp.asarray(lut)[jnp.clip(a.data, 0, len(lut) - 1)]
        return DeviceColumn(out, validity, T.DATE32)

    if f in ("lpad", "rpad"):
        a = args[0]
        width = int(_literal_value(arg_exprs[1]))
        fill = str(_literal_value(arg_exprs[2])) if len(arg_exprs) > 2 else " "

        def fn(vals):
            if f == "lpad":
                return np.array([(fill * width + v)[-width:] if len(v) < width else v[:width]
                                 for v in vals], "U")
            return np.array([(v + fill * width)[:width] for v in vals], "U")

        return transform_dictionary(a, fn)

    if f == "repeat":
        n = int(_literal_value(arg_exprs[1]))
        return transform_dictionary(args[0], lambda vals: np.array([v * n for v in vals], "U"))

    if f == "translate":
        src = str(_literal_value(arg_exprs[1]))
        tgt = str(_literal_value(arg_exprs[2]))
        table = str.maketrans(src, tgt[: len(src)].ljust(len(src)))
        return transform_dictionary(
            args[0], lambda vals: np.array([v.translate(table) for v in vals], "U"))

    if f == "ascii":
        a = args[0]
        d = a.dictionary
        vals = np.asarray(d.values, "U") if d and len(d.values) else np.array([""], "U1")
        lut = np.array([ord(v[0]) if v else 0 for v in vals], np.int64)
        return DeviceColumn(jnp.asarray(lut)[jnp.clip(a.data, 0, len(lut) - 1)],
                            validity, T.INT64)

    if f == "split_part":
        delim = str(_literal_value(arg_exprs[1]))
        n = int(_literal_value(arg_exprs[2]))

        def fn(vals):
            out = []
            for v in vals:
                parts = v.split(delim) if delim else [v]
                i = n - 1 if n > 0 else len(parts) + n
                out.append(parts[i] if 0 <= i < len(parts) else "")
            return np.array(out, "U")

        return transform_dictionary(args[0], fn)

    if f in ("substr_index", "substring_index"):
        # MySQL semantics (reference: unicode/substrindex.rs): n>0 keeps
        # everything before the n-th delimiter from the left, n<0 from the
        # right; |n| >= occurrences returns the whole string.
        delim = str(_literal_value(arg_exprs[1]))
        n = int(_literal_value(arg_exprs[2]))

        def fn(vals):
            out = []
            for v in vals:
                if n == 0 or not delim:
                    out.append("")
                    continue
                parts = v.split(delim)
                out.append(delim.join(parts[:n] if n > 0 else parts[n:]))
            return np.array(out, "U")

        return transform_dictionary(args[0], fn)

    if f in ("regexp_count", "regexp_instr"):
        # reference: regex/regexpcount.rs, regex/regexpinstr.rs (2-arg forms)
        pat = str(_literal_value(arg_exprs[1]))
        rx = re.compile(pat)
        a = args[0]
        d = a.dictionary
        vals = np.asarray(d.values, "U") if d and len(d.values) else np.array([""], "U1")
        if f == "regexp_count":
            lut = np.array([len(rx.findall(v)) for v in vals], np.int64)
        else:
            lut = np.array([(rx.search(v).start() + 1) if rx.search(v) else 0
                            for v in vals], np.int64)
        return DeviceColumn(jnp.asarray(lut)[jnp.clip(a.data, 0, len(lut) - 1)],
                            validity, T.INT64)

    if f == "to_local_time":
        # session timezone is UTC and timestamps are naive: identity
        # (reference: datetime/to_local_time.rs strips the tz offset)
        return DeviceColumn(args[0].data, validity, args[0].dtype)

    if f == "at_time_zone":
        # expr AT TIME ZONE 'tz': this engine carries naive-UTC timestamps,
        # so only UTC-equivalent zones evaluate (others would need a tz
        # database; the record then errors like an unknown-zone reference)
        tz = str(_literal_value(arg_exprs[1])).lower()
        if tz not in ("utc", "+00:00", "+00", "etc/utc", "z", "00:00"):
            raise PlanError(f"AT TIME ZONE {tz!r}: only UTC-equivalent "
                            "zones are supported (naive-UTC engine)")
        a = args[0]
        if a.dtype.kind is T.TypeKind.TIMESTAMP:
            return a
        from .expr_compiler import cast_column

        return cast_column(a, T.TIMESTAMP, capacity)

    if f == "to_time":
        a = args[0]
        if a.dtype.kind is T.TypeKind.TIME:
            return a
        if a.dtype.kind is T.TypeKind.TIMESTAMP:
            us_day = np.int64(86_400_000_000)
            return DeviceColumn(((a.data % us_day) + us_day) % us_day,
                                validity, T.TIME)
        from .expr_compiler import cast_column

        return cast_column(a, T.TIME, capacity)

    if f == "make_time":
        # make_time(hour, minute, second) (reference: datetime/make_time.rs);
        # literal arguments validate eagerly like the reference's error path
        try:
            lh, lm, ls = (_literal_value(a) for a in arg_exprs)
            if not (0 <= int(lh) <= 23 and 0 <= int(lm) <= 59
                    and 0 <= float(ls) < 60):
                raise PlanError(f"make_time: out of range ({lh}, {lm}, {ls})")
        except PlanError:
            raise
        except Exception:  # noqa: BLE001 -- non-literal args: no static check
            pass
        h = args[0].data.astype(jnp.int64)
        m = args[1].data.astype(jnp.int64)
        s = _to_float(args[2])
        us = ((h * 60 + m) * 60) * 1_000_000 + jnp.rint(s * 1e6).astype(jnp.int64)
        return DeviceColumn(us, validity, T.TIME)

    if f == "current_time":
        import datetime as _dt

        now = _dt.datetime.now(_dt.timezone.utc).time()
        us = ((now.hour * 60 + now.minute) * 60 + now.second) * 1_000_000 \
            + now.microsecond
        return DeviceColumn(jnp.full(capacity, us, jnp.int64), None, T.TIME)

    if f in ("now", "current_timestamp"):
        import datetime as _dt

        now = _dt.datetime.now(_dt.timezone.utc)
        us = int(now.timestamp() * 1e6)
        return DeviceColumn(jnp.full(capacity, us, jnp.int64), None,
                            T.TIMESTAMP)

    if f in ("current_date", "today"):
        import datetime as _dt

        days = (_dt.datetime.now(_dt.timezone.utc).date()
                - _dt.date(1970, 1, 1)).days
        return DeviceColumn(jnp.full(capacity, days, jnp.int32), None,
                            T.DATE32)

    if f == "overlay":
        repl = str(_literal_value(arg_exprs[1]))
        pos = int(_literal_value(arg_exprs[2]))
        cnt = int(_literal_value(arg_exprs[3])) if len(arg_exprs) > 3 else len(repl)

        def fn(vals):
            return np.array([v[: pos - 1] + repl + v[pos - 1 + cnt:]
                             for v in vals], "U")

        return transform_dictionary(args[0], fn)

    if f in ("chr", "char", "to_hex"):
        # integer -> string through a bounds-sized host lookup table
        a = args[0]
        b = a.bounds
        if b is None or b[1] - b[0] > (1 << 16):
            raise PlanError(f"{f} needs an integer column with small static "
                            f"bounds (got bounds={b})")
        lo, hi = int(b[0]), int(b[1])
        dom = np.arange(lo, hi + 1)
        strs = (np.array([format(x, "x") for x in dom], dtype="U")
                if f == "to_hex" else
                np.array([chr(x) if 0 < x < 0x110000 else "" for x in dom],
                         dtype="U"))
        uniq = np.unique(strs)
        lut = np.searchsorted(uniq, strs).astype(np.int32)
        codes = jnp.asarray(lut)[jnp.clip(a.data.astype(jnp.int64) - lo, 0,
                                          len(lut) - 1).astype(jnp.int32)]
        return DeviceColumn(codes, validity, T.STRING,
                            Dictionary(uniq.astype(object)))

    if f == "uuid":
        import uuid as _uuid

        vals = np.array(sorted(str(_uuid.uuid4()) for _ in range(capacity)),
                        dtype=object)
        return DeviceColumn(jnp.arange(capacity, dtype=jnp.int32), None,
                            T.STRING, Dictionary(vals))

    if f in ("encode", "decode"):
        enc = str(_literal_value(arg_exprs[1])).lower()
        import base64

        def fn(vals):
            out = []
            for v in vals:
                try:
                    if f == "encode":
                        raw = v.encode()
                        out.append(raw.hex() if enc == "hex"
                                   else base64.b64encode(raw).decode())
                    else:
                        raw = (bytes.fromhex(v) if enc == "hex"
                               else base64.b64decode(v))
                        out.append(raw.decode("utf-8", "replace"))
                except (ValueError, UnicodeError):
                    out.append("")
            return np.array(out, "U")

        return transform_dictionary(args[0], fn)

    if f == "find_in_set":
        lst = str(_literal_value(arg_exprs[1])).split(",")
        idx = {v: i + 1 for i, v in enumerate(lst)}

        def lut(vals):
            return np.array([idx.get(v, 0) for v in vals], np.int64)

        a = args[0]
        d = a.dictionary
        vals = np.asarray(d.values, "U") if d and len(d.values) else np.array([""], "U1")
        table = lut(vals)
        return DeviceColumn(jnp.asarray(table)[jnp.clip(a.data, 0, len(table) - 1)],
                            validity, T.INT64)

    if f == "factorial":
        facts = np.ones(21, dtype=np.int64)
        for i in range(2, 21):
            facts[i] = facts[i - 1] * i
        x = jnp.clip(args[0].data.astype(jnp.int64), 0, 20)
        return DeviceColumn(jnp.asarray(facts)[x], validity, T.INT64)

    if f in ("gcd", "lcm"):
        a = args[0].data.astype(jnp.int64)
        b = args[1].data.astype(jnp.int64)
        # |i64::MIN| does not fit int64 -- jnp.gcd's Euclid loop never
        # terminates on it. abs() wraps MIN to itself and the uint64
        # reinterpretation is exactly 2^63, so the loop runs in uint64.
        au = jnp.abs(a).astype(jnp.uint64)
        bu = jnp.abs(b).astype(jnp.uint64)
        out = (jnp.gcd(au, bu) if f == "gcd"
               else jnp.lcm(au, bu)).astype(jnp.int64)
        return DeviceColumn(out, validity, T.INT64)

    if f == "cot":
        return DeviceColumn(1.0 / jnp.tan(_to_float(args[0])), validity, T.FLOAT64)

    if f == "nanvl":
        x, y = _to_float(args[0]), _to_float(args[1])
        return DeviceColumn(jnp.where(jnp.isnan(x), y, x), validity, T.FLOAT64)

    if f == "isnan":
        a = args[0]
        out = jnp.isnan(a.data) if a.dtype.is_float \
            else jnp.zeros(a.data.shape[0], dtype=bool)
        return DeviceColumn(out, validity, T.BOOL)

    if f == "iszero":
        a = args[0]
        if a.dtype.is_float:
            out = a.data == 0.0
        else:
            out = a.data.astype(jnp.int64) == 0
        return DeviceColumn(out, validity, T.BOOL)

    if f == "make_date":
        y = args[0].data.astype(jnp.int64)
        m = args[1].data.astype(jnp.int64)
        d_ = args[2].data.astype(jnp.int64)
        return DeviceColumn(DU.days_from_civil(y, m, d_).astype(jnp.int32),
                            validity, T.DATE32)

    if f in ("to_timestamp", "to_timestamp_seconds", "to_timestamp_millis",
             "to_timestamp_micros", "to_timestamp_nanos"):
        # numeric input is interpreted in the named unit; output storage is
        # always us, truncated to that unit's precision (reference:
        # datetime/to_timestamp.rs family)
        unit_us = {"to_timestamp": 1_000_000, "to_timestamp_seconds": 1_000_000,
                   "to_timestamp_millis": 1_000, "to_timestamp_micros": 1,
                   "to_timestamp_nanos": 1}[f]
        trunc_us = {"to_timestamp": 1, "to_timestamp_seconds": 1_000_000,
                    "to_timestamp_millis": 1_000, "to_timestamp_micros": 1,
                    "to_timestamp_nanos": 1}[f]
        a = args[0]
        if a.dtype.is_string:
            d = a.dictionary
            vals = np.asarray(d.values, "U") if d and len(d.values) else np.array([], "U1")
            lut = (vals.astype("datetime64[us]").astype(np.int64)
                   if len(vals) else np.zeros(1, np.int64))
            out = jnp.asarray(lut)[jnp.clip(a.data, 0, len(lut) - 1)]
            if trunc_us > 1:
                t_ = np.int64(trunc_us)
                out = (out // t_) * t_
            return DeviceColumn(out, validity, T.TIMESTAMP)
        if a.dtype.kind is T.TypeKind.TIMESTAMP:
            if trunc_us > 1:
                t_ = np.int64(trunc_us)
                return DeviceColumn((a.data // t_) * t_, validity, T.TIMESTAMP)
            return a
        if a.dtype.kind is T.TypeKind.DATE32:
            return DeviceColumn(a.data.astype(jnp.int64) * np.int64(86_400_000_000),
                                validity, T.TIMESTAMP)
        if a.dtype.is_integer and f != "to_timestamp":
            if f == "to_timestamp_nanos":
                return DeviceColumn(a.data.astype(jnp.int64) // 1_000,
                                    validity, T.TIMESTAMP)
            return DeviceColumn(a.data.astype(jnp.int64) * np.int64(unit_us),
                                validity, T.TIMESTAMP)
        secs = _to_float(a)
        us = (secs * (1e6 if f in ("to_timestamp", "to_timestamp_seconds")
                      else 1e3 if f == "to_timestamp_millis"
                      else 1.0 if f == "to_timestamp_micros"
                      else 1e-3)).astype(jnp.int64)
        if trunc_us > 1:
            t_ = np.int64(trunc_us)
            us = (us // t_) * t_
        return DeviceColumn(us, validity, T.TIMESTAMP)

    if f == "nvl2":
        # nvl2(test, when_not_null, when_null) (reference: core/nvl2.rs)
        a, b, c = args[0], args[1], args[2]
        not_null = a.valid() if a.validity is not None else jnp.ones(
            a.data.shape[0], dtype=bool)
        bd, cd = b.data, c.data
        if b.dtype != c.dtype and (b.dtype.is_numeric and c.dtype.is_numeric):
            common = T.common_numeric_type(b.dtype, c.dtype)
            from .expr_compiler import cast_column

            b = cast_column(b, common, capacity)
            c = cast_column(c, common, capacity)
            bd, cd = b.data, c.data
        data = jnp.where(not_null, bd, cd)
        vb = b.valid() if b.validity is not None else None
        vc = c.valid() if c.validity is not None else None
        v = None
        if vb is not None or vc is not None:
            vb_ = vb if vb is not None else jnp.ones_like(not_null)
            vc_ = vc if vc is not None else jnp.ones_like(not_null)
            v = jnp.where(not_null, vb_, vc_)
        return DeviceColumn(data, v, b.dtype, b.dictionary)

    if f == "from_unixtime":
        secs = args[0].data.astype(jnp.int64)
        return DeviceColumn(secs * np.int64(1_000_000), validity, T.TIMESTAMP)

    if f == "to_unixtime":
        a = args[0]
        if a.dtype.kind is T.TypeKind.TIMESTAMP:
            return DeviceColumn(a.data // np.int64(1_000_000), validity, T.INT64)
        if a.dtype.kind is T.TypeKind.DATE32:
            return DeviceColumn(a.data.astype(jnp.int64) * np.int64(86_400),
                                validity, T.INT64)
        from .expr_compiler import cast_column

        ts = cast_column(a, T.TIMESTAMP, capacity)
        return DeviceColumn(ts.data // np.int64(1_000_000), validity, T.INT64)

    if f == "date_bin":
        # date_bin(stride_interval, ts[, origin]): floor to stride boundaries
        stride_col = args[0]
        if stride_col.dtype.kind is T.TypeKind.INTERVAL_DAYS:
            stride_us = int(_literal_value(arg_exprs[0])) * 86_400_000_000
        elif stride_col.dtype.kind is T.TypeKind.INTERVAL_MONTHS:
            raise PlanError("date_bin with month strides is not supported")
        else:
            stride_us = int(_literal_value(arg_exprs[0]))
        if stride_us <= 0:
            raise PlanError("date_bin stride must be positive "
                            "(reference: datetime/date_bin.rs)")
        if any(c.dtype.kind is T.TypeKind.TIME for c in args[1:]):
            raise PlanError("date_bin expects date/timestamp inputs, not TIME")
        a = args[1]
        x = (a.data.astype(jnp.int64) * np.int64(86_400_000_000)
             if a.dtype.kind is T.TypeKind.DATE32 else a.data.astype(jnp.int64))
        origin = 0
        if len(args) > 2:
            o = args[2]
            ov = _literal_value(arg_exprs[2])
            if o.dtype.kind is T.TypeKind.DATE32 or a.dtype.kind is T.TypeKind.DATE32:
                origin = DU.date_str_to_days(str(ov)) * 86_400_000_000 \
                    if isinstance(ov, str) else int(ov)
            else:
                origin = int(np.datetime64(str(ov), "us").astype(np.int64)) \
                    if isinstance(ov, str) else int(ov)
        out = ((x - origin) // stride_us) * stride_us + origin
        return DeviceColumn(out, validity, T.TIMESTAMP)

    if f in ("greatest", "least"):
        # skip-NULL semantics: NULL only when every argument is NULL
        is_max = f == "greatest"
        if out_dtype.is_string:
            from .expr_compiler import unify_many_string_columns

            args = unify_many_string_columns(list(args))
        base = args[0]
        out_np = out_dtype.np_dtype()
        acc = None
        acc_valid = None
        for c in args:
            x = _coerce_to(c, out_dtype) if c.dtype != out_dtype else c.data
            v = c.valid()
            if acc is None:
                acc, acc_valid = x, v
                continue
            take_new = v & (~acc_valid | ((x > acc) if is_max else (x < acc)))
            acc = jnp.where(take_new, x, acc)
            acc_valid = acc_valid | v
        all_valid = bool(all(a.validity is None for a in args))
        return DeviceColumn(acc, None if all_valid else acc_valid, out_dtype,
                            base.dictionary if out_dtype.is_string else None)

    if f == "arrow_typeof":
        d = Dictionary(np.array([arrow_type_name(args[0].dtype)], dtype=object))
        return DeviceColumn(jnp.zeros(capacity, jnp.int32), None, T.STRING, d)

    if f == "arrow_cast":
        from .expr_compiler import _literal_column, cast_column

        src = arg_exprs[0] if arg_exprs else None
        src = src.expr if isinstance(src, E.Alias) else src
        if isinstance(src, E.Literal) and src.value is None:
            # arrow_cast(NULL, 'T'): typed all-null column (the int64
            # placeholder a bare NULL literal lowers to has no device cast
            # to string/list targets)
            return _literal_column(E.Literal(None, out_dtype), capacity)
        return cast_column(args[0], out_dtype, capacity)

    if f == "version":
        import datafusion_tpu

        v = getattr(datafusion_tpu, "__version__", "0.2.0")
        d = Dictionary(np.array([f"datafusion-tpu {v}"], dtype=object))
        return DeviceColumn(jnp.zeros(capacity, jnp.int32), None, T.STRING, d)

    raise PlanError(f"scalar function {f!r} not implemented")


def _coerce_to(col: DeviceColumn, dtype: T.DataType) -> jnp.ndarray:
    if col.dtype == dtype:
        return col.data
    if dtype.is_float:
        return _to_float(col).astype(dtype.np_dtype())
    if dtype.is_decimal:
        if col.dtype.is_decimal:
            ds = dtype.scale - col.dtype.scale
            return col.data * (10 ** ds) if ds >= 0 else col.data // (10 ** -ds)
        return (col.data.astype(jnp.int64)) * (10 ** dtype.scale)
    return col.data.astype(dtype.np_dtype())


def _literal_value(e: E.Expr):
    if isinstance(e, E.Alias):
        return _literal_value(e.expr)
    if isinstance(e, E.Cast):
        return _literal_value(e.expr)
    if isinstance(e, E.Literal):
        return e.value
    if isinstance(e, E.Negative):
        return -_literal_value(e.expr)
    raise PlanError(f"expected literal argument, got {e!r}")
