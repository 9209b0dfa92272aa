"""User-defined functions: scalar, aggregate, and window registration.

TPU-native redesign of the reference's UDF traits (datafusion/expr/src/
udf.rs:537 ScalarUDF, udaf.rs:1 AggregateUDF + expr-common/src/
accumulator.rs:51 Accumulator): instead of a row-at-a-time accumulator
contract, a scalar UDF is a jax-traceable array function (vectorized over the
whole capacity-padded column), and an aggregate UDF is a *commutative monoid*
spec — `state` (elementwise map), `combine` (associative merge), `identity`,
`finalize`.  The monoid shape is what the hardware wants: one segmented
associative scan evaluates any UDAF on-chip, and the same combine doubles as
the Partial/Final merge for distributed execution (no separate
`merge_batch` contract needed).

Registries are per-SessionContext, threaded to the typing/eval layers via a
context variable that the session's plan/execute entry points activate
(the reference's FunctionRegistry lookup, expr/src/registry.rs:30).
"""
from __future__ import annotations

import contextlib
import contextvars
import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

from ..common import types as T
from ..common.errors import PlanError


@dataclasses.dataclass(frozen=True)
class ScalarUDF:
    """Vectorized scalar function.

    fn receives one jax array per argument (decimal columns are descaled to
    float64; date32 passed as int32 days; bool as bool) and returns either a
    single array or an (array, validity) pair. When only an array is
    returned, NULLs propagate: output validity = AND of input validities."""

    name: str
    fn: Callable[..., Any]
    return_type: T.DataType
    nullable: bool = True


@dataclasses.dataclass(frozen=True)
class AggregateUDF:
    """Aggregate function as a commutative monoid.

    state(x, ...)  -> pytree of per-row arrays (the mapped contribution)
    combine(a, b)  -> pytree (associative, commutative merge of two states)
    identity       -> pytree of scalars (the monoid identity, used for
                      masked/padded rows)
    finalize(s)    -> array (per-group state pytree -> result values)

    NULL argument rows are skipped (replaced by identity); a group with no
    valid rows yields NULL."""

    name: str
    state: Callable[..., Any]
    combine: Callable[[Any, Any], Any]
    identity: Any
    finalize: Callable[[Any], Any]
    return_type: T.DataType
    nullable: bool = True


@dataclasses.dataclass(frozen=True)
class WindowUDF:
    """Window function over the default frame, built from the same monoid
    spec evaluated as a running segmented scan (reference: udwf.rs)."""

    name: str
    state: Callable[..., Any]
    combine: Callable[[Any, Any], Any]
    identity: Any
    finalize: Callable[[Any], Any]
    return_type: T.DataType
    nullable: bool = True


@dataclasses.dataclass(frozen=True)
class TableUDF:
    """Table function: host callable over literal arguments returning rows
    (a dict of columns or a Table), used in FROM position (reference:
    TableFunctionImpl, catalog/src/table.rs + functions-table/src/
    generate_series.rs)."""

    name: str
    fn: Callable[..., Any]


class FunctionRegistry:
    """Per-session function registry (reference: expr/src/registry.rs:30)."""

    def __init__(self) -> None:
        self.scalars: Dict[str, ScalarUDF] = {}
        self.aggregates: Dict[str, AggregateUDF] = {}
        self.windows: Dict[str, WindowUDF] = {}
        self.tables: Dict[str, TableUDF] = {}
        self.spark = False  # Spark-semantics function set enabled

    def register_scalar(self, udf: ScalarUDF) -> None:
        self.scalars[udf.name.lower()] = udf

    def register_aggregate(self, udaf: AggregateUDF) -> None:
        self.aggregates[udaf.name.lower()] = udaf

    def register_window(self, udwf: WindowUDF) -> None:
        self.windows[udwf.name.lower()] = udwf

    def scalar(self, name: str) -> Optional[ScalarUDF]:
        return self.scalars.get(name.lower())

    def aggregate(self, name: str) -> Optional[AggregateUDF]:
        return self.aggregates.get(name.lower())

    def window(self, name: str) -> Optional[WindowUDF]:
        return self.windows.get(name.lower())

    def register_table_function(self, udtf: TableUDF) -> None:
        self.tables[udtf.name.lower()] = udtf

    def table(self, name: str) -> Optional[TableUDF]:
        return self.tables.get(name.lower())


_EMPTY = FunctionRegistry()
_ACTIVE: contextvars.ContextVar[FunctionRegistry] = contextvars.ContextVar(
    "datafusion_tpu_function_registry", default=_EMPTY)


def active_registry() -> FunctionRegistry:
    return _ACTIVE.get()


@contextlib.contextmanager
def activate(registry: FunctionRegistry):
    token = _ACTIVE.set(registry)
    try:
        yield
    finally:
        _ACTIVE.reset(token)


def with_registry(method):
    """Decorator for SessionContext/DataFrame entry points: activates the
    session's registry for the duration of planning/execution so typing and
    kernel dispatch can resolve UDF names."""
    import functools

    @functools.wraps(method)
    def wrapper(self, *args, **kwargs):
        reg = getattr(self, "functions", None) or getattr(
            getattr(self, "_ctx", None), "functions", None)
        if reg is None:
            return method(self, *args, **kwargs)
        with activate(reg):
            return method(self, *args, **kwargs)

    return wrapper


# ---------------------------------------------------------------------------
# evaluation helpers (called from physical layers under an active registry)
# ---------------------------------------------------------------------------


def udf_input_array(col):
    """Convert a DeviceColumn to the array handed to a UDF: decimals are
    descaled to float64 so user code sees values, not fixed-point words."""
    import jax.numpy as jnp

    if col.dtype.is_string:
        raise PlanError(
            "string arguments to UDFs are not supported (dictionary-encoded); "
            "operate on numeric/date/bool columns")
    if col.dtype.is_decimal:
        return col.data.astype(jnp.float64) / (10.0 ** col.dtype.scale)
    return col.data


def udf_output_column(out, validity, return_type: T.DataType):
    """Coerce a UDF's raw output array to a DeviceColumn of return_type
    (decimals re-scaled to the fixed-point representation)."""
    import jax.numpy as jnp

    from ..data.device import DeviceColumn

    if isinstance(out, tuple) and len(out) == 2:
        out, validity = out[0], out[1]
    if return_type.is_decimal:
        data = jnp.round(out * (10.0 ** return_type.scale)).astype(jnp.int64)
    else:
        data = out.astype(return_type.np_dtype())
    return DeviceColumn(data, validity, return_type)


def make_async_scalar(name: str, fn, return_type: T.DataType,
                      nullable: bool = True) -> ScalarUDF:
    """Wrap a host (optionally async) batch function as a scalar UDF
    (reference capability: AsyncFuncExec, physical-plan/src/async_func.rs +
    async ScalarUDFImpl). The function receives one numpy array per argument
    for the WHOLE batch and returns an array; coroutine functions are run to
    completion per batch (fan out per-row work inside with asyncio.gather).
    Evaluation escapes the XLA trace through jax.pure_callback, so remote /
    IO-bound calls compose with jitted plans on any backend.

    Note: batches are CAPACITY-padded — the function also sees dead-row
    padding values (their results are discarded by the selection mask);
    dedupe or cap remote fan-out inside the function if that matters."""
    import inspect

    import jax
    import numpy as np

    is_coro = inspect.iscoroutinefunction(fn)
    np_dtype = return_type.np_dtype()

    def host(*arrays):
        arrays = [np.asarray(a) for a in arrays]
        if is_coro:
            import asyncio

            out = asyncio.run(fn(*arrays))
        else:
            out = fn(*arrays)
        return np.asarray(out, dtype=np_dtype)

    def traced(*args):
        shape = jax.ShapeDtypeStruct(args[0].shape, np_dtype)
        return jax.pure_callback(host, shape, *args, vmap_method="sequential")

    return ScalarUDF(name, traced, return_type, nullable)


def eval_scalar_udf(udf: ScalarUDF, args) -> Any:
    """Evaluate a scalar UDF over DeviceColumns -> DeviceColumn."""
    arrays = [udf_input_array(c) for c in args]
    validity = None
    for c in args:
        if c.validity is not None:
            validity = c.validity if validity is None else (validity & c.validity)
    out = udf.fn(*arrays)
    return udf_output_column(out, validity, udf.return_type)


def segmented_monoid_reduce(spec, x, mask, is_start, ends):
    """Evaluate a monoid UDAF over sorted segments: map rows to states,
    substitute identity on masked rows, run ONE segment-resetting associative
    scan, read at group end positions, finalize. O(n log n) scan work shared
    with every built-in aggregate's machinery."""
    import jax
    import jax.numpy as jnp

    state = spec.state(x)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    id_leaves, id_def = jax.tree_util.tree_flatten(spec.identity)
    if len(id_leaves) != len(leaves):
        raise PlanError(
            f"UDAF {spec.name!r}: identity structure does not match state")
    z = [jnp.where(mask, l, jnp.asarray(i, l.dtype))
         for l, i in zip(leaves, id_leaves)]

    def comb(a, b):
        af, a_st = a[0], a[1:]
        bf, b_st = b[0], b[1:]
        merged = spec.combine(jax.tree_util.tree_unflatten(treedef, a_st),
                              jax.tree_util.tree_unflatten(treedef, b_st))
        m_leaves = jax.tree_util.tree_flatten(merged)[0]
        out = tuple(jnp.where(bf, bb, mm) for bb, mm in zip(b_st, m_leaves))
        return (af | bf,) + out

    res = jax.lax.associative_scan(comb, (is_start,) + tuple(z))
    group_state = jax.tree_util.tree_unflatten(
        treedef, [r[ends] for r in res[1:]])
    return spec.finalize(group_state)


def running_monoid_scan(spec, x, mask, seg_start, peer_end):
    """Window form: running segmented scan (partition-resetting), read at the
    current row's peer-run end (default RANGE UNBOUNDED..CURRENT ROW)."""
    import jax
    import jax.numpy as jnp

    state = spec.state(x)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    id_leaves, _ = jax.tree_util.tree_flatten(spec.identity)
    z = [jnp.where(mask, l, jnp.asarray(i, l.dtype))
         for l, i in zip(leaves, id_leaves)]

    def comb(a, b):
        af, a_st = a[0], a[1:]
        bf, b_st = b[0], b[1:]
        merged = spec.combine(jax.tree_util.tree_unflatten(treedef, a_st),
                              jax.tree_util.tree_unflatten(treedef, b_st))
        m_leaves = jax.tree_util.tree_flatten(merged)[0]
        out = tuple(jnp.where(bf, bb, mm) for bb, mm in zip(b_st, m_leaves))
        return (af | bf,) + out

    res = jax.lax.associative_scan(comb, (seg_start,) + tuple(z))
    idx = peer_end
    run_state = jax.tree_util.tree_unflatten(treedef, [r[idx] for r in res[1:]])
    return spec.finalize(run_state)
