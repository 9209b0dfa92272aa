"""Physical operators.

Capability analog of the reference's ExecutionPlan operator set
(datafusion/physical-plan/src/execution_plan.rs:99 and §2.2 of SURVEY.md),
re-designed for TPU execution: operators are whole-partition vectorized
transforms over capacity-padded DeviceRelations, each compiled once per input
shape by jax.jit (XLA fuses the expression work into the surrounding ops).
Data-dependent output sizes (join expansion, group counts) are handled with a
single host sync choosing a power-of-two output capacity, so recompiles are
logarithmic in data size.

Operators here:
  ScanExec, FilterExec, ProjectionExec, AggregateExec (grouped + global),
  SortExec (+fetch = TopK), LimitExec, JoinExec (all types, residual filters),
  DistinctExec, UnionExec, ValuesExec, EmptyExec, WindowExec (window.py).
"""
from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..common import types as T
from ..common.errors import ExecutionError, PlanError
from ..common.schema import Field, Schema
from ..data.column import Dictionary
from ..data.device import (DeviceColumn, DeviceRelation, bucket_capacity,
                           empty_relation, to_device)
from ..expr import nodes as E
from ..logical.plan import JoinType
from ..ops import groupby as G
from ..ops import joinimpl as J
from ..ops import kernels as K
from ..runtime.context import ExecContext
from .expr_compiler import eval_expr, eval_predicate, unify_string_columns


def _scatter_any(capacity: int, idx, flags):
    acc = jnp.zeros(capacity, jnp.int32).at[idx].max(flags.astype(jnp.int32), mode="drop")
    return acc > 0


def _dense_int_offset(c: DeviceColumn) -> Optional[int]:
    """Interval minimum of a bounds-proven integer group key (the rebase
    that makes it a dense code); None when the column is not a dense-int
    candidate (strings/bools/floats/unbounded)."""
    if c.dtype.is_string or c.dtype.kind is T.TypeKind.BOOL \
            or c.bounds is None:
        return None
    if not jnp.issubdtype(c.data.dtype, jnp.integer):
        return None
    try:
        return int(c.bounds[0])
    except Exception:
        return None


class PhysicalPlan:
    schema: Schema

    def children(self) -> Tuple["PhysicalPlan", ...]:
        return ()

    def execute(self, ctx: ExecContext) -> DeviceRelation:
        raise NotImplementedError

    def _timed(self, ctx: ExecContext, fn, *args):
        from ..runtime.tracing import TRACER

        ctx.check_cancelled()
        # string-cast dictionaries must be built host-side from concrete
        # data before the jitted fn traces (expr_compiler.string_cast_column)
        hosts = getattr(self, "_host_cast_nodes", None)
        if hosts is None:
            from .expr_compiler import collect_string_cast_nodes

            hosts = self._host_cast_nodes = collect_string_cast_nodes(self)
        if hosts:
            from .expr_compiler import prepare_string_casts

            prepare_string_casts(hosts, args)
        t0 = time.perf_counter()
        with TRACER.span(self._line()):
            out = fn(*args)
        name = type(self).__name__
        ctx.metric(name).record(0, time.perf_counter() - t0)
        if isinstance(out, DeviceRelation):
            from ..runtime.memory import relation_bytes

            new = relation_bytes(out)
            prev = getattr(self, "_reserved_bytes", 0)
            if new > prev:
                ctx.memory_pool.try_grow(name, new - prev)
            else:
                ctx.memory_pool.shrink(name, prev - new)
            self._reserved_bytes = new
        return out

    def display(self, indent: int = 0) -> str:
        pad = "  " * indent
        return "\n".join([pad + self._line()] + [c.display(indent + 1) for c in self.children()])

    def _line(self) -> str:
        return type(self).__name__


class ScanExec(PhysicalPlan):
    def __init__(self, provider, schema: Schema, projection: Optional[List[str]],
                 alias: str, filters: Tuple[E.Expr, ...] = ()):
        self.provider = provider
        self.schema = schema
        self.projection = projection
        self.alias = alias
        self.filters = tuple(filters)  # pushed-down pruning hints (inexact)

    def execute(self, ctx: ExecContext) -> DeviceRelation:
        filters = self.filters + self._topk_filters()
        rel = self.provider.scan_device(ctx, filters=filters,
                                        projection=self.projection)
        # select/rename columns to match the (qualified, possibly projected) schema
        cols = []
        src = {f.name: c for f, c in zip(rel.schema.fields, rel.columns)}
        for f in self.schema.fields:
            cols.append(src[f.name])
        return DeviceRelation(self.schema, tuple(cols), rel.sel)

    def _topk_filters(self) -> tuple:
        """Dynamic-filter pushdown for the resident path: when a TopK sits
        directly above this scan (planner attaches `_topk_hint`), the k-th
        key value -- computed once from the key column alone -- becomes a
        range predicate that prunes row groups and pages before the full
        read (reference: TopK -> DynamicFilterPhysicalExpr -> scan,
        physical-plan/src/topk/mod.rs:113 + sorts/sort.rs:930). Inclusive
        bounds keep every tie, so pruning stays exact-safe; the chunked
        executor has the streaming equivalent (chunked.py)."""
        hint = getattr(self, "_topk_hint", None)
        if hint is None or self.filters:
            return ()
        cached = getattr(self, "_topk_cache", None)
        if cached is not None:
            return cached
        col, k, desc = hint
        out = ()
        ds = getattr(self.provider, "_ds", None)
        try:
            if ds is not None:
                st = ds.column_stats().get(col)
                # NULL keys may sort into the top k: bail unless null-free
                if st is not None and st.null_count == 0:
                    import numpy as np

                    arr = ds.read((), columns=[col]).column(col).to_numpy()
                    if arr.dtype.kind in "if" and len(arr) > k:
                        if desc:
                            t = arr[np.argpartition(arr, len(arr) - k)[len(arr) - k]]
                            op = E.Op.GE
                        else:
                            t = arr[np.argpartition(arr, k - 1)[k - 1]]
                            op = E.Op.LE
                        v = float(t) if arr.dtype.kind == "f" else int(t)
                        out = (E.BinaryOp(op, E.Column(col), E.lit(v)),)
        except Exception:  # noqa: BLE001 -- pruning is best-effort
            out = ()
        self._topk_cache = out
        return out

    def _line(self):
        f = f" pushdown={len(self.filters)}" if self.filters else ""
        h = " topk" if getattr(self, "_topk_hint", None) else ""
        return f"ScanExec: {self.alias}{f}{h}"


class FilterExec(PhysicalPlan):
    def __init__(self, input: PhysicalPlan, predicate: E.Expr):
        self.input = input
        self.predicate = predicate
        self.schema = input.schema
        self._fn = jax.jit(self._transform)

    def children(self):
        return (self.input,)

    def _transform(self, rel: DeviceRelation) -> DeviceRelation:
        mask = eval_predicate(self.predicate, rel)
        return rel.with_sel(rel.sel & mask)

    def execute(self, ctx: ExecContext) -> DeviceRelation:
        rel = self.input.execute(ctx)
        return self._timed(ctx, self._fn, rel)

    def _line(self):
        return f"FilterExec: {self.predicate.name()}"


class ProjectionExec(PhysicalPlan):
    def __init__(self, input: PhysicalPlan, exprs: Sequence[E.Expr], schema: Schema):
        self.input = input
        self.exprs = tuple(exprs)
        self.schema = schema
        self._fn = jax.jit(self._transform)

    def children(self):
        return (self.input,)

    def _transform(self, rel: DeviceRelation) -> DeviceRelation:
        cols = [eval_expr(e, rel) for e in self.exprs]
        return DeviceRelation(self.schema, tuple(cols), rel.sel)

    def execute(self, ctx: ExecContext) -> DeviceRelation:
        rel = self.input.execute(ctx)
        return self._timed(ctx, self._fn, rel)

    def _line(self):
        return f"ProjectionExec: {[e.name() for e in self.exprs]}"


class LimitExec(PhysicalPlan):
    def __init__(self, input: PhysicalPlan, skip: int = 0, fetch: Optional[int] = None):
        self.input = input
        self.skip = skip
        self.fetch = fetch
        self.schema = input.schema
        self._fn = jax.jit(self._transform)

    def children(self):
        return (self.input,)

    def _transform(self, rel: DeviceRelation) -> DeviceRelation:
        rank = jnp.cumsum(rel.sel.astype(jnp.int64))
        keep = rel.sel & (rank > self.skip)
        if self.fetch is not None:
            keep = keep & (rank <= self.skip + self.fetch)
        return rel.with_sel(keep)

    def execute(self, ctx: ExecContext) -> DeviceRelation:
        return self._timed(ctx, self._fn, self.input.execute(ctx))

    def _line(self):
        return f"LimitExec: skip={self.skip} fetch={self.fetch}"


class SortExec(PhysicalPlan):
    """Full multi-key sort; with fetch this is the TopK operator
    (reference: SortExec + topk/mod.rs fast path).

    presorted=True marks a sort whose single-device input already emits the
    requested order (physical/ordering.py, the EnforceSorting elision
    analog): the local transform degenerates to identity / a rank-mask
    limit, while the distributed and chunked executors -- whose inputs
    arrive shard-major / chunk-major and are NOT globally ordered -- keep
    using the full sort via _transform_full."""

    def __init__(self, input: PhysicalPlan, specs: Sequence[E.SortSpec],
                 fetch: Optional[int] = None, presorted: bool = False):
        self.input = input
        self.specs = tuple(specs)
        self.fetch = fetch
        self.presorted = presorted
        self.schema = input.schema
        self._fn = jax.jit(self._transform)
        self._full_fn = jax.jit(self._transform_full)

    def children(self):
        return (self.input,)

    def _transform(self, rel: DeviceRelation) -> DeviceRelation:
        if self.presorted:
            if self.fetch is None:
                return rel
            rank = jnp.cumsum(rel.sel.astype(jnp.int64))
            return rel.with_sel(rel.sel & (rank <= self.fetch))
        return self._transform_full(rel)

    def _transform_full(self, rel: DeviceRelation) -> DeviceRelation:
        keys = []
        for s in self.specs:
            c = eval_expr(s.expr, rel)
            keys.append((c.data, c.validity, not s.asc, s.nulls_first,
                         c.sort_bounds()))
        # pack every array leaf of every column (data/validity/lengths/
        # elem_valid -- list columns included) and gather by the permutation
        payload, treedef = jax.tree_util.tree_flatten(rel.columns)
        sorted_payload, ssel = K.sort_rows(keys, payload, rel.sel)
        cols = jax.tree_util.tree_unflatten(treedef, sorted_payload)
        if self.fetch is not None:
            iota = jnp.arange(rel.capacity, dtype=jnp.int64)
            ssel = ssel & (iota < self.fetch)
        return DeviceRelation(self.schema, tuple(cols), ssel)

    def execute(self, ctx: ExecContext) -> DeviceRelation:
        return self._timed(ctx, self._fn, self.input.execute(ctx))

    def _line(self):
        keys = ", ".join(f"{s.expr.name()} {'ASC' if s.asc else 'DESC'}" for s in self.specs)
        pre = " (presorted)" if self.presorted else ""
        return f"SortExec: [{keys}] fetch={self.fetch}{pre}"


class CompactExec(PhysicalPlan):
    """Gather live rows to the front and truncate to a discovered power-of-two
    capacity (capability analog of CoalesceBatchesExec,
    physical-plan/src/coalesce_batches.rs -- the selection-mask model's
    equivalent of re-densifying filtered batches).

    One stable int32 sort of the selection mask buys every downstream
    sort-based operator (join, grouped aggregate, sort, window, distinct) an
    input proportional to the LIVE row count instead of the scan capacity --
    e.g. a 3-month date filter over lineitem leaves ~3% live rows, so the
    aggregation behind it runs 32x smaller.  Discovery disables the node
    (identity) when the input is already >1/4 live or small."""

    def __init__(self, input: PhysicalPlan):
        self.input = input
        self.schema = input.schema
        self._decision = None  # None | ("identity",) | ("compact", cap)

    def children(self):
        return (self.input,)

    def execute(self, ctx: ExecContext) -> DeviceRelation:
        rel = self.input.execute(ctx)
        live = int(jax.device_get(jnp.sum(rel.sel)))
        cap = bucket_capacity(max(live, 1))
        prev = self._decision
        if prev is not None and prev[0] == "compact":
            cap = max(cap, prev[1])
        if cap * 4 > rel.capacity or rel.capacity <= (1 << 15):
            self._decision = ("identity",)
            return rel
        self._decision = ("compact", cap)
        return self._timed(ctx, jax.jit(self._apply, static_argnums=1), rel, cap)

    def _apply(self, rel: DeviceRelation, cap: int) -> DeviceRelation:
        idx, total = K.compaction_indices(rel.sel, cap)
        # one packed row gather for every 1-D array in the relation
        arrays = []
        slots = []  # parallel to arrays: (col_index, attr)
        for ci, c in enumerate(rel.columns):
            arrays.append(c.data)
            slots.append((ci, "data"))
            if c.validity is not None:
                arrays.append(c.validity)
                slots.append((ci, "validity"))
            if c.lengths is not None:
                arrays.append(c.lengths)
                slots.append((ci, "lengths"))
            if c.elem_valid is not None:
                arrays.append(c.elem_valid)
                slots.append((ci, "elem_valid"))
        gathered = K.gather_rows(arrays, idx)
        parts = [{} for _ in rel.columns]
        for (ci, attr), g in zip(slots, gathered):
            parts[ci][attr] = g
        cols = []
        for c, p in zip(rel.columns, parts):
            cols.append(DeviceColumn(
                p["data"], p.get("validity"), c.dtype, c.dictionary,
                c.bounds, p.get("lengths"), p.get("elem_valid")))
        sel = jnp.arange(cap, dtype=jnp.int32) < jnp.minimum(total, cap)
        return DeviceRelation(self.schema, tuple(cols), sel)

    def _line(self):
        d = self._decision
        tag = "?" if d is None else (d[0] if d[0] == "identity" else f"cap={d[1]}")
        return f"CompactExec: {tag}"


class AggregateExec(PhysicalPlan):
    """Grouped / global aggregation (reference: AggregateExec,
    physical-plan/src/aggregates/mod.rs:828; sorted-grouping design notes in
    ops/groupby.py)."""

    def __init__(self, input: PhysicalPlan, group_exprs: Sequence[E.Expr],
                 agg_exprs: Sequence[E.Expr], schema: Schema):
        self.input = input
        self.group_exprs = tuple(group_exprs)
        self.agg_exprs = tuple(agg_exprs)  # Alias(AggregateFunction) | AggregateFunction
        self.schema = schema
        self._specs_cache = None
        self._sort_fn = jax.jit(self._phase_sort)
        self._reduce_fns: Dict = {}
        self._global_fns: Dict = {}

    def _has_array_agg(self) -> bool:
        return any(a.fname in ("array_agg", "string_agg")
                   for a in self._agg_fns())

    def children(self):
        return (self.input,)

    def _agg_fns(self) -> List[E.AggregateFunction]:
        out = []
        for e in self.agg_exprs:
            a = e.expr if isinstance(e, E.Alias) else e
            if not isinstance(a, E.AggregateFunction):
                raise PlanError(f"aggregate expr must be an aggregate function: {e!r}")
            out.append(a)
        return out

    def _prepare(self, rel: DeviceRelation):
        """Evaluate group keys, agg args, filters; build AggSpecs."""
        from ..expr.typing import infer

        group_cols = [eval_expr(g, rel) for g in self.group_exprs]
        aggs = self._agg_fns()
        arg_cols: List[DeviceColumn] = []
        filter_cols: List[jnp.ndarray] = []
        specs: List[G.AggSpec] = []
        arg_index: Dict = {}
        for a in aggs:
            fname = a.fname
            out_dtype, _ = infer(a, rel.schema)
            extra = None
            if fname == "count" and not a.distinct and (
                    len(a.args) == 0
                    or (isinstance(a.args[0], E.Literal)
                        and a.args[0].value is not None)):
                # count(<non-null literal>) == count(*); count(NULL) is 0 and
                # must go through the null-skipping argument path
                arg_i = None
                fname = "count_star"
                arg_dt = None
            else:
                two_arg = fname in ("corr", "covar", "covar_pop",
                                    "covar_samp") or fname.startswith("regr_")
                key = a.args[0]
                arg_i = arg_index.get(key)
                if arg_i is None or two_arg:
                    arg = eval_expr(a.args[0], rel)
                    arg_i = len(arg_cols)
                    arg_cols.append(arg)
                    if not two_arg:
                        arg_index[key] = arg_i
                else:
                    arg = arg_cols[arg_i]
                arg_dt = arg.dtype
                if two_arg and len(a.args) > 1:
                    arg_cols.append(eval_expr(a.args[1], rel))  # y at arg_i + 1
                if fname in ("percentile_cont", "approx_percentile_cont") and len(a.args) > 1:
                    if isinstance(a.args[1], E.Literal):
                        extra = float(a.args[1].value)
                if fname == "nth_value":
                    if len(a.args) < 2 or not isinstance(a.args[1], E.Literal):
                        raise PlanError("nth_value requires a literal n")
                    extra = float(a.args[1].value)
                if fname == "array_agg":
                    # static list width discovered by execute_rel
                    extra = getattr(self, "_last_width", None)
                if fname == "string_agg":
                    delim = ","
                    if len(a.args) > 1 and isinstance(a.args[1], E.Literal) \
                            and a.args[1].value is not None:
                        delim = str(a.args[1].value)
                    extra = (delim, getattr(self, "_last_width", None) or 0)
            filt_i = None
            if a.filter is not None:
                filt_i = len(filter_cols)
                filter_cols.append(eval_predicate(a.filter, rel))
            order_arg = None
            order_desc = False
            aorder = getattr(a, "order_by", ())
            if aorder:
                # agg(x ORDER BY y [DESC]): the order expression rides the
                # arg column list and keys this spec's sort bucket
                if len(aorder) > 1:
                    raise PlanError(
                        "aggregate ORDER BY supports a single sort key")
                if a.distinct:
                    # reference rule: DISTINCT requires order == argument
                    if aorder[0].expr != a.args[0] or not aorder[0].asc:
                        raise PlanError(
                            "DISTINCT aggregate ORDER BY must match the "
                            "argument (ascending)")
                elif fname not in ("array_agg", "string_agg", "first_value",
                                   "last_value", "any_value", "nth_value"):
                    # order-insensitive aggregates: ORDER BY is a no-op
                    pass
                else:
                    order_arg = len(arg_cols)
                    arg_cols.append(eval_expr(aorder[0].expr, rel))
                    order_desc = not aorder[0].asc
            specs.append(G.AggSpec(fname, arg_i, a.distinct, out_dtype,
                                   arg_dt, filt_i, extra, order_arg,
                                   order_desc,
                                   getattr(a, "ignore_nulls", False)))
        return group_cols, arg_cols, filter_cols, specs

    def _phase_sort(self, rel: DeviceRelation):
        """One sorted state per order-arg bucket (multiple DISTINCT arguments
        each sort by (keys, their arg); group segmentation is identical across
        buckets — see ops/groupby.order_arg_buckets)."""
        group_cols, arg_cols, filter_cols, specs = self._prepare(rel)
        return G.phase_sort_multi(group_cols, arg_cols, filter_cols, rel.sel, specs)

    def _global_dense_ok(self, rel: DeviceRelation) -> bool:
        """Route a no-GROUP-BY aggregate through the Pallas single-segment
        kernel only when some sum/avg argument factors into i32 columns
        (otherwise the plain global reduction is already optimal). Decided
        once per plan: bounds metadata is static."""
        cached = getattr(self, "_global_dense", None)
        if cached is not None:
            return cached
        from ..expr.udf import active_registry

        ok = not any(a.distinct or a.fname in G._ORDER_SENSITIVE
                     or a.fname in G.DENSE_UNSUPPORTED
                     or getattr(a, "order_by", ())
                     or active_registry().aggregate(a.fname) is not None
                     for a in self._agg_fns())
        if ok:
            try:
                # encode the (static) eligibility count in an output SHAPE:
                # eval_shape erases python-bool values but preserves shapes
                def probe(r):
                    k = sum(1 for afn in self._agg_fns()
                            if afn.fname in ("sum", "avg") and afn.args
                            and self._i32_factors(afn.args[0], r) is not None)
                    return jnp.zeros((k,))

                ok = jax.eval_shape(probe, rel).shape[0] > 0
            except Exception:  # noqa: BLE001 -- unevaluable arg: no fast path
                ok = False
        self._global_dense = ok
        return ok

    def _global(self, rel: DeviceRelation) -> DeviceRelation:
        _, arg_cols, filter_cols, specs = self._prepare(rel)
        outs, out_sel = G.global_aggregate(arg_cols, filter_cols, rel.sel, specs, 128)
        cols = [self._coerce_out(c, f) for c, f in zip(outs, self.schema.fields)]
        return DeviceRelation(self.schema, tuple(cols), out_sel)

    @staticmethod
    def _coerce_out(c: DeviceColumn, f: Field) -> DeviceColumn:
        data = c.data
        if c.dtype != f.dtype and data.dtype != f.dtype.np_dtype():
            data = data.astype(f.dtype.np_dtype())
        return DeviceColumn(data, c.validity, f.dtype, c.dictionary,
                            c.bounds, c.lengths, c.elem_valid, c.meta)

    # -- dense-key fast path ---------------------------------------------
    # When every group key is a dictionary-coded string / bool with a small
    # static domain, group ids are computed arithmetically: no sort, no
    # host sync, one fused kernel.  This is the TPU analog of the
    # reference's typed single-key group tables
    # (aggregates/group_values/single_group_by/), where key type knowledge
    # removes the general hash table.
    DENSE_LIMIT = 16384
    PALLAS_MAX_GROUPS = 256  # see _dense_transform: unrolled-kernel budget

    def _dense_sizes(self, rel: DeviceRelation):
        from ..expr.udf import active_registry

        if any(a.distinct or a.fname in G._ORDER_SENSITIVE
               or a.fname in G.DENSE_UNSUPPORTED
               or getattr(a, "order_by", ())
               or active_registry().aggregate(a.fname) is not None
               for a in self._agg_fns()):
            return None
        try:
            cols = jax.eval_shape(
                lambda r: tuple(eval_expr(g, r) for g in self.group_exprs), rel
            )
        except Exception:
            return None
        sizes = []
        for c in cols:
            if c.validity is not None:
                return None
            if c.dtype.is_string and c.dictionary is not None:
                sizes.append(max(c.dictionary.size, 1))
            elif c.dtype.kind is T.TypeKind.BOOL:
                sizes.append(2)
            elif _dense_int_offset(c) is not None:
                lo, hi = int(c.bounds[0]), int(c.bounds[1])
                if hi - lo + 1 <= 0:
                    return None
                sizes.append(hi - lo + 1)
            else:
                return None
        total = 1
        for s in sizes:
            total *= s
        if not sizes or total > self.DENSE_LIMIT:
            return None
        return sizes, total

    def _pallas_mode(self, rel: DeviceRelation):
        """'tpu' (compiled), 'interpret' (testing), or None.
        Must be called on a CONCRETE relation (outside jit): the choice is
        baked statically into the compiled function."""
        import os

        if rel.capacity % 2048 != 0:
            return None
        force = os.environ.get("DATAFUSION_TPU_FORCE_PALLAS")
        if force:
            return None if force in ("off", "none") else force
        try:
            import jax.core

            if not isinstance(rel.sel, jax.core.Tracer):
                plat = list(rel.sel.devices())[0].platform
            else:
                plat = jax.devices()[0].platform
        except Exception:
            plat = None
        return "tpu" if plat == "tpu" else None

    def _i32_factors(self, e_arg, rel):
        """Express an aggregate argument as a product of <=2 columns whose
        static bounds fit int32 (enables the Pallas exact-64-bit kernel).
        Returns (a, b_or_None) DeviceColumns or None."""
        c = eval_expr(e_arg, rel)
        if not (c.dtype.is_decimal or c.dtype.is_integer) or c.validity is not None:
            return None
        if c.fits_i32():
            return (c, None)
        ea = e_arg.expr if isinstance(e_arg, E.Alias) else e_arg
        if isinstance(ea, E.BinaryOp) and ea.op is E.Op.MUL:
            l = eval_expr(ea.left, rel)
            r = eval_expr(ea.right, rel)
            if (l.dtype.is_decimal or l.dtype.is_integer) and \
                    (r.dtype.is_decimal or r.dtype.is_integer):
                if l.fits_i32() and r.fits_i32():
                    return (l, r)
                lf = self._i32_factors(ea.left, rel)
                if lf is not None and lf[1] is None and r.fits_i32():
                    return (lf[0], r)
                rf = self._i32_factors(ea.right, rel)
                if rf is not None and rf[1] is None and l.fits_i32():
                    return (l, rf[0])
        return None

    @staticmethod
    def dense_seg(group_cols, sel, sizes, ngroups):
        """Arithmetic dense group ids from small-domain key codes (dictionary
        codes, bools, or bounds-proven small integer ranges rebased to their
        interval minimum); dead rows map to the out-of-range id `ngroups`.
        Returns (seg, strides)."""
        seg = jnp.zeros(sel.shape[0], dtype=jnp.int32)
        strides = []
        stride = 1
        for c, size in zip(reversed(group_cols), reversed(sizes)):
            strides.append(stride)
            code = c.data.astype(jnp.int32)
            off = _dense_int_offset(c)
            if off:
                code = code - jnp.int32(off)
            seg = seg + code * stride
            stride *= size
        strides = list(reversed(strides))
        return jnp.where(sel, seg, ngroups), strides

    @staticmethod
    def dense_keys(group_cols, sizes, strides, ngroups):
        """Decode group key columns from the dense group-id enumeration."""
        iota_g = jnp.arange(ngroups, dtype=jnp.int32)
        out_keys = []
        for c, size, st in zip(group_cols, sizes, strides):
            code = (iota_g // st) % size
            if c.dtype.kind is T.TypeKind.BOOL:
                data = code > 0
                b = None
            else:
                data = code.astype(c.data.dtype)
                off = _dense_int_offset(c)
                if off:
                    data = data + jnp.asarray(off, c.data.dtype)
                b = (int(off or 0), int(off or 0) + int(size) - 1)
            out_keys.append(DeviceColumn(data, None, c.dtype, c.dictionary,
                                         bounds=b))
        return out_keys

    def _dense_transform(self, rel: DeviceRelation, sizes, ngroups,
                         pallas_mode=None, global_one_row=False):
        group_cols = [eval_expr(g, rel) for g in self.group_exprs]
        _, arg_cols, filter_cols, specs = self._prepare(rel)
        seg, strides = self.dense_seg(group_cols, rel.sel, sizes, ngroups)
        iota_g = jnp.arange(ngroups, dtype=jnp.int32)

        # ---- Pallas fused exact product-sum path (ops/pallas_agg.py) -----
        agg_exprs = self._agg_fns()
        if pallas_mode is not None and rel.capacity % 2048 != 0:
            pallas_mode = None
        # the kernel unrolls a per-group loop: trace time AND per-block
        # compute scale with ngroups. Its win is few-groups/many-rows (Q1:
        # G=8, 189x over the XLA scatter lowering); at G~10k it matched
        # plain XLA while costing ~60s of TRACING per process (measured:
        # Q21 G=10000 pallas 490ms vs 488ms without)
        if pallas_mode is not None and ngroups > self.PALLAS_MAX_GROUPS:
            pallas_mode = None
        pallas_pairs = []
        pallas_slot = {}  # spec index -> pair slot ('sum'/'avg') 
        pallas_count_ok = False
        if pallas_mode is not None:
            for i, (spec, afn) in enumerate(zip(specs, agg_exprs)):
                if spec.filter is not None or spec.distinct:
                    continue
                if spec.fname in ("count", "count_star"):
                    if spec.arg is None or arg_cols[spec.arg].validity is None:
                        pallas_slot[i] = ("count", None)
                        pallas_count_ok = True
                    continue
                if spec.fname in ("sum", "avg") and afn.args:
                    fac = self._i32_factors(afn.args[0], rel)
                    if fac is not None:
                        pallas_slot[i] = (spec.fname, len(pallas_pairs))
                        pallas_pairs.append((fac[0].data, None if fac[1] is None else fac[1].data))

        psums = pcounts = None
        if pallas_pairs or pallas_count_ok:
            from ..ops import pallas_agg as PA

            psums, pcounts = PA.dense_groupby_sums(
                seg, rel.sel, pallas_pairs, ngroups,
                interpret=pallas_mode == "interpret",
            )

        if pcounts is not None:
            group_count = pcounts
        else:
            group_count = K.segment_count(seg, rel.sel, ngroups)
        # a global (no GROUP BY) aggregate emits its one row even over empty
        # input (count=0, sums NULL) -- SQL semantics, unlike grouped output
        out_sel = (jnp.ones(1, dtype=bool) if global_one_row
                   else group_count > 0)
        out_keys = self.dense_keys(group_cols, sizes, strides, ngroups)
        is_start = jnp.zeros(rel.capacity, dtype=bool)
        out_aggs = []
        for i, spec in enumerate(specs):
            slot = pallas_slot.get(i)
            if slot is not None:
                kind, j = slot
                if kind == "count":
                    out_aggs.append(DeviceColumn(pcounts.astype(jnp.int64), None, T.INT64))
                    continue
                ssum = psums[:, j]
                if kind == "sum":
                    out_aggs.append(DeviceColumn(ssum, (pcounts > 0) & out_sel, spec.out_dtype))
                    continue
                # avg: exact int64 sum / count in f64
                arg = arg_cols[spec.arg]
                cntf = jnp.maximum(pcounts, 1).astype(jnp.float64)
                if arg.dtype.is_decimal and spec.out_dtype.is_decimal:
                    num = ssum.astype(jnp.float64) * (
                        10.0 ** (spec.out_dtype.scale - arg.dtype.scale))
                    out_aggs.append(DeviceColumn(
                        jnp.trunc(num / cntf).astype(jnp.int64),
                        (pcounts > 0) & out_sel, spec.out_dtype))
                    continue
                scale = 10.0 ** arg.dtype.scale if arg.dtype.is_decimal else 1.0
                a = (ssum.astype(jnp.float64) / scale) / cntf
                out_aggs.append(DeviceColumn(a, (pcounts > 0) & out_sel, T.FLOAT64))
                continue
            out_aggs.append(
                G._reduce_one(spec, arg_cols, filter_cols, rel.sel, seg, is_start,
                              None, ngroups, group_count, out_sel))
        cols = [self._coerce_out(c, f)
                for c, f in zip(out_keys + out_aggs, self.schema.fields)]
        return DeviceRelation(self.schema, tuple(cols), out_sel)

    def execute(self, ctx: ExecContext) -> DeviceRelation:
        rel = self.input.execute(ctx)
        return self.execute_rel(ctx, rel)

    def execute_rel(self, ctx: ExecContext, rel: DeviceRelation) -> DeviceRelation:
        """Aggregate an already-computed input relation (shared by execute()
        and the chunked executor's materialized fallback)."""
        if not self.group_exprs:
            wkey = None
            if self._has_array_agg():
                live = int(jax.device_get(jnp.sum(rel.sel)))
                wkey = max(bucket_capacity(max(live, 1)),
                           getattr(self, "_last_width", 0))
                self._last_width = wkey
            # Pallas single-segment path: a global sum of a decimal product
            # otherwise pays many emulated-i64 HBM passes (TPC-H Q6/Q14: the
            # fused i32-factor kernel reads each factor once and accumulates
            # exact i64 in VMEM -- the ngroups=1 case of the Q1 kernel)
            if wkey is None and self._global_dense_ok(rel):
                mode = self._pallas_mode(rel)
                if mode is not None:
                    key = ("gdense", mode)
                    fn = self._reduce_fns.get(key)
                    if fn is None:
                        fn = self._reduce_fns[key] = jax.jit(
                            lambda r: self._dense_transform(
                                r, [], 1, mode, global_one_row=True))
                    return self._timed(ctx, fn, rel)
            fn = self._global_fns.get(wkey)
            if fn is None:
                fn = self._global_fns[wkey] = jax.jit(self._global)
            return self._timed(ctx, fn, rel)
        dense = self._dense_sizes(rel)
        if dense is not None:
            sizes, ngroups = dense
            mode = self._pallas_mode(rel)
            key = ("dense", tuple(sizes), mode)
            fn = self._reduce_fns.get(key)
            if fn is None:
                fn = self._reduce_fns[key] = jax.jit(
                    lambda r: self._dense_transform(r, sizes, ngroups, mode)
                )
            return self._timed(ctx, fn, rel)
        t0 = time.perf_counter()
        hosts = getattr(self, "_host_cast_nodes", None)
        if hosts is None:
            from .expr_compiler import collect_string_cast_nodes

            hosts = self._host_cast_nodes = collect_string_cast_nodes(self)
        if hosts:
            from .expr_compiler import prepare_string_casts

            prepare_string_casts(hosts, (rel,))
        sorted_states = self._sort_fn(rel)
        num_groups = int(sorted_states[0][-1])
        cap = bucket_capacity(max(num_groups, 1))
        cap = max(cap, getattr(self, "_last_cap", 0))
        self._last_cap = cap
        wkey = None
        if self._has_array_agg():
            ssel0, seg0 = sorted_states[0][3], sorted_states[0][4]
            maxc = int(jax.device_get(
                jnp.max(K.segment_count(seg0, ssel0, cap))))
            wkey = max(bucket_capacity(max(maxc, 1)),
                       getattr(self, "_last_width", 0))
            self._last_width = wkey
        cache_key = (cap, wkey)
        if cache_key not in self._reduce_fns:
            specs_fn = self  # closure

            def reduce_fn(states, rel_in, cap=cap):
                _, _, _, specs = specs_fn._prepare(rel_in)
                out_keys, out_aggs, out_sel = G.phase_reduce_multi(
                    states, specs, cap
                )
                cols = [
                    specs_fn._coerce_out(c, f)
                    for c, f in zip(list(out_keys) + list(out_aggs), specs_fn.schema.fields)
                ]
                return DeviceRelation(specs_fn.schema, tuple(cols), out_sel)

            self._reduce_fns[cache_key] = jax.jit(reduce_fn)
        out = self._reduce_fns[cache_key](sorted_states, rel)
        ctx.metric("AggregateExec").record(num_groups, time.perf_counter() - t0)
        return out

    def _line(self):
        return (f"AggregateExec: group=[{', '.join(e.name() for e in self.group_exprs)}] "
                f"aggs=[{', '.join(e.name() for e in self.agg_exprs)}]")


class JoinExec(PhysicalPlan):
    """Equi-join (+ residual filter) for all join types; see ops/joinimpl.py."""

    _RANGE_MIRROR = {"lt": "gt", "le": "ge", "gt": "lt", "ge": "le"}

    def __init__(self, left: PhysicalPlan, right: PhysicalPlan,
                 on: Sequence[Tuple[E.Expr, E.Expr]], join_type: JoinType,
                 filter: Optional[E.Expr], schema: Schema,
                 range_on: Optional[Tuple[E.Expr, E.Expr, str]] = None):
        self.left = left
        self.right = right
        self.on = tuple(on)
        self.join_type = join_type
        self.filter = filter
        self.schema = schema
        # single range predicate `left_expr OP right_expr` driving the
        # piecewise merge join path (ops/joinimpl.range_join_phase1)
        self.range_on = range_on
        self._phase1 = jax.jit(self._p1)
        self._phase2: Dict[int, Callable] = {}
        self._semi_fn = jax.jit(self._semi_simple)
        self._last_co: Dict = {}
        # direct-address join state: (swapped, jt, info) -> build side proved
        # duplicate-free at discovery (None = undecided)
        self._direct_ok: Dict = {}
        # bucketed-direct state: binfo -> discovered bucket width B
        self._bucket_B: Dict = {}

    # -- direct-address fast path -------------------------------------------
    DIRECT_DOMAIN_LIMIT = 1 << 26  # max table entries (64M x 4B = 256MB)
    BUCKET_PREFIX_LIMIT = 1 << 24  # bucketed variant: prefix-table slots
    MAX_BUCKET = 16                # widest bucket before falling back

    def _direct_info(self, swapped: bool, lrel, rrel):
        """(spans, domain) when the (normalized) join keys pack into a dense
        domain small enough for a direct-address table; None otherwise.
        Bounds/dictionaries are static metadata, so this evaluates
        abstractly (eval_shape). NOT memoized on orientation alone: the
        chunked/streaming executor reuses one JoinExec across relations with
        different bounds, so spans must be derived from the relations at
        hand (stale spans would clip out-of-domain probes onto boundary
        keys = false matches). Downstream jit caches key on the info value."""
        info = None
        on = self._exec_on
        if self.range_on is None and on:
            def keys_of(lr, rr):
                lkeys = [eval_expr(l, lr) for l, _ in on]
                rkeys = [eval_expr(r, rr) for _, r in on]
                for i in range(len(lkeys)):
                    if lkeys[i].dtype.is_string or rkeys[i].dtype.is_string:
                        lkeys[i], rkeys[i] = unify_string_columns(
                            lkeys[i], rkeys[i])
                return tuple(lkeys), tuple(rkeys)

            try:
                lk, rk = jax.eval_shape(keys_of, lrel, rrel)
                info = J.direct_domain(lk, rk, self.DIRECT_DOMAIN_LIMIT)
            except Exception:
                info = None
        return info

    def _bucket_info(self, swapped: bool, lrel, rrel):
        """(order, spans, nprefix, d1) for the bucketed direct-address join
        when the full dense domain is too large for one table but a key
        prefix's is not (ops/joinimpl.bucket_domain); None otherwise. Like
        _direct_info, recomputed per execution from the relations' bounds."""
        on = self._exec_on
        if self.range_on is not None or len(on) < 2:
            return None

        def keys_of(lr, rr):
            lkeys = [eval_expr(l, lr) for l, _ in on]
            rkeys = [eval_expr(r, rr) for _, r in on]
            for i in range(len(lkeys)):
                if lkeys[i].dtype.is_string or rkeys[i].dtype.is_string:
                    lkeys[i], rkeys[i] = unify_string_columns(
                        lkeys[i], rkeys[i])
            return tuple(lkeys), tuple(rkeys)

        try:
            lk, rk = jax.eval_shape(keys_of, lrel, rrel)
            return J.bucket_domain(lk, rk, self.BUCKET_PREFIX_LIMIT)
        except Exception:
            return None

    @staticmethod
    def _direct_table_lanes(rrel, domain: int, lcap: int,
                            extra: int = 0) -> bool:
        """True when folding the packed build payload into the direct table
        pays off: the fold saves ONE probe-capacity row gather, so the
        table (domain x lanes x 4B) must stay small relative to the probe
        (otherwise its per-execution memset/scatter -- and XLA's compile
        time on very wide scatters, observed 20min on a 6M x 21-lane
        table -- dwarf the saving). extra adds fixed lanes (the bucket
        variant stores the full key alongside)."""
        if rrel.capacity * 128 * 4 > (4 << 30):
            # the pre-scatter [build_cap, lanes] candidate matrix can get a
            # minor-dim-padded-to-128 tile layout (observed 42x -> 32 GB at
            # a 64M build on v5e-16G); huge builds use the 1-D lookup path
            return False
        lanes = 1 + extra
        for c in rrel.columns:
            if c.data.ndim == 1 and c.data.dtype.itemsize in (4, 8) \
                    and c.data.dtype != jnp.bool_:
                lanes += c.data.dtype.itemsize // 4
                lanes += 1 if c.validity is not None else 0
        return domain * lanes <= min(1 << 27, 8 * lcap)

    @staticmethod
    def _payload_lanes(rrel) -> int:
        """Packed int32 lanes (key + perm + payload) a folded build table
        carries per entry — the minor dimension of the probe gather."""
        lanes = 3
        for c in rrel.columns:
            if c.data.ndim == 1 and c.data.dtype.itemsize in (4, 8) \
                    and c.data.dtype != jnp.bool_:
                lanes += c.data.dtype.itemsize // 4
                lanes += 1 if c.validity is not None else 0
        return lanes

    _MINMAX_OPS = {E.Op.LT: "lt", E.Op.LE: "le", E.Op.GT: "gt",
                   E.Op.GE: "ge", E.Op.NEQ: "neq"}
    _MINMAX_MIRROR = {"lt": "gt", "le": "ge", "gt": "lt", "ge": "le",
                      "neq": "neq"}

    def _residual_minmax(self, lrel, rrel):
        """(probe_col_expr, build_col_expr, op) when the residual filter is
        ONE comparison between a probe-side and a build-side column --
        the pattern join_exists_minmax turns into per-key scatter-min/max
        (TPC-H Q21's l2.l_suppkey <> l1.l_suppkey); None otherwise."""
        f = self.filter
        if not isinstance(f, E.BinaryOp) or f.op not in self._MINMAX_OPS:
            return None

        def side(e):
            if not isinstance(e, E.Column):
                return None
            try:
                inl = lrel.schema.find(e.flat_name) is not None
            except Exception:
                inl = False
            try:
                inr = rrel.schema.find(e.flat_name) is not None
            except Exception:
                inr = False
            if inl == inr:
                return None
            return "l" if inl else "r"

        sl, sr = side(f.left), side(f.right)
        op = self._MINMAX_OPS[f.op]
        if sl == "l" and sr == "r":
            return f.left, f.right, op
        if sl == "r" and sr == "l":
            return f.right, f.left, self._MINMAX_MIRROR[op]
        return None

    def _direct_impl(self, lrel, rrel, jt, swapped, spans, domain,
                     bucket=None):
        """Direct-address inner/left join: table[key] -> build row (unique
        build side), probe by one gather; output capacity == probe capacity,
        no expansion phase. bucket=(order, nprefix, d1, B) switches to the
        bucketed variant for oversized composite domains (spans then arrive
        pre-permuted). Returns (relation, bad_flag)."""
        on = self._exec_on
        lkeys = [eval_expr(l, lrel) for l, _ in on]
        rkeys = [eval_expr(r, rrel) for _, r in on]
        for i in range(len(lkeys)):
            if lkeys[i].dtype.is_string or rkeys[i].dtype.is_string:
                lkeys[i], rkeys[i] = unify_string_columns(lkeys[i], rkeys[i])
        lcols = list(lrel.columns)
        # INNER output masks unmatched rows via sel: skip null-extension so
        # gathered build columns stay validity-free (each validity would be
        # one more operand in every downstream multi-key sort)
        nullx = jt is not JoinType.INNER
        if bucket is not None:
            order, nprefix, d1, B = bucket
            if (self._direct_table_lanes(rrel, d1 * B, lrel.capacity, extra=2)
                    and lrel.capacity * B * self._payload_lanes(rrel) * 8
                    <= (8 << 30)):
                rcols, matched, dup = J.join_bucket_gather(
                    [lkeys[i] for i in order], [rkeys[i] for i in order],
                    lrel.sel, rrel.sel, spans, nprefix, d1, B,
                    list(rrel.columns), null_unmatched=nullx)
            else:
                brow, matched, dup = J.join_bucket_lookup(
                    [lkeys[i] for i in order], [rkeys[i] for i in order],
                    lrel.sel, rrel.sel, spans, nprefix, d1, B)
                rcols = J.gather_columns(
                    list(rrel.columns), brow, matched,
                    null_extend=~matched if nullx else None)
        elif self._direct_table_lanes(rrel, domain, lrel.capacity):
            # payload folded into the table: one row gather total
            rcols, matched, dup = J.join_direct_gather(
                lkeys, rkeys, lrel.sel, rrel.sel, spans, domain,
                list(rrel.columns), null_unmatched=nullx)
        else:
            brow, matched, dup = J.join_direct_lookup(
                lkeys, rkeys, lrel.sel, rrel.sel, spans, domain)
            rcols = J.gather_columns(
                list(rrel.columns), brow, matched,
                null_extend=~matched if nullx else None)
        block = DeviceRelation(
            self._block_schema(lrel, rrel, swapped),
            tuple(rcols + lcols) if swapped else tuple(lcols + rcols),
            matched)
        final = matched
        if self.filter is not None:
            final = final & eval_predicate(self.filter, block)
        if jt is JoinType.INNER:
            out = DeviceRelation(self.schema, block.columns, final)
            return out, dup
        # LEFT: every live probe row survives; match (or residual) failure
        # null-extends the build columns
        dead_b = ~final
        rcols2 = []
        for c in rcols:
            v = c.validity if c.validity is not None \
                else jnp.ones(lrel.capacity, jnp.bool_)
            rcols2.append(DeviceColumn(
                jnp.where((dead_b[:, None] if c.data.ndim == 2 else dead_b),
                          jnp.zeros_like(c.data), c.data),
                v & ~dead_b, c.dtype, c.dictionary, None, c.lengths,
                c.elem_valid))
        cols = tuple(rcols2 + lcols) if swapped else tuple(lcols + rcols2)
        return DeviceRelation(self.schema, cols, lrel.sel), dup

    def children(self):
        return (self.left, self.right)

    # -- phase 1: counts ---------------------------------------------------
    def _keys(self, lrel, rrel):
        lkeys = [eval_expr(l, lrel) for l, _ in self.on]
        rkeys = [eval_expr(r, rrel) for _, r in self.on]
        # unify string key dictionaries pairwise
        for i in range(len(lkeys)):
            if lkeys[i].dtype.is_string or rkeys[i].dtype.is_string:
                lkeys[i], rkeys[i] = unify_string_columns(lkeys[i], rkeys[i])
        return lkeys, rkeys

    def _p1(self, lrel: DeviceRelation, rrel: DeviceRelation):
        if self.range_on is not None:
            le, re_, op = self.range_on
            return J.range_join_phase1(eval_expr(le, lrel), eval_expr(re_, rrel),
                                       op, lrel.sel, rrel.sel)
        lkeys, rkeys = self._keys(lrel, rrel)
        return J.join_phase1(lkeys, rkeys, lrel.sel, rrel.sel)

    def _semi_simple(self, lrel: DeviceRelation, rrel: DeviceRelation):
        """Semi/anti join without residual filter: no expansion needed."""
        perm, lo, cnt, total = self._p1(lrel, rrel)
        if self.join_type in (JoinType.LEFT_SEMI, JoinType.RIGHT_SEMI):
            keep = cnt > 0
        else:
            keep = cnt == 0
        return lrel.with_sel(lrel.sel & keep)

    def execute(self, ctx: ExecContext) -> DeviceRelation:
        jt = self.join_type
        swapped = jt in (JoinType.RIGHT, JoinType.RIGHT_SEMI, JoinType.RIGHT_ANTI)
        lplan, rplan = (self.right, self.left) if swapped else (self.left, self.right)
        lrel = lplan.execute(ctx)
        rrel = rplan.execute(ctx)
        return self.execute_rels(ctx, lrel, rrel)

    def execute_rels(self, ctx: ExecContext, lrel: DeviceRelation,
                     rrel: DeviceRelation,
                     allow_direct: bool = True) -> DeviceRelation:
        """Run the join over already-normalized (probe, build) relations
        (probe = left side after RIGHT-flavor mirroring). Shared by execute()
        and the chunked out-of-core executor, which streams probe chunks.
        allow_direct=False disables the direct-address fast path: chunk
        relations carry per-chunk bounds, so its domain-specialized programs
        would recompile every chunk."""
        self._allow_direct = allow_direct
        # (probe, build) capacities, read by the distributed engine's
        # CollectLeft-vs-Partitioned decision (parallel/engine._join_mode)
        self._last_input_caps = (lrel.capacity, rrel.capacity)
        t0 = time.perf_counter()
        jt = self.join_type
        swapped = jt in (JoinType.RIGHT, JoinType.RIGHT_SEMI, JoinType.RIGHT_ANTI)
        if swapped:
            # re-express as the mirrored left-flavored join
            jt = {JoinType.RIGHT: JoinType.LEFT, JoinType.RIGHT_SEMI: JoinType.LEFT_SEMI,
                  JoinType.RIGHT_ANTI: JoinType.LEFT_ANTI}[jt]
        self._exec_on = tuple((r, l) for l, r in self.on) if swapped else self.on
        self._exec_range = self.range_on
        if swapped and self.range_on is not None:
            le, re_, op = self.range_on
            self._exec_range = (re_, le, self._RANGE_MIRROR[op])

        semi = jt in (JoinType.LEFT_SEMI, JoinType.LEFT_ANTI)
        if semi and self.filter is not None and self._exec_range is None \
                and getattr(self, "_allow_direct", True) \
                and self._residual_minmax(lrel, rrel) is not None \
                and self._direct_info(swapped, lrel, rrel) is not None:
            out = self._run_semi(lrel, rrel, swapped)
        elif semi and self.filter is None:
            out = self._run_semi(lrel, rrel, swapped)
        else:
            out = self._run_expand(ctx, lrel, rrel, jt, swapped)
        ctx.metric("JoinExec").record(0, time.perf_counter() - t0)
        return out

    def _run_semi(self, lrel, rrel, swapped):
        info = None
        if self._exec_range is None and getattr(self, "_allow_direct", True):
            info = self._direct_info(swapped, lrel, rrel)
        if self.filter is not None:
            # residual minmax form (caller checked the pattern + info)
            mm = self._residual_minmax(lrel, rrel)
            pe, be, opk = mm
            spans, domain = info
            key = ("semi_mm", swapped, info, pe, be, opk)
            fn = self._phase2.get(key)
            if fn is None:
                on = self._exec_on
                anti = self.join_type in (JoinType.LEFT_ANTI,
                                          JoinType.RIGHT_ANTI)

                def f_mm(lr, rr):
                    lkeys = [eval_expr(l, lr) for l, _ in on]
                    rkeys = [eval_expr(r, rr) for _, r in on]
                    for i in range(len(lkeys)):
                        if lkeys[i].dtype.is_string or rkeys[i].dtype.is_string:
                            lkeys[i], rkeys[i] = unify_string_columns(
                                lkeys[i], rkeys[i])
                    ex = J.join_exists_minmax(
                        lkeys, rkeys, lr.sel, rr.sel, spans, domain,
                        eval_expr(pe, lr), eval_expr(be, rr), opk)
                    keep = ~ex if anti else ex
                    return DeviceRelation(self.schema, lr.columns,
                                          lr.sel & keep)

                fn = self._phase2[key] = jax.jit(f_mm)
            return fn(lrel, rrel)
        key = ("semi", swapped, info)
        fn = self._phase2.get(key)
        if fn is None and info is not None:
            # existence bitmap over the dense key domain: correct for any
            # build multiplicity, no sorts
            on = self._exec_on
            spans, domain = info
            anti = self.join_type in (JoinType.LEFT_ANTI, JoinType.RIGHT_ANTI)

            def f_direct(lr, rr):
                lkeys = [eval_expr(l, lr) for l, _ in on]
                rkeys = [eval_expr(r, rr) for _, r in on]
                for i in range(len(lkeys)):
                    if lkeys[i].dtype.is_string or rkeys[i].dtype.is_string:
                        lkeys[i], rkeys[i] = unify_string_columns(lkeys[i], rkeys[i])
                ex = J.join_direct_exists(lkeys, rkeys, lr.sel, rr.sel,
                                          spans, domain)
                keep = ~ex if anti else ex
                return DeviceRelation(self.schema, lr.columns, lr.sel & keep)

            fn = self._phase2[key] = jax.jit(f_direct)
        if fn is None:
            on = self._exec_on
            range_on = self._exec_range

            def f(lr, rr):
                if range_on is not None:
                    le, re_, op = range_on
                    perm, lo, cnt, total = J.range_join_phase1(
                        eval_expr(le, lr), eval_expr(re_, rr), op,
                        lr.sel, rr.sel)
                else:
                    lkeys = [eval_expr(l, lr) for l, _ in on]
                    rkeys = [eval_expr(r, rr) for _, r in on]
                    for i in range(len(lkeys)):
                        if lkeys[i].dtype.is_string or rkeys[i].dtype.is_string:
                            lkeys[i], rkeys[i] = unify_string_columns(lkeys[i], rkeys[i])
                    perm, lo, cnt, total = J.join_phase1(lkeys, rkeys, lr.sel, rr.sel)
                keep = (cnt > 0) if self.join_type in (JoinType.LEFT_SEMI, JoinType.RIGHT_SEMI) else (cnt == 0)
                return DeviceRelation(self.schema, lr.columns, lr.sel & keep)

            fn = self._phase2[key] = jax.jit(f)
        return fn(lrel, rrel)

    def _run_expand(self, ctx, lrel, rrel, jt, swapped):
        if jt in (JoinType.INNER, JoinType.LEFT) and self._exec_range is None \
                and getattr(self, "_allow_direct", True):
            info = self._direct_info(swapped, lrel, rrel)
            if info is not None \
                    and self._direct_ok.get((swapped, jt, info)) is not False:
                spans, domain = info
                dkey = ("direct", swapped, jt, info)
                fn = self._phase2.get(dkey)
                if fn is None:
                    fn = self._phase2[dkey] = jax.jit(
                        lambda lr, rr: self._direct_impl(lr, rr, jt, swapped,
                                                         spans, domain))
                out, dup = fn(lrel, rrel)
                ok = not bool(dup)  # host sync (per-op path syncs anyway)
                self._direct_ok[(swapped, jt, info)] = ok
                if ok:
                    return out
            elif info is None:
                out = self._run_bucket(lrel, rrel, jt, swapped)
                if out is not None:
                    return out
        on = self._exec_on
        p1key = ("p1", swapped)
        p1 = self._phase2.get(p1key)
        if p1 is None:
            range_on = self._exec_range

            def f1(lr, rr):
                if range_on is not None:
                    le, re_, op = range_on
                    return J.range_join_phase1(
                        eval_expr(le, lr), eval_expr(re_, rr), op,
                        lr.sel, rr.sel)
                lkeys = [eval_expr(l, lr) for l, _ in on]
                rkeys = [eval_expr(r, rr) for _, r in on]
                for i in range(len(lkeys)):
                    if lkeys[i].dtype.is_string or rkeys[i].dtype.is_string:
                        lkeys[i], rkeys[i] = unify_string_columns(lkeys[i], rkeys[i])
                return J.join_phase1(lkeys, rkeys, lr.sel, rr.sel)

            p1 = self._phase2[p1key] = jax.jit(f1)
        perm, lo, cnt, total = p1(lrel, rrel)
        co = bucket_capacity(max(int(total), 1))
        co = max(co, self._last_co.get(("co", swapped, jt), 0))
        self._last_co[("co", swapped, jt)] = co
        key = ("p2", swapped, jt, co)
        fn = self._phase2.get(key)
        if fn is None:
            fn = self._phase2[key] = jax.jit(
                lambda lr, rr, pm, l, c: self._expand_impl(lr, rr, pm, l, c, jt, swapped, co)
            )
        return fn(lrel, rrel, perm, lo, cnt)

    def _run_bucket(self, lrel, rrel, jt, swapped):
        """Bucketed direct-address attempt (discovery side): probe the max
        bucket population once, bake B, run; None = not applicable or the
        build side violated the assumptions (caller falls back)."""
        binfo = self._bucket_info(swapped, lrel, rrel)
        if binfo is None:
            return None
        okkey = (swapped, jt, "bucket", binfo)
        if self._direct_ok.get(okkey) is False:
            return None
        order, spans, nprefix, d1 = binfo
        B = self._bucket_B.get(binfo)
        if B is None:
            on = self._exec_on

            def stats(rr):
                # string keys: raw (un-unified) codes are fine here -- dict
                # merging is injective, so bucket populations are invariant
                # under the relabeling and raw codes stay within the spans
                rkeys = [eval_expr(r, rr) for _, r in on]
                return J.bucket_max_count([rkeys[i] for i in order],
                                          rr.sel, spans, nprefix, d1)

            skey = ("bstats", swapped, binfo)
            sfn = self._phase2.get(skey)
            if sfn is None:
                sfn = self._phase2[skey] = jax.jit(stats)
            maxb = int(sfn(rrel))
            B = 1
            while B < maxb:
                B *= 2
            self._bucket_B[binfo] = B
        if B > self.MAX_BUCKET or d1 * B > self.DIRECT_DOMAIN_LIMIT:
            self._direct_ok[okkey] = False
            return None
        # HBM guardrails (observed at TPC-H SF10 on v5e-16G): the scatter-
        # built candidate matrix [build_cap, 3] can get a {minor-dim
        # padded-to-128} layout (42x expansion -> 32 GB at a 64M build), and
        # the folded-payload probe gather materializes [probe_cap, B*lanes]
        # plus per-bucket slice copies. Oversized configurations fall back
        # to the sort-merge join, which streams payload through one matched-
        # rows gather.
        build_cap = rrel.capacity
        if build_cap * 128 * 4 > (4 << 30):
            self._direct_ok[okkey] = False
            return None
        dkey = ("bucket", swapped, jt, binfo, B)
        fn = self._phase2.get(dkey)
        if fn is None:
            fn = self._phase2[dkey] = jax.jit(
                lambda lr, rr: self._direct_impl(
                    lr, rr, jt, swapped, spans, 0,
                    bucket=(order, nprefix, d1, B)))
        out, bad = fn(lrel, rrel)
        ok = not bool(bad)
        self._direct_ok[okkey] = ok
        return out if ok else None

    def _expand_impl(self, lrel, rrel, perm, lo, cnt, jt, swapped, co):
        probe_row, build_row, out_valid = K.join_expand(perm, lo, cnt, co)
        lcols = J.gather_columns(list(lrel.columns), probe_row, out_valid)
        rcols = J.gather_columns(list(rrel.columns), build_row, out_valid)
        matched_schema = self._block_schema(lrel, rrel, swapped)
        block = DeviceRelation(
            matched_schema,
            tuple(rcols + lcols) if swapped else tuple(lcols + rcols),
            out_valid,
        )
        sel_matched = out_valid
        if self.filter is not None:
            sel_matched = sel_matched & eval_predicate(self.filter, block)
        block = block.with_sel(sel_matched)

        if jt in (JoinType.LEFT_SEMI, JoinType.LEFT_ANTI):
            # filtered semi/anti: any passing match per probe row
            any_pass = _scatter_any(lrel.capacity, probe_row, sel_matched)
            keep = any_pass if jt is JoinType.LEFT_SEMI else (lrel.sel & ~any_pass)
            return DeviceRelation(self.schema, lrel.columns, lrel.sel & keep)

        blocks = [block]
        if jt in (JoinType.LEFT, JoinType.FULL):
            any_pass = _scatter_any(lrel.capacity, probe_row, sel_matched)
            unmatched = lrel.sel & ~any_pass
            null_r = jnp.ones(lrel.capacity, dtype=jnp.bool_)
            lcols2 = list(lrel.columns)
            rcols2 = J.gather_columns(
                list(rrel.columns), jnp.zeros(lrel.capacity, jnp.int32), unmatched, null_extend=null_r
            )
            blocks.append(DeviceRelation(
                self._block_schema(lrel, rrel, swapped),
                tuple(rcols2 + lcols2) if swapped else tuple(lcols2 + rcols2),
                unmatched,
            ))
        if jt is JoinType.FULL:
            matched_b = _scatter_any(rrel.capacity, build_row, sel_matched)
            unmatched_b = rrel.sel & ~matched_b
            null_l = jnp.ones(rrel.capacity, dtype=jnp.bool_)
            rcols3 = list(rrel.columns)
            lcols3 = J.gather_columns(
                list(lrel.columns), jnp.zeros(rrel.capacity, jnp.int32), unmatched_b, null_extend=null_l
            )
            blocks.append(DeviceRelation(
                self._block_schema(lrel, rrel, swapped),
                tuple(rcols3 + lcols3) if swapped else tuple(lcols3 + rcols3),
                unmatched_b,
            ))
        out = concat_relations(blocks, self.schema)
        return out

    def _block_schema(self, lrel, rrel, swapped):
        """Schema of an expansion block: always the full (original-left,
        original-right) column set -- wider than self.schema for semi/anti
        joins whose output is one side only, so residual filters can see both
        sides."""
        lsch, rsch = (rrel.schema, lrel.schema) if swapped else (lrel.schema, rrel.schema)
        return lsch.join(rsch)

    def _line(self):
        on = ", ".join(f"{l.name()}={r.name()}" for l, r in self.on)
        if self.range_on is not None:
            le, re_, op = self.range_on
            sym = {"lt": "<", "le": "<=", "gt": ">", "ge": ">="}[op]
            return (f"JoinExec: {self.join_type.value} "
                    f"range=[{le.name()} {sym} {re_.name()}] (piecewise merge)")
        return f"JoinExec: {self.join_type.value} on=[{on}]"


def concat_relations(rels: List[DeviceRelation], schema: Schema) -> DeviceRelation:
    """Concatenate relations (used by outer joins and UNION). String columns
    are re-encoded onto a merged dictionary when they differ."""
    ncols = len(schema)
    out_cols = []
    for i in range(ncols):
        cols = [r.columns[i] for r in rels]
        f = schema.fields[i]
        if f.dtype.is_string:
            from .expr_compiler import unify_many_string_columns

            cols = unify_many_string_columns(cols)
        if f.dtype.is_list:
            w = max(c.width for c in cols)

            def widen(c):
                if c.width == w:
                    return c.data, c.slot_valid()
                pad = [(0, 0), (0, w - c.width)]
                return jnp.pad(c.data, pad), jnp.pad(c.slot_valid(), pad)

            pieces = [widen(c) for c in cols]
            data = jnp.concatenate([d for d, _ in pieces])
            ev = jnp.concatenate([v for _, v in pieces])
            lengths = jnp.concatenate([c.list_lengths() for c in cols])
            any_valid = any(c.validity is not None for c in cols)
            validity = (jnp.concatenate([c.valid() for c in cols])
                        if any_valid else None)
            out_cols.append(DeviceColumn(data, validity, f.dtype,
                                         cols[0].dictionary, None, lengths, ev))
            continue
        data = jnp.concatenate([c.data for c in cols])
        any_valid = any(c.validity is not None for c in cols)
        validity = None
        if any_valid:
            validity = jnp.concatenate([c.valid() for c in cols])
        dictionary = cols[0].dictionary
        out_cols.append(DeviceColumn(data.astype(f.dtype.np_dtype()) if data.dtype != f.dtype.np_dtype() else data,
                                     validity, f.dtype, dictionary))
    sel = jnp.concatenate([r.sel for r in rels])
    return DeviceRelation(schema, tuple(out_cols), sel)


class UnionExec(PhysicalPlan):
    def __init__(self, inputs: Sequence[PhysicalPlan], schema: Schema):
        self.inputs = list(inputs)
        self.schema = schema
        self._fn = jax.jit(lambda rels: concat_relations(list(rels), self.schema))

    def children(self):
        return tuple(self.inputs)

    def execute(self, ctx: ExecContext) -> DeviceRelation:
        rels = [p.execute(ctx) for p in self.inputs]
        return self._timed(ctx, self._fn, tuple(rels))


class UnnestExec(PhysicalPlan):
    """Explode list expressions to rows (reference: UnnestExec,
    physical-plan/src/unnest.rs:65). TPU-native: the output capacity is the
    STATIC product capacity x max-width; each input row owns a width-sized
    slot range, live slots are masked by the per-row list lengths, so the
    explode is one reshape + repeats -- no dynamic shapes."""

    def __init__(self, input: PhysicalPlan, unnest_exprs: Sequence[E.Expr],
                 schema: Schema):
        self.input = input
        self.unnest_exprs = tuple(unnest_exprs)
        self.schema = schema
        self._fn = jax.jit(self._transform)

    def children(self):
        return (self.input,)

    def _transform(self, rel: DeviceRelation) -> DeviceRelation:
        cols = [eval_expr(e, rel) for e in self.unnest_exprs]
        w = max(max(c.width for c in cols), 1)
        cap = rel.capacity
        out_cap = cap * w

        def widen(c):
            if c.width == w:
                return c
            pad = [(0, 0), (0, w - c.width)]
            return DeviceColumn(jnp.pad(c.data, pad), c.validity, c.dtype,
                                c.dictionary, None, c.list_lengths(),
                                jnp.pad(c.slot_valid(), pad))

        cols = [widen(c) for c in cols]
        # zip semantics: each row expands to max(list lengths) slots; a NULL
        # list contributes length 0 (rows where ALL lists are empty/NULL
        # vanish, matching the reference's unnest)
        def eff_len(c):
            return jnp.where(c.valid(), c.list_lengths(), 0)

        maxlen = eff_len(cols[0])
        for c in cols[1:]:
            maxlen = jnp.maximum(maxlen, eff_len(c))
        slot = jnp.tile(jnp.arange(w, dtype=jnp.int32), cap)
        sel = jnp.repeat(rel.sel, w) & (slot < jnp.repeat(maxlen, w))
        out_cols = []
        for c in rel.columns:  # passthrough columns repeat w times
            data = jnp.repeat(c.data, w, axis=0)
            validity = (None if c.validity is None
                        else jnp.repeat(c.validity, w))
            lengths = (None if c.lengths is None
                       else jnp.repeat(c.lengths, w))
            ev = (None if c.elem_valid is None
                  else jnp.repeat(c.elem_valid, w, axis=0))
            out_cols.append(DeviceColumn(data, validity, c.dtype,
                                         c.dictionary, c.bounds, lengths, ev))
        nbase = len(rel.columns)
        for c, f in zip(cols, self.schema.fields[nbase:]):
            data = c.data.reshape(out_cap)
            ev = (c.slot_valid() & c.valid()[:, None]).reshape(out_cap)
            out_cols.append(DeviceColumn(data, ev, f.dtype, c.dictionary))
        return DeviceRelation(self.schema, tuple(out_cols), sel)

    def execute(self, ctx: ExecContext) -> DeviceRelation:
        rel = self.input.execute(ctx)
        return self._timed(ctx, self._fn, rel)

    def _line(self):
        return f"UnnestExec: {', '.join(e.name() for e in self.unnest_exprs)}"


class RecursiveQueryExec(PhysicalPlan):
    """Host-driven fixpoint loop for WITH RECURSIVE (reference:
    RecursiveQueryExec, physical-plan/src/recursive_query.rs:66). The
    iteration count is data-dependent, so the loop runs on the host; each
    step executes the (jitted, capacity-bucketed) recursive arm against the
    previous step's rows and appends to the accumulated result."""

    MAX_ITERATIONS = 100

    def __init__(self, static_plan: PhysicalPlan, recursive_plan: PhysicalPlan,
                 work_table, schema: Schema, name: str):
        self.static_plan = static_plan
        self.recursive_plan = recursive_plan
        self.work_table = work_table
        self.schema = schema
        self.name = name

    def children(self):
        return (self.static_plan, self.recursive_plan)

    def execute(self, ctx: ExecContext) -> DeviceRelation:
        acc = self.static_plan.execute(ctx)
        work = acc
        try:
            for _ in range(self.MAX_ITERATIONS):
                ctx.check_cancelled()
                live = int(jax.device_get(jnp.sum(work.sel)))
                if live == 0:
                    return acc
                self.work_table._rel = work
                step = self.recursive_plan.execute(ctx)
                work = step
                acc = concat_relations([acc, step], self.schema)
        finally:
            self.work_table._rel = None
        raise ExecutionError(
            f"recursive CTE {self.name!r} exceeded "
            f"{self.MAX_ITERATIONS} iterations")

    def _line(self):
        return f"RecursiveQueryExec: {self.name}"


class DistinctExec(PhysicalPlan):
    def __init__(self, input: PhysicalPlan):
        self.input = input
        self.schema = input.schema
        self._fn = jax.jit(self._transform)

    def children(self):
        return (self.input,)

    def _transform(self, rel: DeviceRelation) -> DeviceRelation:
        keys = [(c.data, c.validity, False, False) for c in rel.columns]
        payload = []
        layout = []
        for c in rel.columns:
            payload.append(c.data)
            if c.validity is not None:
                payload.append(c.validity)
            layout.append(c.validity is not None)
        sorted_payload, ssel = K.sort_rows(keys, payload, rel.sel)
        cols = []
        it = iter(sorted_payload)
        for c, hasv in zip(rel.columns, layout):
            data = next(it)
            validity = next(it) if hasv else None
            cols.append(DeviceColumn(data, validity, c.dtype, c.dictionary))
        _, is_start, _ = K.segments_from_sorted_keys(
            [c.data for c in cols], [c.validity for c in cols], ssel
        )
        return DeviceRelation(self.schema, tuple(cols), is_start)

    def execute(self, ctx: ExecContext) -> DeviceRelation:
        return self._timed(ctx, self._fn, self.input.execute(ctx))


class ValuesExec(PhysicalPlan):
    def __init__(self, schema: Schema, rows: List[List[E.Literal]]):
        self.schema = schema
        self.rows = rows

    def execute(self, ctx: ExecContext) -> DeviceRelation:
        from ..data.table import Table

        data = {}
        for i, f in enumerate(self.schema.fields):
            data[f.name] = [r[i].value for r in self.rows]
        t = Table.from_pydict(data, {f.name: f.dtype for f in self.schema.fields})
        rel = to_device(t)
        return DeviceRelation(self.schema, rel.columns, rel.sel)


class EmptyExec(PhysicalPlan):
    def __init__(self, schema: Schema, one_row: bool = True):
        self.schema = schema
        self.one_row = one_row

    def execute(self, ctx: ExecContext) -> DeviceRelation:
        rel = empty_relation(self.schema)
        if self.one_row:
            rel = rel.with_sel(rel.sel.at[0].set(True))
        return rel
