"""Whole-query fusion: one XLA program per query.

The TPU-native answer to the reference's streaming operator pipeline (tokio
pull loops, physical-plan/src/execution_plan.rs execute() streams): instead of
many small dispatches (each paying host->device latency), the entire physical
plan is traced into a single jitted function once the data-dependent
capacities are known.

Two-phase adaptive execution:
  1. discovery: the plan runs operator-by-operator (physical/plan.py);
     Join/Aggregate record the power-of-two output capacities they chose via
     host syncs.
  2. steady state: the full plan is re-traced with those capacities baked in
     and compiled as ONE function (scan relations in, result + overflow flags
     out). Each subsequent execution is a single dispatch; XLA fuses across
     operator boundaries (filter masks into aggregations, projections into
     gathers).

Overflow safety: the fused program also emits, per capacity decision, the
actual required size; if data grows past a baked capacity the host sees the
flag and transparently re-runs discovery (capacities only ever grow).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..common.errors import ExecutionError, PlanError
from ..data.device import DeviceRelation, bucket_capacity
from ..logical.plan import JoinType
from ..runtime.context import ExecContext
from . import plan as P
from .planner import AliasExec


class _TraceCtx:
    def __init__(self):
        self.flags: List[jax.Array] = []  # each: scalar bool, True = overflow
        # shared sub-plans (CTEs referenced multiple times) trace once
        self.memo: Dict[int, DeviceRelation] = {}


class FusedQuery:
    """Wraps a PhysicalPlan with discovery + fused steady-state execution."""

    def __init__(self, plan: P.PhysicalPlan):
        self.plan = plan
        self.leaves: List[P.PhysicalPlan] = []
        self._collect_leaves(plan, self.leaves)
        self._fused = None

    def _collect_leaves(self, p: P.PhysicalPlan, out: List[P.PhysicalPlan]):
        if isinstance(p, (P.ScanExec, P.ValuesExec, P.EmptyExec)):
            if p not in out:
                out.append(p)
            return
        for c in p.children():
            self._collect_leaves(c, out)

    # -- discovery hints ------------------------------------------------
    # CPU discovery re-executes the whole plan per-op and can dwarf the
    # (cached) XLA compile in a fresh process (TPC-H Q21 at SF1: ~145 s of
    # a 150 s warm start). These helpers export/import the per-node
    # discovery results so a later process can skip straight to the fused
    # program; stale hints are safe -- every hinted quantity is guarded by
    # an in-program overflow flag that forces a real re-discovery.
    DISCOVERY_ATTRS = {
        "CompactExec": ("_decision",),
        "AggregateExec": ("_last_cap", "_last_width"),
        "JoinExec": ("_direct_ok", "_bucket_B", "_last_co"),
        "WindowTopKExec": ("_last_cap",),
    }

    def _nodes_preorder(self):
        out = []

        def walk(p):
            out.append(p)
            for c in p.children():
                walk(c)

        walk(self.plan)
        return out

    def discovery_hints(self):
        """Picklable per-node discovery state (pre-order), or None when the
        plan has not executed/discovered yet."""
        if self._fused in (None, False):
            return None
        out = []
        for p in self._nodes_preorder():
            attrs = {}
            for a in self.DISCOVERY_ATTRS.get(type(p).__name__, ()):
                if hasattr(p, a):
                    attrs[a] = getattr(p, a)
            out.append((type(p).__name__, attrs))
        return out

    def plant_hints(self, hints) -> bool:
        """Install previously exported discovery state; True when the plan
        shape matches. The next execute() skips the CPU discovery pass."""
        nodes = self._nodes_preorder()
        if hints is None or len(nodes) != len(hints):
            return False
        if any(type(p).__name__ != t for p, (t, _) in zip(nodes, hints)):
            return False
        for p, (_, attrs) in zip(nodes, hints):
            for a, v in attrs.items():
                setattr(p, a, v)
        self._hinted = True
        return True

    # ------------------------------------------------------------------
    def execute(self, ctx: ExecContext) -> DeviceRelation:
        if self._fused is None and getattr(self, "_hinted", False):
            self._hinted = False  # one shot: failures fall back to discovery
            try:
                fused = self._build_fused()
                disc_ctx = self._discovery_ctx(ctx)
                inputs0 = tuple(leaf.execute(disc_ctx) for leaf in self.leaves)
                jax.eval_shape(fused, inputs0)
                self._fused = fused
            except (ExecutionError, PlanError):
                self._fused = None  # plant incomplete: run real discovery
        if self._fused is None:
            # discovery on the CPU backend: capacities depend only on data,
            # and CPU per-operator compiles are ~100x cheaper than TPU ones.
            # The TPU pays for exactly ONE compile per query: the fused plan.
            disc_ctx = self._discovery_ctx(ctx)
            out = self.plan.execute(disc_ctx)
            try:
                fused = self._build_fused()
                # abstract trace now: surfaces unfusible plans before the
                # device ever compiles, and fixes _has_flags eagerly rather
                # than as a first-call trace side effect (which AOT lowering
                # would never run)
                inputs0 = tuple(leaf.execute(disc_ctx) for leaf in self.leaves)
                jax.eval_shape(fused, inputs0)
                self._fused = fused
            except (ExecutionError, PlanError):
                # not fusible -- including leaves that cannot execute outside
                # their operator's control (worktable scans are only legal
                # inside the recursion that drives them)
                self._fused = False  # keep per-op execution
            if self._fused is False and disc_ctx is not ctx:
                return self.plan.execute(ctx)  # per-op on the real backend
            if disc_ctx is ctx:
                return out  # discovery already ran on the target backend
        if self._fused is False:
            return self.plan.execute(ctx)
        inputs = tuple(leaf.execute(ctx) for leaf in self.leaves)
        rel, flag = self._fused(inputs)
        # bool(flag) also SYNCs on the finished program (the flag depends on
        # the result), which is what makes query-level timings honest on the
        # remote backend
        if bool(flag):
            # capacity overflow: re-discover (capacities grow) and rebuild
            self._fused = None
            return self.execute(ctx)
        return rel

    # ------------------------------------------------------------------
    def _discovery_ctx(self, ctx: ExecContext) -> ExecContext:
        import jax as _jax

        try:
            if _jax.devices()[0].platform != "tpu":
                return ctx
            cpu = _jax.devices("cpu")[0]
        except Exception:
            return ctx
        return ExecContext(ctx.config, device=cpu)

    def _build_fused(self):
        leaf_index = {id(leaf): i for i, leaf in enumerate(self.leaves)}

        def fused(inputs: Tuple[DeviceRelation, ...]):
            tctx = _TraceCtx()
            # expression-level discovery caches (string casts) report
            # staleness through the same flag list as operator-level ones
            from . import expr_compiler as _EC

            prev_sink = _EC.set_flag_sink(tctx.flags)
            try:
                rel = _trace(self.plan, inputs, leaf_index, tctx)
            finally:
                _EC.set_flag_sink(prev_sink)
            # reduce overflow flags to ONE scalar inside the program: the
            # host-side check is then a single device_get -- a second
            # round-trip per execution otherwise (~24ms via the remote
            # tunnel, which dwarfs most queries' device time)
            self._has_flags = bool(tctx.flags)
            if tctx.flags:
                flag = jnp.any(jnp.stack(tctx.flags))
            else:
                # no overflow guards: emit a RESULT-DEPENDENT always-False
                # flag anyway. The host-side bool(flag) then serializes on
                # the finished program — jax.block_until_ready is a no-op
                # for the axon remote backend's buffers, so without this a
                # flagless query (e.g. Q1's hinted dense-agg) reports
                # dispatch latency as its execution time.
                flag = jnp.sum(rel.sel.astype(jnp.int32)) < 0
            return rel, flag

        return jax.jit(fused)


def _trace(p: P.PhysicalPlan, inputs, leaf_index, tctx) -> DeviceRelation:
    hit = tctx.memo.get(id(p))
    if hit is not None:
        return hit
    out = _trace_inner(p, inputs, leaf_index, tctx)
    tctx.memo[id(p)] = out
    return out


def _trace_inner(p: P.PhysicalPlan, inputs, leaf_index, tctx) -> DeviceRelation:
    if isinstance(p, (P.ScanExec, P.ValuesExec, P.EmptyExec)):
        rel = inputs[leaf_index[id(p)]]
        if isinstance(p, P.ScanExec):
            cols = []
            src = {f.name: c for f, c in zip(rel.schema.fields, rel.columns)}
            for f in p.schema.fields:
                cols.append(src[f.name])
            return DeviceRelation(p.schema, tuple(cols), rel.sel)
        return rel
    if isinstance(p, (P.FilterExec, P.ProjectionExec, P.LimitExec, P.SortExec,
                      P.DistinctExec, P.UnnestExec)):
        return p._transform(_trace(p.input, inputs, leaf_index, tctx))
    if isinstance(p, P.CompactExec):
        rel = _trace(p.input, inputs, leaf_index, tctx)
        d = p._decision
        if d is None:
            raise ExecutionError("compaction capacity not discovered")
        if d[0] == "identity":
            return rel
        tctx.flags.append(jnp.sum(rel.sel) > d[1])
        return p._apply(rel, d[1])
    if isinstance(p, AliasExec):
        rel = _trace(p.input, inputs, leaf_index, tctx)
        return DeviceRelation(p.schema, rel.columns, rel.sel)
    if isinstance(p, P.UnionExec):
        rels = [_trace(c, inputs, leaf_index, tctx) for c in p.inputs]
        return P.concat_relations(rels, p.schema)
    if isinstance(p, P.AggregateExec):
        return _trace_aggregate(p, inputs, leaf_index, tctx)
    if isinstance(p, P.JoinExec):
        return _trace_join(p, inputs, leaf_index, tctx)
    from .window import WindowExec, WindowTopKExec

    if isinstance(p, WindowExec):
        return p._transform(_trace(p.input, inputs, leaf_index, tctx))
    if isinstance(p, WindowTopKExec):
        rel = _trace(p.input, inputs, leaf_index, tctx)
        cap = p._last_cap
        if cap is None:
            raise ExecutionError("window top-k capacity not discovered")
        perm, rank, keep = p._phase1(rel)
        tctx.flags.append(jnp.sum(keep) > cap)
        return p._apply(rel, perm, rank, keep, cap)
    raise ExecutionError(f"cannot fuse operator {type(p).__name__}")


def _pallas_mode_static() -> Optional[str]:
    import os

    mode = os.environ.get("DATAFUSION_TPU_FORCE_PALLAS")
    if mode in ("off", "none"):
        return None
    if mode is None and jax.devices()[0].platform == "tpu":
        return "tpu"
    return mode


def apply_aggregate(p: P.AggregateExec, rel: DeviceRelation,
                    tctx: Optional[_TraceCtx] = None) -> DeviceRelation:
    """Trace p's aggregation over an already-traced input relation, using the
    capacities recorded during discovery (shared by FusedQuery and the
    distributed engine)."""
    from ..ops import groupby as G
    from ..ops import kernels as K

    if not p.group_exprs:
        if tctx is not None and p._has_array_agg():
            tctx.flags.append(jnp.sum(rel.sel) > p._last_width)
        return p._global(rel)
    dense = p._dense_sizes(rel)
    if dense is not None:
        sizes, ngroups = dense
        return p._dense_transform(rel, sizes, ngroups, _pallas_mode_static())
    cap = getattr(p, "_last_cap", None)
    if cap is None:
        raise ExecutionError("aggregate capacity not discovered")
    states = p._phase_sort(rel)
    num_groups = states[0][-1]
    if tctx is not None:
        tctx.flags.append(num_groups > cap)
        if p._has_array_agg():
            ssel0, seg0 = states[0][3], states[0][4]
            tctx.flags.append(
                jnp.max(K.segment_count(seg0, ssel0, cap)) > p._last_width)
    _, _, _, specs = p._prepare(rel)
    out_keys, out_aggs, out_sel = G.phase_reduce_multi(states, specs, cap)
    cols = [p._coerce_out(c, f)
            for c, f in zip(list(out_keys) + list(out_aggs), p.schema.fields)]
    return DeviceRelation(p.schema, tuple(cols), out_sel)


def _trace_aggregate(p: P.AggregateExec, inputs, leaf_index, tctx) -> DeviceRelation:
    rel = _trace(p.input, inputs, leaf_index, tctx)
    return apply_aggregate(p, rel, tctx)


def join_normalize(p: P.JoinExec):
    """(swapped, normalized join type, normalized on-pairs): RIGHT flavors are
    re-expressed as LEFT joins with sides swapped."""
    jt = p.join_type
    swapped = jt in (JoinType.RIGHT, JoinType.RIGHT_SEMI, JoinType.RIGHT_ANTI)
    if swapped:
        jt = {JoinType.RIGHT: JoinType.LEFT, JoinType.RIGHT_SEMI: JoinType.LEFT_SEMI,
              JoinType.RIGHT_ANTI: JoinType.LEFT_ANTI}[jt]
    on = tuple((r, l) for l, r in p.on) if swapped else p.on
    return swapped, jt, on


def _unified_keys(on, lrel, rrel):
    from .expr_compiler import eval_expr, unify_string_columns

    lkeys = [eval_expr(l, lrel) for l, _ in on]
    rkeys = [eval_expr(r, rrel) for _, r in on]
    for i in range(len(lkeys)):
        if lkeys[i].dtype.is_string or rkeys[i].dtype.is_string:
            lkeys[i], rkeys[i] = unify_string_columns(lkeys[i], rkeys[i])
    return lkeys, rkeys


def apply_join(p: P.JoinExec, lrel: DeviceRelation, rrel: DeviceRelation,
               tctx: Optional[_TraceCtx] = None,
               co_cap: Optional[int] = None) -> DeviceRelation:
    """Trace p's join over already-traced (normalized probe, build) relations
    using the discovered output capacity. lrel/rrel must already be in
    normalized order (probe=lrel; see join_normalize). co_cap (distributed
    engine) bounds the expansion capacity below the discovered global one
    (per-shard outputs are ~n x smaller); the overflow flag then guards it."""
    from ..ops import joinimpl as J
    from .expr_compiler import eval_expr, unify_string_columns

    swapped, jt, on = join_normalize(p)
    p._exec_on = on
    p._exec_range = p.range_on
    if swapped and p.range_on is not None:
        le, re_, opk = p.range_on
        p._exec_range = (re_, le, p._RANGE_MIRROR[opk])

    if jt in (JoinType.LEFT_SEMI, JoinType.LEFT_ANTI) and p.range_on is None:
        info = p._direct_info(swapped, lrel, rrel)
        if info is not None and p.filter is None:
            spans, domain = info
            ex = J.join_direct_exists(
                *_unified_keys(on, lrel, rrel), lrel.sel, rrel.sel,
                spans, domain)
            keep = ex if jt is JoinType.LEFT_SEMI else ~ex
            return DeviceRelation(p.schema, lrel.columns, lrel.sel & keep)
        if info is not None and p.filter is not None:
            mm = p._residual_minmax(lrel, rrel)
            if mm is not None:
                from .expr_compiler import eval_expr as _ee

                pe, be, opk = mm
                spans, domain = info
                ex = J.join_exists_minmax(
                    *_unified_keys(on, lrel, rrel), lrel.sel, rrel.sel,
                    spans, domain, _ee(pe, lrel), _ee(be, rrel), opk)
                keep = ex if jt is JoinType.LEFT_SEMI else ~ex
                return DeviceRelation(p.schema, lrel.columns,
                                      lrel.sel & keep)

    if jt in (JoinType.INNER, JoinType.LEFT) and p.range_on is None:
        info = p._direct_info(swapped, lrel, rrel)
        if info is not None and p._direct_ok.get((swapped, jt, info)):
            spans, domain = info
            out, dup = p._direct_impl(lrel, rrel, jt, swapped, spans, domain)
            if tctx is not None:
                # duplicate build keys appearing post-discovery invalidate
                # the unique-build assumption: re-discover (same machinery
                # as capacity overflow)
                tctx.flags.append(dup)
            return out
        if info is None:
            binfo = p._bucket_info(swapped, lrel, rrel)
            B = p._bucket_B.get(binfo) if binfo is not None else None
            if B is not None \
                    and p._direct_ok.get((swapped, jt, "bucket", binfo)):
                order, spans, nprefix, d1 = binfo
                out, bad = p._direct_impl(
                    lrel, rrel, jt, swapped, spans, 0,
                    bucket=(order, nprefix, d1, B))
                if tctx is not None:
                    # bucket overflow / duplicate full key post-discovery
                    tctx.flags.append(bad)
                return out

    if p._exec_range is not None and not on:
        # pure range-predicate join (PiecewiseMergeJoin analog)
        le, re_, opk = p._exec_range
        perm, lo, cnt, total = J.range_join_phase1(
            eval_expr(le, lrel), eval_expr(re_, rrel), opk,
            lrel.sel, rrel.sel)
    else:
        lkeys, rkeys = _unified_keys(on, lrel, rrel)
        perm, lo, cnt, total = J.join_phase1(lkeys, rkeys, lrel.sel, rrel.sel)

    if jt in (JoinType.LEFT_SEMI, JoinType.LEFT_ANTI) and p.filter is None:
        keep = (cnt > 0) if jt is JoinType.LEFT_SEMI else (cnt == 0)
        return DeviceRelation(p.schema, lrel.columns, lrel.sel & keep)

    co = p._last_co.get(("co", swapped, jt)) if hasattr(p, "_last_co") else None
    if co is None:
        raise ExecutionError("join capacity not discovered")
    if co_cap is not None:
        co = min(co, co_cap)
    if tctx is not None:
        tctx.flags.append(total > co)
    p._exec_on = on
    return p._expand_impl(lrel, rrel, perm, lo, cnt, jt, swapped, co)


def _trace_join(p: P.JoinExec, inputs, leaf_index, tctx) -> DeviceRelation:
    swapped, _, _ = join_normalize(p)
    lplan, rplan = (p.right, p.left) if swapped else (p.left, p.right)
    lrel = _trace(lplan, inputs, leaf_index, tctx)
    rrel = _trace(rplan, inputs, leaf_index, tctx)
    return apply_join(p, lrel, rrel, tctx)
