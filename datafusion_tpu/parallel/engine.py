"""Distributed execution of REAL engine plans over a jax.sharding.Mesh.

TPU-native replacement for the reference's exchange-parallel physical layer:
the whole physical plan is traced into ONE shard_map program over the mesh's
"dp" axis, with XLA collectives at the points where the reference would
insert RepartitionExec / CoalescePartitionsExec
(physical-plan/src/repartition/mod.rs:1196, coalesce_partitions.rs:45,
physical-optimizer/src/ensure_requirements/enforce_distribution.rs):

  Scan leaves         -> contiguous row partitioning (NamedSharding on the
                         capacity axis), the `target_partitions` analog
  Filter/Projection   -> purely local (distribution-preserving)
  Join                -> small build sides are all_gather'ed
                         (PartitionMode::CollectLeft,
                         joins/hash_join/exec.rs); large build sides switch
                         to PartitionMode::Partitioned (joins/mod.rs:96):
                         BOTH sides hash-exchange on the join keys via
                         all_to_all and the join runs shard-locally --
                         exact for every join type incl. FULL because all
                         rows of a key land on exactly one shard
  grouped Aggregate   -> decomposable aggregates split Partial/Final (only
                         states cross the wire, aggsplit.py); otherwise rows
                         are exchanged by hash(group keys) via all_to_all
                         (RepartitionExec::Hash) and aggregated locally ==
                         AggregateMode::FinalPartitioned
                         (aggregates/mod.rs:282-357)
  global Aggregate    -> all_gather + replicated single-segment reduce
                         (CoalescePartitions + Single mode)
  Sort+fetch (TopK)   -> per-shard local sort, truncate to the fetch bound,
                         all_gather only n*fetch rows, final merge sort
                         (SortPreservingMerge over TopK runs,
                         sorts/sort_preserving_merge.rs:87 + topk/mod.rs)
  Window              -> rows hash-exchanged on the common PARTITION BY
                         keys, then local window eval (BoundedWindowAggExec
                         riding RepartitionExec::Hash)
  Distinct            -> rows hash-exchanged on all columns, local dedup
  full Sort / Limit   -> all_gather + replicated compute (the ordered N->1
                         exchange fallback)

Distribution decisions depend only on plan structure and discovery-recorded
capacities, never on traced values, so the shard_map out_specs are static.

Skew story (SURVEY.md §6 "Skewed keys" -- novel work, the reference only
measures skew via its output_rows_skew metric, datasource/src/source.rs:447):
every exchange allocates slot_cap = slot_factor * (capacity / n_shards)
receive slots per (source, destination) pair instead of the overflow-proof
worst case (n x memory). Overflow rows are dropped-AND-COUNTED inside the
program; the counts fold into one replicated flag. When the flag fires the
host doubles slot_factor and re-runs -- capacities only grow, and the ladder
terminates at the overflow-proof bound. The common case pays 2x the even
split, not n x.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..common.errors import ExecutionError
from ..data.device import DeviceColumn, DeviceRelation
from ..expr import nodes as E
from ..logical.plan import JoinType
from ..ops import kernels as K
from ..physical import fused as F
from ..physical import plan as PP
from ..physical.expr_compiler import eval_expr
from ..physical.planner import AliasExec
from ..physical.window import WindowExec, WindowTopKExec
from .distributed import exchange_by_key, make_mesh

PART, REPL = "part", "repl"

# build sides at or below this capacity broadcast (CollectLeft); larger ones
# hash-partition both sides (the JoinSelection threshold analog,
# physical-optimizer JoinSelection / config collect_left_threshold)
BROADCAST_CAP_DEFAULT = 1 << 21


def _pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


def _join_mode(p: PP.JoinExec, options: dict) -> str:
    """'collect' (broadcast build) or 'partitioned' (hash-exchange both
    sides). Depends only on plan structure + discovery-recorded input
    capacities, so dist_of and _dtrace always agree."""
    if not p.on or p.range_on is not None:
        return "collect"  # no equi-keys to partition on
    mode = options.get("join_mode")
    if mode in ("collect", "partitioned"):
        return mode
    caps = getattr(p, "_last_input_caps", None)
    if caps is None:
        return "collect"
    limit = options.get("broadcast_cap", BROADCAST_CAP_DEFAULT)
    return "partitioned" if caps[1] > limit else "collect"


def _window_part_keys(p: WindowExec) -> Optional[List[E.Expr]]:
    """PARTITION BY exprs shared by EVERY window function in the node; rows
    exchanged on them colocate each function's partitions (each function's
    partitioning is equal to or finer than the common set)."""
    common: Optional[Dict[str, E.Expr]] = None
    for e in p.window_exprs:
        w = e.expr if isinstance(e, E.Alias) else e
        if not isinstance(w, E.WindowFunction):
            return None
        keys = {repr(x): x for x in w.partition_by}
        common = keys if common is None else \
            {k: v for k, v in common.items() if k in keys}
    return list(common.values()) if common else None


def _distinct_hashable(p: PP.DistinctExec) -> bool:
    return all(f.name is not None for f in p.schema.fields)


def dist_of(p: PP.PhysicalPlan, memo: Optional[Dict] = None,
            options: Optional[dict] = None) -> str:
    """Static output distribution of a plan node ('part' = row-partitioned
    over the mesh axis, 'repl' = replicated on every shard). Mirrored exactly
    by _dtrace below."""
    memo = memo if memo is not None else {}
    options = options or {}
    d = memo.get(id(p))
    if d is not None:
        return d
    if isinstance(p, (PP.ScanExec, PP.ValuesExec, PP.EmptyExec)):
        d = PART
    elif isinstance(p, (PP.FilterExec, PP.ProjectionExec, AliasExec,
                        PP.CompactExec)):
        d = dist_of(p.input, memo, options)
    elif isinstance(p, PP.SortExec):
        dist_of(p.input, memo, options)
        d = REPL  # full sort and TopK-merge both emit one global order
    elif isinstance(p, PP.LimitExec):
        dist_of(p.input, memo, options)
        d = REPL
    elif isinstance(p, PP.DistinctExec):
        ci = dist_of(p.input, memo, options)
        d = PART if ci == PART and _distinct_hashable(p) else REPL
    elif isinstance(p, WindowExec):
        ci = dist_of(p.input, memo, options)
        d = PART if ci == PART and _window_part_keys(p) else REPL
    elif isinstance(p, WindowTopKExec):
        ci = dist_of(p.input, memo, options)
        d = PART if ci == PART and p.wfn.partition_by else REPL
    elif isinstance(p, PP.UnionExec):
        ds = [dist_of(c, memo, options) for c in p.inputs]
        d = PART if all(x == PART for x in ds) else REPL
    elif isinstance(p, PP.AggregateExec):
        ci = dist_of(p.input, memo, options)
        d = REPL if not p.group_exprs else ci
    elif isinstance(p, PP.JoinExec):
        swapped, jt, _ = F.join_normalize(p)
        lplan, rplan = (p.right, p.left) if swapped else (p.left, p.right)
        dl = dist_of(lplan, memo, options)
        dist_of(rplan, memo, options)
        if _join_mode(p, options) == "partitioned":
            d = PART
        else:
            d = REPL if jt is JoinType.FULL else dl
    elif len(p.children()) == 1:
        # generic fallback: replicate and run the single-device operator on
        # every shard (reference analog: EnforceDistribution inserting a
        # coalesce before an operator with SinglePartition requirement)
        dist_of(p.children()[0], memo, options)
        d = REPL
    else:
        raise ExecutionError(f"cannot distribute operator {type(p).__name__}")
    memo[id(p)] = d
    return d


def _gather_rel(rel: DeviceRelation, axis: str) -> DeviceRelation:
    """all_gather every array of a relation (tiled): local capacity C ->
    global capacity n*C, preserving shard-major row order."""
    return jax.tree.map(lambda a: jax.lax.all_gather(a, axis, tiled=True), rel)


def _as_repl(rel: DeviceRelation, dist: str, axis: str,
             dctx: "Optional[_DCtx]" = None) -> DeviceRelation:
    if dist == REPL:
        return rel
    out = _gather_rel(rel, axis)
    if dctx is not None:
        dctx.note_cap(out.capacity)
    return out


def _row_hash(cols) -> jax.Array:
    """Hash rows of key columns, canonically across relations: data under a
    NULL is masked to zero (storage under invalid slots is arbitrary, and
    join sides may disagree on validity presence) and a validity plane is
    always included so NULL keys colocate deterministically."""
    hs: List[jax.Array] = []
    for c in cols:
        if c.lengths is not None:
            raise ExecutionError("cannot hash-exchange list-typed keys")
        d = c.data
        if c.validity is not None:
            d = jnp.where(c.validity, d, jnp.zeros((), d.dtype))
            hs.append(c.validity)
        else:
            hs.append(jnp.ones(d.shape[:1], jnp.bool_))
        hs.append(d)
    return K.hash64(hs)


class _DCtx:
    def __init__(self, axis: str, options: Optional[dict] = None,
                 slot_factor: int = 2):
        self.axis = axis
        self.options = options or {}
        self.slot_factor = slot_factor
        self.memo: Dict[int, Tuple[DeviceRelation, str]] = {}
        self.flags: List[jax.Array] = []  # scalar bools: True = overflow
        self.max_cap = 0  # widest per-shard relation created by comms

    def note_cap(self, cap: int) -> None:
        self.max_cap = max(self.max_cap, cap)


def _exchange_rel(rel: DeviceRelation, h: jax.Array, dctx: _DCtx,
                  schema=None) -> DeviceRelation:
    """Hash-exchange a relation's rows to shard h%n via all_to_all, with
    slot_factor x even-split receive slots; overflow is counted into
    dctx.flags for the host's detect->grow->re-run ladder."""
    n = jax.lax.axis_size(dctx.axis)
    cap = rel.capacity
    slot_cap = min(cap, _pow2(max(64, -(-cap // n) * dctx.slot_factor)))
    leaves, treedef = jax.tree.flatten(rel.columns)
    outs, new_sel, dropped = exchange_by_key(
        leaves, h, rel.sel, dctx.axis, slot_cap=slot_cap)
    if slot_cap < cap:
        dctx.flags.append(dropped > 0)
    new_cols = tuple(jax.tree.unflatten(treedef, outs))
    # receive buffers zero-fill unoccupied slots; bounds metadata promises
    # EVERY physical slot is in-interval (the packed-sort-key contract), so
    # widen each column's bounds to cover 0
    fixed = []
    for c in new_cols:
        b = c.bounds
        if b is not None:
            b = (min(int(b[0]), 0), max(int(b[1]), 0))
        fixed.append(DeviceColumn(c.data, c.validity, c.dtype, c.dictionary,
                                  b, c.lengths, c.elem_valid, c.meta))
    dctx.note_cap(n * slot_cap)
    return DeviceRelation(schema if schema is not None else rel.schema,
                          tuple(fixed), new_sel)


def _exchange_by_group(p: PP.AggregateExec, rel: DeviceRelation,
                       dctx: _DCtx) -> DeviceRelation:
    """Hash-repartition rows by group keys so each group is wholly on one
    shard (RepartitionExec::Hash)."""
    gcols = [eval_expr(g, rel) for g in p.group_exprs]
    return _exchange_rel(rel, _row_hash(gcols), dctx)


def _departition(rel: DeviceRelation, h: jax.Array, axis: str) -> DeviceRelation:
    """Split a REPLICATED relation into a partitioned one without any
    communication: every shard keeps only the rows whose hash routes to it
    (the repartition-a-broadcast special case -- consistent with where
    _exchange_rel would have sent them)."""
    n = jax.lax.axis_size(axis)
    own = (h % np.uint64(n)).astype(jnp.int32) == jax.lax.axis_index(axis)
    return rel.with_sel(rel.sel & own)


def _dtrace(p, inputs, leaf_index, dctx) -> Tuple[DeviceRelation, str]:
    hit = dctx.memo.get(id(p))
    if hit is not None:
        return hit
    out = _dtrace_inner(p, inputs, leaf_index, dctx)
    dctx.memo[id(p)] = out
    return out


def _join_side_hashes(p, lrel, rrel):
    """Cross-side-consistent row hashes of the (normalized) join keys: string
    keys are unified to shared dictionary codes first, exactly as the local
    join kernels do (fused._unified_keys)."""
    lkeys, rkeys = F._unified_keys(p._exec_on, lrel, rrel)
    return _row_hash(lkeys), _row_hash(rkeys)


def _dtrace_inner(p, inputs, leaf_index, dctx) -> Tuple[DeviceRelation, str]:
    axis = dctx.axis
    if isinstance(p, (PP.ScanExec, PP.ValuesExec, PP.EmptyExec)):
        rel = inputs[leaf_index[id(p)]]
        if isinstance(p, PP.ScanExec):
            src = {f.name: c for f, c in zip(rel.schema.fields, rel.columns)}
            rel = DeviceRelation(
                p.schema, tuple(src[f.name] for f in p.schema.fields), rel.sel)
        return rel, PART
    if isinstance(p, (PP.FilterExec, PP.ProjectionExec)):
        rel, d = _dtrace(p.input, inputs, leaf_index, dctx)
        return p._transform(rel), d
    if isinstance(p, PP.CompactExec):  # shard-local capacities stay static
        return _dtrace(p.input, inputs, leaf_index, dctx)
    if isinstance(p, AliasExec):
        rel, d = _dtrace(p.input, inputs, leaf_index, dctx)
        return DeviceRelation(p.schema, rel.columns, rel.sel), d
    if isinstance(p, PP.SortExec):
        rel, d = _dtrace(p.input, inputs, leaf_index, dctx)
        if d == PART and p.fetch is not None:
            # distributed TopK: the global top-k is a subset of the union of
            # per-shard top-k runs, so only n*fetch rows ever cross the wire
            # (reference: topk/mod.rs heap + sort_preserving_merge.rs)
            local = p._transform_full(rel)  # sorted, sel-truncated to fetch
            capk = min(local.capacity, _pow2(max(p.fetch, 64)))
            local = jax.tree.map(lambda a: a[:capk], local)
            gathered = _gather_rel(local, axis)
            dctx.note_cap(gathered.capacity)
            return p._transform_full(gathered), REPL
        gathered = _as_repl(rel, d, axis, dctx)
        # shard-major gather order is NOT globally sorted: always run the
        # full sort, even when the single-device plan was marked presorted
        return p._transform_full(gathered), REPL
    if isinstance(p, PP.LimitExec):
        rel, d = _dtrace(p.input, inputs, leaf_index, dctx)
        return p._transform(_as_repl(rel, d, axis, dctx)), REPL
    if isinstance(p, PP.DistinctExec):
        rel, d = _dtrace(p.input, inputs, leaf_index, dctx)
        if d == PART and _distinct_hashable(p):
            try:
                h = _row_hash(rel.columns)
            except ExecutionError:  # list-typed column: fall back to gather
                return p._transform(_as_repl(rel, d, axis, dctx)), REPL
            return p._transform(_exchange_rel(rel, h, dctx)), PART
        return p._transform(_as_repl(rel, d, axis, dctx)), REPL
    if isinstance(p, WindowExec):
        rel, d = _dtrace(p.input, inputs, leaf_index, dctx)
        pby = _window_part_keys(p)
        if d == PART and pby:
            try:
                h = _row_hash([eval_expr(e, rel) for e in pby])
            except ExecutionError:
                return p._transform(_as_repl(rel, d, axis, dctx)), REPL
            return p._transform(_exchange_rel(rel, h, dctx)), PART
        return p._transform(_as_repl(rel, d, axis, dctx)), REPL
    if isinstance(p, WindowTopKExec):
        # per-group top-k: exchange whole partitions to one shard (like
        # WindowExec), then the local sort+rank+compact with the globally
        # discovered capacity (a shard's survivors are a subset of the
        # discovery run's, so the capacity bound holds per shard)
        rel, d = _dtrace(p.input, inputs, leaf_index, dctx)
        cap = p._last_cap
        if cap is None:
            raise ExecutionError("window top-k capacity not discovered")

        def _local(r):
            perm, rank, keep = p._phase1(r)
            return p._apply(r, perm, rank, keep, cap)

        if d == PART and p.wfn.partition_by:
            try:
                h = _row_hash([eval_expr(e, rel)
                               for e in p.wfn.partition_by])
            except ExecutionError:
                return _local(_as_repl(rel, d, axis, dctx)), REPL
            return _local(_exchange_rel(rel, h, dctx)), PART
        return _local(_as_repl(rel, d, axis, dctx)), REPL
    if isinstance(p, PP.UnionExec):
        rds = [_dtrace(c, inputs, leaf_index, dctx) for c in p.inputs]
        if all(d == PART for _, d in rds):
            return PP.concat_relations([r for r, _ in rds], p.schema), PART
        rels = [_as_repl(r, d, axis, dctx) for r, d in rds]
        return PP.concat_relations(rels, p.schema), REPL
    if isinstance(p, PP.AggregateExec):
        from . import aggsplit

        rel, d = _dtrace(p.input, inputs, leaf_index, dctx)
        if not p.group_exprs:
            return F.apply_aggregate(p, _as_repl(rel, d, axis, dctx)), REPL
        if d == REPL:
            return F.apply_aggregate(p, rel), REPL
        # Partial/Final split (states, not rows, cross the wire) when every
        # aggregate is decomposable; dense keys merge by psum (PartialReduce)
        dense = p._dense_sizes(rel)
        if dense is not None:
            out = aggsplit.dense_partial_final(p, rel, axis, *dense,
                                               options=dctx.options)
            if out is not None:
                return out, PART
        else:
            out = aggsplit.sorted_partial_final(p, rel, axis,
                                                options=dctx.options)
            if out is not None:
                return out, PART
        # fallback (DISTINCT / order statistics): exchange the rows, then
        # ordinary single-phase local aggregation -- exact for everything
        ex = _exchange_by_group(p, rel, dctx)
        return F.apply_aggregate(p, ex), PART
    if isinstance(p, PP.JoinExec):
        swapped, jt, _ = F.join_normalize(p)
        lplan, rplan = (p.right, p.left) if swapped else (p.left, p.right)
        lrel, dl = _dtrace(lplan, inputs, leaf_index, dctx)
        rrel, dr = _dtrace(rplan, inputs, leaf_index, dctx)
        if _join_mode(p, dctx.options) == "partitioned":
            # PartitionMode::Partitioned (joins/mod.rs:96): hash-exchange
            # BOTH sides on the join keys; every key's rows from both sides
            # land on one shard, so the local join -- unmatched-row emission
            # included -- is exact for every join type, FULL included.
            p._exec_on = F.join_normalize(p)[2]
            hl, hr = _join_side_hashes(p, lrel, rrel)
            lpart = (_exchange_rel(lrel, hl, dctx) if dl == PART
                     else _departition(lrel, hl, axis))
            rpart = (_exchange_rel(rrel, hr, dctx) if dr == PART
                     else _departition(rrel, hr, axis))
            n = jax.lax.axis_size(axis)
            co = p._last_co.get(("co", swapped, jt))
            co_cap = None
            if co is not None:
                co_cap = min(co, _pow2(max(64, -(-co // n) * dctx.slot_factor)))
            out = F.apply_join(p, lpart, rpart, tctx=dctx, co_cap=co_cap)
            dctx.note_cap(out.capacity)
            return out, PART
        if jt is JoinType.FULL or dl == REPL:
            # FULL needs both sides' unmatched rows emitted exactly once
            return F.apply_join(p, _as_repl(lrel, dl, axis, dctx),
                                _as_repl(rrel, dr, axis, dctx)), REPL
        # CollectLeft analog: broadcast the build side, probe stays local
        return F.apply_join(p, lrel, _as_repl(rrel, dr, axis, dctx)), PART
    if len(p.children()) == 1 and hasattr(p, "_transform"):
        # generic single-input fallback: replicate, then every shard runs
        # the operator's own single-device transform (deterministic, so all
        # shards hold the same replicated result)
        rel, d = _dtrace(p.children()[0], inputs, leaf_index, dctx)
        return p._transform(_as_repl(rel, d, axis, dctx)), REPL
    raise ExecutionError(f"cannot distribute operator {type(p).__name__}")


class DistributedQuery:
    """Execute a physical plan SPMD over a device mesh.

    Usage mirrors FusedQuery: one single-device discovery run fixes the
    data-dependent capacities, then the whole plan compiles as ONE
    shard_map'ed XLA program (scan relations in -> result relation out) whose
    collectives ride the mesh axis. Exchange overflow (skew) is detected by
    an in-program counter and handled by doubling the slot factor and
    re-running -- see the module docstring."""

    def __init__(self, plan: PP.PhysicalPlan, mesh: Optional[Mesh] = None,
                 axis: str = "dp", options: Optional[dict] = None):
        self.plan = plan
        self.mesh = mesh if mesh is not None else make_mesh()
        self.axis = axis
        self.options = dict(options or {})
        self.leaves: List[PP.PhysicalPlan] = []
        self._collect_leaves(plan)
        self._fn = None
        self._has_flags = False
        self.slot_factor = int(self.options.get("slot_factor", 2))
        self.trace_stats: Dict[str, int] = {}
        # provisional (pre-discovery); recomputed in execute() once join
        # input capacities are known
        self.out_dist = dist_of(plan, options=self.options)

    def _collect_leaves(self, p: PP.PhysicalPlan):
        if isinstance(p, (PP.ScanExec, PP.ValuesExec, PP.EmptyExec)):
            if p not in self.leaves:
                self.leaves.append(p)
            return
        for c in p.children():
            self._collect_leaves(c)

    def execute(self, ctx) -> DeviceRelation:
        if self._fn is None:
            self.plan.execute(ctx)  # capacity discovery (single device)
            self.out_dist = dist_of(self.plan, options=self.options)
            self._fn = self._build()
        inputs = tuple(self._shard(leaf.execute(ctx)) for leaf in self.leaves)
        rel, flag = self._fn(inputs)
        if bool(flag):
            n = self.mesh.shape[self.axis]
            if self.slot_factor >= n:
                raise ExecutionError(
                    "exchange overflow at the overflow-proof slot bound")
            self.slot_factor = min(self.slot_factor * 2, n)
            self._fn = self._build()  # capacities grew: recompile and re-run
            return self.execute(ctx)
        return rel

    def _shard(self, rel: DeviceRelation) -> DeviceRelation:
        n = self.mesh.shape[self.axis]
        cap = rel.capacity
        if cap % n:
            pad = n - cap % n
            rel = jax.tree.map(
                lambda a: jnp.concatenate([a, jnp.zeros((pad,), a.dtype)]), rel)
        sharding = NamedSharding(self.mesh, P(self.axis))
        return jax.device_put(rel, sharding)

    def _build(self):
        leaf_index = {id(l): i for i, l in enumerate(self.leaves)}
        axis = self.axis
        plan = self.plan
        options = self.options
        slot_factor = self.slot_factor
        stats = self.trace_stats
        holder = {}

        def fn(inputs):
            dctx = _DCtx(axis, options, slot_factor)
            rel, _dist = _dtrace(plan, inputs, leaf_index, dctx)
            holder["has_flags"] = bool(dctx.flags)
            stats["max_capacity"] = dctx.max_cap
            # one replicated overflow scalar: any exchange on any shard.
            # Flagless plans get a RESULT-DEPENDENT always-False flag so the
            # host-side bool(flag) serializes on the finished program (the
            # remote backend's block_until_ready is a no-op; fused.py has
            # the same guard).
            flag = (jnp.any(jnp.stack(dctx.flags)) if dctx.flags
                    else jnp.sum(rel.sel.astype(jnp.int32)) < 0)
            flag = jax.lax.psum(flag.astype(jnp.int32), axis) > 0
            return rel, flag

        out_spec = P(self.axis) if self.out_dist == PART else P()
        smapped = jax.shard_map(fn, mesh=self.mesh, in_specs=(P(self.axis),),
                                out_specs=(out_spec, P()), check_vma=False)
        jitted = jax.jit(smapped)

        def run(inputs):
            out = jitted(inputs)
            self._has_flags = holder.get("has_flags", True)
            return out

        return run
