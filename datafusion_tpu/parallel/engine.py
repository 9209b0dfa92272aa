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
  Join                -> probe side stays partitioned; build side is
                         all_gather'ed (PartitionMode::CollectLeft,
                         joins/hash_join/exec.rs); FULL joins gather both
  grouped Aggregate   -> rows exchanged by hash(group keys) via all_to_all
                         (RepartitionExec::Hash), then the ordinary local
                         aggregation per shard == AggregateMode::
                         FinalPartitioned (aggregates/mod.rs:282-357); every
                         group lands on exactly one shard, so DISTINCT and
                         order statistics stay exact
  global Aggregate    -> all_gather + replicated single-segment reduce
                         (CoalescePartitions + Single mode)
  Sort/Limit/Window/
  Distinct            -> all_gather + replicated compute (the ordered N->1
                         exchange, SortPreservingMergeExec analog)

Distribution decisions depend only on plan structure, never on data, so the
shard_map out_specs are static. Capacities are discovered by one single-
device per-operator run (physical/fused.py's discovery pass); exchange slot
capacities use the overflow-proof bound (slot_cap = local capacity), so no
row can ever be dropped by skew.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..common.errors import ExecutionError
from ..data.device import DeviceRelation
from ..logical.plan import JoinType
from ..ops import kernels as K
from ..physical import fused as F
from ..physical import plan as PP
from ..physical.planner import AliasExec
from ..physical.window import WindowExec
from .distributed import exchange_by_key, make_mesh

PART, REPL = "part", "repl"


def dist_of(p: PP.PhysicalPlan, memo: Optional[Dict] = None) -> str:
    """Static output distribution of a plan node ('part' = row-partitioned
    over the mesh axis, 'repl' = replicated on every shard). Mirrored exactly
    by _dtrace below."""
    memo = memo if memo is not None else {}
    d = memo.get(id(p))
    if d is not None:
        return d
    if isinstance(p, (PP.ScanExec, PP.ValuesExec, PP.EmptyExec)):
        d = PART
    elif isinstance(p, (PP.FilterExec, PP.ProjectionExec, AliasExec,
                        PP.CompactExec)):
        d = dist_of(p.input, memo)
    elif isinstance(p, (PP.SortExec, PP.LimitExec, PP.DistinctExec, WindowExec)):
        dist_of(p.input, memo)
        d = REPL
    elif isinstance(p, PP.UnionExec):
        ds = [dist_of(c, memo) for c in p.inputs]
        d = PART if all(x == PART for x in ds) else REPL
    elif isinstance(p, PP.AggregateExec):
        ci = dist_of(p.input, memo)
        d = REPL if not p.group_exprs else ci
    elif isinstance(p, PP.JoinExec):
        swapped, jt, _ = F.join_normalize(p)
        lplan, rplan = (p.right, p.left) if swapped else (p.left, p.right)
        dl = dist_of(lplan, memo)
        dist_of(rplan, memo)
        d = REPL if jt is JoinType.FULL else dl
    else:
        raise ExecutionError(f"cannot distribute operator {type(p).__name__}")
    memo[id(p)] = d
    return d


def _gather_rel(rel: DeviceRelation, axis: str) -> DeviceRelation:
    """all_gather every array of a relation (tiled): local capacity C ->
    global capacity n*C, preserving shard-major row order."""
    return jax.tree.map(lambda a: jax.lax.all_gather(a, axis, tiled=True), rel)


def _as_repl(rel: DeviceRelation, dist: str, axis: str) -> DeviceRelation:
    return rel if dist == REPL else _gather_rel(rel, axis)


def _exchange_by_group(p: PP.AggregateExec, rel: DeviceRelation,
                       axis: str) -> DeviceRelation:
    """Hash-repartition rows by group keys so each group is wholly on one
    shard (RepartitionExec::Hash). slot_cap = local capacity: overflow-proof
    (one destination can receive every source's rows)."""
    from ..physical.expr_compiler import eval_expr

    gcols = [eval_expr(g, rel) for g in p.group_exprs]
    hs: List[jax.Array] = []
    for c in gcols:
        hs.append(c.data)
        if c.validity is not None:
            hs.append(c.validity)
    h = K.hash64(hs)
    leaves, treedef = jax.tree.flatten(rel.columns)
    outs, new_sel, _dropped = exchange_by_key(
        leaves, h, rel.sel, axis, slot_cap=rel.capacity)
    new_cols = jax.tree.unflatten(treedef, outs)
    return DeviceRelation(rel.schema, tuple(new_cols), new_sel)


class _DCtx:
    def __init__(self, axis: str, options: Optional[dict] = None):
        self.axis = axis
        self.options = options or {}
        self.memo: Dict[int, Tuple[DeviceRelation, str]] = {}


def _dtrace(p, inputs, leaf_index, dctx) -> Tuple[DeviceRelation, str]:
    hit = dctx.memo.get(id(p))
    if hit is not None:
        return hit
    out = _dtrace_inner(p, inputs, leaf_index, dctx)
    dctx.memo[id(p)] = out
    return out


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
    if isinstance(p, (PP.SortExec, PP.LimitExec, PP.DistinctExec, WindowExec)):
        rel, d = _dtrace(p.input, inputs, leaf_index, dctx)
        gathered = _as_repl(rel, d, axis)
        if isinstance(p, PP.SortExec):
            # shard-major gather order is NOT globally sorted: always run
            # the full sort here, even when the single-device plan was
            # marked presorted (physical/ordering.py)
            return p._transform_full(gathered), REPL
        return p._transform(gathered), REPL
    if isinstance(p, PP.UnionExec):
        rds = [_dtrace(c, inputs, leaf_index, dctx) for c in p.inputs]
        if all(d == PART for _, d in rds):
            return PP.concat_relations([r for r, _ in rds], p.schema), PART
        rels = [_as_repl(r, d, axis) for r, d in rds]
        return PP.concat_relations(rels, p.schema), REPL
    if isinstance(p, PP.AggregateExec):
        from . import aggsplit

        rel, d = _dtrace(p.input, inputs, leaf_index, dctx)
        if not p.group_exprs:
            return F.apply_aggregate(p, _as_repl(rel, d, axis)), REPL
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
        ex = _exchange_by_group(p, rel, axis)
        return F.apply_aggregate(p, ex), PART
    if isinstance(p, PP.JoinExec):
        swapped, jt, _ = F.join_normalize(p)
        lplan, rplan = (p.right, p.left) if swapped else (p.left, p.right)
        lrel, dl = _dtrace(lplan, inputs, leaf_index, dctx)
        rrel, dr = _dtrace(rplan, inputs, leaf_index, dctx)
        if jt is JoinType.FULL or dl == REPL:
            # FULL needs both sides' unmatched rows emitted exactly once
            return F.apply_join(p, _as_repl(lrel, dl, axis),
                                _as_repl(rrel, dr, axis)), REPL
        # CollectLeft analog: broadcast the build side, probe stays local
        return F.apply_join(p, lrel, _as_repl(rrel, dr, axis)), PART
    raise ExecutionError(f"cannot distribute operator {type(p).__name__}")


class DistributedQuery:
    """Execute a physical plan SPMD over a device mesh.

    Usage mirrors FusedQuery: one single-device discovery run fixes the
    data-dependent capacities, then the whole plan compiles as ONE
    shard_map'ed XLA program (scan relations in -> result relation out) whose
    collectives ride the mesh axis."""

    def __init__(self, plan: PP.PhysicalPlan, mesh: Optional[Mesh] = None,
                 axis: str = "dp", options: Optional[dict] = None):
        self.plan = plan
        self.mesh = mesh if mesh is not None else make_mesh()
        self.axis = axis
        self.options = dict(options or {})
        self.leaves: List[PP.PhysicalPlan] = []
        self._collect_leaves(plan)
        self._fn = None
        self.out_dist = dist_of(plan)

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
            self._fn = self._build()
        inputs = tuple(self._shard(leaf.execute(ctx)) for leaf in self.leaves)
        return self._fn(inputs)

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

        def fn(inputs):
            dctx = _DCtx(axis, options)
            rel, _dist = _dtrace(plan, inputs, leaf_index, dctx)
            return rel

        out_spec = P(self.axis) if self.out_dist == PART else P()
        smapped = jax.shard_map(fn, mesh=self.mesh, in_specs=(P(self.axis),),
                                out_specs=out_spec, check_vma=False)
        return jax.jit(smapped)
