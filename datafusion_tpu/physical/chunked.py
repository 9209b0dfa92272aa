"""Chunked (morsel-driven) out-of-core execution.

The TPU-native answer to the reference's spill-driven streaming operators
(ExternalSorter, physical-plan/src/sorts/sort.rs:110-202; grouped aggregation
spill, aggregates/grouped_hash_stream.rs:1167; spill/ + memory_pool back
pressure): instead of an async pull pipeline over record batches, the scan is
partitioned into capacity-bounded device chunks that flow one at a time
through the SAME jitted per-operator transforms the resident engine uses.
Chunk-over-time is isomorphic to the distributed engine's chunk-over-devices
(parallel/engine.py): pipeline operators are local, and each pipeline breaker
declares how partial results merge across chunks:

  Filter/Projection/Alias  per-chunk (one compile: all chunks share capacity,
                           dictionaries and bounds -- see scan_chunks)
  Aggregate (decomposable) per-chunk Partial states -> running merge
                           (aggsplit.StatePlan, the GroupsAccumulator state
                           contract re-used on the time axis); dense
                           small-domain keys merge elementwise with NO sort
  Sort + fetch (TopK)      running top-k: sort chunk, keep k, re-sort 2k
  Sort (full, at the top)  external sort: chunks stream to host RAM (the
                           first spill tier), one exact monotone-int64
                           lexsort merges them host-side
  Join                     build side materialized once (CollectLeft),
                           probe side streamed chunk-by-chunk
  Distinct                 per-chunk distinct -> concat + re-distinct merge
  Limit                    streamed with a running offset + early stop
  anything else            materialize-with-spill fallback

Memory pressure: every accumulated device relation is reserved against the
ExecContext memory pool; when headroom runs out the accumulator first merges
its held partials, then spills them to host via SpillManager -- queries
degrade to out-of-core instead of dying with ResourceExhausted.
"""
from __future__ import annotations

from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..common import types as T
from ..common.errors import ExecutionError, ResourceExhausted
from ..common.schema import Field, Schema
from ..data.column import Dictionary, HostColumn
from ..data.device import (DeviceColumn, DeviceRelation, bucket_capacity,
                           empty_relation, to_host)
from ..data.table import Table
from ..expr import nodes as E
from ..logical.plan import JoinType
from ..ops import groupby as G
from ..ops import kernels as K
from ..parallel import aggsplit as AS
from ..runtime.memory import relation_bytes
from . import plan as P
from .expr_compiler import eval_expr
from .planner import AliasExec
from .window import WindowExec


# ---------------------------------------------------------------------------
# host-side helpers: exact sort keys, cheap chunk concat
# ---------------------------------------------------------------------------

_SIGN64 = np.uint64(0x8000000000000000)


def _monotone_i64(data: np.ndarray, validity: Optional[np.ndarray]) -> np.ndarray:
    """Map a device-representation array to int64 keys whose ascending order
    equals the value order EXACTLY (IEEE-754 total-order trick for floats; no
    float64 round-trip for int64, so decimal sums keep full precision)."""
    x = np.ascontiguousarray(data)
    if x.dtype == np.bool_:
        k = x.astype(np.int64)
    elif np.issubdtype(x.dtype, np.floating):
        u = x.astype(np.float64).view(np.uint64)
        mask = np.where(u >> np.uint64(63), np.uint64(0xFFFFFFFFFFFFFFFF), _SIGN64)
        k = ((u ^ mask) ^ _SIGN64).view(np.int64)
    else:
        k = x.astype(np.int64)
    if validity is not None:
        k = np.where(validity, k, np.int64(0))
    return k


def host_sort_indices(keys: Sequence[Tuple[np.ndarray, Optional[np.ndarray],
                                           bool, bool]]) -> np.ndarray:
    """Stable multi-key argsort on host. keys: (data, validity_or_None,
    descending, nulls_first) -- the external-sort merge step."""
    seq: List[np.ndarray] = []
    for data, validity, desc, nulls_first in reversed(list(keys)):
        k = _monotone_i64(data, validity)
        if desc:
            k = ~k
        valid = (np.ones(len(k), dtype=bool) if validity is None
                 else np.asarray(validity))
        rank = valid.astype(np.int64) if nulls_first else (~valid).astype(np.int64)
        seq.append(k)
        seq.append(rank)  # more significant than the key itself
    return np.lexsort(seq)


def pack_key_rows(keys: Sequence[Tuple[np.ndarray, Optional[np.ndarray],
                                       bool, bool]]) -> np.ndarray:
    """Rows -> one structured composite key whose field-lexicographic order
    equals the multi-key sort order (a validity-rank byte + monotone int64
    per key). numpy compares/searches structured dtypes field-wise, so
    np.searchsorted over these gives vectorized merge positioning."""
    n = len(keys[0][0])
    dt, cols = [], []
    for i, (data, validity, desc, nulls_first) in enumerate(keys):
        k = _monotone_i64(data, validity)
        if desc:
            k = ~k
        valid = (np.ones(n, dtype=bool) if validity is None
                 else np.asarray(validity))
        rank = (valid if nulls_first else ~valid).astype(np.uint8)
        dt.append((f"r{i}", np.uint8))
        cols.append(rank)
        dt.append((f"k{i}", np.int64))
        cols.append(k)
    out = np.empty(n, dtype=np.dtype(dt))
    for (name, _), c in zip(dt, cols):
        out[name] = c
    return out


def merge_run_indices(packed: np.ndarray,
                      run_lengths: Sequence[int]) -> np.ndarray:
    """Stable k-way merge of presorted runs laid out consecutively in
    `packed`: indices producing the global ascending order. Pairwise
    searchsorted merge tree — O(n log r) vectorized passes instead of the
    O(n log n) re-sort (the TPU-host analog of the reference's loser-tree
    streaming merge, physical-plan/src/sorts/merge.rs:54-97; vectorized
    binary-search positioning replaces the per-row tournament)."""
    items = []
    off = 0
    for ln in run_lengths:
        if ln:
            items.append((packed[off:off + ln],
                          np.arange(off, off + ln, dtype=np.int64)))
        off += ln
    if not items:
        return np.empty(0, dtype=np.int64)
    while len(items) > 1:
        nxt = []
        for i in range(0, len(items) - 1, 2):
            k1, i1 = items[i]
            k2, i2 = items[i + 1]
            # run1 rows win ties (stability across runs)
            p1 = np.arange(len(k1)) + np.searchsorted(k2, k1, side="left")
            p2 = np.arange(len(k2)) + np.searchsorted(k1, k2, side="right")
            mk = np.empty(len(k1) + len(k2), dtype=k1.dtype)
            mi = np.empty(len(k1) + len(k2), dtype=np.int64)
            mk[p1] = k1
            mk[p2] = k2
            mi[p1] = i1
            mi[p2] = i2
            nxt.append((mk, mi))
        if len(items) % 2:
            nxt.append(items[-1])
        items = nxt
    return items[0][1]


def concat_host(tables: List[Table], schema: Schema) -> Table:
    """Concatenate host chunk tables sharing a schema. String columns whose
    chunks carry different dictionaries are remapped onto a merged sorted
    dictionary (codes stay order-preserving)."""
    tables = [t for t in tables if t.num_rows] or tables[:1]
    if not tables:
        return Table(schema, [HostColumn(f.dtype, np.zeros(0, f.dtype.np_dtype()))
                              for f in schema.fields])
    if len(tables) == 1:
        return Table(schema, tables[0].columns)
    cols = []
    for i, f in enumerate(schema.fields):
        chunk_cols = [t.columns[i] for t in tables]
        if f.dtype.is_string:
            dicts = {id(c.dictionary) for c in chunk_cols}
            if len(dicts) > 1:
                vals = sorted(set().union(*(
                    set(c.dictionary.values.astype(str))
                    for c in chunk_cols if c.dictionary is not None)))
                shared = Dictionary(np.array(vals, dtype=object))
                chunk_cols = [c.remap_dictionary(shared) for c in chunk_cols]
        data = np.concatenate([c.data for c in chunk_cols])
        validity = None
        if any(c.validity is not None for c in chunk_cols):
            validity = np.concatenate([c.valid_mask() for c in chunk_cols])
        cols.append(HostColumn(f.dtype, data, validity, chunk_cols[0].dictionary))
    return Table(schema, cols)


# ---------------------------------------------------------------------------
# spill-aware accumulation
# ---------------------------------------------------------------------------


class SpillableAccumulator:
    """Holds device relations under memory-pool accounting. On pressure it
    first merges held relations (when a merge_fn is provided -- partial
    aggregation states, distinct runs), then spills to host RAM/disk via the
    context SpillManager (reference: MemoryReservation back pressure driving
    ExternalSorter::spill, sorts/sort.rs:210)."""

    _seq = 0

    def __init__(self, ctx, consumer: str,
                 merge_fn: Optional[Callable[[List[DeviceRelation]], DeviceRelation]] = None,
                 merge_width: int = 8):
        self.ctx = ctx
        SpillableAccumulator._seq += 1
        self.consumer = f"{consumer}#{SpillableAccumulator._seq}"
        self.merge_fn = merge_fn
        self.merge_width = merge_width
        self.held: List[DeviceRelation] = []
        self.spilled: List = []
        # FairSpillPool divides its budget among registered spillable
        # consumers; other pools ignore the registration
        reg = getattr(ctx.memory_pool, "register", None)
        if reg is not None:
            reg(self.consumer, True)

    # -- accounting ------------------------------------------------------
    def _grow(self, nbytes: int):
        self.ctx.memory_pool.try_grow(self.consumer, nbytes)

    def _shrink(self, nbytes: int):
        self.ctx.memory_pool.shrink(self.consumer, nbytes)

    def add(self, rel: DeviceRelation):
        b = relation_bytes(rel)
        head = self.ctx.memory_pool.headroom_for(self.consumer)
        if head is not None and b > head:
            self._relieve(b)
        try:
            self._grow(b)
        except ResourceExhausted:
            self._relieve(b)
            self._grow(b)  # raises only if a single chunk exceeds the limit
        self.held.append(rel)
        if self.merge_fn is not None and len(self.held) >= self.merge_width:
            self._merge_held()

    def _merge_held(self):
        if self.merge_fn is None or len(self.held) <= 1:
            return
        old_bytes = sum(relation_bytes(r) for r in self.held)
        merged = self.merge_fn(self.held)
        self.held = [merged]
        self._shrink(old_bytes)
        self._grow(relation_bytes(merged))

    def _relieve(self, need: int):
        self._merge_held()
        pool = self.ctx.memory_pool
        while self.held:
            head = pool.headroom_for(self.consumer)
            if head is None or head >= need:
                return
            rel = self.held.pop(0)
            self.spilled.append(self.ctx.spill_manager.spill(rel))
            self._shrink(relation_bytes(rel))

    @property
    def spill_count(self) -> int:
        return len(self.spilled)

    # -- final fold ------------------------------------------------------
    def fold(self, merge_fn: Optional[Callable] = None) -> DeviceRelation:
        """Merge all runs (held + spilled) into one relation, restoring
        spilled runs in memory-bounded batches."""
        merge_fn = merge_fn or self.merge_fn
        if merge_fn is None:
            raise ExecutionError("fold requires a merge function")
        pool = self.ctx.memory_pool
        current: Optional[DeviceRelation] = None
        batch: List[DeviceRelation] = list(self.held)
        self.held = []

        def flush():
            nonlocal current, batch
            runs = ([current] if current is not None else []) + batch
            if not runs:
                return
            old_bytes = sum(relation_bytes(r) for r in runs)
            merged = merge_fn(runs) if len(runs) > 1 else runs[0]
            self._shrink(old_bytes)
            self._grow(relation_bytes(merged))
            current, batch = merged, []

        for s in self.spilled:
            b = s.nbytes
            head = pool.headroom_for(self.consumer)
            if batch and head is not None and head < b:
                flush()
            rel = s.restore(device=getattr(self.ctx, "device", None))
            self._grow(relation_bytes(rel))
            s.release()
            batch.append(rel)
            if len(batch) >= self.merge_width:
                flush()
        self.spilled = []
        flush()
        if current is None:
            raise ExecutionError("fold of empty accumulator")
        return current

    def release(self):
        """Drop all runs and return every byte attributed to this consumer to
        the pool (exception-safe: fold() failures leave runs in local
        variables, so the by-consumer total is the reliable record)."""
        pool = self.ctx.memory_pool
        self._shrink(pool.by_consumer.get(self.consumer, 0))
        self.held = []
        for s in self.spilled:
            s.release()
        self.spilled = []


# ---------------------------------------------------------------------------
# the chunked executor
# ---------------------------------------------------------------------------


def scan_unbounded(plan: P.PhysicalPlan) -> bool:
    """True when any scan in the tree reads an unbounded stream."""
    if isinstance(plan, P.ScanExec) and getattr(plan.provider, "unbounded", False):
        return True
    return any(scan_unbounded(c) for c in plan.children())


def plan_boundedness(plan: P.PhysicalPlan) -> bool:
    """Return True when the plan's OUTPUT is unbounded; raise PlanError when
    a pipeline-breaking operator consumes an unbounded input (the reference's
    Boundedness / EmissionType planning check, execution_plan.rs:1022,1067 +
    the CLI's unbounded guard, datafusion-cli exec.rs:274-281)."""
    from ..common.errors import PlanError
    from .window import WindowExec
    from .planner import AliasExec

    p = plan
    if isinstance(p, P.ScanExec):
        return bool(getattr(p.provider, "unbounded", False))
    if isinstance(p, (P.ValuesExec, P.EmptyExec)):
        return False
    if isinstance(p, (P.FilterExec, P.ProjectionExec, P.CompactExec,
                      P.UnnestExec, AliasExec)):
        return plan_boundedness(p.input)
    if isinstance(p, P.LimitExec):
        ub = plan_boundedness(p.input)
        return ub if p.fetch is None else False
    if isinstance(p, P.UnionExec):
        return any(plan_boundedness(c) for c in p.inputs)
    if isinstance(p, P.JoinExec):
        from . import fused as F

        swapped, jt, _ = F.join_normalize(p)
        lplan, rplan = (p.right, p.left) if swapped else (p.left, p.right)
        if plan_boundedness(rplan):
            if jt is JoinType.INNER:
                # symmetric incremental join handles stream x stream
                # (reference: SymmetricHashJoinExec,
                # joins/symmetric_hash_join.rs)
                plan_boundedness(lplan)
                return True
            raise PlanError(
                f"{type(p).__name__}: {jt.value} join build side is an "
                f"unbounded stream; bound it (e.g. with LIMIT) first")
        return plan_boundedness(lplan)
    # pipeline breakers: need the whole input before emitting anything
    breakers = (P.SortExec, P.AggregateExec, P.DistinctExec, WindowExec,
                P.RecursiveQueryExec)
    if isinstance(p, breakers):
        for c in p.children():
            if plan_boundedness(c):
                raise PlanError(
                    f"{type(p).__name__} cannot run over an unbounded "
                    f"stream (pipeline breaker); add a LIMIT below it or "
                    f"bound the source")
        return False
    return any(plan_boundedness(c) for c in p.children())


def estimate_scan_bytes(plan: P.PhysicalPlan) -> int:
    """Pre-execution estimate of total device bytes the plan's scans would
    materialize resident (drives the auto out-of-core decision)."""
    total = 0

    def visit(p):
        nonlocal total
        if isinstance(p, P.ScanExec):
            try:
                n = int(p.provider.statistics().num_rows)
            except Exception:
                n = 0
            width = 1 + sum(f.dtype.np_dtype().itemsize + 1 for f in p.schema.fields)
            total += bucket_capacity(max(n, 1)) * width
        for c in p.children():
            visit(c)

    visit(plan)
    return total


class ChunkedQuery:
    """Execute a physical plan over capacity-bounded scan chunks with
    spill-under-pressure. Mirrors FusedQuery's role for workloads that do not
    fit HBM; produces a host Table directly (results of out-of-core queries
    land on host anyway)."""

    def __init__(self, plan: P.PhysicalPlan, chunk_rows: int = 1 << 21):
        self.plan = plan
        self.chunk_rows = max(int(chunk_rows), bucket_capacity(1))
        self._fns: Dict[tuple, Callable] = {}
        self.spill_count = 0

    # -- public ----------------------------------------------------------
    def collect(self, ctx) -> Table:
        top = self.plan
        if isinstance(top, P.SortExec) and top.fetch is None:
            out = self._external_sort(top, ctx)
            if out is not None:
                return out
        if isinstance(top, P.DistinctExec):
            # a DISTINCT result larger than HBM budget finishes on host: the
            # per-chunk device dedupe bounds each run, one host sort-dedupe
            # merges them (result lands on host anyway)
            return self._host_distinct(top, ctx)
        tables = [to_host(rel) for rel in self._stream(top, ctx)]
        return concat_host(tables, top.schema)

    def _host_distinct(self, p: P.DistinctExec, ctx) -> Table:
        tables = []
        for chunk in self._stream(p.input, ctx):
            t = to_host(self._compact(p._fn(chunk), ctx))
            ctx.spill_manager.record_offload(
                sum(c.data.nbytes for c in t.columns))
            tables.append(t)
        big = concat_host(tables, p.schema)
        if big.num_rows == 0:
            return big
        # per-chunk DISTINCT emits keys ascending (ordering.py), so the
        # chunks are presorted runs: k-way merge instead of a re-sort
        keys = [(c.data, c.validity, False, False) for c in big.columns]
        order = merge_run_indices(pack_key_rows(keys),
                                  [t.num_rows for t in tables])
        srt = big.take(order)
        differs = np.zeros(srt.num_rows, dtype=bool)
        differs[0] = True
        for c in srt.columns:
            differs[1:] |= c.data[1:] != c.data[:-1]
            if c.validity is not None:
                differs[1:] |= c.validity[1:] != c.validity[:-1]
        return srt.take(np.nonzero(differs)[0])

    # -- jit caches ------------------------------------------------------
    def _jit(self, key: tuple, make: Callable[[], Callable]) -> Callable:
        fn = self._fns.get(key)
        if fn is None:
            fn = self._fns[key] = jax.jit(make())
        return fn

    def _compact(self, rel: DeviceRelation, ctx) -> DeviceRelation:
        """Gather live rows to the front and shrink capacity (host sync)."""
        live = int(jax.device_get(rel.num_rows()))
        cap = bucket_capacity(max(live, 1))
        if cap >= rel.capacity:
            return rel

        def make():
            def f(r):
                perm = K.compaction_order(r.sel)
                return jax.tree.map(lambda a: a[perm][:cap], r)

            return f

        return self._jit(("compact", rel.capacity, cap), make)(rel)

    # -- streaming -------------------------------------------------------
    def _stream(self, p: P.PhysicalPlan, ctx) -> Iterator[DeviceRelation]:
        if isinstance(p, P.ScanExec):
            for rel in p.provider.scan_chunks(ctx, filters=p.filters,
                                              projection=p.projection,
                                              chunk_rows=self.chunk_rows):
                ctx.check_cancelled()
                src = {f.name: c for f, c in zip(rel.schema.fields, rel.columns)}
                yield DeviceRelation(
                    p.schema, tuple(src[f.name] for f in p.schema.fields), rel.sel)
            return
        if isinstance(p, (P.ValuesExec, P.EmptyExec)):
            yield p.execute(ctx)
            return
        if isinstance(p, (P.FilterExec, P.ProjectionExec, P.UnnestExec)):
            for rel in self._stream(p.input, ctx):
                yield p._fn(rel)
            return
        if isinstance(p, P.CompactExec):  # chunks are already capacity-bounded
            yield from self._stream(p.input, ctx)
            return
        if isinstance(p, AliasExec):
            for rel in self._stream(p.input, ctx):
                yield DeviceRelation(p.schema, rel.columns, rel.sel)
            return
        if isinstance(p, P.LimitExec):
            yield from self._stream_limit(p, ctx)
            return
        if isinstance(p, P.SortExec):
            # chunk-concatenated inputs are never globally ordered: always
            # use the full sort regardless of the presorted marking
            if p.fetch is not None:
                yield from self._stream_topk(p, ctx)
            else:
                yield p._full_fn(self._materialize(p.input, ctx))
            return
        if isinstance(p, P.UnionExec):
            for c in p.inputs:
                for rel in self._stream(c, ctx):
                    yield P.concat_relations([rel], p.schema)
            return
        if isinstance(p, P.AggregateExec):
            yield from self._stream_aggregate(p, ctx)
            return
        if isinstance(p, P.DistinctExec):
            yield from self._stream_distinct(p, ctx)
            return
        if isinstance(p, P.JoinExec):
            yield from self._stream_join(p, ctx)
            return
        if isinstance(p, WindowExec):
            yield p._fn(self._materialize(p.input, ctx)) if hasattr(p, "_fn") \
                else p._transform(self._materialize(p.input, ctx))
            return
        # unknown operator: fall back to resident execution of the subtree
        yield p.execute(ctx)

    def _materialize(self, p: P.PhysicalPlan, ctx) -> DeviceRelation:
        """Stream a subtree and concatenate into one compacted relation
        (spilling intermediates under memory pressure)."""
        acc = SpillableAccumulator(ctx, f"materialize:{type(p).__name__}",
                                   merge_fn=lambda rels: self._concat_compact(rels, p.schema, ctx))
        n = 0
        for rel in self._stream(p, ctx):
            acc.add(self._compact(rel, ctx))
            n += 1
        if n == 0:
            return empty_relation(p.schema)
        out = acc.fold()
        self.spill_count += acc.spill_count
        return out

    def _concat_compact(self, rels: List[DeviceRelation], schema: Schema,
                        ctx) -> DeviceRelation:
        if len(rels) == 1:
            return rels[0]
        return self._compact(P.concat_relations(rels, schema), ctx)

    # -- limit -----------------------------------------------------------
    def _stream_limit(self, p: P.LimitExec, ctx) -> Iterator[DeviceRelation]:
        skip, fetch = p.skip, p.fetch
        seen = 0
        for chunk in self._stream(p.input, ctx):
            def make(skip=skip, fetch=fetch):
                def f(rel, seen):
                    rank = jnp.cumsum(rel.sel.astype(jnp.int64)) + seen
                    keep = rel.sel & (rank > skip)
                    if fetch is not None:
                        keep = keep & (rank <= skip + fetch)
                    return rel.with_sel(keep)

                return f

            fn = self._jit(("limit", id(p), chunk.capacity), make)
            out = fn(chunk, jnp.int64(seen))
            live = int(jax.device_get(chunk.num_rows()))
            yield out
            seen += live
            if fetch is not None and seen >= skip + fetch:
                return

    # -- topk ------------------------------------------------------------
    def _stream_topk(self, p: P.SortExec, ctx) -> Iterator[DeviceRelation]:
        capk = bucket_capacity(max(p.fetch, 1))
        state: Optional[DeviceRelation] = None
        for chunk in self._stream(p.input, ctx):
            def make_head():
                def f(rel):
                    s = p._transform_full(rel)  # sorted live-first, fetch-masked
                    return jax.tree.map(lambda a: a[:capk], s)

                return f

            head = self._jit(("topk-head", id(p), chunk.capacity), make_head)(chunk)
            if state is None:
                state = head
            else:
                def make_merge():
                    def f(a, b):
                        both = P.concat_relations([a, b], p.schema)
                        s = p._transform_full(both)
                        return jax.tree.map(lambda x: x[:capk], s)

                    return f

                state = self._jit(("topk-merge", id(p)), make_merge)(state, head)
        yield state if state is not None else empty_relation(p.schema)

    # -- join ------------------------------------------------------------
    def _stream_join(self, p: P.JoinExec, ctx) -> Iterator[DeviceRelation]:
        from . import fused as F

        swapped, jt, on = F.join_normalize(p)
        lplan, rplan = (p.right, p.left) if swapped else (p.left, p.right)
        if jt is JoinType.INNER and scan_unbounded(rplan):
            yield from self._symmetric_join(p, ctx, lplan, rplan)
            return
        if jt is JoinType.FULL:
            # FULL needs globally-unmatched build rows: materialize both sides
            lrel = self._materialize(lplan, ctx)
            rrel = self._materialize(rplan, ctx)
            yield p.execute_rels(ctx, lrel, rrel)
            return
        rrel = self._try_materialize(rplan, ctx)  # CollectLeft build side
        if rrel is None:
            # build side exceeds the budget: grace hash join -- partition
            # BOTH sides by key hash into host-resident buckets, join bucket
            # by bucket (reference: PartitionMode::Partitioned,
            # joins/hash_join/exec.rs; classic grace join)
            if on:
                yield from self._grace_join(p, ctx, lplan, rplan, on)
                return
            rrel = self._materialize(rplan, ctx)  # cross join: no keys; raise
        if (on and jt in (JoinType.INNER, JoinType.LEFT_SEMI)
                and ctx.opt("optimizer.dynamic_filter_pushdown", True)):
            lplan = self._probe_bounds_pushdown(on, lplan, rrel)
        for chunk in self._stream(lplan, ctx):
            yield p.execute_rels(ctx, chunk, rrel, allow_direct=False)

    def _probe_bounds_pushdown(self, on, lplan, rrel):
        """Dynamic filter pushdown: build-side min/max key bounds become
        probe-side predicates — BETWEEN filters on each streamed chunk plus
        pruning hints on the probe's ScanExec so parquet row groups outside
        the build key range are skipped entirely (reference:
        joins/hash_join/shared_bounds.rs + DynamicFilterPhysicalExpr,
        physical-expr/src/expressions/dynamic_filters/mod.rs)."""
        import jax.numpy as jnp

        from ..common import types as T
        from .expr_compiler import eval_expr

        preds = []       # qualified: exact per-chunk filter on probe schema
        bare_preds = []  # bare column names: ScanExec pruning hints
        for lk, rk in on:
            base = lk.expr if isinstance(lk, E.Alias) else lk
            if not isinstance(base, E.Column):
                continue
            try:
                col = eval_expr(rk, rrel)
            except Exception:
                continue
            if not col.dtype.is_integer or col.dictionary is not None:
                continue
            live = rrel.sel if col.validity is None else (rrel.sel & col.validity)
            data = col.data.astype(jnp.int64)
            info = np.iinfo(np.int64)
            lo = int(jax.device_get(jnp.min(jnp.where(live, data, info.max))))
            hi = int(jax.device_get(jnp.max(jnp.where(live, data, info.min))))
            if lo > hi:
                continue  # empty build side: leave the join to produce 0 rows
            between = E.Between(lk, E.lit(lo), E.lit(hi), False)
            preds.append(between)
            bare_preds.append(E.Between(E.Column(base.cname), E.lit(lo),
                                        E.lit(hi), False))
        if not preds:
            return lplan

        def add_hints(plan):
            if isinstance(plan, P.ScanExec):
                return P.ScanExec(plan.provider, plan.schema, plan.projection,
                                  plan.alias,
                                  plan.filters + tuple(bare_preds))
            if isinstance(plan, P.FilterExec):
                inner = add_hints(plan.input)
                return None if inner is None else P.FilterExec(inner, plan.predicate)
            if isinstance(plan, P.CompactExec):
                inner = add_hints(plan.input)
                return None if inner is None else P.CompactExec(inner)
            return None

        hinted = add_hints(lplan)
        out = hinted if hinted is not None else lplan
        from ..optimizer.decorrelate import conjoin

        return P.FilterExec(out, conjoin(preds))

    def _symmetric_join(self, p: P.JoinExec, ctx, lplan, rplan
                        ) -> Iterator[DeviceRelation]:
        """Symmetric incremental INNER join for stream x stream inputs
        (reference capability: SymmetricHashJoinExec,
        joins/symmetric_hash_join.rs): chunks are pulled from both sides
        alternately; each new chunk joins against every chunk accumulated
        from the OTHER side so far (including, for right chunks, the left
        chunks that arrived earlier this round), so every (Li, Rj) pair is
        joined exactly once — results stream out as soon as both halves of a
        match have arrived.  The reference additionally prunes accumulated
        state via range (interval) analysis; here both sides accumulate
        compacted device chunks for the life of the query."""
        lit = self._stream(lplan, ctx)
        rit = self._stream(rplan, ctx)
        acc_l: List[DeviceRelation] = []
        acc_r: List[DeviceRelation] = []
        l_done = r_done = False
        while not (l_done and r_done):
            ctx.check_cancelled()
            if not l_done:
                try:
                    lchunk = self._compact(next(lit), ctx)
                except StopIteration:
                    l_done = True
                else:
                    for rchunk in acc_r:
                        out = p.execute_rels(ctx, lchunk, rchunk,
                                          allow_direct=False)
                        yield out
                    acc_l.append(lchunk)
            if not r_done:
                try:
                    rchunk = self._compact(next(rit), ctx)
                except StopIteration:
                    r_done = True
                else:
                    for lchunk in acc_l:
                        yield p.execute_rels(ctx, lchunk, rchunk,
                                         allow_direct=False)
                    acc_r.append(rchunk)

    def _try_materialize(self, p: P.PhysicalPlan, ctx) -> Optional[DeviceRelation]:
        acc = SpillableAccumulator(ctx, f"materialize:{type(p).__name__}",
                                   merge_fn=lambda rels: self._concat_compact(rels, p.schema, ctx))
        try:
            n = 0
            for rel in self._stream(p, ctx):
                acc.add(self._compact(rel, ctx))
                n += 1
            if n == 0:
                return empty_relation(p.schema)
            out = acc.fold()
            self.spill_count += acc.spill_count
            return out
        except ResourceExhausted:
            acc.release()
            return None

    def _grace_partitions(self, ctx) -> int:
        head = ctx.memory_pool.headroom()
        if head is None or head <= 0:
            return 32
        # target: one build bucket ~ an eighth of the remaining budget
        est = max(self._grace_build_bytes, 1)
        parts = 8
        while parts < 256 and est // parts > max(head // 8, 1):
            parts *= 2
        return parts

    def _hash_bucket_fn(self, key_exprs: Tuple[E.Expr, ...], nparts: int):
        """Jitted per-row bucket ids from join-key VALUES (dictionary codes
        are remapped through a stable per-value hash so the two sides --
        which may carry different dictionaries -- bucket identically)."""
        import zlib

        def f(rel):
            hs = []
            for e in key_exprs:
                c = eval_expr(e, rel)
                data = c.data
                if c.dtype.is_string and c.dictionary is not None:
                    vals = c.dictionary.values
                    hv = np.array([zlib.crc32(str(v).encode()) for v in vals]
                                  or [0], dtype=np.int64)
                    data = jnp.asarray(hv)[jnp.clip(data, 0, len(hv) - 1)]
                elif jnp.issubdtype(data.dtype, jnp.floating):
                    data = data.astype(jnp.float64)
                elif data.dtype != jnp.bool_:
                    data = data.astype(jnp.int64)
                hs.append(data)
                hs.append(c.valid())
            h = K.hash64(hs)
            return (h & np.uint64(nparts - 1)).astype(jnp.int32)

        return jax.jit(f)

    def _partition_to_host(self, plan: P.PhysicalPlan,
                           key_exprs: Tuple[E.Expr, ...], nparts: int,
                           ctx) -> List[List[Table]]:
        parts: List[List[Table]] = [[] for _ in range(nparts)]
        fn = self._hash_bucket_fn(key_exprs, nparts)
        for chunk in self._stream(plan, ctx):
            bid = np.asarray(jax.device_get(fn(chunk)))
            sel = np.asarray(chunk.sel)
            t = to_host(chunk)  # compacts to live rows, aligned with bid[sel]
            live_bid = bid[sel]
            ctx.spill_manager.record_offload(sum(c.data.nbytes for c in t.columns))
            for b in np.unique(live_bid):
                parts[int(b)].append(t.take(np.nonzero(live_bid == b)[0]))
        return parts

    def _grace_join(self, p: P.JoinExec, ctx, lplan, rplan,
                    on) -> Iterator[DeviceRelation]:
        from ..data.device import to_device

        self._grace_build_bytes = estimate_scan_bytes(rplan)
        nparts = self._grace_partitions(ctx)
        probe_keys = tuple(l for l, _ in on)
        build_keys = tuple(r for _, r in on)
        bparts = self._partition_to_host(rplan, build_keys, nparts, ctx)
        lparts = self._partition_to_host(lplan, probe_keys, nparts, ctx)
        emitted = False
        for b in range(nparts):
            if not lparts[b]:
                continue  # inner/left flavors emit nothing without probe rows
            btab = concat_host(bparts[b], rplan.schema)
            brel = to_device(btab, device=getattr(ctx, "device", None))
            ptab = concat_host(lparts[b], lplan.schema)
            step = self.chunk_rows
            for start in range(0, max(ptab.num_rows, 1), step):
                prel = to_device(ptab, device=getattr(ctx, "device", None),
                                 row_range=(start, min(start + step, ptab.num_rows)))
                yield p.execute_rels(ctx, prel, brel, allow_direct=False)
                emitted = True
        if not emitted:
            yield empty_relation(p.schema)

    _grace_build_bytes = 0

    # -- distinct --------------------------------------------------------
    def _stream_distinct(self, p: P.DistinctExec, ctx) -> Iterator[DeviceRelation]:
        def merge(rels: List[DeviceRelation]) -> DeviceRelation:
            rel = P.concat_relations(rels, p.schema)
            return self._compact(p._fn(rel), ctx)

        acc = SpillableAccumulator(ctx, "distinct", merge_fn=merge)
        n = 0
        for chunk in self._stream(p.input, ctx):
            acc.add(self._compact(p._fn(chunk), ctx))
            n += 1
        if n == 0:
            yield empty_relation(p.schema)
            return
        out = acc.fold()
        self.spill_count += acc.spill_count
        yield out

    # -- aggregation -----------------------------------------------------
    def _stream_aggregate(self, p: P.AggregateExec, ctx) -> Iterator[DeviceRelation]:
        chunks = self._stream(p.input, ctx)
        first = next(chunks, None)
        if first is None:
            yield p.execute_rel(ctx, empty_relation(p.input.schema))
            return
        # static aggregate structure from one concrete chunk
        _, arg_cols, _, specs = p._prepare(first)
        decomp = AS.decomposable(specs)
        if not p.group_exprs:
            if decomp:
                yield self._agg_dense(p, ctx, first, chunks, sizes=(), ngroups=1)
            else:
                yield p.execute_rel(ctx, self._materialize_with_first(
                    p.input, ctx, first, chunks))
            return
        dense = p._dense_sizes(first)
        if dense is not None and decomp:
            yield self._agg_dense(p, ctx, first, chunks, *dense)
            return
        if decomp:
            yield self._agg_sorted(p, ctx, first, chunks)
            return
        # DISTINCT / order statistics: exact single-shot over the (spill-
        # accumulated) materialized input
        yield p.execute_rel(ctx, self._materialize_with_first(
            p.input, ctx, first, chunks))

    def _materialize_with_first(self, plan, ctx, first, rest) -> DeviceRelation:
        acc = SpillableAccumulator(
            ctx, "materialize:agg-input",
            merge_fn=lambda rels: self._concat_compact(rels, plan.schema, ctx))
        acc.add(self._compact(first, ctx))
        for rel in rest:
            acc.add(self._compact(rel, ctx))
        out = acc.fold()
        self.spill_count += acc.spill_count
        return out

    # dense small-domain keys (or global aggregation, ngroups == 1): partial
    # states live at fixed group slots; the cross-chunk merge is elementwise
    def _agg_dense(self, p: P.AggregateExec, ctx, first, rest, sizes,
                   ngroups: int) -> DeviceRelation:
        merge_kinds: List[str] = []

        def partial(rel):
            group_cols = [eval_expr(g, rel) for g in p.group_exprs]
            _, arg_cols, filter_cols, specs = p._prepare(rel)
            sp = AS.build_state_plan(specs, arg_cols)
            merge_kinds[:] = sp.merge_kinds
            if sizes:
                seg, _ = p.dense_seg(group_cols, rel.sel, sizes, ngroups)
            else:
                seg = jnp.zeros(rel.capacity, jnp.int32)
            group_count = K.segment_count(seg, rel.sel, ngroups)
            is_start = jnp.zeros(rel.capacity, dtype=bool)
            ones = jnp.ones(ngroups, dtype=bool)
            states = [
                G._reduce_one(spec, sp.state_args, filter_cols, rel.sel, seg,
                              is_start, None, ngroups, group_count, ones)
                for spec in sp.state_specs
            ]
            return tuple(states), group_count

        fn_key = ("agg-dense-partial", id(p), first.capacity)
        run_states = run_count = None
        state_meta: List[tuple] = []  # (dtype, dictionary) per state column
        for chunk in _chain(first, rest):
            states, count = self._jit(fn_key, lambda: partial)(chunk)
            datas = tuple(s.data for s in states)
            if run_states is None:
                state_meta = [(s.dtype, s.dictionary) for s in states]
                run_states, run_count = datas, count
            else:
                def make_merge(kinds=tuple(merge_kinds)):
                    def f(a, ac, b, bc):
                        out = []
                        for x, y, kind in zip(a, b, kinds):
                            xb = x.dtype == jnp.bool_
                            if xb:
                                x, y = x.astype(jnp.int32), y.astype(jnp.int32)
                            if kind == "sum":
                                m = x + y
                            elif kind == "min":
                                m = jnp.minimum(x, y)
                            else:
                                m = jnp.maximum(x, y)
                            out.append(m.astype(jnp.bool_) if xb else m)
                        return tuple(out), ac + bc

                    return f

                run_states, run_count = self._jit(
                    ("agg-dense-merge", id(p)), make_merge)(
                        run_states, run_count, datas, count)

        # finalize
        _, arg_cols, _, specs = p._prepare(first)
        sp = AS.build_state_plan(specs, arg_cols)
        group_cols = [eval_expr(g, first) for g in p.group_exprs]

        def make_final():
            def f(states, count):
                merged = [P.DeviceColumn(d, None, dt, dc)
                          for d, (dt, dc) in zip(states, state_meta)]
                if sizes:
                    out_sel = count > 0
                    strides = []
                    stride = 1
                    for size in reversed(list(sizes)):
                        strides.append(stride)
                        stride *= size
                    strides = list(reversed(strides))
                    out_keys = p.dense_keys(group_cols, sizes, strides, ngroups)
                else:
                    out_sel = jnp.ones(1, dtype=bool)  # global agg: one row
                    out_keys = []
                out_aggs = AS.finalize(sp, merged, out_sel)
                cols = [p._coerce_out(c, f_)
                        for c, f_ in zip(out_keys + out_aggs, p.schema.fields)]
                return DeviceRelation(p.schema, tuple(cols), out_sel)

            return f

        return self._jit(("agg-dense-final", id(p)), make_final)(
            run_states, run_count)

    # arbitrary keys: per-chunk sorted Partial states, spill-aware
    # accumulation, sorted Final merge (Partial -> Final on the time axis)
    def _agg_sorted(self, p: P.AggregateExec, ctx, first, rest) -> DeviceRelation:
        _, arg_cols0, _, specs0 = p._prepare(first)
        sp_static = AS.build_state_plan(specs0, arg_cols0)
        nkeys = len(p.group_exprs)
        key_fields = []
        gcols0 = [eval_expr(g, first) for g in p.group_exprs]
        for i, c in enumerate(gcols0):
            key_fields.append(Field(f"k{i}", c.dtype, nullable=True))
        state_fields = [Field(f"s{i}", s.out_dtype, nullable=True)
                        for i, s in enumerate(sp_static.merge_specs)]
        state_schema = Schema(key_fields + state_fields)

        def partial(rel):
            group_cols = [eval_expr(g, rel) for g in p.group_exprs]
            _, arg_cols, filter_cols, specs = p._prepare(rel)
            sp = AS.build_state_plan(specs, arg_cols)
            sg, sa, sf, ssel, seg, is_start, _, ng = G.phase_sort(
                group_cols, sp.state_args, filter_cols, rel.sel, None)
            out_keys, out_states, out_sel = G.phase_reduce(
                sg, sa, sf, ssel, seg, is_start, None, sp.state_specs,
                rel.capacity)
            return DeviceRelation(state_schema,
                                  tuple(out_keys) + tuple(out_states), out_sel)

        def merge(rels: List[DeviceRelation]) -> DeviceRelation:
            rel = P.concat_relations(rels, state_schema)
            keys = list(rel.columns[:nkeys])
            states = list(rel.columns[nkeys:])
            sg, sa, sf, ssel, seg, is_start, _, ng = G.phase_sort(
                keys, states, [], rel.sel, None)
            ng_host = int(jax.device_get(ng))
            cap = bucket_capacity(max(ng_host, 1))
            mkeys, mstates, msel = G.phase_reduce(
                sg, sa, sf, ssel, seg, is_start, None, sp_static.merge_specs,
                cap)
            return DeviceRelation(state_schema,
                                  tuple(mkeys) + tuple(mstates), msel)

        acc = SpillableAccumulator(ctx, "aggregate:partial", merge_fn=merge)
        fn_key = ("agg-sorted-partial", id(p), first.capacity)
        for chunk in _chain(first, rest):
            part = self._jit(fn_key, lambda: partial)(chunk)
            acc.add(self._compact(part, ctx))
        merged = acc.fold()
        self.spill_count += acc.spill_count

        def make_final():
            def f(rel):
                mkeys = list(rel.columns[:nkeys])
                mstates = list(rel.columns[nkeys:])
                out_aggs = AS.finalize(sp_static, mstates, rel.sel)
                cols = [p._coerce_out(c, f_)
                        for c, f_ in zip(mkeys + out_aggs, p.schema.fields)]
                return DeviceRelation(p.schema, tuple(cols), rel.sel)

            return f

        return self._jit(("agg-sorted-final", id(p), merged.capacity),
                         make_final)(merged)

    # -- external sort ---------------------------------------------------
    def _external_sort(self, p: P.SortExec, ctx) -> Optional[Table]:
        """ORDER BY at the top of the plan over plain columns: chunks stream
        to host (the spill tier) and ONE exact host lexsort orders them.
        Returns None if a sort key is a computed expression (the materialized
        device path handles those)."""
        schema = p.input.schema
        key_idx: List[int] = []
        for s in p.specs:
            e = s.expr
            if not isinstance(e, E.Column):
                return None
            idx = None
            for i, f in enumerate(schema.fields):
                if f.qualified_name == e.cname or f.name == e.cname:
                    idx = i
                    break
            if idx is None:
                return None
            key_idx.append(idx)
        # each chunk sorts ON DEVICE (the TPU does the O(n log n) compare
        # work at chip sort rates), then streams to host as a sorted run;
        # one O(n log r) vectorized k-way merge orders the runs — the
        # external-merge analog of the reference's streaming loser-tree
        # (sorts/merge.rs:54-97) instead of a full host re-sort.
        def make_chunk_sort():
            def f(rel):
                keys = []
                for s, i in zip(p.specs, key_idx):
                    c = rel.columns[i]
                    keys.append((c.data, c.validity, not s.asc,
                                 s.nulls_first))
                perm = K.sort_permutation(keys, rel.sel)
                arrays, slots = [rel.sel], [(-1, "sel")]
                for ci, c in enumerate(rel.columns):
                    arrays.append(c.data)
                    slots.append((ci, "data"))
                    if c.validity is not None:
                        arrays.append(c.validity)
                        slots.append((ci, "validity"))
                gathered = K.gather_rows(arrays, perm)
                parts = [{} for _ in rel.columns]
                sel = gathered[0]
                for (ci, attr), g in zip(slots[1:], gathered[1:]):
                    parts[ci][attr] = g
                cols = [DeviceColumn(q["data"], q.get("validity"), c.dtype,
                                     c.dictionary, c.bounds)
                        for c, q in zip(rel.columns, parts)]
                return DeviceRelation(rel.schema, tuple(cols), sel)

            return f

        tables = []
        for rel in self._stream(p.input, ctx):
            # list/meta columns need host materialization; the packed chunk
            # gather above only handles plain data+validity columns
            can_device_sort = all(c.lengths is None and c.meta is None
                                  and c.elem_valid is None
                                  for c in rel.columns)
            if can_device_sort:
                rel = self._jit(("extsort-chunk", id(p), rel.capacity),
                                make_chunk_sort)(rel)
            t = to_host(rel)
            if not can_device_sort:
                ks = [(t.columns[i].data, t.columns[i].validity, not s.asc,
                       s.nulls_first) for s, i in zip(p.specs, key_idx)]
                t = t.take(host_sort_indices(ks))
            ctx.spill_manager.record_offload(
                sum(c.data.nbytes for c in t.columns))
            tables.append(t)
        big = concat_host(tables, schema)
        keys = []
        for s, i in zip(p.specs, key_idx):
            c = big.columns[i]
            keys.append((c.data, c.validity, not s.asc, s.nulls_first))
        order = merge_run_indices(pack_key_rows(keys),
                                  [t.num_rows for t in tables])
        out = big.take(order)
        return Table(p.schema, out.columns)


def _chain(first, rest) -> Iterator[DeviceRelation]:
    yield first
    yield from rest
