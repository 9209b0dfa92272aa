"""Sort-based grouped aggregation.

TPU-native replacement for the reference's GroupedHashAggregateStream
(physical-plan/src/aggregates/grouped_hash_stream.rs) + GroupValues interning
(aggregates/group_values/): instead of a hash table, rows are sorted by the
group keys on the TPU sort network; dense segment ids then drive flat
per-group state vectors (the GroupsAccumulator contract,
expr-common/src/groups_accumulator.rs:126) via masked segment reductions.

Two phases with a host sync between them so the group-count capacity stays
static under jit:
  phase_sort   : sort rows by keys, compute segment ids + group count
  phase_reduce : segment reductions into a bucket_capacity(num_groups) output
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..common import types as T
from ..common.errors import PlanError
from ..data.device import DeviceColumn
from . import kernels as K


@dataclasses.dataclass
class AggSpec:
    fname: str  # count, count_star, sum, avg, min, max, var.., stddev.., first, last
    arg: Optional[int]  # index into agg arg column list (None for count(*))
    distinct: bool
    out_dtype: T.DataType
    arg_dtype: Optional[T.DataType] = None
    filter: Optional[int] = None  # index into filter mask list
    extra: Optional[float] = None  # percentile q etc.
    # agg(x ORDER BY y): index of the order expression in the arg column
    # list + direction (reference: params.order_by; single-key subset)
    order_arg: Optional[int] = None
    order_desc: bool = False
    # first_value(x IGNORE NULLS): skip null argument rows
    ignore_nulls: bool = False


_ORDER_SENSITIVE = frozenset({"median", "approx_median", "percentile_cont",
                              "approx_percentile_cont", "approx_distinct",
                              "array_agg", "string_agg"})

# aggregates the arithmetic dense-key path cannot evaluate (they need the
# sorted path's is_start/run structure)
DENSE_UNSUPPORTED = frozenset({"bit_and", "bit_or", "bit_xor", "nth_value"})


# aggregates whose result depends on the INPUT row order within each group:
# they must reduce over the keys-only (stable) sort, never a value-sorted
# bucket (reference: first/last/nth accumulators honor insertion order)
_INPUT_ORDER = frozenset({"first_value", "last_value", "any_value",
                          "nth_value"})


def order_arg_of(spec: "AggSpec"):
    """The argument this spec needs rows value-sorted by (DISTINCT aggs and
    order-statistic aggs share the mechanism), or None. An explicit
    agg(x ORDER BY y) returns a (arg_index, descending) tuple so ASC and
    DESC buckets stay distinct."""
    if spec.order_arg is not None:
        return (spec.order_arg, spec.order_desc)
    if spec.fname in _INPUT_ORDER:
        return None
    if (spec.distinct or spec.fname in _ORDER_SENSITIVE) and spec.arg is not None:
        return spec.arg
    return None


def order_arg_buckets(specs: Sequence["AggSpec"]) -> List[Optional[int]]:
    """Ordered unique order-arg requirements across specs. Multiple DISTINCT
    arguments each get their own sort pass; the group segmentation is
    identical across passes (determined by the group keys alone), so per-
    bucket reductions align index-for-index — the TPU answer to the
    reference's per-distinct-argument accumulator state
    (optimizer/src/single_distinct_to_groupby.rs generalized to N).

    When any spec needs INPUT order (first/last/nth_value) alongside value-
    sorted buckets, a keys-only None bucket leads so those specs never see a
    value-sorted row order."""
    buckets: List[Optional[int]] = []
    need_input_order = any(s.fname in _INPUT_ORDER and s.order_arg is None
                           for s in specs)
    for s in specs:
        b = order_arg_of(s)
        if b is not None and b not in buckets:
            buckets.append(b)
    if buckets and need_input_order:
        return [None] + buckets
    return buckets or [None]


def bucket_assignment(specs: Sequence["AggSpec"]) -> List[int]:
    """Per-spec index into order_arg_buckets(specs); order-insensitive
    aggregates ride bucket 0."""
    buckets = order_arg_buckets(specs)
    out = []
    for s in specs:
        b = order_arg_of(s)
        if b is not None:
            out.append(buckets.index(b))
        elif s.fname in _INPUT_ORDER and buckets[0] is not None:
            out.append(buckets.index(None))
        else:
            out.append(0)
    return out


def phase_sort(
    group_cols: Sequence[DeviceColumn],
    agg_args: Sequence[DeviceColumn],
    filters: Sequence[jax.Array],
    sel: jax.Array,
    distinct_arg: Optional[int],
):
    """Sort by group keys (plus the distinct argument, if any); return sorted
    state + segment structure + num_groups (traced)."""
    keys = [(c.data, c.validity, False, False, c.sort_bounds())
            for c in group_cols]
    order_desc = False
    if isinstance(distinct_arg, tuple):  # explicit agg(... ORDER BY y [DESC])
        distinct_arg, order_desc = distinct_arg
    if distinct_arg is not None:
        da = agg_args[distinct_arg]
        keys.append((da.data, da.validity, order_desc, order_desc,
                     da.sort_bounds()))

    payload: List[jax.Array] = []
    layout = []  # (kind, idx, has_validity, narrowed)

    def _add(kind, i, c):
        # i64 columns whose bounds prove an int32 range ride the permutation
        # gather as ONE int32 lane instead of two (gather traffic scales
        # with lane count at 8M rows), widened back after the sort
        narrow = (c.data.ndim == 1 and c.data.dtype == jnp.int64
                  and c.fits_i32())
        payload.append(c.data.astype(jnp.int32) if narrow else c.data)
        if c.validity is not None:
            payload.append(c.validity)
        layout.append((kind, i, c.validity is not None, narrow))

    for i, c in enumerate(group_cols):
        _add("g", i, c)
    for i, c in enumerate(agg_args):
        _add("a", i, c)
    for i, f in enumerate(filters):
        payload.append(f)
        layout.append(("f", i, False, False))

    sorted_payload, ssel = K.sort_rows(keys, payload, sel)

    # unpack
    sg: List[DeviceColumn] = []
    sa: List[DeviceColumn] = []
    sf: List[jax.Array] = []
    it = iter(sorted_payload)
    for kind, i, hasv, narrow in layout:
        data = next(it)
        if narrow:
            data = data.astype(jnp.int64)
        validity = next(it) if hasv else None
        if kind == "g":
            c = group_cols[i]
            # permutation gathers keep the value multiset: bounds carry over
            sg.append(DeviceColumn(data, validity, c.dtype, c.dictionary,
                                   bounds=c.bounds))
        elif kind == "a":
            c = agg_args[i]
            sa.append(DeviceColumn(data, validity, c.dtype, c.dictionary,
                                   bounds=c.bounds))
        else:
            sf.append(data)

    seg, is_start, num_groups = K.segments_from_sorted_keys(
        [c.data for c in sg], [c.validity for c in sg], ssel
    )

    # distinct-run starts: first row of each (group, distinct-value) run
    distinct_start = None
    if distinct_arg is not None:
        da = sa[distinct_arg]
        dseg, dstart, _ = K.segments_from_sorted_keys(
            [c.data for c in sg] + [da.data],
            [c.validity for c in sg] + [da.validity],
            ssel,
        )
        distinct_start = dstart

    return sg, sa, sf, ssel, seg, is_start, distinct_start, num_groups


def phase_sort_multi(group_cols, agg_args, filters, sel, specs):
    """One phase_sort per order-arg bucket (see order_arg_buckets)."""
    return tuple(phase_sort(group_cols, agg_args, filters, sel, b)
                 for b in order_arg_buckets(specs))


def phase_reduce_multi(states, specs, num_segments):
    """Reduce each spec against its bucket's sorted state; group key columns
    and out_sel come from bucket 0 (group order is identical across buckets
    since it is determined by the group keys alone)."""
    assign = bucket_assignment(specs)
    out_aggs: List[Optional[DeviceColumn]] = [None] * len(specs)
    out_keys = out_sel = None
    for bi in range(len(states)):
        idxs = [i for i, a in enumerate(assign) if a == bi]
        if not idxs and bi > 0:
            continue
        sg, sa, sf, ssel, seg, is_start, distinct_start, _ = states[bi]
        k, a, osel = phase_reduce(sg, sa, sf, ssel, seg, is_start,
                                  distinct_start, [specs[i] for i in idxs],
                                  num_segments)
        if bi == 0:
            out_keys, out_sel = k, osel
        for j, i in enumerate(idxs):
            out_aggs[i] = a[j]
    return out_keys, out_aggs, out_sel


def _cumsum_blocked(z: jax.Array) -> jax.Array:
    """Inclusive cumsum via a two-level block decomposition.

    XLA's 1-D cumulative-sum over emulated-64-bit element types (the 32-bit
    VPU has no native i64/f64) costs ~150 ms at 8M rows; reshaping to
    [B, K] makes the within-block scan a K-length cumsum vectorized over B
    sublanes and the cross-block carry a tiny B-length scan."""
    n = z.shape[0]
    K = 1024
    if n % K != 0 or n <= K or z.ndim != 1:
        return jnp.cumsum(z)
    z2 = z.reshape(n // K, K)
    within = jnp.cumsum(z2, axis=1)
    carry = jnp.concatenate(
        [jnp.zeros((1,), z.dtype), jnp.cumsum(within[:-1, -1])])
    return (within + carry[:, None]).reshape(n)


class SortedSegments:
    """Scatter-free reduction machinery for rows sorted by group key.

    TPU scatter is catastrophically slow at millions of rows (the
    jax.ops.segment_* lowering); for the sorted path every reduction can
    instead be a segmented prefix scan read at run boundaries:
      starts[g] / ends[g] = first/last row of group g, computed by ONE
      compaction sort shared by all aggregates."""

    def __init__(self, seg: jax.Array, ssel: jax.Array, is_start: jax.Array, G: int):
        n = seg.shape[0]
        self.n = n
        self.G = G
        self.seg = seg
        self.ssel = ssel
        self.is_start = is_start
        iota = jnp.arange(n, dtype=jnp.int32)
        _, sp = jax.lax.sort([~is_start, iota], dimension=0, is_stable=True, num_keys=1)
        if G > n:  # capacity exceeds row count: pad to G with sentinel starts
            sp = jnp.concatenate([sp, jnp.full((G - n,), n, jnp.int32)])
        self.starts = jnp.clip(sp[:G], 0, n - 1)   # row index of group g's first row
        # Live rows are a contiguous prefix (sort_rows sinks dead rows), so
        # group g ends where group g+1 starts: no second sort, and counts
        # are pure arithmetic (no emulated-i64 cumsum).
        ng = jnp.sum(is_start.astype(jnp.int32))
        live_rows = jnp.sum(ssel.astype(jnp.int32))
        gi = jnp.arange(G, dtype=jnp.int32)
        self.gi = gi
        self.ng = ng
        self.live = gi < ng
        spx = jnp.concatenate([sp, jnp.full((1,), n, jnp.int32)])
        nxt_start = spx[1:G + 1]
        ends = jnp.where(gi == ng - 1, live_rows - 1, nxt_start - 1)
        self.ends = jnp.clip(jnp.where(self.live, ends, 0), 0, n - 1)
        self.count_all = jnp.where(
            self.live, (self.ends - self.starts + 1).astype(jnp.int64), 0)

    def _sum(self, values: jax.Array, mask: jax.Array) -> jax.Array:
        # ONE G-sized gather per sum: gather the exclusive prefix at each
        # group start; group g's sum is S[g+1] - S[g] (S[ng] = grand total,
        # valid because mask ⊆ ssel and dead rows contribute zero). TPU
        # random gathers cost per row, so this halves the dominant cost vs
        # gathering at both starts and ends.
        z = jnp.where(mask, values, jnp.zeros_like(values))
        cs = _cumsum_blocked(z)
        S = (cs - z)[self.starts]
        nxt = jnp.concatenate([S[1:], jnp.zeros((1,), S.dtype)])
        hi = jnp.where(self.gi == self.ng - 1, cs[-1], nxt)
        return jnp.where(self.live, hi - S, 0)

    def sum(self, values, mask):
        return self._sum(values, mask)

    def count(self, mask):
        if mask is self.ssel:
            return self.count_all
        # counts fit int32 (capacity < 2^31): native cumsum, not emulated i64
        return self._sum(mask.astype(jnp.int32), mask).astype(jnp.int64)

    def _scan_extreme(self, values, mask, is_max: bool):
        ident = _ident_for(values.dtype, is_max)
        z = jnp.where(mask, values, ident)

        def comb(a, b):
            af, av = a
            bf, bv = b
            m = jnp.maximum(av, bv) if is_max else jnp.minimum(av, bv)
            return af | bf, jnp.where(bf, bv, m)

        _, out = jax.lax.associative_scan(comb, (self.is_start, z))
        return out[self.ends]

    def min(self, values, mask):
        return self._scan_extreme(values, mask, False)

    def max(self, values, mask):
        return self._scan_extreme(values, mask, True)


def _ident_for(dtype, is_max: bool):
    if dtype == jnp.bool_:
        return jnp.array(not is_max)
    if jnp.issubdtype(dtype, jnp.integer):
        info = jnp.iinfo(dtype)
        return jnp.array(info.min if is_max else info.max, dtype)
    return jnp.array(-jnp.inf if is_max else jnp.inf, dtype)


def phase_reduce(
    sg: Sequence[DeviceColumn],
    sa: Sequence[DeviceColumn],
    sf: Sequence[jax.Array],
    ssel: jax.Array,
    seg: jax.Array,
    is_start: jax.Array,
    distinct_start: Optional[jax.Array],
    specs: Sequence[AggSpec],
    num_segments: int,
) -> Tuple[List[DeviceColumn], List[DeviceColumn], jax.Array]:
    """Segment reductions. Returns (group key columns, agg result columns,
    out_sel) with capacity == num_segments."""
    G = num_segments
    n = ssel.shape[0]

    ss = SortedSegments(seg, ssel, is_start, G)
    first_idx = ss.starts
    group_count = ss.count_all
    out_sel = group_count > 0

    # one packed gather materializes every group-key column (+validity)
    gat_in: List[jax.Array] = []
    for c in sg:
        gat_in.append(c.data)
        if c.validity is not None:
            gat_in.append(c.validity)
    gat = iter(K.gather_rows(gat_in, first_idx))
    out_keys = []
    for c in sg:
        data = next(gat)
        validity = None if c.validity is None else (next(gat) & out_sel)
        # group keys are input values: input bounds stay valid, and they
        # keep direct-address joins against the aggregate output eligible
        # (TPC-H Q17's partkey join: 3 full-capacity sorts -> 1 gather)
        out_keys.append(DeviceColumn(data, validity, c.dtype, c.dictionary,
                                     bounds=c.bounds))

    out_aggs = []
    for spec in specs:
        out_aggs.append(
            _reduce_one(spec, sa, sf, ssel, seg, is_start, distinct_start, G,
                        group_count, out_sel, ss)
        )
    return out_keys, out_aggs, out_sel


def _distinct_marker(mask, distinct_start):
    """First FILTER-passing row of each (group, value) run.

    distinct_start marks the first row of each run irrespective of any FILTER
    clause; when a filter is present the run's first row may fail it while a
    later row of the same value passes, so the plain `mask & distinct_start`
    misses that value. Recompute via a segmented count of passing rows that
    resets at run starts: a row is the marker iff it passes and the inclusive
    within-run passing count is exactly 1."""
    n = mask.shape[0]
    m = mask.astype(jnp.int32)
    cs = jnp.cumsum(m)
    excl = cs - m
    iota = jnp.arange(n)
    last_start = jax.lax.cummax(jnp.where(distinct_start, iota, 0))
    within = cs - excl[jnp.clip(last_start, 0, n - 1)]
    return mask & (within == 1)


def _reduce_one(spec, sa, sf, ssel, seg, is_start, distinct_start, G, group_count,
                out_sel, ss=None):
    f = spec.fname
    mask = ssel
    filtered = spec.filter is not None
    if filtered:
        mask = mask & sf[spec.filter]
        if f in ("median", "approx_median", "percentile_cont",
                 "approx_percentile_cont"):
            # position-based indexing from the group start assumes passing
            # rows are contiguous, which a FILTER breaks
            raise PlanError(f"{f} with FILTER is not supported")

    def dmark():
        if distinct_start is None:
            return mask
        return _distinct_marker(mask, distinct_start) if filtered \
            else (mask & distinct_start)

    def SSUM(x, m):
        return ss.sum(x, m) if ss is not None else K.segment_sum(x, seg, m, G)

    def SCNT(m):
        return ss.count(m) if ss is not None else K.segment_count(seg, m, G)

    def SMIN(x, m):
        return ss.min(x, m) if ss is not None else K.segment_min(x, seg, m, G)

    def SMAX(x, m):
        return ss.max(x, m) if ss is not None else K.segment_max(x, seg, m, G)

    if f == "count_star":
        cnt = SCNT(mask)
        return DeviceColumn(cnt.astype(jnp.int64), None, T.INT64)

    arg = sa[spec.arg] if spec.arg is not None else None

    if f == "array_agg":
        # Rows of each group are contiguous (this spec's bucket sorted by
        # (group keys, arg); dead rows sink to the end), so the list is a
        # [G, W] strided gather from each group's start (reference:
        # ArrayAggAccumulator, functions-aggregate/src/array_agg.rs).
        # NULL elements are kept, matching the reference/Postgres.
        if spec.distinct or filtered:
            raise PlanError("array_agg with DISTINCT/FILTER is not supported")
        if spec.extra is None:
            raise PlanError("array_agg width not discovered")
        W = int(spec.extra)
        n = mask.shape[0]
        iota = jnp.arange(n, dtype=jnp.int64)
        starts = SMIN(jnp.where(mask, iota, jnp.int64(n)), mask)
        counts = SCNT(mask)
        j = jnp.arange(W, dtype=jnp.int64)[None, :]
        idx = jnp.clip(starts[:, None] + j, 0, n - 1)
        data = arg.data[idx]
        slot = j < counts[:, None]
        ev = slot & arg.validity[idx] if arg.validity is not None else slot
        return DeviceColumn(data, (counts > 0) & out_sel, spec.out_dtype,
                            arg.dictionary, None, counts.astype(jnp.int32), ev)

    if f == "string_agg":
        # values sorted within group (this spec's bucket), NULLs skipped and
        # sorted last so live values are contiguous from each group's start;
        # host-side join on download reads the ("string_agg", delim) meta
        # (reference: functions-aggregate/src/string_agg.rs)
        if spec.extra is None:
            raise PlanError("string_agg width not discovered")
        delim = spec.extra[0] if isinstance(spec.extra, tuple) else ","
        W = int(spec.extra[1]) if isinstance(spec.extra, tuple) else int(spec.extra)
        m = mask & arg.valid() if arg.validity is not None else mask
        if spec.distinct:
            m = _distinct_marker(m, distinct_start) if filtered \
                else (m & distinct_start)
        n = m.shape[0]
        iota = jnp.arange(n, dtype=jnp.int64)
        if spec.distinct or filtered:
            # passing rows are not contiguous: compact them first (stable
            # sort by !marker keeps (group, value) order)
            iota32 = jnp.arange(n, dtype=jnp.int32)
            _, perm = jax.lax.sort([(~m).astype(jnp.int32), iota32],
                                   dimension=0, is_stable=True, num_keys=1)
            cdata = arg.data[perm]
            counts = SCNT(m)
            excl = jnp.cumsum(counts) - counts  # group start in compacted order
            starts = excl
            src = cdata
        else:
            starts = SMIN(jnp.where(m, iota, jnp.int64(n)), m)
            counts = SCNT(m)
            src = arg.data
        j = jnp.arange(W, dtype=jnp.int64)[None, :]
        idx = jnp.clip(starts[:, None] + j, 0, n - 1)
        data = src[idx]
        slot = j < counts[:, None]
        return DeviceColumn(data, (counts > 0) & out_sel, spec.out_dtype,
                            arg.dictionary, None, counts.astype(jnp.int32),
                            slot, ("string_agg", delim))

    if arg is not None:
        mask = mask & arg.valid() if arg.validity is not None else mask

    if f == "count":
        if spec.distinct:
            cnt = SCNT(dmark())
        else:
            cnt = SCNT(mask)
        return DeviceColumn(cnt.astype(jnp.int64), None, T.INT64)

    if arg is None:
        raise PlanError(f"aggregate {f} requires an argument")
    data = arg.data
    if spec.distinct and f in ("sum", "avg"):
        mask = dmark()

    if f == "sum":
        acc = data
        if spec.out_dtype.is_float:
            acc = data.astype(jnp.float64)
        elif arg.dtype.is_decimal:
            acc = data  # int64 scaled
        elif jnp.issubdtype(data.dtype, jnp.integer):
            acc = data.astype(jnp.int64)  # widen before accumulation
        s = SSUM(acc, mask)
        cnt = SCNT(mask)
        if spec.out_dtype.is_decimal:
            s = s.astype(jnp.int64)
        elif spec.out_dtype.kind is T.TypeKind.INT64:
            s = s.astype(jnp.int64)
        else:
            s = s.astype(spec.out_dtype.np_dtype())
        return DeviceColumn(s, (cnt > 0) & out_sel, spec.out_dtype)

    if f in ("avg", "mean"):
        if arg.dtype.is_decimal and spec.out_dtype.is_decimal:
            # exact int64 scaled sum; one rounded division to the output
            # scale s+4 (reference: avg.rs decimal path)
            s = SSUM(data, mask).astype(jnp.float64)
            cnt = SCNT(mask)
            num = s * (10.0 ** (spec.out_dtype.scale - arg.dtype.scale))
            a = jnp.trunc(num / jnp.maximum(cnt, 1).astype(jnp.float64))
            return DeviceColumn(a.astype(jnp.int64), (cnt > 0) & out_sel,
                                spec.out_dtype)
        if arg.dtype.is_decimal:
            x = data.astype(jnp.float64) / (10.0 ** arg.dtype.scale)
        else:
            x = data.astype(jnp.float64)
        s = SSUM(x, mask)
        cnt = SCNT(mask)
        avg = s / jnp.maximum(cnt, 1).astype(jnp.float64)
        return DeviceColumn(avg, (cnt > 0) & out_sel, T.FLOAT64)

    if f in ("min", "max"):
        r = SMIN(data, mask) if f == "min" else SMAX(data, mask)
        cnt = SCNT(mask)
        r = jnp.clip(r, 0, None) if arg.dictionary is not None else r
        return DeviceColumn(r, (cnt > 0) & out_sel, spec.out_dtype, arg.dictionary)

    if f in ("var", "var_samp", "var_pop", "stddev", "stddev_samp", "stddev_pop"):
        x = data.astype(jnp.float64)
        if arg.dtype.is_decimal:
            x = x / (10.0 ** arg.dtype.scale)
        s = SSUM(x, mask)
        s2 = SSUM(x * x, mask)
        cnt = SCNT(mask).astype(jnp.float64)
        pop = f.endswith("_pop")
        denom = jnp.maximum(cnt if pop else cnt - 1.0, 1.0)
        var = (s2 - s * s / jnp.maximum(cnt, 1.0)) / denom
        var = jnp.maximum(var, 0.0)
        out = jnp.sqrt(var) if f.startswith("stddev") else var
        min_n = 1.0 if pop else 2.0
        return DeviceColumn(out, (cnt >= min_n) & out_sel, T.FLOAT64)

    if f in ("first_value", "last_value", "any_value"):
        n = ssel.shape[0]
        iota = jnp.arange(n, dtype=jnp.int32)
        if spec.ignore_nulls and arg.validity is not None:
            # IGNORE NULLS: the first/last NON-NULL argument in order
            mask = mask & arg.valid()
        if f == "last_value":
            idx = K.segment_max(iota, seg, mask, G)
        else:
            idx = K.segment_min(iota, seg, mask, G)
        cnt = K.segment_count(seg, mask, G)
        idx = jnp.clip(idx, 0, n - 1)
        validity = (cnt > 0) & out_sel
        if arg.validity is not None:
            validity = validity & arg.validity[idx]
        return DeviceColumn(arg.data[idx], validity, spec.out_dtype, arg.dictionary)

    if f in ("bool_and", "bool_or"):
        red = K.segment_min if f == "bool_and" else K.segment_max
        r = red(data, seg, mask, G)
        cnt = K.segment_count(seg, mask, G)
        return DeviceColumn(r.astype(jnp.bool_), (cnt > 0) & out_sel, T.BOOL)

    if f in ("bit_and", "bit_or", "bit_xor"):
        # segmented associative scan with identity-masked dead rows
        # (reference: functions-aggregate/src/bit_and_or_xor.rs)
        if spec.distinct and f != "bit_xor":
            mask = mask  # and/or are idempotent; DISTINCT is a no-op
        elif spec.distinct:
            mask = dmark()
        x = data.astype(jnp.int64)
        if f == "bit_and":
            ident, op = jnp.int64(-1), jnp.bitwise_and
        elif f == "bit_or":
            ident, op = jnp.int64(0), jnp.bitwise_or
        else:
            ident, op = jnp.int64(0), jnp.bitwise_xor
        z = jnp.where(mask, x, ident)

        def comb(a, b):
            af, av = a
            bf, bv = b
            return af | bf, jnp.where(bf, bv, op(av, bv))

        _, scanned = jax.lax.associative_scan(comb, (is_start, z))
        if ss is not None:
            ends = ss.ends
        elif G == 1:
            ends = jnp.array([x.shape[0] - 1], dtype=jnp.int32)
        else:
            raise PlanError(f"{f} requires the sorted aggregation path")
        cnt = SCNT(mask)
        r = scanned[ends].astype(spec.out_dtype.np_dtype())
        return DeviceColumn(r, (cnt > 0) & out_sel, spec.out_dtype)

    if f == "nth_value":
        # n-th FILTER/validity-passing row of the group in input order
        # (reference: functions-aggregate/src/nth_value.rs); n is 1-based,
        # negative n counts from the end
        n_ = int(spec.extra) if spec.extra is not None else 1
        nrows = ssel.shape[0]
        m = mask.astype(jnp.int64)
        cs = jnp.cumsum(m)
        iota32 = jnp.arange(nrows, dtype=jnp.int32)
        start_of = jax.lax.cummax(jnp.where(is_start, iota32, 0))
        excl = cs - m
        within = cs - excl[jnp.clip(start_of, 0, nrows - 1)]
        cnt = SCNT(mask)
        if n_ >= 0:
            want = jnp.int64(n_)
        else:
            want = jnp.maximum(cnt + jnp.int64(n_) + 1, jnp.int64(0))[
                jnp.clip(seg, 0, G - 1)]
        marker = mask & (within == want)
        idx = K.segment_max(jnp.where(marker, iota32, -1), seg, marker, G)
        have = (cnt >= jnp.abs(jnp.int64(n_))) & (n_ != 0) & out_sel
        idx = jnp.clip(idx, 0, nrows - 1)
        validity = have
        if arg.validity is not None:
            validity = validity & arg.validity[idx]
        return DeviceColumn(arg.data[idx], validity, spec.out_dtype,
                            arg.dictionary)

    if f in ("median", "approx_median", "percentile_cont", "approx_percentile_cont"):
        # rows are sorted by (group keys, value) -- see order_arg_of/phase_sort
        n = ssel.shape[0]
        iota = jnp.arange(n, dtype=jnp.int32)
        first = ss.starts if ss is not None else K.segment_min(iota, seg, mask, G)
        cnt = SCNT(mask)
        q = 0.5 if spec.extra is None else float(spec.extra)
        pos = q * jnp.maximum(cnt - 1, 0).astype(jnp.float64)
        lo_i = jnp.clip(first + jnp.floor(pos).astype(jnp.int64).astype(jnp.int32), 0, n - 1)
        hi_i = jnp.clip(first + jnp.ceil(pos).astype(jnp.int64).astype(jnp.int32), 0, n - 1)
        frac = pos - jnp.floor(pos)
        x = data.astype(jnp.float64)
        if arg.dtype.is_decimal and spec.out_dtype.is_decimal:
            # median/approx_median of decimals keeps the input type
            # (reference: median.rs): interpolate on raw scaled ints, round
            v = x[lo_i] * (1.0 - frac) + x[hi_i] * frac
            return DeviceColumn(jnp.trunc(v).astype(jnp.int64),
                                (cnt > 0) & out_sel, spec.out_dtype)
        if arg.dtype.is_decimal:
            x = x / (10.0 ** arg.dtype.scale)
        v = x[lo_i] * (1.0 - frac) + x[hi_i] * frac
        return DeviceColumn(v, (cnt > 0) & out_sel, T.FLOAT64)

    if f.startswith("regr_"):
        # linear-regression aggregates over (y, x) pairs with both non-null
        # (reference: functions-aggregate/src/regr.rs)
        y = sa[spec.arg]       # first argument is the dependent variable
        x = sa[spec.arg + 1]
        m = mask
        if x.validity is not None:
            m = m & x.validity
        yv = y.data.astype(jnp.float64)
        xv = x.data.astype(jnp.float64)
        if y.dtype.is_decimal:
            yv = yv / (10.0 ** y.dtype.scale)
        if x.dtype.is_decimal:
            xv = xv / (10.0 ** x.dtype.scale)
        sx = K.segment_sum(xv, seg, m, G)
        sy = K.segment_sum(yv, seg, m, G)
        sxy = K.segment_sum(xv * yv, seg, m, G)
        sxx = K.segment_sum(xv * xv, seg, m, G)
        syy = K.segment_sum(yv * yv, seg, m, G)
        cnt = K.segment_count(seg, m, G).astype(jnp.float64)
        if f == "regr_count":
            return DeviceColumn(cnt.astype(jnp.int64), None, T.INT64)
        cn = jnp.maximum(cnt, 1.0)
        Sxx = sxx - sx * sx / cn
        Syy = syy - sy * sy / cn
        Sxy = sxy - sx * sy / cn
        nonempty = (cnt >= 1) & out_sel
        if f == "regr_avgx":
            return DeviceColumn(sx / cn, nonempty, T.FLOAT64)
        if f == "regr_avgy":
            return DeviceColumn(sy / cn, nonempty, T.FLOAT64)
        if f == "regr_sxx":
            return DeviceColumn(Sxx, nonempty, T.FLOAT64)
        if f == "regr_syy":
            return DeviceColumn(Syy, nonempty, T.FLOAT64)
        if f == "regr_sxy":
            return DeviceColumn(Sxy, nonempty, T.FLOAT64)
        ok = nonempty & (Sxx > 0)
        slope = Sxy / jnp.where(Sxx > 0, Sxx, 1.0)
        if f == "regr_slope":
            return DeviceColumn(slope, ok, T.FLOAT64)
        if f == "regr_intercept":
            return DeviceColumn(sy / cn - slope * sx / cn, ok, T.FLOAT64)
        if f == "regr_r2":
            r2 = jnp.where(Syy > 0,
                           (Sxy * Sxy) / jnp.where((Sxx > 0) & (Syy > 0),
                                                   Sxx * Syy, 1.0),
                           1.0)
            return DeviceColumn(r2, ok, T.FLOAT64)
        raise PlanError(f"unknown regression aggregate {f!r}")

    if f in ("corr", "covar", "covar_pop", "covar_samp"):
        # second argument travels in the filter slot's sibling: specs carry
        # arg as index of x; y is the NEXT arg column by convention (see
        # AggregateExec._prepare which appends y right after x)
        y = sa[spec.arg + 1]
        ymask = mask if y.validity is None else (mask & y.validity)
        xv = data.astype(jnp.float64)
        yv = y.data.astype(jnp.float64)
        if arg.dtype.is_decimal:
            xv = xv / (10.0 ** arg.dtype.scale)
        if y.dtype.is_decimal:
            yv = yv / (10.0 ** y.dtype.scale)
        m = ymask
        sx = K.segment_sum(xv, seg, m, G)
        sy = K.segment_sum(yv, seg, m, G)
        sxy = K.segment_sum(xv * yv, seg, m, G)
        sxx = K.segment_sum(xv * xv, seg, m, G)
        syy = K.segment_sum(yv * yv, seg, m, G)
        cnt = K.segment_count(seg, m, G).astype(jnp.float64)
        cn = jnp.maximum(cnt, 1.0)
        cov = (sxy - sx * sy / cn)
        if f == "corr":
            vx = sxx - sx * sx / cn
            vy = syy - sy * sy / cn
            denom = jnp.sqrt(jnp.maximum(vx * vy, 0.0))
            out = jnp.where(denom > 0, cov / denom, jnp.nan)
            return DeviceColumn(out, (cnt >= 2) & out_sel, T.FLOAT64)
        denom = cn if f == "covar_pop" else jnp.maximum(cnt - 1.0, 1.0)
        min_n = 1.0 if f == "covar_pop" else 2.0
        return DeviceColumn(cov / denom, (cnt >= min_n) & out_sel, T.FLOAT64)

    if f == "approx_distinct":
        # exact distinct count (sorted-run method); named for API parity with
        # the reference's HyperLogLog accumulator
        cnt = K.segment_count(seg, dmark(), G)
        return DeviceColumn(cnt.astype(jnp.int64), None, T.INT64)

    from ..expr.udf import active_registry, segmented_monoid_reduce, udf_input_array

    udaf = active_registry().aggregate(f)
    if udaf is not None:
        if spec.distinct:
            mask = dmark()
        x = udf_input_array(arg)
        if ss is not None:
            ends = ss.ends
        elif G == 1:
            # global aggregate: one segment, masked rows carry the identity,
            # so the scan value at the last slot is the full reduction
            ends = jnp.array([x.shape[0] - 1], dtype=jnp.int32)
        else:
            raise PlanError(f"UDAF {f!r} requires the sorted aggregation path")
        vals = segmented_monoid_reduce(udaf, x, mask, is_start, ends)
        cnt = SCNT(mask)
        validity = ((cnt > 0) & out_sel) if udaf.nullable else None
        if udaf.return_type.is_decimal:
            vals = jnp.round(
                vals * (10.0 ** udaf.return_type.scale)).astype(jnp.int64)
        else:
            vals = vals.astype(udaf.return_type.np_dtype())
        return DeviceColumn(vals, validity, udaf.return_type)

    raise PlanError(f"aggregate function {f!r} not implemented")


def global_aggregate(
    agg_args: Sequence[DeviceColumn],
    filters: Sequence[jax.Array],
    sel: jax.Array,
    specs: Sequence[AggSpec],
    out_capacity: int,
) -> Tuple[List[DeviceColumn], jax.Array]:
    """No GROUP BY: reduce whole relation to one row (padded to out_capacity).
    Implemented as a single-segment reduction so it shares _reduce_one; each
    order-arg bucket (DISTINCT / order-statistic argument) gets its own value
    sort, like the grouped multi-bucket path."""
    n = sel.shape[0]
    one = jnp.ones(1, dtype=bool)
    assign = bucket_assignment(specs)
    outs: List[Optional[DeviceColumn]] = [None] * len(specs)
    for bi, b in enumerate(order_arg_buckets(specs)):
        idxs = [i for i, a in enumerate(assign) if a == bi]
        if not idxs:
            continue
        if b is not None:
            _, sa, sf, ssel, seg, is_start, distinct_start, _ = phase_sort(
                [], agg_args, filters, sel, b
            )
        else:
            sa, sf, ssel = agg_args, filters, sel
            seg = jnp.zeros(n, dtype=jnp.int32)
            is_start = jnp.zeros(n, dtype=bool).at[0].set(True)
            distinct_start = None
        group_count = K.segment_count(seg, ssel, 1)
        for i in idxs:
            c = _reduce_one(specs[i], sa, sf, ssel, seg, is_start,
                            distinct_start, 1, group_count, one)
            # pad to out_capacity
            if c.data.ndim == 2:  # array_agg: [1, W] list row
                data = jnp.zeros((out_capacity, c.data.shape[1]),
                                 c.data.dtype).at[0].set(c.data[0])
                lengths = jnp.zeros(out_capacity, jnp.int32).at[0].set(
                    c.list_lengths()[0])
                ev = jnp.zeros((out_capacity, c.data.shape[1]),
                               jnp.bool_).at[0].set(c.elem_valid[0])
            else:
                data = jnp.zeros(out_capacity, c.data.dtype).at[0].set(c.data[0])
                lengths = ev = None
            validity = None
            if c.validity is not None:
                validity = jnp.zeros(out_capacity, jnp.bool_).at[0].set(c.validity[0])
            outs[i] = DeviceColumn(data, validity, c.dtype, c.dictionary,
                                   None, lengths, ev, c.meta)
    out_sel = jnp.zeros(out_capacity, dtype=jnp.bool_).at[0].set(True)
    return outs, out_sel
