"""Core vectorized kernel substrate (jnp/XLA; Pallas variants in ops/pallas_*).

TPU-first building blocks shared by the physical operators:

* `hash64`           -- seeded 64-bit column hashing (single engine-wide seed
                        family, like the reference's REPARTITION_RANDOM_STATE /
                        HASH_JOIN_SEED split, repartition/mod.rs:638,
                        hash_join/exec.rs:101).
* `sort_rows`        -- multi-key stable sort with ASC/DESC, NULLS FIRST/LAST
                        and dead-row (sel=False) sinking, built on the TPU
                        sort network via jax.lax.sort.
* `segments_from_sorted_keys` -- group boundary detection + dense segment ids,
                        the sorted-grouping analog of GroupValues::intern
                        (aggregates/group_values/mod.rs:90).
* segment reductions -- masked segment_sum/min/max over dense group ids: the
                        direct TPU port of the flat per-group state vectors of
                        GroupsAccumulator (expr-common/src/groups_accumulator.rs).
* `canonical_ids`    -- exact dense-id assignment for arbitrary composite keys
                        across two relations (replaces hash-table key interning
                        for the join path; collision-free by construction).

Everything is shape-static: relations are capacity-padded and carry selection
masks (see data/device.py).
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# hashing
# ---------------------------------------------------------------------------

_M1 = np.uint64(0xFF51AFD7ED558CCD)
_M2 = np.uint64(0xC4CEB9FE1A85EC53)


def _force_collisions() -> bool:
    """Hash-collision stress mode (reference: the force_hash_collisions
    workspace feature, exercised in extended CI): every hash64 returns a
    constant, so hash-partitioned exchanges route ALL rows to one shard and
    every collision-handling path must still be exact. Read at trace time;
    set the env var before building plans."""
    import os

    return os.environ.get("DATAFUSION_TPU_FORCE_HASH_COLLISIONS",
                          "") not in ("", "0", "false")


def _mix64(x: jax.Array) -> jax.Array:
    """splitmix64-style finalizer (uint64)."""
    x = x ^ (x >> 33)
    x = x * _M1
    x = x ^ (x >> 33)
    x = x * _M2
    x = x ^ (x >> 33)
    return x


def hash64(columns: Sequence[jax.Array], seed: int = 0) -> jax.Array:
    """Combine columns into a 64-bit hash per row. Columns may be any integer/
    float dtype; floats are bitcast. Shared by exchange partitioning and any
    hash-based operator so repartitioned data never needs rehashing."""
    assert columns, "hash64 needs at least one column"
    n = columns[0].shape[0]
    if _force_collisions():
        return jnp.zeros((n,), dtype=jnp.uint64)
    acc = jnp.full((n,), np.uint64(seed) ^ _M1, dtype=jnp.uint64)
    for c in columns:
        if jnp.issubdtype(c.dtype, jnp.floating):
            if c.dtype == jnp.float32:
                bits = jax.lax.bitcast_convert_type(c, jnp.uint32).astype(jnp.uint64)
            else:
                bits = jax.lax.bitcast_convert_type(c, jnp.uint64)
        elif c.dtype == jnp.bool_:
            bits = c.astype(jnp.uint64)
        else:
            bits = c.astype(jnp.uint64)
        acc = _mix64(acc ^ _mix64(bits))
    return acc


# ---------------------------------------------------------------------------
# sort
# ---------------------------------------------------------------------------


def _order_key(data: jax.Array, descending: bool) -> jax.Array:
    """Transform a column so ascending sort yields the requested order.
    Integer DESC uses bitwise-not (order-reversing, overflow-free); float DESC
    negates; bool DESC inverts."""
    if not descending:
        return data
    if data.dtype == jnp.bool_:
        return ~data
    if jnp.issubdtype(data.dtype, jnp.integer):
        return ~data
    return -data


def _packed_sort_key(keys, sel) -> Optional[jax.Array]:
    """Pack all sort keys (plus the liveness bit) into ONE int64 sort key
    when every key carries bounds metadata proving its bit-width, and the
    total fits 63 bits. Multi-operand lax.sort is the single most
    expensive TPU sort shape (TPC-H Q3's 3 gathered group keys = 7
    operands = ~190ms extra at SF1); a 2-operand (packed, iota) sort is
    the cheapest. keys: (data, validity, desc, nulls_first, bounds) where
    bounds cover the column's whole physical array (dead slots included)."""
    total = 1  # liveness bit
    fields = []
    for item in keys:
        if len(item) != 5 or item[4] is None:
            return None
        data, validity, desc, nulls_first, bounds = item
        if data.dtype == jnp.bool_:
            pass  # packs as a 0/1 field
        elif not jnp.issubdtype(data.dtype, jnp.integer) or data.ndim != 1:
            return None
        lo, hi = int(bounds[0]), int(bounds[1])
        if hi < lo:
            return None
        w = max(1, int(hi - lo).bit_length()) + (1 if validity is not None else 0)
        total += w
        fields.append((lo, hi, w))
    if total > 63:
        return None
    acc = (~sel).astype(jnp.int64)  # MSB field: live rows first
    for item, (lo, hi, w) in zip(keys, fields):
        data, validity, desc, nulls_first, _ = item
        v = data.astype(jnp.int64) - lo
        if desc:
            v = (hi - lo) - v
        if validity is not None:
            nb = (validity if nulls_first else ~validity).astype(jnp.int64)
            v = jnp.where(validity, v, 0) | (nb << (w - 1))
        acc = (acc << w) | v
    return acc


def sort_permutation(
    keys: Sequence[Tuple[jax.Array, Optional[jax.Array], bool, bool]],
    sel: jax.Array,
) -> jax.Array:
    """Stable multi-key sort permutation. Dead rows sink to the end.

    Only (keys, iota) go through the sort network; payloads are gathered by
    the returned permutation afterwards -- variadic many-operand sorts
    compile pathologically on TPU (observed 12-minute compiles), while
    sort + gather stays linear in payload count. Keys may carry a 5th
    element (bounds) enabling the single-packed-int64 fast path.
    """
    iota0 = jnp.arange(sel.shape[0], dtype=jnp.int32)
    packed = _packed_sort_key(keys, sel)
    if packed is not None:
        out = jax.lax.sort([packed, iota0], dimension=0, is_stable=True,
                           num_keys=1)
        return out[1]
    operands: List[jax.Array] = [~sel]  # live rows (False) first
    for data, validity, desc, nulls_first, *_ in keys:
        if validity is not None:
            # ascending bool sort puts False first: nulls_first wants null->False
            nkey = validity if nulls_first else ~validity
            operands.append(nkey)
            # neutralize null payloads so they tie deterministically
            data = jnp.where(validity, data, jnp.zeros_like(data))
        operands.append(_order_key(data, desc))
    nk = len(operands)
    iota = jnp.arange(sel.shape[0], dtype=jnp.int32)
    out = jax.lax.sort(operands + [iota], dimension=0, is_stable=True, num_keys=nk)
    return out[nk]


def packed_row_gather(parts: List[jax.Array], idx: jax.Array) -> jax.Array:
    """Row-gather of horizontally packed [N, w<=2] lane groups at idx,
    returning [n, sum(w)]. v5e-measured shape rules (8M-row probe):
      * [n, 2] gathers lower to a fast tiled path (~3.6 ns/row); a 1-D or
        [n, 1] gather costs ~2x that, so single lanes are duplicated;
      * [n, 3..4] outputs get a pathological minor-dim T(4,128) layout
        (observed 192 ms to WRITE one [8M,3] pack on TPC-H Q18): split
        into two [n, <=2] gathers instead;
      * at >=5 lanes the wide-gather cost plateaus and one gather wins.
    Lane groups are atomic (an i64 bitcast pair must stay adjacent)."""
    total = sum(p.shape[1] for p in parts)

    def one(chunk: List[jax.Array]) -> jax.Array:
        m = jnp.concatenate(chunk, axis=1) if len(chunk) > 1 else chunk[0]
        if m.shape[1] == 1:
            return jnp.concatenate([m, m], axis=1)[idx][:, :1]
        return m[idx]

    if total in (3, 4):
        chunks: List[List[jax.Array]] = []
        cur: List[jax.Array] = []
        curw = 0
        for p in parts:
            w = p.shape[1]
            if curw + w > 2:
                chunks.append(cur)
                cur, curw = [], 0
            cur.append(p)
            curw += w
        if cur:
            chunks.append(cur)
        return jnp.concatenate([one(c) for c in chunks], axis=1)
    return one(parts)


def gather_rows(arrays: Sequence[jax.Array], idx: jax.Array) -> List[jax.Array]:
    """Gather many same-length arrays at one index vector with ONE row
    gather: TPU random gathers cost ~10ns per ROW regardless of width, so
    1-D 4/8-byte arrays (bools included) bitcast into int32 lanes of a
    single packed matrix; 2-D arrays (list columns) gather individually."""
    lanes: List[jax.Array] = []
    plan: List[Tuple[int, object, int, int]] = []  # (slot, kind, off, width)
    f64_lanes: List[jax.Array] = []
    f64_plan: List[int] = []
    out: List[Optional[jax.Array]] = [None] * len(arrays)
    off = 0
    for i, a in enumerate(arrays):
        if a.ndim != 1:
            out[i] = a[idx]
            continue
        if a.dtype == jnp.bool_:
            lanes.append(a.astype(jnp.int32)[:, None])
            plan.append((i, jnp.bool_, off, 1))
            off += 1
        elif jnp.issubdtype(a.dtype, jnp.floating) and a.dtype.itemsize == 8:
            # f64 bitcasts are unlowerable on this compiler, but a
            # dtype-homogeneous [n, k] f64 matrix row-gather costs the same
            # ~10ns/row as one column: pack all f64 arrays into their own
            # lane matrix and gather it once alongside the int32 matrix
            f64_lanes.append(a)
            f64_plan.append(i)
        elif a.dtype.itemsize == 8:
            lanes.append(jax.lax.bitcast_convert_type(a, jnp.int32))
            plan.append((i, a.dtype, off, 2))
            off += 2
        elif a.dtype.itemsize == 4:
            lanes.append(jax.lax.bitcast_convert_type(a, jnp.int32)[:, None])
            plan.append((i, a.dtype, off, 1))
            off += 1
        else:
            out[i] = a[idx]
    if len(plan) == 1 and plan[0][3] == 1 and idx.shape[0] < (1 << 16):
        # small gathers: not worth the lane duplication
        i, kind, _, _ = plan[0]
        out[i] = arrays[i][idx]
    elif plan:
        g = packed_row_gather(lanes, idx)
        for i, kind, o, w in plan:
            if kind == jnp.bool_:
                out[i] = g[:, o] != 0
            elif w == 2:
                out[i] = jax.lax.bitcast_convert_type(g[:, o:o + 2],
                                                      arrays[i].dtype)
            else:
                out[i] = jax.lax.bitcast_convert_type(g[:, o],
                                                      arrays[i].dtype)
    if len(f64_plan) == 1:
        out[f64_plan[0]] = arrays[f64_plan[0]][idx]
    elif f64_plan:
        gf = jnp.stack(f64_lanes, axis=1)[idx]
        for k, i in enumerate(f64_plan):
            out[i] = gf[:, k]
    return list(out)


def sort_rows(
    keys: Sequence[Tuple[jax.Array, Optional[jax.Array], bool, bool]],
    payload: Sequence[jax.Array],
    sel: jax.Array,
) -> Tuple[List[jax.Array], jax.Array]:
    """Stable multi-key sort of payloads (ONE packed gather by the sort
    permutation -- see gather_rows).

    keys: list of (data, validity_or_None, descending, nulls_first).
    Returns (sorted payload arrays, sorted sel). Dead rows sink to the end.
    """
    perm = sort_permutation(keys, sel)
    gathered = gather_rows(list(payload) + [sel], perm)
    return gathered[:-1], gathered[-1]


def compaction_order(sel: jax.Array) -> jax.Array:
    """Stable permutation moving selected rows to the front."""
    n = sel.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    _, perm = jax.lax.sort([~sel, iota], dimension=0, is_stable=True, num_keys=1)
    return perm


def compaction_indices(sel: jax.Array, cap: int,
                       m: int = 1024) -> Tuple[jax.Array, jax.Array]:
    """(indices of the first `cap` selected rows ascending, live count).

    Blocked two-level compaction: a full-capacity stable sort costs
    ~1.7ns/row on TPU (13ms at 8M rows) while per-block 1024-wide
    single-key int32 sorts are ~20x cheaper and HBM-bandwidth bound.
    Per block: pack (unselected bit << 30 | local index) and sort, so
    selected locals land first in ascending order. Block offsets come from
    a cumsum of block counts; output slot j finds its owning block via a
    block-starts scatter + running max (cummax is one HLO; searchsorted
    lowers ~9ms slower at 128k probes). Entries past the live count point
    at unselected rows -- callers mask with `arange(cap) < total`."""
    # the packed key layout requires a power-of-two block (local index is
    # extracted with `& (m - 1)`) below the bit-30 unselected flag
    assert m & (m - 1) == 0 and 0 < m <= (1 << 30), m
    n = sel.shape[0]
    if n % m or n < 4 * m:
        perm = compaction_order(sel)
        return perm[:cap], jnp.sum(sel, dtype=jnp.int32)
    nb = n // m
    s2 = sel.reshape(nb, m)
    local = jnp.arange(m, dtype=jnp.int32)
    key = jnp.where(s2, 0, jnp.int32(1) << 30) | local[None, :]
    skey = jax.lax.sort(key, dimension=1)
    counts = jnp.sum(s2, axis=1, dtype=jnp.int32)
    offs = jnp.cumsum(counts) - counts
    total = offs[-1] + counts[-1]
    bid = jnp.arange(nb, dtype=jnp.int32)
    live_blk = (counts > 0) & (offs < cap)
    pos = jnp.where(live_blk, offs, cap)  # cap = out of bounds -> dropped
    owner = jnp.zeros(cap, dtype=jnp.int32)
    owner = owner.at[pos].max(jnp.where(live_blk, bid, 0), mode="drop")
    b = jax.lax.cummax(owner)
    j = jnp.arange(cap, dtype=jnp.int32)
    localpos = jnp.clip(j - offs[b], 0, m - 1)
    key_g = skey.reshape(-1)[b * m + localpos]
    idx = b * m + (key_g & (m - 1))
    return idx, total


# ---------------------------------------------------------------------------
# grouping
# ---------------------------------------------------------------------------


def segments_from_sorted_keys(
    sorted_keys: Sequence[jax.Array],
    sorted_validity: Sequence[Optional[jax.Array]],
    sorted_sel: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Given key columns already sorted (live rows first), return
    (segment_ids[int32], is_group_start[bool], num_groups[int32 scalar]).
    Dead rows get segment_id == capacity-1 clamped... they are masked out by
    callers via sorted_sel."""
    n = sorted_sel.shape[0]
    differs = jnp.zeros(n, dtype=bool)
    for k, v in zip(sorted_keys, sorted_validity):
        prev = jnp.concatenate([k[:1], k[:-1]])
        d = k != prev
        if v is not None:
            pv = jnp.concatenate([v[:1], v[:-1]])
            d = (d & v & pv) | (v != pv)
        differs = differs | d
    first = jnp.zeros(n, dtype=bool).at[0].set(True)
    is_start = sorted_sel & (first | differs)
    seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    seg = jnp.where(sorted_sel, seg, n - 1)  # park dead rows on last slot
    num_groups = jnp.sum(is_start.astype(jnp.int32))
    return seg.astype(jnp.int32), is_start, num_groups


def segment_sum(values: jax.Array, seg: jax.Array, mask: jax.Array, num_segments: int) -> jax.Array:
    z = jnp.where(mask, values, jnp.zeros_like(values))
    if num_segments == 1:
        # global aggregate: a plain reduction beats a 1-segment scatter
        return jnp.sum(z)[None]
    return jax.ops.segment_sum(z, seg, num_segments=num_segments)


def segment_count(seg: jax.Array, mask: jax.Array, num_segments: int) -> jax.Array:
    if num_segments == 1:
        return jnp.sum(mask.astype(jnp.int64))[None]
    return jax.ops.segment_sum(mask.astype(jnp.int64), seg, num_segments=num_segments)


def segment_min(values: jax.Array, seg: jax.Array, mask: jax.Array, num_segments: int) -> jax.Array:
    ident = _max_ident(values.dtype)
    z = jnp.where(mask, values, ident)
    if num_segments == 1:
        return jnp.min(z)[None]
    return jax.ops.segment_min(z, seg, num_segments=num_segments)


def segment_max(values: jax.Array, seg: jax.Array, mask: jax.Array, num_segments: int) -> jax.Array:
    ident = _min_ident(values.dtype)
    z = jnp.where(mask, values, ident)
    if num_segments == 1:
        return jnp.max(z)[None]
    return jax.ops.segment_max(z, seg, num_segments=num_segments)


def _max_ident(dtype):
    if dtype == jnp.bool_:
        return jnp.array(True)
    if jnp.issubdtype(dtype, jnp.integer):
        return jnp.array(jnp.iinfo(dtype).max, dtype)
    return jnp.array(jnp.inf, dtype)


def _min_ident(dtype):
    if dtype == jnp.bool_:
        return jnp.array(False)
    if jnp.issubdtype(dtype, jnp.integer):
        return jnp.array(jnp.iinfo(dtype).min, dtype)
    return jnp.array(-jnp.inf, dtype)


# ---------------------------------------------------------------------------
# key canonicalization (exact dense ids for composite / string keys)
# ---------------------------------------------------------------------------


def canonical_ids_two_sided(
    left_keys: Sequence[Tuple[jax.Array, Optional[jax.Array]]],
    right_keys: Sequence[Tuple[jax.Array, Optional[jax.Array]]],
    left_sel: jax.Array,
    right_sel: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Assign identical dense int32 ids to identical composite keys across two
    relations (exact -- no hash collisions).  SQL join semantics: rows with any
    NULL key never match; they are given unique negative-side ids by masking.

    Returns (left_ids, right_ids) with -1 for null-key/dead rows.
    """
    nl, nr = left_sel.shape[0], right_sel.shape[0]
    n = nl + nr

    def cat(i):
        lk, lv = left_keys[i]
        rk, rv = right_keys[i]
        rk = rk.astype(lk.dtype) if rk.dtype != lk.dtype else rk
        data = jnp.concatenate([lk, rk])
        if lv is None and rv is None:
            valid = None
        else:
            lvv = lv if lv is not None else jnp.ones(nl, dtype=bool)
            rvv = rv if rv is not None else jnp.ones(nr, dtype=bool)
            valid = jnp.concatenate([lvv, rvv])
        return data, valid

    cols = [cat(i) for i in range(len(left_keys))]
    joinable = jnp.concatenate([left_sel, right_sel])
    for _, valid in cols:
        if valid is not None:
            joinable = joinable & valid

    operands = []
    for data, _ in cols:
        operands.append(data)
    nk = len(operands)
    iota = jnp.arange(n, dtype=jnp.int32)
    srt = jax.lax.sort([~joinable] + operands + [joinable, iota],
                       dimension=0, is_stable=True, num_keys=nk + 1)
    sorted_keys = srt[1:1 + nk]
    sorted_joinable = srt[1 + nk]
    sorted_iota = srt[2 + nk]
    seg, _, _ = segments_from_sorted_keys(
        sorted_keys, [None] * nk, sorted_joinable
    )
    seg = jnp.where(sorted_joinable, seg, -1)
    ids = jnp.zeros(n, dtype=jnp.int32).at[sorted_iota].set(seg)
    return ids[:nl], ids[:nl + nr][nl:]


# ---------------------------------------------------------------------------
# searchsorted-based equi-join core
# ---------------------------------------------------------------------------


def pack_join_keys(
    keys: Sequence[Tuple[jax.Array, Optional[jax.Array]]],
    sel: jax.Array,
) -> Optional[Tuple[jax.Array, jax.Array]]:
    """Try to express composite integer keys as a single int64 id without any
    sorting (the fast path; reference analog: JoinHashMapU32 vs U64 key-width
    specialization, joins/join_hash_map.rs:144,224).

    Supported: one integer key of any width, or two 32-bit-safe integer keys
    packed as (a + 2^31) * 2^32 + (b + 2^31).  Returns (ids, live) or None.
    """
    live = sel
    for data, validity in keys:
        if data.dtype == jnp.bool_ or not jnp.issubdtype(data.dtype, jnp.integer):
            return None
        if validity is not None:
            live = live & validity
    if len(keys) == 1:
        return keys[0][0].astype(jnp.int64), live
    if len(keys) == 2 and all(k[0].dtype.itemsize <= 4 for k in keys):
        a = keys[0][0].astype(jnp.int64) + (1 << 31)
        b = keys[1][0].astype(jnp.int64) + (1 << 31)
        return a * (1 << 32) + b, live
    return None


def ranks_in_sorted(sorted_a: jax.Array, queries: jax.Array, side: str,
                    a_dead: Optional[jax.Array] = None,
                    q_dead: Optional[jax.Array] = None) -> jax.Array:
    """searchsorted(sorted_a, queries, side) computed via ONE merge sort pass.

    jnp.searchsorted lowers to a vmapped while-loop binary search whose
    per-iteration gathers are pathological on TPU at millions of queries
    (measured ~12 s where this formulation runs in ~10 ms): instead, tag and
    co-sort both arrays, take a prefix count of a-elements, and scatter the
    counts back to query order.

    a_dead/q_dead (optional bool masks) carry liveness as a leading sort key
    instead of in-band sentinel key values: dead elements order after every
    live element regardless of their key, so the full int64 key domain stays
    usable (a live key equal to INT64_MAX is NOT confused with a dead row).
    Dead a-elements are never counted into a live query's rank; ranks
    returned for dead queries are meaningless (callers mask them)."""
    na = sorted_a.shape[0]
    nq = queries.shape[0]
    keys = jnp.concatenate([sorted_a, queries.astype(sorted_a.dtype)])
    tq = 0 if side == "left" else 1
    tags = jnp.concatenate([
        jnp.full(na, 1 - tq, jnp.int32), jnp.full(nq, tq, jnp.int32)
    ])
    iota = jnp.arange(na + nq, dtype=jnp.int32)
    if a_dead is None and q_dead is None:
        _, _, perm = jax.lax.sort([keys, tags, iota], dimension=0,
                                  is_stable=True, num_keys=2)
    else:
        ad = a_dead if a_dead is not None else jnp.zeros(na, jnp.bool_)
        qd = q_dead if q_dead is not None else jnp.zeros(nq, jnp.bool_)
        dead = jnp.concatenate([ad, qd]).astype(jnp.int32)
        _, _, _, perm = jax.lax.sort([dead, keys, tags, iota], dimension=0,
                                     is_stable=True, num_keys=3)
    is_a = (perm < na).astype(jnp.int32)
    cum_a = jnp.cumsum(is_a) - is_a  # a-elements strictly before this slot
    # scatter back to query order; a-rows go out of range and are dropped
    qidx = jnp.where(perm >= na, perm - na, na + nq)
    return jnp.zeros(nq, jnp.int32).at[qidx].set(cum_a.astype(jnp.int32), mode="drop")


def join_match_counts_small(
    build_ids: jax.Array,
    build_live: jax.Array,
    probe_ids: jax.Array,
    probe_live: jax.Array,
    domain: int,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """join_match_counts for ids in a PROVEN dense domain [0, domain) with
    4*domain < 2^62 (from DeviceColumn.bounds / dictionary sizes).

    Liveness and the build/probe tie-break pack INTO the single int64 sort
    key (dead rows bias by +domain, the side tag is the low bit), so every
    sort is a 2-operand single-key (key, iota) sort — the cheapest shape the
    TPU sort network lowers to — instead of the generic path's 3-4-operand
    multi-key sorts. Same contract as join_match_counts. (Reference analog:
    JoinHashMapU32's narrow-key specialization, joins/join_hash_map.rs:144.)
    """
    D = jnp.int64(domain)
    nb = build_ids.shape[0]
    npr = probe_ids.shape[0]
    # ids on dead rows are padding garbage: clamp into-domain, then bias dead
    bid = jnp.clip(build_ids.astype(jnp.int64), 0, D - 1)
    pid = jnp.clip(probe_ids.astype(jnp.int64), 0, D - 1)
    bkey = bid + jnp.where(build_live, 0, D)
    qkey = pid + jnp.where(probe_live, 0, D)
    biota = jnp.arange(nb, dtype=jnp.int32)
    sbkey2, perm = jax.lax.sort([bkey, biota], dimension=0, is_stable=True,
                                num_keys=1)

    iota = jnp.arange(nb + npr, dtype=jnp.int32)

    def rank(q_tag: int) -> jax.Array:
        # q_tag=0: probes before equal builds -> #build < probe (lo)
        # q_tag=1: probes after  equal builds -> #build <= probe (hi)
        keys2 = jnp.concatenate([sbkey2 * 2 + (1 - q_tag),
                                 qkey * 2 + q_tag])
        _, perm2 = jax.lax.sort([keys2, iota], dimension=0, is_stable=True,
                                num_keys=1)
        is_b = (perm2 < nb).astype(jnp.int32)
        before_b = jnp.cumsum(is_b) - is_b
        qidx = jnp.where(perm2 >= nb, perm2 - nb, nb + npr)
        return jnp.zeros(npr, jnp.int32).at[qidx].set(
            before_b.astype(jnp.int32), mode="drop")

    lo = rank(0)
    hi = rank(1)
    cnt = jnp.where(probe_live, hi - lo, 0).astype(jnp.int32)
    total = jnp.sum(cnt.astype(jnp.int64))
    return perm, lo, cnt, total


def join_match_counts(
    build_ids: jax.Array,
    build_live: jax.Array,
    probe_ids: jax.Array,
    probe_live: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Phase 1 of the equi-join: sort build side by id, binary-search probes.

    ids are int64 spanning the FULL domain; dead/null rows are excluded via
    the live masks carried as leading sort keys (not in-band sentinels, which
    would silently drop matches for keys colliding with the sentinel value).
    Returns (sorted_build_perm, lo, cnt, total):
      sorted_build_perm: row index into build relation, sorted by id (dead last)
      lo[i]:   first position in sorted build matching probe row i
      cnt[i]:  number of matches for probe row i (0 for dead/null probes)
      total:   sum(cnt) (traced scalar)
    """
    nb = build_ids.shape[0]
    bdead = ~build_live
    iota = jnp.arange(nb, dtype=jnp.int32)
    sbdead, sbkey, perm = jax.lax.sort(
        [bdead.astype(jnp.int32), build_ids.astype(jnp.int64), iota],
        dimension=0, is_stable=True, num_keys=2)
    pdead = ~probe_live
    pid = probe_ids.astype(jnp.int64)
    lo = ranks_in_sorted(sbkey, pid, "left", a_dead=sbdead > 0, q_dead=pdead)
    hi = ranks_in_sorted(sbkey, pid, "right", a_dead=sbdead > 0, q_dead=pdead)
    cnt = jnp.where(probe_live, hi - lo, 0).astype(jnp.int32)
    total = jnp.sum(cnt.astype(jnp.int64))
    return perm, lo, cnt, total


def join_expand(
    perm: jax.Array,
    lo: jax.Array,
    cnt: jax.Array,
    out_capacity: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Phase 2: produce (probe_row, build_row, out_valid) for each output slot.

    Output slot j belongs to probe row p where offsets[p] <= j < offsets[p]+cnt[p];
    found via searchsorted over the exclusive prefix sum of counts.

    optimization_barrier calls keep the big-operand gathers out of enclosing
    fusions: XLA TPU otherwise lowers a fused gather over a multi-MB operand
    by re-streaming the whole operand per output tile (measured 138 GB of
    traffic for one TPC-H Q14-sized join; standalone gathers are fast).
    """
    offsets = jnp.cumsum(cnt.astype(jnp.int64)) - cnt.astype(jnp.int64)
    total = offsets[-1] + cnt[-1].astype(jnp.int64) if cnt.shape[0] else jnp.int64(0)
    j = jnp.arange(out_capacity, dtype=jnp.int64)
    probe_row = ranks_in_sorted(offsets, j, "right") - 1
    probe_row = jnp.clip(probe_row, 0, cnt.shape[0] - 1)
    match_idx = (j - offsets[probe_row]).astype(jnp.int32)
    out_valid = j < total
    pos = jnp.clip(lo[probe_row] + match_idx, 0, perm.shape[0] - 1)
    build_row = perm[jax.lax.optimization_barrier(pos)]
    return probe_row, build_row, out_valid
