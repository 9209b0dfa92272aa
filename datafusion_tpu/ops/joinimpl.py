"""Equi-join over device relations (all join types + residual filters).

TPU-native replacement for the reference's HashJoinExec
(physical-plan/src/joins/hash_join/exec.rs): instead of a chained hash map
(JoinHashMapU32/U64, joins/join_hash_map.rs) probed row-by-row, keys from both
sides are canonicalized to exact dense ids (ops/kernels.canonical_ids_two_sided
-- collision-free, unlike hashing), the build side is sorted by id, and every
probe row binary-searches its match run; expansion to the (probe,build) output
pairs is a pure gather computed from the prefix-sum of match counts.

Two jit phases with one host sync for the output capacity:
  phase 1: ids + match counts + total               (shapes: inputs only)
  phase 2: expansion + column gathers               (shape: output capacity)

Outer-join semantics follow the reference: matched rows first, then
null-extended unmatched probe rows (LEFT/FULL) and unmatched build rows (FULL)
as separate capacity blocks; a residual filter unmatches rows whose every
match fails it (joins/hash_join/stream.rs ProcessProbeBatch + outer emission).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..common import types as T
from ..data.device import DeviceColumn, DeviceRelation
from . import kernels as K


def join_phase1(
    left_keys: Sequence[DeviceColumn],
    right_keys: Sequence[DeviceColumn],
    left_sel: jax.Array,
    right_sel: jax.Array,
):
    """probe = left, build = right.

    Fast path: integer keys (incl. dictionary codes and <=2 packed 32-bit
    keys) join on raw values -- one build-side sort total.  Fallback:
    exact dense-id canonicalization for arbitrary composite keys."""
    bounded = _bounded_ids(left_keys, right_keys, left_sel, right_sel)
    if bounded is not None:
        lids, l_live, rids, r_live, domain = bounded
        return K.join_match_counts_small(rids, r_live, lids, l_live, domain)
    lpairs = [(c.data, c.validity) for c in left_keys]
    rpairs = [(c.data, c.validity) for c in right_keys]
    lpacked = K.pack_join_keys(lpairs, left_sel)
    rpacked = K.pack_join_keys(rpairs, right_sel)
    if lpacked is not None and rpacked is not None:
        lids, l_live = lpacked
        rids, r_live = rpacked
    else:
        lids, rids = K.canonical_ids_two_sided(lpairs, rpairs, left_sel, right_sel)
        l_live = left_sel & (lids >= 0)
        r_live = right_sel & (rids >= 0)
        lids = lids.astype(jnp.int64)
        rids = rids.astype(jnp.int64)
    perm, lo, cnt, total = K.join_match_counts(rids, r_live, lids, l_live)
    return perm, lo, cnt, total


def direct_domain(left_keys, right_keys, limit: int) -> Optional[Tuple]:
    """Spans/domain for the direct-address join table when the composite key
    domain is proven dense and small enough (DeviceColumn.bounds /
    dictionary sizes). Works on eval_shape abstract columns (bounds and
    dictionaries are static metadata)."""
    spans = []
    domain = 1
    for lc, rc in zip(left_keys, right_keys):
        lb, rb = _key_bounds(lc), _key_bounds(rc)
        if lb is None or rb is None:
            return None
        lo = min(lb[0], rb[0])
        hi = max(lb[1], rb[1])
        span = hi - lo + 1
        if span <= 0:
            return None
        spans.append((lo, span))
        domain *= span
        if domain > limit:
            return None
    return tuple(spans), domain


def _make_ids(keys, sel, spans):
    ids = None
    live = sel
    for c, (lo, span) in zip(keys, spans):
        if c.validity is not None:
            live = live & c.validity
        v = c.data.astype(jnp.int64) - lo
        ids = v if ids is None else ids * span + v
    return ids, live


def _build_lane_plan(cols: Sequence[DeviceColumn]):
    """Lane layout for packing columns into an int32 matrix: returns
    (layout, parts, rest) where rest holds indices of columns that cannot
    pack (nested 2-D data). layout entries: (col_index, col, lane_off,
    data_lanes, has_validity_lane)."""
    parts: List[jax.Array] = []
    layout: List[Tuple[int, DeviceColumn, int, int, bool]] = []
    rest: List[int] = []
    off = 0
    for i, c in enumerate(cols):
        if _packable(c):
            lanes = _pack_lanes(c.data)
            parts.append(lanes)
            w = lanes.shape[1]
            has_v = c.validity is not None
            if has_v:
                parts.append(c.validity.astype(jnp.int32)[:, None])
            layout.append((i, c, off, w, has_v))
            off += w + (1 if has_v else 0)
        else:
            rest.append(i)
    return layout, parts, rest


def _gathered_bounds(c: DeviceColumn, null_extend) -> Optional[Tuple[int, int]]:
    """Bounds survive a gather: outputs are a subset of the source's physical
    array (whose dead slots the bounds already cover — data/device.py
    invariant), plus fresh zeros where rows are null-extended, so widen to
    include 0 in that case."""
    if c.bounds is None:
        return None
    lo, hi = int(c.bounds[0]), int(c.bounds[1])
    if null_extend is not None:
        lo, hi = min(lo, 0), max(hi, 0)
    return (lo, hi)


def _unpack_lane_col(g: jax.Array, c: DeviceColumn, o: int, w: int,
                     has_v: bool, null_extend) -> DeviceColumn:
    data = _unpack_lanes(g[:, o:o + w], c.data.dtype)
    validity = (g[:, o + w] != 0) if has_v else None
    if null_extend is not None:
        v = validity if validity is not None else jnp.ones_like(null_extend)
        validity = v & ~null_extend
        data = jnp.where(null_extend, jnp.zeros_like(data), data)
    return DeviceColumn(data, validity, c.dtype, c.dictionary,
                        _gathered_bounds(c, null_extend))


def join_direct_gather(probe_keys, build_keys, probe_sel, build_sel,
                       spans, domain: int, build_cols,
                       null_unmatched: bool = True):
    """Direct-address join that scatters the PACKED build payload into the
    table itself: one row scatter builds table[key] -> [occupied, lanes...],
    one row gather per probe retrieves match flag + every build column --
    no separate row-id gather per column (TPU gathers cost per ROW, see
    gather_columns). Returns (cols, matched, dup); cols aligned with
    build_cols (nested columns fall back to a row-id gather)."""
    pids, p_live = _make_ids(probe_keys, probe_sel, spans)
    bids, b_live = _make_ids(build_keys, build_sel, spans)
    nb = bids.shape[0]
    bslot = jnp.where(b_live, jnp.clip(bids, 0, domain - 1), domain)
    layout, parts, rest = _build_lane_plan(build_cols)
    occ = jnp.ones((nb, 1), jnp.int32)
    packed = jnp.concatenate([occ] + parts, axis=1)
    table = jnp.zeros((domain, packed.shape[1]), jnp.int32) \
        .at[bslot].set(packed, mode="drop")
    counts = jnp.zeros(domain, jnp.int32).at[bslot].add(1, mode="drop")
    dup = jnp.any(counts > 1)
    pslot = jax.lax.optimization_barrier(
        jnp.clip(pids, 0, domain - 1).astype(jnp.int32))
    g = table[pslot]
    matched = p_live & (g[:, 0] != 0)
    # INNER joins mask unmatched rows out via sel anyway: skipping the
    # null-extension drops the redundant validity lane from every gathered
    # column (each one would become an extra operand in downstream
    # multi-key sorts -- group keys, order keys)
    null_extend = ~matched if null_unmatched else None
    out: List[Optional[DeviceColumn]] = [None] * len(build_cols)
    for i, c, o, w, has_v in layout:
        out[i] = _unpack_lane_col(g, c, 1 + o, w, has_v, null_extend)
    if rest:
        iota = jnp.arange(nb, dtype=jnp.int32)
        rowt = jnp.full(domain, 0, jnp.int32).at[bslot].set(iota, mode="drop")
        brow = rowt[pslot]
        gathered = gather_columns([build_cols[i] for i in rest], brow,
                                  matched, null_extend=null_extend)
        for i, c2 in zip(rest, gathered):
            out[i] = c2
    return out, matched, dup


def join_direct_lookup(probe_keys, build_keys, probe_sel, build_sel,
                       spans, domain: int):
    """Direct-address join phase for a proven-dense key domain (the
    TPU-native answer to a hash-table build+probe, reference:
    JoinHashMapU32 chained map, joins/join_hash_map.rs:144): one scatter
    builds table[key] -> build row, one gather probes it. No sorts, no
    expansion. Returns (build_row, matched, dup) where dup flags a
    duplicate-keyed build side (the caller must fall back: with duplicates
    the row mapping is last-wins, not the full match set)."""
    pids, p_live = _make_ids(probe_keys, probe_sel, spans)
    bids, b_live = _make_ids(build_keys, build_sel, spans)
    nb = bids.shape[0]
    bslot = jnp.where(b_live, jnp.clip(bids, 0, domain - 1), domain)
    iota = jnp.arange(nb, dtype=jnp.int32)
    # 2-lane table (row, row): a [domain, 2] row gather costs ~half of the
    # 1-D gather on TPU (~3.6 vs 6.7 ns/probe-row measured on v5e) — but
    # the 2-lane SCATTER build costs per-table-slot, so only worth it when
    # the domain is no bigger than the probe set (TPC-H Q3's 12M-slot
    # orderkey table vs 2M probes regressed 40% with an unconditional
    # 2-lane table; Q17's 200k-slot table vs 8M probes wins 25%)
    wide = domain <= pids.shape[0]
    if wide:
        table = jnp.full((domain, 2), -1, jnp.int32).at[bslot].set(
            jnp.stack([iota, iota], axis=1), mode="drop")
    else:
        table = jnp.full(domain, -1, jnp.int32).at[bslot].set(
            iota, mode="drop")
    counts = jnp.zeros(domain, jnp.int32).at[bslot].add(1, mode="drop")
    dup = jnp.any(counts > 1)
    pslot = jnp.clip(pids, 0, domain - 1)
    g = table[jax.lax.optimization_barrier(pslot)]
    brow = g[:, 0] if wide else g
    matched = p_live & (brow >= 0)
    return jnp.maximum(brow, 0), matched, dup


def join_exists_minmax(probe_keys, build_keys, probe_sel, build_sel,
                       spans, domain: int,
                       probe_col: DeviceColumn, build_col: DeviceColumn,
                       op: str) -> jax.Array:
    """Existence bitmap for a semi/anti join whose residual is ONE
    comparison `probe_col OP build_col` (op in lt/le/gt/ge/neq), over a
    proven-dense key domain: per-key scatter-min/max of the build column
    replaces the expansion join entirely --
      exists b: key(b)=key(p) and p  < b.col  <=>  p.col <  max[key]
      exists b: key(b)=key(p) and p <> b.col  <=>  cnt>=1 and
                                                  (min[key] != p.col or
                                                   max[key] != p.col)
    (TPC-H Q21's `l2.l_suppkey <> l1.l_suppkey` pattern). NULL build values
    never satisfy a comparison (excluded from min/max); NULL probe values
    match nothing."""
    pids, p_live = _make_ids(probe_keys, probe_sel, spans)
    bids, b_live = _make_ids(build_keys, build_sel, spans)
    pdata, bdata, pc, bc = _range_compare_domain(probe_col, build_col)
    # bounds-proven int32 narrowing: 64-bit scatter-min/max and gathers are
    # emulated on TPU (observed 3.4x on TPC-H Q21 before this)
    sent_ok = False  # sentinels provably outside the value domain
    if jnp.issubdtype(bdata.dtype, jnp.integer) \
            and pc.bounds is not None and bc.bounds is not None:
        lo_b = min(int(pc.bounds[0]), int(bc.bounds[0]))
        hi_b = max(int(pc.bounds[1]), int(bc.bounds[1]))
        if -(1 << 31) < lo_b and hi_b < (1 << 31) - 1:
            pdata = pdata.astype(jnp.int32)
            bdata = bdata.astype(jnp.int32)
            sent_ok = True
        elif -(1 << 63) < lo_b and hi_b < (1 << 63) - 1:
            sent_ok = True
    if pc.validity is not None:
        p_live = p_live & pc.validity
    if bc.validity is not None:
        b_live = b_live & bc.validity
    bslot = jnp.where(b_live, jnp.clip(bids, 0, domain - 1), domain)
    pslot = jax.lax.optimization_barrier(
        jnp.clip(pids, 0, domain - 1).astype(jnp.int32))
    lo = jnp.finfo(bdata.dtype).min if jnp.issubdtype(bdata.dtype, jnp.floating) \
        else jnp.iinfo(bdata.dtype).min
    hi = jnp.finfo(bdata.dtype).max if jnp.issubdtype(bdata.dtype, jnp.floating) \
        else jnp.iinfo(bdata.dtype).max
    need_min = op in ("gt", "ge", "neq")
    need_max = op in ("lt", "le", "neq")
    from . import kernels as K
    # NOTE: packing min+max into one 2-lane scatter-min (min(~x) = ~max(x))
    # was tried and is 2.3x SLOWER: multi-lane scatter updates lower
    # pathologically on this compiler (1-lane scatters + a packed gather is
    # the fast shape). When sentinels cannot collide with real values
    # (bounds-proven strict interior), a min/max left at its sentinel
    # already proves "no build row": the per-key count scatter -- 73 ms
    # over TPC-H Q21's 12M-slot domain, twice -- is redundant
    parts = [] if sent_ok else \
        [jnp.zeros(domain, jnp.int32).at[bslot].add(1, mode="drop")]
    if need_min:
        parts.append(jnp.full(domain, hi, bdata.dtype).at[bslot].min(
            jnp.where(b_live, bdata, hi), mode="drop"))
    if need_max:
        parts.append(jnp.full(domain, lo, bdata.dtype).at[bslot].max(
            jnp.where(b_live, bdata, lo), mode="drop"))
    # ONE row gather retrieves cnt/min/max together (per-row gather cost)
    gathered = K.gather_rows(parts, pslot)
    j = 0 if sent_ok else 1
    mn = gathered[j] if need_min else None
    mx = gathered[-1] if need_max else None
    if sent_ok:
        cnt = (mn != hi) if need_min else (mx != lo)
    else:
        cnt = gathered[0] > 0
    if op == "lt":
        ok = pdata < mx
    elif op == "le":
        ok = pdata <= mx
    elif op == "gt":
        ok = pdata > mn
    elif op == "ge":
        ok = pdata >= mn
    else:  # neq
        ok = (mn != pdata) | (mx != pdata)
    return p_live & cnt & ok


def join_direct_exists(probe_keys, build_keys, probe_sel, build_sel,
                       spans, domain: int) -> jax.Array:
    """Existence bitmap for semi/anti joins over a dense key domain: correct
    for ANY build-side multiplicity (only membership matters)."""
    pids, p_live = _make_ids(probe_keys, probe_sel, spans)
    bids, b_live = _make_ids(build_keys, build_sel, spans)
    bslot = jnp.where(b_live, jnp.clip(bids, 0, domain - 1), domain)
    # 2-lane table: a [domain, 2] row gather costs ~half of the 1-D bitmap
    # gather on TPU (~3.6 vs 6.7 ns/probe-row measured on v5e); the wider
    # scatter only pays for itself when the domain is no bigger than the
    # probe set (see join_direct_lookup)
    if domain <= pids.shape[0]:
        exists = jnp.zeros((domain, 2), jnp.int32).at[bslot].set(
            1, mode="drop")
        pslot = jnp.clip(pids, 0, domain - 1)
        return p_live & (exists[jax.lax.optimization_barrier(pslot)][:, 0] != 0)
    exists = jnp.zeros(domain, jnp.bool_).at[bslot].set(True, mode="drop")
    pslot = jnp.clip(pids, 0, domain - 1)
    return p_live & exists[jax.lax.optimization_barrier(pslot)]


def bucket_domain(left_keys, right_keys, prefix_limit: int) -> Optional[Tuple]:
    """Bucketed direct-address plan for composite keys whose FULL dense
    domain exceeds the direct-table limit: pick the key permutation whose
    largest-span prefix packs into a table of <= prefix_limit slots, and
    compare the remaining keys inside small per-slot buckets. Returns
    (order, spans, nprefix, d1) with spans already permuted by order, or
    None (single-key joins, unbounded keys, no useful split)."""
    n = len(left_keys)
    if n < 2:
        return None
    raw = []
    for lc, rc in zip(left_keys, right_keys):
        lb, rb = _key_bounds(lc), _key_bounds(rc)
        if lb is None or rb is None:
            return None
        lo = min(lb[0], rb[0])
        hi = max(lb[1], rb[1])
        span = hi - lo + 1
        if span <= 0:
            return None
        raw.append((lo, span))
    by_span = sorted(range(n), key=lambda i: raw[i][1], reverse=True)
    order, d1 = [], 1
    for i in by_span:
        if d1 * raw[i][1] <= prefix_limit:
            order.append(i)
            d1 *= raw[i][1]
    if not order or len(order) == n:
        return None  # nothing fits / full domain fits (direct path's case)
    nprefix = len(order)
    rest = [i for i in by_span if i not in order]
    order = tuple(order + rest)
    domain = d1
    for i in rest:
        domain *= raw[i][1]
        if 4 * domain >= (1 << 62):
            return None
    spans = tuple(raw[i] for i in order)
    return order, spans, nprefix, d1


def _suffix_domain(spans, nprefix: int) -> int:
    sdom = 1
    for _, span in spans[nprefix:]:
        sdom *= span
    return sdom


def bucket_max_count(build_keys, build_sel, spans, nprefix: int,
                     d1: int) -> jax.Array:
    """Discovery probe: the largest bucket population (live build rows per
    prefix slot) -- sizes the bucket width B of join_bucket_lookup."""
    bid, b_live = _make_ids(build_keys, build_sel, spans)
    bid1 = bid // _suffix_domain(spans, nprefix)
    slot = jnp.where(b_live, jnp.clip(bid1, 0, d1 - 1), d1)
    counts = jnp.zeros(d1, jnp.int32).at[slot].add(1, mode="drop")
    return jnp.max(counts)


def join_bucket_lookup(probe_keys, build_keys, probe_sel, build_sel,
                       spans, nprefix: int, d1: int, B: int):
    """Bucketed direct-address join: table[prefix_slot * B + rank] holds the
    build row and its full packed key; each probe gathers its B candidate
    slots and matches the full key by compare -- B gathers instead of the
    generic path's multi-million-row probe sorts. Keys/spans arrive already
    permuted so the dense prefix leads. One small build-side sort assigns
    in-bucket ranks. Returns (build_row, matched, bad) where bad = a bucket
    overflowed B or the full key is duplicated (caller must fall back)."""
    pid, p_live = _make_ids(probe_keys, probe_sel, spans)
    bid, b_live = _make_ids(build_keys, build_sel, spans)
    sdom = _suffix_domain(spans, nprefix)
    full = jnp.int64(d1) * sdom
    nb = bid.shape[0]
    iota = jnp.arange(nb, dtype=jnp.int32)
    skey = jnp.where(b_live, jnp.clip(bid, 0, full - 1), full)
    sid, sperm = jax.lax.sort([skey, iota], dimension=0, is_stable=True,
                              num_keys=1)
    slive = sid < full
    sprefix = sid // sdom
    newrun = jnp.concatenate(
        [jnp.ones(1, jnp.bool_), sprefix[1:] != sprefix[:-1]])
    run_start = jax.lax.cummax(jnp.where(newrun, iota, 0))
    rank = iota - run_start
    dup = jnp.any((sid[1:] == sid[:-1]) & slive[1:])
    over = jnp.any(slive & (rank >= B))
    slot = jnp.where(slive & (rank < B), sprefix * B + rank,
                     jnp.int64(d1) * B)
    table_row = jnp.zeros(d1 * B, jnp.int32).at[slot].set(sperm, mode="drop")
    table_key = jnp.full(d1 * B, -1, jnp.int64).at[slot].set(sid, mode="drop")
    pid1 = jnp.clip(pid // sdom, 0, d1 - 1)
    idx = jax.lax.optimization_barrier(
        pid1[:, None] * B + jnp.arange(B, dtype=jnp.int64)[None, :])
    hit = (table_key[idx] == pid[:, None]) & p_live[:, None]
    matched = jnp.any(hit, axis=1)
    brow = jnp.max(jnp.where(hit, table_row[idx], 0), axis=1)
    return brow, matched, dup | over


def join_bucket_gather(probe_keys, build_keys, probe_sel, build_sel,
                       spans, nprefix: int, d1: int, B: int, build_cols,
                       null_unmatched: bool = True):
    """Bucketed direct join with the payload folded into the table: each
    prefix slot's row holds its B candidates' [key(2 lanes), build row,
    packed payload lanes] side by side, so one WIDE row gather per probe
    retrieves everything; the full-key compare then selects among the B
    candidates elementwise (no (N, B) element gathers -- TPU gathers cost
    per row). Returns (cols, matched, bad)."""
    pid, p_live = _make_ids(probe_keys, probe_sel, spans)
    bid, b_live = _make_ids(build_keys, build_sel, spans)
    sdom = _suffix_domain(spans, nprefix)
    full = d1 * sdom
    nb = bid.shape[0]
    iota = jnp.arange(nb, dtype=jnp.int32)
    skey = jnp.where(b_live, jnp.clip(bid, 0, full - 1), full)
    sid, sperm = jax.lax.sort([skey, iota], dimension=0, is_stable=True,
                              num_keys=1)
    slive = sid < full
    sprefix = sid // sdom
    newrun = jnp.concatenate(
        [jnp.ones(1, jnp.bool_), sprefix[1:] != sprefix[:-1]])
    run_start = jax.lax.cummax(jnp.where(newrun, iota, 0))
    rank = iota - run_start
    dup = jnp.any((sid[1:] == sid[:-1]) & slive[1:])
    over = jnp.any(slive & (rank >= B))
    layout, parts, rest = _build_lane_plan(build_cols)
    packed = (jnp.concatenate(parts, axis=1) if parts
              else jnp.zeros((nb, 0), jnp.int32))
    from . import kernels as K
    sorted_packed = K.gather_rows([packed], sperm)[0] if parts \
        else packed  # build side is small: one row gather
    key_lanes = jax.lax.bitcast_convert_type(
        jnp.where(slive, sid, jnp.int64(-1)), jnp.int32)
    cand = jnp.concatenate([key_lanes, sperm[:, None], sorted_packed], axis=1)
    cw = cand.shape[1]  # 3 + payload lanes
    slot = jnp.where(slive & (rank < B), sprefix * B + rank,
                     jnp.int64(d1) * B)
    table = jnp.full((d1 * B, cw), -1, jnp.int32).at[slot].set(
        cand, mode="drop")
    wide = table.reshape(d1, B * cw)
    pid1 = jax.lax.optimization_barrier(
        jnp.clip(pid // sdom, 0, d1 - 1).astype(jnp.int32))
    g = wide[pid1]
    matched = jnp.zeros(pid.shape[0], jnp.bool_)
    acc = jnp.full((pid.shape[0], cw - 2), -1, jnp.int32)
    for j in range(B):
        base = j * cw
        kj = jax.lax.bitcast_convert_type(g[:, base:base + 2], jnp.int64)
        hit = p_live & (kj == pid)
        acc = jnp.where(hit[:, None], g[:, base + 2:base + cw], acc)
        matched = matched | hit
    null_extend = ~matched if null_unmatched else None
    out: List[Optional[DeviceColumn]] = [None] * len(build_cols)
    for i, c, o, w, has_v in layout:
        out[i] = _unpack_lane_col(acc, c, 1 + o, w, has_v, null_extend)
    if rest:
        brow = jnp.maximum(acc[:, 0], 0)
        gathered = gather_columns([build_cols[i] for i in rest], brow,
                                  matched, null_extend=null_extend)
        for i, c2 in zip(rest, gathered):
            out[i] = c2
    return out, matched, dup | over


def _key_bounds(c: DeviceColumn) -> Optional[Tuple[int, int]]:
    """Integer-comparable bounds of one join-key column: value bounds from
    interval metadata, or [0, size) for dictionary codes (both sides of a
    string join share one unified sorted dictionary)."""
    if c.dtype.is_string:
        if c.dictionary is None:
            return None
        return (0, max(len(c.dictionary.values) - 1, 0))
    if not jnp.issubdtype(c.data.dtype, jnp.integer) \
            or c.data.dtype == jnp.bool_:
        return None
    if c.bounds is None:
        return None
    return (int(c.bounds[0]), int(c.bounds[1]))


def _bounded_ids(left_keys, right_keys, left_sel, right_sel):
    """Mixed-radix-pack composite keys into one PROVEN-dense int64 domain
    when bounds metadata allows (DeviceColumn.bounds intervals / dictionary
    sizes). Enables the 2-operand single-key join sorts
    (kernels.join_match_counts_small)."""
    spans = []
    domain = 1
    for lc, rc in zip(left_keys, right_keys):
        lb, rb = _key_bounds(lc), _key_bounds(rc)
        if lb is None or rb is None:
            return None
        lo = min(lb[0], rb[0])
        hi = max(lb[1], rb[1])
        span = hi - lo + 1
        if span <= 0:
            return None
        spans.append((lo, span))
        domain *= span
        if 4 * domain >= (1 << 62):
            return None

    def make(keys, sel):
        ids = None
        live = sel
        for c, (lo, span) in zip(keys, spans):
            if c.validity is not None:
                live = live & c.validity
            v = c.data.astype(jnp.int64) - lo
            ids = v if ids is None else ids * span + v
        return ids, live

    lids, l_live = make(left_keys, left_sel)
    rids, r_live = make(right_keys, right_sel)
    return lids, l_live, rids, r_live, domain


def _range_compare_domain(l: DeviceColumn, r: DeviceColumn):
    """Cast both key columns into one order-preserving comparable domain."""
    if l.dtype.is_string or r.dtype.is_string:
        from ..physical.expr_compiler import unify_string_columns

        l, r = unify_string_columns(l, r)  # shared sorted dict: codes compare
        return l.data.astype(jnp.int64), r.data.astype(jnp.int64), l, r
    if l.dtype.is_decimal or r.dtype.is_decimal:
        ls = l.dtype.scale if l.dtype.is_decimal else 0
        rs = r.dtype.scale if r.dtype.is_decimal else 0
        s = max(ls, rs)
        ld = l.data.astype(jnp.int64) * (10 ** (s - ls))
        rd = r.data.astype(jnp.int64) * (10 ** (s - rs))
        return ld, rd, l, r
    if l.dtype.is_float or r.dtype.is_float:
        return (l.data.astype(jnp.float64), r.data.astype(jnp.float64), l, r)
    return l.data.astype(jnp.int64), r.data.astype(jnp.int64), l, r


def range_join_phase1(
    probe_key: DeviceColumn,
    build_key: DeviceColumn,
    op: str,  # probe-side comparison: lt | le | gt | ge
    probe_sel: jax.Array,
    build_sel: jax.Array,
):
    """Phase 1 of the single-range-predicate join (reference:
    PiecewiseMergeJoinExec, joins/piecewise_merge_join/exec.rs): sort the
    build side by the range key; each probe row's match set is then a
    contiguous prefix (probe > / >= build) or suffix (probe < / <= build) of
    the sorted build side, described by the same (perm, lo, cnt) triple the
    equi-join expansion consumes — no per-pair predicate evaluation, no
    cartesian blowup beyond the true match count."""
    pdata, bdata, pk, bk = _range_compare_domain(probe_key, build_key)
    p_live = probe_sel if pk.validity is None else (probe_sel & pk.validity)
    b_live = build_sel if bk.validity is None else (build_sel & bk.validity)
    nb = bdata.shape[0]
    bdead = ~b_live
    iota = jnp.arange(nb, dtype=jnp.int32)
    sbdead, sbkey, perm = jax.lax.sort(
        [bdead.astype(jnp.int32), bdata, iota], dimension=0, is_stable=True,
        num_keys=2)
    nlive = jnp.sum(b_live.astype(jnp.int32))
    side = {"lt": "right", "le": "left", "gt": "left", "ge": "right"}[op]
    rank = K.ranks_in_sorted(sbkey, pdata, side, a_dead=sbdead > 0,
                             q_dead=~p_live)
    if op in ("lt", "le"):
        lo = jnp.minimum(rank, nlive)
        cnt = nlive - lo
    else:
        lo = jnp.zeros_like(rank)
        cnt = jnp.minimum(rank, nlive)
    cnt = jnp.where(p_live, cnt, 0).astype(jnp.int32)
    total = jnp.sum(cnt.astype(jnp.int64))
    return perm, lo.astype(jnp.int32), cnt, total


def _packable(c: DeviceColumn) -> bool:
    # f64 excluded: this TPU compiler's X64 rewriter cannot lower ANY
    # bitcast-convert involving f64 (same- or cross-width); f64 columns
    # gather individually. 32-bit floats bitcast fine.
    return (c.data.ndim == 1 and c.lengths is None and c.elem_valid is None
            and c.data.dtype.itemsize in (4, 8)
            and c.data.dtype != jnp.bool_
            and not (jnp.issubdtype(c.data.dtype, jnp.floating)
                     and c.data.dtype.itemsize == 8))


def _pack_lanes(arr: jax.Array) -> jax.Array:
    """View a 1-D 4/8-byte array as (n, 1|2) int32 lanes (free bitcast)."""
    if arr.dtype.itemsize == 8:
        return jax.lax.bitcast_convert_type(arr, jnp.int32)
    return jax.lax.bitcast_convert_type(arr, jnp.int32)[:, None]


def _unpack_lanes(lanes: jax.Array, dtype) -> jax.Array:
    if jnp.dtype(dtype).itemsize == 8:
        return jax.lax.bitcast_convert_type(lanes, dtype)
    return jax.lax.bitcast_convert_type(lanes[:, 0], dtype)


def gather_columns(
    cols: Sequence[DeviceColumn],
    idx: jax.Array,
    row_valid: jax.Array,
    null_extend: Optional[jax.Array] = None,
) -> List[DeviceColumn]:
    """Gather columns at idx; rows where null_extend is True become NULL.

    TPU random gathers cost ~10ns PER ROW regardless of width (a (D, 8)
    row gather measures ~half of ONE single-column gather), so all plain
    columns pack into one int32 lane matrix -- data bitcast to 1-2 lanes,
    validity as one lane -- and the join pays ONE row gather instead of
    one gather per column+validity. Nested (2-D) and sub-4-byte columns
    gather individually."""
    out_slots: List[Optional[DeviceColumn]] = [None] * len(cols)
    n = cols[0].capacity if cols else 0
    # keep the gathers out of enclosing fusions (see kernels.join_expand)
    safe = jax.lax.optimization_barrier(
        jnp.clip(idx, 0, max(n - 1, 0)).astype(jnp.int32))

    def finish(i, c, data, validity):
        lengths = c.lengths[safe] if c.lengths is not None else None
        ev = c.elem_valid[safe] if c.elem_valid is not None else None
        if null_extend is not None:
            v = validity if validity is not None else jnp.ones_like(null_extend)
            validity = v & ~null_extend
            data = jnp.where(
                (null_extend[:, None] if data.ndim == 2 else null_extend),
                jnp.zeros_like(data), data)
        out_slots[i] = DeviceColumn(data, validity, c.dtype, c.dictionary,
                                    _gathered_bounds(c, null_extend),
                                    lengths, ev)

    # the packed lane matrix is a REAL [src_cap, L] buffer (concatenate);
    # at >16M rows XLA sometimes assigns it a minor-dim-padded-to-128 tile
    # layout (observed: 42x expansion -> 32 GB at TPC-H SF10), so huge
    # sources gather per column (bitcast pairs stay free 1-D gathers)
    pack_ok = (not cols) or cols[0].capacity <= (1 << 24)
    parts: List[jax.Array] = []
    layout: List[Tuple[int, DeviceColumn, int, int, bool]] = []
    off = 0
    f64_parts: List[jax.Array] = []
    f64_layout: List[Tuple[int, DeviceColumn, int]] = []  # (slot, col, lane)
    f64_vlane = {}  # slot -> int32-matrix lane carrying its validity
    for i, c in enumerate(cols):
        if not pack_ok:
            data = c.data[safe]
            validity = c.validity[safe] if c.validity is not None else None
            finish(i, c, data, validity)
            continue
        if _packable(c):
            lanes = _pack_lanes(c.data)
            parts.append(lanes)
            w = lanes.shape[1]
            has_v = c.validity is not None
            if has_v:
                parts.append(c.validity.astype(jnp.int32)[:, None])
            layout.append((i, c, off, w, has_v))
            off += w + (1 if has_v else 0)
        elif (c.data.ndim == 1 and c.lengths is None and c.elem_valid is None
              and jnp.issubdtype(c.data.dtype, jnp.floating)
              and c.data.dtype.itemsize == 8):
            # f64 cannot bitcast on this compiler, but a dtype-homogeneous
            # [n, k>=2] f64 matrix row-gather costs ~1/3 of the 1-D f64
            # gather (measured: 43 vs 178 ms device at 8M rows on v5e);
            # validity lanes ride the int32 matrix
            f64_layout.append((i, c, len(f64_parts)))
            f64_parts.append(c.data)
            if c.validity is not None:
                f64_vlane[i] = off
                parts.append(c.validity.astype(jnp.int32)[:, None])
                off += 1
        else:
            data = c.data[safe]
            validity = c.validity[safe] if c.validity is not None else None
            finish(i, c, data, validity)
    g = None
    if parts:
        # chunked packing dodges the slow >=3-lane gather tiling and
        # duplicates single lanes (see kernels.packed_row_gather)
        g = K.packed_row_gather(parts, safe)
    for i, c, o, w, has_v in layout:
        data = _unpack_lanes(g[:, o:o + w], c.data.dtype)
        validity = (g[:, o + w] != 0) if has_v else None
        finish(i, c, data, validity)
    if f64_layout:
        fsrc = f64_parts + [f64_parts[0]] if len(f64_parts) == 1 else f64_parts
        fg = jnp.stack(fsrc, axis=1)[safe]
        for i, c, k in f64_layout:
            validity = (g[:, f64_vlane[i]] != 0) if i in f64_vlane else None
            finish(i, c, fg[:, k], validity)
    return list(out_slots)
