"""Window functions.

Capability analog of the reference's WindowAggExec / BoundedWindowAggExec
(physical-plan/src/windows/{window_agg_exec.rs,bounded_window_agg_exec.rs})
and the functions-window crate (row_number, rank, dense_rank, percent_rank,
cume_dist, ntile, lead, lag, first/last value, running aggregates).

TPU design: one multi-key sort per distinct (PARTITION BY, ORDER BY) window,
segment ids for partitions, peer-run ids for RANGE frames, segmented prefix
scans for running aggregates, then an inverse-permutation scatter back to the
input row order (window operators preserve input cardinality/order)."""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..common import types as T
from ..common.errors import PlanError
from ..common.schema import Schema
from ..data.device import DeviceColumn, DeviceRelation
from ..expr import nodes as E
from ..expr.typing import infer
from ..ops import kernels as K
from .expr_compiler import eval_expr
from .plan import PhysicalPlan


def _seg_cumsum(x: jax.Array, seg_start: jax.Array) -> jax.Array:
    """Inclusive cumulative sum resetting at segment starts."""
    n = x.shape[0]
    cs = jnp.cumsum(x)
    excl = cs - x
    iota = jnp.arange(n)
    last_start = jax.lax.cummax(jnp.where(seg_start, iota, 0))
    base = excl[jnp.clip(last_start, 0, n - 1)]
    return cs - base


def _range_reduce(x: jax.Array, fs: jax.Array, fe: jax.Array, empty: jax.Array,
                  is_min: bool, ident) -> jax.Array:
    """Per-row min/max over arbitrary index ranges [fs, fe].

    Binary decomposition over doubling levels (the sparse-table scheme, built
    one level at a time so only O(n) memory is live): level_b[i] reduces
    [i, i+2^b); each row consumes bit b of its range length, walking its
    cursor forward. O(n log n) work, fully vectorized — the TPU answer to the
    reference's per-row accumulator loop (window_agg_exec.rs)."""
    cap = x.shape[0]
    op = jnp.minimum if is_min else jnp.maximum
    iota = jnp.arange(cap)
    level = x
    acc = jnp.full_like(x, ident)
    cur = fs
    length = jnp.where(empty, 0, fe - fs + 1)
    for b in range(max(1, cap.bit_length())):
        take = ((length >> b) & 1) == 1
        val = level[jnp.clip(cur, 0, cap - 1)]
        acc = jnp.where(take, op(acc, val), acc)
        cur = jnp.where(take, cur + (1 << b), cur)
        if (1 << (b + 1)) > cap:
            break
        shifted = jnp.where(iota + (1 << b) < cap,
                            level[jnp.clip(iota + (1 << b), 0, cap - 1)], ident)
        level = op(level, shifted)
    return acc


def _first_where(k: jax.Array, target: jax.Array, lo0: jax.Array, hi0: jax.Array,
                 op: str) -> jax.Array:
    """Vectorized per-row binary search: first index j in [lo0, hi0) where
    `k[j] <op> target` holds, assuming the predicate is monotone
    false→true over the range (k sorted). Returns hi0 when never true."""
    cap = k.shape[0]
    lo, hi = lo0, hi0
    for _ in range(cap.bit_length() + 1):
        active = lo < hi
        mid = (lo + hi) // 2
        v = k[jnp.clip(mid, 0, cap - 1)]
        if op == "ge":
            cond = v >= target
        elif op == "gt":
            cond = v > target
        elif op == "le":
            cond = v <= target
        else:
            cond = v < target
        hi = jnp.where(active & cond, mid, hi)
        lo = jnp.where(active & ~cond, mid + 1, lo)
    return lo


def _seg_cummax(x, seg_start):
    def comb(a, b):
        af, av = a
        bf, bv = b
        return af | bf, jnp.where(bf, bv, jnp.maximum(av, bv))

    _, out = jax.lax.associative_scan(comb, (seg_start, x))
    return out


def _seg_cummin(x, seg_start):
    def comb(a, b):
        af, av = a
        bf, bv = b
        return af | bf, jnp.where(bf, bv, jnp.minimum(av, bv))

    _, out = jax.lax.associative_scan(comb, (seg_start, x))
    return out


class WindowExec(PhysicalPlan):
    def __init__(self, input: PhysicalPlan, window_exprs: Sequence[E.Expr], schema: Schema):
        self.input = input
        self.window_exprs = tuple(window_exprs)
        self.schema = schema
        self._fn = jax.jit(self._transform)

    def children(self):
        return (self.input,)

    def execute(self, ctx):
        return self._timed(ctx, self._fn, self.input.execute(ctx))

    def _line(self):
        return f"WindowExec: {[e.name() for e in self.window_exprs]}"

    # ------------------------------------------------------------------
    def _transform(self, rel: DeviceRelation) -> DeviceRelation:
        cap = rel.capacity
        # group window exprs by (partition_by, order_by)
        groups: Dict[Tuple, List[Tuple[int, E.WindowFunction]]] = {}
        wfns: List[E.WindowFunction] = []
        for i, e in enumerate(self.window_exprs):
            w = e.expr if isinstance(e, E.Alias) else e
            if not isinstance(w, E.WindowFunction):
                raise PlanError(f"not a window function: {e!r}")
            wfns.append(w)
            key = (w.partition_by, w.order_by, _norm_frame(w.frame))
            groups.setdefault(key, []).append((i, w))

        results: Dict[int, DeviceColumn] = {}
        for (partition_by, order_by, frame), members in groups.items():
            outs = self._eval_window_group(rel, partition_by, order_by, frame, members)
            results.update(outs)

        cols = list(rel.columns) + [results[i] for i in range(len(self.window_exprs))]
        return DeviceRelation(self.schema, tuple(cols), rel.sel)

    def _eval_window_group(self, rel, partition_by, order_by, frame, members):
        cap = rel.capacity
        keys = []
        pcols = [eval_expr(p, rel) for p in partition_by]
        for c in pcols:
            keys.append((c.data, c.validity, False, False))
        ocols = [eval_expr(s.expr, rel) for s in order_by]
        for c, s in zip(ocols, order_by):
            keys.append((c.data, c.validity, not s.asc, s.nulls_first))

        perm = K.sort_permutation(keys, rel.sel)
        inv = jnp.zeros(cap, dtype=jnp.int32).at[perm].set(jnp.arange(cap, dtype=jnp.int32))
        # one packed gather applies the permutation to sel + all key arrays
        flat = [rel.sel]
        for c in pcols + ocols:
            flat.append(c.data)
            if c.validity is not None:
                flat.append(c.validity)
        flat = K.gather_rows(flat, perm)
        ssel, flat = flat[0], flat[1:]
        sp, so, j = [], [], 0
        for c in pcols + ocols:
            data = flat[j]; j += 1
            validity = None
            if c.validity is not None:
                validity = flat[j]; j += 1
            (sp if len(sp) < len(pcols) else so).append(
                DeviceColumn(data, validity, c.dtype, c.dictionary))

        if sp:
            seg, seg_start, _ = K.segments_from_sorted_keys(
                [c.data for c in sp], [c.validity for c in sp], ssel
            )
        else:
            seg = jnp.where(ssel, 0, cap - 1).astype(jnp.int32)
            seg_start = jnp.zeros(cap, dtype=bool).at[0].set(True)
        # peer runs: equal on partition + order keys
        if so:
            _, peer_start, _ = K.segments_from_sorted_keys(
                [c.data for c in sp] + [c.data for c in so],
                [c.validity for c in sp] + [c.validity for c in so],
                ssel,
            )
        else:
            peer_start = seg_start

        iota = jnp.arange(cap, dtype=jnp.int64)
        G = cap
        part_first = K.segment_min(iota.astype(jnp.int32), seg, seg_start, G)
        part_count = K.segment_count(seg, ssel, G)
        my_first = jnp.clip(part_first[jnp.clip(seg, 0, G - 1)], 0, cap - 1)
        my_count = part_count[jnp.clip(seg, 0, G - 1)]
        row_in_part = (iota - my_first).astype(jnp.int64)

        # rank support: position of current peer-run start
        peer_pos = jnp.where(peer_start, iota, 0)
        last_peer_start = jax.lax.cummax(peer_pos)
        rank_sorted = (last_peer_start - my_first + 1).astype(jnp.int64)
        dense_sorted = _seg_cumsum(peer_start.astype(jnp.int64), seg_start)

        # peer-run end position (for RANGE ... CURRENT ROW frames). A live row
        # is a peer end when the NEXT row starts a new peer run OR the next
        # row is dead (padded capacity): dead rows never carry peer_start, so
        # without the liveness term the final live peer run would resolve its
        # end to the dead slot cap-1 (wrong last_value / cume_dist).
        nxt_start = jnp.concatenate([peer_start[1:], jnp.ones(1, dtype=bool)])
        nxt_live = jnp.concatenate([ssel[1:], jnp.zeros(1, dtype=bool)])
        is_peer_end = ssel & (nxt_start | ~nxt_live)
        # next peer end at or after each row = reverse cummin
        peer_end = -jax.lax.cummax(jnp.where(is_peer_end, -iota, -(cap + 1))[::-1])[::-1]

        fs = fe = fempty = None
        if frame is not None:
            fs, fe, fempty = self._frame_bounds(
                frame, so, order_by, ssel, peer_start, last_peer_start, peer_end,
                iota, my_first, my_count, G, cap)

        out: Dict[int, DeviceColumn] = {}
        for idx, w in members:
            col = self._one_fn(w, rel, perm, ssel, seg, seg_start, peer_start, peer_end,
                               row_in_part, my_count, rank_sorted, dense_sorted, G,
                               fs, fe, fempty)
            data = col.data[inv]
            validity = None if col.validity is None else col.validity[inv]
            out[idx] = DeviceColumn(data, validity, col.dtype, col.dictionary)
        return out

    def _frame_bounds(self, frame, so, order_by, ssel, peer_start,
                      last_peer_start, peer_end, iota, my_first, my_count, G, cap):
        """Per-row frame bounds [fs, fe] as sorted positions, plus an
        empty-frame mask. ROWS = index arithmetic; GROUPS = peer-run id
        lookups; RANGE offsets = vectorized binary search on the (sorted)
        order key. Reference semantics: datafusion/expr/src/window_frame.rs
        + physical-plan/src/windows/window_agg_exec.rs."""
        part_first = my_first.astype(jnp.int64)
        part_last = part_first + my_count.astype(jnp.int64) - 1
        u = frame.units

        if u == "rows":
            def bound(kind, off, is_start):
                if kind == "unbounded_preceding":
                    return part_first
                if kind == "unbounded_following":
                    return part_last
                if kind == "current_row":
                    return iota
                n = int(off)
                return iota - n if kind == "preceding" else iota + n
        elif u == "groups":
            rid = jnp.cumsum(peer_start.astype(jnp.int32)) - 1
            run_start = K.segment_min(iota.astype(jnp.int32), rid, ssel, G)
            run_end = K.segment_max(iota.astype(jnp.int32), rid, ssel, G)
            rid_first = rid[jnp.clip(part_first, 0, cap - 1).astype(jnp.int32)]
            rid_last = rid[jnp.clip(part_last, 0, cap - 1).astype(jnp.int32)]

            def bound(kind, off, is_start):
                if kind == "unbounded_preceding":
                    return part_first
                if kind == "unbounded_following":
                    return part_last
                if kind == "current_row":
                    return last_peer_start if is_start else peer_end
                n = int(off)
                tgt = rid - n if kind == "preceding" else rid + n
                arr = run_start if is_start else run_end
                pos = arr[jnp.clip(tgt, 0, G - 1)].astype(jnp.int64)
                # target run before the partition: clamp (start) / empty (end)
                pos = jnp.where(tgt < rid_first,
                                part_first if is_start else part_first - 1, pos)
                # target run after the partition: empty (start) / clamp (end)
                pos = jnp.where(tgt > rid_last,
                                part_last + 1 if is_start else part_last, pos)
                return pos
        else:  # range
            def bound(kind, off, is_start):
                if kind == "unbounded_preceding":
                    return part_first
                if kind == "unbounded_following":
                    return part_last
                if kind == "current_row":
                    return last_peer_start if is_start else peer_end
                if len(order_by) != 1:
                    raise PlanError(
                        "RANGE frame with offset requires exactly one ORDER BY key")
                c = so[0]
                spec = order_by[0]
                if c.dtype.is_decimal:
                    n = int(round(float(off) * (10.0 ** c.dtype.scale)))
                else:
                    n = float(off) if isinstance(off, float) else int(off)
                k = c.data
                if isinstance(n, float) and not jnp.issubdtype(k.dtype, jnp.floating):
                    k = k.astype(jnp.float64)
                valid = c.validity
                asc, nf = spec.asc, spec.nulls_first
                if valid is not None:
                    # park null keys at the end they sort to, so the key stays
                    # monotone within each partition
                    null_low = (asc and nf) or (not asc and not nf)
                    if jnp.issubdtype(k.dtype, jnp.floating):
                        sent = -jnp.inf if null_low else jnp.inf
                    else:
                        info = jnp.iinfo(k.dtype)
                        sent = info.min if null_low else info.max
                    k = jnp.where(valid, k, jnp.asarray(sent, k.dtype))
                if asc:
                    tgt = k + (n if kind == "following" else -n)
                    op = "ge" if is_start else "gt"
                else:
                    tgt = k + (n if kind == "preceding" else -n)
                    op = "le" if is_start else "lt"
                pos = _first_where(k, tgt, part_first, part_last + 1, op)
                if not is_start:
                    pos = pos - 1
                if valid is not None:
                    # a NULL current row's RANGE frame is its peer (null) run
                    pos = jnp.where(valid, pos,
                                    last_peer_start if is_start else peer_end)
                return pos

        fs = jnp.maximum(bound(frame.start_kind, frame.start_offset, True), part_first)
        fe = jnp.minimum(bound(frame.end_kind, frame.end_offset, False), part_last)
        fempty = (fs > fe) | ~ssel
        return fs, fe, fempty

    def _one_fn(self, w, rel, perm, ssel, seg, seg_start, peer_start, peer_end,
                row_in_part, my_count, rank_sorted, dense_sorted, G,
                fs=None, fe=None, fempty=None):
        cap = rel.capacity
        f = w.fname
        out_t, _ = infer(w, rel.schema)
        iota = jnp.arange(cap, dtype=jnp.int64)

        wfilter = getattr(w, "filter", None)
        if wfilter is not None and f in (
                "row_number", "rank", "dense_rank", "percent_rank",
                "cume_dist", "ntile", "lead", "lag", "nth_value",
                "first_value", "last_value"):
            raise PlanError(
                f"FILTER (WHERE ...) is not allowed for window function {f!r}")

        if f == "row_number":
            return DeviceColumn((row_in_part + 1).astype(jnp.int64), None, T.INT64)
        if f == "rank":
            return DeviceColumn(rank_sorted, None, T.INT64)
        if f == "dense_rank":
            return DeviceColumn(dense_sorted, None, T.INT64)
        if f == "percent_rank":
            d = jnp.maximum(my_count - 1, 1).astype(jnp.float64)
            return DeviceColumn((rank_sorted - 1).astype(jnp.float64) / d, None, T.FLOAT64)
        if f == "cume_dist":
            covered = (peer_end - (iota - row_in_part) + 1).astype(jnp.float64)
            return DeviceColumn(covered / jnp.maximum(my_count, 1).astype(jnp.float64),
                                None, T.FLOAT64)
        if f == "ntile":
            n = int(_lit(w.args[0]))
            cnt = jnp.maximum(my_count, 1)
            size = cnt // n          # small-bucket size
            big = cnt % n            # first `big` buckets hold size+1 rows
            cut = big * (size + 1)
            bucket = jnp.where(
                row_in_part < cut,
                row_in_part // jnp.maximum(size + 1, 1),
                big + (row_in_part - cut) // jnp.maximum(size, 1)) + 1
            return DeviceColumn(bucket.astype(jnp.int64), None, T.INT64)

        def _valid_lookup(ok):
            """Sorted-order lookup of valid rows (IGNORE NULLS machinery):
            W[g] = row index of the g-th valid row globally; B = valids
            before this partition; ca = valids at-or-before each row within
            its partition; total = valids per partition. One cumsum + one
            scatter (reference: NullTreatment::IgnoreNulls in
            functions-window lead_lag.rs / nth_value.rs)."""
            okl = ok.astype(jnp.int64)
            g_incl = jnp.cumsum(okl)
            gi = jnp.where(ok, g_incl - 1, cap)
            W = jnp.zeros(cap, jnp.int32).at[gi].set(
                iota.astype(jnp.int32), mode="drop")
            part_first = jnp.clip(iota - row_in_part, 0, cap - 1).astype(jnp.int32)
            B = (g_incl - okl)[part_first]
            ca = g_incl - B
            last = jnp.clip(part_first + jnp.maximum(my_count, 1) - 1,
                            0, cap - 1).astype(jnp.int32)
            total = g_incl[last] - B
            return W, B, ca, total

        if f in ("lead", "lag"):
            argc = eval_expr(w.args[0], rel)
            sdata = argc.data[perm]
            svalid = argc.valid()[perm]
            off = int(_lit(w.args[1])) if len(w.args) > 1 else 1
            if getattr(w, "ignore_nulls", False):
                ok = svalid & ssel
                W, B, ca, total = _valid_lookup(ok)
                if f == "lag":
                    local = (ca - ok.astype(jnp.int64)) - off
                    hit = (local >= 0) & ssel
                else:
                    local = ca + off - 1
                    hit = (local < total) & ssel
                row = W[jnp.clip(B + local, 0, cap - 1).astype(jnp.int32)]
                data = jnp.where(hit, sdata[jnp.clip(row, 0, cap - 1)],
                                 jnp.zeros_like(sdata))
                valid = hit & ssel
                dictionary = argc.dictionary
                if len(w.args) > 2:
                    dc = eval_expr(w.args[2], rel)
                    if argc.dtype.is_string or dc.dtype.is_string:
                        from .expr_compiler import unify_string_columns

                        uc, dc = unify_string_columns(argc, dc)
                        sdata = uc.data[perm]
                        data = jnp.where(
                            hit, sdata[jnp.clip(row, 0, cap - 1)],
                            jnp.zeros_like(sdata))
                        dictionary = uc.dictionary
                    dflt = dc.data[perm]
                    data = jnp.where(hit, data, dflt)
                    valid = jnp.where(hit, True, dc.valid()[perm]) & ssel
                return DeviceColumn(data, valid, argc.dtype, dictionary)
            shift = -off if f == "lead" else off
            src = iota + (off if f == "lead" else -off)
            in_range = (src >= 0) & (src < cap)
            srcc = jnp.clip(src, 0, cap - 1).astype(jnp.int32)
            same_part = seg[srcc] == seg
            valid = in_range & same_part & svalid[srcc] & ssel
            data = jnp.where(in_range, sdata[srcc], jnp.zeros_like(sdata))
            dictionary = argc.dictionary
            if len(w.args) > 2:  # default value (may be NULL or a string)
                dc = eval_expr(w.args[2], rel)
                if argc.dtype.is_string or dc.dtype.is_string:
                    from .expr_compiler import unify_string_columns

                    uc, dc = unify_string_columns(argc, dc)
                    sdata = uc.data[perm]
                    svalid = uc.valid()[perm]
                    data = jnp.where(in_range, sdata[srcc],
                                     jnp.zeros_like(sdata))
                    dictionary = uc.dictionary
                dflt = dc.data[perm]
                dvalid = dc.valid()[perm]
                hit = in_range & same_part
                data = jnp.where(hit, data, dflt)
                valid = jnp.where(hit, svalid[srcc], dvalid) & ssel
            return DeviceColumn(data, valid, argc.dtype, dictionary)

        # aggregates over the window
        argc = eval_expr(w.args[0], rel) if w.args else None
        has_order = len(w.order_by) > 0

        if f == "count" and argc is None:
            x = ssel.astype(jnp.int64)
        elif argc is not None:
            x = argc.data[perm]
        else:
            raise PlanError(f"window function {f} needs an argument")
        avalid = (argc.valid()[perm] & ssel) if argc is not None else ssel
        if wfilter is not None:
            # FILTER (WHERE pred): rows where pred is not TRUE contribute
            # nothing (NULL-argument semantics), but still receive output
            from .expr_compiler import eval_predicate as _evp

            avalid = avalid & _evp(wfilter, rel)[perm]

        if getattr(w, "ignore_nulls", False) and f in ("first_value",
                                                       "last_value"):
            # first/last NON-NULL within [partition start, last peer]
            if fs is not None:
                raise PlanError(
                    f"IGNORE NULLS with an explicit frame is not supported "
                    f"for {f!r}")
            W, B, ca, total = _valid_lookup(avalid)
            pe = jnp.clip(peer_end, 0, cap - 1).astype(jnp.int32)
            ca_pe = ca[pe]
            hit = (ca_pe > 0) & ssel
            local = jnp.zeros_like(ca_pe) if f == "first_value" else ca_pe - 1
            row = W[jnp.clip(B + local, 0, cap - 1).astype(jnp.int32)]
            data = jnp.where(hit, x[jnp.clip(row, 0, cap - 1)],
                             jnp.zeros_like(x))
            return DeviceColumn(data, hit, argc.dtype, argc.dictionary)
        if getattr(w, "ignore_nulls", False):
            raise PlanError(f"IGNORE NULLS is not supported for {f!r}")

        if f == "nth_value" and fs is None:
            # default frame: partition start .. last peer of current row
            fs = (iota - row_in_part).astype(jnp.int64)
            fe = peer_end
            fempty = ~ssel
        if fs is not None:
            return self._frame_agg(f, w, argc, x, avalid, ssel, fs, fe, fempty, out_t)

        if f == "first_value":
            # frame starts at the partition's first row; its value counts
            # even when NULL (reference default-frame semantics)
            my = jnp.clip(iota - row_in_part, 0, cap - 1).astype(jnp.int32)
            return DeviceColumn(x[my], avalid[my] & ssel, argc.dtype, argc.dictionary)
        if f == "last_value":
            # default frame: up to last peer of current row
            idx = jnp.clip(peer_end, 0, cap - 1).astype(jnp.int32)
            return DeviceColumn(x[idx], avalid[idx] & ssel, argc.dtype, argc.dictionary)

        if f in ("sum", "avg", "count", "min", "max"):
            if f in ("min", "max"):
                ident = K._max_ident(x.dtype) if f == "min" else K._min_ident(x.dtype)
                xm = jnp.where(avalid, x, ident)
                scan = _seg_cummin(xm, seg_start) if f == "min" else _seg_cummax(xm, seg_start)
                if has_order:
                    idx = jnp.clip(peer_end, 0, cap - 1).astype(jnp.int32)
                    vals = scan[idx]
                else:
                    red = K.segment_min if f == "min" else K.segment_max
                    per = red(x, seg, avalid, G)
                    vals = per[jnp.clip(seg, 0, G - 1)]
                cnt_run = _seg_cumsum(avalid.astype(jnp.int64), seg_start)
                idx2 = jnp.clip(peer_end, 0, cap - 1).astype(jnp.int32)
                nonzero = (cnt_run[idx2] > 0) if has_order else (
                    K.segment_count(seg, avalid, G)[jnp.clip(seg, 0, G - 1)] > 0)
                return DeviceColumn(vals, nonzero & ssel, argc.dtype, argc.dictionary)
            acc = jnp.where(avalid, x, jnp.zeros_like(x))
            if acc.dtype == jnp.bool_:
                acc = acc.astype(jnp.int64)
            run = _seg_cumsum(acc, seg_start)
            cnt_run = _seg_cumsum(avalid.astype(jnp.int64), seg_start)
            if has_order:
                idx = jnp.clip(peer_end, 0, cap - 1).astype(jnp.int32)
                s, c = run[idx], cnt_run[idx]
            else:
                s = K.segment_sum(acc, seg, avalid, G)[jnp.clip(seg, 0, G - 1)]
                c = K.segment_count(seg, avalid, G)[jnp.clip(seg, 0, G - 1)]
            if f == "count":
                return DeviceColumn(c.astype(jnp.int64), None, T.INT64)
            if f == "avg":
                cntf = jnp.maximum(c, 1).astype(jnp.float64)
                if argc.dtype.is_decimal and out_t.is_decimal:
                    num = s.astype(jnp.float64) * (
                        10.0 ** (out_t.scale - argc.dtype.scale))
                    return DeviceColumn(jnp.trunc(num / cntf).astype(jnp.int64),
                                        (c > 0) & ssel, out_t)
                arg_scale = 10.0 ** argc.dtype.scale if argc.dtype.is_decimal else 1.0
                a = (s.astype(jnp.float64) / arg_scale) / cntf
                return DeviceColumn(a, (c > 0) & ssel, T.FLOAT64)
            sdt = out_t
            return DeviceColumn(s.astype(sdt.np_dtype()), (c > 0) & ssel, sdt)

        from ..expr.udf import (active_registry, running_monoid_scan,
                                udf_input_array)

        reg = active_registry()
        udwf = reg.window(f) or reg.aggregate(f)
        if udwf is not None:
            xin = udf_input_array(
                DeviceColumn(x, None, argc.dtype, argc.dictionary)
                if argc is not None else DeviceColumn(x, None, T.INT64))
            idx = jnp.clip(peer_end, 0, cap - 1).astype(jnp.int32) \
                if has_order else jnp.clip(
                    iota - row_in_part + my_count - 1, 0, cap - 1
                ).astype(jnp.int32)
            vals = running_monoid_scan(udwf, xin, avalid, seg_start, idx)
            cnt_run = _seg_cumsum(avalid.astype(jnp.int64), seg_start)
            nonzero = cnt_run[idx] > 0
            validity = (nonzero & ssel) if udwf.nullable else None
            return DeviceColumn(vals.astype(udwf.return_type.np_dtype()),
                                validity, udwf.return_type)

        raise PlanError(f"window function {f!r} not implemented")

    def _frame_agg(self, f, w, argc, x, avalid, ssel, fs, fe, fempty, out_t):
        """Aggregate over explicit per-row frames [fs, fe] (sorted positions).

        sum/count/avg: inclusive prefix-sum differences (frames never cross
        partitions, so one global cumsum suffices). min/max: doubling
        sparse-table reduction (_range_reduce). first/last/nth_value: direct
        indexing. TPU analog of the reference's per-frame accumulator loop
        (physical-plan/src/windows/window_agg_exec.rs)."""
        cap = x.shape[0]
        live = ~fempty
        fsc = jnp.clip(fs, 0, cap - 1).astype(jnp.int32)
        fec = jnp.clip(fe, 0, cap - 1).astype(jnp.int32)
        iota = jnp.arange(cap, dtype=jnp.int64)

        cnt_cs = jnp.cumsum(avalid.astype(jnp.int64))
        c = jnp.where(live, cnt_cs[fec] - cnt_cs[fsc] + avalid[fsc].astype(jnp.int64), 0)

        if f in ("sum", "avg", "count"):
            acc = jnp.where(avalid, x, jnp.zeros_like(x))
            if acc.dtype == jnp.bool_:
                acc = acc.astype(jnp.int64)
            cs = jnp.cumsum(acc)
            s = jnp.where(live, cs[fec] - cs[fsc] + acc[fsc], jnp.zeros_like(acc))
            if f == "count":
                return DeviceColumn(c.astype(jnp.int64), None, T.INT64)
            if f == "avg":
                cntf = jnp.maximum(c, 1).astype(jnp.float64)
                if argc.dtype.is_decimal and out_t.is_decimal:
                    num = s.astype(jnp.float64) * (
                        10.0 ** (out_t.scale - argc.dtype.scale))
                    return DeviceColumn(jnp.trunc(num / cntf).astype(jnp.int64),
                                        (c > 0) & ssel, out_t)
                arg_scale = 10.0 ** argc.dtype.scale if argc.dtype.is_decimal else 1.0
                a = (s.astype(jnp.float64) / arg_scale) / cntf
                return DeviceColumn(a, (c > 0) & ssel, T.FLOAT64)
            return DeviceColumn(s.astype(out_t.np_dtype()), (c > 0) & ssel, out_t)

        if f in ("min", "max"):
            ident = K._max_ident(x.dtype) if f == "min" else K._min_ident(x.dtype)
            xm = jnp.where(avalid, x, ident)
            vals = _range_reduce(xm, fs, fe, fempty, f == "min", ident)
            return DeviceColumn(vals, (c > 0) & ssel, argc.dtype, argc.dictionary)

        if f in ("first_value", "last_value"):
            # first/last *valid* value inside the frame (consistent with the
            # default-frame path: NaN/NULL arguments are skipped)
            if f == "first_value":
                nxt = -jax.lax.cummax(
                    jnp.where(avalid, -iota, -(cap + 1))[::-1])[::-1]
                idx = nxt[fsc]
                ok = live & (idx <= fe)
            else:
                prv = jax.lax.cummax(jnp.where(avalid, iota, -jnp.ones_like(iota)))
                idx = prv[fec]
                ok = live & (idx >= fs)
            idxc = jnp.clip(idx, 0, cap - 1).astype(jnp.int32)
            return DeviceColumn(x[idxc], ok & ssel, argc.dtype, argc.dictionary)

        if f == "nth_value":
            n = int(_lit(w.args[1]))
            idx = fs + (n - 1)
            ok = live & (idx <= fe)
            idxc = jnp.clip(idx, 0, cap - 1).astype(jnp.int32)
            return DeviceColumn(x[idxc], ok & avalid[idxc] & ssel,
                                argc.dtype, argc.dictionary)

        raise PlanError(f"window function {f!r} not supported with an explicit frame")


def _norm_frame(frame):
    """Fold a frame equal to the SQL default (RANGE UNBOUNDED PRECEDING ..
    CURRENT ROW) to None so it shares the default compiled path."""
    if frame is not None and (frame.units, frame.start_kind, frame.end_kind) == (
            "range", "unbounded_preceding", "current_row"):
        return None
    return frame


def _lit(e: E.Expr):
    if isinstance(e, E.Literal):
        return e.value
    raise PlanError("expected literal window argument")


class WindowTopKExec(PhysicalPlan):
    """Per-group top-k: Filter(rank-predicate) over Window(rank fn) fused
    into ONE sort + segmented rank + inline compaction.

    Capability analog of the reference's PartitionedTopKExec
    (physical-plan/src/sorts/partitioned_topk.rs:175) and its window->topk
    rewrite (physical-optimizer/src/optimizer.rs TopK rules). The reference
    keeps a hash-of-heaps; on TPU random per-row heap updates cost ~10ns/row
    per pass, so the sort IS the cheapest primitive — the win here is
    skipping the inverse-permutation scatter of the rank lane, gathering the
    payload columns once for SURVIVORS only (<= groups*k rows instead of n),
    and emitting rows already sorted by (partition, order) so a downstream
    ORDER BY on the same prefix elides its sort.

    Discovery records the survivor capacity (`_last_cap`); the fused program
    guards it with an overflow flag like CompactExec."""

    RANK_FNS = ("row_number", "rank", "dense_rank")

    def __init__(self, input: PhysicalPlan, wexpr: E.Expr, op: E.Op, k: int,
                 schema: Schema):
        self.input = input
        self.wexpr = wexpr  # Alias(WindowFunction) | WindowFunction
        self.op = op        # E.Op.LE / LT / EQ over the rank value
        self.k = int(k)
        self.schema = schema
        self._last_cap = None

    def children(self):
        return (self.input,)

    @property
    def wfn(self) -> E.WindowFunction:
        w = self.wexpr.expr if isinstance(self.wexpr, E.Alias) else self.wexpr
        return w

    def _line(self):
        return (f"WindowTopKExec: {self.wfn.fname} {self.op.value} {self.k} "
                f"cap={self._last_cap}")

    # -- phase 1: sort + rank + survivor mask (rank positions are in sorted
    # order; `perm` maps sorted position -> original row) ------------------
    def _phase1(self, rel: DeviceRelation):
        w = self.wfn
        cap = rel.capacity
        pcols = [eval_expr(p, rel) for p in w.partition_by]
        ocols = [eval_expr(s.expr, rel) for s in w.order_by]
        keys = [(c.data, c.validity, False, False) for c in pcols]
        keys += [(c.data, c.validity, not s.asc, s.nulls_first)
                 for c, s in zip(ocols, w.order_by)]
        perm = K.sort_permutation(keys, rel.sel)
        flat = [rel.sel]
        for c in pcols + ocols:
            flat.append(c.data)
            if c.validity is not None:
                flat.append(c.validity)
        flat = K.gather_rows(flat, perm)
        ssel, flat = flat[0], flat[1:]
        sdata, svalid, j = [], [], 0
        for c in pcols + ocols:
            sdata.append(flat[j]); j += 1
            if c.validity is not None:
                svalid.append(flat[j]); j += 1
            else:
                svalid.append(None)
        np_ = len(pcols)
        if np_:
            _, seg_start, _ = K.segments_from_sorted_keys(
                sdata[:np_], svalid[:np_], ssel)
        else:
            seg_start = jnp.zeros(cap, dtype=bool).at[0].set(True)
        iota = jnp.arange(cap, dtype=jnp.int64)
        if w.fname == "row_number":
            rank = _seg_cumsum(jnp.ones(cap, dtype=jnp.int64), seg_start)
        else:
            if len(ocols):
                _, peer_start, _ = K.segments_from_sorted_keys(
                    sdata, svalid, ssel)
            else:
                peer_start = seg_start
            if w.fname == "dense_rank":
                rank = _seg_cumsum(peer_start.astype(jnp.int64), seg_start)
            else:  # rank
                last_seg = jax.lax.cummax(jnp.where(seg_start, iota, 0))
                last_peer = jax.lax.cummax(jnp.where(peer_start, iota, 0))
                rank = last_peer - last_seg + 1
        if self.op is E.Op.LE:
            keep = rank <= self.k
        elif self.op is E.Op.LT:
            keep = rank < self.k
        else:
            keep = rank == self.k
        return perm, rank.astype(jnp.int64), keep & ssel

    def _apply(self, rel: DeviceRelation, perm, rank, keep,
               cap: int) -> DeviceRelation:
        idx, total = K.compaction_indices(keep, cap)
        src = perm[idx]  # original row index of each survivor
        arrays, slots = [], []
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
        rank_out = K.gather_rows([rank], idx)[0]  # rank indexed sorted-side
        gathered = K.gather_rows(arrays, src)
        parts = [{} for _ in rel.columns]
        for (ci, attr), g in zip(slots, gathered):
            parts[ci][attr] = g
        cols = []
        for c, p in zip(rel.columns, parts):
            cols.append(DeviceColumn(
                p["data"], p.get("validity"), c.dtype, c.dictionary,
                c.bounds, p.get("lengths"), p.get("elem_valid")))
        cols.append(DeviceColumn(rank_out, None, T.INT64))
        sel = jnp.arange(cap, dtype=jnp.int32) < jnp.minimum(total, cap)
        return DeviceRelation(self.schema, tuple(cols), sel)

    def execute(self, ctx) -> DeviceRelation:
        from ..data.device import bucket_capacity

        rel = self.input.execute(ctx)
        perm, rank, keep = jax.jit(self._phase1)(rel)
        live = int(jax.device_get(jnp.sum(keep)))
        cap = bucket_capacity(max(live, 1))
        if self._last_cap is not None:
            cap = max(cap, self._last_cap)
        cap = min(cap, rel.capacity)
        self._last_cap = cap
        return self._timed(ctx, jax.jit(self._apply, static_argnums=4),
                           rel, perm, rank, keep, cap)


def rewrite_window_topk(filter_exec):
    """FilterExec(rank-cmp) over [Alias/Projection...] over WindowExec
    (single rank fn) -> the same chain over WindowTopKExec (reference
    rewrite: physical-optimizer/src/optimizer.rs TopK window rules). The
    predicate column must trace to the window's rank output through pure
    column renames. Returns None when the pattern does not apply."""
    from . import plan as P
    from .planner import AliasExec

    pred = filter_exec.predicate
    if not isinstance(pred, E.BinaryOp) or not pred.op.is_comparison:
        return None
    left, right, op = pred.left, pred.right, pred.op
    flip = {E.Op.GT: E.Op.LT, E.Op.GE: E.Op.LE, E.Op.LT: E.Op.GT,
            E.Op.LE: E.Op.GE, E.Op.EQ: E.Op.EQ}
    if isinstance(right, E.Column) and isinstance(left, E.Literal):
        left, right, op = right, left, flip[op]
    if not (isinstance(left, E.Column) and isinstance(right, E.Literal)):
        return None
    if not isinstance(right.value, int) or isinstance(right.value, bool):
        return None
    k = int(right.value)
    if op is E.Op.EQ and k != 1:
        # rank = k keeps a non-prefix slice; only the k=1 form is a top-k
        return None
    if op not in (E.Op.LE, E.Op.LT, E.Op.EQ):
        return None

    # trace the predicate column down through rename-only layers
    node = filter_exec.input
    try:
        idx = node.schema.find(left.flat_name)
        if idx is None:
            idx = node.schema.find(left.cname)
    except PlanError:
        idx = None
    if idx is None:
        return None
    chain = []  # outermost-first rename layers to re-apply above the top-k
    while True:
        if isinstance(node, AliasExec):
            chain.append(node)
            node = node.input
            continue
        if isinstance(node, P.ProjectionExec):
            e = node.exprs[idx]
            base = e.expr if isinstance(e, E.Alias) else e
            if not isinstance(base, E.Column):
                return None
            try:
                nidx = node.input.schema.find(base.flat_name)
                if nidx is None:
                    nidx = node.input.schema.find(base.cname)
            except PlanError:
                return None
            if nidx is None:
                return None
            chain.append(node)
            node, idx = node.input, nidx
            continue
        break
    w = node
    if not isinstance(w, WindowExec) or len(w.window_exprs) != 1:
        return None
    if idx != len(w.schema) - 1:
        return None  # the filtered column is not the window output
    wexpr = w.window_exprs[0]
    wf = wexpr.expr if isinstance(wexpr, E.Alias) else wexpr
    if not isinstance(wf, E.WindowFunction) \
            or wf.fname not in WindowTopKExec.RANK_FNS:
        return None
    if _norm_frame(wf.frame) is not None:
        return None
    cur = WindowTopKExec(w.input, wexpr, op, k, w.schema)
    for n in reversed(chain):
        if isinstance(n, AliasExec):
            cur = AliasExec(cur, n.schema)
        else:
            cur = P.ProjectionExec(cur, n.exprs, n.schema)
    return cur
