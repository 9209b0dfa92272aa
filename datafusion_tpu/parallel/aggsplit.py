"""Partial/Final aggregation split for distributed execution.

The TPU-native analog of the reference's AggregateMode::{Partial,Final,
FinalPartitioned,PartialReduce} (physical-plan/src/aggregates/mod.rs:282-357)
and the GroupsAccumulator state contract (update_batch / state / merge_batch
/ evaluate, expr-common/src/groups_accumulator.rs:126-245): each decomposable
aggregate is rewritten into per-group STATE columns computed locally on every
shard (Partial), merged across shards (Final), then finalized into the output
column.

Two merge transports, chosen by the group-key shape:
  * dense small-domain keys -> states live at fixed group positions on every
    shard, so the merge is a bare psum/pmin/pmax over the mesh axis (the
    PartialReduce tree-reduction, no exchange at all); output replicated.
  * arbitrary keys -> per-shard partial states are hash-exchanged by group
    key (all_to_all) and re-reduced locally (Partial -> RepartitionExec::Hash
    -> Final); output partitioned, each group on exactly one shard.

Non-decomposable aggregates (DISTINCT, median/percentiles) fall back to
row-exchange + single-phase local aggregation in parallel/engine.py, which
is exact for everything.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..common import types as T
from ..data.device import DeviceColumn, DeviceRelation
from ..ops import groupby as G
from ..ops import kernels as K
from .distributed import exchange_by_key

_DECOMPOSABLE = frozenset({
    "count", "count_star", "sum", "avg", "min", "max",
    "var", "var_samp", "var_pop", "stddev", "stddev_samp", "stddev_pop",
    "bool_and", "bool_or", "corr", "covar", "covar_pop", "covar_samp",
    "bit_and", "bit_or", "bit_xor",
    "regr_slope", "regr_intercept", "regr_count", "regr_r2", "regr_avgx",
    "regr_avgy", "regr_sxx", "regr_syy", "regr_sxy",
})


def decomposable(specs: Sequence[G.AggSpec]) -> bool:
    return all((not s.distinct) and s.order_arg is None
               and s.fname in _DECOMPOSABLE for s in specs)


@dataclasses.dataclass
class _Final:
    kind: str            # count/sum/avg/minmax/var/corr/bool
    slots: List[int]     # indices into the merged state column list
    spec: G.AggSpec
    scale: float = 1.0   # decimal scale divisor for avg
    bool_out: bool = False


@dataclasses.dataclass
class StatePlan:
    state_args: List[DeviceColumn]   # partial-phase aggregate arguments
    state_specs: List[G.AggSpec]     # partial-phase aggregates (one per state)
    merge_specs: List[G.AggSpec]     # final-phase merge over the state cols
    merge_kinds: List[str]           # 'sum' | 'min' | 'max' (for psum path)
    finals: List[_Final]


def _f64_scaled(col: DeviceColumn, validity=None) -> DeviceColumn:
    x = col.data.astype(jnp.float64)
    if col.dtype.is_decimal:
        x = x / (10.0 ** col.dtype.scale)
    return DeviceColumn(x, validity if validity is not None else col.validity,
                        T.FLOAT64)


def build_state_plan(specs: Sequence[G.AggSpec],
                     arg_cols: Sequence[DeviceColumn]) -> StatePlan:
    sp = StatePlan([], [], [], [], [])

    def add_state(fname: str, col: Optional[DeviceColumn], out_dtype, filt,
                  merge: str, arg_dtype=None) -> int:
        arg_i = None
        if col is not None:
            arg_i = len(sp.state_args)
            sp.state_args.append(col)
            arg_dtype = arg_dtype or col.dtype
        sp.state_specs.append(G.AggSpec(fname, arg_i, False, out_dtype,
                                        arg_dtype, filt))
        state_i = len(sp.merge_specs)
        sp.merge_specs.append(G.AggSpec(merge, state_i, False, out_dtype,
                                        out_dtype, None))
        sp.merge_kinds.append("min" if merge in ("min", "bool_and")
                              else "max" if merge in ("max", "bool_or")
                              else "bitop" if merge.startswith("bit_")
                              else "sum")
        return state_i

    for s in specs:
        f = s.fname
        arg = arg_cols[s.arg] if s.arg is not None else None
        if f == "count_star":
            i = add_state("count_star", None, T.INT64, s.filter, "sum")
            sp.finals.append(_Final("count", [i], s))
        elif f == "count":
            i = add_state("count", arg, T.INT64, s.filter, "sum")
            sp.finals.append(_Final("count", [i], s))
        elif f == "sum":
            if s.out_dtype.is_decimal or (arg.dtype.is_integer
                                          and not s.out_dtype.is_float):
                sdt = s.out_dtype if s.out_dtype.is_decimal else T.INT64
            else:
                sdt = T.FLOAT64
            i = add_state("sum", arg, sdt, s.filter, "sum")
            c = add_state("count", arg, T.INT64, s.filter, "sum")
            sp.finals.append(_Final("sum", [i, c], s))
        elif f == "avg":
            if arg.dtype.is_decimal:
                # exact int64 scaled partial sums; divide once at the end
                i = add_state("sum", arg, arg.dtype, s.filter, "sum")
                scale = 10.0 ** arg.dtype.scale
            else:
                i = add_state("sum", _f64_scaled(arg), T.FLOAT64, s.filter, "sum")
                scale = 1.0
            c = add_state("count", arg, T.INT64, s.filter, "sum")
            sp.finals.append(_Final("avg", [i, c], s, scale=scale))
        elif f in ("min", "max"):
            i = add_state(f, arg, s.out_dtype, s.filter, f)
            c = add_state("count", arg, T.INT64, s.filter, "sum")
            sp.finals.append(_Final("minmax", [i, c], s))
        elif f in ("bool_and", "bool_or"):
            i = add_state(f, arg, T.BOOL, s.filter, f)
            c = add_state("count", arg, T.INT64, s.filter, "sum")
            sp.finals.append(_Final("bool", [i, c], s, bool_out=True))
        elif f in ("var", "var_samp", "var_pop", "stddev", "stddev_samp",
                   "stddev_pop"):
            x = _f64_scaled(arg)
            x2 = DeviceColumn(x.data * x.data, x.validity, T.FLOAT64)
            i1 = add_state("sum", x, T.FLOAT64, s.filter, "sum")
            i2 = add_state("sum", x2, T.FLOAT64, s.filter, "sum")
            c = add_state("count", arg, T.INT64, s.filter, "sum")
            sp.finals.append(_Final("var", [i1, i2, c], s))
        elif f in ("bit_and", "bit_or", "bit_xor"):
            i = add_state(f, arg, s.out_dtype, s.filter, f)
            c = add_state("count", arg, T.INT64, s.filter, "sum")
            sp.finals.append(_Final("minmax", [i, c], s))
        elif f.startswith("regr_"):
            # (y, x) sums with both-non-null pairing; same state vector as
            # corr so the finalize formulas share the slots layout
            y_col, x_col = arg, arg_cols[s.arg + 1]
            both = None
            if y_col.validity is not None or x_col.validity is not None:
                both = y_col.valid() & x_col.valid()
            xf = _f64_scaled(x_col, both)
            yf = _f64_scaled(y_col, both)
            prods = [
                xf, yf,
                DeviceColumn(xf.data * yf.data, both, T.FLOAT64),
                DeviceColumn(xf.data * xf.data, both, T.FLOAT64),
                DeviceColumn(yf.data * yf.data, both, T.FLOAT64),
            ]
            slots = [add_state("sum", pc, T.FLOAT64, s.filter, "sum")
                     for pc in prods]
            slots.append(add_state("count", xf, T.INT64, s.filter, "sum"))
            sp.finals.append(_Final("regr", slots, s))
        elif f in ("corr", "covar", "covar_pop", "covar_samp"):
            y = arg_cols[s.arg + 1]
            both = None
            if arg.validity is not None or y.validity is not None:
                both = arg.valid() & y.valid()
            xf = _f64_scaled(arg, both)
            yf = _f64_scaled(y, both)
            prods = [
                xf, yf,
                DeviceColumn(xf.data * yf.data, both, T.FLOAT64),
                DeviceColumn(xf.data * xf.data, both, T.FLOAT64),
                DeviceColumn(yf.data * yf.data, both, T.FLOAT64),
            ]
            slots = [add_state("sum", pc, T.FLOAT64, s.filter, "sum")
                     for pc in prods]
            slots.append(add_state("count", xf, T.INT64, s.filter, "sum"))
            sp.finals.append(_Final("corr", slots, s))
        else:
            raise ValueError(f"not decomposable: {f}")
    return sp


def finalize(sp: StatePlan, merged: Sequence[DeviceColumn],
             out_sel: jax.Array) -> List[DeviceColumn]:
    out = []
    for fin in sp.finals:
        s = fin.spec
        if fin.kind == "count":
            out.append(DeviceColumn(merged[fin.slots[0]].data.astype(jnp.int64),
                                    None, T.INT64))
            continue
        cnt = merged[fin.slots[-1]].data
        nonempty = (cnt > 0) & out_sel
        if fin.kind in ("sum", "minmax", "bool"):
            v = merged[fin.slots[0]]
            data = v.data.astype(jnp.bool_) if fin.bool_out else v.data
            out.append(DeviceColumn(data, nonempty, s.out_dtype, v.dictionary))
        elif fin.kind == "avg":
            ssum = merged[fin.slots[0]].data.astype(jnp.float64)
            cntf = jnp.maximum(cnt, 1).astype(jnp.float64)
            if s.out_dtype.is_decimal:
                # exact scaled-int partial sums -> rounded division to the
                # output scale (matches the single-device decimal avg)
                num = ssum * (10.0 ** s.out_dtype.scale) / fin.scale
                out.append(DeviceColumn(
                    jnp.trunc(num / cntf).astype(jnp.int64), nonempty,
                    s.out_dtype))
            else:
                a = (ssum / fin.scale) / cntf
                out.append(DeviceColumn(a, nonempty, T.FLOAT64))
        elif fin.kind == "var":
            ssum = merged[fin.slots[0]].data
            s2 = merged[fin.slots[1]].data
            cn = cnt.astype(jnp.float64)
            pop = s.fname.endswith("_pop")
            denom = jnp.maximum(cn if pop else cn - 1.0, 1.0)
            var = jnp.maximum((s2 - ssum * ssum / jnp.maximum(cn, 1.0)) / denom, 0.0)
            val = jnp.sqrt(var) if s.fname.startswith("stddev") else var
            min_n = 1.0 if pop else 2.0
            out.append(DeviceColumn(val, (cn >= min_n) & out_sel, T.FLOAT64))
        elif fin.kind == "regr":
            sx, sy, sxy, sxx, syy = (merged[i].data for i in fin.slots[:5])
            # state order is (x, y, xy, xx, yy) with y the first argument
            sx, sy = sx, sy
            if s.fname == "regr_count":
                out.append(DeviceColumn(cnt.astype(jnp.int64), None, T.INT64))
                continue
            cn = jnp.maximum(cnt.astype(jnp.float64), 1.0)
            Sxx = sxx - sx * sx / cn
            Syy = syy - sy * sy / cn
            Sxy = sxy - sx * sy / cn
            if s.fname == "regr_avgx":
                out.append(DeviceColumn(sx / cn, nonempty, T.FLOAT64))
                continue
            if s.fname == "regr_avgy":
                out.append(DeviceColumn(sy / cn, nonempty, T.FLOAT64))
                continue
            if s.fname == "regr_sxx":
                out.append(DeviceColumn(Sxx, nonempty, T.FLOAT64))
                continue
            if s.fname == "regr_syy":
                out.append(DeviceColumn(Syy, nonempty, T.FLOAT64))
                continue
            if s.fname == "regr_sxy":
                out.append(DeviceColumn(Sxy, nonempty, T.FLOAT64))
                continue
            ok = nonempty & (Sxx > 0)
            slope = Sxy / jnp.where(Sxx > 0, Sxx, 1.0)
            if s.fname == "regr_slope":
                out.append(DeviceColumn(slope, ok, T.FLOAT64))
            elif s.fname == "regr_intercept":
                out.append(DeviceColumn(sy / cn - slope * sx / cn, ok, T.FLOAT64))
            else:  # regr_r2
                r2 = jnp.where(Syy > 0,
                               (Sxy * Sxy) / jnp.where((Sxx > 0) & (Syy > 0),
                                                       Sxx * Syy, 1.0),
                               1.0)
                out.append(DeviceColumn(r2, ok, T.FLOAT64))
        elif fin.kind == "corr":
            sx, sy, sxy, sxx, syy = (merged[i].data for i in fin.slots[:5])
            cn = jnp.maximum(cnt.astype(jnp.float64), 1.0)
            cov = sxy - sx * sy / cn
            if s.fname == "corr":
                vx = sxx - sx * sx / cn
                vy = syy - sy * sy / cn
                denom = jnp.sqrt(jnp.maximum(vx * vy, 0.0))
                val = jnp.where(denom > 0, cov / denom, jnp.nan)
                out.append(DeviceColumn(val, (cnt >= 2) & out_sel, T.FLOAT64))
            else:
                pop = s.fname == "covar_pop"
                denom = cn if pop else jnp.maximum(cnt.astype(jnp.float64) - 1.0, 1.0)
                min_n = 1 if pop else 2
                out.append(DeviceColumn(cov / denom, (cnt >= min_n) & out_sel,
                                        T.FLOAT64))
        else:
            raise ValueError(fin.kind)
    return out


# ---------------------------------------------------------------------------
# the two distributed drivers (called inside shard_map tracing)
# ---------------------------------------------------------------------------

def dense_partial_final(p, rel: DeviceRelation, axis: str, sizes,
                        ngroups: int, options=None) -> Optional[DeviceRelation]:
    """Small-domain keys: local dense partial states + psum/pmin/pmax merge
    (PartialReduce). approx_distinct joins the split as a HyperLogLog
    register plane merged by pmax when execution.approx_distinct_hll is on
    (reference: approx_distinct.rs HLL accumulator merge_batch). Returns a
    REPLICATED relation, or None if not decomposable."""
    from ..physical.expr_compiler import eval_expr

    group_cols = [eval_expr(g, rel) for g in p.group_exprs]
    _, arg_cols, filter_cols, specs = p._prepare(rel)
    hll_pos = [i for i, s in enumerate(specs)
               if s.fname == "approx_distinct" and not s.distinct
               and s.arg is not None]
    hll_on = bool((options or {}).get("execution.approx_distinct_hll", False))
    if hll_pos:
        from ..ops import hll

        # plane budget: G * 4096 registers * 4B per sketch
        if (not hll_on or not decomposable(
                [s for i, s in enumerate(specs) if i not in hll_pos])
                or ngroups * hll.M * 4 > (1 << 28)):
            return None
        specs_nh = [s for i, s in enumerate(specs) if i not in hll_pos]
    else:
        if not decomposable(specs):
            return None
        specs_nh = list(specs)
    # spec.arg indexes into the FULL arg_cols list; pass it unfiltered
    sp = build_state_plan(specs_nh, arg_cols)
    if "bitop" in sp.merge_kinds:
        return None  # no bitwise mesh collective; use the exchange path
    seg, strides = p.dense_seg(group_cols, rel.sel, sizes, ngroups)
    is_start = jnp.zeros(rel.capacity, dtype=bool)
    ones = jnp.ones(ngroups, dtype=bool)
    group_count = K.segment_count(seg, rel.sel, ngroups)
    states = [
        G._reduce_one(spec, sp.state_args, filter_cols, rel.sel, seg, is_start,
                      None, ngroups, group_count, ones)
        for spec in sp.state_specs
    ]
    merged = []
    for col, kind in zip(states, sp.merge_kinds):
        data = col.data
        as_bool = data.dtype == jnp.bool_
        if as_bool:
            data = data.astype(jnp.int32)
        if kind == "sum":
            data = jax.lax.psum(data, axis)
        elif kind == "min":
            data = jax.lax.pmin(data, axis)
        else:
            data = jax.lax.pmax(data, axis)
        if as_bool:
            data = data.astype(jnp.bool_)
        merged.append(DeviceColumn(data, None, col.dtype, col.dictionary))
    total_count = jax.lax.psum(group_count, axis)
    out_sel = total_count > 0
    out_keys = p.dense_keys(group_cols, sizes, strides, ngroups)
    out_aggs = finalize(sp, merged, out_sel)
    if hll_pos:
        from ..ops import hll

        ests = {}
        for i in hll_pos:
            spec = specs[i]
            col = arg_cols[i]
            mask = rel.sel & col.valid()
            if spec.filter is not None:
                mask = mask & filter_cols[spec.filter]
            h, _ = hll.hashes_for_column(col)
            regs = hll.build_registers(h, seg, mask, ngroups)
            regs = jax.lax.pmax(regs, axis)  # sketch union = register max
            ests[i] = DeviceColumn(hll.estimate(regs), None, T.INT64)
        full = []
        it = iter(out_aggs)
        for i in range(len(specs)):
            full.append(ests[i] if i in ests else next(it))
        out_aggs = full
    # The psum-merged result is replicated on every shard, but the engine's
    # static distribution analysis (engine.dist_of) cannot see dense-ness, so
    # emit it PARTITIONED: shard i owns groups with id % n == i (round-robin
    # ownership masks the replicas; the global concat has each group once).
    n = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    gid = jnp.arange(ngroups, dtype=jnp.int32)
    out_sel = out_sel & ((gid % n) == me)
    cols = [p._coerce_out(c, f)
            for c, f in zip(out_keys + out_aggs, p.schema.fields)]
    return DeviceRelation(p.schema, tuple(cols), out_sel)


def sorted_partial_final(p, rel: DeviceRelation, axis: str, options=None) -> Optional[DeviceRelation]:
    """Arbitrary keys: local sorted partial states -> hash exchange of
    (keys, states) -> local merge reduce. Returns a PARTITIONED relation, or
    None if not decomposable / capacity undiscovered."""
    cap = getattr(p, "_last_cap", None)
    if cap is None:
        return None
    group_cols, arg_cols, filter_cols, specs = p._prepare(rel)
    hll_pos = [i for i, s in enumerate(specs)
               if s.fname == "approx_distinct" and not s.distinct
               and s.arg is not None]
    hll_on = bool((options or {}).get("execution.approx_distinct_hll", False))
    if hll_pos:
        from ..ops import hll

        # register-plane budget: cap groups x M registers x 4B per sketch
        if (not hll_on or cap * hll.M * 4 > (1 << 28) or not decomposable(
                [s for i, s in enumerate(specs) if i not in hll_pos])):
            return None
        sp = build_state_plan(
            [s for i, s in enumerate(specs) if i not in hll_pos], arg_cols)
    else:
        if not decomposable(specs):
            return None
        sp = build_state_plan(specs, arg_cols)

    # Partial: per-shard sorted aggregation into state columns; HLL args
    # ride the same sort so register building reuses this phase's segments
    extra = [arg_cols[i] for i in hll_pos]
    sg, sa, sf, ssel, seg, is_start, _, _ = G.phase_sort(
        group_cols, list(sp.state_args) + extra, filter_cols, rel.sel, None)
    sorted_extra = sa[len(sp.state_args):]
    sa = sa[:len(sp.state_args)]
    out_keys, out_states, out_sel = G.phase_reduce(
        sg, sa, sf, ssel, seg, is_start, None, sp.state_specs, cap)
    planes = []
    if hll_pos:
        from ..ops import hll

        for i, col in zip(hll_pos, sorted_extra):
            spec = specs[i]
            mask = ssel & col.valid()
            if spec.filter is not None:
                mask = mask & sf[spec.filter]
            h, _ = hll.hashes_for_column(col)
            planes.append(hll.build_registers(h, seg, mask, cap))

    # Exchange partial (keys, states) rows by group-key hash; slot_cap = cap
    # is overflow-proof (a shard holds at most cap partial groups)
    hs: List[jax.Array] = []
    for k in out_keys:
        hs.append(k.data)
        if k.validity is not None:
            hs.append(k.validity)
    h = K.hash64(hs)
    leaves, treedef = jax.tree.flatten((tuple(out_keys), tuple(out_states)))
    nleaves = len(leaves)
    outs, new_sel, _dropped = exchange_by_key(leaves + planes, h, out_sel,
                                              axis, slot_cap=cap)
    rkeys, rstates = jax.tree.unflatten(treedef, outs[:nleaves])
    rplanes = outs[nleaves:]
    # receive buffers zero-fill unoccupied slots; bounds promise EVERY
    # physical slot is in-interval (the packed-sort-key contract), so widen
    # to cover 0 before the final-phase sort packs keys from them
    def _cover_zero(c: DeviceColumn) -> DeviceColumn:
        if c.bounds is None:
            return c
        b = (min(int(c.bounds[0]), 0), max(int(c.bounds[1]), 0))
        return DeviceColumn(c.data, c.validity, c.dtype, c.dictionary, b,
                            c.lengths, c.elem_valid, c.meta)

    rkeys = tuple(_cover_zero(c) for c in rkeys)
    rstates = tuple(_cover_zero(c) for c in rstates)

    # Final: merge received states per group (HLL planes ride the sort as
    # 2-D payload rows, then union by a per-group scatter-max)
    plane_cols = [DeviceColumn(pl, None, T.list_of(T.INT32)) for pl in rplanes]
    sg2, sa2, sf2, ssel2, seg2, is_start2, _, _ = G.phase_sort(
        list(rkeys), list(rstates) + plane_cols, [], new_sel, None)
    sorted_planes = sa2[len(rstates):]
    sa2 = sa2[:len(rstates)]
    mkeys, mstates, msel = G.phase_reduce(
        sg2, sa2, sf2, ssel2, seg2, is_start2, None, sp.merge_specs, cap)
    out_aggs = finalize(sp, mstates, msel)
    if hll_pos:
        from ..ops import hll

        g = jnp.where(ssel2, seg2, cap)
        ests = {}
        for i, pc in zip(hll_pos, sorted_planes):
            merged_regs = jnp.zeros((cap, hll.M), jnp.int32) \
                .at[g].max(pc.data, mode="drop")
            ests[i] = DeviceColumn(hll.estimate(merged_regs), None, T.INT64)
        full = []
        it = iter(out_aggs)
        for i in range(len(specs)):
            full.append(ests[i] if i in ests else next(it))
        out_aggs = full
    cols = [p._coerce_out(c, f)
            for c, f in zip(list(mkeys) + out_aggs, p.schema.fields)]
    return DeviceRelation(p.schema, tuple(cols), msel)
