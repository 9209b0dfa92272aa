"""Pallas TPU kernel: exact 64-bit grouped product-sum aggregation on 32-bit
vector lanes.

The decimal-exact aggregation path (SURVEY.md §7 'Bit-exactness') needs
64-bit sums of 32x32-bit products (e.g. TPC-H Q1's
sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) over scaled-integer
decimals), but the TPU VPU is 32-bit-lane hardware.  This kernel implements
the missing 64-bit arithmetic (pallas_guide.md: "If something is not
available in pallas, you should implement it"):

* widening signed 32x32 -> 64 multiply via 16-bit limb products,
* exact block reduction of (hi, lo) u32 pairs using the identity
  sum(hi_i * 2^32 + lo_i) mod 2^64
    = ((sum(hi_i) + carry(sum lo)) mod 2^32) << 32 | (sum lo mod 2^32),
  with sum(lo_i) itself reduced exactly via 16-bit limb sums.

`dense_groupby_sums` fuses ALL aggregates of a dense-small-G group-by into a
single streaming pass: each input column is read from HBM exactly once for
the whole aggregation (the XLA segment_sum lowering reads once per
aggregate), which is the HBM-roofline shape for Q1-style queries.
Used by AggregateExec's dense path when eligible; jnp fallback otherwise.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLOCK_ROWS = 2048


# ---------------------------------------------------------------------------
# emulated 64-bit vector arithmetic on u32 pairs
# ---------------------------------------------------------------------------


def add64(hi_a, lo_a, hi_b, lo_b):
    lo = lo_a + lo_b  # u32 wraparound
    carry = (lo < lo_a).astype(jnp.uint32)
    return hi_a + hi_b + carry, lo


def neg64(hi, lo):
    lo_n = (~lo) + jnp.uint32(1)
    borrow = (lo_n == 0).astype(jnp.uint32)
    return (~hi) + borrow, lo_n


def umul32x32(a, b):
    """u32 x u32 -> (hi, lo) via 16-bit limbs."""
    mask = jnp.uint32(0xFFFF)
    al, ah = a & mask, a >> 16
    bl, bh = b & mask, b >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    mid = lh + (ll >> 16) + (hl & mask)  # <= ~2^33? fits: each <= 2^32-2^17
    lo = (ll & mask) | (mid << 16)
    hi = hh + (mid >> 16) + (hl >> 16)
    return hi, lo


def smul32x32(a, b):
    """Signed 32x32 -> two's-complement 64-bit (hi, lo) pair."""
    neg = (a < 0) != (b < 0)
    ua = jnp.abs(a).astype(jnp.uint32)
    ub = jnp.abs(b).astype(jnp.uint32)
    hi, lo = umul32x32(ua, ub)
    nhi, nlo = neg64(hi, lo)
    negu = neg.astype(jnp.uint32)
    hi = jnp.where(negu > 0, nhi, hi)
    lo = jnp.where(negu > 0, nlo, lo)
    return hi, lo


def _reduce_pair_lanewise(phi, plo):
    """Exact mod-2^64 reduction of elementwise (hi, lo) pairs over the
    SUBLANE axis only, keeping 128 per-lane partial pairs (Mosaic forbids
    scalar reductions/stores; the final 128-lane combine happens outside the
    kernel in plain jnp int64).

    dtype=uint32 sums are load-bearing: mod-2^32 wraparound is the algorithm
    (jnp.sum would promote to uint64 under x64).
    sum(hi_i * 2^32 + lo_i) mod 2^64
      = ((sum hi_i + carry(sum lo)) mod 2^32) << 32 | (sum lo mod 2^32)."""
    # Mosaic lacks unsigned reductions: limb sums fit int32 exactly, and the
    # full-width sum relies on two's-complement wraparound == mod 2^32.
    mask = jnp.uint32(0xFFFF)
    sl = jnp.sum((plo & mask).astype(jnp.int32), axis=0,
                 dtype=jnp.int32).astype(jnp.uint32)     # [128], exact (<=2^27)
    sh = jnp.sum((plo >> 16).astype(jnp.int32), axis=0,
                 dtype=jnp.int32).astype(jnp.uint32)     # [128], exact
    cl = (sl + (sh << 16)).astype(jnp.uint32)            # wraparound intended
    ch = ((sh >> 16) + (cl < sl).astype(jnp.uint32)).astype(jnp.uint32)
    shi = jnp.sum(phi.astype(jnp.int32), axis=0,
                  dtype=jnp.int32).astype(jnp.uint32)    # mod 2^32 by design
    return (shi + ch).astype(jnp.uint32), cl


def pair_to_i64(hi, lo):
    return (hi.astype(jnp.uint64) << 32 | lo.astype(jnp.uint64)).astype(jnp.int64)


# ---------------------------------------------------------------------------
# fused dense-group product-sum kernel
# ---------------------------------------------------------------------------


def _kernel(seg_ref, mask_ref, *refs, G: int, n_aggs: int):
    a_refs = refs[:n_aggs]
    b_refs = refs[n_aggs:2 * n_aggs]
    out_hi_ref, out_lo_ref, cnt_ref = refs[2 * n_aggs:]

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_hi_ref[:, :] = jnp.zeros_like(out_hi_ref)
        out_lo_ref[:, :] = jnp.zeros_like(out_lo_ref)
        cnt_ref[:, :] = jnp.zeros_like(cnt_ref)

    seg = seg_ref[:, :]
    live = mask_ref[:, :]

    prods = []
    for ai in range(n_aggs):
        prods.append(smul32x32(a_refs[ai][:, :], b_refs[ai][:, :]))

    for g in range(G):
        sel = live & (seg == g)
        cnt_ref[g, :] = cnt_ref[g, :] + jnp.sum(sel, axis=0, dtype=jnp.int32)
        selu = sel.astype(jnp.uint32)
        for ai in range(n_aggs):
            phi, plo = prods[ai]
            mhi = jnp.where(selu > 0, phi, jnp.uint32(0))
            mlo = jnp.where(selu > 0, plo, jnp.uint32(0))
            bh, bl = _reduce_pair_lanewise(mhi, mlo)  # [128] per-lane pairs
            row = g * n_aggs + ai
            oh = out_hi_ref[row, :]
            ol = out_lo_ref[row, :]
            nh, nl = add64(oh, ol, bh, bl)
            out_hi_ref[row, :] = nh
            out_lo_ref[row, :] = nl


def dense_groupby_sums(
    seg: jax.Array,        # [N] int32 dense group ids (out-of-range = dropped)
    mask: jax.Array,       # [N] bool live rows
    pairs: Sequence[Tuple[jax.Array, Optional[jax.Array]]],  # (a, b) int32; b=None -> 1
    G: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Single-pass fused sums of a_i * b_i per group + group counts.

    Returns (sums[G, n_aggs] int64, counts[G] int64).  N must be a multiple
    of BLOCK_ROWS (device capacities are powers of two)."""
    n = seg.shape[0]
    if not pairs:  # count-only: keep one dummy product column
        pairs = [(jnp.zeros(n, jnp.int32), None)]
    n_aggs = len(pairs)
    assert n % BLOCK_ROWS == 0 and n >= BLOCK_ROWS, n
    rows = BLOCK_ROWS // LANES
    grid = n // BLOCK_ROWS

    def shape2d(x):
        return x.reshape(n // LANES, LANES)

    ones = jnp.ones(n, dtype=jnp.int32)
    a_cols = [shape2d(a.astype(jnp.int32)) for a, _ in pairs]
    b_cols = [shape2d((b if b is not None else ones).astype(jnp.int32)) for _, b in pairs]

    # mask out-of-range segments up front so the kernel compare is enough
    live = mask & (seg >= 0) & (seg < G)

    gn = G * n_aggs
    in_specs = (
        [pl.BlockSpec((rows, LANES), lambda i: (i, 0))] * (2 + 2 * n_aggs)
    )
    out_specs = (
        pl.BlockSpec((gn, LANES), lambda i: (0, 0)),
        pl.BlockSpec((gn, LANES), lambda i: (0, 0)),
        pl.BlockSpec((G, LANES), lambda i: (0, 0)),
    )
    out_shapes = (
        jax.ShapeDtypeStruct((gn, LANES), jnp.uint32),
        jax.ShapeDtypeStruct((gn, LANES), jnp.uint32),
        jax.ShapeDtypeStruct((G, LANES), jnp.int32),
    )
    # Scoped 32-bit mode: under jax_enable_x64 the pallas_call scaffolding
    # emits i64 that Mosaic cannot legalize; every value crossing the kernel
    # boundary here is explicitly 32-bit, so tracing in 32-bit mode is safe.
    with jax.enable_x64(False):
        hi, lo, cnt = pl.pallas_call(
            partial(_kernel, G=G, n_aggs=n_aggs),
            grid=(grid,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
        )(shape2d(seg), shape2d(live), *a_cols, *b_cols)
    # final 128-lane combine in real int64 (outside the 32-bit kernel)
    lane_vals = pair_to_i64(hi, lo)  # [G*n_aggs, 128]
    sums = jnp.sum(lane_vals, axis=1).reshape(G, n_aggs)
    counts = jnp.sum(cnt, axis=1).astype(jnp.int64)
    return sums, counts
