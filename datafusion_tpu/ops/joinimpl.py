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


def gather_columns(
    cols: Sequence[DeviceColumn],
    idx: jax.Array,
    row_valid: jax.Array,
    null_extend: Optional[jax.Array] = None,
) -> List[DeviceColumn]:
    """Gather columns at idx; rows where null_extend is True become NULL."""
    out = []
    n = cols[0].capacity if cols else 0
    # keep the gathers out of enclosing fusions (see kernels.join_expand)
    safe = jax.lax.optimization_barrier(jnp.clip(idx, 0, max(n - 1, 0)))
    for c in cols:
        data = c.data[safe]
        validity = c.validity[safe] if c.validity is not None else None
        lengths = c.lengths[safe] if c.lengths is not None else None
        ev = c.elem_valid[safe] if c.elem_valid is not None else None
        if null_extend is not None:
            v = validity if validity is not None else jnp.ones_like(null_extend)
            validity = v & ~null_extend
            data = jnp.where(
                (null_extend[:, None] if data.ndim == 2 else null_extend),
                jnp.zeros_like(data), data)
        out.append(DeviceColumn(data, validity, c.dtype, c.dictionary, None,
                                lengths, ev))
    return out
