"""Multi-chip distributed execution over a jax.sharding.Mesh.

TPU-native replacement for the reference's exchange parallelism
(RepartitionExec, physical-plan/src/repartition/mod.rs:1196, and the
Partial/Final aggregate split, aggregates/mod.rs:282):

* tables are hash-partitioned over the mesh's "dp" axis (the analog of
  `target_partitions` row partitions, common/src/config.rs);
* the shuffle is `jax.lax.all_to_all` inside `shard_map` on bucketed rows
  (the analog of RepartitionExec's hash channels, seed-compatible with
  ops/kernels.hash64 so repartitioned data never needs rehashing);
* small build sides broadcast via `all_gather` (the analog of
  PartitionMode::CollectLeft, joins/hash_join/exec.rs);
* global scalar reductions ride `psum` (the analog of the final
  CoalescePartitions + single-partition aggregate).

`distributed_query_step` is the full representative step the driver
dry-runs on a virtual mesh: filter -> broadcast-join -> partial aggregate ->
hash all_to_all exchange -> final aggregate, all inside one jitted shard_map.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import kernels as K


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_rows(arrays: Dict[str, np.ndarray], key: np.ndarray, mesh: Mesh,
               axis: str = "dp") -> Tuple[Dict[str, jax.Array], jax.Array]:
    """Hash-partition host rows by key across the mesh axis; returns device
    arrays of shape [n_shards * cap_local] sharded on the leading axis plus
    the per-row selection mask."""
    n = mesh.shape[axis]
    h = np.zeros(len(key), dtype=np.uint64)
    # host-side mirror of ops/kernels.hash64 for ingest-time partitioning
    x = key.astype(np.uint64)
    M1 = np.uint64(0xFF51AFD7ED558CCD)
    M2 = np.uint64(0xC4CEB9FE1A85EC53)

    def mix(v):
        v = v ^ (v >> np.uint64(33))
        v = v * M1
        v = v ^ (v >> np.uint64(33))
        v = v * M2
        return v ^ (v >> np.uint64(33))

    h = mix(mix(x) ^ M1)
    part = (h % np.uint64(n)).astype(np.int64)
    counts = np.bincount(part, minlength=n)
    cap = int(max(128, 1 << int(np.ceil(np.log2(max(counts.max(), 1))))))
    sel = np.zeros((n, cap), dtype=bool)
    out = {name: np.zeros((n, cap), dtype=a.dtype) for name, a in arrays.items()}
    for p in range(n):
        idx = np.nonzero(part == p)[0]
        sel[p, : len(idx)] = True
        for name, a in arrays.items():
            out[name][p, : len(idx)] = a[idx]
    sharding = NamedSharding(mesh, P(axis))
    dev = {name: jax.device_put(a, sharding) for name, a in out.items()}
    return dev, jax.device_put(sel, sharding)


def exchange_by_key(arrays: Sequence[jax.Array], key_hash: jax.Array,
                    sel: jax.Array, axis: str = "dp",
                    slot_cap: int | None = None):
    """Inside shard_map: route each live row to shard hash%n via all_to_all.

    Rows are bucketed into n equal slots of slot_cap rows each; the received
    relation has capacity n*slot_cap. slot_cap defaults to local capacity//n
    (even-split assumption); slot_cap = local capacity is the overflow-proof
    worst case (one destination receives every row of every source). Overflow
    rows beyond slot_cap are dropped-and-COUNTED so callers can detect skew
    and re-run at a larger slot_cap, the skew story the reference lacks
    entirely (SURVEY.md §6 'Skewed keys')."""
    n = jax.lax.axis_size(axis)
    cap = sel.shape[0]
    if slot_cap is None:
        slot_cap = cap // n
    target = (key_hash % np.uint64(n)).astype(jnp.int32)
    target = jnp.where(sel, target, n)  # dead rows out of range
    # stable sort by target so each partition's rows are contiguous
    iota = jnp.arange(cap, dtype=jnp.int32)
    _, order = jax.lax.sort([target, iota], dimension=0, is_stable=True, num_keys=1)
    sorted_target = target[order]
    # position within its partition: distance from the partition's first row
    # (cummax over run starts; searchsorted lowers pathologically on TPU)
    is_run_start = jnp.concatenate([
        jnp.ones(1, dtype=bool), sorted_target[1:] != sorted_target[:-1]])
    run_start_pos = jax.lax.cummax(jnp.where(is_run_start, iota, 0))
    pos_in_part = iota - run_start_pos
    ok = (sorted_target < n) & (pos_in_part < slot_cap)
    dropped = jnp.sum((sorted_target < n) & (pos_in_part >= slot_cap))
    # overflow / dead rows scatter out of range and are dropped
    slot = jnp.where(ok, sorted_target * slot_cap + jnp.clip(pos_in_part, 0, slot_cap - 1),
                     n * slot_cap)

    outs = []
    for a in arrays:
        # trailing dims (e.g. list widths, HLL register planes) ride along:
        # rows shuffle, the per-row payload shape is preserved
        buf = jnp.zeros((n * slot_cap,) + a.shape[1:], a.dtype) \
            .at[slot].set(a[order], mode="drop")
        buf = buf.reshape((n, slot_cap) + a.shape[1:])
        got = jax.lax.all_to_all(buf, axis, split_axis=0, concat_axis=0, tiled=False)
        outs.append(got.reshape((n * slot_cap,) + a.shape[1:]))
    selbuf = jnp.zeros((n * slot_cap,), jnp.bool_).at[slot].set(ok, mode="drop")
    selbuf = selbuf.reshape(n, slot_cap)
    new_sel = jax.lax.all_to_all(selbuf, axis, split_axis=0, concat_axis=0, tiled=False)
    return outs, new_sel.reshape(n * slot_cap), dropped


def broadcast_dim(arrays: Sequence[jax.Array], axis: str = "dp"):
    """all_gather a sharded dimension table so every shard holds the full
    build side (CollectLeft analog)."""
    return [jax.lax.all_gather(a, axis, tiled=True) for a in arrays]


def distributed_query_step(mesh: Mesh, axis: str = "dp"):
    """Build the jitted representative distributed step:

      lineitem-like fact (qty, price, disc, key) sharded by row  [dp]
      dim table (key -> factor) sharded by row                   [dp]

      1. local filter                        (FilterExec)
      2. all_gather dim + searchsorted join  (CollectLeft HashJoinExec)
      3. local partial aggregate by group    (AggregateMode::Partial)
      4. all_to_all exchange on hash(group)  (RepartitionExec::Hash)
      5. final aggregate                     (AggregateMode::FinalPartitioned)
      6. psum of global row count            (tree reduction)
    """
    from jax import shard_map

    G = 8  # group-key domain (dict-coded)

    def step(qty, price, disc, gkey, jkey, sel, dim_key, dim_factor):
        # 1. filter: qty < 24 and disc > 0
        keep = sel & (qty < 2400) & (disc > 0)
        # 2. broadcast join on jkey -> factor
        (dk_all, df_all) = (
            jax.lax.all_gather(dim_key, axis, tiled=True),
            jax.lax.all_gather(dim_factor, axis, tiled=True),
        )
        order = jnp.argsort(dk_all)
        dk_sorted = dk_all[order]
        df_sorted = df_all[order]
        pos = jnp.searchsorted(dk_sorted, jkey)
        pos = jnp.clip(pos, 0, dk_sorted.shape[0] - 1)
        matched = dk_sorted[pos] == jkey
        factor = jnp.where(matched, df_sorted[pos], 0)
        keep = keep & matched
        # 3. partial aggregate by gkey (small domain: direct segment ids)
        revenue = price * (10000 - disc) // 10000 * factor
        seg = jnp.clip(gkey, 0, G - 1).astype(jnp.int32)
        part_sum = jax.ops.segment_sum(jnp.where(keep, revenue, 0), seg, num_segments=G)
        part_cnt = jax.ops.segment_sum(keep.astype(jnp.int64), seg, num_segments=G)
        # 4. exchange partial states by hash(group) so each group lands on one
        # shard; capacity padded to G per destination slot (worst case all
        # groups hash to one shard)
        n = jax.lax.axis_size(axis)
        gids = jnp.arange(G, dtype=jnp.int64)
        h = jnp.zeros(G * n, dtype=jnp.uint64).at[:G].set(K.hash64([gids]))
        pad = lambda a: jnp.zeros(G * n, a.dtype).at[:G].set(a)
        ex_live = jnp.zeros(G * n, dtype=bool).at[:G].set(True)
        (sums, cnts, rgid), ex_sel, dropped = exchange_by_key(
            [pad(part_sum), pad(part_cnt), pad(gids)], h, ex_live, axis
        )
        # 5. final aggregate: merge received partial states per group id
        gid = jnp.where(ex_sel, rgid, G).astype(jnp.int32)
        final_sum = jax.ops.segment_sum(jnp.where(ex_sel, sums, 0), gid, num_segments=G)
        final_cnt = jax.ops.segment_sum(jnp.where(ex_sel, cnts, 0), gid, num_segments=G)
        # 6. global row count via tree reduce
        total_rows = jax.lax.psum(jnp.sum(keep.astype(jnp.int64)), axis)
        return final_sum, final_cnt, total_rows, dropped[None]

    spec = P(axis)
    return shard_map(
        step, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, spec, spec, spec),
        out_specs=(spec, spec, P(), spec),
    )
