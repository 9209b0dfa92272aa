"""Typed configuration system.

Capability analog of the reference's config_namespace! machinery
(datafusion/common/src/config.rs:122, ConfigOptions at :1822): namespaced,
typed, documented options settable via the builder API, `SET key = value` in
SQL, or environment variables (DATAFUSION_TPU__<NAMESPACE>__<KEY>); docs are
generated from the registry (render_docs())."""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, Optional

_BOOL_TRUE = {"1", "true", "on", "yes"}


@dataclasses.dataclass
class ConfigEntry:
    key: str  # namespaced: execution.batch_min_capacity
    default: Any
    doc: str
    parse: Callable[[str], Any]


def _parse_bool(s: str) -> bool:
    return s.strip().lower() in _BOOL_TRUE


REGISTRY: Dict[str, ConfigEntry] = {}


def _opt(key: str, default, doc: str):
    parse: Callable[[str], Any]
    if isinstance(default, bool):
        parse = _parse_bool
    elif isinstance(default, int):
        parse = int
    elif isinstance(default, float):
        parse = float
    else:
        parse = str
    REGISTRY[key] = ConfigEntry(key, default, doc, parse)


# ---- execution ------------------------------------------------------------
_opt("execution.batch_min_capacity", 128,
     "Minimum device-relation capacity; capacities are padded to powers of two.")
_opt("execution.dense_group_limit", 16384,
     "Max group-domain size for the arithmetic (sort-free) dense aggregation path.")
_opt("execution.target_partitions", 0,
     "Number of mesh shards for distributed execution (0 = all local devices).")
_opt("execution.memory_limit_bytes", 0,
     "HBM accounting limit; 0 = unbounded. Exceeding raises ResourceExhausted "
     "naming the top consumers.")
_opt("execution.memory_pool", "greedy",
     "Bounded-pool policy: 'greedy' (first-come-first-served) or "
     "'fair_spill' (divides the budget evenly among spillable consumers so "
     "one large sort cannot starve its siblings; FairSpillPool analog).")
_opt("execution.spill_dir", "",
     "Directory for host->disk spill files (empty = host RAM only).")
_opt("execution.parquet_scan_threads", 8,
     "Concurrent row-group reads per parquet scan (1 = serial). pyarrow "
     "releases the GIL during IO/decompression, so a small pool overlaps "
     "disk reads with decode (file_stream.rs async-opener analog).")
_opt("execution.parquet_scan_ahead", True,
     "Chunked parquet scans prefetch the next batch of row groups on a "
     "background thread while the current chunk executes on device.")
_opt("execution.spill_max_host_bytes", 0,
     "Host-RAM budget for spilled relations; beyond it the oldest spills "
     "demote to .npz files under execution.spill_dir (0 = unlimited).")
_opt("execution.spill_compression", False,
     "Compress disk spill files (zlib; reference: spill_compression with "
     "lz4/zstd IPC writers, physical-plan/src/spill/mod.rs:240).")
_opt("execution.timeout_seconds", 0.0,
     "Cooperative per-query deadline; 0 = none. Checked at every operator "
     "dispatch, scan chunk, and recursion step (a fused single-XLA-program "
     "query cancels at its next host sync). QueryCancelled on expiry; "
     "SessionContext.interrupt() cancels explicitly.")
_opt("execution.use_fused_queries", True,
     "Compile whole plans into a single XLA program after capacity discovery.")
_opt("execution.out_of_core", "auto",
     "off|auto|on: chunked out-of-core execution. Scans stream in bounded "
     "chunks; aggregations merge Partial states across chunks; accumulated "
     "intermediates spill to host under memory-pool pressure. 'auto' engages "
     "when a memory limit is set and the estimated scan size exceeds half "
     "of it.")
_opt("execution.chunk_rows", 1 << 21,
     "Target rows per scan chunk for out-of-core execution (capacities are "
     "padded to the enclosing power of two).")
_opt("execution.collect_metrics", True,
     "Record per-operator elapsed/memory metrics (EXPLAIN ANALYZE).")
_opt("execution.approx_distinct_hll", False,
     "Distributed approx_distinct via a HyperLogLog register plane "
     "(4096 registers, ~1.6% error): shards merge sketches with one pmax "
     "collective instead of exchanging every distinct value (reference: "
     "approx_distinct.rs HyperLogLog accumulator). Off = exact everywhere.")
_opt("execution.parquet_bloom_pruning", True,
     "Prune parquet row groups via split-block bloom filters for equality "
     "and IN-list predicates (footer parsed natively; pyarrow does not "
     "expose bloom reading).")

# ---- optimizer ------------------------------------------------------------
_opt("optimizer.filter_pushdown", True,
     "Push filter conjuncts below joins and extract equi-join keys from "
     "cross joins.")
_opt("optimizer.late_materialization", True,
     "Drop GROUP BY keys functionally determined (via verified-unique join "
     "keys) by the remaining keys, re-attaching them by a post-aggregation "
     "join; determined keys otherwise ride every join table and gather as "
     "payload lanes.")
_opt("optimizer.projection_pruning", True,
     "Prune unreferenced columns at table scans (avoids dictionary-encoding "
     "and device residency for unused columns).")
_opt("optimizer.decorrelate_subqueries", True,
     "Rewrite EXISTS/IN/scalar subqueries into joins.")
_opt("optimizer.max_passes", 3,
     "Fixpoint iteration bound for rule application.")
_opt("optimizer.simplify_expressions", True,
     "Constant-fold and simplify expressions before and after decorrelation.")
_opt("optimizer.join_reorder", True,
     "Cost-based join reordering and semi/anti join placement "
     "(statistics-driven; reference: EliminateCrossJoin + JoinSelection).")
_opt("optimizer.eliminate_outer_joins", True,
     "Convert LEFT/RIGHT/FULL joins to INNER under null-rejecting filters.")
_opt("optimizer.common_subplan_dedup", True,
     "Unify structurally identical sub-plans so shared CTEs/subqueries "
     "compute once (CommonSubexprEliminate analog at plan granularity).")
_opt("optimizer.limit_into_sort", True,
     "Fuse LIMIT into an adjacent ORDER BY as a top-k sort.")
_opt("optimizer.plan_cleanup", True,
     "Erase degenerate operators: constant filters, empty-relation "
     "propagation, zero/identity limits, duplicated sort/group keys, "
     "constant GROUP BY keys (EliminateFilter/PropagateEmptyRelation/"
     "EliminateLimit/EliminateDuplicatedExpr/EliminateGroupByConstant "
     "analogs).")
_opt("optimizer.filter_null_join_keys", False,
     "Filter NULL keys below INNER equi-joins with nullable keys "
     "(FilterNullJoinKeys analog). Off by default: the join kernels "
     "already AND key validity into the live masks, so NULL keys are "
     "dead rows at zero extra cost; the explicit filters only change "
     "plan shapes (= fresh XLA compiles).")
_opt("optimizer.dynamic_filter_pushdown", True,
     "In chunked joins, push build-side min/max key bounds into the probe "
     "side as per-chunk BETWEEN filters and parquet pruning hints "
     "(DynamicFilterPhysicalExpr analog).")

# ---- sql ------------------------------------------------------------------
_opt("sql_parser.dialect", "generic", "Accepted SQL dialect (informational).")
_opt("sql_parser.recursion_limit", 64,
     "Maximum expression-nesting depth; deeper queries raise ParseError "
     "(reference: recursion limit in session_state.rs:458).")
_opt("sql_parser.parse_float_as_decimal", True,
     "Numeric literals with a decimal point parse as exact decimals "
     "(matches the reference's decimal literal behavior).")

# ---- explain --------------------------------------------------------------
_opt("explain.show_sizes", True, "Include capacities in EXPLAIN output.")


class ConfigOptions:
    """Resolved option values with dotted-key get/set."""

    def __init__(self, overrides: Optional[Dict[str, Any]] = None):
        self._values: Dict[str, Any] = {k: e.default for k, e in REGISTRY.items()}
        self._extensions: Dict[str, str] = {}
        self._load_env()
        for k, v in (overrides or {}).items():
            self.set(k, v)

    def _load_env(self):
        for k, e in REGISTRY.items():
            env = "DATAFUSION_TPU__" + k.upper().replace(".", "__")
            if env in os.environ:
                self._values[k] = e.parse(os.environ[env])

    def get(self, key: str, default=None):
        if key in self._values:
            return self._values[key]
        return self._extensions.get(key, default)

    def set(self, key: str, value) -> None:
        e = REGISTRY.get(key)
        if e is None:
            # extension namespace (reference: ConfigExtension)
            self._extensions[key] = value
            return
        if isinstance(value, str):
            value = e.parse(value)
        self._values[key] = value

    def to_dict(self) -> Dict[str, Any]:
        out = dict(self._values)
        out.update(self._extensions)
        return out


def render_docs() -> str:
    """Markdown table of all options (reference: docs auto-generated into
    docs/source/user-guide/configs.md)."""
    lines = ["| key | default | description |", "|---|---|---|"]
    for k in sorted(REGISTRY):
        e = REGISTRY[k]
        lines.append(f"| `{k}` | `{e.default}` | {e.doc} |")
    return "\n".join(lines)
