"""Catalog: table registration and providers.

Capability analog of the reference catalog layer (datafusion/catalog/src/
catalog.rs, table.rs, memory/; ListingTable in catalog-listing/src/table.rs):
TableProvider abstraction with in-memory, parquet and CSV implementations.
Providers cache the device-resident encoding of their data so repeated query
execution hits warm HBM (the reference analog is the CacheManager's
file-statistics / metadata caches, execution/src/cache/cache_manager.rs)."""
from __future__ import annotations

import os
from typing import Dict, List, Optional

from ..common.errors import PlanError
from ..common.schema import Schema
from ..data.device import DeviceRelation, to_device
from ..data.table import Table, pa_type as _pa_type


class TableProvider:
    def schema(self) -> Schema:
        raise NotImplementedError

    def host_table(self) -> Table:
        raise NotImplementedError

    def scan_device(self, ctx, filters=(), projection=None) -> DeviceRelation:
        """Device-resident scan. `filters`/`projection` are pushed-down hints
        (reference: TableProvider::scan + supports_filters_pushdown,
        catalog/src/table.rs); providers may ignore them — the engine always
        re-applies filters exactly (Inexact pushdown semantics)."""
        raise NotImplementedError

    def statistics(self):
        """Table statistics for cost-based planning (reference: Statistics,
        common/src/stats.rs:368). Computed once from the host table (O(n)
        vector min/max/null-count per column) and cached."""
        cached = getattr(self, "_stats", None)
        if cached is None:
            from ..common.stats import Statistics, table_statistics

            try:
                cached = table_statistics(self.host_table())
            except Exception:
                cached = Statistics(0.0)
            self._stats = cached
        return cached

    def is_unique(self, cols: tuple) -> bool:
        """Whether `cols` is a unique key of this table (reference analog:
        Constraints::PrimaryKey/Unique on TableProvider, functional
        dependence in expr/src/logical_plan/plan.rs). Declared keys
        (`_unique_keys`, e.g. MemTable's unique_keys=) answer immediately;
        otherwise an exact one-time host pass (np.unique, cached) decides —
        optimizer rewrites that merge group keys REQUIRE exactness, so this
        never estimates. Columns with NULLs are never a unique key here."""
        cols = tuple(cols)
        for k in getattr(self, "_unique_keys", ()):
            if set(k) <= set(cols):
                return True  # a superset of a unique key is unique
        cache = getattr(self, "_unique_cache", None)
        if cache is None:
            cache = self._unique_cache = {}
        hit = cache.get(cols)
        if hit is not None:
            return hit
        import numpy as np

        try:
            t = self.host_table()
            arrs = []
            for name in cols:
                c = t.column(name)
                if c.validity is not None and not c.validity.all():
                    cache[cols] = False
                    return False
                arrs.append(np.asarray(c.data))
            n = t.num_rows
            if n == 0:
                uniq = True
            elif len(arrs) == 1:
                uniq = len(np.unique(arrs[0])) == n
            else:
                uniq = len(np.unique(np.stack(arrs, axis=1), axis=0)) == n
        except Exception:  # noqa: BLE001 -- unknown column / unloadable table
            uniq = False
        cache[cols] = uniq
        return uniq

    def scan_chunks(self, ctx, filters=(), projection=None, chunk_rows=1 << 20):
        """Yield capacity-bounded device chunks of this table (out-of-core
        scan; reference analog: partitioned FileStream batches). Every chunk
        shares ONE capacity, one dictionary per string column, and one bounds
        tuple per column, so jitted per-chunk transforms compile exactly once.
        Default: slice the host table."""
        from ..common.schema import Schema
        from ..data.device import bucket_capacity, table_bounds, to_device

        t = self.host_table()
        if projection is not None:
            idxs = [t.schema.index_of(c) for c in projection]
            t = type(t)(Schema([t.schema.fields[i] for i in idxs]),
                        [t.columns[i] for i in idxs])
        bounds = table_bounds(t)
        cap = bucket_capacity(min(max(chunk_rows, 1), max(t.num_rows, 1)))
        device = ctx.device if ctx else None
        if t.num_rows == 0:
            yield to_device(t, capacity=cap, device=device, bounds=bounds)
            return
        for start in range(0, t.num_rows, cap):
            yield to_device(t, capacity=cap, device=device,
                            row_range=(start, min(start + cap, t.num_rows)),
                            bounds=bounds)


def _device_key(ctx) -> str:
    d = getattr(ctx, "device", None)
    if d is not None:
        return str(d)
    import jax

    return str(jax.devices()[0])


class StreamingTable(TableProvider):
    """A (possibly unbounded) stream of record batches (reference:
    StreamingTableExec, physical-plan/src/streaming.rs:63 + StreamingTable
    in catalog). `batches` is a zero-arg factory returning an iterator of
    host Tables (or pydicts); each call starts a fresh scan. Unbounded
    streams execute through the chunked executor, which pulls batches
    incrementally and early-stops on LIMIT; pipeline-breaking operators over
    an unbounded stream are rejected at plan time (the reference's
    Boundedness/EmissionType check, execution_plan.rs:1022,1067)."""

    def __init__(self, schema: Schema, batches, unbounded: bool = False):
        self._schema = schema
        self._batches = batches
        self.unbounded = unbounded

    def schema(self) -> Schema:
        return self._schema

    def is_unique(self, cols: tuple) -> bool:
        return False  # a stream cannot be scanned at plan time

    def statistics(self):
        from ..common.stats import Statistics

        return Statistics(float("inf") if self.unbounded else 0.0)

    def host_table(self) -> Table:
        if self.unbounded:
            raise PlanError("cannot materialize an unbounded stream")
        from ..physical.chunked import concat_host

        return concat_host([self._coerce(b) for b in self._batches()],
                           self._schema)

    def _coerce(self, b) -> Table:
        if isinstance(b, Table):
            return b
        return Table.from_pydict(b, {f.name: f.dtype
                                     for f in self._schema.fields})

    def scan_device(self, ctx, filters=(), projection=None) -> DeviceRelation:
        return to_device(self.host_table(),
                         device=ctx.device if ctx else None)

    def scan_chunks(self, ctx, filters=(), projection=None, chunk_rows=1 << 20):
        from ..data.device import bucket_capacity

        cap = None
        for b in self._batches():
            t = self._coerce(b)
            if projection is not None:
                idxs = [t.schema.index_of(c) for c in projection]
                t = Table(Schema([t.schema.fields[i] for i in idxs]),
                          [t.columns[i] for i in idxs])
            if cap is None:
                cap = bucket_capacity(min(max(t.num_rows, 1), chunk_rows))
            device = ctx.device if ctx else None
            for start in range(0, max(t.num_rows, 1), cap):
                yield to_device(t, capacity=cap, device=device,
                                row_range=(start, min(start + cap, t.num_rows)))


class WorkTable(TableProvider):
    """Recursive CTE working table: the physical RecursiveQueryExec binds the
    previous iteration's device relation before each step (reference:
    WorkTable, physical-plan/src/work_table.rs)."""

    def __init__(self, name: str, schema: Schema):
        self.name = name
        self._schema = schema
        self._rel: Optional[DeviceRelation] = None

    def schema(self) -> Schema:
        return self._schema

    def host_table(self) -> Table:
        raise PlanError(f"worktable {self.name!r} has no host data")

    def scan_device(self, ctx, filters=(), projection=None) -> DeviceRelation:
        if self._rel is None:
            raise PlanError(
                f"worktable {self.name!r} scanned outside its recursion")
        return self._rel


class MemTable(TableProvider):
    def __init__(self, table: Table, unique_keys=()):
        self._table = table
        self._unique_keys = tuple(tuple(k) for k in unique_keys)
        # per-device lazy COLUMN cache: only projected columns are encoded
        # and uploaded (reference analog: MemorySourceConfig projection,
        # datasource/src/memory.rs) — at TPC-H SF10 lineitem is ~6 GB fully
        # uploaded but most queries touch a third of its columns.
        self._device: Dict[str, Dict[str, object]] = {}
        self._device_sel: Dict[str, object] = {}

    def schema(self) -> Schema:
        return self._table.schema

    def host_table(self) -> Table:
        return self._table

    def scan_device(self, ctx, filters=(), projection=None) -> DeviceRelation:
        from ..common.schema import Field
        key = _device_key(ctx)
        schema = self._table.schema
        all_names = [f.name for f in schema.fields]
        want = [n for n in (projection if projection is not None else all_names)]
        if not want:  # zero-column scan (COUNT(*)): sel still needed
            want = all_names[:1]
        cache = self._device.setdefault(key, {})
        missing = [n for n in want if n not in cache]
        if missing:
            idx = [schema.find(n) for n in missing]
            sub = Table(Schema([schema.fields[i] for i in idx]),
                        [self._table.columns[i] for i in idx])
            rel = to_device(sub, device=ctx.device if ctx else None)
            for f, c in zip(rel.schema.fields, rel.columns):
                cache[f.name] = c
            self._device_sel.setdefault(key, rel.sel)
        fields = [schema.fields[schema.find(n)] for n in want]
        return DeviceRelation(Schema(fields), tuple(cache[n] for n in want),
                              self._device_sel[key])


class FileTable(TableProvider):
    """Base for file-backed tables: lazy host read, cached device encoding."""

    def __init__(self, path: str):
        self.path = path
        self._table: Optional[Table] = None
        self._device: Dict[str, DeviceRelation] = {}

    def _read(self) -> Table:
        raise NotImplementedError

    def schema(self) -> Schema:
        return self.host_table().schema

    def host_table(self) -> Table:
        if self._table is None:
            self._table = self._read()
        return self._table

    def scan_device(self, ctx, filters=(), projection=None) -> DeviceRelation:
        key = _device_key(ctx)
        if key not in self._device:
            self._device[key] = to_device(self.host_table(),
                                          device=ctx.device if ctx else None)
        return self._device[key]


class ParquetTable(TableProvider):
    """Parquet scan through the file-group scanner (io/parquet.py): per-file
    row-group reads, projection pushdown to disk, hive partition columns, and
    statistics-based row-group/file pruning of pushed-down filter conjuncts
    (reference: datasource-parquet/src/opener/mod.rs:388-593,
    pruning/src/pruning_predicate.rs:365)."""

    def __init__(self, path: str):
        self.path = path
        from ..io.parquet import ParquetDataset

        self._ds = ParquetDataset(path)
        self._schema: Optional[Schema] = None
        self._table: Optional[Table] = None
        self._device: Dict[tuple, DeviceRelation] = {}
        self._chunk_dicts: Dict[str, object] = {}

    @property
    def last_scan(self) -> Dict:
        """Pruning counters of the most recent scan (for EXPLAIN/tests)."""
        return self._ds.last_scan

    def schema(self) -> Schema:
        if self._schema is None:
            # footer metadata only — no data read
            empty = Table.from_arrow(self._ds.arrow_schema().empty_table())
            from ..common.schema import Field
            fields = [Field(f.name, c.dtype, nullable=True)
                      for f, c in zip(empty.schema.fields, empty.columns)]
            self._schema = Schema(fields)
        return self._schema

    def host_table(self) -> Table:
        if self._table is None:
            self._table = Table.from_arrow(self._ds.read())
        return self._table

    def statistics(self):
        """Footer-derived Statistics (no data read) in the cost model's
        shape (reference: ListingTable statistics collection,
        catalog-listing/src/table.rs; Statistics common/src/stats.rs:368)."""
        cached = getattr(self, "_stats", None)
        if cached is None:
            from ..common.stats import ColumnStatistics, Statistics
            from ..common.stats import _ordinal

            rows = float(self._ds.num_rows())
            cols = {}
            for name, s in self._ds.column_stats().items():
                lo, hi = _ordinal(s.lo), _ordinal(s.hi)
                ndv = None
                if lo is not None and hi is not None:
                    # near-dense key heuristic shared with table_statistics
                    ndv = max(1.0, min(hi - lo + 1.0, rows))
                cols[name] = ColumnStatistics(float(s.null_count or 0),
                                              lo, hi, ndv)
            cached = Statistics(rows, cols, exact_rows=True)
            self._stats = cached
        return cached

    def scan_device(self, ctx, filters=(), projection=None) -> DeviceRelation:
        use_bloom = bool(ctx.opt("execution.parquet_bloom_pruning", True)) \
            if ctx is not None else True
        units = tuple((p, tuple(rgs))
                      for p, rgs in self._ds.plan_units(list(filters),
                                                        use_bloom=use_bloom))
        proj = tuple(projection) if projection is not None else None
        # page-index row masks change WHICH rows a unit yields, so they are
        # part of the cache identity (same units, different filters)
        mask_sig = tuple(sorted(
            (p, rg, hash(m.tobytes()))
            for (p, rg), m in self._ds._unit_masks.items()))
        key = (_device_key(ctx), units, mask_sig, proj)
        if key not in self._device:
            threads = int(ctx.opt("execution.parquet_scan_threads", 8)) \
                if ctx is not None else 8
            at = self._ds.read_units([(p, list(rgs)) for p, rgs in units],
                                     projection, threads=threads)
            self._device[key] = to_device(Table.from_arrow(at),
                                          device=ctx.device if ctx else None)
        return self._device[key]

    def _shared_dictionary(self, name: str):
        """One interned Dictionary per string column for chunked scans (see
        ParquetDataset.global_dictionary; identity-stable across chunks)."""
        if name not in self._chunk_dicts:
            import numpy as np

            from ..data.column import Dictionary

            if name in self._ds.partition_keys:
                vals = np.array(sorted({str(f.partitions[name])
                                        for f in self._ds.files
                                        if f.partitions.get(name) is not None}),
                                dtype=object)
            else:
                vals = self._ds.global_dictionary(name)
            self._chunk_dicts[name] = None if vals is None else Dictionary(vals)
        return self._chunk_dicts[name]

    def _chunk_bounds(self, table: Table):
        """Dataset-wide device-rep bounds per chunk column (from footer
        statistics only), identical for every chunk."""
        stats = self._ds.column_stats()
        out = []
        for f, _c in zip(table.schema.fields, table.columns):
            s = stats.get(f.name)
            b = None
            if s is not None and s.lo is not None and s.hi is not None:
                try:
                    if f.dtype.is_decimal:
                        k = 10 ** f.dtype.scale
                        b = (min(int(round(s.lo * k)), 0), max(int(round(s.hi * k)), 0))
                    elif f.dtype.is_integer or f.dtype.is_temporal:
                        b = (min(int(s.lo), 0), max(int(s.hi), 0))
                except (TypeError, ValueError):
                    b = None
            out.append(b)
        return out

    def scan_chunks(self, ctx, filters=(), projection=None, chunk_rows=1 << 20):
        """Out-of-core parquet scan: batches of pruned row groups stream from
        disk one at a time; string columns are re-encoded onto dataset-global
        dictionaries and bounds come from footer statistics, so all chunks
        share identical static metadata (one compile per transform)."""
        from ..data.device import bucket_capacity, to_device

        batches = self._ds.chunk_units(list(filters), max(chunk_rows, 1))
        cap = bucket_capacity(max(chunk_rows, 1))
        device = ctx.device if ctx else None
        if not batches:
            at = self._ds.read(filters, projection)  # empty, schema-correct
            yield to_device(Table.from_arrow(at), device=device)
            return
        threads = int(ctx.opt("execution.parquet_scan_threads", 8)) \
            if ctx is not None else 8
        ahead = bool(ctx.opt("execution.parquet_scan_ahead", True)) \
            if ctx is not None else True

        def fetch(units):
            return Table.from_arrow(
                self._ds.read_units(units, projection, threads=threads))

        pool = pending = None
        if ahead and len(batches) > 1:
            # scan-ahead: batch i+1 reads from disk while batch i encodes
            # and executes on device (file_stream.rs readahead analog)
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(max_workers=1)
            pending = pool.submit(fetch, batches[0])
        bounds = None
        try:
            for bi, units in enumerate(batches):
                if pending is not None:
                    t = pending.result()
                    pending = (pool.submit(fetch, batches[bi + 1])
                               if bi + 1 < len(batches) else None)
                else:
                    t = fetch(units)
                cols = []
                for f, c in zip(t.schema.fields, t.columns):
                    if f.dtype.is_string:
                        shared = self._shared_dictionary(f.name)
                        if shared is not None:
                            c = c.remap_dictionary(shared)
                    cols.append(c)
                t = Table(t.schema, cols)
                if bounds is None:
                    bounds = self._chunk_bounds(t)
                for start in range(0, t.num_rows, cap):
                    yield to_device(t, capacity=cap, device=device,
                                    row_range=(start,
                                               min(start + cap, t.num_rows)),
                                    bounds=bounds)
        finally:
            if pool is not None:
                pool.shutdown(wait=False, cancel_futures=True)


def _expand_files(path: str, exts) -> List[str]:
    if os.path.isdir(path):
        out = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(exts)
        )
        if not out:
            raise PlanError(f"no files matching {exts} under {path}")
        return out
    return [path]


class JsonTable(FileTable):
    """Newline-delimited JSON via the Arrow C++ reader (reference:
    datasource-json)."""

    def _read(self) -> Table:
        import pyarrow as pa
        import pyarrow.json as pjson

        paths = _expand_files(self.path, (".json", ".ndjson", ".jsonl"))
        tables = [pjson.read_json(p) for p in paths]
        at = pa.concat_tables(tables) if len(tables) > 1 else tables[0]
        return Table.from_arrow(at)


class ArrowTable(FileTable):
    """Arrow IPC (feather v2) files (reference: datasource-arrow crate,
    features.md Arrow-IPC read+write)."""

    def _read(self) -> Table:
        import pyarrow as pa
        import pyarrow.ipc as pipc

        paths = _expand_files(self.path, (".arrow", ".feather", ".ipc"))
        tables = [pipc.open_file(p).read_all() for p in paths]
        at = pa.concat_tables(tables) if len(tables) > 1 else tables[0]
        return Table.from_arrow(at)


class AvroTable(FileTable):
    """Avro object container files via the native decoder (reference:
    datasource-avro crate, read-only Avro per features.md)."""

    def _read(self) -> Table:
        import pyarrow as pa

        from ..io.avro import read_avro

        paths = _expand_files(self.path, (".avro",))
        tables = [read_avro(p) for p in paths]
        at = pa.concat_tables(tables) if len(tables) > 1 else tables[0]
        return Table.from_arrow(at)


class CsvTable(FileTable):
    def __init__(self, path: str, has_header: bool = True, delimiter: str = ",",
                 schema=None):
        super().__init__(path)
        self.has_header = has_header
        self.delimiter = delimiter
        # declared (name, DataType) pairs (CREATE EXTERNAL TABLE column
        # list): names override the header positionally and values parse
        # straight into the declared arrow types (exact for decimals)
        self.declared = schema

    def _read(self) -> Table:
        import pyarrow as pa
        import pyarrow.csv as pcsv

        paths = _expand_files(self.path, (".csv", ".tbl", ".txt"))
        opts = pcsv.ParseOptions(delimiter=self.delimiter)
        if self.declared:
            names = [n for n, _ in self.declared]
            ropts = pcsv.ReadOptions(column_names=names,
                                     skip_rows=1 if self.has_header else 0)
            types = {n: _pa_type(dt) for n, dt in self.declared}
        else:
            ropts = pcsv.ReadOptions(
                autogenerate_column_names=not self.has_header)
            types = None

        def read_one(p):
            # a declared BIGINT UNSIGNED column can hold values beyond
            # int64 (this engine has no u64 kind); rather than failing the
            # whole table, re-read the offending column as float64 —
            # queries needing its exact value then mismatch individually
            t = dict(types) if types is not None else None
            for _ in range(len(t) + 1 if t else 1):
                try:
                    return pcsv.read_csv(
                        p, parse_options=opts, read_options=ropts,
                        convert_options=pcsv.ConvertOptions(column_types=t)
                        if t is not None else None)
                except pa.lib.ArrowInvalid as exc:
                    import re as _re

                    m = _re.search(r"CSV column #(\d+)", str(exc))
                    if t is None or m is None:
                        raise
                    col = list(t)[int(m.group(1))]
                    if t[col] == pa.float64():
                        raise
                    t[col] = pa.float64()
            raise PlanError(f"csv read failed for {p}")

        tables = [read_one(p) for p in paths]
        at = pa.concat_tables(tables) if len(tables) > 1 else tables[0]
        return Table.from_arrow(at)


class SchemaProvider:
    """One namespace of tables (reference: SchemaProvider,
    datafusion/catalog/src/schema.rs)."""

    def __init__(self, name: str):
        self.name = name
        self.tables: Dict[str, TableProvider] = {}

    def register(self, name: str, provider: TableProvider):
        self.tables[name.lower()] = provider

    def deregister(self, name: str):
        self.tables.pop(name.lower(), None)

    def table(self, name: str) -> Optional[TableProvider]:
        return self.tables.get(name.lower())

    def names(self) -> List[str]:
        return sorted(self.tables)


class CatalogProvider:
    """A named collection of schemas (reference: CatalogProvider,
    datafusion/catalog/src/catalog.rs)."""

    def __init__(self, name: str):
        self.name = name
        self.schemas: Dict[str, SchemaProvider] = {}

    def schema(self, name: str, create: bool = False) -> Optional[SchemaProvider]:
        s = self.schemas.get(name.lower())
        if s is None and create:
            s = self.schemas[name.lower()] = SchemaProvider(name.lower())
        return s

    def schema_names(self) -> List[str]:
        return sorted(self.schemas)


DEFAULT_CATALOG = "datafusion"
DEFAULT_SCHEMA = "public"


class Catalog:
    """Session catalog list with a three-level namespace
    catalog.schema.table (reference: CatalogProviderList -> CatalogProvider
    -> SchemaProvider -> TableProvider). Bare names resolve against the
    default catalog/schema; registration with 1/2/3 dotted parts targets
    (default.default.t), (default.s.t), (c.s.t)."""

    def __init__(self):
        self.catalogs: Dict[str, CatalogProvider] = {}
        self.default_catalog = DEFAULT_CATALOG
        self.default_schema = DEFAULT_SCHEMA
        self.register_catalog(DEFAULT_CATALOG)
        self.views: Dict[str, object] = {}  # name -> LogicalPlan

    # ---- catalogs/schemas -------------------------------------------------
    def register_catalog(self, name: str) -> CatalogProvider:
        c = self.catalogs.get(name.lower())
        if c is None:
            c = self.catalogs[name.lower()] = CatalogProvider(name.lower())
            c.schema(DEFAULT_SCHEMA, create=True)
        return c

    def catalog(self, name: str) -> Optional[CatalogProvider]:
        return self.catalogs.get(name.lower())

    def register_schema(self, catalog: str, schema: str) -> SchemaProvider:
        return self.register_catalog(catalog).schema(schema, create=True)

    def _split(self, name: str):
        parts = name.split(".")
        if len(parts) == 1:
            return self.default_catalog, self.default_schema, parts[0]
        if len(parts) == 2:
            return self.default_catalog, parts[0], parts[1]
        if len(parts) == 3:
            return parts[0], parts[1], parts[2]
        raise PlanError(f"invalid table reference {name!r}")

    # ---- tables -------------------------------------------------------------
    def register(self, name: str, provider: TableProvider):
        c, s, t = self._split(name)
        self.register_catalog(c).schema(s, create=True).register(t, provider)

    def deregister(self, name: str):
        c, s, t = self._split(name)
        cat = self.catalog(c)
        sch = cat.schema(s) if cat else None
        if sch:
            sch.deregister(t)

    def get(self, name: str) -> TableProvider:
        c, s, t = self._split(name)
        cat = self.catalog(c)
        sch = cat.schema(s) if cat else None
        p = sch.table(t) if sch else None
        if p is None:
            raise PlanError(
                f"table {name!r} not found; registered: {self.names()}")
        return p

    def names(self) -> List[str]:
        """Registered table names: bare for the default schema, qualified
        elsewhere."""
        out = []
        for cn, cat in sorted(self.catalogs.items()):
            for sn, sch in sorted(cat.schemas.items()):
                for t in sch.names():
                    if cn == self.default_catalog and sn == self.default_schema:
                        out.append(t)
                    elif cn == self.default_catalog:
                        out.append(f"{sn}.{t}")
                    else:
                        out.append(f"{cn}.{sn}.{t}")
        return sorted(out)

    def __contains__(self, name: str) -> bool:
        try:
            self.get(name)
            return True
        except PlanError:
            return False
