"""SessionContext + DataFrame: the user-facing API.

Capability analog of the reference's SessionContext
(datafusion/core/src/execution/context/mod.rs:293) and DataFrame
(core/src/dataframe/mod.rs:229): register tables, run SQL, build plans
fluently, collect results."""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Union as TyUnion

from .catalog.catalog import (Catalog, CsvTable, JsonTable, MemTable,
                              ParquetTable, TableProvider)
from .common.errors import PlanError
from .common import types as T
from .common.schema import Field, Schema
from .data.device import to_host
from .data.table import Table
from .expr import nodes as E
from .expr.udf import (AggregateUDF, FunctionRegistry, ScalarUDF, WindowUDF,
                       with_registry)
from .logical import plan as L
from .physical.planner import create_physical_plan
from .runtime.context import ExecContext


class SessionContext:
    def __init__(self, config: Optional[Dict] = None, device=None):
        from .common.config import ConfigOptions

        import threading

        self.catalog = Catalog()
        self.config = dict(config or {})
        self.options = ConfigOptions(self.config)
        self.device = device
        self.functions = FunctionRegistry()
        self._prepared: Dict[str, object] = {}  # PREPARE name -> A.Prepare
        self._cancel = threading.Event()
        # back-link for session-scoped virtual tables
        # (information_schema.df_settings / routines)
        self.catalog.session = self

    def interrupt(self):
        """Cancel queries currently executing under this session (analog of
        dropping the reference's record-batch stream; the cooperative check
        runs at every operator dispatch / chunk / recursion step, so a fused
        single-XLA-program query cancels at its next host sync)."""
        self._cancel.set()

    # ---- registration ---------------------------------------------------
    def register_object_store(self, url: str, store) -> None:
        """Register an ObjectStore for a URL scheme/authority so external
        tables can point at non-local locations (reference:
        RuntimeEnv::register_object_store,
        execution/src/object_store.rs ObjectStoreRegistry)."""
        from .io.object_store import default_registry

        default_registry().register(url, store)

    def register_table(self, name: str, data) -> None:
        if isinstance(data, TableProvider):
            self.catalog.register(name, data)
        elif isinstance(data, Table):
            self.catalog.register(name, MemTable(data))
        elif isinstance(data, dict):
            self.catalog.register(name, MemTable(Table.from_pydict(data)))
        else:
            try:
                import pyarrow as pa

                if isinstance(data, pa.Table):
                    self.catalog.register(name, MemTable(Table.from_arrow(data)))
                    return
            except ImportError:
                pass
            import pandas as pd

            if isinstance(data, pd.DataFrame):
                self.catalog.register(name, MemTable(Table.from_pandas(data)))
            else:
                raise PlanError(f"cannot register {type(data)}")

    def register_streaming_table(self, name: str, batches, schema,
                                 unbounded: bool = False) -> None:
        """Register a stream of record batches (reference: StreamingTable /
        StreamingTableExec, physical-plan/src/streaming.rs:63). `batches` is
        a zero-arg callable returning an iterator of host Tables or pydicts;
        `schema` is a Schema or {name: DataType}. With unbounded=True the
        engine only accepts pipeline-friendly plans over it (filters,
        projections, limits) and executes them incrementally."""
        from .catalog.catalog import StreamingTable

        if isinstance(schema, dict):
            schema = Schema([Field(n, t) for n, t in schema.items()])
        self.catalog.register(name, StreamingTable(schema, batches, unbounded))

    def register_parquet(self, name: str, path: str) -> None:
        self.catalog.register(name, ParquetTable(path))

    def register_csv(self, name: str, path: str, has_header: bool = True,
                     delimiter: str = ",") -> None:
        self.catalog.register(name, CsvTable(path, has_header, delimiter))

    def register_json(self, name: str, path: str) -> None:
        self.catalog.register(name, JsonTable(path))

    def deregister_table(self, name: str) -> None:
        self.catalog.deregister(name)

    # ---- user-defined functions (reference: expr/src/udf.rs:537,
    # SessionContext::register_udf, core/src/execution/context/mod.rs) ------
    def register_udf(self, name: str, fn, return_type: T.DataType,
                     nullable: bool = True) -> None:
        """Register a scalar UDF callable from SQL and the DataFrame API.

        `fn` receives one jax array per argument (vectorized over the whole
        column; decimals arrive descaled as float64) and returns an array, or
        an (array, validity) pair for custom NULL semantics."""
        self.functions.register_scalar(ScalarUDF(name, fn, return_type, nullable))

    def register_udaf(self, name: str, state, combine, identity, finalize,
                      return_type: T.DataType, nullable: bool = True) -> None:
        """Register an aggregate UDF as a commutative monoid:
        state(x)->pytree of per-row arrays, combine(a,b)->pytree (associative),
        identity pytree of scalars, finalize(state)->values. One segmented
        associative scan evaluates it per group; the same combine serves as
        the distributed Partial/Final merge (reference: udaf.rs +
        accumulator.rs:51 state/merge_batch contract)."""
        self.functions.register_aggregate(
            AggregateUDF(name, state, combine, identity, finalize,
                         return_type, nullable))

    def register_udwf(self, name: str, state, combine, identity, finalize,
                      return_type: T.DataType, nullable: bool = True) -> None:
        """Register a window UDF (same monoid spec, evaluated as a running
        partition-resetting scan over the default frame; reference: udwf.rs)."""
        self.functions.register_window(
            WindowUDF(name, state, combine, identity, finalize,
                      return_type, nullable))

    def register_async_udf(self, name: str, fn, return_type: T.DataType,
                           nullable: bool = True) -> None:
        """Register a host-side (optionally `async def`) scalar function —
        e.g. a remote-service or model call — invoked once per batch with
        numpy arrays; runs outside the XLA program via a host callback
        (reference: AsyncFuncExec, physical-plan/src/async_func.rs)."""
        from .expr.udf import make_async_scalar

        self.functions.register_scalar(
            make_async_scalar(name, fn, return_type, nullable))

    def enable_spark_functions(self) -> None:
        """Opt this session into the Spark-compatible function library
        (reference: datafusion-spark crate, spark/src/function/): Spark-only
        names (sha2, crc32, elt, date_add, ...) become available, and names
        whose Spark semantics differ (round = HALF_UP, substring with
        negative positions) switch to the Spark behavior."""
        self.functions.spark = True

    def register_plugin(self, path: str) -> dict:
        """Load a native plugin shared library (see native/plugin.h): its
        table providers join the catalog (rows cross the boundary as Arrow
        record batches over the Arrow C Data Interface) and its scalar
        functions become SQL-callable (reference: datafusion-ffi crate,
        ffi/src/lib.rs:28-55)."""
        from .interchange.ffi import load_plugin

        return load_plugin(self, path)

    def register_udtf(self, name: str, fn) -> None:
        """Register a table function usable in FROM position:
        `fn(*literal_args)` runs host-side and returns a dict of columns or a
        Table (reference: TableFunctionImpl, catalog/src/table.rs;
        functions-table/)."""
        from .expr.udf import TableUDF

        self.functions.register_table_function(TableUDF(name, fn))

    # ---- plan entry points ----------------------------------------------
    def table(self, name: str) -> "DataFrame":
        provider = self.catalog.get(name)
        return DataFrame(self, L.TableScan(name, provider))

    def from_substrait(self, doc) -> "DataFrame":
        """Bind a Substrait plan (proto3-JSON dict or JSON string) against
        this session's catalog (reference analog:
        substrait/src/logical_plan/consumer.rs)."""
        import json as _json

        from .interchange.substrait import plan_from_substrait

        if isinstance(doc, (str, bytes)):
            doc = _json.loads(doc)
        return DataFrame(self, plan_from_substrait(doc, self.catalog))

    def from_proto(self, data: bytes) -> "DataFrame":
        """Bind a DataFusion-protobuf-serialized LogicalPlanNode against
        this session's catalog (reference analog:
        proto/src/bytes/mod.rs logical_plan_from_bytes)."""
        from .interchange.dfproto import plan_from_proto_bytes

        return DataFrame(self, plan_from_proto_bytes(data, self.catalog))

    @with_registry
    def sql(self, query: str) -> "DataFrame":
        """Run one or more SQL statements; DDL executes eagerly, the last
        query statement is returned lazily as a DataFrame (reference:
        SessionContext::sql, core/src/execution/context/mod.rs:611)."""
        from .sql import ast as A
        from .sql.parser import parse_sql
        from .sql.planner import SqlPlanner

        opts = self.options.to_dict()
        stmts = parse_sql(
            query,
            recursion_limit=int(opts.get("sql_parser.recursion_limit", 64)),
            float_as_decimal=bool(
                opts.get("sql_parser.parse_float_as_decimal", False)))
        out: Optional[DataFrame] = None
        for stmt in stmts:
            out = self._run_statement(stmt, A, SqlPlanner)
        if out is None:
            out = DataFrame(self, L.EmptyRelation(False))
        return out

    def _run_statement(self, stmt, A, SqlPlanner) -> Optional["DataFrame"]:
        if isinstance(stmt, A.Prepare):
            # reference: LogicalPlan::Statement(Prepare) stored on the
            # session; EXECUTE re-plans with params substituted
            # (expr/src/logical_plan/plan.rs replace_params_with_values)
            self._prepared[stmt.name.lower()] = stmt
            return None
        if isinstance(stmt, A.Execute):
            prep = self._prepared.get(stmt.name.lower())
            if prep is None:
                raise PlanError(f"prepared statement {stmt.name!r} not found")
            values = []
            for i, p in enumerate(stmt.params):
                if not isinstance(p, E.Literal):
                    raise PlanError("EXECUTE parameters must be literals")
                if prep.param_types and i < len(prep.param_types):
                    values.append(E.Literal(p.value, prep.param_types[i]))
                else:
                    values.append(p)
            bound = _replace_params(prep.stmt, values)
            return self._run_statement(bound, A, SqlPlanner)
        if isinstance(stmt, A.Deallocate):
            if stmt.name.lower() not in self._prepared:
                raise PlanError(f"prepared statement {stmt.name!r} not found")
            del self._prepared[stmt.name.lower()]
            return None
        if isinstance(stmt, A.SelectStmt):
            return DataFrame(self, SqlPlanner(self.catalog).plan_statement(stmt))
        if isinstance(stmt, A.Explain):
            plan = SqlPlanner(self.catalog).plan_statement(stmt.query)
            df = DataFrame(self, plan)
            text = (df.explain_analyze() if stmt.analyze
                    else df.explain(format=getattr(stmt, "format", None)))
            return DataFrame(self, L.Values(
                Schema([Field("plan", T.STRING, False)]),
                [[E.lit(line)] for line in text.splitlines()],
            ))
        if isinstance(stmt, A.CreateExternalTable):
            if stmt.format == "parquet":
                self.register_parquet(stmt.name, stmt.location)
            elif stmt.format == "csv":
                from .catalog.catalog import CsvTable

                self.catalog.register(stmt.name, CsvTable(
                    stmt.location, stmt.has_header, stmt.delimiter,
                    schema=stmt.columns))
            elif stmt.format == "json":
                self.register_json(stmt.name, stmt.location)
            elif stmt.format in ("arrow", "ipc", "feather"):
                from .catalog.catalog import ArrowTable

                self.catalog.register(stmt.name, ArrowTable(stmt.location))
            elif stmt.format == "avro":
                from .catalog.catalog import AvroTable

                self.catalog.register(stmt.name, AvroTable(stmt.location))
            else:
                raise PlanError(f"unsupported format {stmt.format!r}")
            return None
        if isinstance(stmt, A.CreateTableAs):
            try:
                self.catalog.get(stmt.name)
                exists = True
            except Exception:  # noqa: BLE001 -- absent name
                exists = False
            if exists:
                if stmt.if_not_exists:
                    return None  # reference: skip silently (ddl.slt:580)
                if not stmt.or_replace:
                    raise PlanError(
                        f"Table '{stmt.name}' already exists")
            cols = getattr(stmt, "columns", None)
            if stmt.query is None:  # CREATE TABLE t(a INT, ...): empty table
                self.register_table(stmt.name, Table.from_pydict(
                    {n: [] for n, _ in cols}, {n: dt for n, dt in cols}))
                return None
            plan = SqlPlanner(self.catalog).plan_statement(stmt.query)
            if cols:
                # declared column list renames + coerces the source
                fields = plan.schema.fields
                if len(fields) != len(cols):
                    raise PlanError(
                        f"CREATE TABLE {stmt.name}: {len(cols)} declared "
                        f"columns but query produces {len(fields)}")
                plan = L.Projection(plan, [
                    E.Alias(E.Cast(E.Column(f.name, f.qualifier), dt, False), n)
                    for f, (n, dt) in zip(fields, cols)])
            self.register_table(stmt.name, DataFrame(self, plan).collect())
            return None
        if isinstance(stmt, A.CreateViewAs):
            plan = SqlPlanner(self.catalog).plan_statement(stmt.query)
            self.catalog.views[stmt.name.lower()] = plan
            return None
        if isinstance(stmt, A.DropTable):
            self.catalog.deregister(stmt.name)
            self.catalog.views.pop(stmt.name.lower(), None)
            return None
        if isinstance(stmt, A.ShowTables):
            names = self.catalog.names()
            return DataFrame(self, L.Values(
                Schema([Field("table_name", T.STRING, False)]),
                [[E.lit(n)] for n in names],
            ))
        if isinstance(stmt, A.ShowVariable):
            from .common.config import REGISTRY

            if stmt.key.lower() == "all":
                keys = sorted(REGISTRY)
                rows = {"name": keys,
                        "value": [str(self.options.get(k)) for k in keys]}
                if stmt.verbose:
                    rows["description"] = [REGISTRY[k].doc for k in keys]
            else:
                v = self.options.get(stmt.key)
                if v is None and stmt.key not in REGISTRY:
                    raise PlanError(f"unknown configuration option "
                                    f"{stmt.key!r}")
                rows = {"name": [stmt.key], "value": [str(v)]}
            return DataFrame(self, L.Values(
                Schema([Field(n, T.STRING, False) for n in rows]),
                [[E.lit(rows[n][i]) for n in rows]
                 for i in range(len(rows["name"]))]))
        if isinstance(stmt, A.ShowColumns):
            prov = self.catalog.get(stmt.table)
            like_re = None
            if stmt.like is not None:
                import re as _re

                pat = _re.escape(stmt.like).replace("%", ".*").replace("_", ".")
                like_re = _re.compile(f"^{pat}$", _re.IGNORECASE)
            names, types_, nulls = [], [], []
            for f in prov.schema().fields:
                if like_re is not None and not like_re.match(f.name):
                    continue
                names.append(f.name)
                types_.append(repr(f.dtype))
                nulls.append("YES" if f.nullable else "NO")
            n = len(names)
            t = Table.from_pydict({
                "table_catalog": [self.catalog.default_catalog] * n,
                "table_schema": [self.catalog.default_schema] * n,
                "table_name": [stmt.table] * n,
                "column_name": names, "data_type": types_,
                "is_nullable": nulls,
            }, {"table_catalog": T.STRING, "table_schema": T.STRING,
                "table_name": T.STRING, "column_name": T.STRING,
                "data_type": T.STRING, "is_nullable": T.STRING})
            plan: L.LogicalPlan = L.TableScan("columns", MemTable(t),
                                              alias="columns")
            if stmt.where is not None:
                from .sql.planner import SqlPlanner as _SP

                pred = _SP(self.catalog).resolve(stmt.where, plan.schema)
                plan = L.Filter(plan, pred)
            return DataFrame(self, plan)
        if isinstance(stmt, A.ShowCreateTable):
            from .sql.unparser import plan_to_sql

            vname = stmt.name.lower()
            definition = None
            if vname in self.catalog.views:
                try:
                    definition = ("CREATE VIEW " + stmt.name + " AS "
                                  + plan_to_sql(self.catalog.views[vname]))
                except Exception:  # noqa: BLE001
                    definition = None
            else:
                self.catalog.get(stmt.name)  # raises if absent
            return DataFrame(self, L.Values(
                Schema([Field("table_catalog", T.STRING, False),
                        Field("table_schema", T.STRING, False),
                        Field("table_name", T.STRING, False),
                        Field("definition", T.STRING, True)]),
                [[E.lit(self.catalog.default_catalog),
                  E.lit(self.catalog.default_schema),
                  E.lit(stmt.name), E.lit(definition)]]))
        if isinstance(stmt, A.SetVariable):
            # parse through the typed registry first; storing the raw string
            # in self.config would override the parsed value in exec_context
            # (and e.g. "false" is truthy)
            self.options.set(stmt.key, stmt.value)
            self.config[stmt.key] = self.options.to_dict().get(
                stmt.key, stmt.value)
            return None
        if isinstance(stmt, A.InsertInto):
            return self._insert_into(stmt, SqlPlanner)
        if isinstance(stmt, A.Delete):
            return self._delete(stmt, A, SqlPlanner)
        if isinstance(stmt, A.Update):
            return self._update(stmt, A, SqlPlanner)
        if isinstance(stmt, A.CopyTo):
            if isinstance(stmt.source, str):
                table = self.table(stmt.source).collect()
            else:
                table = DataFrame(self, SqlPlanner(self.catalog).plan_statement(stmt.source)).collect()
            if stmt.format == "parquet":
                table.write_parquet(stmt.path)
            elif stmt.format == "csv":
                table.write_csv(stmt.path)
            elif stmt.format == "json":
                import json as _json

                cols = table.to_pydict()
                names = list(cols)
                with open(stmt.path, "w") as fh:
                    for i in range(table.num_rows):
                        _json.dump({n: cols[n][i] for n in names}, fh,
                                   default=str)
                        fh.write("\n")
            elif stmt.format in ("arrow", "ipc", "feather"):
                import pyarrow.ipc as pipc

                at = table.to_arrow()
                with pipc.new_file(stmt.path, at.schema) as w:
                    w.write_table(at)
            elif stmt.format == "avro":
                from .io.avro import write_avro

                write_avro(table.to_arrow(), stmt.path)
            else:
                raise PlanError(f"unsupported COPY format {stmt.format!r}")
            return DataFrame(self, L.Values(
                Schema([Field("count", T.INT64, False)]), [[E.lit(table.num_rows)]]))
        raise PlanError(f"unsupported statement {type(stmt).__name__}")

    def _dml_count(self, n: int) -> "DataFrame":
        return DataFrame(self, L.Values(
            Schema([Field("count", T.INT64, False)]), [[E.lit(int(n))]]))

    def _delete(self, stmt, A, SqlPlanner) -> "DataFrame":
        """Eager DELETE on a registered table: keep rows where the predicate
        is not TRUE, re-register (reference: LogicalPlan::Dml(Delete),
        expr/src/logical_plan/plan.rs:211; test_files/dml_delete.slt)."""
        from .catalog.catalog import MemTable

        provider = self.catalog.get(stmt.table)
        target = provider.host_table()
        n_before = target.num_rows
        if stmt.where is None:
            new = Table.from_pydict(
                {f.name: [] for f in target.schema.fields},
                {f.name: f.dtype for f in target.schema.fields})
        else:
            # DELETE removes rows where pred IS TRUE; NULL predicates keep
            keep = E.Not(E.ScalarFunction(
                "coalesce", (stmt.where, E.lit(False))))
            core = A.SelectCore([A.SelectItem(A.Star())],
                                [A.Relation(stmt.table)], keep)
            new = DataFrame(self, SqlPlanner(self.catalog).plan_statement(
                A.SelectStmt(core))).collect()
        self.catalog.register(stmt.table, MemTable(new))
        return self._dml_count(n_before - new.num_rows)

    def _update(self, stmt, A, SqlPlanner) -> "DataFrame":
        """Eager UPDATE: rewrite assigned columns through CASE WHEN pred,
        re-register (reference: Dml(Update), test_files/dml_update.slt)."""
        from .catalog.catalog import MemTable

        provider = self.catalog.get(stmt.table)
        target = provider.host_table()
        assigned = {c.lower(): e for c, e in stmt.assignments}
        unknown = [c for c in assigned
                   if c not in [f.name.lower() for f in target.schema.fields]]
        if unknown:
            raise PlanError(f"UPDATE column(s) not in table: {unknown}")
        items = []
        for f in target.schema.fields:
            if f.name.lower() in assigned:
                newv = E.Cast(assigned[f.name.lower()], f.dtype, False)
                e = (newv if stmt.where is None else
                     E.Case(None, ((stmt.where, newv),), E.Column(f.name)))
            else:
                e = E.Column(f.name)
            items.append(A.SelectItem(e, f.name))
        core = A.SelectCore(items, [A.Relation(stmt.table)])
        new = DataFrame(self, SqlPlanner(self.catalog).plan_statement(
            A.SelectStmt(core))).collect()
        if stmt.where is None:
            n = target.num_rows
        else:
            cnt_core = A.SelectCore(
                [A.SelectItem(E.AggregateFunction("count", ()), "count")],
                [A.Relation(stmt.table)], stmt.where)
            cnt = DataFrame(self, SqlPlanner(self.catalog).plan_statement(
                A.SelectStmt(cnt_core))).collect().to_pydict()
            n = int(cnt["count"][0])
        self.catalog.register(stmt.table, MemTable(new))
        return self._dml_count(n)

    def _insert_into(self, stmt, SqlPlanner) -> "DataFrame":
        provider = self.catalog.get(stmt.table)
        target = provider.host_table()
        if isinstance(stmt.source, list):  # VALUES rows
            names = stmt.columns or target.schema.names()
            data = {n: [] for n in names}
            for row in stmt.source:
                for n, litexpr in zip(names, row):
                    v = litexpr.value if isinstance(litexpr, E.Literal) else None
                    if isinstance(litexpr, E.Negative) and isinstance(litexpr.expr, E.Literal):
                        v = -litexpr.expr.value
                    data[n].append(v)
            types = {f.name: f.dtype for f in target.schema.fields if f.name in data}
            new = Table.from_pydict(data, types)
        else:
            new = DataFrame(self, SqlPlanner(self.catalog).plan_statement(stmt.source)).collect()
        from .catalog.catalog import MemTable

        merged = Table.concat([target, _align_to(new, target)])
        self.catalog.register(stmt.table, MemTable(merged))
        return DataFrame(self, L.Values(
            Schema([Field("count", T.INT64, False)]), [[E.lit(new.num_rows)]]))

    def exec_context(self) -> ExecContext:
        merged = self.options.to_dict()
        merged.update(self.config)
        self._cancel.clear()  # a new execution starts un-cancelled
        merged["_cancel_event"] = self._cancel
        return ExecContext(merged, self.device)


def _align_to(new: Table, target: Table) -> Table:
    """Reorder/rename inserted columns positionally to the target schema."""
    if new.schema.names() == target.schema.names():
        return new
    if len(new.schema) != len(target.schema):
        raise PlanError(
            f"INSERT column count {len(new.schema)} != table {len(target.schema)}")
    from .common.schema import Schema as _S
    import dataclasses as _dc

    fields = [_dc.replace(f, name=t.name) for f, t in zip(new.schema.fields, target.schema.fields)]
    return Table(_S(fields), new.columns)


class DataFrame:
    def __init__(self, ctx: SessionContext, plan: L.LogicalPlan):
        self._ctx = ctx
        self._plan = plan

    # ---- builders (reference: DataFrame API + LogicalPlanBuilder) -------
    @with_registry
    def select(self, *exprs: TyUnion[str, E.Expr]) -> "DataFrame":
        es = [E.col(e) if isinstance(e, str) else e for e in exprs]
        return DataFrame(self._ctx, L.Projection(self._plan, es))

    def filter(self, predicate: E.Expr) -> "DataFrame":
        return DataFrame(self._ctx, L.Filter(self._plan, predicate))

    @with_registry
    def aggregate(self, group_by: Sequence[E.Expr], aggs: Sequence[E.Expr]) -> "DataFrame":
        return DataFrame(self._ctx, L.Aggregate(self._plan, list(group_by), list(aggs)))

    def sort(self, *specs) -> "DataFrame":
        ss = [s if isinstance(s, E.SortSpec) else E.SortSpec(s) for s in specs]
        return DataFrame(self._ctx, L.Sort(self._plan, ss))

    def limit(self, fetch: int, skip: int = 0) -> "DataFrame":
        return DataFrame(self._ctx, L.Limit(self._plan, skip, fetch))

    def join(self, right: "DataFrame", on: Sequence, how: str = "inner",
             filter: Optional[E.Expr] = None) -> "DataFrame":
        jt = {
            "inner": L.JoinType.INNER, "left": L.JoinType.LEFT,
            "right": L.JoinType.RIGHT, "full": L.JoinType.FULL,
            "semi": L.JoinType.LEFT_SEMI, "anti": L.JoinType.LEFT_ANTI,
            "cross": L.JoinType.CROSS,
        }[how]
        pairs = []
        for item in on:
            if isinstance(item, str):
                pairs.append((E.col(item), E.col(item)))
            else:
                l, r = item
                pairs.append((E.col(l) if isinstance(l, str) else l,
                              E.col(r) if isinstance(r, str) else r))
        return DataFrame(self._ctx, L.Join(self._plan, right._plan, pairs, jt, filter))

    def distinct(self) -> "DataFrame":
        return DataFrame(self._ctx, L.Distinct(self._plan))

    def union(self, other: "DataFrame", all: bool = True) -> "DataFrame":
        u = L.Union([self._plan, other._plan], all=True)
        return DataFrame(self._ctx, u if all else L.Distinct(u))

    def alias(self, name: str) -> "DataFrame":
        return DataFrame(self._ctx, L.SubqueryAlias(self._plan, name))

    # ---- reference DataFrame surface (core/src/dataframe/mod.rs) --------
    def select_columns(self, *names: str) -> "DataFrame":
        return self.select(*names)

    def drop_columns(self, *names: str) -> "DataFrame":
        keep = [E.Column(f.name, f.qualifier) for f in self._plan.schema.fields
                if f.name not in names]
        return DataFrame(self._ctx, L.Projection(self._plan, keep))

    def with_column(self, name: str, expr: E.Expr) -> "DataFrame":
        """Add (or replace) one column (reference: DataFrame::with_column)."""
        exprs = []
        replaced = False
        for f in self._plan.schema.fields:
            if f.name == name:
                exprs.append(E.Alias(expr, name))
                replaced = True
            else:
                exprs.append(E.Column(f.name, f.qualifier))
        if not replaced:
            exprs.append(E.Alias(expr, name))
        return DataFrame(self._ctx, L.Projection(self._plan, exprs))

    def with_column_renamed(self, old: str, new: str) -> "DataFrame":
        exprs = [E.Alias(E.Column(f.name, f.qualifier), new)
                 if f.name == old else E.Column(f.name, f.qualifier)
                 for f in self._plan.schema.fields]
        return DataFrame(self._ctx, L.Projection(self._plan, exprs))

    def union_distinct(self, other: "DataFrame") -> "DataFrame":
        return self.union(other, all=False)

    def union_by_name(self, other: "DataFrame", all: bool = True) -> "DataFrame":
        """Union matching columns by NAME, not position (reference:
        union_by_name): the right side is re-projected into the left's
        column order."""
        mine = [f.name for f in self._plan.schema.fields]
        proj = [E.Column(n, None) for n in mine]
        rhs = L.Projection(other._plan, proj)
        u = L.Union([self._plan, rhs], all=True)
        return DataFrame(self._ctx, u if all else L.Distinct(u))

    def _setop(self, other: "DataFrame", jt: L.JoinType) -> "DataFrame":
        on = [(E.Column(f.name, f.qualifier), E.Column(g.name, g.qualifier))
              for f, g in zip(self._plan.schema.fields,
                              other._plan.schema.fields)]
        return DataFrame(self._ctx, L.Distinct(
            L.Join(self._plan, other._plan, on, jt, None)))

    def intersect(self, other: "DataFrame") -> "DataFrame":
        return self._setop(other, L.JoinType.LEFT_SEMI)

    intersect_distinct = intersect

    def except_all(self, other: "DataFrame") -> "DataFrame":
        return self._setop(other, L.JoinType.LEFT_ANTI)

    except_ = except_distinct = except_all

    def distinct_on(self, on_exprs: Sequence[E.Expr],
                    select_exprs: Sequence[E.Expr],
                    sort_exprs: Optional[Sequence] = None) -> "DataFrame":
        """First row per distinct on_exprs value, ordered by sort_exprs
        (reference: DataFrame::distinct_on / DISTINCT ON)."""
        parts = list(on_exprs)
        order = []
        for s in (sort_exprs or []):
            order.append(s if isinstance(s, E.SortSpec) else E.SortSpec(s))
        rn = E.Alias(E.WindowFunction("row_number", (), tuple(parts),
                                      tuple(order), None), "__df_rn")
        w = L.Window(self._plan, [rn])
        f = L.Filter(w, E.BinaryOp(E.Op.EQ, E.Column("__df_rn", None),
                                   E.lit(1)))
        return DataFrame(self._ctx, L.Projection(f, list(select_exprs)))

    def fill_null(self, value, columns: Sequence[str] = ()) -> "DataFrame":
        cols = set(columns or [f.name for f in self._plan.schema.fields])
        exprs = []
        for f in self._plan.schema.fields:
            c = E.Column(f.name, f.qualifier)
            if f.name in cols and f.nullable:
                exprs.append(E.Alias(
                    E.ScalarFunction("coalesce", (c, E.lit(value))), f.name))
            else:
                exprs.append(c)
        return DataFrame(self._ctx, L.Projection(self._plan, exprs))

    def unnest_columns(self, *names: str) -> "DataFrame":
        """Explode list columns in place (reference: unnest_columns -- the
        exploded elements REPLACE the list column under its name)."""
        plan = self._plan
        for n in names:
            u = L.Unnest(plan, [E.Column(n, None)], names=[f"__unnest_{n}"])
            proj = [E.Alias(E.Column(f"__unnest_{n}", None), n)
                    if f.name == n else E.Column(f.name, f.qualifier)
                    for f in plan.schema.fields]
            plan = L.Projection(u, proj)
        return DataFrame(self._ctx, plan)

    def sort_by(self, *exprs) -> "DataFrame":
        return self.sort(*exprs)

    def join_on(self, right: "DataFrame", how: str = "inner",
                *predicates: E.Expr) -> "DataFrame":
        """Join on arbitrary predicates (reference: DataFrame::join_on);
        the optimizer extracts equi-pairs from the conjunction."""
        jt = {"inner": L.JoinType.INNER, "left": L.JoinType.LEFT,
              "right": L.JoinType.RIGHT, "full": L.JoinType.FULL,
              "semi": L.JoinType.LEFT_SEMI, "anti": L.JoinType.LEFT_ANTI}[how]
        pred = None
        for p in predicates:
            pred = p if pred is None else E.BinaryOp(E.Op.AND, pred, p)
        return DataFrame(self._ctx,
                         L.Join(self._plan, right._plan, [], jt, pred))

    def describe(self) -> "Table":
        """Summary statistics per numeric column (reference:
        DataFrame::describe): count, null_count, mean, std, min, max,
        median rows."""
        import math

        t = self.collect()
        d = t.to_pydict()
        stats = ["count", "null_count", "mean", "std", "min", "max",
                 "median"]
        out: Dict[str, list] = {"describe": stats}
        import numpy as _np

        for f in t.schema.fields:
            vals = d[f.name]
            nn = [v for v in vals if v is not None]
            col: list = [float(len(vals)), float(len(vals) - len(nn))]
            if f.dtype.is_numeric and nn:
                arr = _np.asarray(nn, dtype=float)
                col += [float(arr.mean()),
                        float(arr.std(ddof=1)) if len(arr) > 1 else math.nan,
                        float(arr.min()), float(arr.max()),
                        float(_np.median(arr))]
            else:
                col += [math.nan] * 5
            out[f.name] = col
        from .data.table import Table as _T

        return _T.from_pydict(out)

    def cache(self) -> "DataFrame":
        """Materialize and continue from an in-memory table (reference:
        DataFrame::cache)."""
        from .catalog.catalog import MemTable

        t = self.collect()
        name = f"__cache_{id(t)}"
        self._ctx.catalog.register(name, MemTable(t))
        return self._ctx.table(name)

    def into_view(self, name: str) -> None:
        """Register this DataFrame's plan as a named view
        (reference: DataFrame::into_view)."""
        self._ctx.catalog.views[name.lower()] = self._plan

    @with_registry
    def window(self, window_exprs: Sequence[E.Expr]) -> "DataFrame":
        return DataFrame(self._ctx, L.Window(self._plan, list(window_exprs)))

    # ---- introspection ---------------------------------------------------
    @property
    def schema(self) -> Schema:
        return self._plan.schema

    def logical_plan(self) -> L.LogicalPlan:
        return self._plan

    def to_substrait(self) -> dict:
        """Serialize this DataFrame's logical plan to a Substrait plan
        (proto3-JSON dict; reference analog:
        substrait/src/logical_plan/producer.rs)."""
        from .interchange.substrait import plan_to_substrait

        return plan_to_substrait(self._plan)

    def to_proto(self) -> bytes:
        """Serialize this DataFrame's logical plan to DataFusion's protobuf
        wire format (reference analog: proto/src/bytes/mod.rs
        logical_plan_to_bytes)."""
        from .interchange.dfproto import plan_to_proto_bytes

        return plan_to_proto_bytes(self._plan)

    @with_registry
    def optimized_plan(self) -> L.LogicalPlan:
        from .optimizer.optimizer import optimize

        merged = self._ctx.options.to_dict()
        merged.update(self._ctx.config)
        return optimize(self._plan, self._ctx.catalog, merged)

    @with_registry
    def physical_plan(self):
        """Cached: one physical plan per DataFrame, shared by collect()/
        explain()/execute_stream() so discovered capacities persist."""
        if getattr(self, "_pp", None) is None:
            self._pp = create_physical_plan(self.optimized_plan())
        return self._pp

    @with_registry
    def explain(self, format: Optional[str] = None) -> str:
        """Render the plan. format: 'indent' (default) or 'tree'
        (reference: explain.format, common/src/config.rs ExplainFormat)."""
        opts = self._ctx.options
        fmt = (format or opts.get("explain.format", "indent")).lower()
        lp = self.optimized_plan()
        pp = create_physical_plan(lp)
        lonly = bool(opts.get("explain.logical_plan_only", False))
        ponly = bool(opts.get("explain.physical_plan_only", False))
        if fmt == "tree":
            ltxt, ptxt = _tree_render(lp.display()), _tree_render(pp.display())
        elif fmt == "indent":
            ltxt, ptxt = lp.display(), pp.display()
        else:
            raise PlanError(f"unknown explain format {fmt!r} "
                            "(expected 'indent' or 'tree')")
        if lonly and not ponly:
            return f"== Logical Plan ==\n{ltxt}"
        if ponly and not lonly:
            return f"== Physical Plan ==\n{ptxt}"
        return f"== Logical Plan ==\n{ltxt}\n== Physical Plan ==\n{ptxt}"

    @with_registry
    def explain_analyze(self) -> str:
        """Execute and report per-operator metrics (reference: AnalyzeExec,
        physical-plan/src/analyze.rs:46 + EXPLAIN ANALYZE rendering)."""
        import time as _t

        ctx = self._ctx.exec_context()
        phys = self.physical_plan()
        t0 = _t.perf_counter()
        rel = phys.execute(ctx)
        import jax

        jax.block_until_ready(rel.sel)
        total = _t.perf_counter() - t0
        rows = int(rel.num_rows())
        lines = [f"== Physical Plan (EXPLAIN ANALYZE) ==", phys.display(),
                 f"-- total: {total * 1000:.2f} ms, output rows: {rows}",
                 f"-- peak device memory accounted: {ctx.memory_pool.peak / 1e6:.1f} MB"]
        for name, m in sorted(ctx.metrics.items()):
            lines.append(
                f"--   {name}: elapsed={m.elapsed_seconds * 1000:.2f} ms"
                + (f", rows={m.output_rows}" if m.output_rows else "")
            )
        return "\n".join(lines)

    # ---- execution -------------------------------------------------------
    @with_registry
    def collect(self) -> Table:
        """Execute and return a host Table. Runs through FusedQuery (one XLA
        program per query once capacities are discovered) — the same path the
        benchmarks use; per-operator dispatch remains as the discovery pass
        and the fallback for non-fusible plans (reference analog:
        physical_plan::collect, physical-plan/src/common.rs:43). Workloads
        that exceed the configured memory limit run through the chunked
        out-of-core executor instead (physical/chunked.py)."""
        ctx = self._ctx.exec_context()
        cq = self._chunked_query(ctx)
        if cq is not None:
            from .physical.chunked import plan_boundedness

            if plan_boundedness(cq.plan):
                raise PlanError(
                    "query output is an unbounded stream; use "
                    "execute_stream() or add a LIMIT")
            return cq.collect(ctx)
        rel = self._fused_query().execute(ctx)
        return to_host(rel)

    def execute_stream(self, chunk_rows: Optional[int] = None):
        """Incremental execution: yield host Tables chunk by chunk through
        the chunked executor (reference: DataFrame::execute_stream ->
        SendableRecordBatchStream). The only way to consume a query whose
        OUTPUT is unbounded."""
        ctx = self._ctx.exec_context()
        from .physical.chunked import ChunkedQuery, plan_boundedness

        rows = int(chunk_rows or ctx.opt("execution.chunk_rows", 1 << 21)
                   or (1 << 21))
        cq = ChunkedQuery(self.physical_plan(), rows)
        plan_boundedness(cq.plan)  # reject breakers over unbounded inputs
        for rel in cq._stream(cq.plan, ctx):
            t = to_host(rel)
            if t.num_rows:
                yield t

    def _chunked_query(self, ctx):
        """ChunkedQuery when out-of-core execution applies (config 'on', or
        'auto' with a bounded memory pool whose limit the estimated scan size
        would bust), else None."""
        mode = str(ctx.opt("execution.out_of_core", "auto")).lower()
        if getattr(self, "_cq", None) is not None:
            return self._cq
        from .physical.chunked import (ChunkedQuery, estimate_scan_bytes,
                                       plan_boundedness, scan_unbounded)

        chunk_rows = int(ctx.opt("execution.chunk_rows", 1 << 21) or (1 << 21))
        plan0 = self.physical_plan()
        if scan_unbounded(plan0):
            plan_boundedness(plan0)  # raises on breakers over the stream
            self._cq = ChunkedQuery(plan0, chunk_rows)
            return self._cq
        if mode in ("off", "false", "0", "none"):
            return None
        if mode in ("on", "true", "1"):
            self._cq = ChunkedQuery(self.physical_plan(), chunk_rows)
            return self._cq
        limit = ctx.memory_pool.headroom()
        if limit is None:
            return None
        plan = self.physical_plan()
        if estimate_scan_bytes(plan) <= ctx.memory_pool.limit // 2:
            return None
        self._cq = ChunkedQuery(plan, chunk_rows)
        return self._cq

    def _fused_query(self):
        if getattr(self, "_fq", None) is None:
            from .physical.fused import FusedQuery

            self._fq = FusedQuery(self.physical_plan())
        return self._fq

    def to_pandas(self):
        return self.collect().to_pandas()

    def to_pydict(self):
        return self.collect().to_pydict()

    def count(self) -> int:
        return self.collect().num_rows

    def write_parquet(self, path: str) -> None:
        self.collect().write_parquet(path)

    def write_csv(self, path: str) -> None:
        self.collect().write_csv(path)

    def show(self, limit: int = 20):
        print(self.limit(limit).to_pandas().to_string(index=False))


def _replace_params(obj, values):
    """Rebuild a parsed-statement tree with $N placeholders replaced by the
    EXECUTE argument literals (reference:
    LogicalPlan::replace_params_with_values, expr/src/logical_plan/plan.rs).
    Walks AST/Expr dataclasses, tuples and lists generically."""
    import dataclasses

    if isinstance(obj, E.Placeholder):
        idx = int(obj.pid.lstrip("$")) - 1
        if not 0 <= idx < len(values):
            raise PlanError(f"no value for placeholder {obj.pid}")
        return values[idx]
    if isinstance(obj, (list, tuple)):
        out = [_replace_params(x, values) for x in obj]
        return type(obj)(out)
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        changes = {}
        for f in dataclasses.fields(obj):
            v = getattr(obj, f.name)
            nv = _replace_params(v, values)
            if nv is not v:
                changes[f.name] = nv
        return dataclasses.replace(obj, **changes) if changes else obj
    return obj


def _tree_render(indent_text: str) -> str:
    """Re-render a 2-space-indented operator listing as a connector tree
    (reference: ExplainFormat::Tree, physical-plan tree_render)."""
    lines = [l for l in indent_text.splitlines() if l.strip()]
    depths = [(len(l) - len(l.lstrip())) // 2 for l in lines]
    out = []
    for i, (d, l) in enumerate(zip(depths, lines)):
        label = l.strip()
        if d == 0:
            out.append(label)
            continue
        # is this node the last child of its parent?
        last = True
        for j in range(i + 1, len(lines)):
            if depths[j] < d:
                break
            if depths[j] == d:
                last = False
                break
        prefix = ""
        cur = d
        for anc in range(1, d):
            # ancestor at depth `anc` has a following sibling?
            anc_last = True
            for j in range(i + 1, len(lines)):
                if depths[j] < anc:
                    break
                if depths[j] == anc:
                    anc_last = False
                    break
            prefix += "    " if anc_last else "│   "
        prefix += "└── " if last else "├── "
        out.append(prefix + label)
        del cur
    return "\n".join(out)
