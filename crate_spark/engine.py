"""CrateSession — the engine's user-facing entry point.

Maps the reference's session lifecycle (``session/Session.java:370``
parse -> analyze -> plan -> execute; HTTP ``SqlHttpHandler.quickExec``)
onto: dialect shim -> ``spark.sql`` -> Catalyst. One object per user
session, holding the table catalog, system views and session settings.

Surface:
- ``execute(sql)``      -> DataFrame (SELECT/VALUES/EXPLAIN/SET/...)
- ``explain(sql)``      -> formatted physical plan text
- ``analyze(table)``    -> ANALYZE: Spark COMPUTE STATISTICS (feeds
                           CBO — reference ``TableStatsService.java:101``)
- system views: ``sys_cluster``, ``sys_tables``,
  ``information_schema_tables``, ``information_schema_columns``
  (queryable as ``sys.tables`` etc. through the shim —
  reference ``SysTableDefinitions.java``,
  ``InformationSchemaTableDefinitions.java``)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from crate_spark.dialect import rewrite
from crate_spark.session import TABLES, apply_runtime_confs, load_tables


class CrateSession:
    """A SQL session over the engine's catalog."""

    def __init__(
        self,
        spark: SparkSession,
        data_dir: str | None = None,
        storage_dir: str | None = None,
    ):
        import tempfile

        from crate_spark.sql_dml import SqlDmlRouter

        self.spark = spark
        apply_runtime_confs(spark)
        self.tables: dict[str, DataFrame] = {}
        if data_dir:
            self.tables = dict(load_tables(spark, data_dir, register=True))
        #: root directory for tables created via SQL CREATE TABLE
        self.storage_dir = storage_dir or tempfile.mkdtemp(prefix="crate_tables_")
        self._dml = SqlDmlRouter(self)
        #: open cursors: name -> {"it": row iterator, "schema": StructType}
        self._cursors: dict[str, dict] = {}
        self._register_system_views()

    # -- catalog ---------------------------------------------------------
    def register(self, name: str, df: DataFrame) -> None:
        df.createOrReplaceTempView(name)
        self.tables[name] = df
        self._register_system_views()

    def _register_system_views(self) -> None:
        spark = self.spark
        rows = [(name, "doc", "BASE TABLE") for name in sorted(self.tables)]
        spark.createDataFrame(
            rows or [("", "", "")],
            "table_name string, table_schema string, table_type string",
        ).filter("table_name <> ''").createOrReplaceTempView("information_schema_tables")

        col_rows = []
        for name, df in sorted(self.tables.items()):
            for pos, f in enumerate(df.schema.fields, start=1):
                col_rows.append(
                    (name, "doc", f.name, pos, f.dataType.simpleString(), f.nullable)
                )
        spark.createDataFrame(
            col_rows or [("", "", "", 0, "", True)],
            "table_name string, table_schema string, column_name string, "
            "ordinal_position int, data_type string, is_nullable boolean",
        ).filter("table_name <> ''").createOrReplaceTempView("information_schema_columns")

        spark.createDataFrame(
            [("crate-spark", spark.version, spark.sparkContext.defaultParallelism)],
            "name string, version string, parallelism int",
        ).createOrReplaceTempView("sys_cluster")
        spark.createDataFrame(
            [(n, "doc") for n in sorted(self.tables)] or [("", "")],
            "table_name string, schema_name string",
        ).filter("table_name <> ''").createOrReplaceTempView("sys_tables")

        # pg_catalog minimum for PG-compat tooling (reference
        # metadata/pgcatalog/PgCatalogTableDefinitions.java): pg_tables,
        # pg_namespace, pg_type — queryable as pg_catalog.X via the shim.
        spark.createDataFrame(
            [("doc", n, "crate") for n in sorted(self.tables)] or [("", "", "")],
            "schemaname string, tablename string, tableowner string",
        ).filter("tablename <> ''").createOrReplaceTempView("pg_catalog_pg_tables")
        spark.createDataFrame(
            [(11, "doc"), (12, "information_schema"), (13, "sys"), (14, "pg_catalog")],
            "oid int, nspname string",
        ).createOrReplaceTempView("pg_catalog_pg_namespace")
        # the PG type OIDs tooling actually probes (PGTypes.java)
        spark.createDataFrame(
            [
                (16, "bool", 1), (20, "int8", 8), (21, "int2", 2),
                (23, "int4", 4), (25, "text", -1), (700, "float4", 4),
                (701, "float8", 8), (1043, "varchar", -1),
                (1114, "timestamp", 8), (1184, "timestamptz", 8),
                (1700, "numeric", -1), (114, "json", -1), (2950, "uuid", 16),
            ],
            "oid int, typname string, typlen int",
        ).createOrReplaceTempView("pg_catalog_pg_type")

    # -- statements ------------------------------------------------------
    def execute(self, sql: str) -> DataFrame:
        """Execute one statement (the quickExec analog)."""
        stmt = sql.strip().rstrip(";")
        upper = stmt.upper()

        # Temp views are global to the SparkSession; if another
        # CrateSession shares it, catalog views may reflect THAT
        # session's tables. Re-register ours whenever a statement reads
        # them, so each session sees its own catalog at query time.
        if re.search(r"\b(information_schema|sys|pg_catalog)\s*\.", stmt, re.IGNORECASE):
            self._register_system_views()

        if upper.startswith("EXPLAIN"):
            analyze = re.match(r"EXPLAIN\s+ANALYZE\s", upper) is not None
            body = re.sub(r"^EXPLAIN\s+(ANALYZE\s+|VERBOSE\s+)?", "", stmt, flags=re.IGNORECASE)
            if analyze:
                return self._explain_analyze(body)
            plan = self.explain(body)
            return self.spark.createDataFrame([(plan,)], "plan string")

        m = re.match(r"SET\s+(\S+)\s*=\s*(.+)$", stmt, re.IGNORECASE)
        if m:
            self.spark.conf.set(m.group(1), m.group(2).strip("'\""))
            return self.spark.createDataFrame([(m.group(1), m.group(2))], "setting string, value string")

        m = re.match(r"RESET\s+(\S+)$", stmt, re.IGNORECASE)
        if m:
            self.spark.conf.unset(m.group(1))
            return self.spark.createDataFrame([(m.group(1),)], "setting string")

        m = re.match(
            r"CREATE\s+(?:OR\s+REPLACE\s+)?FUNCTION\s+(\w+)\s*\(([^)]*)\)\s*"
            r"RETURNS\s+([\w()]+)\s+LANGUAGE\s+(PYTHON|PANDAS)\s+AS\s+'(.*)'\s*$",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            return self._create_function(
                m.group(1), m.group(2), m.group(3), m.group(5),
                language=m.group(4).upper(),
            )

        m = re.match(r"ANALYZE\s+(\S+)$", stmt, re.IGNORECASE)
        if m:
            return self.analyze(m.group(1))

        # SHOW statements (reference sql/statements/show.rst;
        # planner ShowStatementAnalyzer rewrites them to
        # information_schema queries — same trick here)
        m = re.match(r"SHOW\s+(TABLES|SCHEMAS|COLUMNS\s+(?:FROM|IN)\s+(\w+))\s*$", stmt, re.IGNORECASE)
        if m:
            self._register_system_views()
            what = m.group(1).upper()
            if what == "TABLES":
                return self.spark.sql(
                    "SELECT table_name FROM information_schema_tables ORDER BY table_name"
                )
            if what == "SCHEMAS":
                return self.spark.createDataFrame(
                    [("doc",), ("information_schema",), ("pg_catalog",), ("sys",)],
                    "schema_name string",
                )
            return self.spark.sql(
                f"SELECT column_name, data_type FROM information_schema_columns "
                f"WHERE table_name = '{m.group(2)}' ORDER BY ordinal_position"
            )
        m = re.match(r"SHOW\s+(\S+)\s*$", stmt, re.IGNORECASE)
        if m:
            val = self.spark.conf.get(m.group(1), None)
            return self.spark.createDataFrame(
                [(m.group(1), val)], "setting string, value string"
            )

        if re.match(r"REFRESH\s+TABLE\s+", upper):
            # Lucene-refresh analog: parquet reads are always visible;
            # clear any cached plans for the table.
            name = stmt.split()[-1]
            self.spark.catalog.refreshTable(name)
            return self.spark.createDataFrame([(name,)], "refreshed string")

        # Transaction statements are accepted no-ops: the engine is
        # autocommit exactly like the reference (Planner.java:289-304
        # visitBegin/visitCommit return NoopPlan). KILL likewise.
        m = re.match(r"(BEGIN|COMMIT|ROLLBACK|END)\b|KILL\s+", upper)
        if m:
            return self.spark.createDataFrame([("OK",)], "status string")

        # OPTIMIZE TABLE: segment merge analog — parquet compaction is
        # a storage-layer concern (AQE coalescing at read); no-op marker
        m = re.match(r"OPTIMIZE\s+TABLE\s+(\S+)", stmt, re.IGNORECASE)
        if m:
            return self.spark.createDataFrame([(m.group(1), "ok")], "table string, status string")

        m = re.match(
            r"CREATE\s+(?:OR\s+REPLACE\s+)?VIEW\s+([\w.\"]+)\s+AS\s+(.+)$",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            name = m.group(1).strip('"').split(".")[-1]
            df = self.spark.sql(rewrite(self._sub_current_setting(m.group(2))))
            self.register(name, df)
            return self.spark.createDataFrame([(name,)], "view string")

        m = re.match(r"DROP\s+VIEW\s+(IF\s+EXISTS\s+)?([\w.\"]+)\s*$", stmt, re.IGNORECASE)
        if m:
            name = m.group(2).strip('"').split(".")[-1]
            self.spark.catalog.dropTempView(name)
            self.tables.pop(name, None)
            self._register_system_views()
            return self.spark.createDataFrame([(name,)], "dropped string")

        # Cursors (reference session/Cursor.java): DECLARE / FETCH /
        # CLOSE. Rows stream through toLocalIterator — one partition on
        # the driver at a time, so FETCH over a 100 TB result is
        # incremental, never a full collect.
        m = re.match(
            r"DECLARE\s+(\w+)\s+(?:BINARY\s+)?(?:NO\s+SCROLL\s+)?CURSOR\s+"
            r"(?:WITH\s+(?:OUT\s+)?HOLD\s+)?FOR\s+(.+)$",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            df = self.spark.sql(rewrite(self._sub_current_setting(m.group(2))))
            self._cursors[m.group(1).lower()] = {
                "it": df.toLocalIterator(),
                "schema": df.schema,
            }
            return self.spark.createDataFrame([(m.group(1),)], "cursor string")

        m = re.match(
            r"FETCH\s+(?:FORWARD\s+)?(ALL|\d+)?\s*(?:FROM|IN)\s+(\w+)$",
            stmt,
            re.IGNORECASE,
        )
        if m:
            name = m.group(2).lower()
            if name not in self._cursors:
                raise ValueError(f"cursor '{name}' does not exist")
            cur = self._cursors[name]
            count = m.group(1) or "1"
            rows = (
                list(cur["it"])
                if count.upper() == "ALL"
                else [r for _, r in zip(range(int(count)), cur["it"])]
            )
            return self.spark.createDataFrame(rows, cur["schema"])

        m = re.match(r"CLOSE\s+(ALL|\w+)$", stmt, re.IGNORECASE)
        if m:
            target = m.group(1).lower()
            closed = list(self._cursors) if target == "all" else [target]
            for name in closed:
                self._cursors.pop(name, None)
            return self.spark.createDataFrame([(n,) for n in closed] or [("",)], "closed string")

        # DML/DDL dispatch (reference planner/Planner.java:273-500):
        # CREATE TABLE / DROP TABLE / INSERT / UPDATE / DELETE / COPY
        routed = self._dml.route(stmt)
        if routed is not None:
            return routed

        return self.spark.sql(rewrite(self._sub_current_setting(stmt)))

    _CURRENT_SETTING_RE = re.compile(
        r"current_setting\(\s*'([^']+)'\s*(?:,\s*(true|false))?\s*\)", re.IGNORECASE
    )

    def _sub_current_setting(self, stmt: str) -> str:
        """``current_setting('key'[, missing_ok])`` -> the session conf
        value as a literal (pg_catalog SessionSettings analog). Session
        state lives on the driver, so this resolves at plan time."""

        def repl(m: re.Match) -> str:
            key, missing_ok = m.group(1), m.group(2)
            val = self.spark.conf.get(key, None)
            if val is None:
                if missing_ok and missing_ok.lower() == "true":
                    return "CAST(NULL AS STRING)"
                raise ValueError(f"unrecognized configuration parameter '{key}'")
            return "'" + val.replace("'", "''") + "'"

        return self._CURRENT_SETTING_RE.sub(repl, stmt)

    def _create_function(
        self, name: str, args: str, ret_type: str, body: str,
        language: str = "PYTHON",
    ) -> DataFrame:
        """CREATE FUNCTION name(args) RETURNS type LANGUAGE PYTHON|PANDAS
        AS '<expression over the arg names>'.

        Reference: ``expression/udf/UserDefinedFunctionService.java:67``
        — scalar UDFs only, there in JavaScript on GraalVM; here the
        body is a Python expression (JS-source compat is out of scope,
        SURVEY.md §2.11). LANGUAGE PYTHON registers a row-at-a-time UDF
        (documented slow path); LANGUAGE PANDAS registers an
        Arrow-batched pandas UDF — the body is evaluated over pandas
        Series (vectorized: ~10-100x faster on the hot path, the right
        choice at scale when a built-in genuinely can't express it).
        """
        specs = [a.strip().split() for a in args.split(",") if a.strip()]
        arg_names = [s[0] for s in specs]
        # coerce inputs to natural Python types (SQL decimal literals
        # arrive as decimal.Decimal, which breaks float arithmetic)
        _float_types = {"double", "real", "float", "double precision"}
        _int_types = {"int", "integer", "bigint", "smallint", "byte"}
        coercers = []
        for s in specs:
            declared = " ".join(s[1:]).lower() if len(s) > 1 else ""
            if declared in _float_types:
                coercers.append(float)
            elif declared in _int_types:
                coercers.append(int)
            else:
                coercers.append(lambda x: x)
        # The reference runs UDF bodies in a sandboxed GraalVM JS context
        # (UserDefinedFunctionService). A Python eval cannot be a real
        # sandbox, so (a) CREATE FUNCTION must only be exposed to trusted
        # callers, and (b) we at least compile the body against a
        # restricted builtins whitelist — no import, open, exec, etc.
        import builtins as _b

        safe_builtins = {
            n: getattr(_b, n)
            for n in (
                "abs", "all", "any", "bool", "dict", "divmod", "enumerate",
                "filter", "float", "int", "len", "list", "map", "max", "min",
                "pow", "range", "reversed", "round", "set", "sorted", "str",
                "sum", "tuple", "zip",
            )
        }
        import math as _math

        if language == "PANDAS":
            # vectorized path: args are pandas Series; numpy/pandas in
            # scope, Arrow batches end-to-end. Declared-type coercion:
            # SQL decimal literals arrive as object-dtype Decimal Series.
            import numpy as _np
            import pandas as _pd
            from pyspark.sql.functions import pandas_udf

            dtypes = []
            for s in specs:
                declared = " ".join(s[1:]).lower() if len(s) > 1 else ""
                if declared in _float_types:
                    dtypes.append("float64")
                elif declared in _int_types:
                    dtypes.append("int64")
                else:
                    dtypes.append(None)
            body_fn = eval(  # noqa: S307 - trusted-caller surface by design
                f"lambda {', '.join(arg_names)}: ({body})",
                {"__builtins__": safe_builtins, "np": _np, "pd": _pd},
            )

            def vec_fn(*series):
                return body_fn(
                    *[s if d is None else s.astype(d) for s, d in zip(series, dtypes)]
                )

            self.spark.udf.register(name, pandas_udf(vec_fn, ret_type))
            return self.spark.createDataFrame(
                [(name, ret_type)], "function string, returns string"
            )

        body_fn = eval(  # noqa: S307 - trusted-caller surface by design
            f"lambda {', '.join(arg_names)}: ({body})",
            {"__builtins__": safe_builtins, "math": _math},
        )

        def fn(*vals):
            return body_fn(*[None if v is None else c(v) for c, v in zip(coercers, vals)])

        self.spark.udf.register(name, fn, ret_type)
        return self.spark.createDataFrame([(name, ret_type)], "function string, returns string")

    def _explain_analyze(self, body: str) -> DataFrame:
        """EXPLAIN ANALYZE: execute the statement and report per-phase
        wall times plus the output row count (reference
        ``planner/node/management/ExplainPlan.java:56`` — its profile
        has Parse/Analyze/Plan/Execute phases; here Catalyst's
        parse+analyze+optimize collapse into the 'plan' phase and
        'execute' times a full run of the physical plan)."""
        import time

        t0 = time.perf_counter()
        df = self.spark.sql(rewrite(self._sub_current_setting(body)))
        # force analysis + optimization (lazy otherwise)
        plan_text = df._jdf.queryExecution().optimizedPlan().toString()
        t1 = time.perf_counter()
        rows = df.count()
        t2 = time.perf_counter()
        physical = df._jdf.queryExecution().executedPlan().toString()
        out = [
            ("plan", plan_text.strip().split("\n")[0], (t1 - t0) * 1000.0, None),
            ("execute", physical.strip().split("\n")[0], (t2 - t1) * 1000.0, rows),
        ]
        return self.spark.createDataFrame(
            out, "phase string, detail string, millis double, rows bigint"
        )

    def explain(self, sql: str) -> str:
        """EXPLAIN — formatted physical plan (ExplainPlan.java:56)."""
        df = self.spark.sql(rewrite(sql))
        return df._jdf.queryExecution().explainString(
            self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )

    def analyze(self, table: str) -> DataFrame:
        """ANALYZE <table>: persist the view as a managed table snapshot
        is out of scope — for temp-view catalogs Spark cannot collect
        stats, so this is a no-op marker kept for API parity; with a
        real metastore it issues COMPUTE STATISTICS FOR ALL COLUMNS."""
        try:
            self.spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR ALL COLUMNS")
            status = "analyzed"
        except Exception:
            status = "skipped (temp view)"
        return self.spark.createDataFrame([(table, status)], "table string, status string")
