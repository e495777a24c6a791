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

    # -- statements ------------------------------------------------------
    def execute(self, sql: str) -> DataFrame:
        """Execute one statement (the quickExec analog)."""
        stmt = sql.strip().rstrip(";")
        upper = stmt.upper()

        if upper.startswith("EXPLAIN"):
            body = re.sub(r"^EXPLAIN\s+(ANALYZE\s+|VERBOSE\s+)?", "", stmt, flags=re.IGNORECASE)
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
            r"RETURNS\s+([\w()]+)\s+LANGUAGE\s+PYTHON\s+AS\s+'(.*)'\s*$",
            stmt,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            return self._create_function(m.group(1), m.group(2), m.group(3), m.group(4))

        m = re.match(r"ANALYZE\s+(\S+)$", stmt, re.IGNORECASE)
        if m:
            return self.analyze(m.group(1))

        if re.match(r"REFRESH\s+TABLE\s+", upper):
            # Lucene-refresh analog: parquet reads are always visible;
            # clear any cached plans for the table.
            name = stmt.split()[-1]
            self.spark.catalog.refreshTable(name)
            return self.spark.createDataFrame([(name,)], "refreshed string")

        # DML/DDL dispatch (reference planner/Planner.java:273-500):
        # CREATE TABLE / DROP TABLE / INSERT / UPDATE / DELETE / COPY
        routed = self._dml.route(stmt)
        if routed is not None:
            return routed

        return self.spark.sql(rewrite(stmt))

    def _create_function(self, name: str, args: str, ret_type: str, body: str) -> DataFrame:
        """CREATE FUNCTION name(args) RETURNS type LANGUAGE PYTHON AS
        '<expression over the arg names>'.

        Reference: ``expression/udf/UserDefinedFunctionService.java:67``
        — scalar UDFs only, there in JavaScript on GraalVM; here the
        body is a Python expression (JS-source compat is out of scope,
        SURVEY.md §2.11). Registered as a row-at-a-time Python UDF —
        the documented slow path; built-ins always win when available.
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

        body_fn = eval(  # noqa: S307 - trusted-caller surface by design
            f"lambda {', '.join(arg_names)}: ({body})",
            {"__builtins__": safe_builtins, "math": _math},
        )

        def fn(*vals):
            return body_fn(*[None if v is None else c(v) for c, v in zip(coercers, vals)])

        self.spark.udf.register(name, fn, ret_type)
        return self.spark.createDataFrame([(name, ret_type)], "function string, returns string")

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
