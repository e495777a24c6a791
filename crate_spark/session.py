"""Session & catalog layer.

CrateDB's query lifecycle (parse -> analyze -> plan -> execute;
reference ``server/src/main/java/io/crate/session/Session.java:370-618``,
``planner/Planner.java:273``) maps onto Spark Catalyst: we configure a
SparkSession for analytic workloads, register the test-data tables as
views and let Catalyst do analysis/optimization/physical planning.

Scale notes (100 TB design intent, tested at local[32]):

- AQE is enabled so shuffle partition counts, skew-join splitting and
  join-strategy demotion re-plan at runtime from real statistics —
  this replaces the reference's static ``planner/distribution``
  MODULO/BROADCAST choice (``DistributionType.java:24``).
- CBO + join reorder replaces ``planner/optimizer/rule/EliminateCrossJoin``
  and ``ReorderHashJoin`` (reference rules; see SURVEY.md §4.1).
- All timestamps are handled as TIMESTAMP_NTZ in UTC: CrateDB stores
  epoch millis (``types/TimestampType.java``); the driver's parquet has
  ms (lineitem/orders) and ns (events). Spark 4 rejects parquet NANOS
  outright, so we read them as raw longs
  (``spark.sql.legacy.parquet.nanosAsLong``) and convert to µs — the
  same truncation DuckDB applies, keeping oracle comparisons exact.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Tables provided by the driver (TESTDATA.md). One parquet file each.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Confs that are safe to set at runtime on an existing session (the
#: driver owns the SparkSession passed to ``queries()`` entries).
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    # events.parquet has TIMESTAMP(NANOS) which Spark 4 refuses; read as long.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
    # Arrow for any pandas-UDF path (vector ops fall back to JVM exprs).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Spark substitutes ${var} even INSIDE string literals; the
    # reference has no variable substitution, so a data value like
    # '${0}' must reach the row byte-exact (hypothesis literal
    # roundtrip found the mangling).
    "spark.sql.variable.substitute": "false",
}


def apply_runtime_confs(spark: SparkSession) -> None:
    """Best-effort apply engine confs to a session we did not create."""
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            pass  # static conf on this build — keep going


def get_spark(
    app_name: str = "crate-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build a local SparkSession sized from SPARK_GRAFT_CPUS.

    On a real cluster this would be a plain ``SparkSession.builder``
    with the same SQL confs; parallelism then comes from executors.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    apply_runtime_confs(spark)
    return spark


def input_is_small(df: DataFrame) -> bool:
    """True when the optimizer's size estimate for ``df`` is at or
    below ``crate_spark.exec.spread_small_input_bytes`` (session conf,
    default 64 MiB; ``SET ... = 0`` opts out → always False). The
    shared gate behind every small-input-only optimization
    (``spread_small_input``, LTTB series batching, the per-query PQ
    encode materialization): each is a local-latency win whose cost
    model inverts at scale, so all of them must be no-ops on large
    inputs by construction."""
    spark = df.sparkSession
    try:
        limit = int(
            spark.conf.get(
                "crate_spark.exec.spread_small_input_bytes",
                str(64 * 1024 * 1024),
            )
        )
    except Exception:
        limit = 64 * 1024 * 1024
    if limit <= 0:  # operator opt-out: SET ... = 0
        return False
    try:
        raw = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        size = int(raw.toString()) if hasattr(raw, "toString") else int(raw)
    except Exception:
        return False
    return size <= limit


def spread_small_input(df: DataFrame, max_partitions: int | None = None) -> DataFrame:
    """Parallelize a scan whose file layout under-splits (optimization
    guide §2.5, "input skew — one huge unsplittable file": each driver
    testdata table is a single-row-group parquet file, so every map
    stage over it runs as ONE task regardless of available cores).

    When the input is tiny — optimizer size estimate at or below
    ``crate_spark.exec.spread_small_input_bytes`` (session conf,
    default 64 MiB) — a round-robin repartition to the session's
    default parallelism costs a negligible shuffle and un-serializes
    the map stage. Above the threshold the file layout already yields
    parallel splits and the repartition would be a full-data shuffle,
    so it is never taken: at 100 TB this helper is a no-op by
    construction. Deterministic: round-robin repartition sorts its
    input before assigning rows (SPARK-23207), and callers only use it
    where downstream computation is row-order-independent (row-local
    projections, exact/decimal aggregates, explicitly-ordered
    windows)."""
    spark = df.sparkSession
    n = spark.sparkContext.defaultParallelism
    if max_partitions is not None:
        # callers whose downstream stage count multiplies with the map
        # fan-out (e.g. the routed-PQ batch: broadcast join + two
        # windows) cap the spread — measured there: full width LOST
        # (+0.5 s) while width 8 won (-0.9 s) at local[32]
        n = min(n, max_partitions)
    if n > 1 and input_is_small(df):
        return df.repartition(n)
    return df


def _normalize_events(df: DataFrame) -> DataFrame:
    """events.ts arrives as raw nanos (long). Produce:

    - ``ts``     TIMESTAMP_NTZ at µs precision (floor-truncated from ns,
      matching DuckDB's parquet ns -> TIMESTAMP read), and
    - ``ts_ns``  the raw epoch-nanos long, kept for exact arithmetic
      (sessionization, gap detection) without timezone concerns.
    """
    ts_type = dict(df.dtypes).get("ts")
    if ts_type != "bigint":
        if ts_type == "timestamp_ntz":
            # timestampdiff over NTZ operands is pure wall-clock
            # arithmetic — no session-timezone cast involved (an
            # NTZ->TZ cast would bind spark.sql.session.timeZone)
            us = F.expr(
                "timestampdiff(MICROSECOND,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            )
        else:
            # TZ input: absolute instant; coerce string/date columns
            # to timestamp first (unix_micros requires timestamp)
            us = F.unix_micros(F.col("ts").cast("timestamp"))
        return df.withColumn("ts_ns", us * 1000)
    return (
        df.withColumnRenamed("ts", "ts_ns")
        .withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts_ns div 1000")).cast("timestamp_ntz"),
        )
        .select("event_id", "ts", "ts_ns", "user_id", "event_type", "value", "props")
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table; events gets timestamp normalization."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _normalize_events(df)
    return df


#: (id(spark), sf_dir) -> loaded DataFrames. Each load_tables call used
#: to re-read 10 parquet footers and re-register 10 temp views; across
#: a 100-query run that is pure driver-side overhead (it truncated the
#: round-1 driver run). DataFrames are immutable plans, so caching per
#: (session, dir) is safe; registration is tracked separately so a
#: register=False first call doesn't suppress later view creation.
_TABLE_CACHE: dict[tuple[int, str], dict[str, DataFrame]] = {}
#: session id -> sf_dir whose views are CURRENTLY registered. View
#: names are shared across scale factors, so registration must track
#: which sf_dir won last — a per-(session, sf_dir) "already registered"
#: set let a later load at another sf leave stale views behind (the
#: r8 full-suite order dependence: sf0.01 golden runs overwrote the
#: sf0.001 views and the next sf0.001 load skipped re-registering).
_REGISTERED: dict[int, str] = {}


def clear_table_cache() -> None:
    """Drop cached table DataFrames (tests / after external mutation)."""
    _TABLE_CACHE.clear()
    _REGISTERED.clear()


def load_tables(
    spark: SparkSession, sf_dir: str, register: bool = True
) -> dict[str, DataFrame]:
    """Load all driver tables, optionally registering temp views.

    Equivalent of CrateDB's DocTableInfo catalog resolution
    (``metadata/doc/DocTableInfo.java``) — here the "table" is a
    Parquet-backed DataFrame and Spark's session catalog is the schema
    registry. Cached per (session, sf_dir).
    """
    key = (id(spark), os.path.abspath(sf_dir))
    out = _TABLE_CACHE.get(key)
    if out is None:
        apply_runtime_confs(spark)
        out = {name: load_table(spark, sf_dir, name) for name in TABLES}
        _TABLE_CACHE[key] = out
    if register and _REGISTERED.get(id(spark)) != key[1]:
        for name, df in out.items():
            df.createOrReplaceTempView(name)
        _REGISTERED[id(spark)] = key[1]
    return out
