"""Time-series queries over the events table: sessionization, gap
detection, zero-filled series, rollups, top-k per group, NDV.

Reference parity: date_bin (``DateBinFunction.java:41``) is covered in
scalars; here the window-function time-series patterns CrateDB docs
showcase (lag/lead gap analysis), ``topk``
(``impl/TopKAggregation.java:77`` — exact groupBy+window supersedes
the ItemsSketch), ``hyperloglog_distinct``
(``HyperLogLogDistinctAggregation.java:79`` — exact NDV for the gate,
approx_count_distinct as documented approximate twin), and LTTB
(``LTTBAggregation.java:50``, rows-only applyInPandas).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from crate_spark.operators.timeseries import lttb, sessionize
from crate_spark.queries import query
from crate_spark.queries._util import DEC
from crate_spark.session import load_tables


@query(
    "ts_sessionize",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, ts,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id,
           CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_id
    FROM ordered
    """,
)
def ts_sessionize(spark, sf_dir):
    """30-minute-gap sessionization (lag + running sum, one shuffle)."""
    t = load_tables(spark, sf_dir)
    return sessionize(t["events"], gap_minutes=30).select(
        "user_id", "event_id", "session_id"
    )


@query(
    "ts_gap_detection",
    oracle="""
    SELECT user_id, event_id,
           epoch_us(ts) - LAG(epoch_us(ts))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
    FROM events
    QUALIFY gap_us > 3600000000
    """,
)
def ts_gap_detection(spark, sf_dir):
    """Gaps > 1h between consecutive events of a user."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts_ns div 1000 == epoch_us(ts) exactly (ts is floor(ts_ns/1000));
    # pure long arithmetic, no session-timezone dependence.
    us = F.expr("ts_ns div 1000")
    return (
        t["events"]
        .withColumn("gap_us", us - F.lag(us).over(w))
        .filter(F.col("gap_us") > 3_600_000_000)
        .select("user_id", "event_id", "gap_us")
    )


@query(
    "ts_zero_filled_series",
    oracle=f"""
    WITH bounds AS (
      SELECT CAST(DATE_TRUNC('day', MIN(ts)) AS TIMESTAMP) AS lo,
             CAST(DATE_TRUNC('day', MAX(ts)) AS TIMESTAMP) AS hi
      FROM events
    ),
    grid AS (
      SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds
    ),
    actual AS (
      SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT g.day, COALESCE(a.n, 0) AS n, COALESCE(a.total, 0.0) AS total
    FROM grid g LEFT JOIN actual a ON g.day = a.day
    """,
)
def ts_zero_filled_series(spark, sf_dir):
    """Dense daily series with zero-fill: generate_series
    (``GenerateSeries.java:62``) left-joined to the rollup — the grid
    is sequence+explode of the (tiny, aggregated) bounds row, never a
    driver loop."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).cast("timestamp_ntz").alias("lo"),
        F.date_trunc("day", F.max("ts")).cast("timestamp_ntz").alias("hi"),
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    actual = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total"),
        )
    )
    return (
        grid.join(actual, "day", "left")
        .select(
            "day",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("total", F.lit(0.0)).alias("total"),
        )
    )


@query(
    "ts_topk_event_values",
    oracle="""
    SELECT event_type, value, n, rnk FROM (
      SELECT event_type, value, COUNT(*) AS n,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY COUNT(*) DESC, value) AS rnk
      FROM events GROUP BY event_type, value
    ) WHERE rnk <= 5
    """,
)
def ts_topk_event_values(spark, sf_dir):
    """topk(col, k): exact most-frequent values per group
    (reference ``TopKAggregation.java:77`` uses an ItemsSketch — exact
    count+window supersedes it for correctness; at 100 TB the partial
    agg keeps the shuffle to distinct (group, value) pairs)."""
    t = load_tables(spark, sf_dir)
    counted = t["events"].groupBy("event_type", "value").agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.col("n").desc(), F.col("value"))
    return counted.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 5)


@query(
    "ts_ndv_users",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS ndv_exact,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def ts_ndv_users(spark, sf_dir):
    """Distinct-user counts per event type. hyperloglog_distinct
    (``HyperLogLogDistinctAggregation.java:79``) maps to Spark
    approx_count_distinct — approximate, so the GATE query uses exact
    NDV; the HLL twin is asserted within 5% in tests/test_timeseries.py."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("ndv_exact"),
            F.count("*").alias("n"),
        )
    )


@query("ts_lttb_downsample", oracle=None)
def ts_lttb_downsample(spark, sf_dir):
    """LTTB downsampling to 50 points per user
    (``LTTBAggregation.java:50``): applyInPandas per series — visual
    shape preserved, deterministic; rows-only (not SQL-expressible)."""
    t = load_tables(spark, sf_dir)
    return lttb(t["events"], 50)
