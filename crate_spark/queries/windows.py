"""Window functions: ranking, offsets, value functions, aggregates over
ROWS/RANGE frames, top-k per group.

Reference parity (SURVEY.md §2.5):
- ``planner/operators/WindowAgg.java:61`` sorts each partition and
  evaluates frames (``WindowFunctionBatchIterator.java``,
  ``ComputeFrameBoundary.java``). Spark shuffles on PARTITION BY and
  sorts within partitions — same model, distributed.
- row_number: ``RowNumberWindowFunction.java:41``; rank/dense_rank:
  ``window/RankFunctions.java:45``; lag/lead:
  ``OffsetValueFunctions.java:178``; first/last/nth:
  ``NthValueFunctions.java:212``; any aggregate as window fn:
  ``AggregateToWindowFunctionAdapter.java``.
- Default frame is RANGE UNBOUNDED PRECEDING..CURRENT ROW
  (docs window-functions.rst:88-122) — matches Spark/DuckDB defaults.

Determinism: every ORDER BY carries a unique tiebreaker (event_id /
o_orderkey); double sums over frames go through DECIMAL(38,6).

Scale notes: window partition keys (user_id, o_custkey) distribute the
shuffle; no global single-partition windows except where noted
(global rank demo is LIMITed and would be a skew hazard at 100 TB —
documented on the query).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from crate_spark.queries import query
from crate_spark.queries._util import DEC
from crate_spark.session import load_tables


@query(
    "window_ranking",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_ranking(spark, sf_dir):
    """row_number / rank / dense_rank over a named window."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "window_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_topk_per_group(spark, sf_dir):
    """Top-k per group — the reference's ordered-limit projection per
    partition; Spark pushes the rank filter into the window sort."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t["orders"]
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id, value,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           LAG(value, 2, -1.0) OVER w AS prev2_default
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark, sf_dir):
    """lag/lead incl. offset+default (OffsetValueFunctions.java:178)."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return t["events"].select(
        "user_id",
        "event_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_default"),
    )


@query(
    "window_value_fns",
    oracle="""
    SELECT user_id, event_id,
           FIRST_VALUE(event_id) OVER w AS first_eid,
           LAST_VALUE(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_eid,
           NTH_VALUE(event_id, 2) OVER w AS second_eid
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_value_fns(spark, sf_dir):
    """first_value/last_value/nth_value; last_value needs the full-frame
    override (default frame stops at CURRENT ROW) — same in reference."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return t["events"].select(
        "user_id",
        "event_id",
        F.first("event_id").over(w).alias("first_eid"),
        F.last("event_id").over(w_full).alias("last_eid"),
        F.nth_value("event_id", 2).over(w).alias("second_eid"),
    )


@query(
    "window_running_sum",
    oracle=f"""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER
                (PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE) AS running_total,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS n_so_far
    FROM events
    """,
)
def window_running_sum(spark, sf_dir):
    """Cumulative aggregate with the default RANGE frame."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return t["events"].select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("running_total"),
        F.count("*").over(w).alias("n_so_far"),
    )


@query(
    "window_moving_avg",
    oracle=f"""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)
             / COUNT(value) OVER w AS mov_avg3,
           MIN(value) OVER w AS mov_min3,
           MAX(value) OVER w AS mov_max3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def window_moving_avg(spark, sf_dir):
    """Sliding ROWS frame (moving aggregate) — ComputeFrameBoundary
    semantics; decimal-sum keeps the hash exact."""
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return t["events"].select(
        "user_id",
        "event_id",
        (F.sum(F.col("value").cast(DEC)).over(w).cast("double") / F.count("value").over(w)).alias("mov_avg3"),
        F.min("value").over(w).alias("mov_min3"),
        F.max("value").over(w).alias("mov_max3"),
    )


@query(
    "window_range_frame",
    oracle=f"""
    SELECT o_custkey, o_orderkey, o_totalprice,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 50000 PRECEDING AND 50000 FOLLOWING) AS n_similar
    FROM orders WHERE o_custkey < 100
    """,
)
def window_range_frame(spark, sf_dir):
    """RANGE frame with numeric offsets (requires single ORDER BY key —
    same restriction as reference window-functions.rst:88-122)."""
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-50000, 50000)
    )
    return (
        t["orders"]
        .filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.count("*").over(w).alias("n_similar"),
        )
    )


@query(
    "window_global_share",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, part_qty,
           ROUND(part_qty / SUM(part_qty) OVER (), 9) AS share
    FROM (
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS part_qty
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    )
    """,
)
def window_global_share(spark, sf_dir):
    """Share-of-total: empty OVER() on a pre-aggregated (small) input.

    Scale note: the single-partition window runs over the 6-row
    aggregate, never the fact table — the pattern that is safe at 100 TB.
    """
    t = load_tables(spark, sf_dir)
    agg = (
        t["lineitem"]
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("part_qty"))
    )
    w = Window.partitionBy()
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "part_qty",
        F.round(F.col("part_qty") / F.sum("part_qty").over(w), 9).alias("share"),
    )


@query(
    "window_surplus_distribution",
    oracle="""
    SELECT o_custkey, o_orderkey,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 9) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_surplus_distribution(spark, sf_dir):
    """ntile/percent_rank/cume_dist — NOT in the reference (SURVEY.md
    §2.5 'not implemented'); free surplus from Spark."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
    )


@query(
    "window_agg_as_window",
    oracle=f"""
    SELECT event_id, user_id, event_type, value,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (PARTITION BY event_type) AS DOUBLE) AS type_total,
           MAX(value) OVER (PARTITION BY event_type) AS type_max,
           COUNT(*) OVER (PARTITION BY event_type) AS type_n
    FROM events WHERE user_id < 50
    """,
)
def window_agg_as_window(spark, sf_dir):
    """Whole-partition aggregates as window functions (reference
    AggregateToWindowFunctionAdapter) — no ORDER BY, full-frame."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("event_type")
    return (
        t["events"]
        .filter(F.col("user_id") < 50)
        .select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("type_total"),
            F.max("value").over(w).alias("type_max"),
            F.count("*").over(w).alias("type_n"),
        )
    )
