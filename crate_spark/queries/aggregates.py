"""Remaining aggregate surface: arbitrary/any_value, collect_set,
bool_and/bool_or, median, correlation/covariance (surplus).

Reference parity (SURVEY.md §2.4): ``impl/ArbitraryAggregation.java``
(any value of the group), ``impl/CollectSetAggregation.java``;
bool_and/bool_or are PG-standard; corr/covar/skew are Spark surplus
(not in the reference)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crate_spark.queries import query
from crate_spark.queries._util import sql_davg
from crate_spark.session import load_tables


@query(
    "agg_any_value",
    oracle="""
    SELECT c_custkey, ANY_VALUE(c_name) AS name, ANY_VALUE(c_mktsegment) AS seg
    FROM customer GROUP BY c_custkey
    """,
)
def agg_any_value(spark, sf_dir):
    """arbitrary/any_value (ArbitraryAggregation.java). Grouped by a
    unique key here so the 'any' pick is single-valued -> hash-stable
    (the operator's nondeterminism on multi-valued groups is inherent
    in both engines)."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .groupBy("c_custkey")
        .agg(
            F.any_value("c_name").alias("name"),
            F.any_value("c_mktsegment").alias("seg"),
        )
    )


@query(
    "agg_collect_set",
    oracle="""
    SELECT n_regionkey,
           ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(LIST(n_name))), ',') AS names,
           LEN(LIST_DISTINCT(LIST(n_nationkey % 5))) AS n_buckets
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_collect_set(spark, sf_dir):
    """collect_set (CollectSetAggregation.java) — sorted, emitted as a
    CSV string (array cells are unhashable in the driver's pandas
    canonicalizer) for a deterministic hash."""
    t = load_tables(spark, sf_dir)
    return (
        t["nation"]
        .groupBy("n_regionkey")
        .agg(
            F.array_join(F.sort_array(F.collect_set("n_name")), ",").alias("names"),
            F.size(F.collect_set(F.col("n_nationkey") % 5)).alias("n_buckets"),
        )
    )


@query(
    "agg_bool_and_or",
    oracle="""
    SELECT event_type,
           BOOL_AND(value > 0) AS all_positive,
           BOOL_OR(value > 300) AS any_large,
           COUNT(*) FILTER (WHERE value > 300) AS n_large
    FROM events GROUP BY event_type
    """,
)
def agg_bool_and_or(spark, sf_dir):
    """bool_and / bool_or + FILTER'd count."""
    t = load_tables(spark, sf_dir)
    v = F.col("value")
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.bool_and(v > 0).alias("all_positive"),
            F.bool_or(v > 300).alias("any_large"),
            F.count_if(v > 300).alias("n_large"),
        )
    )


@query(
    "agg_median_corr",
    oracle=f"""
    SELECT l_returnflag,
           ROUND(MEDIAN(l_quantity), 6) AS med_qty,
           ROUND(CORR(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           ROUND(COVAR_POP(l_quantity, l_discount), 6) AS qty_disc_covar,
           ROUND({sql_davg('l_quantity')}, 6) AS mean_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_median_corr(spark, sf_dir):
    """median (exact percentile 0.5) + corr/covar_pop (Spark surplus —
    not in the reference's aggregate registry)."""
    t = load_tables(spark, sf_dir)
    q, px, d = F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount")
    from crate_spark.queries._util import davg

    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.round(F.median(q), 6).alias("med_qty"),
            F.round(F.corr(q, px), 6).alias("qty_price_corr"),
            F.round(F.covar_pop(q, d), 6).alias("qty_disc_covar"),
            F.round(davg(q), 6).alias("mean_qty"),
        )
    )


@query(
    "agg_distinct_sums",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_dist_qty,
           ROUND(AVG(DISTINCT l_quantity), 9) AS avg_dist_qty,
           COUNT(DISTINCT l_linenumber) AS n_linenos
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct_sums(spark, sf_dir):
    """sum(DISTINCT)/avg(DISTINCT)/count(DISTINCT)
    (docs aggregation.rst:221). DISTINCT bounds the value set, so the
    decimal sum is order-free and the avg rounds identically."""
    t = load_tables(spark, sf_dir)
    q = F.col("l_quantity")
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.sum_distinct(q.cast("decimal(38,6)")).cast("double").alias("sum_dist_qty"),
            F.round(F.expr("avg(DISTINCT l_quantity)"), 9).alias("avg_dist_qty"),
            F.count_distinct(F.col("l_linenumber")).alias("n_linenos"),
        )
    )
