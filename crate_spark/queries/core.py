"""Core relational operators: scan/filter/project, aggregation,
distinct, sort/limit/offset, set ops, subqueries, CTEs.

Reference parity (SURVEY.md §2.1/§2.4/§2.6/§2.7):
- Collect scan + pushdown: ``planner/operators/Collect.java:87``,
  ``lucene/LuceneQueryBuilder.java:80`` -> Parquet scan with Catalyst
  predicate pushdown / column pruning.
- Count fast path: ``planner/operators/Count.java:62`` -> Catalyst
  count(*) over parquet row-group stats.
- Get (PK point lookup): ``planner/operators/Get.java:65`` -> plain
  equality filter (Parquet min/max + dictionary pruning).
- Aggregations: ``execution/engine/aggregation/AggregationFunction.java:57``
  ITER_PARTIAL/PARTIAL_FINAL modes == Spark partial/final hash agg.
- Order/TopK: ``planner/operators/Order.java:52``,
  ``BoundedSortingLimitAndOffsetCollector.java`` -> TakeOrderedAndProject.
- Union: ``planner/operators/Union.java:68``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crate_spark.queries import query
from crate_spark.queries._util import davg, dsum, sql_davg, sql_dsum
from crate_spark.session import load_tables, spread_small_input


# --------------------------------------------------------------------------
# Flagship: TPC-H Q1 pricing summary (scan -> filter -> group -> agg -> sort)
# --------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """Scan+filter+group+agg+sort — the minimum end-to-end slice."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    # single-row-group input → the scan+partial-agg map stage is ONE
    # task however many cores exist; spread after the (pushed) filter
    # parallelizes it. Size-gated no-op at scale (session helper docs;
    # r11: q1 sf0.1 median 1.27 s -> 0.67 s). Decimal sums are exact
    # and associative, so row order cannot change the result.
    return (
        spread_small_input(
            li.filter(
                F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
            )
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Scans / filters / projections
# --------------------------------------------------------------------------
@query(
    "scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
      AND l_discount > 0.05 AND l_quantity < 10
    """,
)
def scan_filter_project(spark, sf_dir):
    """Predicate + projection pushdown to the parquet scan."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(
            F.col("l_shipdate").between(
                F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"),
                F.lit("1997-12-31 00:00:00").cast("timestamp_ntz"),
            )
            & (F.col("l_discount") > 0.05)
            & (F.col("l_quantity") < 10)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@query(
    "point_lookup",
    oracle="SELECT * FROM orders WHERE o_orderkey = 42",
)
def point_lookup(spark, sf_dir):
    """PK point lookup (reference Get, ``planner/operators/Get.java:65``)."""
    t = load_tables(spark, sf_dir)
    return t["orders"].filter(F.col("o_orderkey") == 42)


@query("count_star", oracle="SELECT COUNT(*) AS cnt FROM lineitem")
def count_star(spark, sf_dir):
    """count(*) fast path (reference ``planner/operators/Count.java:62``)."""
    t = load_tables(spark, sf_dir)
    return t["lineitem"].agg(F.count("*").alias("cnt"))


@query(
    "distinct_flags",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_flags(spark, sf_dir):
    """SELECT DISTINCT (reference ``planner/operators/Distinct.java``)."""
    t = load_tables(spark, sf_dir)
    return t["lineitem"].select("l_returnflag", "l_linestatus").distinct()


# --------------------------------------------------------------------------
# Sorts / limits / offsets
# --------------------------------------------------------------------------
@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def topk_orders(spark, sf_dir):
    """ORDER BY + LIMIT -> TakeOrderedAndProject (heap top-k, no full sort)."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@query(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders
    ORDER BY o_orderkey LIMIT 50 OFFSET 100
    """,
)
def limit_offset(spark, sf_dir):
    """LIMIT/OFFSET (reference ``planner/operators/Limit.java:53``)."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey")
        .offset(100)
        .limit(50)
    )


@query(
    "order_nulls_last",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END AS price_or_null
    FROM orders
    WHERE o_orderkey < 2000
    ORDER BY price_or_null DESC NULLS LAST, o_orderkey
    LIMIT 200
    """,
)
def order_nulls_last(spark, sf_dir):
    """Explicit NULLS LAST ordering — CrateDB defaults to PG null ordering
    while Spark defaults to nulls-first-asc (SURVEY.md §2.6)."""
    t = load_tables(spark, sf_dir)
    price_or_null = F.when(F.col("o_orderstatus") == "P", F.lit(None)).otherwise(
        F.col("o_totalprice")
    )
    return (
        t["orders"]
        .filter(F.col("o_orderkey") < 2000)
        .select("o_orderkey", price_or_null.alias("price_or_null"))
        .orderBy(F.col("price_or_null").desc_nulls_last(), F.col("o_orderkey"))
        .limit(200)
    )


# --------------------------------------------------------------------------
# Aggregations
# --------------------------------------------------------------------------
@query(
    "agg_global",
    oracle=f"""
    SELECT COUNT(*) AS cnt,
           COUNT(DISTINCT l_partkey) AS ndv_part,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty,
           {sql_dsum('l_extendedprice')} AS sum_price,
           {sql_davg('l_extendedprice')} AS avg_price
    FROM lineitem
    """,
)
def agg_global(spark, sf_dir):
    """Global (no GROUP BY) aggregates incl. COUNT(DISTINCT)."""
    t = load_tables(spark, sf_dir)
    return t["lineitem"].agg(
        F.count("*").alias("cnt"),
        F.count_distinct(F.col("l_partkey")).alias("ndv_part"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        dsum("l_extendedprice").alias("sum_price"),
        davg("l_extendedprice").alias("avg_price"),
    )


@query(
    "agg_group_having",
    oracle=f"""
    SELECT l_suppkey, COUNT(*) AS n_items, {sql_dsum('l_quantity')} AS total_qty
    FROM lineitem
    GROUP BY l_suppkey
    HAVING COUNT(*) > 550
    """,
)
def agg_group_having(spark, sf_dir):
    """GROUP BY + HAVING (filter above aggregate)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n_items"), dsum("l_quantity").alias("total_qty"))
        .filter(F.col("n_items") > 550)
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_samp,
           ROUND(STDDEV_POP(l_quantity), 4) AS sd_pop,
           ROUND(VAR_SAMP(l_quantity), 4) AS v_samp,
           ROUND(VAR_POP(l_quantity), 4) AS v_pop
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark, sf_dir):
    """stddev/variance family. CrateDB ``stddev`` aliases stddev_samp and
    ``variance`` is population (``impl/VarianceAggregation.java``;
    docs aggregation.rst:590) — we expose the explicit names."""
    t = load_tables(spark, sf_dir)
    q = F.col("l_quantity")
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp(q), 4).alias("sd_samp"),
            F.round(F.stddev_pop(q), 4).alias("sd_pop"),
            F.round(F.var_samp(q), 4).alias("v_samp"),
            F.round(F.var_pop(q), 4).alias("v_pop"),
        )
    )


@query(
    "agg_string_agg",
    oracle="""
    SELECT n_regionkey, STRING_AGG(n_name, ',' ORDER BY n_name) AS names
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_string_agg(spark, sf_dir):
    """string_agg (reference ``impl/StringAgg.java``) with deterministic
    element order via sort_array(collect_list(...))."""
    t = load_tables(spark, sf_dir)
    return (
        t["nation"]
        .groupBy("n_regionkey")
        .agg(F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("names"))
    )


@query(
    "agg_array_agg",
    oracle="""
    SELECT n_regionkey,
           ARRAY_TO_STRING(ARRAY_AGG(n_nationkey ORDER BY n_nationkey), ',') AS nation_keys
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_array_agg(spark, sf_dir):
    """array_agg (reference ``impl/ArrayAgg.java:93``). NULL retention
    difference vs collect_list is covered in unit tests; the driver data
    has no NULL keys. The sorted array is emitted as a CSV string: raw
    array cells are unhashable in the driver's pandas canonicalizer, and
    the string form pins identical element order in both engines."""
    t = load_tables(spark, sf_dir)
    return (
        t["nation"]
        .groupBy("n_regionkey")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("n_nationkey")).cast("array<string>"), ","
            ).alias("nation_keys")
        )
    )


@query(
    "agg_geometric_mean",
    oracle="""
    SELECT l_returnflag, ROUND(EXP(AVG(LN(l_quantity + 1))), 6) AS geo_mean
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_geometric_mean(spark, sf_dir):
    """geometric_mean (reference ``impl/GeometricMeanAggregation.java``)
    as exp(avg(ln(x))) — kept JVM-side."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(F.round(F.exp(F.avg(F.ln(F.col("l_quantity") + 1))), 6).alias("geo_mean"))
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.25), 6) AS p25,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.50), 6) AS p50,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.75), 6) AS p75
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile(spark, sf_dir):
    """percentile. Reference uses t-digest (approximate,
    ``impl/PercentileAggregation.java:51``); we implement EXACT
    continuous percentile — exact supersedes approximate for the
    correctness gate (BASELINE.md)."""
    t = load_tables(spark, sf_dir)
    p = F.col("l_extendedprice")
    # exact percentile buffers every value: the map stage is the whole
    # data collection pass, and a single-row-group file serializes it
    # to one task — spread after projecting to the two needed columns
    # (size-gated no-op at scale; r11: 2.89 s -> 1.54 s at sf0.1)
    # ONE percentile aggregate with a percentage ARRAY: three separate
    # percentile calls each buffered the full 600k-value column
    # (~0.5 s apiece at sf0.1 — r11 resumed session); the array form
    # shares one buffer and computes each percentile with the same
    # interpolation arithmetic (same expression class), so values are
    # bit-identical. exec 2.0-2.9 s -> ~1.2 s.
    return (
        spread_small_input(t["lineitem"].select("l_returnflag", "l_extendedprice"))
        .groupBy("l_returnflag")
        .agg(
            F.percentile(p, F.array(F.lit(0.25), F.lit(0.50), F.lit(0.75))).alias("_ps")
        )
        .select(
            "l_returnflag",
            F.round(F.element_at("_ps", 1), 6).alias("p25"),
            F.round(F.element_at("_ps", 2), 6).alias("p50"),
            F.round(F.element_at("_ps", 3), 6).alias("p75"),
        )
    )


@query(
    "agg_minmax_by",
    oracle="""
    SELECT e.event_type,
           MIN(CASE WHEN e.value = mx.max_value THEN e.event_id END) AS best_event_id,
           MAX(mx.max_value) AS max_value
    FROM events e
    JOIN (SELECT event_type, MAX(value) AS max_value FROM events GROUP BY event_type) mx
      ON e.event_type = mx.event_type
    GROUP BY e.event_type
    """,
)
def agg_minmax_by(spark, sf_dir):
    """max_by with deterministic tie-break (reference
    ``impl/CmpByAggregation.java``): the event with max value per type,
    lowest event_id on ties."""
    t = load_tables(spark, sf_dir)
    # max_by over a (value, -event_id) struct == argmax value, min id on tie
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.expr("max_by(event_id, struct(value, -event_id))").alias("best_event_id"),
            F.max("value").alias("max_value"),
        )
    )


@query(
    "conditional_agg",
    oracle=f"""
    SELECT event_type,
           COUNT(*) FILTER (WHERE value > 250) AS n_high,
           COUNT(*) FILTER (WHERE value <= 250) AS n_low,
           {sql_dsum('CASE WHEN value > 250 THEN value ELSE 0 END')} AS sum_high
    FROM events GROUP BY event_type
    """,
)
def conditional_agg(spark, sf_dir):
    """FILTER / conditional aggregation (pivot-style rollups)."""
    t = load_tables(spark, sf_dir)
    v = F.col("value")
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.count_if(v > 250).alias("n_high"),
            F.count_if(v <= 250).alias("n_low"),
            dsum(F.when(v > 250, v).otherwise(F.lit(0.0))).alias("sum_high"),
        )
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------
@query(
    "union_all",
    oracle="""
    SELECT o_orderkey AS k, 'hi' AS src FROM orders WHERE o_totalprice > 400000
    UNION ALL
    SELECT o_orderkey AS k, 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 300000
    """,
)
def union_all(spark, sf_dir):
    """UNION ALL (reference ``planner/operators/Union.java:68``)."""
    t = load_tables(spark, sf_dir)
    o = t["orders"]
    hi = o.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_orderkey").alias("k"), F.lit("hi").alias("src")
    )
    urgent = o.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 300000)
    ).select(F.col("o_orderkey").alias("k"), F.lit("urgent").alias("src"))
    return hi.unionAll(urgent)


@query(
    "union_distinct",
    oracle="""
    SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000
    UNION
    SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9900
    """,
)
def union_distinct(spark, sf_dir):
    """UNION [DISTINCT] — union + dropDuplicates."""
    t = load_tables(spark, sf_dir)
    a = t["orders"].filter(F.col("o_totalprice") > 400000).select(F.col("o_custkey").alias("k"))
    b = t["customer"].filter(F.col("c_acctbal") > 9900).select(F.col("c_custkey").alias("k"))
    return a.union(b).distinct()


@query(
    "except_intersect",
    oracle="""
    SELECT k FROM (
      SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
    )
    EXCEPT
    SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0
    """,
)
def except_intersect(spark, sf_dir):
    """INTERSECT/EXCEPT — parsed-but-rejected in the reference
    (``RelationAnalyzer.java:239-246``); free surplus on Spark."""
    t = load_tables(spark, sf_dir)
    o = t["orders"]
    f = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    op = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))
    neg = t["customer"].filter(F.col("c_acctbal") < 0).select(F.col("c_custkey").alias("k"))
    return f.intersect(op).exceptAll(neg).distinct()


# --------------------------------------------------------------------------
# Subqueries / CTEs
# --------------------------------------------------------------------------
@query(
    "subquery_scalar",
    oracle=f"""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > 1.8 * (SELECT {sql_davg('o_totalprice')} FROM orders)
    """,
)
def subquery_scalar(spark, sf_dir):
    """Uncorrelated scalar subquery (reference
    ``planner/operators/MultiPhase.java:47``) — Catalyst scalar subquery."""
    t = load_tables(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > 1.8 * (SELECT {sql_davg('o_totalprice')} FROM orders)
        """
    )


@query(
    "subquery_correlated",
    oracle="""
    SELECT c_custkey,
           (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000) AS n_big
    FROM customer c
    WHERE c_custkey < 200
    """,
)
def subquery_correlated(spark, sf_dir):
    """Correlated scalar subquery (reference
    ``planner/operators/CorrelatedJoin.java:67`` executes row-at-a-time;
    Catalyst decorrelates into an aggregate + outer join — strictly
    better at scale)."""
    t = load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey,
               (SELECT COUNT(*) FROM orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000) AS n_big
        FROM customer c
        WHERE c_custkey < 200
        """
    )


@query(
    "cte_query",
    oracle=f"""
    WITH big AS (
      SELECT o_custkey, COUNT(*) AS n, {sql_dsum('o_totalprice')} AS spent
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (SELECT * FROM big WHERE n >= 12)
    SELECT r.o_custkey, r.n, r.spent, c.c_mktsegment
    FROM ranked r JOIN customer c ON r.o_custkey = c.c_custkey
    """,
)
def cte_query(spark, sf_dir):
    """WITH / common table expressions (multi-level)."""
    t = load_tables(spark, sf_dir)
    return spark.sql(
        f"""
        WITH big AS (
          SELECT o_custkey, COUNT(*) AS n, {sql_dsum('o_totalprice')} AS spent
          FROM orders GROUP BY o_custkey
        ),
        ranked AS (SELECT * FROM big WHERE n >= 12)
        SELECT r.o_custkey, r.n, r.spent, c.c_mktsegment
        FROM ranked r JOIN customer c ON r.o_custkey = c.c_custkey
        """
    )
