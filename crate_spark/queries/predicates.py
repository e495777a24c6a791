"""Predicate & operator surface: 3-valued logic, IS [NOT] DISTINCT
FROM, ANY/ALL over arrays, BETWEEN, LIKE/ILIKE, regex operators,
EXISTS/IN variants not covered in joins.py.

Reference parity (SURVEY.md §2.2):
- comparison/3vl: ``expression/operator/EqOperator.java:74``,
  ``CmpOperator``, ``IsNullPredicate.java:67``, ``DistinctFrom``
- ANY/ALL: ``expression/operator/any/AnyOperator.java:56``,
  ``all/AllOperator.java``
- LIKE/ILIKE: ``LikeOperators.java:46``; regex `~`/`~*`:
  ``RegexpMatchOperator.java``
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crate_spark.queries import query
from crate_spark.session import load_tables


@query(
    "pred_three_valued_logic",
    oracle="""
    SELECT o_orderkey,
           price_or_null > 200000 AS gt_price,
           (price_or_null > 200000) IS NULL AS cmp_is_null,
           price_or_null IS NULL AS is_null,
           price_or_null IS NOT NULL AS is_not_null,
           (price_or_null > 200000 AND o_orderkey % 2 = 0) AS and_3vl,
           (price_or_null > 200000 OR o_orderkey % 2 = 0) AS or_3vl,
           NOT (price_or_null > 200000) AS not_3vl,
           COALESCE(price_or_null > 200000, FALSE) AS ignore3vl
    FROM (
      SELECT o_orderkey,
             CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END AS price_or_null
      FROM orders WHERE o_orderkey <= 2000
    )
    """,
)
def pred_three_valued_logic(spark, sf_dir):
    """NULL-propagating comparisons and AND/OR/NOT Kleene logic +
    ignore3vl (coalesce to FALSE)."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderkey") <= 2000)
    p = F.when(F.col("o_orderstatus") == "P", F.lit(None)).otherwise(F.col("o_totalprice"))
    base = o.select("o_orderkey", p.alias("price_or_null"))
    gt = F.col("price_or_null") > 200000
    even = F.col("o_orderkey") % 2 == 0
    return base.select(
        "o_orderkey",
        gt.alias("gt_price"),
        gt.isNull().alias("cmp_is_null"),
        F.col("price_or_null").isNull().alias("is_null"),
        F.col("price_or_null").isNotNull().alias("is_not_null"),
        (gt & even).alias("and_3vl"),
        (gt | even).alias("or_3vl"),
        (~gt).alias("not_3vl"),
        F.coalesce(gt, F.lit(False)).alias("ignore3vl"),
    )


@query(
    "pred_is_distinct_from",
    oracle="""
    SELECT a.o_orderkey,
           a.price_or_null IS DISTINCT FROM b.price_or_null AS d,
           a.price_or_null IS NOT DISTINCT FROM b.price_or_null AS nd
    FROM (SELECT o_orderkey, CASE WHEN o_orderstatus='P' THEN NULL ELSE o_totalprice END AS price_or_null
          FROM orders WHERE o_orderkey <= 1000) a
    JOIN (SELECT o_orderkey, CASE WHEN o_orderstatus='O' THEN NULL ELSE o_totalprice END AS price_or_null
          FROM orders WHERE o_orderkey <= 1000) b
      ON a.o_orderkey = b.o_orderkey
    """,
)
def pred_is_distinct_from(spark, sf_dir):
    """IS [NOT] DISTINCT FROM — null-safe comparison
    (``expression/operator/DistinctFrom.java`` -> eqNullSafe)."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderkey") <= 1000)
    a = o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "P", F.lit(None)).otherwise(F.col("o_totalprice")).alias("pa"),
    )
    b = o.select(
        F.col("o_orderkey").alias("k2"),
        F.when(F.col("o_orderstatus") == "O", F.lit(None)).otherwise(F.col("o_totalprice")).alias("pb"),
    )
    return (
        a.join(b, F.col("o_orderkey") == F.col("k2"))
        .select(
            "o_orderkey",
            (~F.col("pa").eqNullSafe(F.col("pb"))).alias("d"),
            F.col("pa").eqNullSafe(F.col("pb")).alias("nd"),
        )
    )


@query(
    "pred_any_all_array",
    oracle="""
    SELECT doc_id,
           'spark' = ANY(SELECT UNNEST(words)) AS has_spark,
           len(list_filter(words, x -> length(x) > 5)) > 0 AS any_long,
           len(list_filter(words, x -> length(x) >= 1)) = len(words) AS all_nonempty,
           list_contains(words, 'table') AS eq_any,
           len(list_filter(words, x -> x LIKE 'f%')) > 0 AS like_any
    FROM (SELECT doc_id, string_split(text, ' ') AS words
          FROM documents WHERE doc_id < 200)
    """,
)
def pred_any_all_array(spark, sf_dir):
    """x = ANY(arr), LIKE ANY, ALL variants (AnyOperator.java:56 /
    AllOperator.java) via exists/forall HOFs."""
    t = load_tables(spark, sf_dir)
    d = t["documents"].filter(F.col("doc_id") < 200)
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.array_contains(words, "spark").alias("has_spark"),
        F.exists(words, lambda x: F.length(x) > 5).alias("any_long"),
        F.forall(words, lambda x: F.length(x) >= 1).alias("all_nonempty"),
        F.array_contains(words, "table").alias("eq_any"),
        F.exists(words, lambda x: x.like("f%")).alias("like_any"),
    )


@query(
    "pred_any_like_range",
    oracle="""
    SELECT p_partkey,
           len(list_filter(['%gold%', '%wheat%'], p -> p_name LIKE p)) > 0 AS like_any,
           len(list_filter(['%gold%', '%wheat%'], p -> p_name NOT LIKE p)) > 0 AS not_like_any,
           len(list_filter(['brand#1%', 'BRAND#2%'], p -> lower(p_brand) LIKE lower(p))) > 0 AS ilike_any,
           len(list_filter([10, 25, 40], e -> p_size > e)) > 0 AS gt_any,
           len(list_filter([45, 48], e -> NOT (p_size < e))) = 0 AS lt_all,
           len(list_filter([0, -1], e -> NOT (p_size != e))) = 0 AS ne_all
    FROM part WHERE p_partkey <= 400
    """,
)
def pred_any_like_range(spark, sf_dir):
    """Quantified operators beyond = ANY: LIKE/ILIKE/NOT LIKE ANY
    (``expression/operator/any/AnyLikeOperator.java``), range ANY
    (``AnyRangeOperator.java``) and ALL (``all/AllOperator.java``) —
    executed through the dialect shim (exists/forall HOF rewrites) so
    the SQL front door is what's under test."""
    from crate_spark.dialect import rewrite

    load_tables(spark, sf_dir)
    return spark.sql(
        rewrite(
            """
            SELECT p_partkey,
                   p_name LIKE ANY(array('%gold%', '%wheat%')) AS like_any,
                   p_name NOT LIKE ANY(array('%gold%', '%wheat%')) AS not_like_any,
                   p_brand ILIKE ANY(array('brand#1%', 'BRAND#2%')) AS ilike_any,
                   p_size > ANY(array(10, 25, 40)) AS gt_any,
                   p_size < ALL(array(45, 48)) AS lt_all,
                   p_size != ALL(array(0, -1)) AS ne_all
            FROM part WHERE p_partkey <= 400
            """
        )
    )


@query(
    "pred_like_ilike_regex",
    oracle="""
    SELECT p_partkey,
           p_name LIKE '%spring%' AS like_spring,
           p_name ILIKE '%SPRING%' AS ilike_spring,
           p_name NOT LIKE '%a%' AS not_like_a,
           regexp_matches(p_name, '^[a-g]') AS re_match,
           regexp_matches(lower(p_name), '(?i)GOLD') AS re_ci,
           NOT regexp_matches(p_name, 'o') AS re_neg,
           p_type LIKE 'PROMO%' AS prefix_like
    FROM part WHERE p_partkey <= 500
    """,
)
def pred_like_ilike_regex(spark, sf_dir):
    """LIKE / ILIKE / NOT LIKE (LikeOperators.java:46) and `~ ~* !~`
    regex operators (RegexpMatchOperator) -> like/ilike/rlike."""
    t = load_tables(spark, sf_dir)
    p = t["part"].filter(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        F.col("p_name").like("%spring%").alias("like_spring"),
        F.col("p_name").ilike("%SPRING%").alias("ilike_spring"),
        (~F.col("p_name").like("%a%")).alias("not_like_a"),
        F.col("p_name").rlike("^[a-g]").alias("re_match"),
        F.lower(F.col("p_name")).rlike("(?i)GOLD").alias("re_ci"),
        (~F.col("p_name").rlike("o")).alias("re_neg"),
        F.col("p_type").like("PROMO%").alias("prefix_like"),
    )


@query(
    "pred_between_in",
    oracle="""
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_returnflag IN ('A', 'R')
      AND l_shipdate NOT BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
      AND l_linenumber NOT IN (5, 6, 7)
    """,
)
def pred_between_in(spark, sf_dir):
    """BETWEEN / NOT BETWEEN / IN-list / NOT IN-list."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    lo = F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1996-12-31 00:00:00").cast("timestamp_ntz")
    return (
        li.filter(
            F.col("l_quantity").between(10, 20)
            & F.col("l_returnflag").isin("A", "R")
            & ~F.col("l_shipdate").between(lo, hi)
            & ~F.col("l_linenumber").isin(5, 6, 7)
        ).select("l_orderkey", "l_linenumber")
    )


@query(
    "pred_cidr_containment",
    oracle="""
    WITH ips AS (
      SELECT DISTINCT user_id,
             '10.' || (user_id % 256) || '.' || ((user_id * 7) % 256) || '.'
                   || ((user_id * 13) % 256) AS ip,
             10 * 16777216 + (user_id % 256) * 65536
               + ((user_id * 7) % 256) * 256 + (user_id * 13) % 256 AS ip_num
      FROM events
    )
    SELECT user_id, ip,
           (ip_num & 4286578688) = 167772160 AS in_slash9,
           (ip_num & 4290772992) = 171966464 AS in_slash10
    FROM ips
    """,
)
def pred_cidr_containment(spark, sf_dir):
    """CIDR containment ``ip << 'net/prefix'`` (CIDROperator.java) on a
    deterministic dotted-quad derived from user_id. The Spark side goes
    through the string-parsing ip_in_cidr path (dotted quad -> uint32,
    mask compare — pure JVM ops, pushdown-compatible); the oracle
    recomputes the numeric form directly."""
    from crate_spark.functions.scalar import ip_in_cidr

    t = load_tables(spark, sf_dir)
    u = F.col("user_id")
    ip = F.concat_ws(
        ".", F.lit("10"), (u % 256).cast("string"),
        ((u * 7) % 256).cast("string"), ((u * 13) % 256).cast("string"),
    )
    return (
        t["events"].select("user_id", ip.alias("ip")).distinct()
        .select(
            "user_id", "ip",
            ip_in_cidr(F.col("ip"), "10.0.0.0/9").alias("in_slash9"),
            ip_in_cidr(F.col("ip"), "10.64.0.0/10").alias("in_slash10"),
        )
    )
