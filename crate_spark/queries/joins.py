"""Join operators: CROSS, INNER, LEFT, RIGHT, FULL, SEMI, ANTI,
non-equi theta, multiway, and the lookup-join pattern.

Reference parity (SURVEY.md §2.3):
- ``planner/operators/JoinPlan.java:43`` -> ``HashJoin.java:60`` (equi)
  or ``NestedLoopJoin.java:62`` (theta/CROSS/FULL); join types
  ``libs/sql-parser/.../JoinType.java:24-31``. SEMI/ANTI are produced by
  IN/EXISTS rewrites — here ``left_semi``/``left_anti``.
- Block hash join (``execution/engine/join/HashJoinBatchIterator.java:94``)
  re-reads the probe side per memory-sized build block; Spark's
  SortMergeJoin/ShuffledHashJoin spills instead — strictly better.
- Lookup join (``planner/optimizer/rule/EquiJoinToLookupJoin.java:71``)
  pre-filters the big side with the small side's keys; Spark analog is a
  broadcast semi join / runtime filter.

Scale notes (100 TB): dimension tables (region/nation/customer-subset)
are broadcast — no shuffle of the fact table; fact⋈fact joins shuffle
on the join key and rely on AQE for skew splitting. Non-equi joins are
kept BroadcastNestedLoop with an explicitly small broadcast side.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crate_spark.queries import query
from crate_spark.queries._util import dsum, sql_dsum
from crate_spark.session import load_tables


@query(
    "join_inner_multiway",
    oracle=f"""
    SELECT o.o_orderkey,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
)
def join_inner_multiway(spark, sf_dir):
    """TPC-H Q3 shape: filtered dim broadcast into two fact joins.

    customer (filtered) is broadcast -> orders shuffles only for the
    lineitem equi-join on l_orderkey; top-k via TakeOrderedAndProject.
    """
    t = load_tables(spark, sf_dir)
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp_ntz")
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") > cutoff)
        .join(
            t["orders"].filter(F.col("o_orderdate") < cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "join_q5_regional_revenue",
    oracle=f"""
    SELECT n.n_name, {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
)
def join_q5_regional_revenue(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join, all dims broadcast, one fact shuffle."""
    t = load_tables(spark, sf_dir)
    dims = (
        t["customer"]
        .join(
            F.broadcast(
                t["nation"].join(
                    F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "c_nationkey", "n_nationkey", "n_name")
    )
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_acctbal
    FROM orders o
    LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
      ON o.o_custkey = c.c_custkey
    WHERE o.o_orderkey < 1000
    """,
)
def join_left_outer(spark, sf_dir):
    """LEFT OUTER hash join (reference rule RewriteLeftOuterJoinToHashJoin)."""
    t = load_tables(spark, sf_dir)
    rich = t["customer"].filter(F.col("c_acctbal") > 5000)
    return (
        t["orders"]
        .filter(F.col("o_orderkey") < 1000)
        .join(F.broadcast(rich), F.col("o_custkey") == F.col("c_custkey"), "left")
        .select("o_orderkey", "o_totalprice", "c_name", "c_acctbal")
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey
    FROM (SELECT * FROM orders WHERE o_totalprice > 450000) o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey < 300
    """,
)
def join_right_outer(spark, sf_dir):
    """RIGHT OUTER join (reference RewriteRightOuterJoinToHashJoin)."""
    t = load_tables(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 450000)
    return (
        big.join(
            t["customer"].filter(F.col("c_custkey") < 300),
            F.col("o_custkey") == F.col("c_custkey"),
            "right",
        ).select("c_custkey", "c_name", "o_orderkey")
    )


@query(
    "join_full_outer",
    oracle=f"""
    SELECT COALESCE(f.k, o.k) AS custkey, f.n_f, o.n_o
    FROM (SELECT o_custkey AS k, COUNT(*) AS n_f FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey) f
    FULL JOIN (SELECT o_custkey AS k, COUNT(*) AS n_o FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey) o
      ON f.k = o.k
    """,
)
def join_full_outer(spark, sf_dir):
    """FULL OUTER join — reference executes via NestedLoop only
    (``NestedLoopOperation.java``); Spark does a shuffled SMJ, strictly
    better at scale."""
    t = load_tables(spark, sf_dir)
    o = t["orders"]
    f_side = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("n_f"))
    )
    o_side = (
        o.filter(F.col("o_orderstatus") == "O")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("n_o"))
    )
    return (
        f_side.alias("f")
        .join(o_side.alias("o"), F.col("f.k") == F.col("o.k"), "full")
        .select(
            F.coalesce(F.col("f.k"), F.col("o.k")).alias("custkey"),
            F.col("f.n_f"),
            F.col("o.n_o"),
        )
    )


@query(
    "join_cross",
    oracle="""
    SELECT r1.r_name AS from_region, r2.r_name AS to_region
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey <> r2.r_regionkey
    """,
)
def join_cross(spark, sf_dir):
    """CROSS JOIN (reference NestedLoopJoin) — broadcast NL in Spark."""
    t = load_tables(spark, sf_dir)
    r1 = t["region"].select(F.col("r_regionkey").alias("k1"), F.col("r_name").alias("from_region"))
    r2 = t["region"].select(F.col("r_regionkey").alias("k2"), F.col("r_name").alias("to_region"))
    return (
        r1.crossJoin(F.broadcast(r2))
        .filter(F.col("k1") != F.col("k2"))
        .select("from_region", "to_region")
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def join_semi(spark, sf_dir):
    """EXISTS -> left_semi join (reference rewrites to internal SEMI,
    ``JoinType.java:24-31``)."""
    t = load_tables(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 400000)
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def join_anti(spark, sf_dir):
    """NOT EXISTS -> left_anti join (reference internal ANTI type)."""
    t = load_tables(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 300000)
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@query(
    "join_non_equi",
    oracle="""
    SELECT s.s_suppkey, c.c_custkey
    FROM supplier s
    JOIN customer c
      ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
    WHERE c.c_custkey <= 200
    """,
)
def join_non_equi(spark, sf_dir):
    """Theta join: equi part hashes, range residual filters — the
    reference runs the whole thing as nested-loop
    (``NestedLoopJoin.java:62``, no range-join specialization);
    Spark hashes on s_nationkey and evaluates the residual, so the
    quadratic blowup is bounded per nation key."""
    t = load_tables(spark, sf_dir)
    return (
        t["supplier"]
        .alias("s")
        .join(
            t["customer"].filter(F.col("c_custkey") <= 200).alias("c"),
            (F.col("s.s_nationkey") == F.col("c.c_nationkey"))
            & (F.col("s.s_acctbal") > F.col("c.c_acctbal")),
        )
        .select("s.s_suppkey", "c.c_custkey")
    )


@query(
    "join_lookup",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 1)
    """,
)
def join_lookup(spark, sf_dir):
    """Lookup-join pattern (``EquiJoinToLookupJoin.java:71``): probe a
    huge fact with a tiny key set — broadcast left_semi, zero fact
    shuffle; at cluster scale this is a bloom/runtime filter."""
    t = load_tables(spark, sf_dir)
    keys = t["part"].filter(F.col("p_size") == 1).select("p_partkey")
    return (
        t["lineitem"]
        .join(F.broadcast(keys), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .select("l_orderkey", "l_partkey", "l_quantity")
    )


@query(
    "join_in_subquery_negated",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
    """,
)
def join_in_subquery_negated(spark, sf_dir):
    """NOT IN with non-nullable subquery column -> left_anti.

    (NOT IN over a nullable column is 3vl-tricky — l_partkey is
    non-null in the data, and the reference's ``AnyOperator`` has the
    same PG semantics.)
    """
    t = load_tables(spark, sf_dir)
    sold = t["lineitem"].filter(F.col("l_quantity") > 45).select("l_partkey")
    return (
        t["part"]
        .join(sold, F.col("p_partkey") == F.col("l_partkey"), "left_anti")
        .select("p_partkey", "p_name")
    )


@query(
    "join_self",
    oracle="""
    SELECT a.n_name AS nation_a, b.n_name AS nation_b
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
)
def join_self(spark, sf_dir):
    """Self join with inequality tie-break (pair generation)."""
    t = load_tables(spark, sf_dir)
    a = t["nation"].select(
        F.col("n_nationkey").alias("ka"), F.col("n_regionkey").alias("ra"), F.col("n_name").alias("nation_a")
    )
    b = t["nation"].select(
        F.col("n_nationkey").alias("kb"), F.col("n_regionkey").alias("rb"), F.col("n_name").alias("nation_b")
    )
    return (
        a.join(F.broadcast(b), (F.col("ra") == F.col("rb")) & (F.col("ka") < F.col("kb")))
        .select("nation_a", "nation_b")
    )


@query(
    "join_q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           c.c_acctbal, n.n_name, c.c_mktsegment
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name, c.c_mktsegment
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def join_q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape (returned-items report): two fact joins + two
    broadcast dims, grouped by a wide customer key, top-20 by revenue.

    At scale: lineitem filters on l_returnflag at the scan; orders
    prunes to one quarter via min/max stats; customer and nation
    broadcast; the single fact shuffle is the l_orderkey equi-join,
    and the final top-k is TakeOrderedAndProject.
    """
    t = load_tables(spark, sf_dir)
    lo = F.lit("1996-10-01 00:00:00").cast("timestamp_ntz")
    hi = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    o = t["orders"].filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name", "c_mktsegment")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "join_q18_large_orders",
    oracle=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, q.sum_qty
    FROM (SELECT l_orderkey,
                 {sql_dsum('l_quantity')} AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 250) q
    JOIN orders o   ON o.o_orderkey = q.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100
    """,
)
def join_q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape (large-volume customers): the HAVING subquery's
    aggregate is computed ONCE and reused as both the filter and the
    reported sum — not re-joined against lineitem a second time as the
    literal SQL would.

    At scale: one lineitem shuffle (map-side-combining partial sum on
    l_orderkey), the >250 filter collapses it to a tiny qualifying
    set, orders joins on its key, customer broadcasts, and the top-k
    is TakeOrderedAndProject. The naive plan (semi-join then re-join
    lineitem and re-aggregate) shuffles lineitem twice.
    """
    t = load_tables(spark, sf_dir)
    qualifying = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        qualifying.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@query(
    "join_q16_supplier_cnt",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#3'
      AND p.p_size IN (1, 5, 9, 14, 23)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def join_q16_supplier_cnt(spark, sf_dir):
    """TPC-H Q16 shape: distinct-count aggregate behind a NOT IN
    anti-join (``PlanSubqueries`` in the reference rewrites NOT IN to
    anti; ``queries/joins.py`` join_anti is the bare operator).

    At scale: the excluded-supplier set is a broadcast anti join (no
    fact shuffle for the exclusion), part is a broadcast dim, and the
    only fact shuffle is the partial-aggregating distinct on
    (brand, type, size, suppkey). NOT IN's null trap doesn't apply:
    s_suppkey is a key, never NULL.
    """
    t = load_tables(spark, sf_dir)
    bad_supp = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t["lineitem"]
        .join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(
            F.broadcast(
                t["part"].filter(
                    (F.col("p_brand") != "Brand#3")
                    & F.col("p_size").isin(1, 5, 9, 14, 23)
                )
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )
