"""Bucketed table layout — the co-located-join storage strategy.

The reference co-locates work by routing rows to shards with
``MODULO`` distribution at insert time (``planner/distribution/
DistributionType.java``, routing hash in ``metadata/Routing``): a join
on the routing key then runs shard-local. Spark's equivalent is
BUCKETED TABLES: ``bucketBy(n, key)`` at write time hash-partitions
files exactly like a shuffle would, so a join or aggregation on the
bucket key reads co-located buckets and plans ZERO exchanges.

At 100 TB this is the difference between shuffling the fact table for
every orderkey join (dozens of TB over the network, repeatedly) and
paying the layout cost once at ingest. The same layout serves every
downstream join/groupBy on that key; AQE handles the residual skew.

Bucket-count sizing: target ~128-512 MB of post-compression data per
bucket per partition; at 100 TB that is O(10^4) buckets — set
``n_buckets`` from the table's expected steady-state size, not the
test corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    *,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) parquet
    table in the session catalog. Sorting within buckets additionally
    removes the Sort step of sort-merge joins on the same key."""
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables on their bucket key — plans with no
    Exchange on either side when both were written with the same
    bucket count on the join key (pinned in tests/test_plans.py)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    *,
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-defeating equi-join for when ONE key dominates beyond what
    AQE's skew-join splitting handles (spark.sql.adaptive.skewJoin
    splits oversized partitions, but a single hot KEY still lands every
    row in one task's hash bucket).

    The large side gets a deterministic per-row salt (hash of the whole
    row, mod ``salts``); the small side is exploded ``salts`` times so
    every (key, salt) pair still matches. The hot key's rows then
    spread over ``salts`` tasks at the cost of replicating the small
    side ``salts``x — the standard trade, worth it only when the small
    side is small (it usually is: skew means few distinct hot keys).
    """
    from pyspark.sql import functions as F

    salt = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(salts))
    big = large.withColumn("__salt", salt)
    exploded = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return big.join(exploded, [key, "__salt"], how).drop("__salt")
