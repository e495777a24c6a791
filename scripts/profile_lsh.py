#!/usr/bin/env python
"""Phase profile + A/B for vector_ann_lsh at sf0.1 (guide §1.4 noop
prefixes). A/B: compute cosine similarity BEFORE the (q,c) dedup so
the dedup exchange carries (q_id, c_id, sim) instead of two 64-double
vectors (~24 B vs ~1 KB per row, guide §2.3), with the dedup as a
map-side-combining first() aggregate."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window, functions as F

from crate_spark.functions.vector import cosine_similarity
from crate_spark.operators.knn import _lsh_buckets
from crate_spark.session import get_spark, load_tables, spread_small_input

SF = "/root/testdata/sf0.1"
K, DIM, N_PLANES, N_TABLES, SEED = 5, 64, 4, 8, 42


def stages(spark):
    t = load_tables(spark, SF)
    emb = t["embeddings"]
    queries = emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("q_id"), "embedding")
    tb = _lsh_buckets("embedding", DIM, N_PLANES, N_TABLES, SEED)
    c = spread_small_input(emb).select(
        F.col("vec_id"), F.col("embedding").alias("_cvec"), F.explode(tb).alias("_tb")
    )
    q = queries.select(F.col("q_id"), F.col("embedding").alias("_qvec"), F.explode(tb).alias("_tb"))
    cands_pre = (
        c.join(F.broadcast(q), c["_tb"] == q["_tb"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", "_cvec", "_qvec")
    )
    cands = cands_pre.dropDuplicates(["q_id", "vec_id"])
    w = Window.partitionBy("q_id").orderBy(F.col("similarity").desc(), F.col("vec_id"))
    full = (
        cands.withColumn("similarity", cosine_similarity(F.col("_cvec"), F.col("_qvec")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K)
        .select("q_id", "vec_id", "similarity", "rank")
        .withColumn("similarity", F.round("similarity", 6))
    )
    # variant: sim map-side, dedup = first() aggregate on skinny rows
    slim = (
        cands_pre.withColumn("similarity", cosine_similarity(F.col("_cvec"), F.col("_qvec")))
        .groupBy("q_id", "vec_id")
        .agg(F.first("similarity").alias("similarity"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K)
        .select("q_id", "vec_id", "similarity", "rank")
        .withColumn("similarity", F.round("similarity", 6))
    )
    return {"1 corpus buckets": c, "2 +cand join": cands_pre,
            "3 +dedup": cands, "4 full (window)": full, "5 slim variant": slim}


def main():
    spark = get_spark("lsh-profile")
    s = stages(spark)

    a = sorted(map(tuple, s["4 full (window)"].collect()))
    b = sorted(map(tuple, s["5 slim variant"].collect()))
    print("slim == full:", a == b, len(a))

    def noop(d):
        d.write.mode("overwrite").format("noop").save()

    for label, df in s.items():
        noop(df)
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            noop(df)
            runs.append(time.perf_counter() - t0)
        runs.sort()
        print(f"{label:20s} med={runs[2]:.3f} {['%.2f' % r for r in runs]}")
    spark.stop()


if __name__ == "__main__":
    main()
