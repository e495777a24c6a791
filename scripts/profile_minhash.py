#!/usr/bin/env python
"""Phase profile of text_minhash_lsh at sf0.1: time each pipeline
prefix with the noop sink (guide §1.4) to locate the exec cost."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window, functions as F

from crate_spark.operators import dedup as dd
from crate_spark.session import get_spark, load_tables

SF = "/root/testdata/sf0.1"
ITERS = 5


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def timeit(label, build):
    runs = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        noop(build())
        runs.append(time.perf_counter() - t0)
    runs.sort()
    print(f"{label:28s} med={runs[len(runs)//2]:.3f} min={runs[0]:.3f} max={runs[-1]:.3f}")


def main():
    spark = get_spark("minhash-profile")
    t = load_tables(spark, SF)
    df, text_col, id_col = t["documents"], "text", "doc_id"
    num_hashes, bands, shingle_n = 32, 8, 3
    rows_per_band = num_hashes // bands

    def grams():
        words = df.select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.split(dd.normalize_text(text_col), " ")).alias("_pos", "_w"),
        )
        w = Window.partitionBy("_id").orderBy("_pos")
        parts = [F.col("_w")] + [F.lead("_w", i).over(w) for i in range(1, shingle_n)]
        doc_len = F.max("_pos").over(Window.partitionBy("_id"))
        return (
            words.select(
                "_id",
                F.col("_pos"),
                F.concat_ws(" ", *parts).alias("_sh"),
                (parts[-1].isNotNull() | ((doc_len < shingle_n - 1) & (F.col("_pos") == 0))).alias("_keep"),
            )
            .filter(F.col("_keep"))
            .select("_id", "_sh")
        )

    def sig():
        base = grams().withColumn("_h0", F.xxhash64("_sh"))
        mins = ", ".join(f"min(xxhash64(`_h0`, {i}))" for i in range(num_hashes))
        return base.groupBy("_id").agg(F.expr(f"array({mins})").alias("_sig"))

    def banded():
        band_structs = ", ".join(
            "named_struct('band', {b}, 'bucket', xxhash64(array_join("
            "transform(slice(`_sig`, {start}, {n}), x -> CAST(x AS STRING)), ',')))".format(
                b=b, start=b * rows_per_band + 1, n=rows_per_band
            )
            for b in range(bands)
        )
        return (
            sig()
            .select("_id", F.expr(f"explode(array({band_structs}))").alias("bb"))
            .select("_id", "bb.band", "bb.bucket")
        )

    def capped():
        bw = Window.partitionBy("band", "bucket")
        return (
            banded()
            .withColumn("_bsz", F.count("*").over(bw))
            .filter(F.col("_bsz") <= 1000)
            .drop("_bsz")
        )

    def full():
        return dd.minhash_lsh_candidates(df, text_col, id_col)

    # warm
    noop(full())
    timeit("1 grams", grams)
    timeit("2 +signature agg", sig)
    timeit("3 +banding", banded)
    timeit("4 +bucket cap window", capped)
    timeit("5 full (join+pair agg)", full)
    spark.stop()


if __name__ == "__main__":
    main()
