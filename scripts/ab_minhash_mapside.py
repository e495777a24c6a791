#!/usr/bin/env python
"""A/B: window-shingled minhash signature (current) vs fully map-side
per-row signature (zip-shift grams, one aggregate fold for all 32
minima). Checks bit-equality of signatures at sf0.1, then interleaved
full-pipeline timings."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window, functions as F

from crate_spark.operators import dedup as dd
from crate_spark.session import get_spark, load_tables, spread_small_input

SF = "/root/testdata/sf0.1"
NUM_HASHES, BANDS, N = 32, 8, 3


def sig_window(df, text_col, id_col):
    words = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(dd.normalize_text(text_col), " ")).alias("_pos", "_w"),
    )
    w = Window.partitionBy("_id").orderBy("_pos")
    parts = [F.col("_w")] + [F.lead("_w", i).over(w) for i in range(1, N)]
    doc_len = F.max("_pos").over(Window.partitionBy("_id"))
    grams = (
        words.select(
            "_id",
            F.col("_pos"),
            F.concat_ws(" ", *parts).alias("_sh"),
            (parts[-1].isNotNull() | ((doc_len < N - 1) & (F.col("_pos") == 0))).alias("_keep"),
        )
        .filter(F.col("_keep"))
        .select("_id", "_sh")
    )
    base = grams.withColumn("_h0", F.xxhash64("_sh"))
    mins = ", ".join(f"min(xxhash64(`_h0`, {i}))" for i in range(NUM_HASHES))
    return base.groupBy("_id").agg(F.expr(f"array({mins})").alias("_sig"))


def sig_mapside(df, text_col, id_col):
    words = F.col("_w")
    shifted = [words if i == 0 else F.slice(words, i + 1, F.size(words)) for i in range(N)]
    zipped = F.arrays_zip(*[c.alias(f"w{i}") for i, c in enumerate(shifted)])
    full = F.slice(zipped, 1, F.greatest(F.size(words) - N + 1, F.lit(1)))
    grams = F.transform(full, lambda s: F.concat_ws(" ", *[s[f"w{i}"] for i in range(N)]))
    maxlong = 9223372036854775807
    init = f"array({', '.join([f'CAST({maxlong} AS BIGINT)'] * NUM_HASHES)})"
    sig = (
        f"aggregate(_h0s, {init}, "
        f"(acc, h) -> zip_with(acc, sequence(0, {NUM_HASHES - 1}), (a, i) -> least(a, xxhash64(h, i))))"
    )
    return (
        df.select(F.col(id_col).alias("_id"), F.split(dd.normalize_text(text_col), " ").alias("_w"))
        .select("_id", F.transform(grams, lambda g: F.xxhash64(g)).alias("_h0s"))
        .select("_id", F.expr(sig).alias("_sig"))
    )


def main():
    spark = get_spark("minhash-ab")
    t = load_tables(spark, SF)
    df = t["documents"]

    a = sig_window(df, "text", "doc_id").orderBy("_id").collect()
    b = sig_mapside(df, "text", "doc_id").orderBy("_id").collect()
    assert len(a) == len(b), (len(a), len(b))
    diffs = sum(1 for ra, rb in zip(a, b) if ra["_id"] != rb["_id"] or ra["_sig"] != rb["_sig"])
    print(f"signature rows={len(a)} diffs={diffs}")
    if diffs:
        for ra, rb in zip(a, b):
            if ra["_sig"] != rb["_sig"]:
                print("first diff id", ra["_id"])
                print(" win:", ra["_sig"][:6])
                print(" map:", rb["_sig"][:6])
                break
        return

    # interleaved timing of the signature stage alone
    def noop(d):
        d.write.mode("overwrite").format("noop").save()

    noop(sig_window(df, "text", "doc_id"))
    noop(sig_mapside(spread_small_input(df.select("doc_id", "text")), "text", "doc_id"))
    tw, tm = [], []
    for _ in range(6):
        t0 = time.perf_counter(); noop(sig_window(df, "text", "doc_id")); tw.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); noop(sig_mapside(spread_small_input(df.select("doc_id", "text")), "text", "doc_id")); tm.append(time.perf_counter() - t0)
    tw.sort(); tm.sort()
    print(f"window  sig med={tw[3]:.3f} {tw}")
    print(f"mapside sig med={tm[3]:.3f} {tm}")
    spark.stop()


if __name__ == "__main__":
    main()
