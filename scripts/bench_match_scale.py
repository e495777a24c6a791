#!/usr/bin/env python
"""BM25 fulltext 10x scale-up measurement (VERDICT r8 #5).

The README's measured 10x table (q1, text_stats, minhash, sessionize,
CC) predates the r8 map-only BM25 rewrite; this adds the fulltext
point. Synthetic sf1 documents = 10 disjoint shifted copies of the
sf0.1 documents table (doc_id offset per copy, text unchanged —
corpus stats shift with N so scores differ, which is fine: this
measures WALL and SCAN COUNT, correctness is the oracle's job).

Prints one JSON line: wall seconds (median of ITERS) and parquet scan
counts at 1x and 10x, plus the 10x/1x ratio.

Usage: python scripts/bench_match_scale.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from crate_spark.operators.fulltext import bm25_scores
from crate_spark.session import get_spark

COPIES = 10
ITERS = 5
QUERY = "spark vector window"


def scan_count(df) -> int:
    # read BEFORE collect: after execution AQE's toString prints the
    # final AND initial plans, double-counting every node
    return df._jdf.queryExecution().executedPlan().toString().count(
        "Scan parquet"
    )


def topk(docs):
    return (
        bm25_scores(docs, QUERY)
        .orderBy(F.col("_score").desc(), F.col("doc_id"))
        .limit(20)
        .select("doc_id", F.round("_score", 6).alias("score"))
    )


def timed(spark, path):
    docs = spark.read.parquet(path)
    scans = scan_count(topk(docs))
    runs = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        topk(spark.read.parquet(path)).write.mode("overwrite").format(
            "noop"
        ).save()
        runs.append(time.perf_counter() - t0)
    return round(statistics.median(runs), 3), scans


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bench-match-scale")
    src = os.path.join(sf_dir, "documents.parquet")
    base = spark.read.parquet(src)
    n = base.count()
    ten_dir = os.path.join(
        tempfile.gettempdir(), "crate_match_scale_10x.parquet"
    )
    if not os.path.isdir(ten_dir):
        tenx = None
        for i in range(COPIES):
            c = base.withColumn(
                "doc_id", (F.col("doc_id") + F.lit(i * n)).cast("long")
            )
            tenx = c if tenx is None else tenx.unionByName(c)
        tenx.write.mode("overwrite").parquet(ten_dir)

    # warm the plan shape (codegen compile) before either timing
    topk(spark.read.parquet(src)).write.mode("overwrite").format(
        "noop"
    ).save()
    w1, s1 = timed(spark, src)
    w10, s10 = timed(spark, ten_dir)
    print(
        json.dumps(
            {
                "metric": "bm25_topk_10x_scaleup",
                "query": QUERY,
                "docs_1x": n,
                "wall_1x_sec": w1,
                "wall_10x_sec": w10,
                "ratio": round(w10 / w1, 2),
                "scans_1x": s1,
                "scans_10x": s10,
                "iters": ITERS,
                "stat": "median",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
