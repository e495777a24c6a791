#!/usr/bin/env python
"""Routed-vs-per-query PQ scale measurement (VERDICT r7 #5).

Reproduces the README "routed PQ at scale" row: a 10x corpus (10
disjoint shifted copies of the sf0.01 embeddings, written to parquet)
probed with a 200-query batch through BOTH knn_pq regimes:

- per-query (route threshold forced above the batch): one
  TakeOrderedAndProject corpus scan PER QUERY — 200 parquet scans;
- routed (default threshold 64 < 200): the IVFADC+refine single-scan
  path — ONE parquet scan for the whole batch.

Prints recall@10 vs exact brute force, wall seconds, and the parquet
scan count read from the executed plan for each regime.

Usage: python scripts/bench_pq_routed.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from crate_spark.operators import quant as Q
from crate_spark.session import get_spark

#: override with PQ_COPIES=1 for the 1x point of the scale curve
COPIES = int(os.environ.get("PQ_COPIES", "10"))
N_QUERIES = 200
K = 10


def scan_count(df) -> int:
    # read BEFORE collect: after execution AQE's toString prints the
    # final AND initial plans, double-counting every node
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Scan parquet")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("pq-routed-bench")
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_base = base.count()

    # 10 disjoint shifted copies -> parquet (same 10x recipe as the
    # README codebook A/B)
    parts = [
        base.select(
            (F.col("vec_id") + F.lit(i * n_base)).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x + F.lit(float(i) * 100.0)
            ).alias("embedding"),
        )
        for i in range(COPIES)
    ]
    corpus10 = parts[0]
    for p in parts[1:]:
        corpus10 = corpus10.unionAll(p)
    path = os.path.join(tempfile.gettempdir(), "pq_routed_corpus10")
    corpus10.write.mode("overwrite").parquet(path)
    corpus = spark.read.parquet(path)
    n = corpus.count()

    queries = [
        (r["vec_id"], r["embedding"])
        for r in corpus.orderBy("vec_id").limit(N_QUERIES).collect()
    ]

    # exact ground truth (brute force, includes self at distance 0 —
    # both PQ paths rank self first too, so recall compares like rows)
    exact: dict[int, set] = {}
    qdf = spark.createDataFrame(
        [(int(qid), [float(x) for x in qv]) for qid, qv in queries],
        "q_id bigint, embedding array<double>",
    )
    from crate_spark.operators.knn import knn_exact

    ex = knn_exact(
        corpus, qdf, K, metric="euclidean", exclude_self=False
    ).collect()
    for r in ex:
        exact.setdefault(r["q_id"], set()).add(r["vec_id"])

    def recall(rows) -> float:
        got: dict[int, set] = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(
            len(got.get(q, set()) & exact[q]) / K for q in exact
        ) / len(exact)

    results = {}
    for label, threshold in (("routed", "64"), ("per-query", "100000")):
        spark.conf.set("crate_spark.vector.pq_route_threshold", threshold)
        Q.knn_pq(corpus, queries[:1], k_neighbors=K)  # warm codebook cache
        df = Q.knn_pq(corpus, queries, k_neighbors=K)
        scans = scan_count(df)
        t0 = time.perf_counter()
        rows = df.collect()
        wall = time.perf_counter() - t0
        results[label] = (recall(rows), wall, scans)
        print(
            f"{label:>10}: recall@10 {results[label][0]:.2f}, "
            f"wall {wall:.1f} s, parquet scans {results[label][2]}, "
            f"rows {len(rows)}"
        )
    spark.conf.unset("crate_spark.vector.pq_route_threshold")
    spark.stop()


if __name__ == "__main__":
    main()
