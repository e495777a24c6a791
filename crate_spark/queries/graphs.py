"""Graph / clustering queries: connected components over a
co-occurrence graph, and canonical-document selection per duplicate
cluster.

LLM-pipeline extension (no reference analog — CrateDB has no graph
surface). The CC oracle is a DuckDB recursive CTE doing downhill
min-label reachability — exact same fixpoint as the distributed
large-star/small-star contraction, so the driver hash-compares a
genuinely iterative distributed algorithm against ANSI SQL.

Test graph: users co-present in the same (event_type, 30-second
window) on the events table — 30 s grain yields a non-trivial shape
at sf0.01 (several mid-size components + chains), small enough that
the recursive oracle stays cheap.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from crate_spark.operators import graph as G
from crate_spark.queries import query
from crate_spark.session import load_tables

#: DuckDB edge list: distinct user pairs sharing an (event_type, 30 s bucket).
_DUCK_EDGES = """
    SELECT DISTINCT a.user_id AS src, b.user_id AS dst
    FROM events a JOIN events b
      ON a.event_type = b.event_type
     AND floor(epoch(a.ts) / 30) = floor(epoch(b.ts) / 30)
     AND a.user_id < b.user_id
"""

_DUCK_CC = f"""
    WITH RECURSIVE pairs AS ({_DUCK_EDGES}),
    edges AS (SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    walk(node, label) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node
        WHERE w.label < e.dst
    ),
    cc AS (SELECT node, min(label) AS component FROM walk GROUP BY node)
"""


def _spark_edges(spark, sf_dir):
    """Same co-occurrence edge list, Spark-side: one self-join on the
    (event_type, bucket) key — at scale this is the standard blocked
    pair generation (never a full cross product)."""
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id",
        "event_type",
        F.floor(F.unix_timestamp("ts") / 30).alias("bucket"),
    )
    a, b = ev.alias("a"), ev.alias("b")
    return (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(F.col("a.user_id").alias("src"), F.col("b.user_id").alias("dst"))
        .distinct()
    )


@query(
    "graph_connected_components",
    oracle=_DUCK_CC + "SELECT node, component FROM cc",
)
def graph_connected_components(spark, sf_dir):
    """Distributed large-star/small-star CC (operators/graph.py) vs a
    recursive-CTE reachability oracle. component = min reachable id."""
    return G.connected_components(_spark_edges(spark, sf_dir))


@query(
    "graph_component_stats",
    oracle=_DUCK_CC
    + """
    SELECT component, count(*) AS n_members, min(node) AS min_node, max(node) AS max_node
    FROM cc GROUP BY component
    """,
)
def graph_component_stats(spark, sf_dir):
    """Cluster-size profile of the co-occurrence graph — the 'how big
    are my duplicate clusters' audit every dedup run needs."""
    cc = G.connected_components(_spark_edges(spark, sf_dir))
    return cc.groupBy("component").agg(
        F.count("*").alias("n_members"),
        F.min("node").alias("min_node"),
        F.max("node").alias("max_node"),
    )


@query(
    "graph_dedup_canonical",
    oracle="""
    WITH groups AS (
        SELECT md5(array_to_string(
                 string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')[1:5],
                 ' ')) AS digest,
               doc_id, n_chars
        FROM documents
    ),
    sized AS (
        SELECT digest, count(*) OVER (PARTITION BY digest) AS n_dups, doc_id, n_chars
        FROM groups
    )
    SELECT digest, n_dups AS n_members, doc_id AS canonical_id
    FROM sized WHERE n_dups > 1
    QUALIFY row_number() OVER (PARTITION BY digest ORDER BY n_chars DESC, doc_id ASC) = 1
    """,
)
def graph_dedup_canonical(spark, sf_dir):
    """Keep-best-per-duplicate-cluster: 5-word-prefix blocking key
    (testdata has no byte-identical docs below sf0.1, so full-text
    digests would make this trivially empty; prefix blocking is the
    standard cheap candidate key anyway), canonical = longest text,
    ties to the lowest doc_id. The terminal step of the dedup
    pipeline (candidates → components → canonical)."""
    docs = load_tables(spark, sf_dir)["documents"]
    from crate_spark.operators.dedup import normalize_text

    prefix = F.array_join(F.slice(F.split(normalize_text("text"), " "), 1, 5), " ")
    digests = docs.select(
        F.md5(prefix.cast("binary")).alias("digest"),
        "doc_id",
        "n_chars",
    )
    w_cnt = F.count("*").over(Window.partitionBy("digest"))
    sized = digests.withColumn("n_dups", w_cnt).filter(F.col("n_dups") > 1)
    return sized.groupBy("digest").agg(
        F.max("n_dups").alias("n_members"),
        F.max_by(
            "doc_id", F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("_n"))
        ).alias("canonical_id"),
    )


@query("graph_neardup_clusters", oracle=None)
def graph_neardup_clusters(spark, sf_dir):
    """End-to-end near-dup clustering: MinHash/LSH candidate pairs →
    Jaccard-verified edges → connected components → canonical pick.
    xxhash64-based candidates have no SQL twin → rows-only; the CC and
    canonical stages are oracle-proven by the three queries above and
    the recall/property tests in tests/test_graph.py."""
    from crate_spark.operators import dedup as dd

    docs = load_tables(spark, sf_dir)["documents"]
    # candidate pairs materialize once (tiny: the LSH-collided pair
    # list) so the verify stage can shingle ONLY the docs that appear
    # in a pair — the previous form computed the shingle arrays for
    # the WHOLE corpus on BOTH join branches to verify a handful of
    # candidates (r11 optimization round; guide §1.2: don't compute
    # what you throw away). Same verified edge set, bit-identical.
    pairs = dd.minhash_lsh_candidates(
        docs, "text", "doc_id", num_hashes=32, bands=8
    ).localCheckpoint()
    cand_ids = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .union(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    sh = docs.join(F.broadcast(cand_ids), "doc_id").select(
        F.col("doc_id"), dd.shingles("text").alias("_sh")
    )
    verified = (
        pairs.join(sh.withColumnRenamed("_sh", "_sa"), pairs["id_a"] == sh["doc_id"])
        .drop("doc_id")
        .join(
            sh.withColumnRenamed("_sh", "_sb").withColumnRenamed("doc_id", "_db"),
            F.col("id_b") == F.col("_db"),
        )
        .filter(dd.jaccard(F.col("_sa"), F.col("_sb")) >= 0.7)
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    cc = G.connected_components(verified)
    return G.canonical_per_component(
        cc, docs.select("doc_id", "n_chars"), node_col="doc_id", quality_col="n_chars"
    )
