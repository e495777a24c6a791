"""Property tests for distributed connected components: the
large-star/small-star contraction must agree with a plain union-find
on every graph shape that stresses it (chains = many rounds, stars,
cycles, random sparse graphs, multi-component mixes)."""

from __future__ import annotations

import random

import pytest

from crate_spark.operators.graph import canonical_per_component, connected_components


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonicalize to min-of-component to match the operator's contract
    comp = {}
    for n in list(parent):
        comp.setdefault(find(n), []).append(n)
    out = {}
    for root, members in comp.items():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _check(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == _union_find(edges)


def test_chain_needs_many_rounds(spark):
    # a 64-node path: label propagation would need 64 rounds; star
    # contraction must still converge inside the 25-round budget
    _check(spark, [(i, i + 1) for i in range(64)])


def test_star_cycle_and_isolated_pair(spark):
    edges = (
        [(100, i) for i in range(101, 110)]  # star
        + [(200, 201), (201, 202), (202, 200)]  # cycle
        + [(300, 301)]  # isolated pair
    )
    _check(spark, edges)


def test_duplicate_and_reversed_edges(spark):
    _check(spark, [(1, 2), (2, 1), (1, 2), (3, 2), (2, 3)])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_sparse(spark, seed):
    rng = random.Random(seed)
    n = 120
    edges = [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(90)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, edges)


def test_canonical_per_component(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "src long, dst long")
    cc = connected_components(edges)
    docs = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 9.0), (10, 1.0), (11, 4.0)], "doc_id long, q double"
    )
    got = {
        r["component"]: (r["canonical_id"], r["n_members"])
        for r in canonical_per_component(
            cc, docs, node_col="doc_id", quality_col="q"
        ).collect()
    }
    # ties on quality break to the LOWEST id (2 beats 3 at q=9.0)
    assert got == {1: (2, 3), 10: (11, 2)}


def test_hot_hub_skew_safe_form(spark):
    """Hot-hub stress: one node connected to 10^5 others (+ a chain
    grafted on so convergence takes several rounds). With a low
    hub_degree_threshold every round must take the skew-safe
    aggregate+join form — no window task sees the hub's full fan-in —
    and the result must still match union-find."""
    hub_edges = [(0, i) for i in range(1, 100_001)]
    chain = [(100_000 + i, 100_001 + i) for i in range(32)]  # attached at 100000
    edges = hub_edges + chain
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, hub_degree_threshold=1000).collect()
    }
    assert got == _union_find(edges)
    assert len(got) == 100_033
    assert set(got.values()) == {0}


def test_star_forms_agree(spark):
    """Window and aggregate+join forms of each star step are plan
    variants of the SAME operator — identical output on a shape with
    hubs, chains and ties."""
    from crate_spark.operators.graph import _large_star, _small_star, _symmetrize

    random.seed(7)
    edges = [(random.randrange(50), random.randrange(50)) for _ in range(300)]
    e = _symmetrize(spark.createDataFrame(edges, "src long, dst long"))
    ls_w = set(map(tuple, _large_star(e, skew_safe=False).collect()))
    ls_j = set(map(tuple, _large_star(e, skew_safe=True).collect()))
    assert ls_w == ls_j
    ss_w = set(map(tuple, _small_star(e, skew_safe=False).collect()))
    ss_j = set(map(tuple, _small_star(e, skew_safe=True).collect()))
    assert ss_w == ss_j


def test_hub_threshold_session_setting(spark):
    """`SET crate_spark.graph.hub_degree_threshold` is the operator
    knob for the CC skew gate: with no explicit argument the operator
    reads the session conf, and SHOW reads the value back (VERDICT r5
    #6)."""
    from crate_spark.engine import CrateSession

    s = CrateSession(spark, None)
    s.execute("SET crate_spark.graph.hub_degree_threshold = 1000")
    row = s.execute("SHOW crate_spark.graph.hub_degree_threshold").collect()[0]
    assert row["value"] == "1000"
    # a 300-edge hot hub exceeds the 1000 threshold once symmetrized
    # rounds double it past 2*count > 1000 -> skew-safe form; result
    # must still be the single star component
    df = spark.createDataFrame(
        [(0, i) for i in range(1, 301)], "src bigint, dst bigint"
    )
    try:
        got = {
            (r["node"], r["component"])
            for r in connected_components(df).collect()
        }
        assert got == {(i, 0) for i in range(301)}
    finally:
        spark.conf.unset("crate_spark.graph.hub_degree_threshold")
