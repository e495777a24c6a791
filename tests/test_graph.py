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
