"""Plan-build cost pins for the heavy query builders (VERDICT r11 #7).

The r11/r12 optimization rounds compiled the expensive builders to
one (or few) SQL parses; the wins live on the DRIVER (py4j socket
round-trips + Catalyst re-analysis of literal-heavy trees), so plan
*shape* pins cannot protect them. These tests wall-clock plan
CONSTRUCTION only — ``fn(spark, sf_dir)`` without an action — on a
warm session and take the min of 5 tries (driver CPU work; the min is
robust to scheduler noise, while a reverted one-parse adds
deterministic driver work that raises every try).

Budgets are ~2.5x the observed warm min at local[32] (r12:
routed 0.53 / lsh 0.47 / minhash 0.14 / simhash 0.22 / match 0.25 /
per-query PQ 0.92 — the last includes its size-gated encode
materialization jobs). Reverts they must catch (measured when the
one-parse landed): simhash 64-fold build +1.3 s, minhash per-seed
builders +0.4 s, routed-PQ chained transformations +0.5-0.7 s,
LSH per-seed bucket builders +0.2-0.4 s.
"""

import time

import pytest

from crate_spark.queries import load_all

from .conftest import SF_DIR

BUDGETS_SEC = {
    "vector_ann_pq_routed": 1.3,
    "vector_ann_pq": 2.5,
    "vector_ann_lsh": 1.2,
    "text_minhash_lsh": 0.5,
    "text_simhash": 0.7,
    "sql_match_score": 0.8,
}


@pytest.mark.parametrize("name", sorted(BUDGETS_SEC))
def test_plan_build_within_budget(spark, name):
    fn = load_all()[name].fn
    fn(spark, SF_DIR)  # warm: table load, confs, training caches
    best = min(
        _timed(fn, spark) for _ in range(5)
    )
    assert best < BUDGETS_SEC[name], (
        f"{name}: plan build min {best:.3f}s exceeds {BUDGETS_SEC[name]}s — "
        "a one-parse builder probably regressed to chained py4j calls"
    )


def _timed(fn, spark):
    t0 = time.perf_counter()
    fn(spark, SF_DIR)
    return time.perf_counter() - t0
