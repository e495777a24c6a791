"""Vector functions over ``array<float>`` columns.

Reference: ``types/FloatVectorType.java:51`` — CrateDB's float_vector
with EUCLIDEAN similarity (``FloatVectorType.java:56``):
``vector_similarity(a, b) = 1 / (1 + l2_distance(a, b))``.

All implemented with JVM higher-order functions (zip_with/aggregate) —
vectorized by codegen, no Python in the row path. For the 100 TB
similarity-search path these run inside the scan stage; the kNN
operator on top (operators/knn.py) bounds the candidate set before any
shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Sum of elementwise products (double).

    Column-NAME arguments compile via ONE sql parse — each py4j lambda
    construction costs a socket round-trip, and plan-build time is part
    of every timed query (r11 optimization round). The parsed tree is
    the same zip_with/aggregate fold in the same order, so results are
    bit-identical to the Column form."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(
            f"aggregate(zip_with(`{a}`, `{b}`, "
            "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            "0.0D, (acc, x) -> acc + x)"
        )
    prods = F.zip_with(_col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_squared_sql(a: str, b: str) -> str:
    """The SQL text of the column-NAME ``l2_squared`` fast path — for
    callers that compile a whole pipeline into one ``spark.sql`` parse
    (r12: the routed-PQ batch). Same fold, bit-identical doubles."""
    return (
        f"aggregate(zip_with(`{a}`, `{b}`, "
        "(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) "
        "* (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        "0.0D, (acc, x) -> acc + x)"
    )


def l2_squared(a: Column | str, b: Column | str) -> Column:
    if isinstance(a, str) and isinstance(b, str):  # one parse (see dot_product)
        return F.expr(l2_squared_sql(a, b))
    diffs = F.zip_with(
        _col(a), _col(b), lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def l2_distance(a: Column | str, b: Column | str) -> Column:
    """Euclidean distance."""
    return F.sqrt(l2_squared(a, b))


def vector_similarity(a: Column | str, b: Column | str) -> Column:
    """CrateDB ``vector_similarity``: 1/(1+squareDistance) per
    ``FloatVectorType.java:56`` — Lucene's EUCLIDEAN
    VectorSimilarityFunction compares on the SQUARED distance (no
    sqrt), so the similarity denominator is 1 + d^2."""
    return F.lit(1.0) / (F.lit(1.0) + l2_squared(a, b))


def norm(a: Column | str) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity (LLM-pipeline extension; not in reference —
    reference only ships euclidean, SURVEY.md §2.10)."""
    return dot_product(a, b) / (norm(a) * norm(b))
