"""Oracle-checked query registry — the operator inventory.

Every operator claimed in SURVEY.md §2 lands here as a named query:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where the
semantics are ANSI-SQL-expressible) a DuckDB oracle SQL string over
the same parquet tables. The driver hash-compares the two at sf0.01.

Determinism rules used throughout (see SURVEY.md §7 "hard parts"):

- SUM/AVG over doubles are order-dependent at ~1e-12 relative error —
  enough to break a 12-significant-digit hash. We sum via a
  fixed-scale DECIMAL (exact, associative; width rationale in
  `_util.DEC`) in BOTH engines and cast the final value to DOUBLE.
- Window/ranking queries always carry a unique tiebreaker column in
  ORDER BY so top-k cuts are deterministic.
- Transcendental outputs (stddev, ln, geometric mean, distances) are
  rounded to ≤6 decimals in BOTH engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None):
    """Register an operator query; used as a decorator."""

    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


#: Query modules making up the operator inventory; each import
#: registers its queries into REGISTRY via the @query decorator.
_MODULES = (
    "sqlsurface",
    "vectors",
    "text",
    "timeseries",
    "predicates",
    "multimodal",
    "dml_lifecycle",
    "tablefns",
    "fulltext",
    "geo",
    "aggregates",
    "scalars",
    "core",
    "joins",
    "windows",
    "graphs",
    "pipeline",
    "sqlfns",
)

#: ORDER MATTERS for driver coverage: the correctness driver samples
#: the FIRST 50 registered queries each round, so the registry is
#: reordered per round to give every query a driver row within a
#: bounded number of rounds. History: r1-r2 checked
#: core/joins/windows/scalars[:4]; r3-r4 checked sqlsurface..fulltext;
#: r5 checked geo/aggregates/scalars-rest/graphs/pipeline/sqlfns.
#: The r7 window = scalar_math_funcs (the r6 red, now fixed: the
#: ceil/floor/sign type-FAMILY alignment — see the cross-engine family
#: lint in tests/test_oracle_types.py that closes this defect class
#: for good) + vector_ann_pq (added r6, never driver-checked,
#: rows-only by design) + the 17 r2-stale greens (joins/windows tail)
#: + 31 of the 49 longest-unchecked r4 rows. After r7 every query's
#: newest driver row is ≤3 rounds old except the 18 r4 remainders
#: (mm_*, dml/ddl, tf_*, match_*) and the 44 r5 rows — those are the
#: r8 window.
_DRIVER_PRIORITY = (
    "scalar_math_funcs",
    "vector_ann_pq",
    # 17 r2-stale greens
    "join_semi",
    "join_anti",
    "join_non_equi",
    "join_lookup",
    "join_in_subquery_negated",
    "join_self",
    "join_q10_returned_items",
    "window_ranking",
    "window_topk_per_group",
    "window_lag_lead",
    "window_value_fns",
    "window_running_sum",
    "window_moving_avg",
    "window_range_frame",
    "window_global_share",
    "window_surplus_distribution",
    "window_agg_as_window",
    # 31 longest-unchecked r4 rows
    "sql_object_subscript",
    "sql_sys_columns",
    "sql_match_score",
    "pred_any_subquery",
    "vector_knn_exact",
    "vector_similarity_score",
    "vector_ann_lsh",
    "vector_ann_ivf",
    "embedding_neardup_cosine",
    "text_stats",
    "text_langid",
    "text_quality",
    "text_fingerprint",
    "text_dedup_exact",
    "text_ngram_jaccard",
    "text_minhash_lsh",
    "text_simhash",
    "ts_gap_detection",
    "ts_zero_filled_series",
    "ts_topk_event_values",
    "ts_ndv_users",
    "ts_lttb_downsample",
    "pred_three_valued_logic",
    "pred_is_distinct_from",
    "pred_any_all_array",
    "pred_any_like_range",
    "pred_like_ilike_regex",
    "pred_between_in",
    "pred_cidr_containment",
    "mm_decode_features",
    "mm_resize_plan",
)


def load_all() -> dict[str, QuerySpec]:
    """Import all query modules (side effect: fills REGISTRY), then
    reorder so the driver's first-50 correctness window covers
    ``_DRIVER_PRIORITY`` (see note above)."""
    import importlib

    for mod in _MODULES:
        importlib.import_module(f"crate_spark.queries.{mod}")
    ordered = [n for n in _DRIVER_PRIORITY if n in REGISTRY] + [
        n for n in REGISTRY if n not in set(_DRIVER_PRIORITY)
    ]
    reordered = {n: REGISTRY[n] for n in ordered}
    REGISTRY.clear()
    REGISTRY.update(reordered)
    return REGISTRY
