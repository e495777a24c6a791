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
#: The r7 window = scalar_math_funcs + vector_ann_pq + the 17
#: r2-stale greens + 31 r4 rows (all 50 came back green — the first
#: fully-green driver scoreboard). The r8 window = the new
#: dml_copy_roundtrip (first driver row) + the 18 remaining r4 rows
#: (mm_*, dml/ddl lifecycles, tf_*, match_*) + 31 of the 32 oldest r5
#: rows; pipeline_knn_quantized was displaced to r9 to make room.
#: The r9 window (below) = the 13 r5 remainders + 37 of the 49 r6
#: rows. The r10 window (below) = the 12 r6 rows left over
#: (sql_window_filter, join_q18/q16, scalar_blake3, sql_ident_surface,
#: the three sql_tvf_* rows, streaming_sessionize_events,
#: pipeline_train_split/quantize_int8/shard_layout), the FIRST driver
#: row for vector_ann_pq_routed (registered in r9, judge-oracle green
#: but never driver-checked), and the 37 alphabetically-first of the
#: 50 r7 rows. The r11 window (below) = the 13 remaining r7 rows
#: (vector_ann_pq..window_value_fns) + the 37 alphabetically-first of
#: the 50 r8 rows; the 13 r8 leftovers (scalar_object_funcs,
#: scalar_to_char, the 11 tf_* rows) were the r12 backlog. The r12
#: window (below) = those 13 r8 leftovers + the 37 alphabetically-
#: first of the 50 r9 rows (last checked in r9, the oldest coverage);
#: the 13 r9 leftovers (sql_array_subquery..union_distinct) are the
#: r13 backlog.
_DRIVER_PRIORITY = (
    "scalar_object_funcs",
    "scalar_to_char",
    "tf_empty_row",
    "tf_generate_series",
    "tf_generate_series_ts",
    "tf_generate_subscripts",
    "tf_pg_expandarray",
    "tf_pg_get_keywords",
    "tf_regexp_matches",
    "tf_srf_in_select",
    "tf_unnest",
    "tf_unnest_multi",
    "tf_values_relation",
    "agg_array_agg",
    "agg_geometric_mean",
    "agg_global",
    "agg_group_having",
    "agg_minmax_by",
    "agg_percentile",
    "agg_stats",
    "agg_string_agg",
    "conditional_agg",
    "count_star",
    "cte_query",
    "distinct_flags",
    "except_intersect",
    "interval_column_ops",
    "join_cross",
    "join_full_outer",
    "join_inner_multiway",
    "join_left_outer",
    "join_q5_regional_revenue",
    "join_right_outer",
    "limit_offset",
    "order_nulls_last",
    "pipeline_decontaminate",
    "pipeline_knn_quantized",
    "pipeline_repetition_metrics",
    "point_lookup",
    "q1_pricing_summary",
    "scalar_array_funcs2",
    "scalar_date_bin",
    "scalar_datetime_funcs",
    "scalar_regexp_funcs",
    "scalar_string_funcs",
    "scalar_string_funcs2",
    "scan_filter_project",
    "sql_agg_surface",
    "sql_array_fn_surface",
    "sql_array_numeric_fns",
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
