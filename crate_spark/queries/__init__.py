"""Oracle-checked query registry — the operator inventory.

Every operator claimed in SURVEY.md §2 lands here as a named query:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where the
semantics are ANSI-SQL-expressible) a DuckDB oracle SQL string over
the same parquet tables. The driver hash-compares the two at sf0.01.

Determinism rules used throughout (see SURVEY.md §7 "hard parts"):

- SUM/AVG over doubles are order-dependent at ~1e-12 relative error —
  enough to break a 12-significant-digit hash. We sum via
  DECIMAL(38,6) (exact, associative) in BOTH engines and cast the
  final value to DOUBLE.
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
#:
#: ORDER MATTERS for driver coverage: the correctness driver samples
#: the FIRST 50 registered queries each round, so modules rotate
#: round-over-round to give every query a driver row within a bounded
#: number of rounds. r1-r2 checked core/joins/windows/scalars[:4]
#: (all green); r3 front-loads the never-driver-checked modules —
#: sqlsurface..fulltext below sum to exactly 50. Next rotation (r4):
#: front-load geo, aggregates, scalars, then the r3 additions
#: (graphs, pipeline, sqlfns) — none of which have driver rows yet —
#: then core/joins/windows.
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
    # r3 additions — appended so the first-50 driver window above is
    # byte-stable; rotate them forward in r4.
    "graphs",
    "pipeline",
    "sqlfns",
)


def load_all() -> dict[str, QuerySpec]:
    """Import all query modules (side effect: fills REGISTRY)."""
    import importlib

    for mod in _MODULES:
        importlib.import_module(f"crate_spark.queries.{mod}")
    return REGISTRY
