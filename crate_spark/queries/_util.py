"""Shared expression helpers for oracle-deterministic numerics.

Double-precision SUM/AVG are order-dependent; across Spark's shuffle
order vs DuckDB's scan order the results can differ around the 12th
significant digit — exactly the driver's hash granularity. Summing via
a fixed-scale DECIMAL is exact and associative, so both engines agree
bit-for-bit after the final cast to DOUBLE. (SURVEY.md §7 hard part (b).)

Precision choice: decimal(27,6) = 21 integer digits of headroom. The
largest monetary group sum in TPC-H at ~100 TB (sf≈100k: 1.5e11
lineitems/group x ~1e5 avg extendedprice) is ~1e16, five orders below
the cap, while narrower decimals measurably beat decimal(38,6) in
whole-stage codegen (q1 sf0.1 median 1.43s -> 1.09s; values identical).
The double->decimal cast rounds the same way at either precision, so
oracle hashes are unchanged. (A long-cents encoding is ~2x faster still
but overflows int64 near sf50 — rejected for the scale contract.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(27,6)"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dsum(c: Column | str) -> Column:
    """Order-independent SUM over doubles: sum(cast(x as dec)) :: double."""
    return F.sum(_col(c).cast(DEC)).cast("double")


def davg(c: Column | str) -> Column:
    """Order-independent AVG: cast(sum(dec) as double) / count(x)."""
    col = _col(c)
    return F.sum(col.cast(DEC)).cast("double") / F.count(col)


def sql_dsum(expr: str) -> str:
    """DuckDB/Spark-SQL spelling of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB/Spark-SQL spelling of :func:`davg`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE) / COUNT({expr})"


def epoch_us(c: Column | str) -> Column:
    """Epoch microseconds of a TIMESTAMP_NTZ column (session tz is UTC)."""
    return F.unix_micros(_col(c).cast("timestamp"))
