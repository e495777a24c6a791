"""Shared expression helpers for oracle-deterministic numerics.

Double-precision SUM/AVG are order-dependent; across Spark's shuffle
order vs DuckDB's scan order the results can differ around the 12th
significant digit — exactly the driver's hash granularity. Summing via
DECIMAL(38,6) is exact and associative, so both engines agree bit-for-bit
after the final cast to DOUBLE. (SURVEY.md §7 hard part (b).)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


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
