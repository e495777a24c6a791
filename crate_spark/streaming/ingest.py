"""File-source streaming ingest + windowed rollup.

Scale notes: the file source lists new files per micro-batch
(maxFilesPerTrigger bounds batch size); the Parquet sink appends with
exactly-once bookkeeping via the checkpoint WAL. The windowed rollup
keeps state per (window, key) bounded by the watermark — late events
beyond it are dropped, which replaces the reference's
"INSERT then periodic refresh" visibility model with an explicit
correctness contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def stream_ingest(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    checkpoint_dir: str,
    schema_ddl: str,
    *,
    format: str = "json",
    available_now: bool = True,
) -> StreamingQuery:
    """INSERT-stream analog: json/csv files landing in ``src_dir``
    append into the Parquet table at ``dst_dir``.

    ``available_now=True`` drains everything currently present and
    stops (batch-refresh semantics, good for tests); False runs
    continuously with micro-batches.
    """
    reader = spark.readStream.schema(schema_ddl)
    src = reader.json(src_dir) if format == "json" else reader.csv(src_dir)
    writer = (
        src.writeStream.format("parquet")
        .option("path", dst_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_windowed_rollup(
    spark: SparkSession,
    src_dir: str,
    schema_ddl: str,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "15 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling-window aggregate over a streaming source — the
    streaming twin of the batch ``date_bin`` rollup
    (queries/scalars.py::scalar_date_bin). Returns the streaming
    DataFrame; callers attach a sink (tests use availableNow + memory).
    """
    src = spark.readStream.schema(schema_ddl).json(src_dir)
    # watermarks require TIMESTAMP (event-time), not TIMESTAMP_NTZ;
    # the session runs in UTC so the cast is value-preserving
    src = src.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        src.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col(value_col).cast("decimal(38,6)")).cast("double").alias("total"),
        )
        .select(F.col("win.start").alias("bucket"), "n", "total")
    )
