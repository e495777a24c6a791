"""Streaming ingest — the Structured Streaming analog of CrateDB's
"real-time" story.

The reference is NOT a stream processor (SURVEY.md §2.10): its
real-time surface is high-rate INSERT with near-real-time read
visibility after a Lucene refresh. The Spark-native analog is a file/
rate source streamed into the Parquet table directory — new data
becomes queryable at the next micro-batch, which IS the refresh
interval. On top of that, Structured Streaming gives the windowed
rollup (date_bin's streaming twin) with watermarked late-data
handling as free surplus.
"""

from crate_spark.streaming.ingest import (  # noqa: F401
    stream_dedup,
    stream_enrich,
    stream_ingest,
    stream_quality_gate,
    sessionize_stream,
    stream_sessionize,
    stream_windowed_rollup,
)
