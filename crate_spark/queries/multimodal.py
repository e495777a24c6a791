"""Multimodal pipeline queries: mime sniffing, decode+feature
extraction (stubbed codec, real Arrow plumbing), resize planning and
frame sampling — driver-checked where expressible.

The decode stub is DETERMINISTIC (sha256-derived dims/features,
operators/multimodal.py), so the whole mapInPandas path has an exact
DuckDB twin: the oracle recomputes the stub's arithmetic from
sha256 hex. The magic prefixes used here (GIF8, RIFF) are pure ASCII,
so both engines hash identical bytes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crate_spark.operators.multimodal import (
    attach_metadata,
    decode_batch,
    resize_images,
    sample_frames,
)
from crate_spark.queries import query
from crate_spark.session import load_tables

#: DuckDB: value of hex digit i (1-based) of lower(sha256(x))
_D = "(strpos('0123456789abcdef', substr(sha, {i}, 1)) - 1)"
_H0 = f"(16 * {_D.format(i=1)} + {_D.format(i=2)})"
_H1 = f"(16 * {_D.format(i=3)} + {_D.format(i=4)})"


def _content_sql() -> str:
    return (
        "CASE doc_id % 3 WHEN 0 THEN 'GIF8' || text "
        "WHEN 1 THEN 'RIFF' || text ELSE text END"
    )


def _content_col() -> F.Column:
    return (
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit("GIF8"), F.col("text")))
        .when(F.col("doc_id") % 3 == 1, F.concat(F.lit("RIFF"), F.col("text")))
        .otherwise(F.col("text"))
        .cast("binary")
    )


@query(
    "mm_decode_features",
    oracle=f"""
    WITH src AS (
      SELECT doc_id,
             {_content_sql()} AS content,
             lower(sha256({_content_sql()})) AS sha
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image/gif'
                           WHEN 1 THEN 'audio/wav'
                           ELSE 'application/octet-stream' END AS mime,
           64 + {_H0} % 192 AS width,
           64 + {_H1} % 192 AS height,
           3 AS channels,
           ROUND({_H0} / 255.0, 6) AS feat0
    FROM src
    """,
)
def mm_decode_features(spark, sf_dir):
    """Multimodal decode + feature extraction end-to-end: JVM mime
    sniffing (magic prefixes; filters never reach Python) and the
    Arrow-batched mapInPandas decode producing dims + a feature vector.
    The codec is the declared deterministic stub — the oracle
    recomputes its sha256 arithmetic, so a hash match proves the whole
    Spark-side plumbing (binary column, batch shape, schema) exact."""
    t = load_tables(spark, sf_dir)
    d = t["documents"].filter(F.col("doc_id") < 200).select(
        "doc_id", _content_col().alias("content")
    )
    decoded = decode_batch(d, id_col="doc_id", content_col="content")
    return decoded.select(
        F.col("id").alias("doc_id"),
        "mime",
        "width",
        "height",
        "channels",
        F.round(F.element_at("feat", 1), 6).alias("feat0"),
    )


@query(
    "mm_resize_plan",
    oracle=f"""
    WITH src AS (
      SELECT doc_id, lower(sha256({_content_sql()})) AS sha
      FROM documents WHERE doc_id < 200
    ),
    dims AS (
      SELECT doc_id,
             64 + {_H0} % 192 AS w,
             64 + {_H1} % 192 AS h
      FROM src
    )
    SELECT doc_id,
           CAST(ROUND(w * LEAST(1.0, 100.0 / GREATEST(w, h))) AS INTEGER) AS width,
           CAST(ROUND(h * LEAST(1.0, 100.0 / GREATEST(w, h))) AS INTEGER) AS height
    FROM dims
    """,
)
def mm_resize_plan(spark, sf_dir):
    """Aspect-preserving resize planning (clamp longest side to 100):
    the dimension arithmetic is JVM-side; only the pixel resample
    belongs in the decode UDF."""
    t = load_tables(spark, sf_dir)
    d = t["documents"].filter(F.col("doc_id") < 200).select(
        "doc_id", _content_col().alias("content")
    )
    decoded = decode_batch(d, id_col="doc_id", content_col="content")
    return resize_images(decoded, max_side=100).select(
        F.col("id").alias("doc_id"), "width", "height"
    )


@query(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id,
           UNNEST(generate_series(0, CAST(n_chars AS BIGINT), 500)) AS frame_ts_ms
    FROM documents WHERE doc_id < 50
    """,
)
def mm_frame_sample(spark, sf_dir):
    """Video frame-sampling plan: one row per sampled timestamp
    (sequence+explode, JVM-side) with n_chars standing in for
    duration_ms on this corpus."""
    t = load_tables(spark, sf_dir)
    d = t["documents"].filter(F.col("doc_id") < 50).select(
        F.col("doc_id"), F.col("n_chars").alias("duration_ms")
    )
    return sample_frames(d, every_n_ms=500, id_col="doc_id").select(
        F.col("id").alias("doc_id"), "frame_ts_ms"
    )


@query(
    "mm_mime_filter_pushdown",
    oracle=f"""
    SELECT doc_id, octet_length(encode({_content_sql()})) AS n_bytes
    FROM documents
    WHERE doc_id < 300 AND doc_id % 3 = 0
    """,
)
def mm_mime_filter_pushdown(spark, sf_dir):
    """Filter by sniffed mime type — the predicate is a JVM hex-prefix
    compare (attach_metadata), so mime pruning never invokes Python;
    the oracle selects the same rows by construction."""
    t = load_tables(spark, sf_dir)
    d = t["documents"].filter(F.col("doc_id") < 300).select(
        "doc_id", _content_col().alias("content")
    )
    with_meta = attach_metadata(d, "content")
    return with_meta.filter(F.col("meta.mime") == "image/gif").select(
        "doc_id", F.col("meta.n_bytes").alias("n_bytes")
    )


@query(
    "mm_decode_real_image",
    oracle="""
    SELECT doc_id,
           'image' AS kind,
           8 AS width, 6 AS height, 3 AS channels,
           ROUND((doc_id % 256) / 255.0, 6) AS r_mean,
           ROUND(((doc_id * 7) % 256) / 255.0, 6) AS g_mean,
           ROUND(((doc_id * 13) % 256) / 255.0, 6) AS b_mean
    FROM documents WHERE doc_id < 100
    """,
)
def mm_decode_real_image(spark, sf_dir):
    """REAL image decoding, oracle-checked: an 8x6 P6 PPM is
    constructed per row JVM-side (header + unhex'd RGB bytes derived
    from doc_id), decoded by the real numpy decoder
    (operators/multimodal.decode_media — not the stub), and the
    recovered dimensions and per-channel pixel means must equal the
    constructing arithmetic. Proves actual pixel decoding end-to-end
    through Arrow mapInPandas."""
    from crate_spark.operators.multimodal import decode_media_batch

    t = load_tables(spark, sf_dir)
    rgb_hex = F.concat(
        F.lpad(F.hex(F.col("doc_id") % 256), 2, "0"),
        F.lpad(F.hex((F.col("doc_id") * 7) % 256), 2, "0"),
        F.lpad(F.hex((F.col("doc_id") * 13) % 256), 2, "0"),
    )
    content = F.concat(
        F.encode(F.lit("P6\n8 6\n255\n"), "UTF-8"),
        F.unhex(F.repeat(rgb_hex, 48)),  # 8*6 identical pixels
    )
    d = t["documents"].filter(F.col("doc_id") < 100).select(
        "doc_id", content.alias("content")
    )
    decoded = decode_media_batch(d, id_col="doc_id", content_col="content")
    return decoded.select(
        F.col("id").alias("doc_id"),
        "kind", "width", "height", "channels",
        F.round(F.element_at("feat", 1), 6).alias("r_mean"),
        F.round(F.element_at("feat", 2), 6).alias("g_mean"),
        F.round(F.element_at("feat", 3), 6).alias("b_mean"),
    )
