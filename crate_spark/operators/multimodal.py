"""Multimodal columns: images/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

LLM-pipeline extension (BASELINE north star; no reference analog —
CrateDB stores blobs out-of-band, ``server/src/main/java/io/crate/blob/``,
and cannot process them). Convention:

    content   binary           -- the encoded object
    meta      struct<mime string, n_bytes bigint, extra map<string,string>>

The Spark-side plumbing (schema, partitioning, UDF signature, Arrow
batch shape) is real and tested; the actual codec step is STUBBED —
image/audio libraries are not in this container — behind
``_decode_stub``, a deterministic fake keyed on the content hash.
Swapping in PIL/torchaudio/PyAV is a one-function change and does not
alter any plan shape.

Scale notes: mapInPandas streams Arrow batches — memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of blob
size skew; decode parallelism is partition parallelism (repartition
upstream if blobs are few-but-huge). Metadata sniffing stays JVM-side
so pruning/filtering by mime never touches Python.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: magic-number prefixes -> mime (JVM-side sniffing via hex compare)
_MAGIC = {
    "89504e47": "image/png",
    "ffd8ff": "image/jpeg",
    "47494638": "image/gif",
    "52494646": "audio/wav",  # RIFF
    "494433": "audio/mpeg",  # ID3
    "000000": "video/mp4",  # ftyp boxes (loose)
}


def sniff_mime(content) -> F.Column:
    """Magic-number mime sniff — pure JVM (hex prefix compare), so a
    ``WHERE meta.mime = 'image/png'`` filter never reaches Python."""
    col = F.col(content) if isinstance(content, str) else content
    prefix = F.lower(F.hex(F.substring(col, 1, 4)))
    out = F.lit("application/octet-stream")
    expr = None
    for magic, mime in _MAGIC.items():
        cond = prefix.startswith(magic)
        expr = F.when(cond, mime) if expr is None else expr.when(cond, mime)
    # NULL content -> NULL mime (the bare otherwise() would fire on NULL)
    return F.when(col.isNotNull(), expr.otherwise(out))


def attach_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Add the typed ``meta`` struct from the raw binary column."""
    c = F.col(content_col)
    return df.withColumn(
        "meta",
        F.struct(
            sniff_mime(c).alias("mime"),
            F.length(c).cast("bigint").alias("n_bytes"),
            F.create_map().cast("map<string,string>").alias("extra"),
        ),
    )


def _decode_stub(content: bytes) -> dict:
    """STUB decoder (no image/audio libs in this container).

    Deterministic fake: derives "decoded" dimensions and a channel-mean
    vector from the content hash. Replace with PIL.Image.open /
    soundfile.read for real decoding — signature and output schema are
    the contract.
    """
    if content is None:
        return {"width": None, "height": None, "channels": None, "feat": None}
    h = hashlib.sha256(content).digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "channels": 3,
        "feat": [b / 255.0 for b in h[:8]],
    }


DECODED_SCHEMA = (
    "id bigint, mime string, width int, height int, channels int, feat array<double>"
)


def decode_batch(
    df: DataFrame, *, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    Output: (id, mime, width, height, channels, feat) — the schema a
    real decoder would produce; only ``_decode_stub`` is fake.
    """
    src = attach_metadata(df, content_col).select(
        F.col(id_col).alias("id"), F.col(content_col).alias("_c"), F.col("meta.mime").alias("mime")
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # the decoder is re-declared inside the closure so cloudpickle
        # serializes it BY VALUE — executors do not need crate_spark on
        # PYTHONPATH (a module-level reference pickles by import path
        # and fails on bare workers); swap this body for PIL/soundfile
        # for real decoding
        import hashlib as _hl

        def decode_one(content):
            if content is None:
                return {"width": None, "height": None, "channels": None, "feat": None}
            h = _hl.sha256(content).digest()
            return {
                "width": 64 + h[0] % 192,
                "height": 64 + h[1] % 192,
                "channels": 3,
                "feat": [b / 255.0 for b in h[:8]],
            }

        for pdf in batches:
            decoded = [decode_one(c) for c in pdf["_c"]]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "mime": pdf["mime"],
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "channels": [d["channels"] for d in decoded],
                    "feat": [d["feat"] for d in decoded],
                }
            )

    return src.mapInPandas(_decode, DECODED_SCHEMA)


def resize_images(
    decoded: DataFrame, max_side: int = 224
) -> DataFrame:
    """Resize plan step: computes target dims JVM-side (aspect-preserving
    clamp to ``max_side``); the pixel resample would live in the same
    mapInPandas as decode in a real pipeline."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return decoded.select(
        "id",
        "mime",
        F.round(F.col("width") * scale).cast("int").alias("width"),
        F.round(F.col("height") * scale).cast("int").alias("height"),
        "channels",
        "feat",
    )


def sample_frames(
    df: DataFrame, every_n_ms: int = 1000, *, id_col: str = "id",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (sequence+explode — JVM-side; the actual frame grab is
    the stubbed decode step applied per (id, frame_ts))."""
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.sequence(F.lit(0), F.col(duration_col).cast("bigint"), F.lit(every_n_ms))
        ).alias("frame_ts_ms"),
    )
