"""Multimodal columns: images/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

LLM-pipeline extension (BASELINE north star; no reference analog —
CrateDB stores blobs out-of-band, ``server/src/main/java/io/crate/blob/``,
and cannot process them). Convention:

    content   binary           -- the encoded object
    meta      struct<mime string, n_bytes bigint, extra map<string,string>>

The Spark-side plumbing (schema, partitioning, UDF signature, Arrow
batch shape) is real and tested. The codec step comes in two tiers:
``decode_media`` REALLY decodes every format the container can handle
without codec libraries — WAV/PCM audio (stdlib ``wave``), P6 PPM and
uncompressed BMP images (numpy) — producing true dimensions,
durations and signal statistics; formats needing PIL/soundfile/PyAV
(JPEG/PNG/MP3/MP4) surface as kind='unsupported', never as fakes.
``_decode_stub`` (the deterministic hash fake) remains solely as the
DuckDB-reproducible oracle path that hash-proves the Arrow
mapInPandas plumbing end-to-end.

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
    "5036": "image/x-portable-pixmap",  # P6
    "5035": "image/x-portable-graymap",  # P5
    "424d": "image/bmp",  # BM
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


# -- real decoders (stdlib + numpy only; no external codec libs) --------

def decode_media(content: bytes | None) -> dict:
    """REAL decode for the formats this container can handle without
    codec libraries: WAV/PCM audio (stdlib ``wave``), P6 PPM and
    uncompressed 24-bit BMP images (numpy). JPEG/PNG/MP3/MP4 need
    PIL/soundfile/PyAV — those return kind='unsupported' with the
    mime recorded, never a fake value.

    Output keys: kind (image|audio|unsupported|error), width, height,
    channels, duration_ms, sample_rate, feat (image: per-channel pixel
    means + global std; audio: rms/peak/zero-crossing-rate), error.
    """
    import struct as _struct
    import numpy as _np

    none = dict.fromkeys(
        ("width", "height", "channels", "duration_ms", "sample_rate",
         "n_frames", "feat", "error")
    )
    if content is None:
        return {**none, "kind": None}
    try:
        if content[:6] in (b"GIF87a", b"GIF89a"):
            # GIF: logical screen descriptor + block walk. Frame count
            # = image descriptors; total delay from graphic control
            # extensions. Metadata-only — LZW pixel data is skipped,
            # not decompressed.
            w, h = _struct.unpack_from("<HH", content, 6)
            packed = content[10]
            idx = 13
            if packed & 0x80:
                idx += 3 * (2 ** ((packed & 7) + 1))
            frames, delay_cs = 0, 0
            while idx < len(content):
                block = content[idx]
                idx += 1
                if block == 0x3B:  # trailer
                    break
                if block == 0x21:  # extension
                    label = content[idx]
                    idx += 1
                    if label == 0xF9 and content[idx] >= 4:
                        delay_cs += _struct.unpack_from("<H", content, idx + 2)[0]
                    while idx < len(content) and content[idx] != 0:
                        idx += content[idx] + 1
                    idx += 1
                elif block == 0x2C:  # image descriptor
                    frames += 1
                    lpacked = content[idx + 8]
                    idx += 9
                    if lpacked & 0x80:
                        idx += 3 * (2 ** ((lpacked & 7) + 1))
                    idx += 1  # LZW minimum code size
                    while idx < len(content) and content[idx] != 0:
                        idx += content[idx] + 1
                    idx += 1
                else:
                    break
            return {**none, "kind": "video" if frames > 1 else "image",
                    "width": int(w), "height": int(h), "channels": 3,
                    "n_frames": frames or None,
                    "duration_ms": delay_cs * 10 if frames > 1 else None}
        if content[:8] == b"\x89PNG\r\n\x1a\n":
            # PNG: REAL decode for the common shape (8-bit depth,
            # gray/RGB/RGBA, non-interlaced) using stdlib zlib +
            # numpy row unfiltering — no codec library. Filters 0/2
            # (none/up) vectorize; 1 (sub) is a per-channel cumsum mod
            # 256; 3/4 (avg/paeth) fall back to a per-row loop. Other
            # shapes (16-bit, palette, interlaced) return header
            # metadata with feat=None — real dims, never fake pixels.
            import zlib as _zlib

            idx, w = 8, None
            idat = b""
            while idx + 8 <= len(content):
                ln, typ = _struct.unpack_from(">I4s", content, idx)
                data = content[idx + 8 : idx + 8 + ln]
                if typ == b"IHDR":
                    w, h, bitd, ctype, _c, _f, interlace = _struct.unpack(
                        ">IIBBBBB", data
                    )
                elif typ == b"IDAT":
                    idat += data
                elif typ == b"IEND":
                    break
                idx += 12 + ln
            if w is None:
                return {**none, "kind": "error", "error": "png missing IHDR"}
            channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
            meta = {**none, "kind": "image", "width": int(w), "height": int(h),
                    "channels": channels, "n_frames": 1}
            if bitd != 8 or ctype not in (0, 2, 4, 6) or interlace != 0:
                return meta
            stride = w * channels
            raw = _np.frombuffer(_zlib.decompress(idat), _np.uint8)
            rows = raw.reshape(h, stride + 1)
            ftypes, data_rows = rows[:, 0], rows[:, 1:]
            out = _np.zeros((h, stride), _np.uint8)
            zero = _np.zeros(stride, _np.int16)
            for y in range(h):
                f, cur = int(ftypes[y]), data_rows[y].astype(_np.int16)
                prev = out[y - 1].astype(_np.int16) if y else zero
                if f == 0:
                    rec = cur
                elif f == 2:  # up
                    rec = (cur + prev) & 0xFF
                elif f == 1:  # sub: per-channel prefix sum mod 256
                    rec = _np.cumsum(
                        cur.reshape(w, channels), axis=0, dtype=_np.int64
                    ).reshape(stride) & 0xFF
                else:  # avg / paeth: sequential left-dependency
                    rec = _np.empty(stride, _np.int16)
                    for x in range(stride):
                        a = int(rec[x - channels]) if x >= channels else 0
                        b = int(prev[x])
                        c = int(prev[x - channels]) if x >= channels else 0
                        if f == 3:
                            pred = (a + b) // 2
                        else:
                            p = a + b - c
                            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                            pred = a if pa <= pb and pa <= pc else (
                                b if pb <= pc else c
                            )
                        rec[x] = (int(cur[x]) + pred) & 0xFF
                out[y] = rec.astype(_np.uint8)
            px = out.reshape(h, w, channels).astype(_np.float64) / 255.0
            feat = [float(px[:, :, c].mean()) for c in range(channels)] + [
                float(px.std())
            ]
            return {**meta, "feat": feat}
        if content[:2] == b"\xff\xd8":
            # JPEG: header-only metadata from the SOF marker (real
            # dims/channels; DCT pixel decode needs a codec library,
            # so feat stays None — never fake)
            idx = 2
            while idx + 4 <= len(content):
                if content[idx] != 0xFF:
                    idx += 1
                    continue
                marker = content[idx + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    idx += 2
                    continue
                ln = _struct.unpack_from(">H", content, idx + 2)[0]
                if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0-3
                    h, w = _struct.unpack_from(">HH", content, idx + 5)
                    nch = content[idx + 9]
                    return {**none, "kind": "image", "width": int(w),
                            "height": int(h), "channels": int(nch),
                            "n_frames": 1}
                if marker == 0xDA:  # start of scan: no SOF seen
                    break
                idx += 2 + ln
            return {**none, "kind": "unsupported", "error": "jpeg without SOF"}
        if content[:2] == b"P5":
            # PGM P5: grayscale sibling of P6
            parts, idx, token = [], 2, b""
            while len(parts) < 3 and idx < len(content):
                ch = content[idx:idx + 1]
                idx += 1
                if ch == b"#":
                    while idx < len(content) and content[idx:idx + 1] != b"\n":
                        idx += 1
                    continue
                if ch.isspace():
                    if token:
                        parts.append(int(token))
                        token = b""
                else:
                    token += ch
            w, h, _maxval = parts
            px = _np.frombuffer(
                content[idx:idx + w * h], dtype=_np.uint8
            ).reshape(h, w).astype(_np.float64) / 255.0
            return {**none, "kind": "image", "width": w, "height": h,
                    "channels": 1, "n_frames": 1,
                    "feat": [float(px.mean()), float(px.std())]}
        if content[:2] == b"P6":
            # PPM P6: "P6\n<w> <h>\n<maxval>\n<raw RGB>"
            parts, idx, token = [], 2, b""
            while len(parts) < 3 and idx < len(content):
                ch = content[idx:idx + 1]
                idx += 1
                if ch == b"#":  # comment to end of line
                    while idx < len(content) and content[idx:idx + 1] != b"\n":
                        idx += 1
                    continue
                if ch.isspace():
                    if token:
                        parts.append(int(token))
                        token = b""
                else:
                    token += ch
            w, h, _maxval = parts
            px = _np.frombuffer(
                content[idx:idx + w * h * 3], dtype=_np.uint8
            ).reshape(h, w, 3).astype(_np.float64) / 255.0
            feat = [float(px[:, :, c].mean()) for c in range(3)] + [float(px.std())]
            return {**none, "kind": "image", "width": w, "height": h,
                    "channels": 3, "n_frames": 1, "feat": feat}
        if content[:2] == b"BM":
            # BMP: 24-bit uncompressed BITMAPINFOHEADER
            off, = _struct.unpack_from("<I", content, 10)
            w, h = _struct.unpack_from("<ii", content, 18)
            bpp, = _struct.unpack_from("<H", content, 28)
            comp, = _struct.unpack_from("<I", content, 30)
            if bpp != 24 or comp != 0:
                return {**none, "kind": "unsupported",
                        "error": f"bmp bpp={bpp} compression={comp}"}
            h_abs = abs(h)
            row_bytes = (w * 3 + 3) & ~3  # rows pad to 4 bytes
            rows = _np.frombuffer(
                content[off:off + row_bytes * h_abs], dtype=_np.uint8
            ).reshape(h_abs, row_bytes)[:, : w * 3].reshape(h_abs, w, 3)
            if h > 0:
                rows = rows[::-1]  # bottom-up storage
            px = rows[..., ::-1].astype(_np.float64) / 255.0  # BGR->RGB
            feat = [float(px[:, :, c].mean()) for c in range(3)] + [float(px.std())]
            return {**none, "kind": "image", "width": w, "height": h_abs,
                    "channels": 3, "n_frames": 1, "feat": feat}
        if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
            import io
            import wave as _wave

            with _wave.open(io.BytesIO(content)) as wf:
                n, sr, ch = wf.getnframes(), wf.getframerate(), wf.getnchannels()
                width = wf.getsampwidth()
                raw = wf.readframes(n)
            dt = {1: _np.uint8, 2: _np.int16, 4: _np.int32}.get(width)
            if dt is None:
                return {**none, "kind": "unsupported",
                        "error": f"wav sample width {width}"}
            x = _np.frombuffer(raw, dtype=dt).astype(_np.float64)
            if width == 1:
                x -= 128.0
            x /= float(2 ** (8 * width - 1))
            if ch > 1:
                x = x.reshape(-1, ch).mean(axis=1)  # downmix
            zcr = float((_np.diff(_np.signbit(x)) != 0).mean()) if x.size > 1 else 0.0
            feat = [float(_np.sqrt((x ** 2).mean())) if x.size else 0.0,
                    float(_np.abs(x).max()) if x.size else 0.0, zcr]
            return {**none, "kind": "audio", "channels": ch,
                    "duration_ms": int(n * 1000 / sr), "sample_rate": sr,
                    "feat": feat}
        return {**none, "kind": "unsupported"}
    except Exception as e:  # malformed container: typed error, no crash
        return {**none, "kind": "error", "error": str(e)[:200]}


MEDIA_SCHEMA = (
    "id bigint, mime string, kind string, width int, height int, "
    "channels int, duration_ms bigint, sample_rate int, n_frames int, "
    "feat array<double>, error string"
)


def decode_media_batch(
    df: DataFrame, *, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """mapInPandas over Arrow batches with the REAL decoders
    (decode_media): WAV/PPM/BMP produce true dimensions, durations and
    signal features; codec-library formats surface as
    kind='unsupported' rather than fakes. Same plan shape as
    decode_batch — metadata sniff stays JVM-side."""
    src = attach_metadata(df, content_col).select(
        F.col(id_col).alias("id"),
        F.col(content_col).alias("_c"),
        F.col("meta.mime").alias("mime"),
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from crate_spark.operators.multimodal import decode_media

        for pdf in batches:
            d = [decode_media(c) for c in pdf["_c"]]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "mime": pdf["mime"],
                    **{
                        k: [row[k] for row in d]
                        for k in ("kind", "width", "height", "channels",
                                  "duration_ms", "sample_rate", "n_frames",
                                  "feat", "error")
                    },
                }
            )

    return src.mapInPandas(_decode, MEDIA_SCHEMA)


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
