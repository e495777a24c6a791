"""Multimodal plumbing tests: binary columns, JVM mime sniffing,
mapInPandas decode (stubbed codec), resize math, frame sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from crate_spark.operators.multimodal import (
    attach_metadata,
    decode_batch,
    resize_images,
    sample_frames,
)

PNG = b"\x89PNG\r\n\x1a\n" + b"\x00" * 64
JPEG = b"\xff\xd8\xff\xe0" + b"\x01" * 32
WAV = b"RIFF" + b"\x02" * 16
JUNK = b"not a known format"


def _blobs(spark):
    return spark.createDataFrame(
        [(1, PNG), (2, JPEG), (3, WAV), (4, JUNK), (5, None)],
        "id bigint, content binary",
    )


def test_mime_sniff_jvm_side(spark):
    df = attach_metadata(_blobs(spark))
    got = {r["id"]: (r["meta"]["mime"], r["meta"]["n_bytes"]) for r in df.collect()}
    assert got[1] == ("image/png", len(PNG))
    assert got[2] == ("image/jpeg", len(JPEG))
    assert got[3] == ("audio/wav", len(WAV))
    assert got[4][0] == "application/octet-stream"
    assert got[5][0] is None  # NULL content -> NULL meta fields
    # filter by mime must not involve Python (plan has no ArrowEval/PythonUDF)
    plan = df.filter(F.col("meta.mime") == "image/png")._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan


def test_decode_batch_schema_and_determinism(spark):
    out = decode_batch(_blobs(spark))
    assert out.schema.simpleString() == (
        "struct<id:bigint,mime:string,width:int,height:int,channels:int,feat:array<double>>"
    )
    a = {r["id"]: r for r in out.collect()}
    b = {r["id"]: r for r in decode_batch(_blobs(spark)).collect()}
    assert all(a[k] == b[k] for k in a), "stub decode must be deterministic"
    assert a[1]["width"] >= 64 and a[1]["channels"] == 3
    assert len(a[1]["feat"]) == 8
    assert a[5]["width"] is None  # NULL content passes through as NULLs


def test_resize_clamps_long_side(spark):
    decoded = decode_batch(_blobs(spark))
    resized = {r["id"]: r for r in resize_images(decoded, max_side=100).collect()}
    orig = {r["id"]: r for r in decoded.collect()}
    for k in (1, 2, 3, 4):
        assert max(resized[k]["width"], resized[k]["height"]) <= 100
        # aspect ratio preserved within rounding
        r0 = orig[k]["width"] / orig[k]["height"]
        r1 = resized[k]["width"] / resized[k]["height"]
        assert abs(r0 - r1) < 0.1


def test_sample_frames(spark):
    vids = spark.createDataFrame(
        [(1, 3500), (2, 900), (3, 0)], "id bigint, duration_ms bigint"
    )
    rows = sample_frames(vids, every_n_ms=1000).collect()
    per = {}
    for r in rows:
        per.setdefault(r["id"], []).append(r["frame_ts_ms"])
    assert sorted(per[1]) == [0, 1000, 2000, 3000]
    assert sorted(per[2]) == [0]
    assert sorted(per[3]) == [0]
