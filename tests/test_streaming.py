"""Streaming ingest smoke tests: file-source -> parquet sink visibility
(the reference's INSERT + REFRESH analog) and watermarked windowed
rollup."""

from __future__ import annotations

import json

from crate_spark.streaming import stream_ingest, stream_windowed_rollup

SCHEMA = "id bigint, ts timestamp_ntz, value double"


def _write_batch(src, name, rows):
    with open(f"{src}/{name}.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stream_ingest_visibility(spark, tmp_path):
    src, dst, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    (tmp_path / "in").mkdir()
    _write_batch(src, "b1", [{"id": 1, "ts": "2024-01-01 00:01:00", "value": 1.5},
                             {"id": 2, "ts": "2024-01-01 00:02:00", "value": 2.5}])
    q = stream_ingest(spark, src, dst, ckpt, SCHEMA)
    q.awaitTermination(60)
    assert spark.read.parquet(dst).count() == 2

    # second batch lands -> next drain makes it visible (REFRESH analog);
    # the checkpoint prevents re-ingesting b1 (exactly-once)
    _write_batch(src, "b2", [{"id": 3, "ts": "2024-01-01 00:20:00", "value": 3.0}])
    q2 = stream_ingest(spark, src, dst, ckpt, SCHEMA)
    q2.awaitTermination(60)
    df = spark.read.parquet(dst)
    assert df.count() == 3
    assert sorted(r["id"] for r in df.collect()) == [1, 2, 3]


def test_stream_windowed_rollup(spark, tmp_path):
    src = str(tmp_path / "in")
    (tmp_path / "in").mkdir()
    _write_batch(src, "b1", [
        {"id": 1, "ts": "2024-01-01 00:01:00", "value": 1.0},
        {"id": 2, "ts": "2024-01-01 00:14:00", "value": 2.0},
        {"id": 3, "ts": "2024-01-01 00:16:00", "value": 10.0},
    ])
    agg = stream_windowed_rollup(spark, src, SCHEMA)
    q = (
        agg.writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {str(r["bucket"]): (r["n"], r["total"]) for r in spark.sql(
        "SELECT * FROM rollup_test").collect()}
    assert rows["2024-01-01 00:00:00"] == (2, 3.0)
    assert rows["2024-01-01 00:15:00"] == (1, 10.0)
