"""Semantics tests for approximate/py-UDF time-series operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from crate_spark.operators.timeseries import lttb, sessionize
from crate_spark.session import load_tables

SF_DIR = "/root/testdata/sf0.001"


def test_hll_within_tolerance(spark):
    """hyperloglog_distinct -> approx_count_distinct: rsd default 5%
    (HyperLogLogDistinctAggregation.java:79 declares approximate
    semantics; we assert the tolerance instead of equality)."""
    t = load_tables(spark, SF_DIR)
    rows = (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id").alias("approx"),
        )
        .collect()
    )
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= max(0.10 * r["exact"], 2), r


def test_lttb_properties(spark):
    """LTTB keeps first/last points per series and caps the count."""
    t = load_tables(spark, SF_DIR)
    ev = t["events"]
    out = lttb(ev, 20)
    per_series = {r["user_id"]: r for r in out.groupBy("user_id").agg(
        F.count("*").alias("n"), F.min("x_us").alias("xmin"), F.max("x_us").alias("xmax")
    ).collect()}
    src = {r["user_id"]: r for r in ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("xmin"),
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("xmax"),
    ).collect()}
    for uid, s in per_series.items():
        assert s["n"] <= 20
        assert s["n"] == min(20, src[uid]["n"])
        assert s["xmin"] == src[uid]["xmin"], "first point must be kept"
        assert s["xmax"] == src[uid]["xmax"], "last point must be kept"


def test_sessionize_gap_semantics(spark):
    """Within a session, consecutive gaps are <= 30min; across session
    boundaries they exceed it."""
    t = load_tables(spark, SF_DIR)
    out = sessionize(t["events"], gap_minutes=30).orderBy("user_id", "ts", "event_id")
    rows = out.select("user_id", "session_id",
                      F.unix_micros(F.col("ts").cast("timestamp")).alias("us")).collect()
    prev = {}
    for r in rows:
        key = r["user_id"]
        if key in prev:
            p_us, p_sess = prev[key]
            gap = r["us"] - p_us
            if r["session_id"] == p_sess:
                assert gap <= 30 * 60 * 1_000_000
            else:
                assert gap > 30 * 60 * 1_000_000
        prev[key] = (r["us"], r["session_id"])


def test_topk_map_shape_matches_reference(spark):
    """topk's output is a value->count MAP per group
    (TopKAggregation.java:77 ItemsSketch map) — assert the shape and
    that the entries agree with the exact row-form top-k."""
    from crate_spark.operators.timeseries import topk_map

    t = load_tables(spark, SF_DIR)
    out = topk_map(t["events"], ["event_type"], "value", k=3)
    field = dict((f.name, f.dataType.simpleString()) for f in out.schema.fields)
    assert field["frequencies"].startswith("map<")
    rows = {r["event_type"]: r["frequencies"] for r in out.collect()}
    assert rows and all(len(m) == 3 for m in rows.values())
    # agreement with the exact row-form query
    from crate_spark.queries.timeseries import ts_topk_event_values

    exact = ts_topk_event_values(spark, SF_DIR).filter(F.col("rnk") <= 3).collect()
    for r in exact:
        assert rows[r["event_type"]][r["value"]] == r["n"]
