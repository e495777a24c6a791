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


def test_sessionize_timezone_invariant(spark):
    """CORRECTNESS r3/r4 red row: the driver harness builds a plain
    SparkSession, so spark.sql.session.timeZone is whatever the host
    JVM has — session ids must not depend on it. Run the registry
    query under several DST-bearing zones (plus repeated runs) and
    assert identical canonical hashes."""
    from tests.conftest import canonical_rows
    from crate_spark.queries.timeseries import ts_gap_detection, ts_sessionize

    def canon(fn):
        out = fn(spark, SF_DIR)
        return canonical_rows(out.columns, [tuple(r) for r in out.collect()])

    orig = spark.conf.get("spark.sql.session.timeZone")
    try:
        base_sess = canon(ts_sessionize)
        base_gap = canon(ts_gap_detection)
        zones = [
            "America/New_York",
            "Australia/Lord_Howe",  # 30-min DST shift
            "Asia/Kathmandu",       # +05:45 fixed offset
            "Pacific/Kiritimati",   # +14
            "America/Sao_Paulo",
        ]
        for tz in zones:
            spark.conf.set("spark.sql.session.timeZone", tz)
            assert canon(ts_sessionize) == base_sess, f"sessionize varies under {tz}"
            assert canon(ts_gap_detection) == base_gap, f"gap varies under {tz}"
        # >=10-run determinism (5 zones x 2 queries above + 5 repeats here)
        spark.conf.set("spark.sql.session.timeZone", orig)
        for _ in range(5):
            assert canon(ts_sessionize) == base_sess
    finally:
        spark.conf.set("spark.sql.session.timeZone", orig)


def test_sessionize_dst_gap_no_ns_column(spark):
    """Fallback path (no ts_ns column): two NTZ events straddling the
    US spring-forward gap (2025-03-09 02:00 America/New_York). Wall
    clock gap = 85 min -> MUST split sessions in every timezone; the
    old unix_micros(cast) arithmetic said 25 min under New_York and
    merged them."""
    import datetime as dt

    rows = [
        (1, 1, dt.datetime(2025, 3, 9, 1, 45)),
        (1, 2, dt.datetime(2025, 3, 9, 3, 10)),
    ]
    df = (
        spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp_ntz")
    )
    orig = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            got = {
                r["event_id"]: r["session_id"]
                for r in sessionize(df, gap_minutes=30).collect()
            }
            assert got == {1: 1, 2: 2}, f"under {tz}: {got}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", orig)
