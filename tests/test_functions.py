"""Expression-eval unit tests for crate_spark.functions — the analog of
the reference's ScalarTestCase.assertEvaluate
(``server/src/testFixtures/java/io/crate/expression/scalar/ScalarTestCase.java:178``)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from crate_spark.functions import (
    age,
    array_avg,
    array_difference,
    array_overlap,
    array_sum,
    array_unique,
    cosine_similarity,
    date_bin,
    geo_distance,
    geohash,
    ignore3vl,
    ip_in_cidr,
    l2_distance,
    parse_uri,
    vector_similarity,
)


def one(df, col):
    return df.select(col.alias("v")).collect()[0]["v"]


@pytest.fixture(scope="module")
def row(spark):
    return spark.range(1)


def test_date_bin(spark, row):
    ts = F.lit("2024-03-15 10:37:42").cast("timestamp")
    origin = F.lit("2024-01-01 00:00:00").cast("timestamp")
    assert str(one(row, date_bin("15 minutes", ts, origin))) == "2024-03-15 10:30:00"
    # origin offset shifts the grid (DateBinFunction.java:41 semantics)
    origin2 = F.lit("2024-01-01 00:05:00").cast("timestamp")
    assert str(one(row, date_bin("15 minutes", ts, origin2))) == "2024-03-15 10:35:00"
    # timestamps before the origin floor toward -infinity
    early = F.lit("2023-12-31 23:59:00").cast("timestamp")
    assert str(one(row, date_bin("1 hour", early, origin))) == "2023-12-31 23:00:00"


def test_age(spark, row):
    a = F.lit("2024-03-15 00:00:00").cast("timestamp")
    b = F.lit("2024-01-10 00:00:00").cast("timestamp")
    # CalendarIntervalType is not collectable in PySpark; observe as string
    iv = one(row, age(a, b).cast("string"))
    assert "2 months 5 days" in iv
    # time-of-day remainder is preserved (AgeFunction joda Period parity)
    tod = one(
        row,
        age(
            F.lit("2026-01-01 12:00:00").cast("timestamp"),
            F.lit("2026-01-01 00:00:00").cast("timestamp"),
        ).cast("string"),
    )
    assert "12 hours" in tod
    # negative spans truncate months toward zero: -1 month -15 days
    neg = one(
        row,
        age(
            F.lit("2026-01-01 00:00:00").cast("timestamp"),
            F.lit("2026-02-16 00:00:00").cast("timestamp"),
        ).cast("string"),
    )
    assert "-1 months -15 days" in neg


def test_ignore3vl(spark, row):
    assert one(row, ignore3vl(F.lit(None).cast("boolean"))) is False
    assert one(row, ignore3vl(F.lit(True))) is True


def test_ip_in_cidr(spark, row):
    assert one(row, ip_in_cidr(F.lit("192.168.1.77"), "192.168.1.0/24")) is True
    assert one(row, ip_in_cidr(F.lit("192.168.2.1"), "192.168.1.0/24")) is False
    assert one(row, ip_in_cidr(F.lit("10.0.0.1"), "0.0.0.0/0")) is True


def test_parse_uri(spark, row):
    u = one(row, parse_uri(F.lit("https://example.com:8080/a/b?x=1#frag")))
    assert u["scheme"] == "https"
    assert u["host"] == "example.com"
    assert u["port"] == 8080
    assert u["path"] == "/a/b"
    assert u["query"] == "x=1"
    assert u["fragment"] == "frag"


def test_array_helpers(spark, row):
    arr = F.array(F.lit(1), F.lit(2), F.lit(2), F.lit(3))
    other = F.array(F.lit(2), F.lit(5))
    assert sorted(one(row, array_unique(arr))) == [1, 2, 3]
    assert one(row, array_difference(arr, other)) == [1, 3]
    assert one(row, array_overlap(arr, other)) is True
    assert one(row, array_sum(arr)) == 8.0
    assert one(row, array_avg(arr)) == 2.0


def test_vector_functions(spark, row):
    a = F.array(F.lit(1.0), F.lit(0.0))
    b = F.array(F.lit(0.0), F.lit(1.0))
    assert one(row, l2_distance(a, a)) == 0.0
    assert abs(one(row, l2_distance(a, b)) - math.sqrt(2)) < 1e-12
    # vector_similarity = 1/(1+squareDistance) per FloatVectorType.java:56
    # (Lucene EUCLIDEAN compares squared distance — no sqrt): d^2 = 2 here
    assert abs(one(row, vector_similarity(a, b)) - 1 / (1 + 2.0)) < 1e-12
    assert abs(one(row, cosine_similarity(a, b))) < 1e-12
    assert abs(one(row, cosine_similarity(a, a)) - 1.0) < 1e-12


def test_geo_distance(spark, row):
    # Berlin -> Paris great-circle ≈ 877-880 km
    d = one(row, geo_distance(F.lit(13.405), F.lit(52.52), F.lit(2.3522), F.lit(48.8566)))
    assert 870_000 < d < 890_000
    assert one(row, geo_distance(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(0.0))) == 0.0


def test_geohash(spark, row):
    # known value: (-5.6, 42.6) -> ezs42... ; use canonical example u4pruydqqvj
    gh = one(row, geohash(F.lit(10.40744), F.lit(57.64911)))
    assert gh.startswith("u4pruydqqvj")


def test_to_char_template_tokenizer():
    """PGDateTimeTemplates.java parse(): case-exact longest-match
    tokens, single-char literal fallback, quoted sections."""
    from crate_spark.functions.pgformat import tokenize

    assert tokenize("YYYY-MM-DD") == [
        ("tok", "Y4"), ("lit", "-"), ("tok", "MM"), ("lit", "-"),
        ("tok", "DD"),
    ]
    assert tokenize("miss-") == [
        ("tok", "MI"), ("tok", "SEC"), ("lit", "-")
    ]
    # 'Th' is NOT a token spelling (only th/TH) -> literal chars
    assert tokenize("DDTh") == [
        ("tok", "DD"), ("lit", "T"), ("lit", "h")
    ]
    assert tokenize('"year: "YYYY') == [("lit", "year: "), ("tok", "Y4")]


def test_to_char_via_sql(spark, row):
    from crate_spark.functions.scalar import to_char

    df = row.select(
        to_char("TIMESTAMP '2024-12-13 00:00:00'", "yyyy-mm-dd").alias("a"),
        to_char("TIMESTAMP '2024-12-13 00:00:00'", "miss-").alias("b"),
        to_char("TIMESTAMP '2024-01-21 00:00:00'", "DDth").alias("c"),
    )
    r = df.collect()[0]
    assert (r.a, r.b, r.c) == ("2024-12-13", "0000-", "21st")


def test_to_char_user_string_stays_timestamp_typed(spark):
    """A plain user string that merely LOOKS like an interval
    ('15:30:10') resolves to the timestamp signature (registered
    first, ToCharFunction.java:54), not the interval formatter —
    only renders produced by our own interval folds (tagged with a
    no-op CAST marker) take the interval path (ADVICE r9)."""
    from crate_spark.engine import CrateSession

    sess = CrateSession(spark)
    got = sess.execute(
        "SELECT to_char('2024-03-05 15:30:10', 'HH24:MI:SS') AS a, "
        "to_char(INTERVAL '1 year 04:05:06', "
        "'YYYY-MM-DD HH24:MI:SS') AS b"
    ).collect()[0]
    assert got.a == "15:30:10"
    # the folded mixed interval still formats as an interval
    # (reference formats 0000-01-01T00:00 + period; year renders 0001
    # via the 400-year Gregorian-cycle shift)
    assert got.b == "0001-01-01 04:05:06"


def test_sql_double_nonfinite():
    """_sql_double must emit plan-parseable spellings for NaN/Inf —
    degenerate k-means codebooks on zero vectors produce them
    (ADVICE r9)."""
    from crate_spark.operators.quant import _sql_double

    assert _sql_double(float("nan")) == "double('NaN')"
    assert _sql_double(float("inf")) == "double('Infinity')"
    assert _sql_double(float("-inf")) == "double('-Infinity')"
    assert _sql_double(1.5) == "1.5D"


def test_blake3_reference_vectors():
    """Reference HashFunctionsTest.java:42-44 vectors."""
    from crate_spark.functions._blake3 import blake3_hex

    assert blake3_hex(b"") == (
        "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262"
    )
    assert blake3_hex("crate".encode()) == (
        "012efcab3db1a63a5d50510e48f1fbf3ac26dbd28a3cec099457eff5fefa96aa"
    )
    assert blake3_hex("©rate".encode()) == (
        "7e60e9aec3049dd63fc695ea89fc20ae8abe5ea32388a5a60cf08d97b9e25ff4"
    )


def test_blake3_cross_validates_against_jvm(spark):
    """The pure-Python implementation must agree with the JVM's
    commons-codec Blake3 (the exact library the reference uses,
    HashFunctions.java:61) across single-block, multi-block and
    multi-chunk (tree) inputs."""
    import random

    from crate_spark.functions._blake3 import blake3_hex

    B3 = spark._jvm.org.apache.commons.codec.digest.Blake3

    def jvm_hex(b: bytes) -> str:
        d = B3.initHash()
        if b:
            d.update(bytearray(b))
        return bytes(d.doFinalize(32)).hex()

    random.seed(1234)
    for length in (0, 1, 63, 64, 65, 1023, 1024, 1025, 2048, 3072, 5000, 70000):
        data = bytes(random.randrange(256) for _ in range(length))
        assert blake3_hex(data) == jvm_hex(data), f"len {length}"


def test_blake3_column_and_sql(spark):
    from pyspark.sql import functions as F

    from crate_spark.engine import CrateSession
    from crate_spark.functions import scalar as s

    df = spark.createDataFrame([("crate",), (None,)], "v string")
    rows = df.select(s.blake3("v").alias("h")).collect()
    assert rows[0]["h"] == (
        "012efcab3db1a63a5d50510e48f1fbf3ac26dbd28a3cec099457eff5fefa96aa"
    )
    assert rows[1]["h"] is None  # STRICTNULL
    sess = CrateSession(spark)
    got = sess.execute("SELECT blake3('crate') AS h").collect()[0]["h"]
    assert got == "012efcab3db1a63a5d50510e48f1fbf3ac26dbd28a3cec099457eff5fefa96aa"
