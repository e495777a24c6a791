"""Geo queries: distance, within (bbox), geohash over geo_point data.

Reference parity: ``types/GeoPointType.java:53`` (lon/lat),
``expression/scalar/geo/`` distance/within/latitude/longitude/geohash.
The driver tables carry no geo columns, so points derive
deterministically from customer keys/balances (same arithmetic in the
oracle) — the geo functions under test are the real surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crate_spark.functions.geo import (
    bbox_intersects,
    geo_distance,
    geohash,
    spherical_area_m2,
    spherical_area_sql,
    within_bbox,
)
from crate_spark.queries import query
from crate_spark.session import load_tables

def _lon() -> F.Column:
    """Deterministic synthetic longitude (Column exprs need an active
    session, so these are builders, not module constants)."""
    return (F.col("c_custkey") % 360 - 180 + 0.5).cast("double")


def _lat() -> F.Column:
    return ((F.col("c_custkey") % 170) / 2.0 - 42.5).cast("double")
_SQL_LON = "CAST(c_custkey % 360 - 180 + 0.5 AS DOUBLE)"
_SQL_LAT = "CAST((c_custkey % 170) / 2.0 - 42.5 AS DOUBLE)"

#: Haversine in DuckDB SQL — same constant and formula as
#: functions/geo.py (mean earth radius 6371008.7714 m).
_SQL_DIST = f"""
  2.0 * 6371008.7714 * ASIN(LEAST(1.0, SQRT(
      POWER(SIN(RADIANS({_SQL_LAT} - 52.52) / 2), 2)
      + COS(RADIANS(52.52)) * COS(RADIANS({_SQL_LAT}))
        * POWER(SIN(RADIANS({_SQL_LON} - 13.405) / 2), 2)
  )))
"""


@query(
    "geo_distance_topk",
    oracle=f"""
    SELECT c_custkey, ROUND({_SQL_DIST}, 3) AS dist_m
    FROM customer
    ORDER BY {_SQL_DIST}, c_custkey
    LIMIT 50
    """,
)
def geo_distance_topk(spark, sf_dir):
    """distance(point, point) — haversine great-circle; 50 customers
    nearest to Berlin (52.52N 13.405E)."""
    t = load_tables(spark, sf_dir)
    dist = geo_distance(_lon(), _lat(), F.lit(13.405), F.lit(52.52))
    return (
        t["customer"]
        .select("c_custkey", dist.alias("dist_raw"))
        .orderBy(F.col("dist_raw"), F.col("c_custkey"))
        .limit(50)
        .select("c_custkey", F.round("dist_raw", 3).alias("dist_m"))
    )


@query(
    "geo_within_bbox",
    oracle=f"""
    SELECT c_custkey, ROUND({_SQL_LON}, 6) AS lon, ROUND({_SQL_LAT}, 6) AS lat
    FROM customer
    WHERE {_SQL_LON} BETWEEN -90 AND 30 AND {_SQL_LAT} BETWEEN 0 AND 45
    """,
)
def geo_within_bbox(spark, sf_dir):
    """within(point, shape) for a rectangular region — pure JVM
    comparisons (the bbox fast path; polygon containment is the
    documented pandas-UDF slow path)."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .filter(within_bbox(_lon(), _lat(), -90.0, 0.0, 30.0, 45.0))
        .select(
            "c_custkey",
            F.round(_lon(), 6).alias("lon"),
            F.round(_lat(), 6).alias("lat"),
        )
    )


@query("geo_geohash", oracle=None)
def geo_geohash(spark, sf_dir):
    """geohash(point) — 12-char base32 (Arrow-batched pandas UDF; no
    DuckDB twin -> rows-only; known-value checks in unit tests)."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .filter(F.col("c_custkey") < 200)
        .select("c_custkey", geohash(_lon(), _lat()).alias("gh"))
    )


#: Convex-ish pentagon over the Atlantic; no horizontal edges (consecutive
#: vertex latitudes differ) so the ray-cast division is always guarded.
_PENTAGON = [(-60.0, 5.0), (-10.0, 10.0), (20.0, 25.0), (-20.0, 44.0), (-55.0, 30.0)]


def _pentagon_oracle() -> str:
    from crate_spark.functions.geo import polygon_ray_cast_sql

    cond = polygon_ray_cast_sql(_SQL_LON, _SQL_LAT, _PENTAGON)
    return f"""
    SELECT c_custkey, ROUND({_SQL_LON}, 6) AS lon, ROUND({_SQL_LAT}, 6) AS lat
    FROM customer
    WHERE {cond}
    """


@query(
    "geo_intersects",
    oracle=f"""
    SELECT c_custkey,
           ({_SQL_LON} <= 10 AND {_SQL_LON} + 5 >= -30
            AND {_SQL_LAT} <= 30 AND {_SQL_LAT} + 4 >= 10) AS hits_atlantic,
           ({_SQL_LON} <= 170 AND {_SQL_LON} + 5 >= 150
            AND {_SQL_LAT} <= -60 AND {_SQL_LAT} + 4 >= -80) AS hits_antarctic
    FROM customer WHERE c_custkey <= 500
    """,
)
def geo_intersects(spark, sf_dir):
    """intersects(shape_a, shape_b)
    (``expression/scalar/geo/IntersectsFunction.java``): each customer
    carries a 5x4-degree bbox anchored at its synthetic point; test
    overlap against two fixed literal regions. Interval-overlap
    comparisons only — JVM, inside the scan."""
    t = load_tables(spark, sf_dir)
    lon, lat = _lon(), _lat()
    return (
        t["customer"]
        .filter(F.col("c_custkey") <= 500)
        .select(
            "c_custkey",
            bbox_intersects(lon, lat, lon + 5, lat + 4, -30.0, 10.0, 10.0, 30.0).alias(
                "hits_atlantic"
            ),
            bbox_intersects(lon, lat, lon + 5, lat + 4, 150.0, -80.0, 170.0, -60.0).alias(
                "hits_antarctic"
            ),
        )
    )


def _area_oracle() -> str:
    tri = [
        (_SQL_LON, _SQL_LAT),
        (f"({_SQL_LON} + 2)", _SQL_LAT),
        (f"({_SQL_LON} + 1)", f"({_SQL_LAT} + 1.5)"),
    ]
    return f"""
    SELECT c_custkey, ROUND({spherical_area_sql(tri)}, 6) AS area_deg2
    FROM customer WHERE c_custkey <= 500
    """


@query("geo_area", oracle=_area_oracle())
def geo_area(spark, sf_dir):
    """area(geo_shape) (``expression/scalar/geo/AreaFunction.java``):
    polygon area of a per-customer triangle in SQUARE DEGREES (the
    reference unit, spatial4j shape.getArea(GEO)). The
    oracle unrolls the identical Chamberlain–Duquette arithmetic."""
    t = load_tables(spark, sf_dir)
    lon, lat = _lon(), _lat()
    tri = [(lon, lat), (lon + 2, lat), (lon + 1, lat + 1.5)]
    return (
        t["customer"]
        .filter(F.col("c_custkey") <= 500)
        .select(
            "c_custkey",
            F.round(spherical_area_m2(tri), 6).alias("area_deg2"),
        )
    )


@query("geo_within_polygon", oracle=_pentagon_oracle())
def geo_within_polygon(spark, sf_dir):
    """within(point, polygon) — ray-cast against a literal pentagon,
    unrolled to plain JVM comparisons (geo_shape containment analog;
    WithinFunction). The oracle unrolls the identical arithmetic."""
    from crate_spark.functions.geo import point_in_polygon

    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .filter(point_in_polygon(_lon(), _lat(), _PENTAGON))
        .select(
            "c_custkey",
            F.round(_lon(), 6).alias("lon"),
            F.round(_lat(), 6).alias("lat"),
        )
    )
