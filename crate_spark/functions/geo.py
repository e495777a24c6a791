"""Geo functions over geo_point (struct/array lon-lat) columns.

Reference: ``types/GeoPointType.java:53`` (lon/lat point),
``expression/scalar/geo/`` (distance, within, intersects, latitude,
longitude, geohash, area). CrateDB's ``distance`` uses the Haversine
great-circle formula on a sphere (Lucene's SloppyMath underneath) —
we implement textbook haversine with the same earth radius, JVM-side.

``geohash`` needs interleaved base-32 bit twiddling — that is the one
place a pandas UDF is justified (arrow-batched; runs on a projected
2-column batch only).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

EARTH_RADIUS_M = 6371008.7714  # mean earth radius, as Lucene SloppyMath

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def geo_distance(lon1, lat1, lon2, lat2) -> Column:
    """Haversine great-circle distance in meters (reference ``distance``)."""
    rlon1, rlat1 = F.radians(_col(lon1)), F.radians(_col(lat1))
    rlon2, rlat2 = F.radians(_col(lon2)), F.radians(_col(lat2))
    dlat = rlat2 - rlat1
    dlon = rlon2 - rlon1
    a = F.pow(F.sin(dlat / 2), 2) + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin(dlon / 2), 2)
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.least(F.lit(1.0), F.sqrt(a)))


def within_bbox(lon, lat, min_lon: float, min_lat: float, max_lon: float, max_lat: float) -> Column:
    """``within(point, shape)`` for rectangular shapes — pure JVM
    comparison chain. Arbitrary-polygon containment is in
    ``operators/geo.py`` as a pandas UDF (ray casting)."""
    return (
        (_col(lon) >= min_lon)
        & (_col(lon) <= max_lon)
        & (_col(lat) >= min_lat)
        & (_col(lat) <= max_lat)
    )


def _geohash_batch(lon: pd.Series, lat: pd.Series) -> pd.Series:
    """12-char geohash (reference ``scalar/geo/GeoHashFunction`` — Lucene
    GeoHashUtils). Arrow-batched; bit interleave per value."""

    def encode(lo: float, la: float) -> str | None:
        if lo is None or la is None or pd.isna(lo) or pd.isna(la):
            return None
        lat_rng = [-90.0, 90.0]
        lon_rng = [-180.0, 180.0]
        out = []
        bit = 0
        ch = 0
        even = True
        while len(out) < 12:
            if even:
                mid = (lon_rng[0] + lon_rng[1]) / 2
                if lo >= mid:
                    ch = (ch << 1) | 1
                    lon_rng[0] = mid
                else:
                    ch <<= 1
                    lon_rng[1] = mid
            else:
                mid = (lat_rng[0] + lat_rng[1]) / 2
                if la >= mid:
                    ch = (ch << 1) | 1
                    lat_rng[0] = mid
                else:
                    ch <<= 1
                    lat_rng[1] = mid
            even = not even
            bit += 1
            if bit == 5:
                out.append(_BASE32[ch])
                bit = 0
                ch = 0
        return "".join(out)

    return pd.Series([encode(lo, la) for lo, la in zip(lon, lat)])


def geohash(lon: Column | str, lat: Column | str) -> Column:
    """geohash(point) -> 12-char string.

    The pandas UDF is built lazily — decorating at import time requires
    an active SparkSession.
    """
    fn = pandas_udf(_geohash_batch, "string")
    return fn(_col(lon).cast("double"), _col(lat).cast("double"))


def point_in_polygon(lon, lat, vertices: list[tuple[float, float]]) -> Column:
    """within(point, polygon) by ray casting: odd number of edge
    crossings of the +x ray => inside.

    Reference: ``expression/scalar/geo/WithinFunction`` (geo_shape
    containment). The polygon is a plan-time literal, so the unrolled
    per-edge tests are plain JVM comparisons inside whole-stage codegen
    — no UDF, no shuffle; runs inside the scan stage at any scale.
    Edge rule: half-open [yi, yj) so vertices/shared edges count once.
    """
    x, y = _col(lon), _col(lat)
    n = len(vertices)
    crossings = None
    for i in range(n):
        xi, yi = vertices[i]
        xj, yj = vertices[(i + 1) % n]
        straddles = (F.lit(yi) > y) != (F.lit(yj) > y)
        # lazy: the division only evaluates when yj != yi (straddling
        # edges can't be horizontal)
        x_at_y = (F.lit(xj - xi) * (y - F.lit(yi)) / F.lit(yj - yi)) + F.lit(xi)
        hit = F.when(straddles & (x < x_at_y), 1).otherwise(0)
        crossings = hit if crossings is None else crossings + hit
    # boundary points are WITHIN (JTS/spatial4j containment includes
    # the boundary — the reference's within('POINT (10 10)', box with
    # that corner) is true): point-on-segment = zero cross product and
    # inside the segment's bbox
    on_edge = None
    for i in range(n):
        xi, yi = vertices[i]
        xj, yj = vertices[(i + 1) % n]
        cross = (F.lit(xj - xi) * (y - F.lit(yi))
                 - F.lit(yj - yi) * (x - F.lit(xi)))
        seg = (
            (F.abs(cross) < F.lit(1e-9))
            & (x >= F.lit(min(xi, xj))) & (x <= F.lit(max(xi, xj)))
            & (y >= F.lit(min(yi, yj))) & (y <= F.lit(max(yi, yj)))
        )
        on_edge = seg if on_edge is None else on_edge | seg
    return (crossings % 2 == 1) | on_edge


def polygon_ray_cast_sql(lon_sql: str, lat_sql: str, vertices: list[tuple[float, float]]) -> str:
    """The identical ray-cast unrolled as ANSI SQL (oracle twin of
    ``point_in_polygon`` — same edge order, same arithmetic)."""
    n = len(vertices)
    terms = []
    for i in range(n):
        xi, yi = vertices[i]
        xj, yj = vertices[(i + 1) % n]
        terms.append(
            f"(CASE WHEN (({yi} > {lat_sql}) <> ({yj} > {lat_sql}))"
            f" AND {lon_sql} < ({xj - xi}) * ({lat_sql} - {yi}) / ({yj - yi}) + {xi}"
            f" THEN 1 ELSE 0 END)"
        )
    edge_terms = []
    for i in range(n):
        xi, yi = vertices[i]
        xj, yj = vertices[(i + 1) % n]
        edge_terms.append(
            f"(ABS(({xj - xi}) * ({lat_sql} - {yi})"
            f" - ({yj - yi}) * ({lon_sql} - {xi})) < 1e-9"
            f" AND {lon_sql} >= {min(xi, xj)} AND {lon_sql} <= {max(xi, xj)}"
            f" AND {lat_sql} >= {min(yi, yj)} AND {lat_sql} <= {max(yi, yj)})"
        )
    return ("((" + " + ".join(terms) + ") % 2 = 1 OR "
            + " OR ".join(edge_terms) + ")")


def bbox_intersects(
    a_min_lon, a_min_lat, a_max_lon, a_max_lat,
    b_min_lon, b_min_lat, b_max_lon, b_max_lat,
) -> Column:
    """``intersects(shape_a, shape_b)`` for rectangles
    (``expression/scalar/geo/IntersectsFunction.java``): standard
    interval-overlap test on both axes, touching edges count as
    intersecting (JTS ``intersects`` semantics). Pure JVM comparisons —
    runs inside the scan stage, pushdown-compatible."""

    def c(v):
        return F.lit(float(v)) if isinstance(v, (int, float)) else _col(v)

    return (
        (c(a_min_lon) <= c(b_max_lon))
        & (c(a_max_lon) >= c(b_min_lon))
        & (c(a_min_lat) <= c(b_max_lat))
        & (c(a_max_lat) >= c(b_min_lat))
    )


#: steradians -> square degrees, folded with the shoelace /2
_DEG2_FACTOR = (180.0 / 3.141592653589793) ** 2 / 2.0


def spherical_area_m2(points: list[tuple, ]) -> Column:
    """``area(geo_shape)`` (``expression/scalar/geo/AreaFunction.java``
    delegating to spatial4j ``shape.getArea(GEO)``) — polygon area in
    SQUARE DEGREES (the reference's documented unit, "geodetic
    awareness": scalar-functions.rst _scalar-area) via the
    Chamberlain–Duquette spherical shoelace: (180/π)²/2 * |sum over
    edges (λ2-λ1)(2 + sin φ1 + sin φ2)| with λ, φ in radians. Exact
    twin arithmetic lives in ``spherical_area_sql``. Vertices are
    (lon, lat) Columns or floats, ring open (first vertex not
    repeated). Pure JVM — codegen-side.
    """

    def c(v):
        return F.lit(float(v)) if isinstance(v, (int, float)) else _col(v)

    n = len(points)
    total = None
    for i in range(n):
        lon1, lat1 = points[i]
        lon2, lat2 = points[(i + 1) % n]
        term = (F.radians(c(lon2)) - F.radians(c(lon1))) * (
            F.lit(2.0) + F.sin(F.radians(c(lat1))) + F.sin(F.radians(c(lat2)))
        )
        total = term if total is None else total + term
    return F.abs(total) * F.lit(_DEG2_FACTOR)


def spherical_area_sql(points: list[tuple[str, str]]) -> str:
    """Oracle twin of ``spherical_area_m2`` — identical edge order and
    arithmetic as ANSI SQL over (lon_sql, lat_sql) expression pairs."""
    n = len(points)
    terms = []
    for i in range(n):
        lon1, lat1 = points[i]
        lon2, lat2 = points[(i + 1) % n]
        terms.append(
            f"(RADIANS({lon2}) - RADIANS({lon1})) * "
            f"(2.0 + SIN(RADIANS({lat1})) + SIN(RADIANS({lat2})))"
        )
    s = " + ".join(terms)
    # the identical python float literal the Column side uses
    return f"ABS({s}) * {_DEG2_FACTOR!r}"


def _parse_wkt_or_point(text: str):
    """(lon, lat) for a point representation — 'POINT (x y)' WKT or
    the engine's '[lon, lat]' array-cast string — else None."""
    import re as _re

    if text is None:
        return None
    t = text.strip()
    m = _re.match(r"(?i)POINT\s*\(\s*(-?[\d.]+)\s+(-?[\d.]+)\s*\)", t)
    if m:
        return float(m.group(1)), float(m.group(2))
    m = _re.match(r"\[\s*(-?[\d.]+)\s*,\s*(-?[\d.]+)\s*\]", t)
    if m:
        return float(m.group(1)), float(m.group(2))
    if t.startswith("{"):  # GeoJSON Point text
        import json as _json

        try:
            obj = _json.loads(t)
        except ValueError:
            return None
        if (obj.get("type") or "").lower() == "point":
            c = obj.get("coordinates") or []
            if len(c) >= 2:
                return float(c[0]), float(c[1])
    return None


def _parse_wkt_rings(text: str):
    """Outer rings of a WKT POLYGON/MULTIPOLYGON as vertex lists
    (holes ignored — the reference's tutorial shapes carry none)."""
    import re as _re

    if text is None:
        return []
    t = text.strip()
    if t.startswith("{"):  # GeoJSON object text
        import json as _json

        try:
            obj = _json.loads(t)
        except ValueError:
            return []
        typ = (obj.get("type") or "").lower()
        coords = obj.get("coordinates")
        if typ == "polygon" and coords:
            return [[(float(x), float(y)) for x, y in coords[0]]]
        if typ == "multipolygon" and coords:
            return [
                [(float(x), float(y)) for x, y in poly[0]] for poly in coords
            ]
        return []
    rings = []
    for ring_txt in _re.findall(r"\(\s*((?:-?[\d.]+\s+-?[\d.]+\s*,?\s*)+)\)", text):
        pts = [
            (float(a), float(b))
            for a, b in _re.findall(r"(-?[\d.]+)\s+(-?[\d.]+)", ring_txt)
        ]
        if len(pts) >= 3:
            rings.append(pts)
    if text.strip().upper().startswith("MULTIPOLYGON"):
        # every other ring of each polygon would be a hole; tutorial
        # data has none, treat all parsed rings as outer
        return rings
    return rings[:1] if rings else []


def _pt_in_ring(x: float, y: float, ring) -> bool:
    inside = False
    n = len(ring)
    for i in range(n):
        xi, yi = ring[i]
        xj, yj = ring[(i + 1) % n]
        # boundary counts as within (JTS containment)
        cross = (xj - xi) * (y - yi) - (yj - yi) * (x - xi)
        if (
            abs(cross) < 1e-9
            and min(xi, xj) - 1e-9 <= x <= max(xi, xj) + 1e-9
            and min(yi, yj) - 1e-9 <= y <= max(yi, yj) + 1e-9
        ):
            return True
        if (yi > y) != (yj > y) and x < (xj - xi) * (y - yi) / (yj - yi) + xi:
            inside = not inside
    return inside


def _within_batch(point_repr, shape_wkt):
    """Arrow-batched within(point, shape) for COLUMN-typed operands —
    the declared Python path (WithinFunction on runtime shapes; the
    literal-shape forms unroll to pure JVM expressions instead)."""
    import pandas as pd

    out = []
    cache: dict = {}
    for p, s in zip(point_repr, shape_wkt):
        pt = _parse_wkt_or_point(p)
        if pt is None or s is None:
            out.append(None)
            continue
        rings = cache.get(s)
        if rings is None:
            rings = cache[s] = _parse_wkt_rings(s)
        out.append(any(_pt_in_ring(pt[0], pt[1], r) for r in rings))
    return pd.Series(out, dtype="object")


def _parse_shape(text: str):
    """(kind, parts) for WKT or GeoJSON text: kind in point|line|rings;
    parts = [(x, y)] / [pts] / [rings]."""
    if text is None:
        return None
    pt = _parse_wkt_or_point(text)
    if pt is not None:
        return ("point", [pt])
    t = text.strip()
    if t.startswith("{"):
        import json as _json

        try:
            obj = _json.loads(t)
        except ValueError:
            return None
        typ = (obj.get("type") or "").lower()
        coords = obj.get("coordinates")
        if typ == "linestring" and coords:
            return ("line", [[(float(x), float(y)) for x, y in coords]])
        if typ == "multilinestring" and coords:
            return ("line", [[(float(x), float(y)) for x, y in ln] for ln in coords])
        if typ in ("polygon", "multipolygon"):
            return ("rings", _parse_wkt_rings(t))
        return None
    up = t.upper()
    if up.startswith(("LINESTRING", "MULTILINESTRING")):
        import re as _re

        lines = [
            [(float(a), float(b)) for a, b in _re.findall(r"(-?[\d.]+)\s+(-?[\d.]+)", seg)]
            for seg in _re.findall(r"\(([^()]+)\)", t)
        ]
        return ("line", [ln for ln in lines if len(ln) >= 2])
    if up.startswith(("POLYGON", "MULTIPOLYGON")):
        return ("rings", _parse_wkt_rings(t))
    return None


def _segs_intersect(p1, p2, p3, p4) -> bool:
    def orient(a, b, c):
        v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        return 0 if abs(v) < 1e-12 else (1 if v > 0 else -1)

    def on_seg(a, b, c):
        return (
            min(a[0], b[0]) - 1e-12 <= c[0] <= max(a[0], b[0]) + 1e-12
            and min(a[1], b[1]) - 1e-12 <= c[1] <= max(a[1], b[1]) + 1e-12
        )

    o1, o2 = orient(p1, p2, p3), orient(p1, p2, p4)
    o3, o4 = orient(p3, p4, p1), orient(p3, p4, p2)
    if o1 != o2 and o3 != o4:
        return True
    return (
        (o1 == 0 and on_seg(p1, p2, p3))
        or (o2 == 0 and on_seg(p1, p2, p4))
        or (o3 == 0 and on_seg(p3, p4, p1))
        or (o4 == 0 and on_seg(p3, p4, p2))
    )


def _shapes_intersect(a, b) -> bool:
    """JTS-style intersects over parsed shapes: any boundary segments
    cross, or one shape's representative point lies inside the other."""
    def edges(shape):
        kind, parts = shape
        if kind == "point":
            return []
        if kind == "line":
            return [
                (ln[i], ln[i + 1]) for ln in parts for i in range(len(ln) - 1)
            ]
        return [
            (r[i], r[(i + 1) % len(r)]) for r in parts for i in range(len(r))
        ]

    def a_point(shape):
        kind, parts = shape
        if kind == "point":
            return parts[0]
        if kind == "line":
            return parts[0][0]
        return parts[0][0]

    def contains(shape, pt) -> bool:
        kind, parts = shape
        return kind == "rings" and any(
            _pt_in_ring(pt[0], pt[1], r) for r in parts
        )

    for e1 in edges(a):
        for e2 in edges(b):
            if _segs_intersect(e1[0], e1[1], e2[0], e2[1]):
                return True
    return contains(a, a_point(b)) or contains(b, a_point(a))


def _intersects_batch(shape_a, shape_b):
    """Arrow-batched intersects(shape, shape) for COLUMN-typed or
    GeoJSON-literal operands (IntersectsFunction on runtime shapes;
    literal bbox forms unroll to JVM expressions instead)."""
    import pandas as pd

    out = []
    cache: dict = {}

    def parsed(s):
        if s not in cache:
            cache[s] = _parse_shape(s)
        return cache[s]

    for sa, sb in zip(shape_a, shape_b):
        pa = parsed(sa) if sa is not None else None
        pb = parsed(sb) if sb is not None else None
        out.append(None if pa is None or pb is None else _shapes_intersect(pa, pb))
    return pd.Series(out, dtype="object")


def _on_segment_pt(a, b, c, eps: float = 1e-12) -> bool:
    cross = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
    if abs(cross) > eps:
        return False
    return (
        min(a[0], b[0]) - eps <= c[0] <= max(a[0], b[0]) + eps
        and min(a[1], b[1]) - eps <= c[1] <= max(a[1], b[1]) + eps
    )


def _pt_in_polygon_rings(x: float, y: float, rings) -> bool:
    """Boundary-inclusive containment in a polygon with holes
    (rings[0] = outer)."""
    for r in rings:
        for i in range(len(r)):
            if _on_segment_pt(r[i], r[(i + 1) % len(r)], (x, y)):
                return True
    if not _pt_in_ring(x, y, rings[0]):
        return False
    return not any(_pt_in_ring(x, y, h) for h in rings[1:])


def shape_within_polygon(a_text: str, b_text: str) -> bool | None:
    """Planar within(shape, polygon) over WKT/GeoJSON TEXT — the
    constant-fold twin of WithinFunction.java (spatial4j/JTS planar
    relate) for literal operands: every vertex of A inside-or-on B,
    no edge of A properly crossing an edge of B, and every A-segment
    midpoint inside-or-on B (catches a segment leaving through two
    boundary touches). None when A isn't parseable or B isn't a
    polygon (out of fold scope)."""
    a, b = _parse_shape(a_text), _parse_shape(b_text)
    if a is None or b is None or b[0] != "rings" or not b[1]:
        return None
    rings = b[1]
    kind, parts = a
    if kind == "point":
        pts, segs = parts, []
    elif kind == "line":
        pts = [p for ln in parts for p in ln]
        segs = [
            (ln[i], ln[i + 1]) for ln in parts for i in range(len(ln) - 1)
        ]
    else:
        pts = [p for r in parts for p in r]
        segs = [
            (r[i], r[(i + 1) % len(r)]) for r in parts for i in range(len(r))
        ]
    for x, y in pts:
        if not _pt_in_polygon_rings(x, y, rings):
            return False
    b_edges = [
        (r[i], r[(i + 1) % len(r)]) for r in rings for i in range(len(r))
    ]

    def orient(p, q, r) -> int:
        v = (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])
        return 0 if abs(v) < 1e-12 else (1 if v > 0 else -1)

    for s in segs:
        for e in b_edges:
            o1, o2 = orient(s[0], s[1], e[0]), orient(s[0], s[1], e[1])
            o3, o4 = orient(e[0], e[1], s[0]), orient(e[0], e[1], s[1])
            if o1 != o2 and o3 != o4 and 0 not in (o1, o2, o3, o4):
                return False  # proper crossing: A exits B
        mx, my = (s[0][0] + s[1][0]) / 2, (s[0][1] + s[1][1]) / 2
        if not _pt_in_polygon_rings(mx, my, rings):
            return False
    return True
