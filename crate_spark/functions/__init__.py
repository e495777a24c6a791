"""Scalar/aggregate functions CrateDB has and Spark lacks.

Everything here is a Column-expression *composition* (JVM-side,
whole-stage-codegen friendly) unless explicitly noted as a pandas UDF —
UDFs are the slow path and only used where bit-twiddling makes
expressions unreasonable (geohash).

Submodules:
- ``scalar``  — date_bin, age, to_char subset, ignore3vl, parse_uri, ...
- ``geo``     — haversine distance, within (point-in-polygon), geohash
- ``vector``  — l2/cosine/dot over array<float>, vector_similarity
"""

from crate_spark.functions.scalar import (  # noqa: F401
    age,
    array_avg,
    array_difference,
    array_max,
    array_min,
    array_overlap,
    array_sum,
    array_unique,
    date_bin,
    ignore3vl,
    ip_in_cidr,
    parse_uri,
)
from crate_spark.functions.geo import geo_distance, geohash, within_bbox  # noqa: F401
from crate_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_distance,
    vector_similarity,
)
