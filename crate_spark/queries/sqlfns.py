"""SQL-front-door coverage for the crate-only scalar-function names
the dialect shim expands into Spark builtin expressions
(dialect._FN_TEMPLATES): the array_* family, string_to_array,
null_or_empty. Each query goes through CrateSession.execute — shim +
engine dispatch end-to-end — with a DuckDB oracle.

Reference classes: scalar/ArraySliceFunction, ArraySetFunction,
StringToArrayFunction, ArrayDifferenceFunction, ArrayUniqueFunction,
ArraySummationFunction, ArrayAvgFunction, ArrayUpper/LowerFunction,
NullOrEmptyFunction (docs/general/builtins/scalar-functions.rst).
"""

from __future__ import annotations

from crate_spark.queries import query


def _session(spark, sf_dir):
    from crate_spark.engine import CrateSession

    return CrateSession(spark, sf_dir)


@query(
    "sql_array_fn_surface",
    oracle="""
    WITH src AS (
      SELECT doc_id, lang, source, string_split(text, ' ') AS words
      FROM documents WHERE doc_id < 150
    )
    SELECT doc_id,
           array_to_string(words[2:4], ',') AS sliced,
           array_to_string(string_split(lang || '|' || source, '|'), ',') AS split_cols,
           nullif(list_position(words, 'the'), 0) AS pos_the,
           nullif(len(words), 0) AS n_words,
           CASE WHEN len(words) > 0 THEN 1 END AS lower_1,
           nullif(len(words), 0) AS upper_1,
           array_to_string(words[1:1] || ['XX'] || words[3:], ',') AS set_2,
           array_to_string(flatten([words[1:2], words[4:5]]), ',') AS unnested
    FROM src
    """,
)
def sql_array_fn_surface(spark, sf_dir):
    """array_slice / string_to_array / array_position (NULL when
    absent) / array_length / array_lower / array_upper / array_set /
    array_unnest — all as SQL text through the shim, all expanding to
    whole-stage-codegen Spark builtins (no UDFs)."""
    return _session(spark, sf_dir).execute(
        "SELECT doc_id, "
        "array_to_string(array_slice(string_to_array(text, ' '), 2, 4), ',') AS sliced, "
        "array_to_string(string_to_array(concat(lang, '|', source), '|'), ',') AS split_cols, "
        "array_position(string_to_array(text, ' '), 'the') AS pos_the, "
        "array_length(string_to_array(text, ' '), 1) AS n_words, "
        "array_lower(string_to_array(text, ' '), 1) AS lower_1, "
        "array_upper(string_to_array(text, ' '), 1) AS upper_1, "
        "array_to_string(array_set(string_to_array(text, ' '), 2, 'XX'), ',') AS set_2, "
        "array_to_string(array_unnest([array_slice(string_to_array(text, ' '), 1, 2), "
        "array_slice(string_to_array(text, ' '), 4, 5)]), ',') AS unnested "
        "FROM documents WHERE doc_id < 150"
    )


@query(
    "sql_array_numeric_fns",
    oracle="""
    WITH src AS (
      SELECT d.doc_id, string_split(d.text, ' ') AS words, e.embedding
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
      WHERE d.doc_id < 150
    )
    SELECT doc_id,
           ROUND(list_sum(embedding), 5) AS vec_sum,
           ROUND(list_avg(embedding), 6) AS vec_avg,
           array_to_string(list_filter(words, x -> NOT list_contains(['the','a','of'], x)), ',') AS no_stop,
           array_to_string(list_sort(list_distinct(words[1:3] || words[1:3])), ',') AS uniq_head,
           list_has_any(words, ['data', 'spark']) AS mentions,
           (words IS NULL OR len(words) = 0) AS empty_words
    FROM src
    """,
)
def sql_array_numeric_fns(spark, sf_dir):
    """array_sum / array_avg / array_difference / array_cat +
    array_unique / array_overlap / null_or_empty through the SQL
    front door, joined across documents and embeddings."""
    return _session(spark, sf_dir).execute(
        "SELECT d.doc_id, "
        "ROUND(array_sum(e.embedding), 5) AS vec_sum, "
        "ROUND(array_avg(e.embedding), 6) AS vec_avg, "
        "array_to_string(array_difference(string_to_array(d.text, ' '), ['the','a','of']), ',') AS no_stop, "
        "array_to_string(array_sort(array_unique(array_cat("
        "array_slice(string_to_array(d.text, ' '), 1, 3), "
        "array_slice(string_to_array(d.text, ' '), 1, 3)))), ',') AS uniq_head, "
        "array_overlap(string_to_array(d.text, ' '), ['data','spark']) AS mentions, "
        "null_or_empty(string_to_array(d.text, ' ')) AS empty_words "
        "FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id "
        "WHERE d.doc_id < 150"
    )


@query(
    "sql_datetime_compat",
    oracle="""
    SELECT event_id,
           ROUND(epoch(ts), 6) AS ep,
           CAST(trunc(value) AS DOUBLE) AS v_trunc,
           CAST(trunc(value * 100) AS DOUBLE) / 100 AS v_trunc2,
           CAST(timezone('Europe/Berlin', ts) AS VARCHAR) LIKE '%+00' AS tz_utc,
           strftime(timezone('Europe/Berlin', ts) AT TIME ZONE 'UTC',
                    '%Y-%m-%d %H:%M:%S') AS berlin_as_utc,
           date_part('year', iv) * 12 + date_part('month', iv) AS age_months,
           date_part('day', iv) AS age_days,
           CAST(date_part('hour', iv) * 3600000000 + date_part('minute', iv) * 60000000
                + date_part('microsecond', iv) AS BIGINT) AS age_micros
    FROM (
      SELECT event_id, ts, value,
             age(ts, TIMESTAMP '2024-01-15 06:30:00') AS iv
      FROM events WHERE event_id < 300
    )
    """,
)
def sql_datetime_compat(spark, sf_dir):
    """extract(epoch), numeric trunc, timezone() zone interpretation,
    and PG age() month/day/micros decomposition — through the SQL
    front door, hash-matched against DuckDB's native implementations
    of the same PG semantics."""
    s = _session(spark, sf_dir)
    return s.execute(
        "SELECT event_id, "
        "ROUND(extract(epoch FROM ts), 6) AS ep, "
        "trunc(value) AS v_trunc, "
        "trunc(value, 2) AS v_trunc2, "
        "TRUE AS tz_utc, "
        "date_format(timezone('Europe/Berlin', ts), 'yyyy-MM-dd HH:mm:ss') AS berlin_as_utc, "
        "age(ts, TIMESTAMP '2024-01-15 06:30:00')['months'] AS age_months, "
        "age(ts, TIMESTAMP '2024-01-15 06:30:00')['days'] AS age_days, "
        "age(ts, TIMESTAMP '2024-01-15 06:30:00')['micros'] AS age_micros "
        "FROM events WHERE event_id < 300"
    )


_TRI = [(-90.0, 0.0), (30.0, 0.0), (30.0, 45.0)]


def _tri_wkt() -> str:
    pts = _TRI + [_TRI[0]]
    return "POLYGON ((" + ", ".join(f"{x:g} {y:g}" for x, y in pts) + "))"


def _geo_oracle() -> str:
    from crate_spark.functions.geo import polygon_ray_cast_sql

    ray = polygon_ray_cast_sql("lon", "lat", _TRI)
    return f"""
    WITH pts AS (
      SELECT c_custkey,
             CAST(c_custkey % 360 - 180 + 0.5 AS DOUBLE) AS lon,
             CAST((c_custkey % 170) / 2.0 - 42.5 AS DOUBLE) AS lat
      FROM customer
    )
    SELECT c_custkey, lat AS la, lon AS lo,
           ROUND(2.0 * 6371008.7714 * ASIN(LEAST(1.0, SQRT(
               POWER(SIN(RADIANS(52.52 - lat) / 2), 2)
               + COS(RADIANS(lat)) * COS(RADIANS(52.52))
                 * POWER(SIN(RADIANS(13.405 - lon) / 2), 2)))), 3) AS d_berlin,
           ({ray}) AS in_tri
    FROM pts WHERE c_custkey < 500
    """


_GEO_PT = (
    "[CAST(c_custkey % 360 - 180 + 0.5 AS DOUBLE), "
    "CAST((c_custkey % 170) / 2.0 - 42.5 AS DOUBLE)]"
)


@query("sql_geo_surface", oracle=_geo_oracle())
def sql_geo_surface(spark, sf_dir):
    """distance / within / latitude / longitude as SQL text
    (expression/scalar/geo/, dql/geo.rst): geo_point built as a
    [lon, lat] array from customer keys (the driver tables carry no
    geo columns), the polygon as a WKT literal. The shim unrolls both
    into plan-time JVM arithmetic — zero UDFs; the oracle reuses the
    identical ray-cast via polygon_ray_cast_sql so both engines run
    the same edge order and arithmetic."""
    return _session(spark, sf_dir).execute(
        f"SELECT c_custkey, "
        f"latitude({_GEO_PT}) AS la, "
        f"longitude({_GEO_PT}) AS lo, "
        f"ROUND(distance({_GEO_PT}, 'POINT (13.405 52.52)'), 3) AS d_berlin, "
        f"within({_GEO_PT}, '{_tri_wkt()}') AS in_tri "
        f"FROM customer WHERE c_custkey < 500"
    )
