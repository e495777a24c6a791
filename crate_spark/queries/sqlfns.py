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
    """One CrateSession per (SparkSession, sf_dir), memoized: these
    queries are read-only SELECTs, and CrateSession.__init__ spends
    ~2.3 s registering the sys/information_schema views (65 temp
    views) — per-call construction dominated the MATCH headliner's
    bench wall (r11 profile: 2.37 s of 2.84 s)."""
    from crate_spark.engine import CrateSession

    key = (id(spark), sf_dir)
    hit = _SESSIONS.get(key)
    if hit is None:
        hit = _SESSIONS[key] = CrateSession(spark, sf_dir)
    return hit


_SESSIONS: dict = {}


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
           CAST(epoch(ts) - epoch(timezone('Europe/Berlin', ts)) AS BIGINT)
             IN (3600, 7200) AS tz_utc,
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
        # Berlin wall time -> UTC instant is 1h (winter) / 2h (summer)
        # earlier; epoch difference is render-tz-independent (the old
        # form asserted the VARCHAR render ended '+00', which depends
        # on the oracle host's session TimeZone)
        "CAST(extract(epoch FROM ts) - "
        "     extract(epoch FROM timezone('Europe/Berlin', ts)) AS BIGINT) "
        "  IN (3600, 7200) AS tz_utc, "
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


@query(
    "sql_string_fn_surface",
    oracle="""
    SELECT doc_id,
           strpos(text, 'the') AS pos_the,
           starts_with(text, 'The') AS starts_the,
           printf('%s-%s', lang, source) AS fmt,
           to_base64(lang::BLOB) AS b64,
           lower(hex(source::BLOB)) AS hexed,
           '\\x' || lower(hex(lang::BLOB)) AS roundtrip,
           CASE WHEN doc_id % 3 = 0 THEN false ELSE doc_id % 3 = 1 END AS i3vl,
           array_to_string(json_keys('{"k' || (doc_id % 3)::VARCHAR || '":1,"z":2}'), ',') AS objkeys,
           source || '.example.com' AS host,
           8080 AS port,
           '/d/' || doc_id::VARCHAR AS upath,
           'q=1' AS uq,
           'top' AS ufrag,
           'https' AS uscheme,
           CASE WHEN regexp_matches(text, '([a-z]+) ([a-z]+)')
                THEN regexp_extract(text, '([a-z]+) ([a-z]+)', 1) || '|' ||
                     regexp_extract(text, '([a-z]+) ([a-z]+)', 2) END AS rx
    FROM documents WHERE doc_id < 200
    """,
)
def sql_string_fn_surface(spark, sf_dir):
    """strpos / starts_with / format / encode / decode / ignore3vl /
    object_keys / parse_uri / scalar regexp_matches — the round-3
    _FN_TEMPLATES additions, end-to-end as SQL text through the shim
    (reference scalar classes: StrposFunction, StartsWithFunction,
    FormatFunction, EncodeFunction, DecodeFunction, Ignore3vlFunction,
    ObjectKeysFunction, ParseUriFunction, MatchesFunction). Every
    expansion is a Spark builtin expression (codegen), no UDFs."""
    uri = (
        "concat('https://', source, '.example.com:8080/d/', "
        "cast(doc_id AS string), '?q=1#top')"
    )
    return _session(spark, sf_dir).execute(
        "SELECT doc_id, "
        "strpos(text, 'the') AS pos_the, "
        "starts_with(text, 'The') AS starts_the, "
        "format('%s-%s', lang, source) AS fmt, "
        "encode(lang, 'base64') AS b64, "
        "encode(source, 'hex') AS hexed, "
        # decode returns the reference's '\\x..' hex TEXT render (the
        # reference has no bytea runtime type; EncodeDecodeFunctionTest
        # decode('MTIzAAE=','base64') = '\\x3132330001') — r10 fix of a
        # same-spelling blind spot where both sides asserted the plain
        # round-tripped text
        "cast(decode(encode(lang, 'base64'), 'base64') AS string) AS roundtrip, "
        "ignore3vl(CASE WHEN doc_id % 3 = 0 THEN NULL "
        "          ELSE doc_id % 3 = 1 END) AS i3vl, "
        "array_to_string(object_keys(concat('{\"k', cast(doc_id % 3 AS string), "
        "'\":1,\"z\":2}')), ',') AS objkeys, "
        f"parse_uri({uri})['hostname'] AS host, "
        f"parse_uri({uri})['port'] AS port, "
        f"parse_uri({uri})['path'] AS upath, "
        f"parse_uri({uri})['query'] AS uq, "
        f"parse_uri({uri})['fragment'] AS ufrag, "
        f"parse_uri({uri})['scheme'] AS uscheme, "
        "array_to_string(regexp_matches(text, '([a-z]+) ([a-z]+)'), '|') AS rx "
        "FROM documents WHERE doc_id < 200"
    )


@query(
    "sql_datetime_fn_surface",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d %H:%M') AS tc,
           strftime(o_orderdate, '%Y/%m/%d') AS df,
           TIME_BUCKET(INTERVAL '1 week', o_orderdate::TIMESTAMP,
                       TIMESTAMP '1992-01-01 00:00:00') AS wk,
           TIME_BUCKET(INTERVAL '6 hours', o_orderdate::TIMESTAMP,
                       TIMESTAMP '1992-01-01 00:00:00') AS h6
    FROM orders WHERE o_orderkey < 500
    """,
)
def sql_datetime_fn_surface(spark, sf_dir):
    """to_char (PG templates over arbitrary expressions — the r3 fix),
    MySQL-style date_format, and date_bin with '::interval' and
    INTERVAL-literal strides, as SQL text (ToCharFunction,
    DateFormatFunction, DateBinFunction.java:41). All expand to
    plan-time date_format/epoch arithmetic — whole-stage codegen."""
    return _session(spark, sf_dir).execute(
        "SELECT o_orderkey, "
        "to_char(o_orderdate::timestamp, 'YYYY-MM-DD HH24:MI') AS tc, "
        "date_format('%Y/%m/%d', o_orderdate::timestamp) AS df, "
        "date_bin('1 week'::interval, o_orderdate::timestamp, "
        "         '1992-01-01T00:00:00'::timestamp)"
        "::timestamp without time zone AS wk, "
        "date_bin(INTERVAL '6 hours', o_orderdate::timestamp, "
        "         '1992-01-01T00:00:00'::timestamp)"
        "::timestamp without time zone AS h6 "
        "FROM orders WHERE o_orderkey < 500"
        # NTZ output columns: PySpark collect() converts TIMESTAMP (TZ)
        # through the PYTHON process's local zone — a non-UTC driver
        # host would shift wk/h6 vs DuckDB's naive datetimes. NTZ
        # deserializes naively on both engines.
    )


@query(
    "sql_regexp_surface",
    oracle="""
    SELECT doc_id,
           regexp_replace(text, 'th[a-z]+', '<WORD>') AS first_only,
           regexp_replace(text, 'e', 'E', 'g') AS global_e,
           len(regexp_extract_all(text, '[Tt]he')) AS n_the
    FROM documents WHERE doc_id < 200
    """,
)
def sql_regexp_surface(spark, sf_dir):
    """regexp_replace default-first-only vs the ``g`` flag
    (ReplaceFunction; scalar-functions.rst: 'By default, only the
    first occurrence ... will be replaced') and regexp_count — CrateDB
    and DuckDB agree on first-only, Spark's builtin is global-only, so
    the shim splices the first match via regexp_instr/extract (all
    codegen; the r3 parity fix this query pins)."""
    return _session(spark, sf_dir).execute(
        "SELECT doc_id, "
        "regexp_replace(text, 'th[a-z]+', '<WORD>') AS first_only, "
        "regexp_replace(text, 'e', 'E', 'g') AS global_e, "
        "regexp_count(text, '[Tt]he') AS n_the "
        "FROM documents WHERE doc_id < 200"
    )


@query(
    "sql_array_subquery",
    oracle="""
    SELECT r.r_regionkey,
           (SELECT array_to_string(list(n.n_name ORDER BY n.n_name), ',')
            FROM nation n WHERE n.n_regionkey = r.r_regionkey) AS nations,
           (SELECT array_to_string(list(n.n_nationkey ORDER BY n.n_nationkey DESC), ',')
            FROM nation n WHERE n.n_regionkey = r.r_regionkey) AS keys_desc
    FROM region r
    """,
)
def sql_array_subquery(spark, sf_dir):
    """ARRAY(SELECT ... ORDER BY ...) — the PG array constructor over
    a correlated subquery (r3b shim addition): rewrites to a scalar
    subquery collecting (order-key, value) structs, array_sort keeps
    the declared order through shuffles. CSV-stringified for the
    cross-engine hash."""
    return _session(spark, sf_dir).execute(
        "SELECT r_regionkey, "
        "array_to_string(ARRAY(SELECT n_name FROM nation "
        "  WHERE n_regionkey = r_regionkey ORDER BY n_name), ',') AS nations, "
        "array_to_string(ARRAY(SELECT n_nationkey FROM nation "
        "  WHERE n_regionkey = r_regionkey ORDER BY n_nationkey DESC), ',') AS keys_desc "
        "FROM region"
    )


@query(
    "sql_agg_surface",
    oracle="""
    SELECT n_regionkey,
           any_value(n_regionkey) AS arb,
           ROUND(exp(avg(ln(n_nationkey + 1))), 6) AS gmean,
           count(DISTINCT n_name) AS approx_names,
           array_to_string(
             (SELECT (list(n2.n_name ORDER BY n2.n_name))[1:2]
              FROM nation n2 WHERE n2.n_regionkey = n.n_regionkey), '|'
           ) AS top2
    FROM nation n GROUP BY n_regionkey
    """,
)
def sql_agg_surface(spark, sf_dir):
    """Crate-only aggregates as SQL text (aggregation.rst):
    arbitrary (deterministic here: constant within each group),
    geometric_mean (exp-avg-ln expansion), hyperloglog_distinct
    (Spark HLL++ — exact at these cardinalities, matching the
    reference's sparse-mode exactness), and topk (top-k
    item/frequency structs from one collect_list; each n_name is
    unique so frequency ties resolve item-ascending = plain name
    order)."""
    return _session(spark, sf_dir).execute(
        "SELECT n_regionkey, "
        "arbitrary(n_regionkey) AS arb, "
        "ROUND(geometric_mean(n_nationkey + 1), 6) AS gmean, "
        "hyperloglog_distinct(n_name) AS approx_names, "
        "array_to_string(transform(topk(n_name, 2)['frequencies'], "
        "__s -> __s.item), '|') AS top2 "
        "FROM nation GROUP BY n_regionkey"
    )


@query(
    "streaming_rollup_events",
    oracle="""
    SELECT TIME_BUCKET(INTERVAL '15 minutes', ts) AS bucket,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 6) AS total
    FROM events
    GROUP BY bucket, event_type
    """,
)
def streaming_rollup_events(spark, sf_dir):
    """Structured Streaming with an EXACT oracle: the events table
    replayed through the file-source -> watermarked tumbling-window
    rollup (streaming/ingest.stream_windowed_rollup shape) drained
    with availableNow into a memory sink. The streaming result must
    hash-match DuckDB's batch TIME_BUCKET aggregate over the same
    rows — proving the streaming operator computes the batch answer
    (the Dataflow/beam equivalence batch == drained stream)."""
    import uuid

    from pyspark.sql import functions as F

    from crate_spark.session import apply_runtime_confs

    # no load_tables on this path — pin session tz (UTC) and parquet
    # confs ourselves so window alignment and the NTZ cast are
    # host-independent
    apply_runtime_confs(spark)
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    # the file-stream source wants a directory; select the one table
    # file out of the sf dir by glob
    src = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # ts may arrive as nanos-long (TIMESTAMP(NANOS) with nanosAsLong)
    # or as a timestamp type, depending on session confs
    ts_type = {f.name: f.dataType.simpleString() for f in schema.fields}["ts"]
    if ts_type == "bigint":
        ts = F.timestamp_micros((F.col("ts") / 1000).cast("bigint"))
    else:
        ts = F.col("ts").cast("timestamp")
    agg = (
        src.withColumn("__ts", ts)
        .withWatermark("__ts", "30 minutes")
        .groupBy(
            F.window("__ts", "15 minutes").alias("win"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(38,6)")).cast("double"), 6
            ).alias("total"),
        )
        # NTZ bucket: collect() converts TIMESTAMP (TZ) via the Python
        # process's local zone; NTZ deserializes naively like DuckDB
        .select(
            F.col("win.start").cast("timestamp_ntz").alias("bucket"),
            "event_type",
            "n",
            "total",
        )
    )
    name = f"stream_rollup_{uuid.uuid4().hex[:8]}"
    # streaming has no AQE to coalesce the state-store shuffle; bound
    # it explicitly instead of inheriting a batch-sized default.
    # (r11 A/B: the JVM windowed agg is state-store-bound, not
    # compute-bound — 16 beat both 4 (0.95 s) and 32 (1.28 s).)
    prev = spark.conf.get("spark.sql.shuffle.partitions", "200")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.sql(f"SELECT * FROM {name}")


@query(
    "sql_tvf_series",
    oracle="""
    SELECT gs.generate_series AS n,
           gs.generate_series * r.r_regionkey AS scaled
    FROM region r
    CROSS JOIN generate_series(1, 20, 3) gs
    ORDER BY r.r_regionkey, n
    """,
)
def sql_tvf_series(spark, sf_dir):
    """``FROM generate_series(start, stop, step)`` as a relation
    (TableFunctions.java, table-functions.rst) — the shim expands it
    to ``explode(sequence(...))`` with PG's empty-set guard (Spark's
    ``sequence`` auto-negates the step when stop < start; PG returns
    no rows). DuckDB evaluates its native generate_series."""
    return _session(spark, sf_dir).execute(
        "SELECT gs.generate_series AS n, "
        "gs.generate_series * r.r_regionkey AS scaled "
        "FROM region r CROSS JOIN generate_series(1, 20, 3) gs "
        "ORDER BY r.r_regionkey, n"
    )


@query(
    "sql_tvf_series_ts",
    oracle="""
    SELECT CAST(gs.generate_series AS TIMESTAMP) AS day,
           CAST(isodow(gs.generate_series) AS BIGINT) AS dow
    FROM generate_series(TIMESTAMP '2026-01-01', TIMESTAMP '2026-01-31',
                         INTERVAL 1 DAY) gs
    ORDER BY day
    """,
)
def sql_tvf_series_ts(spark, sf_dir):
    """Timestamp ``generate_series`` with an interval step — the
    reference requires step for timestamp bounds; the shim turns the
    ``::interval`` cast into a Spark INTERVAL literal inside
    ``sequence``."""
    return _session(spark, sf_dir).execute(
        # NTZ day column — collect() shifts TIMESTAMP (TZ) through the
        # Python host zone; NTZ deserializes naively like the oracle
        "SELECT generate_series::timestamp without time zone AS day, "
        "extract(dow FROM generate_series)::bigint AS dow "
        "FROM generate_series('2026-01-01'::timestamp, "
        "'2026-01-31'::timestamp, '1 day'::interval) gs "
        "ORDER BY day"
    )


@query(
    "sql_ident_surface",
    oracle="""
    SELECT n_name,
           CASE WHEN regexp_full_match(n_name, '^[a-z_][a-z0-9_]*$')
                THEN n_name
                ELSE '"' || replace(n_name, '"', '""') || '"' END AS quoted,
           lower(n_name) AS part1,
           CASE n_nationkey % 3 WHEN 0 THEN 'bigint'
                WHEN 1 THEN 'text' ELSE 'integer[]' END AS fmt
    FROM nation
    ORDER BY n_name
    """,
)
def sql_ident_surface(spark, sf_dir):
    """PG identifier tooling through SQL: ``quote_ident`` (quote only
    when needed, QuoteIdentFunction), ``parse_ident`` (split qualified
    names; 1-based subscript on the result), ``format_type`` (oid ->
    reference type name, FormatTypeFunction.java:61-84). The oracle
    reproduces each rule in DuckDB SQL."""
    return _session(spark, sf_dir).execute(
        "SELECT n_name, quote_ident(n_name) AS quoted, parts[1] AS part1, "
        "format_type(CASE k % 3 WHEN 0 THEN 20 "
        "            WHEN 1 THEN 25 ELSE 1007 END, NULL) AS fmt "
        "FROM (SELECT n_name, n_nationkey AS k, "
        "      parse_ident(n_name) AS parts FROM nation) t "
        "ORDER BY n_name"
    )


@query(
    "sql_tvf_regexp_docs",
    oracle="""
    SELECT doc_id, unnest(regexp_extract_all(text, '([a-z]+)ing', 1)) AS stem
    FROM documents WHERE doc_id < 100
    ORDER BY doc_id, stem
    """,
)
def sql_tvf_regexp_docs(spark, sf_dir):
    """CORRELATED ``regexp_matches`` in FROM — the table function
    reads a column of the left relation, one output row per match
    (``g`` flag). The shim emits a LATERAL subquery so Spark resolves
    the correlation; stays whole-stage codegen (regexp_extract_all +
    explode), no UDF."""
    return _session(spark, sf_dir).execute(
        "SELECT doc_id, groups[1] AS stem "
        "FROM documents, regexp_matches(text, '([a-z]+)ing', 'g') "
        "WHERE doc_id < 100 ORDER BY doc_id, stem"
    )


@query(
    "sql_window_filter",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(count(*) FILTER (WHERE o_totalprice > 100000)
               OVER (PARTITION BY o_custkey) AS BIGINT) AS n_big,
           CAST(ROUND(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F')
               OVER (PARTITION BY o_custkey), 2) AS DOUBLE) AS f_total
    FROM orders WHERE o_custkey < 200
    ORDER BY o_custkey, o_orderkey
    """,
)
def sql_window_filter(spark, sf_dir):
    """Aggregates as window functions WITH a FILTER clause
    (window-functions.rst FILTER grammar) — Spark rejects the form
    natively, so the shim rewrites the filter into a CASE-guarded
    argument (aggregates skip NULLs: identical semantics). DuckDB
    evaluates FILTER ... OVER natively."""
    return _session(spark, sf_dir).execute(
        "SELECT o_custkey, o_orderkey, "
        "count(*) FILTER (WHERE o_totalprice > 100000) "
        "    OVER (PARTITION BY o_custkey) AS n_big, "
        "CAST(ROUND(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F') "
        "    OVER (PARTITION BY o_custkey), 2) AS double) AS f_total "
        "FROM orders WHERE o_custkey < 200 "
        "ORDER BY o_custkey, o_orderkey"
    )


@query(
    "streaming_sessionize_events",
    oracle="""
    WITH brk AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM brk
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 6) AS total
    FROM sess GROUP BY user_id, sid
    """,
)
def streaming_sessionize_events(spark, sf_dir):
    """Custom STATEFUL streaming operator with an EXACT oracle: the
    events table replayed through ``applyInPandasWithState`` session
    windows (streaming/ingest.sessionize_stream) must hash-match the
    batch lag+gap sessionization DuckDB computes over the same rows —
    batch == drained stream for per-key mutable state, not just for
    windowed aggregates (streaming_rollup_events).

    Replay mechanics: the parquet file and ONE far-future sentinel
    event (a reserved user id) stream together as micro-batch 1, so
    the post-batch event-time watermark is already past every real
    session's last+gap; the engine's trailing no-data micro-batch
    (pinned on below — the replay depends on it) then fires every
    EventTimeTimeout in one pass so all sessions emit — the streaming
    equivalent of end-of-input flush. (r11 ran data and sentinel as
    separate micro-batches, which split the timeout flush across TWO
    extra batches — each batch costs ~1.2-2 s of state-store setup +
    per-key timeout processing, and the r12 measured split was 1440
    timeouts in the sentinel batch + 60 in the no-data batch; one
    combined data+sentinel batch removes a whole batch without
    changing a single emitted row.) Sentinel rows are filtered from
    the result. At 100 TB/day the same operator runs unbounded: state
    is one tuple per active user, evicted on emit; no flush is needed
    because live traffic advances the watermark.
    """
    import shutil
    import tempfile
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from crate_spark.session import apply_runtime_confs
    from crate_spark.streaming import sessionize_stream

    apply_runtime_confs(spark)
    stage = tempfile.mkdtemp(prefix="stream_sess_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{stage}/b0_events.parquet")
    # ts arrives as nanos-long (TIMESTAMP(NANOS) under nanosAsLong) or
    # as µs TIMESTAMP_NTZ, depending on how the table was generated
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_is_ns = dict(batch.dtypes)["ts"] == "bigint"
    # sentinel event: one reserved user, a day past the real maximum —
    # it rides the data micro-batch and advances the global watermark
    # (delay 0s) past every real session's last+gap timeout
    max_us = batch.agg(
        F.max(
            F.expr("ts div 1000")
            if ts_is_ns
            else F.expr(
                "timestampdiff(MICROSECOND,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            )
        )
    ).collect()[0][0]
    day_us = 86_400 * 1_000_000
    sent_us = max_us + day_us
    pq.write_table(
        pa.table(
            {
                "ts": pa.array(
                    [sent_us * 1000 if ts_is_ns else sent_us],
                    type=pa.int64() if ts_is_ns else pa.timestamp("us"),
                ),
                "user_id": pa.array([-1], type=pa.int64()),
                "value": pa.array([0.0], type=pa.float64()),
            }
        ),
        f"{stage}/b1_sentinel.parquet",
    )
    # both files load as ONE micro-batch (no maxFilesPerTrigger): the
    # sentinel rides with the data, so the post-batch watermark is
    # already global-max + a day and the single trailing no-data batch
    # flushes every session
    ts_ddl = "bigint" if ts_is_ns else "timestamp_ntz"
    src = (
        spark.readStream.schema(f"ts {ts_ddl}, user_id bigint, value double")
        .parquet(stage)
        .withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000"))
            if ts_is_ns
            # NTZ -> TZ is value-preserving in the UTC session
            else F.col("ts").cast("timestamp"),
        )
    )
    sessions = sessionize_stream(src, gap_minutes=30).filter(
        F.col("user_id") >= 0
    )
    name = f"stream_sessions_{uuid.uuid4().hex[:8]}"
    # bound the state-store shuffle (no AQE on streaming plans).
    # r11 optimization round measured the knob deliberately: 4
    # partitions serialize the per-key Python state work (17.7 s);
    # 16 vs 32 are equal within noise warm AND cold (fresh-process
    # A/B: cold 16.9/18.3 vs 17.6/17.6) — the fixed 16 stays, small
    # enough to bound state-store init in the driver's one-shot run.
    # Re-checked after the vectorized-emit rewrite (total ~4.4 s):
    # 16 vs 8 still equal within noise (4.1-4.6 both), 4 still worse
    # (5.6-7.0) — unchanged.
    prev = spark.conf.get("spark.sql.shuffle.partitions", "200")
    # the flush depends on the trailing no-data micro-batch firing the
    # event-time timeouts — pin the engine default rather than relying
    # on it (VERDICT r11)
    prev_ndb = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    try:
        q = (
            sessions.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prev_ndb)
        shutil.rmtree(stage, ignore_errors=True)
    # NTZ timestamps deserialize naively, like DuckDB's (rollup twin)
    return spark.sql(f"SELECT * FROM {name}").select(
        "user_id",
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_end").cast("timestamp_ntz").alias("session_end"),
        "n_events",
        F.round("total", 6).alias("total"),
    )
