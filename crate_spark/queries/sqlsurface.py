"""SQL-front-door queries: crate-isms that exercise CrateSession.execute
end-to-end (dialect shim + engine dispatch), each with a DuckDB oracle.

These are the r2-VERDICT gap closers: OBJECT subscripts in SQL
(``SubscriptObjectFunction.java``, AstBuilder subscript grammar),
system doc columns (``metadata/doc/SysColumns.java:49-63``),
MATCH + ORDER BY ``_score`` (``MatchPredicate.java:85-98``), and
quantified subquery comparisons (``any/AnyOperator.java:56``).

Registered FIRST in queries._MODULES so every one of them gets a
driver CORRECTNESS row in its first round.
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
    "sql_object_subscript",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS kv,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 AS kv_mod
    FROM events WHERE event_id < 400
    """,
)
def sql_object_subscript(spark, sf_dir):
    """``props['k']`` through the SQL front door — CrateDB's idiomatic
    OBJECT access (AstBuilder subscript rules,
    ``SubscriptObjectFunction.java``). The engine stores dynamic
    objects as JSON strings, so the shim rewrites the subscript to a
    JVM-side get_json_object path extraction (no UDF)."""
    return _session(spark, sf_dir).execute(
        "SELECT event_id, props['k']::bigint AS kv, "
        "props['k']::bigint % 7 AS kv_mod "
        "FROM events WHERE event_id < 400"
    )


@query(
    "sql_sys_columns",
    oracle="""
    SELECT md5(j) AS _id, j AS _raw
    FROM (
      SELECT CAST(to_json(struct_pack(
               n_nationkey := n_nationkey,
               n_name := n_name,
               n_regionkey := n_regionkey)) AS VARCHAR) AS j
      FROM nation WHERE n_nationkey < 20
    )
    """,
)
def sql_sys_columns(spark, sf_dir):
    """``SELECT _id, _raw FROM t`` — the system doc columns every
    reference table exposes (``SysColumns.java:49-63``): _raw is the
    row as JSON, _id a deterministic row hash. The oracle rebuilds the
    identical JSON with DuckDB struct_pack/to_json."""
    return _session(spark, sf_dir).execute(
        "SELECT _id, _raw FROM nation WHERE n_nationkey < 20"
    )


@query(
    "sql_match_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(string_split(trim(regexp_replace(lower(text),
                    '[^a-z0-9]+', ' ', 'g')), ' ')) AS tok
      FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
           WHERE tok IN ('spark', 'vector', 'window') GROUP BY doc_id, tok),
    dft AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    scored AS (
      SELECT tf.doc_id,
             SUM(LN(1.0 + (stats.n_docs - dft.df + 0.5) / (dft.df + 0.5)) *
                 (tf.tf * 2.2) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
             ) AS s
      FROM tf JOIN dft USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, ROUND(s, 6) AS score
    FROM scored
    ORDER BY s DESC, doc_id
    LIMIT 20
    """,
)
def sql_match_score(spark, sf_dir):
    """``MATCH(text, '...') ... ORDER BY _score DESC LIMIT k`` through
    SQL — relevance-ranked search exactly as the reference spells it
    (``MatchPredicate.java``, ``SysColumns`` _score). The engine
    rewrites it onto the distributed BM25 join; must equal the
    DataFrame-API match_score_topk result."""
    return _session(spark, sf_dir).execute(
        "SELECT doc_id, round(_score, 6) AS score FROM documents "
        "WHERE MATCH(text, 'spark vector window') "
        "ORDER BY _score DESC, doc_id LIMIT 20"
    )


@query(
    "pred_any_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderkey < 500
      AND o_totalprice > ANY (SELECT c_acctbal FROM customer
                              WHERE c_mktsegment = 'BUILDING')
      AND o_totalprice < ALL (SELECT 2 * max(c_acctbal) FROM customer)
    """,
)
def pred_any_subquery(spark, sf_dir):
    """Quantified subquery comparisons ``> ANY (SELECT ...)`` /
    ``< ALL (SELECT ...)`` (``any/AnyOperator.java:56``): Spark only
    supports IN/EXISTS subqueries, so the shim rewrites to scalar
    min/max subqueries. DuckDB evaluates the quantifiers natively."""
    return _session(spark, sf_dir).execute(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_orderkey < 500 "
        "AND o_totalprice > ANY (SELECT c_acctbal FROM customer "
        "                        WHERE c_mktsegment = 'BUILDING') "
        "AND o_totalprice < ALL (SELECT 2 * max(c_acctbal) FROM customer)"
    )
