"""Fulltext MATCH queries over the documents table.

Reference parity: ``MATCH(col, 'query')``
(``expression/predicate/MatchPredicate.java:85-98``) with
best_fields-OR / AND / phrase modes and a `_score`-ordered top-k.
Scoring is declared classic BM25 (see operators/fulltext.py docstring)
— deterministic and oracle-reproducible, unlike storage-coupled
Lucene BM25 (SURVEY.md §7 hard part (d)).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crate_spark.operators.fulltext import bm25_scores, match_all, match_any, match_phrase
from crate_spark.queries import query
from crate_spark.session import load_tables

#: DuckDB spelling of the tokenizer in operators/fulltext.py.
_DUCK_TOKS = (
    "string_split(trim(regexp_replace(lower({c}), '[^a-z0-9]+', ' ', 'g')), ' ')"
)


@query(
    "match_boolean_modes",
    oracle=f"""
    SELECT doc_id,
           list_contains({_DUCK_TOKS.format(c='text')}, 'spark')
             OR list_contains({_DUCK_TOKS.format(c='text')}, 'vector') AS m_any,
           list_contains({_DUCK_TOKS.format(c='text')}, 'spark')
             AND list_contains({_DUCK_TOKS.format(c='text')}, 'vector') AS m_all,
           CONCAT(' ', array_to_string({_DUCK_TOKS.format(c='text')}, ' '), ' ')
             LIKE '% fast sort %' AS m_phrase
    FROM documents WHERE doc_id < 300
    """,
)
def match_boolean_modes(spark, sf_dir):
    """MATCH modes: OR (best_fields default), AND, phrase."""
    t = load_tables(spark, sf_dir)
    d = t["documents"].filter(F.col("doc_id") < 300)
    return d.select(
        "doc_id",
        match_any("text", "spark vector").alias("m_any"),
        match_all("text", "spark vector").alias("m_all"),
        match_phrase("text", "fast sort").alias("m_phrase"),
    )


@query(
    "match_score_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, UNNEST({_DUCK_TOKS.format(c='text')}) AS tok FROM documents
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
def match_score_topk(spark, sf_dir):
    """MATCH + ORDER BY _score DESC LIMIT k — BM25 (k1=1.2, b=0.75)
    computed distributed; ties broken by doc_id."""
    t = load_tables(spark, sf_dir)
    scores = bm25_scores(t["documents"], "spark vector window")
    return (
        scores.orderBy(F.col("_score").desc(), F.col("doc_id"))
        .limit(20)
        .select("doc_id", F.round("_score", 6).alias("score"))
    )


@query(
    "match_filter_then_query",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE lang = 'en'
      AND list_contains({_DUCK_TOKS.format(c='text')}, 'vector')
      AND n_chars > 100
    """,
)
def match_filter_then_query(spark, sf_dir):
    """MATCH combined with structured predicates — the common
    filtered-search shape (WHERE MATCH(...) AND attr = ...)."""
    t = load_tables(spark, sf_dir)
    d = t["documents"]
    return (
        d.filter(
            (F.col("lang") == "en")
            & match_any("text", "vector")
            & (F.col("n_chars") > 100)
        ).select("doc_id", "lang", "n_chars")
    )
