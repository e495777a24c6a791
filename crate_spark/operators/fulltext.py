"""Fulltext MATCH: tokenization, boolean match modes, BM25 scoring.

Reference: ``expression/predicate/MatchPredicate.java:85-98`` (MATCH
with ``using best_fields/phrase``), Lucene analyzers
(``metadata/FulltextAnalyzerResolver.java``), BM25 ``_score``.

Design (SURVEY.md §4.3 item 3): a standard-analyzer-ish tokenizer
(lowercase, split on non-alphanumeric) + three match modes + a
DOCUMENTED deterministic score: classic BM25 (k1=1.2, b=0.75,
idf = ln(1 + (N-df+0.5)/(df+0.5)), tf-part with (k1+1) numerator).
This is intentionally *declared* scoring — not bit-compatible with
Lucene's internals — and is exactly reproducible in SQL, so the
oracle can verify it.

Scale design: corpus stats (N, avgdl) are computed as a 1-row
aggregate and broadcast — never collected to the driver; term
frequencies shuffle only (doc, term) pairs for terms IN the query
(the filter happens before the shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokenize(c) -> Column:
    """Standard-analyzer-ish: lowercase, split on non-alphanumeric runs."""
    col = F.col(c) if isinstance(c, str) else c
    cleaned = F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))
    return F.when(F.length(cleaned) > 0, F.split(cleaned, " ")).otherwise(
        F.array().cast("array<string>")
    )


def match_any(text_col, query: str) -> Column:
    """MATCH(col, 'q') with OR operator (default best_fields mode)."""
    toks = tokenize(text_col)
    terms = [t for t in query.lower().split() if t]
    out = F.lit(False)
    for t in terms:
        out = out | F.array_contains(toks, t)
    return out


def match_all(text_col, query: str) -> Column:
    """MATCH with AND operator — all terms present."""
    toks = tokenize(text_col)
    out = F.lit(True)
    for t in query.lower().split():
        out = out & F.array_contains(toks, t)
    return out


def match_phrase(text_col, query: str) -> Column:
    """MATCH using phrase — consecutive-token containment."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    norm = F.concat(F.lit(" "), F.array_join(tokenize(col), " "), F.lit(" "))
    phrase = " " + " ".join(query.lower().split()) + " "
    return norm.contains(phrase)


def bm25_scores(
    docs: DataFrame,
    query: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 score for ``query`` (docs with no matching
    term are absent). Output: (id_col, _score).

    All corpus statistics stay distributed: doc lengths are a groupBy,
    (N, avgdl) a broadcast 1-row aggregate, document frequencies a
    broadcast per-term count. One shuffle of (doc, term in query).
    """
    terms = [t for t in query.lower().split() if t]
    toks = docs.select(F.col(id_col), F.explode(tokenize(text_col)).alias("_tok"))
    dl = toks.groupBy(id_col).agg(F.count("*").alias("_dl"))
    stats = dl.agg(
        F.count("*").alias("_n_docs"), F.avg("_dl").alias("_avgdl")
    )
    tf = (
        toks.filter(F.col("_tok").isin(terms))
        .groupBy(id_col, "_tok")
        .agg(F.count("*").alias("_tf"))
    )
    df_t = tf.groupBy("_tok").agg(F.count("*").alias("_df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n_docs") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
    )
    tf_part = (F.col("_tf") * (k1 + 1)) / (
        F.col("_tf") + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl"))
    )
    return (
        tf.join(F.broadcast(df_t), "_tok")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn("_term_score", idf * tf_part)
        .groupBy(id_col)
        .agg(F.sum("_term_score").alias("_score"))
    )
