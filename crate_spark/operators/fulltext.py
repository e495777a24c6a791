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
    """Standard-analyzer-ish: lowercase, split on non-alphanumeric runs.

    ONE regex pass: split directly on the separator runs and drop the
    empty edge tokens (the previous replace+trim+split form ran two
    regexes over the full text — the dominant cost of BM25 scans on
    long documents)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.filter(
        F.split(F.lower(col), "[^a-z0-9]+"), lambda t: t != ""
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

    Zero wide shuffles: term frequencies and document length are
    ROW-LOCAL array expressions (``size(filter(tokens, = term))`` per
    query term — queries have a handful of terms, so this unrolls to
    a few JVM HOFs, never an explode), and ALL corpus statistics
    (N, avgdl, per-term document frequencies) ride ONE broadcast
    1-row aggregate. The only exchange in the plan is that
    aggregate's partial->final step; the scoring pass itself is a
    pure map over the corpus scan. (The previous form exploded every
    token twice and shuffled three times — fulltext was the one
    headline subsystem whose plan didn't meet the repo's own
    shuffle-minimal bar once sql_match_score joined the bench.)
    """
    # dedupe, preserving order: a repeated query term contributes once
    # (the reference sums per UNIQUE term too)
    from crate_spark.session import spread_small_input

    terms = list(dict.fromkeys(t for t in query.lower().split() if t))
    # tokenization is the dominant per-row cost of both scoring scans;
    # a single-row-group corpus file runs it on ONE core however many
    # exist — spread after projecting to the two needed columns
    # (size-gated no-op at scale; r11: bm25 sf0.1 1.09 s -> 0.81 s)
    toked = spread_small_input(
        docs.select(F.col(id_col), F.col(text_col))
    ).select(
        F.col(id_col), tokenize(text_col).alias("_toks")
    ).withColumn("_dl", F.size("_toks"))
    tf_cols = [
        F.size(F.filter("_toks", lambda x: x == F.lit(t))).alias(f"_tf{i}")
        for i, t in enumerate(terms)
    ]
    scored_input = toked.select(F.col(id_col), F.col("_dl"), *tf_cols)
    stats = scored_input.agg(
        F.count("*").alias("_n_docs"),
        F.avg("_dl").alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    any_match = F.lit(False)
    for i in range(len(terms)):
        any_match = any_match | (F.col(f"_tf{i}") > 0)
    score = F.lit(0.0)
    for i in range(len(terms)):
        tf_i = F.col(f"_tf{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n_docs") - F.col(f"_df{i}") + 0.5)
            / (F.col(f"_df{i}") + 0.5)
        )
        tf_part = (tf_i * (k1 + 1)) / (
            tf_i + k1 * (1 - b + b * F.col("_dl") / F.col("_avgdl"))
        )
        score = score + F.when(tf_i > 0, idf * tf_part).otherwise(F.lit(0.0))
    return (
        scored_input.filter(any_match)
        .crossJoin(F.broadcast(stats))
        .select(F.col(id_col), score.alias("_score"))
    )
