"""Training-data pipeline operators: deterministic splits, stratified
sampling, domain mixing, PII redaction, quality gating, sequence
packing.

LLM-pipeline extension (no reference analog). Everything here is
deterministic — splits and samples key off md5 of a stable id, never
``rand()`` — so runs are reproducible, incremental re-runs keep
documents in the same split (the property that actually matters for
train/test hygiene at 100 TB: adding data must never migrate an old
doc from test into train), and every op has an exact DuckDB twin.

Scale notes:
- split/mix/redact/quality are pure map-side column expressions —
  zero shuffles, full codegen.
- stratified top-k per stratum is one shuffle on the stratum key.
- sequence packing is one shuffle on the pack key, then a per-group
  first-fit pass in Arrow batches (applyInPandas).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Spark-side md5-bucket in [0, 100): deterministic, engine-portable.
#: DuckDB twin: CAST(concat('0x', substr(md5(CAST(id AS VARCHAR)),1,8)) AS BIGINT) % 100


def hash_bucket(id_col, buckets: int = 100) -> F.Column:
    """Stable bucket from the first 8 hex digits of md5(id)."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")
        % buckets
    )


def train_split(id_col, train_pct: int = 98, val_pct: int = 1) -> F.Column:
    """'train' / 'val' / 'test' by md5 bucket — stable under re-runs."""
    b = hash_bucket(id_col)
    return (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def stratified_take(
    df: DataFrame, stratum_col: str, id_col: str, n_per_stratum: int
) -> DataFrame:
    """Deterministic 'first n per stratum' in md5 order — unbiased
    w.r.t. any natural ordering of the data, reproducible across runs.
    One shuffle on the stratum key."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(stratum_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def domain_mix(df: DataFrame, id_col: str, weights: dict[str, float], domain_col: str) -> DataFrame:
    """Down-sample each domain to ``weights[domain]`` (0..1 keep rate)
    via the hash bucket — deterministic weighted mixing, map-side only."""
    b = hash_bucket(id_col, 10_000)
    keep = F.lit(False)
    expr = None
    for dom, w in weights.items():
        cond = (F.col(domain_col) == dom) & (b < int(w * 10_000))
        expr = cond if expr is None else (expr | cond)
    other = ~F.col(domain_col).isin(*weights.keys())
    return df.filter(expr | other if expr is not None else keep)


#: PII patterns — e-mail, long digit runs (phone/ids), IPv4.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "number": r"\d{6,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def redact_pii(text_col) -> F.Column:
    """Replace every PII match with a typed placeholder token."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    for name, pat in PII_PATTERNS.items():
        col = F.regexp_replace(col, pat, f"<{name}>")
    return col


def pii_counts(text_col) -> dict[str, F.Column]:
    """Per-pattern match counts (JVM regexp_count — no Python)."""
    return {
        name: F.regexp_count(
            F.col(text_col) if isinstance(text_col, str) else text_col, F.lit(pat)
        )
        for name, pat in PII_PATTERNS.items()
    }


def quality_gate(
    text_col,
    *,
    min_words: int = 5,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_punct_ratio: float = 0.30,
) -> F.Column:
    """Gopher-style rule gate → the first failing rule name, or 'keep'.

    Rules (C4/Gopher lineage, Rae et al. 2021 §A1.1): word-count
    bounds, mean-word-length window, symbol ratio. Pure codegen."""
    from crate_spark.operators.text import punct_ratio, token_count, words_of

    n = token_count(text_col)
    mean_len = F.aggregate(
        words_of(text_col), F.lit(0).cast("double"), lambda acc, w: acc + F.length(w)
    ) / F.greatest(n, F.lit(1))
    return (
        F.when(n < min_words, F.lit("too_short"))
        .when(n > max_words, F.lit("too_long"))
        .when(mean_len < min_mean_word_len, F.lit("words_too_short"))
        .when(mean_len > max_mean_word_len, F.lit("words_too_long"))
        .when(punct_ratio(text_col) > max_punct_ratio, F.lit("too_much_punct"))
        .otherwise(F.lit("keep"))
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    *,
    max_tokens_per_pack: int,
    pack_key_col: str | None = None,
) -> DataFrame:
    """Greedy first-fit-decreasing packing of documents into training
    sequences of ≤ ``max_tokens_per_pack`` tokens.

    Output: (id, n_tokens, pack_key, pack_id, pack_tokens). Documents
    longer than the budget get a singleton pack. Packing runs per
    ``pack_key_col`` group (default: a hash bucket over ids so groups
    are bounded) — one shuffle, then Arrow-batched first-fit inside
    each group. Deterministic: docs are processed in (tokens desc, id)
    order."""
    from pyspark.sql.types import LongType, StructField, StructType

    key = (
        F.col(pack_key_col)
        if pack_key_col
        else hash_bucket(id_col, 64).alias("_pk")
    )
    prepped = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(token_count_col).cast("long").alias("n_tokens"),
        key.cast("long").alias("pack_key"),
    )
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("n_tokens", LongType()),
            StructField("pack_key", LongType()),
            StructField("pack_id", LongType()),
            StructField("pack_tokens", LongType()),
        ]
    )

    def _pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["n_tokens", "id"], ascending=[False, True]).reset_index(
            drop=True
        )
        pack_ids, totals = [], []  # totals[i] = tokens in open pack i
        assigned = []
        for tok in pdf["n_tokens"]:
            placed = None
            for i, t in enumerate(totals):
                if t + tok <= max_tokens_per_pack:
                    placed = i
                    break
            if placed is None:
                totals.append(tok)
                placed = len(totals) - 1
            else:
                totals[placed] += tok
            assigned.append(placed)
        pdf["pack_id"] = pd.array(assigned, dtype="int64")
        pdf["pack_tokens"] = pdf["pack_id"].map(lambda i: totals[i])
        return pdf[["id", "n_tokens", "pack_key", "pack_id", "pack_tokens"]]

    return prepped.groupBy("pack_key").applyInPandas(_pack, schema)


def normalized_words(text_col) -> F.Column:
    """Normalized word array (operators/text.words_of: lowercase,
    collapse whitespace, split) — the shared canonical form, so
    contamination grams and dedup shingles agree."""
    from crate_spark.operators.text import words_of

    return words_of(text_col)


def ngram_hashes(text_col, n: int = 8) -> F.Column:
    """xxhash64 of every word n-gram of the text — the unit of
    benchmark-contamination matching. Pure JVM higher-order
    expressions: sequence + slice + hash, no explode until the
    caller chooses to."""
    words = normalized_words(text_col)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(0))),
        lambda i: F.xxhash64(F.array_join(F.slice(words, i, n), " ")),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
    max_overlaps: int = 0,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word ``n``-gram with an evaluation/benchmark set (the standard
    train-test-overlap hygiene pass, cf. GPT-3 appendix C / PaLM
    'data contamination').

    Returns ``docs`` + ``n_contaminated_ngrams`` + ``contaminated``.

    Scale shape: the benchmark gram set is aggregated FIRST (distinct
    hashes — typically thousands of rows even for large benchmarks)
    and broadcast; the 100 TB training side then left-semi-probes it
    map-side inside one explode pass — the fact table never shuffles.
    """
    bench_grams = (
        benchmark.select(
            F.explode(ngram_hashes(bench_text_col, n)).alias("gram")
        )
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col), F.explode(ngram_hashes(text_col, n)).alias("gram")
    )
    overlap = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated_ngrams"))
    )
    return (
        docs.join(overlap, id_col, "left")
        .withColumn(
            "n_contaminated_ngrams",
            F.coalesce(F.col("n_contaminated_ngrams"), F.lit(0)),
        )
        .withColumn(
            "contaminated", F.col("n_contaminated_ngrams") > max_overlaps
        )
    )


def repetition_metrics(text_col) -> dict[str, F.Column]:
    """Gopher repetition rules (Rae et al. 2021 §A1.1): fraction of
    duplicate lines / paragraphs / words within a document. All pure
    higher-order expressions — zero shuffles, computed in the scan."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col

    def _dup_frac(parts: F.Column) -> F.Column:
        kept = F.filter(parts, lambda x: F.length(F.trim(x)) > 0)
        total = F.size(kept)
        return F.when(total > 0,
            (total - F.size(F.array_distinct(kept))) / total
        ).otherwise(F.lit(0.0))

    words = normalized_words(col)
    return {
        "dup_line_frac": _dup_frac(F.split(col, "\n")),
        "dup_para_frac": _dup_frac(F.split(col, "\n\n")),
        "dup_word_frac": F.when(F.size(words) > 0,
            (F.size(words) - F.size(F.array_distinct(words))) / F.size(words)
        ).otherwise(F.lit(0.0)),
    }


def shard_layout(
    df: DataFrame, id_col: str, n_shards: int
) -> DataFrame:
    """Deterministic output sharding: md5-bucket the stable id into
    ``n_shards`` (the final write layout of a training-data run —
    stable under re-runs and data growth, like train_split). The
    caller writes with ``.repartition(n_shards, 'shard')
    .write.partitionBy('shard')`` so each output shard is one
    partition's sequential write."""
    return df.withColumn("shard", hash_bucket(id_col, n_shards))
