"""Text-analysis & deduplication queries over the documents table.

LLM-pipeline extension (BASELINE north star): language ID, quality
scoring, token counting, fingerprinting, exact + MinHash/SimHash +
n-gram-Jaccard dedup. All JVM expressions (no Python UDFs); xxhash64-
based operators (minhash/simhash) have no DuckDB twin -> rows-only
checks plus property unit tests in tests/test_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crate_spark.operators import dedup as dd
from crate_spark.operators import text as tx
from crate_spark.queries import query
from crate_spark.session import load_tables

#: DuckDB spelling of the normalized word array.
_DUCK_WORDS = "string_split(trim(regexp_replace(lower({c}), '\\s+', ' ', 'g')), ' ')"


def _duck_sw_array(lang: str) -> str:
    return "[" + ",".join(f"'{w}'" for w in tx.STOPWORDS[lang]) + "]"


def _duck_hits(lang: str) -> str:
    return (
        f"len(list_filter({_DUCK_WORDS.format(c='text')}, "
        f"x -> list_contains({_duck_sw_array(lang)}, x)))"
    )


@query(
    "text_stats",
    oracle=f"""
    SELECT doc_id,
           len({_DUCK_WORDS.format(c='text')}) AS n_words,
           len(list_distinct({_DUCK_WORDS.format(c='text')})) AS n_unique,
           length(text) AS n_chars_actual,
           len(regexp_extract_all(text, '[a-zA-Z]{{1,4}}|[0-9]+|[^\\sa-zA-Z0-9]+')) AS n_bpe_tokens,
           ROUND((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) /
                 CAST(length(text) AS DOUBLE), 9) AS punct_ratio
    FROM documents WHERE doc_id < 300
    """,
)
def text_stats(spark, sf_dir):
    """Token counting (whitespace + BPE-ish regex), uniqueness, punct
    ratio — the per-document feature vector of a data-quality pass."""
    t = load_tables(spark, sf_dir)
    d = t["documents"].filter(F.col("doc_id") < 300)
    return d.select(
        "doc_id",
        tx.token_count("text").alias("n_words"),
        F.size(F.array_distinct(tx.words_of("text"))).alias("n_unique"),
        F.length("text").alias("n_chars_actual"),
        tx.bpe_ish_token_count("text").alias("n_bpe_tokens"),
        F.round(tx.punct_ratio("text"), 9).alias("punct_ratio"),
    )


@query(
    "text_langid",
    oracle=f"""
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN GREATEST({_duck_hits('en')}, {_duck_hits('de')},
                              {_duck_hits('fr')}, {_duck_hits('es')}) = 0 THEN 'und'
                ELSE (SELECT l FROM (VALUES
                        ('en', {_duck_hits('en')}), ('de', {_duck_hits('de')}),
                        ('fr', {_duck_hits('fr')}), ('es', {_duck_hits('es')})
                      ) t(l, h) ORDER BY h DESC, l DESC LIMIT 1)
           END AS detected_lang
    FROM documents WHERE doc_id < 300
    """,
)
def text_langid(spark, sf_dir):
    """Heuristic language ID: argmax of stopword hits (ties -> greater
    lang code, matching struct-max semantics), 'und' when no hits."""
    t = load_tables(spark, sf_dir)
    d = t["documents"].filter(F.col("doc_id") < 300)
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        tx.detect_language("text").alias("detected_lang"),
    )


@query(
    "text_quality",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id,
             len({_DUCK_WORDS.format(c='text')}) AS n,
             len(list_distinct({_DUCK_WORDS.format(c='text')})) AS n_uniq,
             {_duck_hits('en')} AS sw_hits,
             (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) /
               CAST(length(text) AS DOUBLE) AS pr
      FROM documents WHERE doc_id < 300
    )
    SELECT doc_id,
           ROUND(0.3 * (CASE WHEN n >= 20 AND n <= 1000 THEN 1.0 WHEN n >= 5 THEN 0.5 ELSE 0.0 END)
               + 0.2 * (CASE WHEN sw_hits / CAST(n AS DOUBLE) > 0.05 THEN 1.0 ELSE 0.0 END)
               + 0.2 * (CASE WHEN pr < 0.2 THEN 1.0 ELSE 0.0 END)
               + 0.3 * (n_uniq / CAST(n AS DOUBLE)), 6) AS quality
    FROM feats
    """,
)
def text_quality(spark, sf_dir):
    """Composite quality score (documented weights; oracle reproduces
    the exact formula)."""
    t = load_tables(spark, sf_dir)
    d = t["documents"].filter(F.col("doc_id") < 300)
    return d.select("doc_id", tx.quality_score("text").alias("quality"))


@query(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct({_DUCK_WORDS.format(c='text')})), ' ')) AS fp
    FROM documents WHERE doc_id < 300
    """,
)
def text_fingerprint(spark, sf_dir):
    """Order-insensitive content fingerprint (md5 of sorted word set)."""
    t = load_tables(spark, sf_dir)
    d = t["documents"].filter(F.col("doc_id") < 300)
    return d.select("doc_id", tx.fingerprint("text").alias("fp"))


@query(
    "text_dedup_exact",
    oracle="""
    SELECT digest, n_dups, doc_ids FROM (
      SELECT md5(array_to_string(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')[1:5], ' ')) AS digest,
             COUNT(*) AS n_dups,
             ARRAY_TO_STRING(LIST_SORT(LIST(doc_id)), ',') AS doc_ids
      FROM documents GROUP BY 1
    ) WHERE n_dups > 1
    """,
)
def text_dedup_exact(spark, sf_dir):
    """Exact dedup via hash-groupBy on a digest — one shuffle of
    (digest, id), the 100 TB-safe shape. The test corpus has no
    byte-identical documents, so the digest key here is the
    normalized 5-word prefix (a standard blocking key); full-text
    digest dedup is the same operator with key=whole text
    (unit-tested in tests/test_dedup.py::test_exact_dup_of_itself)."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"].withColumn(
        "text_key",
        F.array_join(F.slice(F.split(dd.normalize_text("text"), " "), 1, 5), " "),
    )
    # doc_ids as a CSV string: raw array cells break the driver's
    # pandas canonicalizer (unhashable numpy arrays)
    return dd.exact_duplicates(docs, "text_key", "doc_id").select(
        "digest",
        "n_dups",
        F.array_join(F.col("doc_ids").cast("array<string>"), ",").alias("doc_ids"),
    )


@query(
    "text_ngram_jaccard",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(0, greatest(len({_DUCK_WORDS.format(c='text')}) - 3, 0) + 1),
               i -> array_to_string(({_DUCK_WORDS.format(c='text')})[i+1:i+3], ' ')
             )) AS grams
      FROM documents WHERE doc_id < 200
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(len(list_intersect(a.grams, b.grams)) /
                 CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE), 6) AS jac
    FROM sh a JOIN sh b ON b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 5
    """,
)
def text_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram-shingle Jaccard over a bounded pair window (the
    verification step of near-dup pipelines; pair space bounded by a
    blocking key — here the id window, at scale an LSH bucket)."""
    t = load_tables(spark, sf_dir)
    d = t["documents"].filter(F.col("doc_id") < 200)
    sh = d.select(F.col("doc_id"), dd.shingles("text", 3).alias("grams"))
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("grams").alias("ga"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("grams").alias("gb"))
    return (
        a.join(b, (F.col("id_b") > F.col("id_a")) & (F.col("id_b") <= F.col("id_a") + 5))
        .select("id_a", "id_b", F.round(dd.jaccard(F.col("ga"), F.col("gb")), 6).alias("jac"))
    )


@query("text_minhash_lsh", oracle=None)
def text_minhash_lsh(spark, sf_dir):
    """MinHash+LSH candidate pairs (32 hashes, 8 bands). xxhash64 has
    no DuckDB twin -> rows-only; recall property vs exact Jaccard is
    unit-tested (tests/test_dedup.py)."""
    t = load_tables(spark, sf_dir)
    return dd.minhash_lsh_candidates(t["documents"], "text", "doc_id")


@query("text_simhash", oracle=None)
def text_simhash(spark, sf_dir):
    """64-bit SimHash fingerprint per doc + near-dup pairs at Hamming
    distance <= 6 within an id window (rows-only: xxhash64-based).

    r11 optimization round: the fingerprints compute ONCE — spread
    over the cores (the 64 per-bit vote folds are the whole cost and a
    single-row-group scan serializes them) and materialized via an
    eager localCheckpoint before the pair join. Without it the
    self-join's two branches each re-derived simhash64 over the corpus
    (the broadcast build single-threaded). 2.15 s -> ~0.6 s at sf0.1;
    the checkpoint is one job over 200 (doc_id, bigint) rows."""
    from crate_spark.session import spread_small_input

    t = load_tables(spark, sf_dir)
    d = spread_small_input(
        t["documents"].select("doc_id", "text").filter(F.col("doc_id") < 200)
    )
    sh = d.select("doc_id", dd.simhash64("text").alias("fp")).localCheckpoint()
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("fp").alias("fp_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("fp").alias("fp_b"))
    return (
        a.join(b, F.col("id_b") > F.col("id_a"))
        .withColumn("hamming", dd.hamming64("fp_a", "fp_b"))
        .filter(F.col("hamming") <= 6)
        .select("id_a", "id_b", "hamming")
    )
