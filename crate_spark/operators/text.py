"""Text analysis operators: language ID, quality scoring, token
counting, fingerprinting.

LLM-pipeline extension (BASELINE north star; no reference analog —
CrateDB's text surface is fulltext MATCH, covered separately). Every
feature is a JVM expression over the scan — zero Python, zero shuffle;
these run at wire speed on 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crate_spark.operators.dedup import normalize_text

#: Tiny per-language stopword lists for n-gram-free heuristic language
#: ID. Deliberately small and hard-coded: deterministic, testable, and
#: the lookup arrays broadcast as literals into codegen.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en", "para", "que"],
}


def words_of(text_col) -> F.Column:
    return F.split(normalize_text(text_col), " ")


def token_count(text_col) -> F.Column:
    """Whitespace token count."""
    return F.size(words_of(text_col))


def bpe_ish_token_count(text_col) -> F.Column:
    """Sub-word-ish token estimate: count of matches of a BPE-flavored
    regex (word pieces of <=4 chars, digits, punctuation runs)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(col, F.lit(r"[a-zA-Z]{1,4}|[0-9]+|[^\sa-zA-Z0-9]+"), 0))


def stopword_ratio(text_col, lang: str = "en") -> F.Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    words = words_of(text_col)
    hits = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    return F.when(F.size(words) > 0, hits / F.size(words)).otherwise(F.lit(0.0))


def detect_language(text_col) -> F.Column:
    """Argmax of stopword-hit counts across the known languages;
    'und' (undetermined) when nothing matches."""
    words = words_of(text_col)
    scored = []
    for lang, lang_words in STOPWORDS.items():
        sw = F.array(*[F.lit(x) for x in lang_words])
        hits = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
        scored.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scored))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def punct_ratio(text_col) -> F.Column:
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    n_punct = F.length(col) - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    return F.when(F.length(col) > 0, n_punct / F.length(col)).otherwise(F.lit(0.0))


def quality_score(text_col) -> F.Column:
    """Composite [0,1] quality heuristic: length band + stopword
    presence + low punctuation + lexical diversity. Deterministic,
    documented weights; the SQL oracle reproduces it exactly."""
    words = words_of(text_col)
    n = F.size(words)
    len_score = F.when((n >= 20) & (n <= 1000), 1.0).when(n >= 5, 0.5).otherwise(0.0)
    sw_score = F.when(stopword_ratio(text_col) > 0.05, 1.0).otherwise(0.0)
    punct_score = F.when(punct_ratio(text_col) < 0.2, 1.0).otherwise(0.0)
    diversity = F.when(n > 0, F.size(F.array_distinct(words)) / n).otherwise(F.lit(0.0))
    return F.round(
        0.3 * len_score + 0.2 * sw_score + 0.2 * punct_score + 0.3 * diversity, 6
    )


def fingerprint(text_col) -> F.Column:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct word set (news-shingling style content signature)."""
    words = F.sort_array(F.array_distinct(words_of(text_col)))
    return F.md5(F.array_join(words, " ").cast("binary"))
