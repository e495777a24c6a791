"""Composite operators built from DataFrame primitives.

These are the operators the reference either backs with Lucene-specific
machinery (kNN via HNSW — ``expression/scalar/KnnMatch.java:52``,
fulltext MATCH — ``expression/predicate/MatchPredicate.java:85``) or
does not have at all (the LLM-pipeline surface: dedup, similarity
join, text analysis — BASELINE.json north star).

Design rule: exact, distributed, no ``collect()`` in any data path;
approximate variants (LSH) exist as the documented 100 TB scale path
next to an exact baseline that defines correctness.
"""
