"""Training-data pipeline queries: deterministic splits, stratified
sampling, domain mixing, PII redaction, quality gating, packing.

LLM-pipeline extension (no reference analog). All splits/samples are
md5-keyed (operators/pipeline.py) so every query here is exactly
reproducible in ANSI SQL — the driver hash-checks the whole pipeline
surface except sequence packing (iterative first-fit → rows-only +
invariant tests in tests/test_pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crate_spark.operators import pipeline as P
from crate_spark.queries import query
from crate_spark.session import load_tables

#: DuckDB twin of operators.pipeline.hash_bucket(id, n)
_DUCK_BUCKET = (
    "CAST(concat('0x', substr(md5(CAST({id} AS VARCHAR)), 1, 8)) AS BIGINT) % {n}"
)

_DUCK_SPLIT = f"""
    CASE WHEN {_DUCK_BUCKET.format(id='doc_id', n=100)} < 98 THEN 'train'
         WHEN {_DUCK_BUCKET.format(id='doc_id', n=100)} < 99 THEN 'val'
         ELSE 'test' END
"""


@query(
    "pipeline_train_split",
    oracle=f"""
    SELECT {_DUCK_SPLIT} AS split, lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY 1, 2
    """,
)
def pipeline_train_split(spark, sf_dir):
    """98/1/1 train/val/test by md5 bucket of doc_id — stable under
    re-runs and data growth (a doc never changes split). Map-side
    only; the aggregate is the audit."""
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.withColumn("split", P.train_split("doc_id"))
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


@query(
    "pipeline_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    ) WHERE rn <= 20
    """,
)
def pipeline_stratified_sample(spark, sf_dir):
    """Deterministic 20-docs-per-language sample in md5 order —
    reproducible stratified sampling with no rand()."""
    docs = load_tables(spark, sf_dir)["documents"]
    return P.stratified_take(docs, "lang", "doc_id", 20).select("doc_id", "lang")


@query(
    "pipeline_domain_mix",
    oracle=f"""
    SELECT source, count(*) AS n_kept FROM documents
    WHERE (source = 'web'  AND {_DUCK_BUCKET.format(id='doc_id', n=10000)} < 2500)
       OR (source = 'wiki' AND {_DUCK_BUCKET.format(id='doc_id', n=10000)} < 10000)
       OR (source = 'code' AND {_DUCK_BUCKET.format(id='doc_id', n=10000)} < 7500)
       OR source NOT IN ('web', 'wiki', 'code')
    GROUP BY source
    """,
)
def pipeline_domain_mix(spark, sf_dir):
    """Deterministic domain re-weighting: keep 25% of web, 100% of
    wiki, 75% of code, everything else untouched. Pure filter —
    zero shuffles before the audit aggregate."""
    docs = load_tables(spark, sf_dir)["documents"]
    mixed = P.domain_mix(
        docs, "doc_id", {"web": 0.25, "wiki": 1.0, "code": 0.75}, "source"
    )
    return mixed.groupBy("source").agg(F.count("*").alias("n_kept"))


@query(
    "pipeline_pii_redact",
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
           len(regexp_extract_all(text, '\d{6,}')) AS n_number,
           len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
           md5(regexp_replace(
                 regexp_replace(
                   regexp_replace(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<email>', 'g'),
                   '\d{6,}', '<number>', 'g'),
                 '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<ipv4>', 'g')) AS redacted_md5
    FROM documents WHERE doc_id < 200
    """,
)
def pipeline_pii_redact(spark, sf_dir):
    """PII scrub: e-mails, long digit runs, IPv4s → typed placeholders.
    Match counts + an md5 of the redacted text hash-prove the exact
    rewrite against the oracle. JVM regex only — zero Python."""
    docs = load_tables(spark, sf_dir)["documents"].filter(F.col("doc_id") < 200)
    counts = P.pii_counts("text")
    return docs.select(
        "doc_id",
        counts["email"].alias("n_email"),
        counts["number"].alias("n_number"),
        counts["ipv4"].alias("n_ipv4"),
        F.md5(P.redact_pii("text").cast("binary")).alias("redacted_md5"),
    )


@query(
    "pipeline_quality_gate",
    oracle=r"""
    WITH scored AS (
        SELECT
            len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS n,
            list_sum(list_transform(
                string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                w -> length(w))) /
              CAST(greatest(len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')), 1) AS DOUBLE) AS mean_len,
            (length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))) /
              CAST(length(text) AS DOUBLE) AS punct
        FROM documents
    )
    SELECT CASE WHEN n < 5 THEN 'too_short'
                WHEN n > 100000 THEN 'too_long'
                WHEN mean_len < 2.0 THEN 'words_too_short'
                WHEN mean_len > 12.0 THEN 'words_too_long'
                WHEN punct > 0.30 THEN 'too_much_punct'
                ELSE 'keep' END AS gate,
           count(*) AS n_docs
    FROM scored GROUP BY 1
    """,
)
def pipeline_quality_gate(spark, sf_dir):
    """Gopher-style rule gate (Rae et al. 2021 §A1.1): first failing
    rule per doc, audited as a histogram. Pure codegen expressions."""
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.withColumn("gate", P.quality_gate("text"))
        .groupBy("gate")
        .agg(F.count("*").alias("n_docs"))
    )


@query("pipeline_pack_sequences", oracle=None)
def pipeline_pack_sequences(spark, sf_dir):
    """First-fit-decreasing sequence packing into 2048-token bins
    (iterative per-group loop → no SQL twin; invariants — no bin
    overflow except singletons, every doc packed exactly once, packs
    reasonably full — are pinned in tests/test_pipeline.py)."""
    from crate_spark.operators.text import token_count

    docs = load_tables(spark, sf_dir)["documents"].select(
        "doc_id", token_count("text").alias("n_tok")
    )
    return P.pack_sequences(
        docs, "doc_id", "n_tok", max_tokens_per_pack=2048
    )


@query(
    "pipeline_quantize_int8",
    oracle="""
    WITH q AS (
      SELECT vec_id, embedding,
             CASE WHEN list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) > 0
                  THEN list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0
                  ELSE 1.0 END AS scale
      FROM embeddings WHERE vec_id < 200
    ),
    coded AS (
      SELECT vec_id, embedding, scale,
             list_transform(embedding,
               x -> greatest(-127, least(127, CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS INT)))) AS codes
      FROM q
    )
    SELECT vec_id,
           ROUND(scale, 9) AS scale_r,
           CAST(list_sum(codes) AS BIGINT) AS code_sum,
           CAST(list_sum(list_transform(codes, c -> c * c)) AS BIGINT) AS code_sq_sum,
           ROUND(sqrt(list_sum(list_transform(list_zip(embedding, codes),
                 p -> pow(CAST(p[1] AS DOUBLE) - p[2] * scale, 2.0))) / len(embedding)), 9) AS rmse
    FROM coded
    """,
)
def pipeline_quantize_int8(spark, sf_dir):
    """Symmetric int8 embedding quantization (operators/quant.py):
    per-vector scale, code checksums, and reconstruction RMSE —
    hash-matched against DuckDB computing the identical arithmetic.
    The 4x shuffle-byte reduction path for 100 TB vector ops."""
    from crate_spark.operators import quant as Q

    e = load_tables(spark, sf_dir)["embeddings"].filter(F.col("vec_id") < 200)
    s = Q.quant_scale("embedding")
    df = e.select("vec_id", "embedding", s.alias("scale"))
    df = df.withColumn("codes", Q.quantize_int8("embedding", F.col("scale")))
    code_sum = F.aggregate(F.col("codes"), F.lit(0).cast("long"), lambda a, x: a + x)
    code_sq = F.aggregate(
        F.col("codes"), F.lit(0).cast("long"), lambda a, x: a + (x * x).cast("long")
    )
    return df.select(
        "vec_id",
        F.round(F.col("scale"), 9).alias("scale_r"),
        code_sum.alias("code_sum"),
        code_sq.alias("code_sq_sum"),
        F.round(
            Q.reconstruction_rmse("embedding", F.col("codes"), F.col("scale")), 9
        ).alias("rmse"),
    )


@query(
    "pipeline_knn_quantized",
    oracle="""
    WITH coded AS (
      SELECT vec_id,
             CASE WHEN list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) > 0
                  THEN list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0
                  ELSE 1.0 END AS scale,
             list_transform(embedding,
               x -> greatest(-127, least(127, CAST(floor(CAST(x AS DOUBLE) /
                 (CASE WHEN list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))) > 0
                       THEN list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))) / 127.0
                       ELSE 1.0 END) + 0.5) AS INT)))) AS codes
      FROM embeddings
    )
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROUND(CAST(list_sum(list_transform(list_zip(q.codes, c.codes),
                 p -> CAST(p[1] AS BIGINT) * p[2])) AS DOUBLE) * q.scale * c.scale, 9) AS qdot
    FROM coded q JOIN coded c ON q.vec_id < 3 AND c.vec_id <> q.vec_id
    QUALIFY row_number() OVER (
        PARTITION BY q.vec_id
        ORDER BY list_sum(list_transform(list_zip(q.codes, c.codes),
                 p -> CAST(p[1] AS BIGINT) * p[2])) * q.scale * c.scale DESC, c.vec_id
    ) <= 5
    """,
)
def pipeline_knn_quantized(spark, sf_dir):
    """Top-5 neighbors by int8-quantized dot product: the quantized
    kNN inner loop end-to-end — and unlike LSH/IVF, exactly
    reproducible in SQL, so the driver hash-checks an entire
    reduced-precision ANN scoring path. Query side (3 vectors) is
    broadcast; the corpus is scanned once, never shuffled."""
    from pyspark.sql import Window

    from crate_spark.operators import quant as Q

    e = load_tables(spark, sf_dir)["embeddings"]
    # Materialize the scale as a column BEFORE quantizing: passing
    # scale=None inlines the array_max subtree into the per-element
    # lambda, and interpreted HOFs have no CSE — every element would
    # recompute the whole-vector max (O(d^2) per row; measured 0.95 ->
    # 0.38 s at sf0.1). Same doubles either way.
    coded = e.select(
        "vec_id", "embedding", Q.quant_scale("embedding").alias("scale")
    ).select(
        "vec_id",
        "scale",
        Q.quantize_int8("embedding", F.col("scale")).alias("codes"),
    )
    q = coded.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("scale").alias("qscale"),
        F.col("codes").alias("qcodes"),
    )
    pairs = coded.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        Q.dequant_dot(
            F.col("qcodes"), F.col("qscale"), F.col("codes"), F.col("scale")
        ).alias("_dot"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_dot").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 5)
        .select("query_id", "neighbor_id", F.round(F.col("_dot"), 9).alias("qdot"))
    )


_DUCK_WORDS = "string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')"


@query(
    "pipeline_decontaminate",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, {_DUCK_WORDS} AS ws FROM documents WHERE doc_id < 400
    ),
    bg AS (
      SELECT DISTINCT array_to_string(ws[i:i+7], ' ') AS g
      FROM w, LATERAL (
        SELECT unnest(generate_series(1, greatest(len(ws) - 7, 0))) AS i
      ) s
      WHERE doc_id % 17 = 0
    ),
    dg AS (
      SELECT doc_id, array_to_string(ws[i:i+7], ' ') AS g
      FROM w, LATERAL (
        SELECT unnest(generate_series(1, greatest(len(ws) - 7, 0))) AS i
      ) s
      WHERE doc_id % 17 <> 0
    ),
    ov AS (SELECT doc_id, count(*) AS n FROM dg JOIN bg USING (g) GROUP BY doc_id)
    SELECT w.doc_id,
           coalesce(ov.n, 0) AS n_contaminated_ngrams,
           coalesce(ov.n, 0) > 0 AS contaminated
    FROM w LEFT JOIN ov ON w.doc_id = ov.doc_id
    WHERE w.doc_id % 17 <> 0
    """,
)
def pipeline_decontaminate(spark, sf_dir):
    """Benchmark decontamination (GPT-3 appendix C lineage): flag
    training docs sharing any 8-word-gram with the benchmark set
    (stand-in: every 17th doc). The benchmark gram set aggregates
    small and BROADCASTS; the training side probes it map-side in one
    explode pass — the 100 TB side never shuffles for the match
    (operators/pipeline.decontaminate)."""
    docs = load_tables(spark, sf_dir)["documents"].filter(F.col("doc_id") < 400)
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    train = docs.filter(F.col("doc_id") % 17 != 0)
    return P.decontaminate(train, bench, n=8).select(
        "doc_id", "n_contaminated_ngrams", "contaminated"
    )


@query(
    "pipeline_repetition_metrics",
    oracle=f"""
    WITH src AS (
      SELECT doc_id,
             list_filter(string_split(text, chr(10)), x -> len(trim(x)) > 0) AS lines,
             {_DUCK_WORDS} AS ws
      FROM documents WHERE doc_id < 300
    )
    SELECT doc_id,
           ROUND(CASE WHEN len(lines) > 0
                 THEN (len(lines) - len(list_distinct(lines))) / CAST(len(lines) AS DOUBLE)
                 ELSE 0.0 END, 6) AS dup_line_frac,
           ROUND(CASE WHEN len(ws) > 0
                 THEN (len(ws) - len(list_distinct(ws))) / CAST(len(ws) AS DOUBLE)
                 ELSE 0.0 END, 6) AS dup_word_frac
    FROM src
    """,
)
def pipeline_repetition_metrics(spark, sf_dir):
    """Gopher repetition rules (Rae et al. 2021 §A1.1): within-doc
    duplicate-line and duplicate-word fractions — pure higher-order
    array expressions in the scan, zero shuffles
    (operators/pipeline.repetition_metrics)."""
    docs = load_tables(spark, sf_dir)["documents"].filter(F.col("doc_id") < 300)
    m = P.repetition_metrics("text")
    return docs.select(
        "doc_id",
        F.round(m["dup_line_frac"], 6).alias("dup_line_frac"),
        F.round(m["dup_word_frac"], 6).alias("dup_word_frac"),
    )


@query(
    "pipeline_shard_layout",
    oracle=f"""
    SELECT {_DUCK_BUCKET.format(id='doc_id', n=8)} AS shard,
           count(*) AS n_docs,
           min(doc_id) AS min_id,
           max(doc_id) AS max_id,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY 1
    """,
)
def pipeline_shard_layout(spark, sf_dir):
    """Deterministic output sharding (the final write layout): md5
    bucket of the stable id -> shard, stable under re-runs and data
    growth. The histogram is the shard-balance audit; the write path
    is .repartition(n, 'shard').write.partitionBy('shard') — one
    sequential file stream per shard (operators/pipeline.shard_layout)."""
    docs = load_tables(spark, sf_dir)["documents"]
    return P.shard_layout(docs, "doc_id", 8).groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
        F.sum("n_chars").alias("total_chars"),
    )
