"""Embedding quantization: float32 → int8 with a per-vector scale.

LLM-pipeline extension (no reference analog — CrateDB float_vector is
float32-only). At 100 TB the embedding column dominates shuffle bytes
in every vector operation; symmetric per-vector int8 quantization cuts
them 4× while keeping cosine ranking nearly intact (the standard
faiss-style SQ8 trade). All expressions are JVM builtins; rounding is
spelled floor(x + 0.5) so the oracle (DuckDB) computes bit-identical
results — both engines evaluate the same IEEE double ops in the same
array order.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def quant_scale(vec) -> F.Column:
    """Per-vector scale: max |v| / 127 (symmetric, zero-point-free).
    Zero vectors get scale 1.0 so quantization is a no-op, not a NaN."""
    v = F.col(vec) if isinstance(vec, str) else vec
    mx = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    return F.when(mx > 0, mx / F.lit(127.0)).otherwise(F.lit(1.0))


def quantize_int8(vec, scale=None) -> F.Column:
    """int8 codes: floor(v/scale + 0.5), clamped to [-127, 127]."""
    v = F.col(vec) if isinstance(vec, str) else vec
    s = quant_scale(v) if scale is None else scale
    return F.transform(
        v,
        lambda x: F.greatest(
            F.lit(-127),
            F.least(F.lit(127), F.floor(x.cast("double") / s + F.lit(0.5)).cast("int")),
        ),
    )


def dequant_dot(qa, sa, qb, sb) -> F.Column:
    """Dot product of two quantized vectors: int accumulation (exact)
    times the two scales — the cheap inner loop of quantized kNN."""
    acc = F.aggregate(
        F.zip_with(qa, qb, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return acc.cast("double") * sa * sb


def reconstruction_rmse(vec, q, scale) -> F.Column:
    """Root-mean-square quantization error of one vector — the audit
    metric for choosing a quantization level."""
    v = F.col(vec) if isinstance(vec, str) else vec
    sq = F.aggregate(
        F.zip_with(v, q, lambda x, c: F.pow(x.cast("double") - c * scale, F.lit(2.0))),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return F.sqrt(sq / F.size(v))
