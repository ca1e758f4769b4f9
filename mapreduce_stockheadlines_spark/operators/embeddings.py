"""Embedding-column hygiene operators: int8 quantization / dequantization.

Storage arithmetic is the whole game at corpus scale: a 100 TB corpus
with 768-dim float32 embeddings carries ~3 KB/vector; symmetric int8
cuts that 4x (and the ANN scan bandwidth with it) for a bounded,
per-vector-measured reconstruction error. The quantizer here is the
standard symmetric max-abs scheme (the FAISS ``ScalarQuantizer``/
vector-DB default): scale = max|x| / 127, q_i = round(x_i / scale).

Everything is a narrow per-row projection — array HOFs over the
embedding column, zero shuffle, no Python — so quantization composes
freely with the scan it sits on (the plan is the parquet scan plus one
Project). All arithmetic is double-precision IEEE (float32 → double
widening is exact, division and round are exactly specified), so the
quantized codes are bit-identical across engines — the registry oracle
(plans/extensions.x27) recomputes them in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale_col(vec_d: Column, levels: int) -> Column:
    """Symmetric quantization scale max|x|/levels; an all-zero vector gets
    scale 1.0 so the division is defined (its codes are all 0 anyway)."""
    absmax = F.array_max(F.transform(vec_d, F.abs))
    return F.when(absmax == 0.0, F.lit(1.0)).otherwise(absmax / F.lit(float(levels)))


def quantize_embeddings(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    out_col: str = "qvec",
    scale_col: str = "scale",
) -> DataFrame:
    """Symmetric int8 quantization of an ``array<float>`` column.

    Adds ``out_col`` (``array<tinyint>``, codes in [-127, 127]) and
    ``scale_col`` (double); other columns pass through. Per-element
    error is bounded by scale/2 ≈ max|x|/254 (pinned in
    tests/test_dedup_similarity.py along with the exact-roundtrip and
    zero-vector cases).
    """
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sc = _scale_col(vec_d, 127)
    # The division must reference the scale ATTRIBUTE, not the scale
    # EXPRESSION: embedding the O(d) absmax inside the per-element lambda
    # re-evaluates it for every element — O(d²) per row, measured 5.5x
    # slower on 64-dim vectors (0.85 s vs 0.15 s per 2k rows). As a
    # pass-through + lambda operand the non-cheap producer is referenced
    # twice, so CollapseProject keeps the projections separate and the
    # scale is computed once per row.
    codes = F.transform(
        vec_d, lambda x: F.round(x / F.col(scale_col)).cast("tinyint")
    )
    return df.withColumn(scale_col, sc).withColumn(out_col, codes)


def dequantize_embeddings(
    df: DataFrame,
    qvec_col: str,
    scale_col: str,
    out_col: str = "vec",
) -> DataFrame:
    """Inverse map: ``vec_i = q_i * scale`` as ``array<double>`` (the lossy
    reconstruction — feed it to the exact rescore stage of a two-phase
    ANN, the IVF/LSH pattern in operators/similarity.py)."""
    sc = F.col(scale_col)
    return df.withColumn(
        out_col,
        F.transform(F.col(qvec_col), lambda q: q.cast("double") * sc),
    )


def quantization_error(
    df: DataFrame,
    vec_col: str,
    qvec_col: str,
    scale_col: str,
    out_col: str = "rmse",
    dp: int = 4,
) -> DataFrame:
    """Per-vector reconstruction RMSE between the original and the
    dequantized codes, rounded to ``dp`` (the float contract: the fold
    runs in array order in any engine, and rounding absorbs sub-ulp
    summation differences)."""
    sc = F.col(scale_col)
    sq = F.zip_with(
        F.transform(F.col(vec_col), lambda x: x.cast("double")),
        F.col(qvec_col),
        lambda x, q: (x - q.cast("double") * sc) * (x - q.cast("double") * sc),
    )
    mse = F.aggregate(
        sq, F.lit(0.0), lambda acc, v: acc + v
    ) / F.greatest(F.size(sq), F.lit(1))
    return df.withColumn(out_col, F.round(F.sqrt(mse), dp))
