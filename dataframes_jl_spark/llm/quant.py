"""Embedding quantization: per-vector symmetric int8 (and general
bit-width) codes for cheap storage and transport of embedding columns.

At 100 TB an `array<float>` embedding column is routinely the widest
thing in the table; symmetric linear quantization (the standard
faiss/SQ8 scheme) stores 1 byte per dimension plus one float scale per
vector — a 4x cut vs float32 with ~1e-2 cosine error on unit-norm-ish
data. Everything here is a map-only Column expression: quantize and
dequantize are one projection each, no UDF, no shuffle.

Determinism: the code is ``floor(x / scale * qmax + 0.5)`` — IEEE
division/multiplication are exactly rounded and floor is exact, so the
integer codes are bit-identical across engines and partition orders
(the DuckDB oracle replays them 1:1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import _as_double


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Per-vector symmetric quantization to signed ``bits``-bit codes.

    Output: (id, qvec array<smallint>, scale double) with
    ``x_i ~ qvec_i * scale / qmax``, ``qmax = 2^(bits-1) - 1``.
    Zero vectors get scale 0 and all-zero codes. The codes fit a
    ``tinyint`` at bits<=8 — kept ``smallint`` so bits up to 16 share
    one schema; cast down at write time if the sink supports it.
    """
    if not 2 <= bits <= 16:
        raise ValueError(f"bits={bits} out of range [2, 16]")
    qmax = float(2 ** (bits - 1) - 1)
    v = _as_double(F.col(vec_col))
    scale = F.array_max(F.transform(v, F.abs))
    qvec = F.when(
        scale > 0,
        F.transform(
            v,
            lambda x: F.floor(x / scale * F.lit(qmax) + F.lit(0.5)).cast("smallint"),
        ),
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast("smallint")))
    return df.select(
        F.col(id_col),
        qvec.alias("qvec"),
        scale.alias("scale"),
    )


def dequantize(qvec: Column, scale: Column, bits: int = 8) -> Column:
    """Reconstruct an approximate double vector from codes + scale."""
    qmax = float(2 ** (bits - 1) - 1)
    return F.transform(qvec, lambda q: q.cast("double") * scale / F.lit(qmax))
