"""Smoothed target (mean) encoding of categorical columns — the
feature-engineering step that turns a high-cardinality category into
its shrunken per-level target mean, the standard alternative to
one-hot at 100 TB cardinalities.

Beyond-reference operator (the reference's PooledDataArray /
ModelMatrix surface one-hot-encodes via treatment contrasts —
reference src/formula.jl; mean encoding is the scale-era complement):
``enc(c) = (Σ_c y + m·prior) / (n_c + m)`` with ``prior`` the global
target mean and ``m`` the smoothing pseudo-count — levels with little
evidence shrink toward the prior instead of memorizing noise.

Shape: ONE map-side-combining aggregate to the |levels| table plus a
1-row global aggregate broadcast into the final projection — nothing
but the level table ever moves. The result is a MAPPING table the
caller broadcast-joins onto training data (returning the mapping, not
the joined frame, keeps the expensive side explicit).

Determinism: targets quantize to integer units before summing (dsum);
prior and the final encoding each pay one correctly-rounded double
division, floor-quantized on output. NULL is a level (the contingency
convention); NULL targets are excluded from sums and counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def target_encode(
    df: DataFrame,
    cat: str,
    target: str,
    m: float = 20.0,
    scale: int = 6,
    out_scale: int = 6,
) -> DataFrame:
    """Per-level smoothed target means (module doc). Returns the
    mapping table ``(cat, n, enc)``."""
    if m < 0:
        raise ValueError(f"smoothing m must be >= 0, got {m}")
    q = F.lit(float(10**scale))
    units = F.floor(F.col(target).cast("double") * q + F.lit(0.5)).cast("long")
    base = df.filter(F.col(target).isNotNull()).select(
        F.col(cat).alias("__c__"), units.alias("__u__")
    )
    levels = base.groupBy("__c__").agg(
        F.count(F.lit(1)).alias("n"), F.sum("__u__").alias("__su__")
    )
    # distinct names case-insensitively: Spark's default resolver
    # treats __su__ / __SU__ as the same reference
    glob = base.agg(
        F.count(F.lit(1)).alias("__gn__"), F.sum("__u__").alias("__gsu__")
    )
    prior_u = F.col("__gsu__").cast("double") / F.col("__gn__").cast("double")
    enc_u = (
        F.col("__su__").cast("double") + F.lit(float(m)) * prior_u
    ) / (F.col("n").cast("double") + F.lit(float(m)))
    om = F.lit(float(10**out_scale))
    return levels.crossJoin(F.broadcast(glob)).select(
        F.col("__c__").alias(cat),
        "n",
        F.when(
            F.col("__gn__") > 0,
            F.floor(enc_u / q * om + F.lit(0.5)) / om,
        ).alias("enc"),
    )
