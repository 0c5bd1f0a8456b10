"""Privacy-preserving release helpers for training-data pipelines:
k-anonymity suppression over quasi-identifier columns (companion to the
PII regex pass in :mod:`..llm.text` — PII redaction scrubs direct
identifiers, k-anonymity suppresses rows whose quasi-identifier
combination is rare enough to re-identify).

Both are one hash-partition window over the quasi columns — a single
shuffle, no sort beyond the partition clustering, linear at any scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _group_size(quasi_cols: Sequence[str]):
    return F.count(F.lit(1)).over(Window.partitionBy(*quasi_cols))


def k_anonymize(df: DataFrame, quasi_cols: Sequence[str], k: int) -> DataFrame:
    """Rows whose quasi-identifier combination occurs >= k times; all
    other rows are suppressed. NULL quasi values form their own group
    (window partitioning groups NULLs together, matching GROUP BY)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return (
        df.withColumn("__gs__", _group_size(quasi_cols))
        .filter(F.col("__gs__") >= k)
        .drop("__gs__")
    )


def k_anonymity_report(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> DataFrame:
    """One-row accounting of what :func:`k_anonymize` would do: group
    and row counts on each side of the ``k`` threshold plus the
    smallest group size (the corpus's current anonymity level)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    sizes = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("n"))
    return sizes.agg(
        F.min("n").alias("k_anonymity"),
        F.count(F.when(F.col("n") >= k, 1)).alias("groups_kept"),
        F.count(F.when(F.col("n") < k, 1)).alias("groups_suppressed"),
        F.coalesce(F.sum(F.when(F.col("n") >= k, F.col("n"))), F.lit(0)).alias(
            "rows_kept"
        ),
        F.coalesce(F.sum(F.when(F.col("n") < k, F.col("n"))), F.lit(0)).alias(
            "rows_suppressed"
        ),
    )
