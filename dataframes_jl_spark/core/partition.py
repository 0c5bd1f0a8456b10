"""Scale-adaptive partitioning helpers.

One rule, used by every CPU-bound map-only lane: an UNDER-partitioned
input (a single-file scan, a collapsed post-AQE exchange) must be
spread to cluster parallelism before an expensive per-row kernel —
but an input that is already parallel must NOT pay a second exchange.
At 100 TB every source has thousands of splits and :func:`spread` is
the identity; locally it is what keeps a one-file table from
serializing a heavy projection onto one core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``min_partitions`` (default: the
    cluster's default parallelism) ONLY when its current plan yields
    fewer partitions. Shuffles exactly the columns ``df`` carries —
    callers should project narrow FIRST (guide §2.3: never ship a
    payload column through an exchange whose only purpose is
    parallelism)."""
    par = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par)
