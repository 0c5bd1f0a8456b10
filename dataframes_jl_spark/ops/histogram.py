"""Equi-depth (equal-frequency) histograms with EXACT discrete
boundaries.

Beyond-reference operator: the optimizer-statistics / drift-monitoring
primitive — k buckets each holding ~n/k rows, with boundaries at exact
order statistics. Spark's ``approx_percentile`` gives approximate
boundaries; a 100 TB-safe EXACT version needs the bounded-memory
distributed selection engine (ops/selection.py): each refinement round
is one scan plus an n_buckets-row shuffle, driver state stays
O(n_buckets + collect_limit) regardless of data volume.

Boundaries are DISCRETE — the classic equi-depth rule: boundary i is
the element at rank ceil(i*n/k) — never interpolated, so every
boundary is a value that exists in the data and is bit-identical in
any engine that can rank (an interpolated boundary's last ulp depends
on the engine's lerp formula and could flip a `>` comparison; a
selected element cannot).

Bucket assignment is then a branch-free comparison against k-1 literal
boundaries — a map-side codegen'd expression, no join — and the final
counts are one map-side-combining aggregate to k rows. Ties AT a
boundary value all land in the lower bucket (the half-open (lo, hi]
rule), so bucket counts deviate from n/k exactly by tie mass — the
standard, deterministic equi-depth semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .selection import exact_ranks_n


def equidepth_histogram(
    df: DataFrame,
    col: str,
    k: int = 10,
    **selection_kw,
) -> DataFrame:
    """k-bucket equal-frequency histogram of ``df[col]``.

    Returns ``(bucket, lo, hi, n_rows)`` with ``bucket`` in [0, k):
    ``lo``/``hi`` are the bucket's boundary order statistics (bucket
    0's lo is the column minimum, bucket k-1's hi the maximum); a row
    lands in bucket ``#{interior boundaries strictly below its value}``
    — the (lo, hi] rule above. NULLs are excluded (no order rank);
    NaN values are refused by the selection engine.

    ``selection_kw`` forwards to :func:`ops.selection.exact_ranks`
    (n_buckets, collect_limit, max_rounds).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    c = F.col(col).cast("double")
    # ranks 1 (min), ceil(i*n/k) for i=1..k-1, n (max) — integer ceil
    # division (float i*n/k loses exactness past 2^53 rows). n comes
    # from the selection engine's OWN head-stats scan (exact_ranks_n),
    # never a separate count() job: one fewer full scan, and the rank
    # bounds can't disagree with the engine on a re-evaluated source.
    bounds, n = exact_ranks_n(
        df, col,
        lambda n: [1] + [(i * n + k - 1) // k for i in range(1, k)] + [n],
        **selection_kw,
    )
    if n == 0:
        return df.sparkSession.createDataFrame(
            [], "bucket int, lo double, hi double, n_rows long"
        )
    interior = bounds[1:-1]
    bucket: Column = F.lit(0)
    for b in interior:
        bucket = bucket + (c > F.lit(float(b))).cast("int")
    counts = (
        df.filter(c.isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    # k-row literal boundary table, crafted driver-side (k is tiny by
    # contract — this is histogram metadata, not data)
    spark = df.sparkSession
    meta = spark.createDataFrame(
        [(i, float(bounds[i]), float(bounds[i + 1])) for i in range(k)],
        "bucket int, lo double, hi double",
    )
    # broadcast the k-row count table (the BUILD side of a left join
    # must be the non-preserved side, so broadcast counts, not meta)
    return meta.join(F.broadcast(counts), "bucket", "left").select(
        "bucket",
        "lo",
        "hi",
        F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
    )
