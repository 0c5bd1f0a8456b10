"""Sampling operators — not in the reference (no sampling surface
exists there; SURVEY §2 has no entry), added as first-class scale
operators: subsampling a 100 TB corpus and rebalancing strata are
routine steps of a training-data pipeline.

All three are single-pass, shuffle-free row filters:

- ``sample``: seeded Bernoulli row sample (Spark native, per-partition
  XORShift — deterministic for a fixed seed AND a fixed partitioning).
- ``sample_by``: stratified per-key fractions (``DataFrame.sampleBy``),
  e.g. downsample the dominant language while keeping the tail.
- ``systematic_sample``: keyed modulus filter — fully deterministic
  regardless of partitioning, reproducible across engines, and thus the
  variant the DuckDB oracle can check value-for-value. The filter is a
  plain comparison on a key expression, so it is pushed into the scan
  where the key is a stored column.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Seeded Bernoulli sample without replacement."""
    return df.sample(withReplacement=False, fraction=fraction, seed=seed)


def sample_by(
    df: DataFrame, col: str, fractions: Mapping, seed: int = 42
) -> DataFrame:
    """Stratified sample: per-stratum keep-fractions (keys absent from
    ``fractions`` are dropped, matching ``DataFrame.sampleBy``)."""
    return df.sampleBy(col, dict(fractions), seed=seed)


def systematic_sample(
    df: DataFrame, key: str | Column, every: int, offset: int = 0
) -> DataFrame:
    """Keep rows where ``key % every == offset`` — a 1/``every``
    systematic sample keyed on a stored column. Deterministic under any
    partitioning (the decision depends only on the row), so results are
    engine-reproducible; use a well-distributed key (an id, a hash)."""
    if every <= 0:
        raise ValueError("every must be positive")
    k = F.col(key) if isinstance(key, str) else key
    return df.filter(F.pmod(k, F.lit(every)) == F.lit(offset % every))
