"""Skew mitigation helpers (SURVEY 'Optimize for scale': salting).

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; explicit salting remains the tool when one join key dominates
so heavily that even split partitions bottleneck, or when AQE is
unavailable (streaming joins).

``salted_join``: replicate the small side ``salt`` times and scatter the
big side's hot keys across ``salt`` shuffle partitions with a
deterministic per-row salt (hash of the whole row, not rand() — keeps
the plan deterministic/replayable).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted into ``salt`` sub-keys.

    The small side explodes salt× (it must actually be small); the big
    side gets a deterministic salt from xxhash64 of all its columns, so
    a hot key's rows spread over ``salt`` shuffle partitions instead of
    one. Result equals ``big.join(small, on, how)`` for inner/left.
    """
    on = [on] if isinstance(on, str) else list(on)
    big_s = big.withColumn(
        "__salt__",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt)).cast("int"),
    )
    small_s = small.withColumn(
        "__salt__", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("__salt__", F.col("__salt__").cast("int"))
    return big_s.join(small_s, on=[*on, "__salt__"], how=how).drop("__salt__")
