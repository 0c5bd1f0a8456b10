"""R-style utility generators and helpers (reference src/extras.jl):
``paste`` (recycling string concat), ``rep`` (times/each replication),
``gl`` (factor level generator), ``letters``/``LETTERS``.

These are column/DataFrame *generators*: in Spark they produce either
Column expressions over existing rows (paste) or new DataFrames built
from ranges (rep/gl) — `spark.range` + array/explode, never a driver
loop, so they compose at any cardinality.
"""

from __future__ import annotations

import string
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

letters = list(string.ascii_lowercase)
LETTERS = list(string.ascii_uppercase)


def paste(cols: Sequence[Column | str], sep: str = " ") -> Column:
    """R paste with column recycling semantics (reference
    src/extras.jl:12-30): scalar arguments broadcast against columns —
    which is exactly what lit() + concat_ws already do."""
    parts = [
        F.col(c).cast("string") if isinstance(c, str) else c.cast("string")
        for c in cols
    ]
    return F.concat_ws(sep, *parts)


def rep(
    spark: SparkSession,
    values: Sequence,
    times: int = 1,
    each: int = 1,
) -> DataFrame:
    """R rep (reference src/extras.jl:52-87): tile ``values`` ``times``
    times, repeating each element ``each`` times, preserving order via
    an explicit ``idx`` column. Built from spark.range cross products —
    distributed, no driver materialization of the result."""
    n = len(values)
    vals = F.array(*[F.lit(v) for v in values])
    return (
        spark.range(times)
        .withColumnRenamed("id", "t")
        .crossJoin(spark.range(n).withColumnRenamed("id", "i"))
        .crossJoin(spark.range(each).withColumnRenamed("id", "e"))
        .select(
            (F.col("t") * (n * each) + F.col("i") * each + F.col("e")).alias("idx"),
            F.element_at(vals, F.col("i").cast("int") + 1).alias("value"),
        )
    )


def gl(spark: SparkSession, n: int, k: int, length: int | None = None) -> DataFrame:
    """R gl factor generator (reference export src/DataFrames.jl:92):
    ``n`` levels, each repeated ``k`` times, recycled to ``length``."""
    total = length if length is not None else n * k
    return spark.range(total).select(
        F.col("id").alias("idx"),
        ((F.col("id") / k).cast("bigint") % n + 1).alias("level"),
    )
