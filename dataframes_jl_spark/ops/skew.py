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


def key_skew_report(
    df: DataFrame,
    cols: Sequence[str],
    top_k: int = 5,
    hot_share: float = 0.2,
) -> DataFrame:
    """Pre-shuffle skew audit for candidate join/group keys: for each
    column, the top-k hottest values with their share of rows, the
    column's distinct count, and a strategy hint — the numbers that
    decide broadcast vs salt vs plain shuffle BEFORE a 100 TB join
    launches (a single key holding 20% of rows means one reducer gets
    20% of the shuffle no matter how many executors exist).

    All columns explode into string-cast (col, value) pairs so ONE
    count shuffle serves every column; the exchange carries
    (col, distinct-value) partial counts, not rows. The top-k is then
    found WITHOUT a per-column global sort window — a rank window
    partitioned only by ``col`` would put every distinct value of a
    column into one task, the exact single-reducer trap this report
    exists to detect. Instead: a salted local rank (window over
    (col, salt), each task seeing ~1/S of the values) nominates S*k
    candidates per column, and the final rank runs over that bounded
    candidate set. Per-column totals (distinct count, non-null rows)
    come from a plain map-side-combining aggregate and join back
    broadcast. Hints: 'hot:salt-or-AQE' when the top value exceeds
    ``hot_share`` of non-null rows, else 'ok'.

    Returns (col, value, cnt, share, rank, n_distinct, hint); ``value``
    is the string form (diagnostic, not a join payload). NULLs are
    excluded from counts (they never collide in an equi-join).
    """
    from pyspark.sql import Window

    cols = list(cols)
    if not cols:
        raise ValueError("cols must be non-empty")
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.col", "p.value").filter(F.col("value").isNotNull())
    counts = pairs.groupBy("col", "value").agg(F.count(F.lit(1)).alias("cnt"))

    n_salt = max(df.sparkSession.sparkContext.defaultParallelism, 2)
    salted = counts.withColumn(
        "__salt__", F.pmod(F.xxhash64("value"), F.lit(n_salt)).cast("int")
    )
    local_w = Window.partitionBy("col", "__salt__").orderBy(
        F.desc("cnt"), F.asc("value")
    )
    cand = (
        salted.withColumn("__lr__", F.row_number().over(local_w))
        .filter(F.col("__lr__") <= top_k)
        .drop("__salt__", "__lr__")
    )
    final_w = Window.partitionBy("col").orderBy(F.desc("cnt"), F.asc("value"))
    top = (
        cand.withColumn("rank", F.row_number().over(final_w))
        .filter(F.col("rank") <= top_k)
    )
    totals = counts.groupBy("col").agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum("cnt").alias("n_rows"),
    )
    share = F.col("cnt") / F.col("n_rows")
    return top.join(F.broadcast(totals), "col").select(
        "col",
        "value",
        "cnt",
        share.alias("share"),
        "rank",
        "n_distinct",
        F.when(share > F.lit(float(hot_share)), F.lit("hot:salt-or-AQE"))
        .otherwise(F.lit("ok"))
        .alias("hint"),
    )


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    key: str,
) -> DataFrame:
    """Exact inner-equi-join cardinality WITHOUT running the join:
    ``|A ⋈ B| = Σ_k ca(k)·cb(k)`` over the two sides' key histograms —
    the planner-style audit that tells you whether a proposed join
    explodes (a skewed key pair multiplying 10^6 x 10^6 shows up here
    as a 10^12 BEFORE you shuffle a single payload byte).

    Cost: one distinct-with-counts aggregate per side (|keys| rows
    move, never |rows|), one equi-join of the two count tables, one
    single-row sum in decimal(38,0) (per-key products overflow int64
    exactly when the answer matters most). Also reports each side's
    row/key counts and the largest single-key contribution — the skew
    culprit."""
    ca = left.filter(F.col(key).isNotNull()).groupBy(
        F.col(key).alias("k")
    ).agg(F.count(F.lit(1)).alias("ca"))
    cb = right.filter(F.col(key).isNotNull()).groupBy(
        F.col(key).alias("k")
    ).agg(F.count(F.lit(1)).alias("cb"))
    dec = "decimal(38,0)"
    prod = (F.col("ca").cast(dec) * F.col("cb").cast(dec))
    j = ca.join(cb, "k", "inner")
    return j.agg(
        F.count(F.lit(1)).alias("n_matching_keys"),
        F.sum("ca").alias("left_rows_matched"),
        F.sum("cb").alias("right_rows_matched"),
        F.sum(prod).cast(dec).alias("est_join_rows"),
        F.max(prod).cast(dec).alias("max_single_key_rows"),
    )
