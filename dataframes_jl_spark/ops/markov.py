"""Markov transition matrices over per-entity event sequences.

Beyond-reference operator (the reference engine stops at split-apply-
combine; sequence analytics is part of the LLM-pipeline surface the
build brief asks for): estimate the first-order Markov chain over a
categorical state column — "after a `view`, how often does a `purchase`
follow?" — the standard session-model / user-journey primitive.

Scale shape: ONE shuffle on the entity key for the lag window (the
sequence is only ever materialized per entity, never globally), then
one map-side-combining aggregate to the (from, to) pair table, whose
size is |states|^2 — independent of event volume. Row probabilities
come from a window over the tiny pair table, not a second pass over
the data. Nothing single-reducer, no driver state.

Determinism: event order inside an entity must be total for the lag to
be engine-reproducible — ``order_cols`` should end with a unique
tiebreak column (an event id). The probability divide is quantized to
int64 units (queries.dsum discipline) by the caller's gate; here the
raw counts are exact longs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def transition_counts(
    df: DataFrame,
    entity: str | Column,
    state: str | Column,
    order_cols: Sequence[str | Column],
) -> DataFrame:
    """Pair counts of consecutive states per entity.

    Returns ``(from_state, to_state, n)`` — one row per observed
    transition pair. The terminal event of each entity has no
    successor and contributes nothing (standard chain estimation).
    """
    if not order_cols:
        raise ValueError("transition_counts needs order_cols (a total order)")
    e = F.col(entity) if isinstance(entity, str) else entity
    s = F.col(state) if isinstance(state, str) else state
    ob = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    w = Window.partitionBy(e).orderBy(*ob)
    pairs = (
        df.select(s.alias("from_state"), F.lead(s).over(w).alias("to_state"))
        .filter(F.col("to_state").isNotNull())
    )
    return pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n")
    )


def transition_matrix(
    df: DataFrame,
    entity: str | Column,
    state: str | Column,
    order_cols: Sequence[str | Column],
    prob_scale: int = 6,
) -> DataFrame:
    """First-order Markov transition estimates.

    Returns ``(from_state, to_state, n, n_from, prob)`` where ``prob``
    is the row-conditional transition probability n / n_from,
    floor-quantized to ``prob_scale`` decimals so the divide is
    engine-reproducible (the raw ratio's last bit is not portable;
    a quantized ratio of two exact longs is).
    """
    counts = transition_counts(df, entity, state, order_cols)
    w_from = Window.partitionBy("from_state")
    m = F.lit(float(10**prob_scale))
    return counts.withColumn(
        "n_from", F.sum("n").over(w_from)
    ).withColumn(
        "prob",
        F.floor(F.col("n") / F.col("n_from") * m + F.lit(0.5)) / m,
    )
