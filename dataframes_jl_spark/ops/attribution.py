"""Multi-touch conversion attribution: first-touch / last-touch /
linear credit of conversion value across preceding touchpoints.

Beyond-reference operator for event pipelines (the reference's
operator families stop at grouped aggregation — reference
src/grouping.jl; attribution is the composition a growth/marketing
warehouse builds on top of them daily): every conversion event credits
its value to the channels that touched the user beforehand, under the
three standard models — all of one lookback-bounded pass.

Shape and scale: ONE user-keyed equi-join pairs conversions with their
same-user touches, bounded by the lookback window (the join predicate
carries ``t_conv − lookback ≤ t_touch < t_conv``, so fan-out is
per-user touch volume inside the window, never the full history —
the same skew envelope as ops/scd.py's funnel). One window pass per
conversion orders its touches (fully-pinned ``(ts, uid)`` order), and
two keyed aggregates produce the model credits. Conversions with no
in-window touch credit the ``(direct)`` channel in every model.

Determinism: conversion value quantizes to integer cents; first/last
credits are exact integer sums. Linear shares divide cents by the
touch count — one IEEE division per (conversion, channel),
round-half-up-quantized (floor(x+0.5)) to sub-cent units before the
order-independent sum (the dsum discipline). Half-up means a
conversion's summed shares can OVERSHOOT its total value by up to
n/2 sub-cent units (one half-unit per touch) as well as undershoot —
a documented bounded rounding, not drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DIRECT = "(direct)"


def attribute_conversions(
    df: DataFrame,
    user: str,
    ts: str,
    uid: str,
    channel: str,
    value: str,
    is_conversion: Column,
    lookback_days: int = 30,
    out_scale: int = 2,
) -> DataFrame:
    """Per-channel credit table (module doc). ``uid`` is a unique
    event id pinning tie order; ``is_conversion`` is a Column
    predicate. Touches are the NON-conversion rows. Returns one row
    per credited channel:
    ``(channel, n_last, credit_first, credit_last, credit_linear)``
    with credits in value units (quantized to ``out_scale``).
    """
    ev = df.filter(
        F.col(user).isNotNull() & F.col(ts).isNotNull() & F.col(uid).isNotNull()
    )
    cents = F.floor(F.col(value).cast("double") * F.lit(100.0) + F.lit(0.5)).cast(
        "long"
    )
    conv = ev.filter(is_conversion).select(
        F.col(user).alias("cu"),
        F.unix_timestamp(ts).cast("long").alias("ct"),
        F.col(uid).cast("long").alias("cid"),
        F.coalesce(cents, F.lit(0)).alias("cents"),
    )
    touch = ev.filter(~is_conversion).select(
        F.col(user).alias("tu"),
        F.unix_timestamp(ts).cast("long").alias("tt"),
        F.col(uid).cast("long").alias("tid"),
        F.col(channel).alias("ch"),
        F.lit(1).alias("__m__"),  # match marker: NULL after a left miss
    )
    lb = F.lit(int(lookback_days) * 86400)
    # LEFT join: a conversion with no in-window touch survives as ONE
    # row with a NULL match marker and becomes its own (direct) credit
    # below — the previous inner-join + distinct + anti-join "direct"
    # branch re-executed the whole user-join subtree a second time (5
    # source scans in the physical plan). For the unmatched single row
    # the window formulas degenerate to exactly full credit (ra = rd =
    # n = 1 -> first_u = last_u = lin_u = cents*100, is_last = 1),
    # which IS the (direct) contract, so the union branch is redundant
    # by construction, not approximately.
    joined = conv.join(
        touch,
        (F.col("cu") == F.col("tu"))
        & (F.col("tt") < F.col("ct"))
        & (F.col("tt") >= F.col("ct") - lb),
        "left",
    )
    wa = Window.partitionBy("cid").orderBy("tt", "tid")
    wd = Window.partitionBy("cid").orderBy(F.col("tt").desc(), F.col("tid").desc())
    wn = Window.partitionBy("cid")
    ranked = joined.select(
        "cid",
        "cents",
        # the marker (not ch) distinguishes a left-miss from a touch
        # whose channel value is legitimately NULL
        F.when(F.col("__m__").isNull(), F.lit(DIRECT)).otherwise(
            F.col("ch")
        ).alias("ch"),
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wd).alias("rd"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    # sub-cent linear share per touch, round-half-up BEFORE the sum
    # (can overshoot the conversion total by <= n/2 sub-cent units)
    lin_units = F.floor(
        F.col("cents").cast("double") * F.lit(100.0) / F.col("n").cast("double")
        + F.lit(0.5)
    ).cast("long")
    credits = ranked.select(
        "ch",
        F.when(F.col("ra") == 1, F.col("cents") * F.lit(100)).otherwise(
            F.lit(0)
        ).alias("first_u"),
        F.when(F.col("rd") == 1, F.col("cents") * F.lit(100)).otherwise(
            F.lit(0)
        ).alias("last_u"),
        F.when(F.col("rd") == 1, F.lit(1)).otherwise(F.lit(0)).alias("is_last"),
        lin_units.alias("lin_u"),
    )
    om = float(10**out_scale)
    q = lambda c: (  # noqa: E731
        F.floor(F.col(c).cast("double") / F.lit(10000.0) * F.lit(om) + F.lit(0.5))
        / F.lit(om)
    )
    return (
        credits
        .groupBy(F.col("ch").alias(channel))
        .agg(
            F.sum("is_last").cast("long").alias("n_last"),
            F.sum("first_u").alias("__f__"),
            F.sum("last_u").alias("__l__"),
            F.sum("lin_u").alias("__n__"),
        )
        .select(
            channel,
            "n_last",
            q("__f__").alias("credit_first"),
            q("__l__").alias("credit_last"),
            q("__n__").alias("credit_linear"),
        )
    )
