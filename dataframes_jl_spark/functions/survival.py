"""Kaplan-Meier survival estimation over (duration, event) rows —
time-to-churn / time-to-conversion curves with right-censoring, the
retention statistic cohort tables approximate badly (a cohort table
treats silence as absence; KM treats it as censoring and stays
unbiased).

Beyond-reference statistics operator (the reference's surface stops at
describe/colwise moments — reference src/dataframe.jl): the estimator
is ``S(t) = Π_{t_i ≤ t} (1 − d_i / n_i)`` over distinct EVENT times,
with ``n_i`` the at-risk count just before ``t_i`` (alive and not yet
censored) and ``d_i`` the events at ``t_i``.

Shape: one map-side-combining aggregate collapses rows to the distinct
TIME table (events + censorings per quantized duration), the at-risk
counts come from one cumulative scan over that bounded table
(ops.window.with_running — per-group windows when grouped, the
range-partitioned prefix scan ungrouped; never a SinglePartition
window over raw rows), and the survival product is a SECOND running
sum in log space. Cost after the first aggregate is bounded by
|distinct durations|, never row count.

Determinism: durations quantize to integer units first; d/n are exact
longs; each ``ln((n−d)/n)`` term floor-quantizes to ``term_scale``
before the integer cumulative sum (the repo's jsd/char-lm treatment —
libm drift is absorbed per-term, never accumulated), and S
re-quantizes after the single exp.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(
    df: DataFrame,
    duration: str,
    event: str,
    group_by: Sequence[str] = (),
    scale: int = 0,
    term_scale: int = 8,
    out_scale: int = 6,
) -> DataFrame:
    """Per-group KM curve (module doc). ``event`` is 1 for an observed
    event, 0 for right-censored; values outside {0,1} raise in-plan.
    Returns one row per distinct EVENT time:
    ``(*group_by, t, n_risk, n_events, n_censored, survival)`` with
    ``t`` in quantized units (``duration·10^scale`` as int64).
    """
    from ..ops.window import with_running

    gb = list(group_by)
    m = F.lit(float(10**scale))
    e = F.col(event).cast("long")
    echk = F.when(e.isin(0, 1), e).otherwise(
        F.raise_error(F.lit(f"kaplan_meier: event {event} must be 0/1"))
    )
    per_t = (
        df.filter(F.col(duration).isNotNull() & F.col(event).isNotNull())
        .select(
            *gb,
            F.floor(F.col(duration).cast("double") * m + F.lit(0.5))
            .cast("long")
            .alias("t"),
            echk.alias("e"),
        )
        .groupBy(*gb, "t")
        .agg(
            F.sum("e").alias("d"),
            (F.count(F.lit(1)) - F.sum("e")).alias("c"),
        )
        .withColumn("leave", F.col("d") + F.col("c"))
    )
    totals = per_t.groupBy(*gb).agg(F.sum("leave").alias("N"))
    if gb:
        keyed = per_t.join(F.broadcast(totals), gb)
    else:
        keyed = per_t.crossJoin(F.broadcast(totals))
    run = with_running(
        keyed,
        {"cum_leave": ("sum", "leave")},
        order_by="t",
        partition_by=gb if gb else None,
    )
    # at risk just BEFORE t: everyone minus those who left earlier
    n_risk = F.col("N") - (F.col("cum_leave") - F.col("leave"))
    tm = F.lit(float(10**term_scale))
    # ln((n-d)/n) exact-ratio argument; quantized per-term (module doc)
    term = F.floor(
        F.log(
            (n_risk - F.col("d")).cast("double") / n_risk.cast("double")
        )
        * tm
        + F.lit(0.5)
    ).cast("long")
    stepped = run.select(
        *gb,
        "t",
        n_risk.alias("n_risk"),
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        # censoring-only times contribute a zero log-term (S unchanged);
        # a full-collapse time (d == n: ln 0) pins S to exactly 0 via a
        # sentinel that underflows exp in any engine
        F.when(F.col("d") <= 0, F.lit(0))
        .when(n_risk == F.col("d"), F.lit(-(10**17)))
        .otherwise(term)
        .alias("__lt__"),
    )
    run2 = with_running(
        stepped,
        {"cum_log": ("sum", "__lt__")},
        order_by="t",
        partition_by=gb if gb else None,
    )
    om = F.lit(float(10**out_scale))
    surv = F.exp(F.col("cum_log").cast("double") / tm)
    return (
        run2.filter(F.col("n_events") > 0)
        .select(
            *gb,
            "t",
            "n_risk",
            "n_events",
            "n_censored",
            (F.floor(surv * om + F.lit(0.5)) / om).alias("survival"),
        )
    )


def nelson_aalen(
    df: DataFrame,
    duration: str,
    event: str,
    group_by: Sequence[str] = (),
    scale: int = 0,
    term_scale: int = 8,
    out_scale: int = 6,
) -> DataFrame:
    """Per-group Nelson-Aalen cumulative-hazard estimator — Kaplan-
    Meier's additive twin: ``H(t) = Σ_{t_i ≤ t} d_i / n_i`` over
    distinct event times, with the same right-censoring treatment.
    Where KM's S(t) answers "what fraction survives past t", H(t) is
    the statistic hazard-ratio monitoring thresholds on (and
    ``exp(−H)`` is the Breslow survival estimate, less biased than KM
    under heavy ties).

    Identical plan shape to :func:`kaplan_meier` — one map-side
    aggregate to the distinct-time table, one with_running prefix scan
    for the at-risk counts, a second for the hazard sum — but the
    accumulation needs no log: each term ``d/n`` pays ONE
    correctly-rounded division, floor-quantizes to ``term_scale``, and
    the cumulative sum is exact int64. The Aalen variance rides the
    same pass (``Var = Σ d_i/n_i²``, per-term quantized at
    ``2·term_scale`` — the denominator is squared, so quantizing at
    ``term_scale`` would underflow every term to 0 once
    ``n_risk ≳ 1e4·√d``), surfacing as ``se_hazard``.

    Returns one row per distinct EVENT time:
    ``(*group_by, t, n_risk, n_events, n_censored, cum_hazard,
    se_hazard)``.
    """
    from ..ops.window import with_running

    gb = list(group_by)
    m = F.lit(float(10**scale))
    e = F.col(event).cast("long")
    echk = F.when(e.isin(0, 1), e).otherwise(
        F.raise_error(F.lit(f"nelson_aalen: event {event} must be 0/1"))
    )
    per_t = (
        df.filter(F.col(duration).isNotNull() & F.col(event).isNotNull())
        .select(
            *gb,
            F.floor(F.col(duration).cast("double") * m + F.lit(0.5))
            .cast("long")
            .alias("t"),
            echk.alias("e"),
        )
        .groupBy(*gb, "t")
        .agg(
            F.sum("e").alias("d"),
            (F.count(F.lit(1)) - F.sum("e")).alias("c"),
        )
        .withColumn("leave", F.col("d") + F.col("c"))
    )
    totals = per_t.groupBy(*gb).agg(F.sum("leave").alias("N"))
    if gb:
        keyed = per_t.join(F.broadcast(totals), gb)
    else:
        keyed = per_t.crossJoin(F.broadcast(totals))
    run = with_running(
        keyed,
        {"cum_leave": ("sum", "leave")},
        order_by="t",
        partition_by=gb if gb else None,
    )
    n_risk = F.col("N") - (F.col("cum_leave") - F.col("leave"))
    tm = F.lit(float(10**term_scale))
    nr = n_risk.cast("double")
    dd = F.col("d").cast("double")
    h_term = F.floor(dd / nr * tm + F.lit(0.5)).cast("long")
    # variance terms carry a SQUARED denominator — quantize at double
    # the scale (Σ_i 1/n_i · 10^16 is harmonic-bounded, int64-safe)
    tm2 = F.lit(float(10 ** (2 * term_scale)))
    v_term = F.floor(dd / (nr * nr) * tm2 + F.lit(0.5)).cast("long")
    stepped = run.select(
        *gb,
        "t",
        n_risk.alias("n_risk"),
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        F.when(F.col("d") <= 0, F.lit(0)).otherwise(h_term).alias("__ht__"),
        F.when(F.col("d") <= 0, F.lit(0)).otherwise(v_term).alias("__vt__"),
    )
    run2 = with_running(
        stepped,
        {"cum_h": ("sum", "__ht__"), "cum_v": ("sum", "__vt__")},
        order_by="t",
        partition_by=gb if gb else None,
    )
    om = F.lit(float(10**out_scale))

    def _q(c):
        return F.floor(c * om + F.lit(0.5)) / om

    return (
        run2.filter(F.col("n_events") > 0)
        .select(
            *gb,
            "t",
            "n_risk",
            "n_events",
            "n_censored",
            _q(F.col("cum_h").cast("double") / tm).alias("cum_hazard"),
            _q(F.sqrt(F.col("cum_v").cast("double") / tm2)).alias(
                "se_hazard"
            ),
        )
    )


def log_rank_test(
    df: DataFrame,
    duration: str,
    event: str,
    group: str,
    scale: int = 0,
    term_scale: int = 8,
    out_scale: int = 6,
) -> DataFrame:
    """Two-sample log-rank (Mantel-Cox) test — "do these two arms have
    the same survival curve?", the decision statistic an A/B experiment
    over time-to-event outcomes (churn, conversion latency) actually
    reads, where a difference-of-KM-curves eyeball is not a test.

    Beyond-reference statistics operator (same justification as
    :func:`kaplan_meier`). At each distinct EVENT time ``t`` pooled
    across both arms, with ``n_j``/``d_j`` the at-risk/event counts of
    arm ``j`` and ``n``/``d`` their sums, the arm-1 expectation is
    ``e_1 = d·n_1/n`` and the hypergeometric variance
    ``v = d·n_1·n_2·(n−d) / (n²·(n−1))``; the statistic is
    ``χ² = (Σ(d_1−e_1))² / Σv`` (1 df — compare to 3.841 for α=0.05;
    the p-value is left to the caller because an erf-free engine
    cannot replay it deterministically).

    Plan shape: one map-side aggregate to the per-(arm, time) table,
    ONE broadcast grid (2 arms × distinct times — at-risk counts need
    every arm's count at every pooled time, including censor-only
    times), a per-arm with_running prefix scan over that bounded
    table, one per-time regroup, and one final scalar aggregate. Cost
    after the first aggregate is bounded by |distinct durations|.

    Determinism: ``e`` and ``v`` terms floor-quantize to
    ``term_scale`` before the exact int64 sums (O₁ is exact by
    construction); the arm ordered first (``arm1``) is the MIN group
    value, so the statistic's sign convention is reproducible. Exactly
    two non-null groups are required — a third raises in-plan.

    Returns one row: ``(arm1, arm2, o1, e1, var1, chi2)``.
    """
    from ..ops.window import with_running

    m = F.lit(float(10**scale))
    e = F.col(event).cast("long")
    echk = F.when(e.isin(0, 1), e).otherwise(
        F.raise_error(F.lit(f"log_rank_test: event {event} must be 0/1"))
    )
    per_gt = (
        df.filter(
            F.col(duration).isNotNull()
            & F.col(event).isNotNull()
            & F.col(group).isNotNull()
        )
        .select(
            F.col(group).cast("string").alias("g"),
            F.floor(F.col(duration).cast("double") * m + F.lit(0.5))
            .cast("long")
            .alias("t"),
            echk.alias("e"),
        )
        .groupBy("g", "t")
        .agg(F.sum("e").alias("d"), F.count(F.lit(1)).alias("leave"))
    )
    arms = per_gt.groupBy("g").agg(F.sum("leave").alias("N"))
    meta = arms.agg(
        F.count(F.lit(1)).alias("n_arms"),
        F.min("g").alias("arm1"),
        F.max("g").alias("arm2"),
    )
    # the arity check rides N itself — an unused boolean column would be
    # pruned out of the plan along with its raise_error
    armchk = arms.crossJoin(F.broadcast(meta)).select(
        "g",
        F.when(F.col("n_arms") == 2, F.col("N"))
        .otherwise(
            F.raise_error(
                F.lit(f"log_rank_test: {group} must have exactly 2 values")
            ).cast("long")
        )
        .alias("N"),
        "arm1",
        "arm2",
    )
    times = per_gt.select("t").distinct()
    # bounded grid: 2 arms x |distinct times| — every arm needs a row at
    # every pooled time (censor-only times still shrink the risk set)
    grid = armchk.crossJoin(F.broadcast(times))
    cells = grid.join(per_gt, ["g", "t"], "left").select(
        "g",
        "t",
        "N",
        "arm1",
        "arm2",
        F.coalesce(F.col("d"), F.lit(0)).alias("d"),
        F.coalesce(F.col("leave"), F.lit(0)).alias("leave"),
    )
    run = with_running(
        cells, {"cum_leave": ("sum", "leave")}, order_by="t", partition_by=["g"]
    )
    n_risk = F.col("N") - (F.col("cum_leave") - F.col("leave"))
    per_t = (
        run.select(
            "t", "g", "arm1", "arm2", "d", n_risk.alias("nr")
        )
        .groupBy("t")
        .agg(
            F.first("arm1").alias("arm1"),
            F.first("arm2").alias("arm2"),
            F.sum("d").alias("d"),
            F.sum("nr").alias("n"),
            F.sum(F.when(F.col("g") == F.col("arm1"), F.col("d")).otherwise(0))
            .alias("d1"),
            F.sum(F.when(F.col("g") == F.col("arm1"), F.col("nr")).otherwise(0))
            .alias("n1"),
        )
        .filter(F.col("d") > 0)
    )
    tm = F.lit(float(10**term_scale))
    dd = F.col("d").cast("double")
    n1d = F.col("n1").cast("double")
    nd = F.col("n").cast("double")
    e_term = F.floor(dd * n1d / nd * tm + F.lit(0.5)).cast("long")
    v_term = F.when(
        F.col("n") > 1,
        F.floor(
            dd
            * n1d
            * (nd - n1d)
            * (nd - dd)
            / (nd * nd * (nd - F.lit(1.0)))
            * tm
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0))
    agg = per_t.agg(
        F.first("arm1").alias("arm1"),
        F.first("arm2").alias("arm2"),
        F.sum("d1").alias("o1"),
        F.sum(e_term).alias("__e__"),
        F.sum(v_term).alias("__v__"),
    )
    om = F.lit(float(10**out_scale))

    def _q(c):
        return F.floor(c * om + F.lit(0.5)) / om

    ed = F.col("__e__").cast("double") / tm
    vd = F.col("__v__").cast("double") / tm
    return agg.select(
        "arm1",
        "arm2",
        "o1",
        _q(ed).alias("e1"),
        _q(vd).alias("var1"),
        F.when(
            F.col("__v__") > 0,
            _q(
                (F.col("o1").cast("double") - ed)
                * (F.col("o1").cast("double") - ed)
                / vd
            ),
        ).alias("chi2"),
    )


def rmst(
    df: DataFrame,
    duration: str,
    event: str,
    tau: float,
    group_by: Sequence[str] = (),
    scale: int = 0,
    term_scale: int = 8,
    out_scale: int = 6,
) -> DataFrame:
    """Per-group restricted mean survival time — the AREA under the
    KM curve up to horizon ``tau``: "average event-free time in the
    first tau units", the one survival summary that stays defined
    under heavy censoring (the median explodes once S never crosses
    0.5, and hazard ratios assume proportionality; RMST needs
    neither — Royston & Parmar 2013 made it the standard reporting
    companion). Completes the lane: q_kaplan_meier draws the curve,
    q_nelson_aalen its hazard, q_log_rank compares two arms, RMST
    prices the curve as a single number per group.

        RMST(tau) = ∫₀^tau S(t) dt
                  = Σ_i S(t_{i−1})·(min(t_i, tau) − t_{i−1})
                    + S(t_last)·(tau − t_last)⁺     (S(t₀)=1)

    Built ON the kaplan_meier output (its survival values are already
    floor-quantized — both engines integrate identical step heights):
    one lag window over the bounded per-group event-time table for
    the previous step, per-segment contributions floor-quantized to
    ``out_scale`` units (widths are exact int64 time units, so the
    only float per segment is one multiply), exact integer sum.

    Returns one row ``(*group_by, tau, n, rmst)`` with ``n`` the
    group's subject count and rmst in ``duration`` units (quantized
    at ``scale``, like the KM ``t``). Groups whose first event is at
    or after tau integrate S = 1 across [0, tau]: rmst = tau.

    Scale shape: the KM chain's row-volume jobs (one per-(group, t)
    aggregate + two range-partitioned prefix scans), then only
    bounded per-group windows and one fold.
    """
    gb = list(group_by)
    km = kaplan_meier(
        df,
        duration,
        event,
        group_by=gb,
        scale=scale,
        term_scale=term_scale,
        out_scale=out_scale,
    )
    tq = int(round(float(tau) * (10**scale)))
    if tq <= 0:
        raise ValueError("tau must be positive")
    om = F.lit(float(10**out_scale))
    w = (
        Window.partitionBy(*gb).orderBy("t")
        if gb
        else Window.partitionBy().orderBy("t")
    )
    # bounded window: <= |distinct event times| rows per group
    lagged = km.select(
        *gb,
        "t",
        "survival",
        F.lag("t", 1, 0).over(w).alias("t_prev"),
        F.lag("survival", 1, 1.0).over(w).alias("s_prev"),
    )
    width = F.least(F.col("t"), F.lit(tq)) - F.least(
        F.col("t_prev"), F.lit(tq)
    )
    contrib = F.floor(
        F.col("s_prev") * width.cast("double") * om + F.lit(0.5)
    ).cast("long")
    # tail segment: last step's survival carries from t_last to tau
    per_g = lagged.groupBy(*gb).agg(
        F.sum(contrib).alias("area_u"),
        F.max(F.struct(F.col("t"), F.col("survival"))).alias("__last__"),
    )
    t_last = F.col("__last__.t")
    s_last = F.col("__last__.survival")
    tail = F.floor(
        s_last
        * (F.lit(tq) - F.least(t_last, F.lit(tq))).cast("double")
        * om
        + F.lit(0.5)
    ).cast("long")
    # subject counts ride the SOURCE rows (one map-side count): the KM
    # table drops all-censored groups entirely, and those integrate
    # S = 1 across [0, tau] — the left join + the coalesced tail give
    # them rmst = tau instead of silently vanishing
    counts = (
        df.filter(F.col(duration).isNotNull() & F.col(event).isNotNull())
        .groupBy(*gb)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if gb:
        joined = counts.join(F.broadcast(per_g), gb, "left")
    else:
        joined = counts.crossJoin(F.broadcast(per_g))
    area = F.coalesce(F.col("area_u"), F.lit(0))
    return joined.select(
        *gb,
        F.lit(float(tau)).alias("tau"),
        "n",
        (
            F.floor(
                (area + F.coalesce(tail, F.lit(tq) * F.lit(10**out_scale)))
                .cast("double")
                / om
                * om
                + F.lit(0.5)
            )
            / om
        ).alias("rmst"),
    )
