"""Time-series diagnostics over per-group DAILY aggregates: Theil-Sen
robust trend and autocorrelation.

Both operators follow the aggregate-then-analyze shape that keeps them
scale-free: the analysis input is the group's DAY table — bounded by
the calendar (366 rows/group/year) no matter how many events the group
logged — so the per-group quadratic (Theil-Sen's pairwise slopes) and
the per-lag windows cost O(days²) and O(days·lags), never anything
proportional to event volume. The only event-volume job is the first
map-side-combining daily count.

Determinism: daily counts are exact longs; Theil-Sen slopes are single
IEEE divisions of integer differences (correctly rounded — identical
in any engine), ranked with a fully-pinned order; the ACF clears the
float mean the same way cusum_peaks does — ``dev_d = n·x_d − total``
is exact int64, and the n² factors cancel in the ACF ratio, so
numerator and denominator are exact integer sums (decimal(38,0) —
dev² can exceed int64 under summation).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _daily(df: DataFrame, ts: str, gb: list) -> DataFrame:
    from pyspark import StorageLevel

    # every consumer (Theil-Sen's pair sides, the ACF/Ljung-Box join,
    # Mann-Kendall's three branches) fans this calendar-bounded table
    # into 2-3 plan branches; without the persist each branch re-runs
    # the row-volume daily count from the raw scan — the only
    # event-volume job in the module, multiplied for no reason. The
    # table itself is ≤ |groups|·366 rows/year. Caller/clearCache owns
    # unpersisting (the with_running contract).
    return (
        df.filter(F.col(ts).isNotNull())
        .groupBy(*gb, F.to_date(F.col(ts)).alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


def theilsen_trend(
    df: DataFrame,
    ts: str,
    group_by: Sequence[str],
    out_scale: int = 6,
) -> DataFrame:
    """Per-group Theil-Sen estimator of the daily-count trend: the
    MEDIAN of all pairwise slopes ``(x_j - x_i) / (day_j - day_i)`` —
    the robust alternative to OLS that one outage-day or spike cannot
    drag (breakdown point ~29%).

    The pair join is keyed by the group over the bounded day table
    (module doc). The median is the DISCRETE lower median — the
    element at rank ``ceil(n_pairs/2)`` under the fully-pinned order
    (slope, day_i, day_j) — a selected value, bit-identical across
    engines. Returns ``(group, n_days, n_pairs, trend_per_day)`` in
    events/day units.
    """
    gb = list(group_by)
    d = _daily(df, ts, gb)
    a = d.select(
        *gb, F.col("day").alias("d1"), F.col("x").alias("x1")
    )
    b = d.select(
        *gb, F.col("day").alias("d2"), F.col("x").alias("x2")
    )
    pairs = a.join(b, gb, "inner").filter(F.col("d1") < F.col("d2"))
    slope = (F.col("x2") - F.col("x1")).cast("double") / (
        F.unix_date(F.col("d2")) - F.unix_date(F.col("d1"))
    ).cast("double")
    w = Window.partitionBy(*gb).orderBy("__s__", "d1", "d2")
    wn = Window.partitionBy(*gb)
    ranked = pairs.select(*gb, slope.alias("__s__"), "d1", "d2").select(
        *gb,
        "__s__",
        F.row_number().over(w).alias("__rn__"),
        F.count(F.lit(1)).over(wn).alias("__np__"),
    )
    med = ranked.filter(
        F.col("__rn__") == F.ceil(F.col("__np__").cast("double") / F.lit(2.0))
    )
    days = d.groupBy(*gb).agg(F.count(F.lit(1)).alias("n_days"))
    m = F.lit(float(10**out_scale))
    return days.join(med, gb, "left").select(
        *gb,
        "n_days",
        F.coalesce("__np__", F.lit(0)).alias("n_pairs"),
        (F.floor(F.col("__s__") * m + F.lit(0.5)) / m).alias("trend_per_day"),
    )


def _acf_sums(
    df: DataFrame, ts: str, gb: list, max_lag: int
) -> DataFrame:
    """Shared ACF machinery of :func:`autocorrelation` and
    :func:`ljung_box`: per-group exact-integer lag-covariance sums
    over the daily series — one definition so the plot and the
    omnibus test cannot drift apart (the calibration-lane dedup
    lesson). Returns one row per group with ``n_days``, ``__den__``
    (Σ dev²) and ``__num{k}__`` (Σ dev_t·dev_{t+k}) for k = 1..max_lag,
    all decimal(38,0)-exact."""
    if max_lag < 1:
        raise ValueError("max_lag must be >= 1")
    d = _daily(df, ts, gb)
    stats = d.groupBy(*gb).agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("x").alias("total")
    )
    j = d.join(stats, gb, "inner")
    dev = (F.col("x") * F.col("n_days") - F.col("total")).alias("dev")
    w = Window.partitionBy(*gb).orderBy("day")
    base = j.select(*gb, "n_days", F.col("day"), dev).select(
        *gb,
        "n_days",
        "dev",
        *[
            F.lag("dev", k).over(w).alias(f"__l{k}__")
            for k in range(1, max_lag + 1)
        ],
    )
    dec = "decimal(38,0)"
    den = F.sum((F.col("dev").cast(dec) * F.col("dev").cast(dec)))
    aggs = [F.max("n_days").alias("n_days"), den.alias("__den__")]
    for k in range(1, max_lag + 1):
        aggs.append(
            F.sum(
                (F.col("dev").cast(dec) * F.col(f"__l{k}__").cast(dec))
            ).alias(f"__num{k}__")
        )
    return base.groupBy(*gb).agg(*aggs)


def autocorrelation(
    df: DataFrame,
    ts: str,
    group_by: Sequence[str],
    max_lag: int = 7,
    out_scale: int = 6,
) -> DataFrame:
    """Per-group autocorrelation of the daily count series at lags
    1..``max_lag`` — the seasonality fingerprint (a weekly cycle shows
    as a peak at lag 7) that complements the seasonal-residual and
    CUSUM operators.

    ACF_k = Σ dev_t·dev_{t+k} / Σ dev_t² over the OBSERVED day sequence
    (positional lags via row_number — for gap-free calendars, identical
    to calendar lags), with ``dev_t = n·x_t − total`` exact int64 (the
    n² factors cancel in the ratio). One row per (group, lag); lags
    with no overlapping pairs return NULL.
    """
    gb = list(group_by)
    agg = _acf_sums(df, ts, gb, max_lag)
    m = F.lit(float(10**out_scale))
    lags = F.array(
        *[
            F.struct(
                F.lit(k).alias("lag"),
                F.when(
                    F.col("__den__") > 0,
                    F.floor(
                        F.col(f"__num{k}__").cast("double")
                        / F.col("__den__").cast("double")
                        * m
                        + F.lit(0.5)
                    )
                    / m,
                ).alias("acf"),
            )
            for k in range(1, max_lag + 1)
        ]
    )
    ex = agg.select(*gb, "n_days", F.explode(lags).alias("s"))
    return ex.select(
        *gb, "n_days", F.col("s.lag").alias("lag"), F.col("s.acf").alias("acf")
    )


def interpolate_linear(
    df: DataFrame,
    ts: str,
    value: str,
    group_by: Sequence[str],
    out_scale: int = 6,
) -> DataFrame:
    """Per-group linear interpolation of NULL gaps in ``value`` over
    the ``ts`` order — the standard sensor/metric gap-fill that LOCF
    (ops/resample.py) deliberately is not: LOCF repeats the last
    reading, interpolation reconstructs the trend between readings.

    One keyed window pass computes, per row, the nearest non-NULL
    neighbor on each side (``last(value, ignorenulls=True)`` over the
    preceding frame; the mirrored ``first`` over the following frame —
    Spark evaluates both in a single Window stage per direction, two
    total, same hash shuffle). The fill is the exact lerp

        prev + (next − prev) · (t − t_prev) / (t_next − t_prev)

    with t in epoch seconds (int64): the arithmetic is one subtraction
    ratio and one multiply-add of IEEE doubles — correctly rounded and
    engine-identical — then floor-quantized to ``out_scale``. Leading/
    trailing NULLs (no neighbor on one side) stay NULL: inventing
    values outside the observed range is a modeling decision, not a
    fill. Non-NULL rows pass through unquantized.

    Requires a total order within groups: ``ts`` must be unique per
    group AT SECOND RESOLUTION — timestamps are quantized to epoch
    seconds via ``unix_timestamp`` (which truncates sub-second parts),
    so two readings inside the same second violate the precondition
    even if their raw timestamps differ. Violations make the neighbor
    choice order-dependent. Rows whose ``ts`` is NULL are dropped (a
    NULL timestamp has no position on the axis being interpolated).

    Scale shape: one hash shuffle on the group key; two Window stages
    over the same partitioning (Catalyst reuses the exchange); no
    join, no collect. Returns ONLY ``(*group_by, ts, value, filled)``
    — ``value`` is the filled column, ``filled`` flags interpolated
    rows; any other input columns are projected away (join the result
    back on ``(group_by, ts)`` if they are needed downstream).
    """
    gb = list(group_by)
    if not gb:
        raise ValueError(
            "interpolate_linear needs group_by; an ungrouped total-order "
            "fill should go through with_running's range-partitioned scan"
        )
    t = F.unix_timestamp(F.col(ts)).cast("long")
    v = F.col(value).cast("double")
    base = df.filter(F.col(ts).isNotNull()).select(
        *gb,
        F.col(ts).alias("__ts__"),
        t.alias("__t__"),
        v.alias("__v__"),
    )
    wb = (
        Window.partitionBy(*gb)
        .orderBy("__t__")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wf = (
        Window.partitionBy(*gb)
        .orderBy("__t__")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    tv = F.when(F.col("__v__").isNotNull(), F.col("__t__"))
    stepped = base.select(
        *gb,
        "__ts__",
        "__t__",
        "__v__",
        F.last("__v__", ignorenulls=True).over(wb).alias("pv"),
        F.last(tv, ignorenulls=True).over(wb).alias("pt"),
        F.first("__v__", ignorenulls=True).over(wf).alias("nv"),
        F.first(tv, ignorenulls=True).over(wf).alias("nt"),
    )
    om = F.lit(float(10**out_scale))
    span = (F.col("nt") - F.col("pt")).cast("double")
    frac = (F.col("__t__") - F.col("pt")).cast("double") / span
    lerp = F.col("pv") + (F.col("nv") - F.col("pv")) * frac
    fill = F.when(
        F.col("pv").isNotNull() & F.col("nv").isNotNull() & (span > 0),
        F.floor(lerp * om + F.lit(0.5)) / om,
    )
    return stepped.select(
        *gb,
        F.col("__ts__").alias(ts),
        F.when(F.col("__v__").isNotNull(), F.col("__v__"))
        .otherwise(fill)
        .alias(value),
        (F.col("__v__").isNull() & fill.isNotNull()).alias("filled"),
    )


def mann_kendall(
    df: DataFrame,
    ts: str,
    group_by: Sequence[str],
    out_scale: int = 6,
) -> DataFrame:
    """Per-group Mann-Kendall trend TEST over the daily-count series —
    the significance question :func:`theilsen_trend` leaves open: that
    operator reports the robust slope, this one reports whether ANY
    monotone trend is distinguishable from noise (the two are the
    classic pairing: Sen's slope for magnitude, MK for evidence; the
    test is sign-based, so one spike day cannot manufacture a trend).

        S = Σ_{i<j} sign(x_j − x_i)   (days ordered by calendar)
        Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18   (tie term)
        Z = (S − sign(S)) / √Var(S)   (continuity-corrected; 0 at S=0)

    |Z| > 1.96 rejects "no trend" at 5%. Returns ``(*group_by,
    n_days, s, var_s, z)``; ``z`` is NULL when Var(S) = 0 (a constant
    series — no test).

    Scale shape: the module-doc contract — ONE event-volume job (the
    map-side-combining daily count), then a group-keyed pair join of
    the calendar-bounded day table (days²/2 sign comparisons, exact
    int64 S) and a bounded tie regroup per distinct count value.
    Var(S) folds exact integers; only Z divides.
    """
    gb = list(group_by)
    d = _daily(df, ts, gb)
    a = d.select(*gb, F.col("day").alias("d1"), F.col("x").alias("x1"))
    b = d.select(*gb, F.col("day").alias("d2"), F.col("x").alias("x2"))
    s_tab = (
        a.join(b, gb, "inner")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy(*gb)
        .agg(F.sum(F.signum(F.col("x2") - F.col("x1"))).cast("long").alias("s"))
    )
    dec = "decimal(38,0)"
    t3 = (
        F.col("t").cast(dec)
        * (F.col("t").cast(dec) - F.lit(1))
        * (F.lit(2) * F.col("t").cast(dec) + F.lit(5))
    )
    ties = (
        d.groupBy(*gb, "x")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy(*gb)
        .agg(
            F.sum("t").alias("n_days"),
            F.sum(t3).alias("tie_term"),
        )
    )
    nd = F.col("n_days").cast(dec)
    var_num = (
        nd * (nd - F.lit(1)) * (F.lit(2) * nd + F.lit(5))
        - F.col("tie_term")
    )
    om = F.lit(float(10**out_scale))

    def _q(c):
        return F.floor(c * om + F.lit(0.5)) / om

    # left join: a 1-day group has no pairs — S is the empty sum (0),
    # Var(S) is 0, and z stays NULL rather than dropping the group
    joined = ties.join(s_tab, gb, "left")
    var_s = var_num.cast("double") / F.lit(18.0)
    sd = F.coalesce(F.col("s"), F.lit(0)).cast("double")
    z = (sd - F.signum(sd)) / F.sqrt(var_s)
    return joined.select(
        *gb,
        "n_days",
        F.coalesce("s", F.lit(0)).alias("s"),
        _q(var_s).alias("var_s"),
        F.when(var_s > 0, _q(z)).alias("z"),
    )


def ljung_box(
    df: DataFrame,
    ts: str,
    group_by: Sequence[str],
    max_lag: int = 7,
    out_scale: int = 6,
) -> DataFrame:
    """Per-group Ljung-Box portmanteau test over the daily-count
    series — the OMNIBUS verdict :func:`autocorrelation`'s per-lag
    plot leaves to the eye: "is this series distinguishable from
    white noise across the first m lags at all?" (Ljung & Box 1978;
    compare Q to chi-square with m degrees of freedom, e.g. 14.067
    for m = 7 at 5%):

        Q = n(n+2) · Σ_{k=1..m} ρ_k² / (n − k)

    Shares :func:`_acf_sums` with the ACF plot — one lag-covariance
    definition, two consumers (the calibration-lane dedup rule), so
    the ρ_k feeding Q are bit-identical to the plotted ones. Each
    ρ_k is a ratio of exact decimal(38,0) sums; the k-term fold is a
    fixed left-to-right sum of m doubles, written identically in the
    oracle. Lags with no overlap (k ≥ n) contribute nothing.

    Returns ``(*group_by, n_days, m_lags, q_stat)``; ``q_stat`` is
    NULL for constant series (zero denominator — no autocorrelation
    to test).

    Scale shape: identical to autocorrelation — the daily count is
    the only event-volume job; everything after rides the bounded
    per-group day table.
    """
    gb = list(group_by)
    agg = _acf_sums(df, ts, gb, max_lag)
    nd = F.col("n_days").cast("double")
    q = None
    for k in range(1, max_lag + 1):
        rho = F.col(f"__num{k}__").cast("double") / F.col(
            "__den__"
        ).cast("double")
        term = F.when(
            F.col("n_days") > k, rho * rho / (nd - F.lit(float(k)))
        ).otherwise(F.lit(0.0))
        q = term if q is None else q + term
    q = nd * (nd + F.lit(2.0)) * q
    m = F.lit(float(10**out_scale))
    return agg.select(
        *gb,
        "n_days",
        F.lit(int(max_lag)).alias("m_lags"),
        F.when(
            F.col("__den__") > 0, F.floor(q * m + F.lit(0.5)) / m
        ).alias("q_stat"),
    )


def dispersion_test(
    df: DataFrame,
    ts: str,
    group_by: Sequence[str],
    out_scale: int = 6,
) -> DataFrame:
    """Per-group index-of-dispersion test on the daily counts — the
    overdispersion question under every rate monitor: a Poisson
    arrival stream has variance ≈ mean (VMR = 1); real traffic is
    almost always burstier, and every alarm threshold calibrated on
    the Poisson assumption then under-covers. The classic statistic

        D = (n − 1)·s² / x̄   (≈ chi-square with n−1 df under Poisson)

    and the variance-to-mean ratio s²/x̄ in one row per group.

    Determinism: from the bounded day table, (n, Σx, Σx²) are exact
    int64/decimal; s², x̄, VMR and D are correctly-rounded expressions
    over those integers, floor-quantized on output. Returns
    ``(*group_by, n_days, mean_daily, vmr, d_stat)``; VMR/D NULL when
    n < 2 or the mean is 0.

    Scale shape: the daily count is the only event-volume job; ONE
    further map-side-combining aggregate folds the day table.
    """
    gb = list(group_by)
    d = _daily(df, ts, gb)
    dec = "decimal(38,0)"
    agg = d.groupBy(*gb).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).alias("sxx"),
    )
    nd = F.col("n_days").cast("double")
    sx = F.col("sx").cast("double")
    mean = sx / nd
    var = (F.col("sxx").cast("double") - sx * sx / nd) / (
        nd - F.lit(1.0)
    )
    vmr = var / mean
    m = F.lit(float(10**out_scale))

    def _q(c):
        return F.floor(c * m + F.lit(0.5)) / m

    ok = (F.col("n_days") > 1) & (F.col("sx") > 0)
    return agg.select(
        *gb,
        "n_days",
        _q(mean).alias("mean_daily"),
        F.when(ok, _q(vmr)).alias("vmr"),
        F.when(ok, _q((nd - F.lit(1.0)) * vmr)).alias("d_stat"),
    )
