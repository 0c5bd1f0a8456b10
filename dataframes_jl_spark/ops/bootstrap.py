"""Poisson bootstrap confidence intervals — the at-scale resampling
scheme (each row's multiplicity in replicate b is an independent
Poisson(1) draw, which matches multinomial resampling to O(1/n) and,
unlike it, needs NO global coordination: a row's weight depends only on
(row id, replicate id)).

Beyond-reference statistics operator (the reference's surface stops at
describe/colwise moments — reference src/dataframe.jl): the operator a
100 TB A/B readout actually needs — a point estimate is free, but the
uncertainty band around it is what the launch decision reads, and
closed-form SEs cover only the statistics with textbook formulas.

Shape: ONE projection explodes each row into ``n_boot`` (row,
replicate) pairs with an int64 Poisson weight, one map-side-combining
aggregate collapses to |groups| x n_boot replicate rows, and the
percentile bracket is a keyed window over that BOUNDED table (<=
n_boot rows per group). Cost is n_boot x the input scan in pure
codegen'd map work — linear, embarrassingly parallel, no extra
shuffle beyond the (group, replicate) aggregate.

Determinism (the repo's engine-portable discipline): the uniform
behind each Poisson draw is the ARX-mixed multiplicative hash of
``(id + replicate * SPREAD) mod P`` (ops/bloom's avalanche rounds —
affine-only hashes correlate across replicates), mapped to (0, 1];
the Poisson inversion compares against LITERAL cumulative-probability
constants embedded identically in the plan and the oracle; values
quantize to int64 units so every replicate sum is exact; replicate
means order by their exact quantized units (replicate id as
tie-break), and the CI is the PERCENTILE BRACKET (no interpolation) —
order statistics, engine-identical.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .bloom import _P, _hll_mix

# replicate-id spread before the mix: a large odd multiplier mod P so
# consecutive replicates of one row enter the avalanche far apart
_BOOT_SPREAD = 611_953_087

# Poisson(1) inversion thresholds: cum P(K <= k) for k = 0..7; a draw
# beyond the table (P ~ 1.1e-6) caps at 8 — a documented, engine-shared
# truncation, not drift. repr() of these exact doubles is embedded in
# both the Spark plan and the DuckDB oracle.
_POIS_CUM = []
_acc, _term = 0.0, math.exp(-1.0)
for _k in range(8):
    _acc += _term
    _POIS_CUM.append(_acc)
    _term /= _k + 1


def poisson_weight(u: Column) -> Column:
    """Poisson(1) multiplicity from a uniform in (0, 1] via the shared
    literal threshold table (module doc)."""
    w = F.when(u <= F.lit(_POIS_CUM[0]), F.lit(0))
    for k in range(1, len(_POIS_CUM)):
        w = w.when(u <= F.lit(_POIS_CUM[k]), F.lit(k))
    return w.otherwise(F.lit(len(_POIS_CUM)))


def _poisson_weights(base: DataFrame, gb: list, n_boot: int, carry: list):
    """Explode each base row into ``n_boot`` (row, replicate) pairs with
    the int64 Poisson(1) weight ``w`` (module doc). ``base`` must carry
    ``ks`` (the seeded mod-P row key); ``carry`` columns ride along.

    The base is spread to cluster parallelism first (identity when the
    source already has enough splits): the explode multiplies rows
    n_boot-fold and the map-side partial aggregation above it is the
    heavy stage — on a one-row-group source scan all of that would run
    on a single core. Weights depend only on (ks, b), so partitioning
    cannot change them."""
    from ..core.partition import spread

    base = spread(base)
    ex = base.select(
        *gb,
        "ks",
        *carry,
        F.explode(F.sequence(F.lit(0), F.lit(int(n_boot) - 1))).alias("b"),
    )
    h = _hll_mix(
        F.pmod(
            F.col("ks") + F.col("b").cast("long") * F.lit(_BOOT_SPREAD),
            F.lit(_P),
        )
    )
    # _hll_mix ends on an XOR, so its range slightly exceeds [0, P);
    # a final mod-P reduction keeps u genuinely in (0, 1] instead of
    # spilling ~3e-5 of draws past 1 into the weight cap
    h = F.pmod(h, F.lit(_P))
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(_P + 1))
    return ex.select(*gb, "b", *carry, poisson_weight(u).alias("w"))


def _percentile_bracket(rep: DataFrame, gb: list, alpha: float):
    """Order-statistic CI bracket + exact SD sums over the bounded
    (group, replicate) table. ``rep`` must carry the quantized int64
    replicate statistic as ``mu`` and the replicate id ``b``; returns
    one row per group: (lo_u, hi_u, nb, smu, smu2)."""
    dec = "decimal(38,0)"
    wnd = Window.partitionBy(*gb) if gb else Window.partitionBy()
    # bounded table: <= n_boot rows per group ride this window
    ordered = Window.partitionBy(*gb).orderBy("mu", "b") if gb else (
        Window.partitionBy().orderBy("mu", "b")
    )
    ranked = rep.select(
        *gb,
        "mu",
        F.row_number().over(ordered).alias("r"),
        F.count(F.lit(1)).over(wnd).alias("nb"),
        F.sum(F.col("mu").cast(dec)).over(wnd).alias("smu"),
        F.sum((F.col("mu").cast(dec) * F.col("mu").cast(dec))).over(
            wnd
        ).alias("smu2"),
    )
    k = F.floor(F.lit(float(alpha) / 2.0) * F.col("nb").cast("double")).cast(
        "long"
    )
    lo_hit = F.col("r") == k + 1
    hi_hit = F.col("r") == F.col("nb") - k
    return ranked.filter(lo_hit | hi_hit).groupBy(*gb).agg(
        F.min(F.when(lo_hit, F.col("mu"))).alias("lo_u"),
        F.max(F.when(hi_hit, F.col("mu"))).alias("hi_u"),
        F.max("nb").alias("nb"),
        F.max("smu").alias("smu"),
        F.max("smu2").alias("smu2"),
    )


def _se_from_sums(out_scale: int, unit_div: Column):
    """(boot_se expression builder) sample SD of the replicate statistic
    from the exact decimal sums, NULL when only one replicate survives."""
    om = F.lit(float(10**out_scale))
    nb = F.col("nb").cast("double")
    var = (
        F.col("smu2").cast("double")
        - F.col("smu").cast("double") * F.col("smu").cast("double") / nb
    ) / (nb - F.lit(1.0))
    # a single surviving replicate makes var 0/0 = NaN (and greatest
    # keeps NaN); report NULL for the degenerate SD instead
    return F.when(
        F.col("nb") > 1,
        F.floor(
            F.sqrt(F.greatest(var, F.lit(0.0))) / unit_div * om + F.lit(0.5)
        )
        / om,
    )


def bootstrap_mean_ci(
    df: DataFrame,
    id_col: str,
    value: str,
    group_by: Sequence[str] = (),
    n_boot: int = 100,
    alpha: float = 0.05,
    seed: int = 1,
    scale: int = 4,
    out_scale: int = 6,
) -> DataFrame:
    """Per-group Poisson-bootstrap percentile CI for the MEAN of
    ``value`` (module doc). ``id_col`` must be a stable integer row
    identity (weights depend only on it, so re-runs and re-partitions
    reproduce the same replicates). Returns one row per group:
    ``(*group_by, n, mean, boot_lo, boot_hi, boot_se)`` — the bracket
    is the floor(alpha/2 * B)-th order statistic from each end over
    the B replicate means; boot_se is the sample SD of the replicate
    means (exact integer sums of quantized means). NULL id/value rows
    are dropped.
    """
    if n_boot < 2:
        raise ValueError("n_boot must be >= 2")
    gb = list(group_by)
    m = 10**scale
    base = df.filter(
        F.col(id_col).isNotNull() & F.col(value).isNotNull()
    ).select(
        *gb,
        F.pmod(F.col(id_col).cast("long") + F.lit(int(seed)), F.lit(_P)).alias(
            "ks"
        ),
        F.floor(F.col(value).cast("double") * F.lit(float(m)) + F.lit(0.5))
        .cast("long")
        .alias("xu"),
    )
    dec = "decimal(38,0)"
    ww = _poisson_weights(base, gb, n_boot, ["xu"])
    rep = (
        ww.groupBy(*gb, "b")
        .agg(
            F.sum("w").alias("nw"),
            F.sum(F.col("w").cast(dec) * F.col("xu").cast(dec)).alias("swx"),
        )
        .filter(F.col("nw") > 0)
    )
    # replicate mean in exact quantized units: ONE division, then
    # floor-quantize so ordering and the SD sums are integer-exact
    mu_u = F.floor(
        F.col("swx").cast("double") / F.col("nw").cast("double") + F.lit(0.5)
    ).cast("long")
    picks = _percentile_bracket(
        rep.select(*gb, "b", mu_u.alias("mu")), gb, alpha
    )
    om = F.lit(float(10**out_scale))

    def _q(c):
        return F.floor(c * om + F.lit(0.5)) / om

    totals = base.groupBy(*gb).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("xu").cast(dec)).alias("sx"),
    )
    if gb:
        joined = totals.join(picks, gb)
    else:
        joined = totals.crossJoin(picks)
    mf = F.lit(float(m))
    return joined.select(
        *gb,
        "n",
        _q(
            F.col("sx").cast("double") / F.col("n").cast("double") / mf
        ).alias("mean"),
        _q(F.col("lo_u").cast("double") / mf).alias("boot_lo"),
        _q(F.col("hi_u").cast("double") / mf).alias("boot_hi"),
        _se_from_sums(out_scale, mf).alias("boot_se"),
    )


def bootstrap_ratio_ci(
    df: DataFrame,
    id_col: str,
    num: str,
    den: str,
    group_by: Sequence[str] = (),
    n_boot: int = 100,
    alpha: float = 0.05,
    seed: int = 1,
    scale: int = 4,
    out_scale: int = 6,
) -> DataFrame:
    """Per-group Poisson-bootstrap percentile CI for the RATIO OF SUMS
    ``sum(num)/sum(den)`` — the shape real A/B metrics take (CTR =
    clicks/impressions, revenue-per-session, tokens-per-doc), where
    the unit of randomization contributes to BOTH numerator and
    denominator and the delta-method SE is easy to get wrong.
    Each replicate reweights whole ROWS (one Poisson draw per (row,
    replicate), shared by num and den — preserving their within-row
    correlation, which is the entire point vs bootstrapping the two
    sums independently).

    Same plan shape, determinism contract, and ``id_col`` stability
    requirement as :func:`bootstrap_mean_ci`; replicates whose
    denominator sum is <= 0 are dropped (their ratio is undefined —
    with heavy-tailed denominators prefer larger n_boot). Returns one
    row per group: ``(*group_by, n, ratio, boot_lo, boot_hi,
    boot_se)``; the point estimate is the full-sample ratio (NULL when
    the denominator total is 0).
    """
    if n_boot < 2:
        raise ValueError("n_boot must be >= 2")
    gb = list(group_by)
    m = 10**scale
    mf = F.lit(float(m))
    base = df.filter(
        F.col(id_col).isNotNull()
        & F.col(num).isNotNull()
        & F.col(den).isNotNull()
    ).select(
        *gb,
        F.pmod(F.col(id_col).cast("long") + F.lit(int(seed)), F.lit(_P)).alias(
            "ks"
        ),
        F.floor(F.col(num).cast("double") * mf + F.lit(0.5))
        .cast("long")
        .alias("xu"),
        F.floor(F.col(den).cast("double") * mf + F.lit(0.5))
        .cast("long")
        .alias("yu"),
    )
    dec = "decimal(38,0)"
    ww = _poisson_weights(base, gb, n_boot, ["xu", "yu"])
    rep = (
        ww.groupBy(*gb, "b")
        .agg(
            F.sum(F.col("w").cast(dec) * F.col("xu").cast(dec)).alias("swx"),
            F.sum(F.col("w").cast(dec) * F.col("yu").cast(dec)).alias("swy"),
        )
        .filter(F.col("swy") > 0)
    )
    # replicate ratio quantized to out_scale units: ONE division, then
    # floor — ordering, the bracket, and the SD sums are integer-exact
    ou = F.lit(float(10**out_scale))
    r_u = F.floor(
        F.col("swx").cast("double") / F.col("swy").cast("double") * ou
        + F.lit(0.5)
    ).cast("long")
    picks = _percentile_bracket(
        rep.select(*gb, "b", r_u.alias("mu")), gb, alpha
    )

    def _q(c):
        return F.floor(c * ou + F.lit(0.5)) / ou

    totals = base.groupBy(*gb).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("xu").cast(dec)).alias("sx"),
        F.sum(F.col("yu").cast(dec)).alias("sy"),
    )
    if gb:
        joined = totals.join(picks, gb)
    else:
        joined = totals.crossJoin(picks)
    return joined.select(
        *gb,
        "n",
        F.when(
            F.col("sy") > 0,
            _q(F.col("sx").cast("double") / F.col("sy").cast("double")),
        ).alias("ratio"),
        (F.col("lo_u").cast("double") / ou).alias("boot_lo"),
        (F.col("hi_u").cast("double") / ou).alias("boot_hi"),
        _se_from_sums(out_scale, ou).alias("boot_se"),
    )


def randomization_test_mean_diff(
    df: DataFrame,
    id_col: str,
    value: str,
    group_col: str,
    group_a: str,
    group_b: str,
    n_perm: int = 99,
    seed: int = 1,
    scale: int = 4,
    out_scale: int = 6,
) -> DataFrame:
    """Monte-Carlo randomization test for the mean difference between
    two arms — the assumption-free companion to functions.stats.
    welch_ttest: instead of a t reference distribution, the null is
    SIMULATED by re-assigning arm labels and asking how often a
    re-assignment produces a gap as large as the observed one (Fisher
    1935; the Monte-Carlo p-value with the +1 correction is Dwass
    1957 — valid at ANY n_perm, conservative at small ones).

    Re-assignments are the repo's deterministic replicate machinery
    (the bootstrap module's ARX-mixed hash on ``id_col`` × replicate
    id): under replicate b, a row joins pseudo-arm A iff its uniform
    u ≤ n_a/(n_a+n_b) — Bernoulli re-randomization rather than a
    fixed-margin permutation (a global shuffle is inherently serial;
    Bernoulli assignment is embarrassingly parallel, and the test it
    yields is exactly valid for the Bernoulli randomization null —
    re-assignments with an empty pseudo-arm contribute a NULL diff
    and are excluded from both sides of the p-value count).

    Returns one row ``(n_a, n_b, mean_a, mean_b, obs_diff, n_used,
    n_extreme, p_value)`` where p = (1 + #{|diff_b| ≥ |obs|}) /
    (n_used + 1), two-sided.

    Scale shape: the bootstrap explode — ONE projection fans each row
    into n_perm (replicate, pseudo-arm) pairs, ONE map-side-combining
    (b, arm) aggregate over exact quantized int64 sums, and the
    p-value folds a ≤ n_perm-row bounded table; the observed arms and
    the n_a/(n_a+n_b) threshold ride broadcast 1-row crossJoins.
    Everything up to the final divides is exact integer arithmetic
    shared bit-for-bit with the DuckDB oracle.
    """
    if n_perm < 1:
        raise ValueError("n_perm must be >= 1")
    m = 10**scale
    dec = "decimal(38,0)"
    base = df.filter(
        F.col(id_col).isNotNull()
        & F.col(value).isNotNull()
        & F.col(group_col).isin(group_a, group_b)
    ).select(
        F.pmod(
            F.col(id_col).cast("long") + F.lit(int(seed)), F.lit(_P)
        ).alias("ks"),
        F.floor(
            F.col(value).cast("double") * F.lit(float(m)) + F.lit(0.5)
        )
        .cast("long")
        .alias("xu"),
        (F.col(group_col) == F.lit(group_a)).alias("is_a"),
    )
    from pyspark import StorageLevel

    # 1-row frame consumed by two branches (the assignment threshold
    # and the p-value fold); the persist keeps the second consumer
    # from re-scanning the arm rows for four sums already computed
    obs = base.agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("is_a"), F.col("xu")).otherwise(F.lit(0)))
        .cast(dec)
        .alias("sa"),
        F.sum(F.when(~F.col("is_a"), F.col("xu")).otherwise(F.lit(0)))
        .cast(dec)
        .alias("sb"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # replicate fan-out: u from the shared mixed hash, pseudo-arm by
    # threshold n_a/(n_a+n_b) (broadcast 1-row)
    ex = base.select(
        "ks",
        "xu",
        F.explode(F.sequence(F.lit(0), F.lit(int(n_perm) - 1))).alias(
            "b"
        ),
    )
    h = _hll_mix(
        F.pmod(
            F.col("ks") + F.col("b").cast("long") * F.lit(_BOOT_SPREAD),
            F.lit(_P),
        )
    )
    h = F.pmod(h, F.lit(_P))
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(_P + 1))
    thr = obs.select(
        (
            F.col("n_a").cast("double")
            / (F.col("n_a") + F.col("n_b")).cast("double")
        ).alias("p_a")
    )
    assigned = ex.crossJoin(F.broadcast(thr)).select(
        "b",
        "xu",
        (u <= F.col("p_a")).alias("pa"),
    )
    rep = assigned.groupBy("b").agg(
        F.sum(F.when(F.col("pa"), 1).otherwise(0)).alias("ra"),
        F.sum(F.when(~F.col("pa"), 1).otherwise(0)).alias("rb"),
        F.sum(F.when(F.col("pa"), F.col("xu")).otherwise(F.lit(0)))
        .cast(dec)
        .alias("rsa"),
        F.sum(F.when(~F.col("pa"), F.col("xu")).otherwise(F.lit(0)))
        .cast(dec)
        .alias("rsb"),
    )
    # |replicate diff| in original units; NULL when an arm is empty
    rdiff = F.when(
        (F.col("ra") > 0) & (F.col("rb") > 0),
        F.abs(
            F.col("rsa").cast("double") / F.col("ra").cast("double")
            - F.col("rsb").cast("double") / F.col("rb").cast("double")
        ),
    )
    om = F.lit(float(10**out_scale))

    def _q(c):
        return F.floor(c * om + F.lit(0.5)) / om

    mf = F.lit(float(m))
    mean_a = F.col("sa").cast("double") / F.col("n_a").cast("double")
    mean_b = F.col("sb").cast("double") / F.col("n_b").cast("double")
    obs_diff = (mean_a - mean_b) / mf
    # count extremes against the observed gap (1-row broadcast)
    counted = rep.select(rdiff.alias("ad")).crossJoin(
        F.broadcast(
            obs.select(
                "n_a",
                "n_b",
                "sa",
                "sb",
                F.abs(
                    F.col("sa").cast("double")
                    / F.col("n_a").cast("double")
                    - F.col("sb").cast("double")
                    / F.col("n_b").cast("double")
                ).alias("obs_abs_u"),
            )
        )
    ).agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.max("sa").alias("sa"),
        F.max("sb").alias("sb"),
        F.sum(F.when(F.col("ad").isNotNull(), 1).otherwise(0)).alias(
            "n_used"
        ),
        F.sum(
            F.when(F.col("ad") >= F.col("obs_abs_u"), 1).otherwise(0)
        ).alias("n_extreme"),
    )
    return counted.select(
        "n_a",
        "n_b",
        _q(mean_a / mf).alias("mean_a"),
        _q(mean_b / mf).alias("mean_b"),
        _q(obs_diff).alias("obs_diff"),
        "n_used",
        "n_extreme",
        _q(
            (F.col("n_extreme").cast("double") + F.lit(1.0))
            / (F.col("n_used").cast("double") + F.lit(1.0))
        ).alias("p_value"),
    )
