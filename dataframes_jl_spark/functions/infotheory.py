"""Information-theoretic / chi-square association between categorical
columns.

Beyond-reference operator (the reference's stats stop at moments and
correlation, src/statistics.jl — this is the categorical counterpart a
feature-audit pipeline needs): given two discrete columns, estimate how
strongly they are associated — mutual information (nats), the Pearson
chi-square statistic, and Cramér's V — in ONE pass over the data.

Scale shape: one map-side-combining aggregate to the |A|x|B| contingency
table (sketch-free and exact because the cell count is bounded by the
category product, never by row count), then margins and the test
statistics are windows/aggregates over that tiny table. No second data
pass, no driver state beyond the final reduce, nothing proportional to
event volume moves after the first shuffle.

Determinism: every statistic is a sum over cells of f(exact longs);
each cell's term is floor-quantized to int64 units before the final
sum (the ``dsum`` discipline — integer addition is order-independent,
so the result is bit-stable across partitionings and engines; libm
``ln`` drift is absorbed by the quantization).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def contingency(df: DataFrame, a: str | Column, b: str | Column) -> DataFrame:
    """Exact contingency table ``(a, b, n, n_a, n_b, n_total)``.

    NULL categories are kept as their own level (they carry signal in a
    data audit); margins are windows over the cell table.
    """
    from pyspark.sql import Window

    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    cells = df.groupBy(ca.alias("a"), cb.alias("b")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wa = Window.partitionBy("a")
    wb = Window.partitionBy("b")
    wt = Window.partitionBy()
    # the "window over everything" is over the |A|x|B| CELL table (tiny,
    # bounded by category cardinalities), never over the input rows —
    # the SinglePartition here holds a few hundred rows by construction
    return (
        cells.withColumn("n_a", F.sum("n").over(wa))
        .withColumn("n_b", F.sum("n").over(wb))
        .withColumn("n_total", F.sum("n").over(wt))
    )


def association(
    df: DataFrame,
    a: str | Column,
    b: str | Column,
    term_scale: int = 8,
) -> DataFrame:
    """One-row association audit between two categorical columns.

    Returns ``(n_total, n_levels_a, n_levels_b, chi2, mutual_info,
    cramers_v)``:

    - ``chi2``        Pearson chi-square: sum (O - E)^2 / E with
                      E = n_a * n_b / n. Cells with O = 0 never appear
                      in the grouped table, but their contribution is
                      exactly E — so the empty-cell mass is added in
                      closed form as n - sum_observed(E), without ever
                      materializing the |A|x|B| grid.
    - ``mutual_info`` sum p_ab * ln(p_ab * n^2 / (n_a * n_b)), nats;
                      empty cells contribute 0 by definition (and are
                      absent from the grouped table anyway).
    - ``cramers_v``   sqrt(chi2 / (n * (min(|A|,|B|) - 1))) in [0, 1],
                      the effect size that is comparable across table
                      shapes; 0 when either column is constant.

    Each per-cell term is quantized to ``term_scale`` decimals before
    summation so the statistics are order- and engine-independent; the
    gate's oracle replays the identical quantized arithmetic.
    """
    t = contingency(df, a, b)
    m = F.lit(float(10**term_scale))
    n = F.col("n").cast("double")
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    nt = F.col("n_total").cast("double")
    expected = na * nb / nt
    chi_term = (n - expected) * (n - expected) / expected
    mi_term = (n / nt) * F.log(n * nt / (na * nb))
    # count_distinct skips NULL, but contingency keeps NULL as a level —
    # add it back so dof matches the table the statistics summed over
    nlev_a = F.count_distinct("a") + F.max(F.col("a").isNull().cast("long"))
    nlev_b = F.count_distinct("b") + F.max(F.col("b").isNull().cast("long"))
    agg = t.agg(
        F.max("n_total").alias("n_total"),
        nlev_a.alias("n_levels_a"),
        nlev_b.alias("n_levels_b"),
        (F.sum(F.floor(chi_term * m + F.lit(0.5))) / m).alias("__chi_obs__"),
        (F.sum(F.floor(expected * m + F.lit(0.5))) / m).alias("__e_obs__"),
        (F.sum(F.floor(mi_term * m + F.lit(0.5))) / m).alias("mutual_info"),
    ).withColumn(
        # empty cells contribute (0-E)^2/E = E each; their total is
        # n - sum(E over observed cells), exact in closed form
        "chi2",
        F.col("__chi_obs__") + (F.col("n_total") - F.col("__e_obs__")),
    ).drop("__chi_obs__", "__e_obs__")
    dof = F.least("n_levels_a", "n_levels_b") - F.lit(1)
    v = F.when(
        dof > 0,
        F.sqrt(
            F.greatest(F.col("chi2"), F.lit(0.0))
            / (F.col("n_total") * dof)
        ),
    ).otherwise(F.lit(0.0))
    return agg.withColumn("cramers_v", v)


def cohens_kappa(
    df: DataFrame,
    a: str | Column,
    b: str | Column,
    out_scale: int = 6,
) -> DataFrame:
    """Cohen's kappa between two categorical columns over the same rows
    — chance-corrected agreement, the standard audit when two labelers
    (model vs heuristic, old pipeline vs new) tag the same corpus:
    ``kappa = (p_o - p_e) / (1 - p_e)`` with ``p_o`` the observed
    agreement ``Σ diag / n`` and ``p_e`` the chance agreement
    ``Σ_k n_a(k)·n_b(k) / n²``.

    Same scale shape as :func:`association`: ONE aggregate to the
    bounded contingency table, statistics over that tiny table.
    Determinism is stronger here: kappa is a ratio of exact integer
    sums — ``p_o - p_e = (n·Σdiag - Σ n_a·n_b) / (n² - Σ n_a·n_b)``
    after clearing denominators — so the ONLY float op is the final
    division (correctly rounded IEEE), then floor-quantization. The
    int64 products are guarded by an in-plan assert (n < ~3e9 rows;
    beyond that the cleared-denominator products need decimal128).

    Returns one row ``(n_total, p_observed, p_expected, kappa)``.
    """
    t = contingency(df, a, b)
    diag = F.when(
        F.col("a").eqNullSafe(F.col("b")), F.col("n")
    ).otherwise(F.lit(0))
    # Σ n_a·n_b over matching LEVELS: each level k contributes once —
    # take it from one representative cell per (a-level) joined against
    # b-margins... simpler exactly: chance term needs per-level product
    # of the two margins for the SAME label value. Recover margins by
    # re-aggregating the cell table (still bounded).
    ma = t.groupBy("a").agg(F.max("n_a").alias("na")).withColumnRenamed("a", "k")
    mb = t.groupBy("b").agg(F.max("n_b").alias("nb")).withColumnRenamed("b", "k")
    # |levels| rows per side — broadcast the inner join of margins
    chance = ma.join(F.broadcast(mb), ma["k"].eqNullSafe(mb["k"]), "inner").agg(
        F.sum(F.col("na") * F.col("nb")).alias("sum_nanb")
    )
    ok = F.assert_true(
        F.col("n_total").cast("double") < F.lit(3.0e9),
        F.lit("cohens_kappa: n too large for int64 cross-products"),
    )
    base = t.agg(
        F.max("n_total").alias("n_total"),
        F.sum(diag).alias("sum_diag"),
    ).crossJoin(F.broadcast(chance))
    n = F.col("n_total")
    m = F.lit(float(10**out_scale))

    def _q(x):
        return F.floor(x * m + F.lit(0.5)) / m

    po = F.col("sum_diag").cast("double") / n.cast("double")
    pe = F.col("sum_nanb").cast("double") / (n * n).cast("double")
    kappa_num = (n * F.col("sum_diag") - F.col("sum_nanb")).cast("double")
    kappa_den = (n * n - F.col("sum_nanb")).cast("double")
    kappa = F.when(kappa_den > 0, kappa_num / kappa_den).otherwise(
        F.lit(1.0)
    ) + F.when(ok.isNull(), F.lit(0.0))
    return base.select(
        "n_total",
        _q(po).alias("p_observed"),
        _q(pe).alias("p_expected"),
        _q(kappa).alias("kappa"),
    )


def confusion_metrics(
    df: DataFrame,
    truth: str | Column,
    pred: str | Column,
    out_scale: int = 6,
) -> DataFrame:
    """Per-class precision / recall / F1 between a truth and a
    predicted categorical column — the per-class companion to the
    scalar :func:`cohens_kappa` (a relabeling pipeline wants to know
    WHICH class degraded, not just that agreement dropped).

    One aggregate to the bounded contingency table; per class c:
    ``tp = n(truth=c, pred=c)``, ``pred_pos = Σ n(·, c)``,
    ``actual_pos = Σ n(c, ·)``. All counts exact int64; the three
    ratios are single divisions of exact integers (F1 is computed as
    ``2·tp / (pred_pos + actual_pos)`` — the cleared-denominator form,
    one division instead of a p/r compound), floor-quantized.

    Returns one row per class present in EITHER column:
    ``(label, tp, pred_pos, actual_pos, precision, recall, f1)``.
    """
    t = contingency(df, truth, pred)
    # per-class rows: classes from both margins (full outer on level)
    ma = t.groupBy("a").agg(F.max("n_a").alias("actual_pos"))
    mb = t.groupBy("b").agg(F.max("n_b").alias("pred_pos"))
    diag = t.filter(F.col("a").eqNullSafe(F.col("b"))).select(
        F.col("a").alias("label"), F.col("n").alias("tp")
    )
    # NULL is a class (contingency keeps it, and its diagonal cell
    # exists via eqNullSafe) — so the margin/diagonal merges must be
    # NULL-safe too, or the NULL class splits into rows with tp=0 and
    # mismatched margins. Rename keys per side (fresh exprIds), join
    # eqNullSafe, coalesce.
    ma_t = ma.select(F.col("a").alias("lma"), "actual_pos")
    mb_t = mb.select(F.col("b").alias("lmb"), "pred_pos")
    dg_t = diag.select(F.col("label").alias("ldg"), "tp")
    base = (
        ma_t.join(mb_t, F.col("lma").eqNullSafe(F.col("lmb")), "full_outer")
        .withColumn("lbl", F.coalesce("lma", "lmb"))
        .join(dg_t, F.col("lbl").eqNullSafe(F.col("ldg")), "left")
        .select(
            F.col("lbl").alias("label"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
            F.coalesce("pred_pos", F.lit(0)).alias("pred_pos"),
            F.coalesce("actual_pos", F.lit(0)).alias("actual_pos"),
        )
    )
    m = F.lit(float(10**out_scale))

    def _q(x):
        return F.floor(x * m + F.lit(0.5)) / m

    tp = F.col("tp").cast("double")
    prec = F.when(F.col("pred_pos") > 0, tp / F.col("pred_pos").cast("double")).otherwise(F.lit(0.0))
    rec = F.when(F.col("actual_pos") > 0, tp / F.col("actual_pos").cast("double")).otherwise(F.lit(0.0))
    f1 = F.when(
        (F.col("pred_pos") + F.col("actual_pos")) > 0,
        F.lit(2.0) * tp / (F.col("pred_pos") + F.col("actual_pos")).cast("double"),
    ).otherwise(F.lit(0.0))
    return base.select(
        "label",
        "tp",
        "pred_pos",
        "actual_pos",
        _q(prec).alias("precision"),
        _q(rec).alias("recall"),
        _q(f1).alias("f1"),
    )


def jensen_shannon(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str | Column,
    term_scale: int = 8,
) -> DataFrame:
    """Jensen-Shannon divergence (nats) between the categorical
    distributions of ``col`` in two frames — the bounded, symmetric
    drift measure for label/domain mixes: 0 = identical, ln 2 =
    disjoint. Complements :func:`~.stats.psi` (PSI blows up on empty
    bins; JSD is always finite) and :func:`~.stats.ks_statistic`
    (which needs an ordered column; JSD works on any categorical).

    One map-side-combining count per side to the bounded level table,
    one full-outer merge, then per-level terms
    ``p·ln(p/m) + q·ln(q/m)`` with ``m = (p+q)/2``, each floor-
    quantized to ``term_scale`` decimals before the order-independent
    integer sum (the dsum discipline — libm ln drift is absorbed by
    the quantization). A level absent from one side contributes its
    ``p·ln 2`` term exactly (its m is p/2).

    Returns one row ``(n_a, n_b, n_levels, jsd, jsd_norm)`` with
    ``jsd_norm`` = jsd/ln2 in [0, 1].
    """
    c = F.col(col) if isinstance(col, str) else col

    def counts(df: DataFrame, name: str) -> DataFrame:
        return df.groupBy(c.alias("lvl")).agg(F.count(F.lit(1)).alias(name))

    # NULL is a level (the contingency() convention): merge with an
    # eqNullSafe key so a NULL level present on both sides lands in ONE
    # row — a plain ["lvl"] equi-join would split it into two disjoint
    # rows, double-count n_levels, and inflate the divergence
    ca_t = counts(df_a, "ca").select(F.col("lvl").alias("la"), "ca")
    cb_t = counts(df_b, "cb").select(F.col("lvl").alias("lb"), "cb")
    merged = ca_t.join(
        cb_t, F.col("la").eqNullSafe(F.col("lb")), "full_outer"
    ).select(
        F.coalesce("la", "lb").alias("lvl"),
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    from pyspark.sql import Window

    # totals as windows over the bounded LEVEL table (never the rows)
    wt = Window.partitionBy()
    t = merged.select(
        "lvl",
        "ca",
        "cb",
        F.sum("ca").over(wt).alias("na"),
        F.sum("cb").over(wt).alias("nb"),
    )
    p = F.col("ca").cast("double") / F.col("na").cast("double")
    q = F.col("cb").cast("double") / F.col("nb").cast("double")
    mid = (p + q) / F.lit(2.0)
    term = (
        F.when((F.col("ca") > 0) & (mid > 0), p * F.log(p / mid)).otherwise(F.lit(0.0))
        + F.when((F.col("cb") > 0) & (mid > 0), q * F.log(q / mid)).otherwise(F.lit(0.0))
    ) / F.lit(2.0)
    m = F.lit(float(10**term_scale))
    agg = t.agg(
        F.max("na").alias("n_a"),
        F.max("nb").alias("n_b"),
        F.count(F.lit(1)).alias("n_levels"),
        (F.sum(F.floor(term * m + F.lit(0.5))) / m).alias("jsd"),
    )
    import math as _math

    return agg.select(
        "n_a",
        "n_b",
        "n_levels",
        "jsd",
        (
            F.floor(F.col("jsd") / F.lit(_math.log(2.0)) * F.lit(1e6) + F.lit(0.5))
            / F.lit(1e6)
        ).alias("jsd_norm"),
    )


def standardized_residuals(
    df: DataFrame,
    a: str | Column,
    b: str | Column,
    out_scale: int = 6,
) -> DataFrame:
    """Per-cell standardized residuals ``(O - E) / sqrt(E)`` of the
    contingency table — the cell-level diagnosis behind a significant
    :func:`association` chi-square: WHICH (a, b) combination is over-
    or under-represented, and by how many standard deviations.

    Same bounded-table shape as every operator in this module; only
    OBSERVED cells are emitted (an empty cell's residual is -sqrt(E) —
    derivable from the margins if needed, and emitting the full |A|x|B|
    grid is exactly the materialization :func:`association` avoids).
    E and the residual use only +,-,*,/ and sqrt over exact counts —
    correctly-rounded IEEE, quantized once at the end.
    """
    t = contingency(df, a, b)
    n = F.col("n").cast("double")
    e = (
        F.col("n_a").cast("double")
        * F.col("n_b").cast("double")
        / F.col("n_total").cast("double")
    )
    resid = (n - e) / F.sqrt(e)
    m = F.lit(float(10**out_scale))

    def _q(x):
        return F.floor(x * m + F.lit(0.5)) / m

    return t.select(
        "a",
        "b",
        "n",
        _q(e).alias("expected"),
        _q(resid).alias("std_residual"),
    )


def mcnemar_test(
    df: DataFrame,
    a_col: str,
    b_col: str,
    out_scale: int = 6,
) -> DataFrame:
    """McNemar's test over paired boolean outcomes (one row per paired
    unit; ``a_col``/``b_col`` are the before/after — or rater-1/
    rater-2 — verdicts): did the 'yes' rate CHANGE within pairs?
    The within-pair question :func:`cohens_kappa` (agreement) and an
    unpaired two-proportion z-test (marginals) both miss — McNemar
    reads ONLY the discordant cells:

        chi2    = (n10 − n01)² / (n10 + n01)
        chi2_cc = (max(|n10 − n01| − 1, 0))² / (n10 + n01)

    (Edwards continuity correction, clamped at 0 so a perfectly
    balanced table cannot report spurious signal). Compare to
    chi-square with 1 df (3.841 at alpha = 0.05). Returns one row
    ``(n_pairs, n10, n01, chi2, chi2_cc)``; the statistics are NULL
    when no discordant pairs exist (nothing to test).

    Scale shape: ONE map-side-combining aggregate over the pair
    frame — nothing else moves. Determinism: both statistics are
    ratios of exact int64 counts, floor-quantized on output.
    """
    base = df.select(
        F.col(a_col).cast("boolean").alias("a"),
        F.col(b_col).cast("boolean").alias("b"),
    ).filter(F.col("a").isNotNull() & F.col("b").isNotNull())
    agg = base.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(
            F.when(F.col("a") & ~F.col("b"), F.lit(1)).otherwise(F.lit(0))
        ).alias("n10"),
        F.sum(
            F.when(~F.col("a") & F.col("b"), F.lit(1)).otherwise(F.lit(0))
        ).alias("n01"),
    )
    d = (F.col("n10") - F.col("n01")).cast("double")
    s = (F.col("n10") + F.col("n01")).cast("double")
    dc = F.greatest(F.abs(d) - F.lit(1.0), F.lit(0.0))
    om = F.lit(float(10**out_scale))

    def _q(c):
        return F.floor(c * om + F.lit(0.5)) / om

    return agg.select(
        "n_pairs",
        "n10",
        "n01",
        F.when(s > 0.0, _q(d * d / s)).alias("chi2"),
        F.when(s > 0.0, _q(dc * dc / s)).alias("chi2_cc"),
    )


def weighted_kappa(
    df: DataFrame,
    a: str | Column,
    b: str | Column,
    weight: str = "quadratic",
    out_scale: int = 6,
) -> DataFrame:
    """Weighted Cohen's kappa over two ORDINAL integer ratings — the
    agreement statistic :func:`cohens_kappa` under-reports for graded
    labels: unweighted kappa charges a 1-vs-2 disagreement exactly as
    much as 1-vs-5, while the weighted form prices disagreement by
    DISTANCE (Cohen 1968; quadratic weights make kappa_w numerically
    an ICC, the convention for rubric scores):

        kappa_w = 1 − [n · Σ_ij w_ij O_ij] / [Σ_ij w_ij n_a(i) n_b(j)]

    with w_ij = |i−j| (``weight="linear"``) or (i−j)²
    (``"quadratic"``). Rows with a NULL rating on either side drop —
    distance from nothing is undefined, unlike the unweighted
    operator's NULL-as-level audit stance.

    Determinism: ratings cast to int64; both the observed and the
    expected weighted sums are exact integer folds (decimal(38,0) for
    the margin cross-products) over the bounded |A|×|B| cell table
    and the |A|·|B| margin cross join — the ONLY float op is the
    final division. Returns one row ``(n_total, wkappa)``; when the
    expected weighted disagreement is 0 (both raters constant and
    equal), kappa_w is 1 by convention — perfect agreement.

    Scale shape: ONE aggregate to the bounded contingency table, a
    broadcast margin cross join, two bounded folds.
    """
    if weight not in ("linear", "quadratic"):
        raise ValueError("weight must be 'linear' or 'quadratic'")
    ca = (F.col(a) if isinstance(a, str) else a).cast("long")
    cb = (F.col(b) if isinstance(b, str) else b).cast("long")
    t = contingency(
        df.filter(ca.isNotNull() & cb.isNotNull()), ca, cb
    )

    def w(i, j):
        d = F.abs(i - j)
        return d if weight == "linear" else d * d

    dec = "decimal(38,0)"
    obs = t.agg(
        F.max("n_total").alias("n_total"),
        F.sum(
            (w(F.col("a"), F.col("b")) * F.col("n")).cast(dec)
        ).alias("so"),
    )
    ma = t.groupBy("a").agg(F.max("n_a").alias("na"))
    mb = t.groupBy("b").agg(F.max("n_b").alias("nb"))
    exp = (
        ma.crossJoin(F.broadcast(mb))
        .agg(
            F.sum(
                w(F.col("a"), F.col("b")).cast(dec)
                * F.col("na").cast(dec)
                * F.col("nb").cast(dec)
            ).alias("se")
        )
    )
    j = obs.crossJoin(F.broadcast(exp))
    m = F.lit(float(10**out_scale))
    k = F.lit(1.0) - (
        F.col("n_total").cast("double") * F.col("so").cast("double")
    ) / F.col("se").cast("double")
    return j.select(
        "n_total",
        F.when(
            F.col("se").cast("double") > 0,
            F.floor(k * m + F.lit(0.5)) / m,
        )
        .otherwise(F.lit(1.0))
        .alias("wkappa"),
    )


def theils_u(
    df: DataFrame,
    a: str | Column,
    b: str | Column,
    term_scale: int = 8,
    out_scale: int = 6,
) -> DataFrame:
    """Theil's uncertainty coefficient — the ASYMMETRIC member the
    categorical-association lane lacked: :func:`association`'s
    Cramér's V says only "how associated"; U(a|b) = MI/H(a) says
    "what fraction of a's entropy does knowing b remove", and
    U(a|b) ≠ U(b|a) exposes direction (department predicts job title
    far better than title predicts department). Also returns the
    symmetric form 2·MI/(H(a)+H(b)) — the single-number summary on
    the same [0,1] scale.

    Exactness: per-CELL MI terms and per-LEVEL entropy terms are each
    floor-quantized to ``term_scale`` decimals before the sums (the
    association/char_lm libm-absorption discipline — both engines ln
    identical rationals), so every ratio divides identical quantized
    sums. NULL categories stay as levels (the contingency contract).

    Scale shape: ONE (a, b) count aggregate; everything after is
    bounded |A|·|B| cell-table work (margins are windows over the
    cell table, entropy folds over distinct margins).

    Returns one row ``(n_total, h_a, h_b, mutual_info, u_a_given_b,
    u_b_given_a, u_symmetric)``; the U columns are NULL when the
    corresponding entropy is 0 (a constant column — "explained
    fraction" is undefined, flagged rather than faked as 0 or 1).
    """
    t = contingency(df, a, b)
    m = F.lit(float(10**term_scale))
    n = F.col("n").cast("double")
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    nt = F.col("n_total").cast("double")
    mi_term = (n / nt) * F.log(n * nt / (na * nb))
    mi = t.agg(
        F.max("n_total").alias("n_total"),
        (F.sum(F.floor(mi_term * m + F.lit(0.5))) / m).alias(
            "mutual_info"
        ),
    )

    def entropy(level: str, margin: str, name: str) -> DataFrame:
        lv = t.select(level, margin, "n_total").distinct()
        mc = F.col(margin).cast("double")
        term = -(mc / nt) * F.log(mc / nt)
        return lv.agg(
            (F.sum(F.floor(term * m + F.lit(0.5))) / m).alias(name)
        )

    ha = entropy("a", "n_a", "h_a")
    hb = entropy("b", "n_b", "h_b")
    om = F.lit(float(10**out_scale))

    def _q(x):
        return F.floor(x * om + F.lit(0.5)) / om

    j = mi.crossJoin(F.broadcast(ha)).crossJoin(F.broadcast(hb))
    return j.select(
        "n_total",
        "h_a",
        "h_b",
        "mutual_info",
        F.when(
            F.col("h_a") > 0, _q(F.col("mutual_info") / F.col("h_a"))
        ).alias("u_a_given_b"),
        F.when(
            F.col("h_b") > 0, _q(F.col("mutual_info") / F.col("h_b"))
        ).alias("u_b_given_a"),
        F.when(
            F.col("h_a") + F.col("h_b") > 0,
            _q(
                F.lit(2.0)
                * F.col("mutual_info")
                / (F.col("h_a") + F.col("h_b"))
            ),
        ).alias("u_symmetric"),
    )


def krippendorff_alpha(
    df: DataFrame,
    unit_col: str,
    label_col: str,
    term_scale: int = 9,
    out_scale: int = 6,
) -> DataFrame:
    """Krippendorff's alpha (nominal metric) — the general
    inter-annotator agreement coefficient the labeling-QA lane
    needed: cohens_kappa handles exactly two raters on paired items;
    alpha handles ANY number of ratings per unit (missing ratings
    included by construction — units with one rating drop out), which
    is how real annotation jobs and LLM-judge ensembles arrive. The
    standard acceptance bar alpha >= 0.8 (Krippendorff 2004) makes it
    a gateable annotation-quality number.

    Coincidence-matrix form, reduced to per-unit closed terms: with
    n_uc = count of label c in unit u and m_u = Σ_c n_uc (keep
    m_u >= 2), observed disagreement D_o = Σ_u d_u with
    d_u = (m_u² − Σ_c n_uc²)/(m_u − 1); the coincidence marginals are
    plain label totals n_c over the kept units, so expected
    disagreement D_e = (n² − Σ_c n_c²)/(n − 1) and
    alpha = 1 − (n − 1)·D_o / (n² − Σ_c n_c²).

    Exactness: each unit's d_u is the only rational — floor-quantized
    to ``term_scale`` decimals (identical int division both engines),
    then summed exactly; everything else is integer (Σ n_uc², n_c,
    n in decimal(38,0)). NULL labels are a level (they carry signal
    in an annotation audit); NULL units are dropped.

    Scale shape: one (unit, label) count aggregate, one per-unit fold
    (bounded by units), one label-marginal aggregate — map-side
    combining throughout, no window over row volume.

    Returns one row ``(n_units, n_ratings, n_levels, d_o, d_e,
    alpha)``; alpha NULL when D_e = 0 (every kept rating has the same
    label — agreement is undefined, not 1.0).
    """
    dec = "decimal(38,0)"
    uc = (
        df.filter(F.col(unit_col).isNotNull())
        .groupBy(
            F.col(unit_col).alias("u"), F.col(label_col).alias("c")
        )
        .agg(F.count(F.lit(1)).alias("n_uc"))
    )
    per_u = uc.groupBy("u").agg(
        F.sum("n_uc").alias("m_u"),
        F.sum(F.col("n_uc").cast(dec) * F.col("n_uc").cast(dec)).alias(
            "ss_u"
        ),
    ).filter(F.col("m_u") >= 2)
    m = F.lit(float(10**term_scale))
    d_u = (
        F.col("m_u").cast("double") * F.col("m_u").cast("double")
        - F.col("ss_u").cast("double")
    ) / (F.col("m_u").cast("double") - F.lit(1.0))
    units = per_u.agg(
        F.count(F.lit(1)).alias("n_units"),
        F.coalesce(
            F.sum(F.floor(d_u * m + F.lit(0.5)).cast("long")),
            F.lit(0),
        ).alias("__do_q__"),
    )
    # label marginals over KEPT units only (coincidence-matrix margins)
    kept = uc.join(per_u.select("u"), "u", "semi")
    marg = kept.groupBy("c").agg(F.sum("n_uc").alias("n_c"))
    totals = marg.agg(
        F.count(F.lit(1)).alias("n_levels"),
        F.coalesce(F.sum("n_c"), F.lit(0)).alias("n_ratings"),
        F.coalesce(
            F.sum(F.col("n_c").cast(dec) * F.col("n_c").cast(dec)),
            F.lit(0).cast(dec),
        ).alias("__ssc__"),
    )
    om = F.lit(float(10**out_scale))
    j = units.crossJoin(F.broadcast(totals))
    nr = F.col("n_ratings").cast("double")
    denom = nr * nr - F.col("__ssc__").cast("double")
    d_o = F.col("__do_q__").cast("double") / m
    d_e = F.when(
        F.col("n_ratings") > 1, denom / (nr - F.lit(1.0))
    )
    alpha = F.when(
        denom > 0,
        F.floor(
            (F.lit(1.0) - (nr - F.lit(1.0)) * d_o / denom) * om
            + F.lit(0.5)
        )
        / om,
    )
    return j.select(
        "n_units",
        "n_ratings",
        "n_levels",
        (F.floor(d_o * om + F.lit(0.5)) / om).alias("d_o"),
        (F.floor(F.coalesce(d_e, F.lit(0.0)) * om + F.lit(0.5)) / om).alias("d_e"),
        alpha.alias("alpha"),
    )
