"""Column statistics: col* reductions, describe, cor/cov/spearman
(reference src/operators.jl:52-72,231-245; src/dataframe.jl:867-906,
1514-1521).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_NUMERIC = {"int", "bigint", "double", "float", "smallint", "tinyint", "decimal"}


def numeric_cols(df: DataFrame) -> list[str]:
    return [c for c, t in df.dtypes if t.split("(")[0] in _NUMERIC]


def _col_prod(c: str) -> Column:
    # zero-guarded exp-sum-log, same shape as ops.grouping._prod: log(0)
    # is NULL and SUM skips NULLs, so an unguarded column with a zero
    # would return the product of the non-zero elements
    col = F.col(c)
    a = F.abs(col)
    magnitude = F.exp(F.sum(F.log(F.when(a == 0, F.lit(1.0)).otherwise(a))))
    sign = F.when(
        F.sum(F.when(col < 0, 1).otherwise(0)) % 2 == 1, -1.0
    ).otherwise(1.0)
    return F.when(F.min(a) == 0, F.lit(0.0)).otherwise(magnitude * sign)


_COL_REDUCERS = {
    "mins": F.min,
    "maxs": F.max,
    "sums": F.sum,
    "means": F.avg,
    "medians": F.median,
    "stds": F.stddev_samp,
    "vars": F.var_samp,
    "prods": _col_prod,
    "norms": lambda c: F.sqrt(F.sum(F.col(c) * F.col(c))),
}


def col_reduce(df: DataFrame, which: str, cols: Sequence[str] | None = None) -> DataFrame:
    """colmins/colmaxs/colsums/colmeans/colmedians/colstds/colvars/
    colprods/colnorms (reference generator src/operators.jl:231-245):
    one-row frame of per-column reductions, single agg pass."""
    if which not in _COL_REDUCERS:
        raise KeyError(f"unknown col-reduction {which!r}")
    fn = _COL_REDUCERS[which]
    cols = cols if cols is not None else numeric_cols(df)
    return df.agg(*[fn(c).alias(c) for c in cols])


def colmins(df, cols=None):
    return col_reduce(df, "mins", cols)


def colmaxs(df, cols=None):
    return col_reduce(df, "maxs", cols)


def colsums(df, cols=None):
    return col_reduce(df, "sums", cols)


def colmeans(df, cols=None):
    return col_reduce(df, "means", cols)


def colmedians(df, cols=None):
    return col_reduce(df, "medians", cols)


def colstds(df, cols=None):
    return col_reduce(df, "stds", cols)


def colvars(df, cols=None):
    return col_reduce(df, "vars", cols)


def colprods(df, cols=None):
    return col_reduce(df, "prods", cols)


def colnorms(df, cols=None):
    return col_reduce(df, "norms", cols)


def _row_exprs(which: str, cols: Sequence[str]) -> Column:
    """One row-wise reduction as a pure Column expression over the
    non-null values of ``cols`` (NA-skip semantics, matching the col*
    family). Arrays are ncol-sized — per-row higher-order functions here
    are cheap and stay in codegen; no UDF, no shuffle."""
    arr = F.filter(
        F.array(*[F.col(c).cast("double") for c in cols]),
        lambda x: x.isNotNull(),
    )
    n = F.size(arr)
    s = F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)
    ss = F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x * x)
    nonempty = lambda e: F.when(n > 0, e)  # noqa: E731 - reductions of no values are NA
    if which == "mins":
        return F.array_min(arr)
    if which == "maxs":
        return F.array_max(arr)
    if which == "sums":
        return nonempty(s)
    if which == "means":
        return nonempty(s / n)
    if which == "prods":
        # direct per-row product: ncol factors, exact — the col* family
        # needs the exp-sum-log trick only because SUM is its combiner
        return nonempty(F.aggregate(arr, F.lit(1.0), lambda acc, x: acc * x))
    if which == "medians":
        srt = F.array_sort(arr)
        lo = F.element_at(srt, ((n + 1) / 2).cast("int"))
        hi = F.element_at(srt, (n / 2).cast("int") + 1)
        return nonempty((lo + hi) / 2)
    if which == "vars":
        return F.when(n > 1, (ss - s * s / n) / (n - 1))
    if which == "stds":
        return F.when(n > 1, F.sqrt((ss - s * s / n) / (n - 1)))
    if which == "norms":
        return nonempty(F.sqrt(ss))
    raise KeyError(f"unknown row-reduction {which!r}")


def row_reduce(
    df: DataFrame, which: str, cols: Sequence[str] | None = None
) -> DataFrame:
    """rowmins/rowmaxs/rowsums/rowmeans/rowmedians/rowstds/rowvars/
    rowprods/rownorms (reference export list src/DataFrames.jl:135-145;
    the generator src/operators.jl:231-245 computes the names at
    src/operators.jl:66-68 but never emits bodies — implemented here for
    real). Appends a ``row{which[:-1]}`` column; map-only, no shuffle."""
    cols = cols if cols is not None else numeric_cols(df)
    return df.withColumn(f"row{which[:-1]}", _row_exprs(which, cols))


def rowmins(df, cols=None):
    return row_reduce(df, "mins", cols)


def rowmaxs(df, cols=None):
    return row_reduce(df, "maxs", cols)


def rowsums(df, cols=None):
    return row_reduce(df, "sums", cols)


def rowmeans(df, cols=None):
    return row_reduce(df, "means", cols)


def rowmedians(df, cols=None):
    return row_reduce(df, "medians", cols)


def rowstds(df, cols=None):
    return row_reduce(df, "stds", cols)


def rowvars(df, cols=None):
    return row_reduce(df, "vars", cols)


def rowprods(df, cols=None):
    return row_reduce(df, "prods", cols)


def rownorms(df, cols=None):
    return row_reduce(df, "norms", cols)


def describe(df: DataFrame, exact_quantiles: bool = False) -> DataFrame:
    """describe(df) (reference src/dataframe.jl:867-906): per numeric
    column min/q1/median/mean/q3/max + NA count and share.

    Default uses percentile_approx (Greenwald-Khanna — the scalable
    choice; the reference's own distributed describe is a randomized
    approximation too, src/dataframe_blocks.jl:263-356). ``exact_quantiles``
    switches to exact percentiles for small-data parity (reference
    single-node path computes exact, src/dataframe.jl:875)."""
    cols = numeric_cols(df)
    q = (
        (lambda c, p: F.expr(f"percentile(`{c}`, {p})"))
        if exact_quantiles
        else (lambda c, p: F.percentile_approx(c, p))
    )
    n = F.count(F.lit(1))
    aggs: list[Column] = [n.alias("__n__")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"{c}__min"),
            q(c, 0.25).alias(f"{c}__q1"),
            q(c, 0.5).alias(f"{c}__median"),
            # decimal-exact mean: order-independent (plain AVG accumulates
            # doubles in partition order and can flip a rounded digit)
            (F.sum(F.col(c).cast("decimal(18,6)")).cast("double") / F.count(c)).alias(
                f"{c}__mean"
            ),
            q(c, 0.75).alias(f"{c}__q3"),
            F.max(c).alias(f"{c}__max"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nna"),
        ]
    row = df.agg(*aggs)
    # one row per column: unpivot the single stats row with a stack expr
    stats = ["min", "q1", "median", "mean", "q3", "max", "nna"]
    pieces = []
    for c in cols:
        fields = ", ".join(
            f"CAST(`{c}__{s}` AS DOUBLE) AS `{s}`" for s in stats
        )
        pieces.append(f"named_struct('col', '{c}', 's', struct({fields}))")
    arr = f"array({', '.join(pieces)})"
    exploded = row.selectExpr("__n__", f"inline({arr})")
    return exploded.select(
        F.col("col").alias("variable"),
        F.col("s.min").alias("min"),
        F.col("s.q1").alias("q1"),
        F.col("s.median").alias("median"),
        F.col("s.mean").alias("mean"),
        F.col("s.q3").alias("q3"),
        F.col("s.max").alias("max"),
        F.col("s.nna").cast("bigint").alias("n_na"),
        F.try_divide(F.col("s.nna"), F.col("__n__")).alias("na_share"),
    )


def cor(df: DataFrame, c1: str, c2: str) -> float:
    """cor (reference src/dataframe.jl:1514-1521) → stat.corr."""
    return df.stat.corr(c1, c2)


def cov(df: DataFrame, c1: str, c2: str) -> float:
    return df.stat.cov(c1, c2)


def cor_matrix(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """cor(df) over numeric columns (reference src/dataframe.jl:1514-1521):
    pairwise Pearson in ONE aggregation pass using corr() aggregates."""
    cols = cols if cols is not None else numeric_cols(df)
    aggs = []
    for i, a in enumerate(cols):
        for b in cols[i:]:
            aggs.append(F.corr(a, b).alias(f"{a}__{b}"))
    row = df.agg(*aggs).collect()[0]
    import itertools

    data = []
    vals = {}
    for i, a in enumerate(cols):
        for b in cols[i:]:
            vals[(a, b)] = row[f"{a}__{b}"]
    for a, b in itertools.product(cols, cols):
        v = vals.get((a, b), vals.get((b, a)))
        data.append((a, b, v))
    spark = df.sparkSession
    return spark.createDataFrame(data, "col_a string, col_b string, corr double")


def spearman_ranked(df: DataFrame, c1: str, c2: str) -> DataFrame:
    """Average-rank both columns for Spearman correlation, fully
    distributed: each column is ranked via the range-partitioned
    :func:`~dataframes_jl_spark.ops.sorting.global_row_number` (never a
    ``row_number() OVER (ORDER BY …)`` SinglePartition window — that was
    the round-3 scale defect), then ties are averaged with a
    hash-partitioned window on the value itself. Returns ``(c1, c2, r1,
    r2)`` with ``r1``/``r2`` the average ranks (exact half-integers)."""
    from ..ops.sorting import global_row_number

    ranked = global_row_number(df.select(c1, c2), cols=[c1], col_name="__rn1__")
    ranked = global_row_number(ranked, cols=[c2], col_name="__rn2__")
    return (
        ranked.withColumn("r1", F.avg("__rn1__").over(Window.partitionBy(c1)))
        .withColumn("r2", F.avg("__rn2__").over(Window.partitionBy(c2)))
        .drop("__rn1__", "__rn2__")
    )


def cor_spearman(df: DataFrame, c1: str, c2: str) -> float:
    """cor_spearman (reference src/operators.jl:64): average-rank both
    columns (distributed — see :func:`spearman_ranked`), then Pearson on
    the ranks."""
    return spearman_ranked(df, c1, c2).stat.corr("r1", "r2")


def describe_strings(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """describe for non-numeric columns (reference src/dataframe.jl:895-906:
    length / type / NA count / unique count) — one aggregation pass with
    exact distinct counts per column."""
    if cols is None:
        cols = [c for c, t in df.dtypes if t == "string"]
    n = F.count(F.lit(1))
    aggs: list[Column] = [n.alias("__n__")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nna"),
            F.countDistinct(c).alias(f"{c}__uniq"),
        ]
    row = df.agg(*aggs)
    pieces = [
        f"named_struct('col', '{c}', 'nna', CAST(`{c}__nna` AS BIGINT), "
        f"'uniq', CAST(`{c}__uniq` AS BIGINT))"
        for c in cols
    ]
    exploded = row.selectExpr("__n__", f"inline(array({', '.join(pieces)}))")
    return exploded.select(
        F.col("col").alias("variable"),
        F.col("__n__").cast("bigint").alias("length"),
        F.col("nna").alias("n_na"),
        F.col("uniq").alias("n_unique"),
    )


def colffts(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """colffts (reference export src/DataFrames.jl:60, vestigial in the
    snapshot): per-column FFT magnitudes. Arrow-batched numpy via
    applyInPandas over a single group — FFT needs the whole column, so
    this is inherently a gather; guard with a row-count ceiling at call
    sites. Returns (variable, bin, magnitude)."""
    import numpy as np
    import pandas as pd

    cols = cols if cols is not None else numeric_cols(df)

    def fft_all(pdf: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for c in cols:
            v = pdf[c].to_numpy(dtype=float)
            mag = np.abs(np.fft.rfft(v))
            outs.append(
                pd.DataFrame(
                    {"variable": c, "bin": range(len(mag)), "magnitude": mag}
                )
            )
        return pd.concat(outs, ignore_index=True)

    return (
        df.select(*cols)
        .withColumn("__g__", F.lit(1))
        .groupBy("__g__")
        .applyInPandas(
            lambda _, pdf: fft_all(pdf),
            schema="variable string, bin bigint, magnitude double",
        )
    )


def grouped_ols(
    df: DataFrame,
    by: str | Sequence[str],
    x: str,
    y: str,
    scale: int = 4,
) -> DataFrame:
    """Per-group simple linear regression y = slope*x + intercept, from
    engine-exact quantized moment sums.

    ``covar_pop``/``var_pop`` accumulate doubles in partition order, so
    their low bits — and any gate built on them — drift run to run.
    Instead the five moments (n, Σx, Σy, Σxy, Σx²) are int64-quantized
    sums (the dsum discipline), and slope/intercept/R² are closed-form
    ratios of exact integers — bit-identical across engines and
    partitionings.  One map-side partial aggregate; no window, no
    second pass.

    Magnitude contract: |x·y|·10^scale and group totals must fit int64
    (raise ``scale`` awareness for wide-range columns, same as dsum).

    Rows where x or y is NULL are excluded entirely (the regr_slope /
    covar convention): counting them in ``n`` while the moment sums
    skip them would silently corrupt every coefficient of an affected
    group. A group with no complete pair disappears from the output.
    """
    by = [by] if isinstance(by, str) else list(by)
    m = F.lit(float(10**scale))

    def q(c):
        return F.sum(F.floor(c * m + F.lit(0.5)).cast("long"))

    xc, yc = F.col(x), F.col(y)
    df = df.filter(xc.isNotNull() & yc.isNotNull())
    agg = df.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        q(xc).alias("sx"),
        q(yc).alias("sy"),
        q(xc * yc).alias("sxy"),
        q(xc * xc).alias("sxx"),
        q(yc * yc).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx") / m
    sy = F.col("sy") / m
    sxy = F.col("sxy") / m
    sxx = F.col("sxx") / m
    syy = F.col("syy") / m
    denom = n * sxx - sx * sx
    slope = F.when(denom != 0, (n * sxy - sx * sy) / denom)
    intercept = (sy - slope * sx) / n
    ss_tot = n * syy - sy * sy
    # Guard BOTH factors of the denominator: a zero-x-variance group
    # (constant x, or any single-row group) has denom == 0, and under an
    # ANSI session Spark's Divide raises DIVIDE_BY_ZERO rather than
    # yielding NULL — one such group would fail the whole job.
    r2 = F.when(
        (denom != 0) & (ss_tot != 0),
        F.pow(n * sxy - sx * sy, 2) / (denom * ss_tot),
    )
    return agg.select(
        *by,
        "n",
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def psi(
    expected: DataFrame,
    actual: DataFrame,
    col: str,
    breaks: Sequence[float],
    scale: int = 6,
) -> DataFrame:
    """Population Stability Index between two frames' distributions of
    ``col`` over fixed bin edges — the standard drift monitor between
    a training snapshot and live data (rule of thumb: <0.1 stable,
    0.1-0.25 drifting, >0.25 shifted).

    Bins are ``(-inf, b0], (b0, b1], ..., (b_{k-1}, +inf)`` — fixed
    edges supplied by the caller so both sides (and any oracle) bin
    identically; NULLs are excluded.  Shares are ratios of exact
    counts, Laplace-smoothed by half a count per bin so an empty bin
    contributes a finite term instead of ±inf.  Output: one row per
    bin (bin, n_expected, n_actual, psi_term) — sum psi_term for the
    index, keep the rows for the per-bin attribution every drift
    alert needs.
    """
    edges = list(breaks)

    def binned(df: DataFrame, name: str) -> DataFrame:
        c = F.col(col)
        b = F.lit(0)
        for e in edges:
            b = b + F.when(c > F.lit(float(e)), 1).otherwise(0)
        return (
            df.filter(c.isNotNull())
            .select(b.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(name))
        )

    e = binned(expected, "n_expected")
    a = binned(actual, "n_actual")
    all_bins = expected.sparkSession.range(0, len(edges) + 1).select(
        F.col("id").cast("int").alias("bin")
    )
    joined = (
        all_bins.join(e, on="bin", how="left")
        .join(a, on="bin", how="left")
        .select(
            "bin",
            F.coalesce("n_expected", F.lit(0)).alias("n_expected"),
            F.coalesce("n_actual", F.lit(0)).alias("n_actual"),
        )
    )
    te = joined.agg(
        F.sum("n_expected").alias("__te__"), F.sum("n_actual").alias("__ta__")
    )
    k = len(edges) + 1
    out = joined.crossJoin(F.broadcast(te))
    pe = (F.col("n_expected") + 0.5) / (F.col("__te__") + 0.5 * k)
    pa = (F.col("n_actual") + 0.5) / (F.col("__ta__") + 0.5 * k)
    term = (pa - pe) * F.log(pa / pe)
    m = float(10**scale)
    return out.select(
        "bin",
        "n_expected",
        "n_actual",
        (F.floor(term * F.lit(m) + F.lit(0.5)) / F.lit(m)).alias("psi_term"),
    )


def profile(df: DataFrame) -> DataFrame:
    """One-call dataset profile: every column's type, null count/share,
    distinct count, and (for numerics) min/max/mean — the "what is in
    this table" first look every pipeline starts with.

    One aggregation pass over the whole frame (map-side partials, a
    1-row result exploded to one row per column); exact counts, the
    decimal-exact mean discipline from :func:`describe`.  Output:
    (variable, dtype, n, n_na, na_frac, n_unique, min, max, mean) —
    min/max/mean are NULL for non-numeric columns.
    """
    num = set(numeric_cols(df))
    dtypes = dict(df.dtypes)
    n = F.count(F.lit(1))
    aggs: list[Column] = [n.alias("__n__")]
    for c in df.columns:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nna"),
            F.countDistinct(c).alias(f"{c}__uniq"),
        ]
        if c in num:
            aggs += [
                F.min(c).cast("double").alias(f"{c}__min"),
                F.max(c).cast("double").alias(f"{c}__max"),
                (
                    F.sum(F.col(c).cast("decimal(18,6)")).cast("double")
                    / F.count(c)
                ).alias(f"{c}__mean"),
            ]
    row = df.agg(*aggs)
    pieces = []
    for c in df.columns:
        if c in num:
            stats = (
                f"'min', `{c}__min`, 'max', `{c}__max`, 'mean', `{c}__mean`"
            )
        else:
            stats = (
                "'min', CAST(NULL AS DOUBLE), 'max', CAST(NULL AS DOUBLE), "
                "'mean', CAST(NULL AS DOUBLE)"
            )
        pieces.append(
            f"named_struct('variable', '{c}', 'dtype', '{dtypes[c]}', "
            f"'n_na', CAST(`{c}__nna` AS BIGINT), "
            f"'n_unique', CAST(`{c}__uniq` AS BIGINT), {stats})"
        )
    exploded = row.selectExpr("__n__", f"inline(array({', '.join(pieces)}))")
    return exploded.select(
        "variable",
        "dtype",
        F.col("__n__").cast("bigint").alias("n"),
        "n_na",
        F.try_divide(F.col("n_na"), F.col("__n__")).alias("na_frac"),
        "n_unique",
        "min",
        "max",
        "mean",
    )


def mad_outliers(
    df: DataFrame,
    value: str,
    by: str | Sequence[str],
    z: float = 3.5,
    accuracy: int | None = None,
) -> DataFrame:
    """Per-group robust outlier flags via the modified z-score
    0.6745 * |x - median| / MAD  (Iglewicz & Hoaglin 1993): rows whose
    score exceeds ``z`` are flagged. Median/MAD resist the very
    outliers they detect, unlike mean/stddev gates which a single
    extreme value drags toward itself.

    Appends columns ``med``, ``mad``, ``robust_z``, ``is_outlier`` to
    the input rows. NULL values of ``value`` get a NULL ``robust_z``
    and a ``False`` flag (a missing measurement is not evidence of an
    outlier). NULL group KEYS form their own group — the stats joins
    are null-safe, so no input row is ever dropped.

    Two grouped aggregates (median, then median-of-deviations), each a
    single shuffle on ``by``; the tiny per-group stats tables join back
    broadcast-hinted. With ``accuracy=None`` the medians are EXACT
    (Spark's ``percentile``) — that aggregate buffers each group's
    values, so the contract is the same bounded-group one as the repo's
    other exact-quantile paths: fine for per-segment audits (thousands
    of rows per group), wrong for a 100 TB single group. For that,
    pass ``accuracy`` (e.g. 10_000) to switch both medians to
    ``percentile_approx``'s fixed-memory GK sketch — same plan shape,
    bounded state, ±1/accuracy rank error.

    A zero-MAD group (>=50% of the group at one value) yields NULL
    robust_z / false flags rather than an ANSI divide-by-zero raise.
    """
    by = [by] if isinstance(by, str) else list(by)
    vc = F.col(value)
    if accuracy is None:
        med_agg = lambda c: F.expr(f"percentile({c}, 0.5D)")
    else:
        med_agg = lambda c: F.expr(f"percentile_approx({c}, 0.5D, {int(accuracy)})")

    def _nullsafe_join(left: DataFrame, stats: DataFrame, keep: str) -> DataFrame:
        # groupBy puts NULL keys in their own group; a plain equi-join
        # would then drop exactly those input rows. eqNullSafe keeps
        # the "appends columns to the input rows" contract for every
        # row. Prefixed aliases dodge the ambiguous-column trap.
        aliased = stats.select(
            *[F.col(c).alias(f"__s_{c}") for c in by], keep
        )
        cond = None
        for c in by:
            term = left[c].eqNullSafe(F.col(f"__s_{c}"))
            cond = term if cond is None else (cond & term)
        joined = left.join(F.broadcast(aliased), cond, "left")
        return joined.drop(*[f"__s_{c}" for c in by])

    med = df.groupBy(*by).agg(med_agg(value).alias("med"))
    dev = _nullsafe_join(df, med, "med").withColumn(
        "__ad__", F.abs(vc - F.col("med"))
    )
    mad = dev.groupBy(*by).agg(med_agg("__ad__").alias("mad"))
    scored = _nullsafe_join(dev, mad, "mad").withColumn(
        "robust_z",
        F.lit(0.6745) * F.try_divide(F.col("__ad__"), F.col("mad")),
    )
    return scored.withColumn(
        "is_outlier", F.coalesce(F.col("robust_z") > F.lit(float(z)), F.lit(False))
    ).drop("__ad__")


def ks_statistic(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    scale: int = 8,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the distributions
    of ``col`` in two frames — the bin-free drift test that complements
    :func:`psi` (PSI needs caller-chosen edges; KS is edge-free:
    D = sup_x |ECDF_a(x) - ECDF_b(x)|).

    Returns one row ``(n_a, n_b, ks_stat, ks_at)``: the statistic and
    the (smallest) value where the ECDF gap attains it.

    Scale shape: each side collapses map-side to per-VALUE counts (the
    shuffle carries |distinct values| rows, not |rows|), one full-outer
    merge aligns the two count tables, and the two ECDFs come from ONE
    distributed prefix scan (ops.window.with_running's range-partition +
    carry machinery — never a SinglePartition window). The final sup is
    a map-side-combining max.

    Determinism: the gap is compared as the EXACT integer
    |cum_a * n_b - cum_b * n_a| (ECDF differences are rationals with
    denominator n_a*n_b; cross-multiplying keeps the comparison in
    int64, immune to float rounding in any engine). The returned
    ``ks_stat`` divides once at the end, floor-quantized to ``scale``
    decimals. Contract: n_a * n_b must fit int64 (each side < ~3e9
    rows — beyond that, pre-aggregate or sample; the in-plan assert
    raises loudly instead of wrapping). NULLs are excluded; NaN is one
    ordinary greatest-sorting value in both engines.
    """
    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(F.col(col).cast("double").alias("v"))
            .filter(F.col("v").isNotNull())
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias(name))
        )

    merged = (
        counts(df_a, "ca")
        .join(counts(df_b, "cb"), "v", "full_outer")
        .select(
            "v",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    from ..ops.window import with_running

    run = with_running(
        merged,
        {"cum_a": ("sum", "ca"), "cum_b": ("sum", "cb")},
        order_by="v",
    )
    totals = merged.agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    j = run.crossJoin(F.broadcast(totals))
    # int64 safety: |cum*n| <= n_a*n_b; verify the product in double
    # space (cannot overflow) and fold the guard into the output
    ok = F.assert_true(
        F.col("n_a").cast("double") * F.col("n_b").cast("double")
        < F.lit(9.0e18),
        F.lit("ks_statistic: n_a*n_b exceeds int64 — pre-aggregate"),
    )
    gap = F.abs(
        F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
    )
    # Tie-break at the max gap: SMALLEST value wins, with NaN ranked
    # strictly below every finite/infinite value. A bare max(-v) would
    # let NaN win any tie (NaN sorts greatest in Spark, and -NaN is
    # NaN), diverging from the oracle's ORDER BY gap DESC, v ASC; the
    # `fin` field demotes NaN before -v is ever compared, while a
    # NaN-only max gap still reports ks_at = NaN via the `at` payload.
    is_nan = F.isnan(F.col("v"))
    best = j.agg(
        F.max(
            F.struct(
                gap.alias("g"),
                F.when(is_nan, F.lit(0)).otherwise(F.lit(1)).alias("fin"),
                F.when(is_nan, F.lit(0.0)).otherwise(-F.col("v")).alias("nv"),
                F.col("v").alias("at"),
                F.coalesce(ok.cast("long"), F.lit(0)).alias("ok"),
            )
        ).alias("s"),
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
    )
    m = F.lit(float(10**scale))
    stat = (
        F.col("s.g")
        / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
    )
    return best.select(
        "n_a",
        "n_b",
        (F.floor(stat * m + F.lit(0.5)) / m).alias("ks_stat"),
        F.col("s.at").alias("ks_at"),
    )


def cvm_statistic(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    scale: int = 8,
) -> DataFrame:
    """Two-sample Cramér-von Mises drift between the distributions of
    ``col`` in two frames — KS's integrated-square sibling: where
    :func:`ks_statistic` reports only the single worst ECDF gap, CvM
    sums the squared gap over the WHOLE pooled sample,

        T = n·m/(n+m)² · Σ_pooled (ECDF_a(x) − ECDF_b(x))²,

    so a distribution that drifts a little everywhere (which KS's
    sup-norm under-weights) scores as high as one that drifts a lot
    in one place. On untied data this equals the classic Anderson
    rank form U/(nm·N) − (4nm−1)/(6N); with ties it is the natural
    right-continuous-ECDF extension (each pooled point contributes
    with its multiplicity). Returns one row
    ``(n_a, n_b, cvm_t, cvm_mean0, cvm_z)`` — ``cvm_mean0`` is the
    exact null mean (1 + 1/N)/6 and ``cvm_z`` the statistic
    standardized by Anderson's exact null moments, so "is this drift
    real" reads off one column without a lookup table.

    Scale shape: identical to ks_statistic — each side collapses
    map-side to per-VALUE counts, one full-outer merge, ONE
    distributed prefix scan for both ECDFs (range partition +
    broadcast carries, never SinglePartition), then a single
    map-side-combining sum over the |distinct values| table.

    Determinism: the per-value term is the EXACT integer
    c_v · (cum_a·n_b − cum_b·n_a)² accumulated in decimal(38,0)
    (the inner difference fits int64 since |d| ≤ n_a·n_b, guarded by
    the same in-plan assert as KS; the square is taken in decimal).
    T divides the exact sum once by n_a·n_b·(n+m)² — a ratio of
    exact integers, so both engines evaluate identical doubles —
    then floor-quantizes to ``scale`` decimals. Headroom: the
    decimal(38,0) sum holds Σ c·d² ≤ (n+m)·(n_a·n_b)² up to ~1e9
    rows per side, far past the int64 guard.
    """
    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(F.col(col).cast("double").alias("v"))
            .filter(F.col("v").isNotNull())
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias(name))
        )

    merged = (
        counts(df_a, "ca")
        .join(counts(df_b, "cb"), "v", "full_outer")
        .select(
            "v",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    from ..ops.window import with_running

    run = with_running(
        merged,
        {"cum_a": ("sum", "ca"), "cum_b": ("sum", "cb")},
        order_by="v",
    )
    totals = merged.agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    j = run.crossJoin(F.broadcast(totals))
    ok = F.assert_true(
        F.col("n_a").cast("double") * F.col("n_b").cast("double")
        < F.lit(9.0e18),
        F.lit("cvm_statistic: n_a*n_b exceeds int64 — pre-aggregate"),
    )
    dec = "decimal(38,0)"
    d = (
        F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
    ).cast(dec)
    term = (F.col("ca") + F.col("cb")).cast(dec) * d * d
    agg = j.agg(
        F.sum(term).alias("s"),
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.max(F.coalesce(ok.cast("long"), F.lit(0))).alias("ok"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    nt = na + nb
    t = F.col("s").cast("double") / (na * nb * nt * nt)
    # Anderson's exact null moments (closed-form in n_a, n_b — both
    # engines fold the same integer ratios, so z needs no tolerance)
    et = (F.lit(1.0) + F.lit(1.0) / nt) / F.lit(6.0)
    vt = (
        (nt + F.lit(1.0))
        * (
            F.lit(4.0) * na * nb * nt
            - F.lit(3.0) * (na * na + nb * nb)
            - F.lit(2.0) * na * nb
        )
        / (F.lit(45.0) * nt * nt * F.lit(4.0) * na * nb)
    )
    m = F.lit(float(10**scale))

    def _q(c):
        return F.floor(c * m + F.lit(0.5)) / m

    return agg.select(
        "n_a",
        "n_b",
        _q(t).alias("cvm_t"),
        _q(et).alias("cvm_mean0"),
        # Referencing `ok` (0/NULL) in the gate keeps ColumnPruning
        # from eliminating max(ok) — the in-plan overflow assert must
        # survive (same fix as wasserstein_1d; ks embeds it in the
        # max_by struct).
        F.when(
            (vt > 0.0) & (F.coalesce(F.col("ok"), F.lit(0)) >= 0),
            _q((t - et) / F.sqrt(vt)),
        ).alias("cvm_z"),
    )


def wasserstein_1d(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    scale: int = 4,
    out_scale: int = 6,
) -> DataFrame:
    """Two-sample 1-D Wasserstein-1 (earth-mover) distance between
    the distributions of ``col`` in two frames — the drift family's
    TRANSPORT member: :func:`ks_statistic` reports the worst ECDF gap
    (sup-norm), :func:`cvm_statistic` the integrated SQUARED gap;
    W1 integrates the absolute gap itself,

        W1 = ∫ |F_a(x) − F_b(x)| dx,

    which is the minimum mass-times-distance to morph one empirical
    distribution into the other (Monge-Kantorovich on the line has
    this closed form; Villani 2003 §2). Unlike KS/CvM it carries the
    UNITS of ``col`` — "the score distribution moved by 0.03 points"
    — which is what a drift runbook wants to threshold on.

    Determinism: values quantize to ``10^scale`` int64 units once, so
    the ECDF gap is piecewise-constant on integer support and the
    integral is the EXACT integer sum Σ_v |cum_a·n_b − cum_b·n_a| ·
    (v_next − v) in decimal(38,0) (|d| ≤ n_a·n_b guarded by the same
    in-plan assert as KS/CvM); one division by n_a·n_b·10^scale at
    the end, so both engines compare identical doubles.

    Scale shape: per-VALUE counts map-side on each side, one
    full-outer merge, ONE distributed prefix scan for both cums
    (range partition + carries, never SinglePartition), a global
    row-number (same machinery) and ONE co-partitioned self-join on
    rn+1 for the next-value gap — all over the bounded
    |distinct quantized values| table — then a single fold. The last
    value drops out of the inner join, which is exact: beyond it both
    ECDFs are 1 and the gap is 0. Returns one row
    ``(n_a, n_b, w1)``; w1 is NULL when either side is empty.

    Caching contract: this function ``persist(MEMORY_AND_DISK)``-s a
    bounded intermediate that feeds multiple plan branches and does
    NOT unpersist it (the result is lazy; unpersisting before the
    caller's action would void the cache). The handle is attached to
    the result as ``unpersist_handles`` (core.cache.hold); release it
    with ``dataframes_jl_spark.release(result)`` once the result is
    consumed (or session-wide ``spark.catalog.clearCache()``).
    """
    from pyspark import StorageLevel

    m = F.lit(float(10**scale))
    qv = F.floor(F.col(col).cast("double") * m + F.lit(0.5)).cast("long")

    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.filter(F.col(col).isNotNull())
            .select(qv.alias("v"))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias(name))
        )

    # Persist the bounded |distinct quantized values| table: it feeds
    # FOUR plan branches (the prefix scan, the rn+1 shift, the totals
    # aggregate, and the final one-row frame), and Spark re-runs the
    # two row-volume per-value count aggregates per branch otherwise
    # (ReuseExchange only matches identical exchanges — the scan
    # fan-out rule). Caller/clearCache owns unpersisting (the
    # with_running contract).
    merged = (
        counts(df_a, "ca")
        .join(counts(df_b, "cb"), "v", "full_outer")
        .select(
            "v",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    from ..ops.sorting import global_row_number
    from ..ops.window import with_running

    run = with_running(
        merged,
        {"cum_a": ("sum", "ca"), "cum_b": ("sum", "cb")},
        order_by="v",
    )
    rn = global_row_number(run, "v", col_name="__rn__")
    nxt = rn.select(
        (F.col("__rn__") - F.lit(1)).alias("__rn__"),
        F.col("v").alias("v_next"),
    )
    totals = merged.agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    ok = F.assert_true(
        F.col("n_a").cast("double") * F.col("n_b").cast("double")
        < F.lit(9.0e18),
        F.lit("wasserstein_1d: n_a*n_b exceeds int64 — pre-aggregate"),
    )
    dec = "decimal(38,0)"
    d = F.abs(
        F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
    ).cast(dec)
    gap = (F.col("v_next") - F.col("v")).cast(dec)
    agg = (
        rn.join(nxt, "__rn__")
        .crossJoin(F.broadcast(totals))
        .agg(
            F.coalesce(F.sum(d * gap), F.lit(0).cast(dec)).alias("s"),
            F.max(F.coalesce(ok.cast("long"), F.lit(0))).alias("ok"),
        )
    )
    om = F.lit(float(10**out_scale))
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    w1 = F.col("s").cast("double") / (na * nb) / m
    final = totals.crossJoin(F.broadcast(agg))
    # The overflow assert rides `ok` (0 after coalesce, NULL over an
    # empty gap join); referencing it inside the returned gate keeps
    # ColumnPruning from eliminating max(ok) — the assert must stay
    # in the executed plan (the cvm/ks surviving-struct discipline).
    from ..core.cache import hold

    return hold(
        final.select(
            "n_a",
            "n_b",
            F.when(
                (F.col("n_a") > 0)
                & (F.col("n_b") > 0)
                & (F.coalesce(F.col("ok"), F.lit(0)) >= 0),
                F.floor(w1 * om + F.lit(0.5)) / om,
            ).alias("w1"),
        ),
        merged,
        rn,
    )


def energy_distance(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    scale: int = 4,
    out_scale: int = 6,
) -> DataFrame:
    """Two-sample 1-D energy distance between the distributions of
    ``col`` — the drift family's CHARACTERISTIC-FUNCTION member,
    completing the quartet: :func:`ks_statistic` (sup gap),
    :func:`cvm_statistic` (integrated squared gap),
    :func:`wasserstein_1d` (integrated absolute gap), and now

        D² = 2·E|X−Y| − E|X−X'| − E|Y−Y'|    (Székely & Rizzo 2004),

    which is zero iff the distributions are equal and on the line
    equals ``2·∫ (F_a − F_b)² dx`` — an L2 gap in the UNITS of
    ``col`` (CvM's L2 is unit-free over pooled ranks), so it reacts
    to tail drift that pooled-rank statistics compress.

    Determinism: values quantize to ``10^scale`` int64 units once;
    with per-value counts on the common support each expectation is
    an exact integer fold over the gap grid —
    ``E|X−Y|·n·m = Σ_k gap_k·[A_k(m−B_k) + B_k(n−A_k)]`` with
    ``A_k/B_k`` the cumulative counts (prefix scan), and the
    within-sample terms the same formula at (a,a)/(b,b) — all three
    accumulate in ONE decimal(38,0) fold over the bounded distinct-
    value table, divided once at the end, so both engines compare
    identical doubles. The in-plan int64 guard on n·m rides the
    returned gate like :func:`wasserstein_1d`.

    Scale shape: identical to wasserstein_1d (it shares the merged
    per-value count table, ONE range-partitioned prefix scan, the
    co-partitioned rn+1 self-join, persist on the bounded merged
    table). Returns one row ``(n_a, n_b, e_xy, e_xx, e_yy, energy)``
    — energy = D², NULL when either side is empty.

    Caching contract: this function ``persist(MEMORY_AND_DISK)``-s a
    bounded intermediate that feeds multiple plan branches and does
    NOT unpersist it (the result is lazy; unpersisting before the
    caller's action would void the cache). The handle is attached to
    the result as ``unpersist_handles`` (core.cache.hold); release it
    with ``dataframes_jl_spark.release(result)`` once the result is
    consumed (or session-wide ``spark.catalog.clearCache()``).
    """
    from pyspark import StorageLevel

    m = F.lit(float(10**scale))
    qv = F.floor(F.col(col).cast("double") * m + F.lit(0.5)).cast("long")

    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.filter(F.col(col).isNotNull())
            .select(qv.alias("v"))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias(name))
        )

    merged = (
        counts(df_a, "ca")
        .join(counts(df_b, "cb"), "v", "full_outer")
        .select(
            "v",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    from ..ops.sorting import global_row_number
    from ..ops.window import with_running

    run = with_running(
        merged,
        {"cum_a": ("sum", "ca"), "cum_b": ("sum", "cb")},
        order_by="v",
    )
    rn = global_row_number(run, "v", col_name="__rn__")
    nxt = rn.select(
        (F.col("__rn__") - F.lit(1)).alias("__rn__"),
        F.col("v").alias("v_next"),
    )
    totals = merged.agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    ok = F.assert_true(
        F.col("n_a").cast("double") * F.col("n_b").cast("double")
        < F.lit(9.0e18),
        F.lit("energy_distance: n_a*n_b exceeds int64 — pre-aggregate"),
    )
    dec = "decimal(38,0)"
    gap = (F.col("v_next") - F.col("v")).cast(dec)
    A = F.col("cum_a").cast(dec)
    B = F.col("cum_b").cast(dec)
    na_d = F.col("n_a").cast(dec)
    nb_d = F.col("n_b").cast(dec)
    # straddling-pair counts per gap: cross, within-a, within-b
    s_xy = gap * (A * (nb_d - B) + B * (na_d - A))
    s_xx = gap * (F.lit(2).cast(dec) * A * (na_d - A))
    s_yy = gap * (F.lit(2).cast(dec) * B * (nb_d - B))
    z = F.lit(0).cast(dec)
    agg = (
        rn.join(nxt, "__rn__")
        .crossJoin(F.broadcast(totals))
        .agg(
            F.coalesce(F.sum(s_xy), z).alias("sxy"),
            F.coalesce(F.sum(s_xx), z).alias("sxx"),
            F.coalesce(F.sum(s_yy), z).alias("syy"),
            F.max(F.coalesce(ok.cast("long"), F.lit(0))).alias("ok"),
        )
    )
    om = F.lit(float(10**out_scale))
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    e_xy = F.col("sxy").cast("double") / (na * nb) / m
    e_xx = F.col("sxx").cast("double") / (na * na) / m
    e_yy = F.col("syy").cast("double") / (nb * nb) / m

    def _q(c):
        return F.floor(c * om + F.lit(0.5)) / om

    final = totals.crossJoin(F.broadcast(agg))
    nonempty = (
        (F.col("n_a") > 0)
        & (F.col("n_b") > 0)
        # the ok reference keeps the in-plan overflow assert from
        # being column-pruned (the wasserstein/cvm discipline)
        & (F.coalesce(F.col("ok"), F.lit(0)) >= 0)
    )
    from ..core.cache import hold

    return hold(
        final.select(
            "n_a",
            "n_b",
            F.when(nonempty, _q(e_xy)).alias("e_xy"),
            F.when(nonempty, _q(e_xx)).alias("e_xx"),
            F.when(nonempty, _q(e_yy)).alias("e_yy"),
            F.when(
                nonempty, _q(F.lit(2.0) * e_xy - e_xx - e_yy)
            ).alias("energy"),
        ),
        merged,
        rn,
    )


def hill_tail_index(
    df: DataFrame,
    col: str,
    k: int = 500,
    term_scale: int = 8,
    out_scale: int = 6,
) -> DataFrame:
    """Hill estimator of the power-law tail index over the k largest
    values of ``col`` — zipf_fit's extreme-value companion: where Zipf
    reads the rank-frequency SHAPE of a vocabulary, Hill reads how
    heavy the upper TAIL of a numeric column is (alpha ≈ 1-2: very
    heavy, means/variances of ratios are unstable; alpha > 4:
    effectively thin). The planning number behind "can I mean this
    column, or do I need medians/winsorizing?" and skew-aware
    partition sizing.

    Over the order statistics x_(1) ≥ … ≥ x_(k+1) (positive values):

        1/alpha = (1/k) Σ_{i≤k} [ln x_(i) − ln x_(k+1)]
                = (Σ_{i≤k+1} ln x_(i) − (k+1)·ln x_(k+1)) / k

    the second form needs only the SUM over the whole top-(k+1) frame
    plus its min — no per-row rank assignment, so boundary ties cost
    nothing (the k-largest multiset is unique even when ties cross
    the cutoff; which tied ROW sits at rank k+1 is irrelevant once
    only values enter).

    Returns one row ``(n_tail, x_min_tail, inv_alpha, alpha)``; alpha is
    NULL when fewer than 2 positive values exist or the top-(k+1)
    frame is constant (zero log spread — no tail to measure).

    Scale shape: ONE TakeOrderedAndProject (per-partition heap of
    k+1, no full sort, no full shuffle) followed by a fold over the
    bounded k+1-row frame. Determinism: each ln is floor-quantized
    at ``term_scale`` before exact int64 summation (the dsum
    discipline — libm drift absorbed per term), and the closing
    division is over exact integers.
    """
    from ..ops.sorting import top_k

    pos = df.select(F.col(col).cast("double").alias("v")).filter(
        F.col("v").isNotNull() & (F.col("v") > 0.0)
    )
    top = top_k(pos, "v", int(k) + 1)
    tm = F.lit(float(10**term_scale))
    lq = F.floor(F.log(F.col("v")) * tm + F.lit(0.5)).cast("long")
    agg = top.agg(
        F.count(F.lit(1)).alias("n_tail"),
        F.min("v").alias("x_min_tail"),
        F.sum(lq).alias("sl"),
        F.min(lq).alias("lmin"),
    )
    kk = F.col("n_tail") - F.lit(1)  # k actually available
    inv = (
        (F.col("sl") - F.col("n_tail") * F.col("lmin")).cast("double")
        / tm
        / kk.cast("double")
    )
    om = F.lit(float(10**out_scale))

    def _q(c):
        return F.floor(c * om + F.lit(0.5)) / om

    ok = (kk >= 1) & (F.col("sl") > F.col("n_tail") * F.col("lmin"))
    return agg.select(
        "n_tail",
        "x_min_tail",
        F.when(ok, _q(inv)).alias("inv_alpha"),
        F.when(ok, _q(F.lit(1.0) / inv)).alias("alpha"),
    )


def decayed_sum(
    df: DataFrame,
    value: str,
    ts: str,
    group_by: Sequence[str],
    half_life_days: int = 7,
    out_scale: int = 6,
) -> DataFrame:
    """Per-group exponential time-decayed sum of ``value``:
    ``Σ value_i · 0.5^(age_i / half_life)`` with age measured in WHOLE
    half-life periods from the newest timestamp in the data — the
    recency-weighted engagement/importance score behind freshness
    ranking and retention features.

    Determinism: the decay exponent is an INTEGER period count
    (``datediff // half_life_days``), so the decay factor is an exact
    power of two (2^-k is exact in binary floating point for k ≤ 1074,
    and exactly 0.0 beyond — both engines agree bit-for-bit, where a
    fractional exponent would hinge on libm pow). Each term is one IEEE
    multiply of the raw value by that exact factor, floor-quantized to
    int64 units before the order-independent integer sum (the dsum
    discipline).

    Scale shape: one tiny aggregate for the global reference day
    (broadcast as a 1-row frame), one map-side-combining aggregate to
    |groups| rows. Two jobs, nothing proportional to row count moves.
    """
    gb = list(group_by)
    ref = df.agg(F.max(F.to_date(F.col(ts))).alias("__ref_day__"))
    periods = F.floor(
        F.datediff(F.col("__ref_day__"), F.to_date(F.col(ts)))
        / F.lit(int(half_life_days))
    ).cast("int")
    term = F.col(value).cast("double") * F.pow(F.lit(0.5), periods)
    m = F.lit(float(10**out_scale))
    q = F.floor(term * m + F.lit(0.5)).cast("long")
    return (
        df.crossJoin(F.broadcast(ref))
        .filter(F.col(value).isNotNull() & F.col(ts).isNotNull())
        .groupBy(*gb)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(q) / m.cast("double")).alias("decayed_sum"),
        )
    )


def cusum_peaks(
    df: DataFrame,
    ts: str,
    group_by: Sequence[str],
    out_scale: int = 6,
) -> DataFrame:
    """Per-group CUSUM change-point scan over the group's DAILY event
    counts: where did the arrival rate shift up the hardest?

    The one-sided CUSUM against the group's own mean rate is, in
    closed form, ``C_t = S_t - min_{i<=t} S_i`` with
    ``S_t = Σ_{d<=t} (x_d - μ)`` — a prefix sum minus its running
    minimum, i.e. two windows over the group's DAY table (bounded by
    the calendar: a year of data is ≤ 366 rows per group regardless of
    event volume, so the per-group window is bounded by construction —
    the aggregate-then-window pattern that keeps window partitions
    tiny at any scale).

    Determinism: deviations are cleared of the float mean —
    ``dev_d = x_d · n_days - total`` is EXACT int64 (x_d·n_days ≤
    total ≤ 9e18 guarded by the same int64 contract as ks_statistic) —
    so the entire CUSUM path is integer arithmetic; only the final
    normalization ``peak / (total/n_days)`` divides, floor-quantized.
    Ties at the peak resolve to the EARLIEST day.

    Returns per group: ``(group, n_days, total_events, peak_day,
    peak_cusum)`` with ``peak_cusum`` normalized to units of the mean
    daily count.
    """
    gb = list(group_by)
    daily = (
        df.filter(F.col(ts).isNotNull())
        .groupBy(*gb, F.to_date(F.col(ts)).alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    return cusum_from_daily(daily, gb, out_scale)


def cusum_from_daily(
    daily: DataFrame,
    gb: list,
    out_scale: int = 6,
) -> DataFrame:
    """CUSUM core of :func:`cusum_peaks` over an already-built daily
    table ``(*gb, day, x)`` — split out so the streaming twin
    (streaming.changepoint.merge_cusum_snapshots) runs the IDENTICAL
    integer path over its snapshot-reconstructed day counts: one
    binning contract, two entry points, no drift (the
    calibration-lane lesson from the round-10 advice).

    The per-group (n_days, total) carries ride an UNORDERED window
    over the same calendar-bounded partition rather than a join back
    — one shuffle fewer, and no shared-lineage self-join for a
    snapshot-reconstructed input to trip over."""
    wg = Window.partitionBy(*gb)
    # bounded window: <= calendar days per group ride this partition
    j = daily.select(
        *gb,
        "day",
        "x",
        F.count(F.lit(1)).over(wg).alias("n_days"),
        F.sum("x").over(wg).alias("total"),
    )
    dev = F.col("x") * F.col("n_days") - F.col("total")
    w = (
        Window.partitionBy(*gb)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = F.sum(dev).over(w)
    path = j.select(
        *gb, "day", "n_days", "total",
        s.alias("__s__"),
        F.min(s).over(w).alias("__smin__"),
    )
    # C_t = S_t - min(0, min_{i<=t} S_i): the empty prefix contributes 0
    cus = F.col("__s__") - F.least(F.col("__smin__"), F.lit(0).cast("long"))
    m = F.lit(float(10**out_scale))
    best = path.groupBy(*gb).agg(
        F.max("n_days").alias("n_days"),
        F.max("total").alias("total_events"),
        F.max(
            F.struct(
                cus.alias("c"),
                (F.lit(0) - F.unix_date(F.col("day"))).alias("nd"),
                F.col("day").alias("at"),
            )
        ).alias("__b__"),
    )
    # normalized peak: cusum is in units of (count·n_days); divide by
    # total to express it in mean-day units — one float division
    norm = F.col("__b__.c").cast("double") / F.col(
        "total_events"
    ).cast("double")
    return best.select(
        *gb,
        "n_days",
        "total_events",
        F.col("__b__.at").alias("peak_day"),
        (F.floor(norm * m + F.lit(0.5)) / m).alias("peak_cusum"),
    )


def two_proportion_ztest(
    df: DataFrame,
    variant: str | Column,
    success: str | Column,
    out_scale: int = 6,
) -> DataFrame:
    """Two-proportion pooled z-test between exactly two variants — the
    A/B-test read-out. ``variant`` must take exactly 2 distinct values
    (asserted in-plan); ``success`` is a boolean.

    One map-side-combining aggregate to 2 rows, then closed-form
    arithmetic. The z statistic uses only +,-,*,/ and sqrt — ALL
    correctly-rounded IEEE operations — over exact integer counts, so
    it is bit-identical in any engine before the final quantization
    (no libm-sensitive exp/log anywhere).

    Returns one row: ``(variant_a, n_a, x_a, variant_b, n_b, x_b,
    rate_a, rate_b, z_score)`` with variants ordered ascending.
    """
    vc = F.col(variant) if isinstance(variant, str) else variant
    sc = F.col(success) if isinstance(success, str) else success
    per = df.groupBy(vc.alias("v")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(sc.cast("long")).alias("x"),
    )
    two = F.assert_true(
        F.count(F.lit(1)) == 2,
        F.lit("two_proportion_ztest: variant must have exactly 2 levels"),
    )
    wide = per.agg(
        F.min_by(F.col("v"), F.col("v")).alias("variant_a"),
        F.min_by(F.col("n"), F.col("v")).alias("n_a"),
        F.min_by(F.col("x"), F.col("v")).alias("x_a"),
        F.max_by(F.col("v"), F.col("v")).alias("variant_b"),
        F.max_by(F.col("n"), F.col("v")).alias("n_b"),
        F.max_by(F.col("x"), F.col("v")).alias("x_b"),
        two.alias("__ok__"),
    )
    na, xa = F.col("n_a").cast("double"), F.col("x_a").cast("double")
    nb, xb = F.col("n_b").cast("double"), F.col("x_b").cast("double")
    p_pool = (xa + xb) / (na + nb)
    se = F.sqrt(p_pool * (F.lit(1.0) - p_pool) * (F.lit(1.0) / na + F.lit(1.0) / nb))
    z = F.when(se > 0, (xa / na - xb / nb) / se).otherwise(F.lit(0.0))
    m = F.lit(float(10**out_scale))

    def _q(c):
        return F.floor(c * m + F.lit(0.5)) / m

    return wide.select(
        "variant_a", "n_a", "x_a", "variant_b", "n_b", "x_b",
        _q(xa / na).alias("rate_a"),
        _q(xb / nb).alias("rate_b"),
        (_q(z) + F.when(F.col("__ok__").isNull(), F.lit(0.0))).alias("z_score"),
    )


def winsorized_stats(
    df: DataFrame,
    value: str,
    group_by: Sequence[str],
    lo_q: float = 0.05,
    hi_q: float = 0.95,
    scale: int = 2,
    out_scale: int = 6,
) -> DataFrame:
    """Per-group winsorized mean: clamp ``value`` at the group's
    DISCRETE lo_q/hi_q order statistics, then average — the outlier-
    robust mean that, unlike trimming, keeps n constant.

    The bounds are discrete order statistics (the element at rank
    ``max(1, ceil(q·n))``) — selected values, never interpolated, so
    they are bit-identical across engines (an interpolated bound's last
    ulp depends on the lerp formula). Values are quantized to int64
    units up front; the winsorized sum is then exact integer math.

    Scale shape: one ``row_number``/``count`` window keyed by the group
    (a keyed external sort — spills, never OOMs, same cost class as any
    per-group ranking), then one map-side-combining aggregate on the
    same key: the window's conditional rank-pick (``max(case when rn =
    lo_rank ...)``) rides the partitioning the window already created.
    For groups too large to sort comfortably, the unbounded-memory-safe
    alternative is ops.selection.exact_ranks per group — this keyed
    form is the right default while |group| ≪ |table|.

    Returns ``(group, n, lo_bound, hi_bound, winsorized_mean)`` in
    original units.
    """
    gb = list(group_by)
    m = F.lit(float(10**scale))
    x = F.floor(F.col(value).cast("double") * m + F.lit(0.5)).cast("long")
    base = df.filter(F.col(value).isNotNull()).select(*gb, x.alias("__x__"))
    w = Window.partitionBy(*gb).orderBy("__x__")
    wall = Window.partitionBy(*gb)
    ranked = base.select(
        *gb,
        "__x__",
        F.row_number().over(w).alias("__rn__"),
        F.count(F.lit(1)).over(wall).alias("__n__"),
    )
    lo_rank = F.greatest(
        F.lit(1).cast("long"), F.ceil(F.lit(float(lo_q)) * F.col("__n__"))
    )
    hi_rank = F.greatest(
        F.lit(1).cast("long"), F.ceil(F.lit(float(hi_q)) * F.col("__n__"))
    )
    marked = ranked.select(
        *gb,
        "__x__",
        F.when(F.col("__rn__") == lo_rank, F.col("__x__")).alias("__lo__"),
        F.when(F.col("__rn__") == hi_rank, F.col("__x__")).alias("__hi__"),
    )
    bounds = marked.groupBy(*gb).agg(
        F.count(F.lit(1)).alias("n"),
        F.max("__lo__").alias("__lob__"),
        F.max("__hi__").alias("__hib__"),
    )
    # Second pass over the RANKED frame (same key — the join and the
    # final aggregate reuse the window's partitioning; the bounds side
    # is |groups| rows and broadcasts): clamp against the per-group
    # bounds and sum exactly.
    clamped = (
        ranked.join(bounds, gb, "inner")
        .select(
            *gb,
            "n",
            "__lob__",
            "__hib__",
            F.greatest(
                F.col("__lob__"), F.least(F.col("__hib__"), F.col("__x__"))
            ).alias("__cx__"),
        )
        .groupBy(*gb)
        .agg(
            F.max("n").alias("n"),
            F.max("__lob__").alias("__lob__"),
            F.max("__hib__").alias("__hib__"),
            F.sum("__cx__").alias("__scx__"),
        )
    )
    om = F.lit(float(10**out_scale))
    mean = (
        F.col("__scx__").cast("double")
        / F.col("n").cast("double")
        / m.cast("double")
    )
    return clamped.select(
        *gb,
        "n",
        (F.col("__lob__").cast("double") / m).alias("lo_bound"),
        (F.col("__hib__").cast("double") / m).alias("hi_bound"),
        (F.floor(mean * om + F.lit(0.5)) / om).alias("winsorized_mean"),
    )


def welch_ttest(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    scale: int = 6,
    out_scale: int = 6,
) -> DataFrame:
    """Welch's unequal-variance two-sample t-test between the ``col``
    distributions of two frames — the default "did the mean move?"
    test (Student's equal-variance assumption is never safe on pipeline
    data). Returns one row ``(n_a, n_b, mean_a, mean_b, t_stat, df)``
    with Welch-Satterthwaite degrees of freedom.

    Determinism: each side reduces to exact integer sums — Σq and Σq²
    of the ``10^scale``-quantized values, with Σq² in decimal(38,0)
    (q² ~ 1e16 per row overflows int64 under summation) — then mean,
    variance, t and df are pure +,-,*,/ and sqrt over those exact
    integers: correctly-rounded IEEE all the way, bit-identical in any
    engine before the final floor-quantization.

    Scale shape: ONE map-side-combining aggregate per side to a single
    row each, cross-joined broadcast. Nothing else moves.
    """
    m = F.lit(float(10**scale))
    dec = "decimal(38,0)"

    def side(df: DataFrame, tag: str) -> DataFrame:
        q = F.floor(F.col(col).cast("double") * m + F.lit(0.5)).cast("long")
        return (
            df.filter(F.col(col).isNotNull())
            .select(q.alias("q"))
            .agg(
                F.count(F.lit(1)).alias(f"n_{tag}"),
                F.sum("q").alias(f"sq_{tag}"),
                F.sum((F.col("q").cast(dec) * F.col("q").cast(dec))).alias(
                    f"sqq_{tag}"
                ),
            )
        )

    j = side(df_a, "a").crossJoin(F.broadcast(side(df_b, "b")))

    def stats(tag: str):
        n = F.col(f"n_{tag}").cast("double")
        s = F.col(f"sq_{tag}").cast("double")
        ss = F.col(f"sqq_{tag}").cast("double")
        mean = s / n / m
        # sample variance in ORIGINAL units: (ss - s^2/n)/(n-1) / m^2
        var = (ss - s * s / n) / (n - F.lit(1.0)) / (m * m)
        return n, mean, var

    na, ma_, va = stats("a")
    nb, mb_, vb = stats("b")
    sea = va / na
    seb = vb / nb
    se2 = sea + seb
    t = F.when(se2 > 0, (ma_ - mb_) / F.sqrt(se2)).otherwise(F.lit(0.0))
    dof = F.when(
        se2 > 0,
        (se2 * se2)
        / (sea * sea / (na - F.lit(1.0)) + seb * seb / (nb - F.lit(1.0))),
    ).otherwise(F.lit(0.0))
    om = F.lit(float(10**out_scale))

    def _q(x):
        return F.floor(x * om + F.lit(0.5)) / om

    return j.select(
        "n_a",
        "n_b",
        _q(ma_).alias("mean_a"),
        _q(mb_).alias("mean_b"),
        _q(t).alias("t_stat"),
        _q(dof).alias("df"),
    )


def effect_size_d(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    scale: int = 6,
    out_scale: int = 6,
) -> DataFrame:
    """Cohen's d and Hedges' g between two frames' ``col`` means — the
    parametric effect size that answers what welch_ttest's t cannot:
    at pipeline n, ANY mean shift is "significant", so the decision
    number is the shift in pooled-SD units (d ≈ 0.2 small / 0.5
    medium / 0.8 large), with Hedges' small-sample correction
    g = d·(1 − 3/(4N−9)). Cliff's delta is this lane's nonparametric
    twin; d is what power analyses and experiment write-ups quote.

        d = (mean_a − mean_b) / s_pooled,
        s_pooled² = ((n_a−1)s_a² + (n_b−1)s_b²) / (n_a+n_b−2)

    Returns one row ``(n_a, n_b, mean_a, mean_b, cohen_d, hedges_g)``;
    d/g are NULL when either side has < 2 rows or the pooled variance
    is 0 (no spread — the shift is 0 or ∞ SDs, not a number).

    Determinism and scale shape are welch_ttest's exactly: ONE
    map-side-combining aggregate per side over ``10^scale``-quantized
    values (Σq exact int64, Σq² exact decimal(38,0)), one broadcast
    crossJoin of two 1-row frames, then pure IEEE arithmetic over
    exact integers, floor-quantized on output.
    """
    m = F.lit(float(10**scale))
    dec = "decimal(38,0)"

    def side(df: DataFrame, tag: str) -> DataFrame:
        q = F.floor(F.col(col).cast("double") * m + F.lit(0.5)).cast("long")
        return (
            df.filter(F.col(col).isNotNull())
            .select(q.alias("q"))
            .agg(
                F.count(F.lit(1)).alias(f"n_{tag}"),
                F.sum("q").alias(f"sq_{tag}"),
                F.sum((F.col("q").cast(dec) * F.col("q").cast(dec))).alias(
                    f"sqq_{tag}"
                ),
            )
        )

    j = side(df_a, "a").crossJoin(F.broadcast(side(df_b, "b")))

    def stats(tag: str):
        n = F.col(f"n_{tag}").cast("double")
        s = F.col(f"sq_{tag}").cast("double")
        ss = F.col(f"sqq_{tag}").cast("double")
        mean = s / n / m
        var = (ss - s * s / n) / (n - F.lit(1.0)) / (m * m)
        return n, mean, var

    na, ma_, va = stats("a")
    nb, mb_, vb = stats("b")
    sp2 = ((na - F.lit(1.0)) * va + (nb - F.lit(1.0)) * vb) / (
        na + nb - F.lit(2.0)
    )
    d = (ma_ - mb_) / F.sqrt(sp2)
    g = d * (F.lit(1.0) - F.lit(3.0) / (F.lit(4.0) * (na + nb) - F.lit(9.0)))
    om = F.lit(float(10**out_scale))

    def _q(x):
        return F.floor(x * om + F.lit(0.5)) / om

    ok = (na >= 2) & (nb >= 2) & (sp2 > 0)
    return j.select(
        "n_a",
        "n_b",
        _q(ma_).alias("mean_a"),
        _q(mb_).alias("mean_b"),
        F.when(ok, _q(d)).alias("cohen_d"),
        F.when(ok, _q(g)).alias("hedges_g"),
    )


def wilson_interval(
    df: DataFrame,
    flag_col: str,
    group_by: Sequence[str] | None = None,
    z: float = 1.96,
    out_scale: int = 6,
) -> DataFrame:
    """Wilson score confidence interval for (per-group) proportions —
    the CI that q_ab_test's z-test doesn't give, and the one that
    stays honest where the naive Wald interval p ± z√(p(1−p)/n)
    collapses: near 0/1 and at small n (Wald gives zero-width
    intervals at p ∈ {0,1} and can leave [0,1]; Wilson never does).
    The number a dashboard puts under every rate.

        center = p + z²/2n,   half = z·√(p(1−p)/n + z²/4n²)
        (lo, hi) = (center ∓ half) / (1 + z²/n)

    Returns one row per group: ``(…group, n, n_pos, p_hat,
    wilson_lo, wilson_hi)``.

    Scale shape: ONE map-side-combining aggregate — (n, n_pos) per
    group — then closed-form column arithmetic; nothing else moves.
    Determinism: n and n_pos are exact int64; p and the interval are
    +,-,*,/ and sqrt over those integers and the literal z — both
    engines evaluate identical doubles — floor-quantized on output.
    """
    zf = float(z)
    z2 = zf * zf
    keys = list(group_by or [])
    base = df.filter(F.col(flag_col).isNotNull()).select(
        *keys, F.col(flag_col).cast("boolean").alias("f")
    )
    gb = base.groupBy(*keys) if keys else base.groupBy()
    agg = gb.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("f"), F.lit(1)).otherwise(F.lit(0))).alias(
            "n_pos"
        ),
    )
    n = F.col("n").cast("double")
    p = F.col("n_pos").cast("double") / n
    center = p + F.lit(z2) / (F.lit(2.0) * n)
    half = F.lit(zf) * F.sqrt(
        p * (F.lit(1.0) - p) / n + F.lit(z2) / (F.lit(4.0) * n * n)
    )
    denom = F.lit(1.0) + F.lit(z2) / n
    om = F.lit(float(10**out_scale))

    def _q(c):
        return F.floor(c * om + F.lit(0.5)) / om

    return agg.select(
        *keys,
        "n",
        "n_pos",
        _q(p).alias("p_hat"),
        _q((center - half) / denom).alias("wilson_lo"),
        _q((center + half) / denom).alias("wilson_hi"),
    )


def mann_whitney_u(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    out_scale: int = 6,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test between two frames'
    ``col`` distributions — the rank-based location test that, unlike
    Welch, is immune to outliers and shape; with :func:`ks_statistic`
    it completes the drift-test battery (KS asks "any difference?",
    U asks "is one stochastically larger?").

    EXACT integer path, including ties: both sides collapse to
    per-VALUE counts, midranks come from the same distributed prefix
    scan KS uses (cum counts via ops.window.with_running — never a
    SinglePartition window), and everything is carried in DOUBLED units
    so tie-midranks (k + 1/2) stay integral: ``2·midrank(v) = 2·cum_<v
    + cnt_v + 1``. 2·R_a, 2·U, and the tie-correction Σ(t³-t) are exact
    int64/decimal sums; only the final z normalization divides.
    Contract: n_a·n_b·N must fit the decimal(38,0) guard — any real
    table does.

    Returns one row ``(n_a, n_b, u_stat, z_score)`` where ``u_stat``
    is U for side A (in ordinary units, may end in .5 under odd tie
    runs — exact, not rounded) and ``z_score`` the tie-corrected
    normal approximation (0 when the variance degenerates, i.e. all
    values tie).
    """
    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(F.col(col).cast("double").alias("v"))
            .filter(F.col("v").isNotNull())
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias(name))
        )

    merged = (
        counts(df_a, "ca")
        .join(counts(df_b, "cb"), "v", "full_outer")
        .select(
            "v",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
        .withColumn("cnt", F.col("ca") + F.col("cb"))
    )
    from ..ops.window import with_running

    run = with_running(merged, {"cum": ("sum", "cnt")}, order_by="v")
    # 2*midrank = 2*(cum - cnt) + cnt + 1  (cum is INCLUSIVE of v)
    two_mid = F.lit(2) * (F.col("cum") - F.col("cnt")) + F.col("cnt") + F.lit(1)
    dec = "decimal(38,0)"
    agg = run.agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.sum((F.col("ca").cast(dec) * two_mid.cast(dec))).alias("two_ra"),
        # tie correction: sum over values of cnt^3 - cnt
        F.sum(
            (
                F.col("cnt").cast(dec)
                * F.col("cnt").cast(dec)
                * F.col("cnt").cast(dec)
                - F.col("cnt").cast(dec)
            )
        ).alias("tie3"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    ntot = na + nb
    two_u = (
        F.col("two_ra").cast("double") - na * (na + F.lit(1.0))
    )  # 2*Ra - 2*na(na+1)/2
    u = two_u / F.lit(2.0)
    mean_u = na * nb / F.lit(2.0)
    var_u = (
        na * nb / F.lit(12.0)
        * (
            (ntot + F.lit(1.0))
            - F.col("tie3").cast("double") / (ntot * (ntot - F.lit(1.0)))
        )
    )
    z = F.when(var_u > 0, (u - mean_u) / F.sqrt(var_u)).otherwise(F.lit(0.0))
    om = F.lit(float(10**out_scale))
    return agg.select(
        "n_a",
        "n_b",
        u.alias("u_stat"),
        (F.floor(z * om + F.lit(0.5)) / om).alias("z_score"),
    )


def hodges_lehmann_shift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    scale: int = 0,
    out_scale: int = 6,
) -> DataFrame:
    """Hodges–Lehmann location-shift estimator between two samples:
    the MEDIAN of all pairwise differences a − b (a ~ A, b ~ B) — the
    robust "how far apart are these distributions" in the UNITS of
    ``col`` that completes the two-sample lane: mann_whitney_u tests
    the shift, cliffs_delta sizes it on [−1,1], HL reports it in
    dollars/tokens/seconds (30% breakdown point, ~95% Gaussian
    efficiency — the standard robust effect estimate).

    EXACT path over QUANTIZED values: both sides collapse to
    per-value count tables at ``10^scale`` units (the wasserstein_1d
    contract), the |V_a| × |V_b| cross of DISTINCT values carries
    weight ca·cb per difference d = v_a − v_b, per-d weights
    aggregate, and the weighted median selects via one bounded prefix
    scan: with N = n_a·n_b pairs, hl = (d@⌈N/2⌉ + d@⌊N/2⌋+1) / 2
    (order statistics of the pair multiset — both engines select
    identical integers; the even-N midpoint halves exactly in
    doubles).

    Scale contract: the cross is |V_a|·|V_b| over DISTINCT quantized
    values — bounded by the quantization, NOT by row count (the
    per-value tables persist once and the small side broadcasts).
    Choose ``scale`` so |V| stays ~1e4 per side (1e8 diff rows worst
    case — a bounded shuffle, no row-volume quadratics); for
    continuous cols at fine scales use a coarser ``scale`` — the HL
    estimate moves by at most one quantization unit.

    Caching contract: persists the two bounded per-value tables
    (MEMORY_AND_DISK); the handles ride the result as
    ``unpersist_handles`` — release with
    ``dataframes_jl_spark.release(result)`` once consumed (or
    session-wide ``spark.catalog.clearCache()``).

    Returns one row ``(n_a, n_b, n_pairs, hl_shift)`` with hl_shift
    back in ``col`` units (NULL when either side is empty).
    """
    from pyspark import StorageLevel

    m = F.lit(float(10**scale))
    qv = F.floor(F.col(col).cast("double") * m + F.lit(0.5)).cast("long")

    def counts(df: DataFrame) -> DataFrame:
        return (
            df.filter(F.col(col).isNotNull())
            .select(qv.alias("v"))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("c"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )

    va = counts(df_a)
    vb = counts(df_b)
    dec = "decimal(38,0)"
    diffs = (
        va.select(F.col("v").alias("va"), F.col("c").alias("ca"))
        .crossJoin(
            F.broadcast(
                vb.select(F.col("v").alias("vb"), F.col("c").alias("cb"))
            )
        )
        .select(
            (F.col("va") - F.col("vb")).alias("d"),
            (F.col("ca").cast(dec) * F.col("cb").cast(dec)).alias("w"),
        )
        .groupBy("d")
        .agg(F.sum("w").alias("w"))
    )
    from ..ops.window import with_running

    run = with_running(diffs, {"cum": ("sum", "w")}, order_by="d")
    tot = (
        va.agg(F.sum("c").alias("n_a"))
        .crossJoin(F.broadcast(vb.agg(F.sum("c").alias("n_b"))))
        .select(
            "n_a",
            "n_b",
            (F.col("n_a").cast(dec) * F.col("n_b").cast(dec)).alias(
                "n_pairs"
            ),
        )
    )
    # k_lo = ceil(N/2), k_hi = floor(N/2) + 1 (1-indexed order stats;
    # equal when N is odd). Spark's decimal cast rounds HALF-UP, so
    # never divide-and-cast an odd decimal — compute from the exact
    # even part (N - N%2)/2 instead (the dividend is even, the
    # division exact at any decimal scale).
    half = (F.col("n_pairs") - F.pmod(F.col("n_pairs"), F.lit(2))) / F.lit(
        2
    )
    k_lo = F.when(
        F.pmod(F.col("n_pairs"), F.lit(2)) == 0, half
    ).otherwise(half + F.lit(1))  # ceil(N/2)
    k_hi = half + F.lit(1)  # floor(N/2) + 1
    sel = run.crossJoin(F.broadcast(tot)).agg(
        F.min(F.when(F.col("cum") >= k_lo, F.col("d"))).alias("d_lo"),
        F.min(F.when(F.col("cum") >= k_hi, F.col("d"))).alias("d_hi"),
    )
    om = F.lit(float(10**out_scale))
    hl = (
        (F.col("d_lo").cast("double") + F.col("d_hi").cast("double"))
        / F.lit(2.0)
        / m
    )
    from ..core.cache import hold

    return hold(
        tot.crossJoin(F.broadcast(sel)).select(
            "n_a",
            "n_b",
            F.col("n_pairs").cast("double").alias("n_pairs"),
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0),
                F.floor(hl * om + F.lit(0.5)) / om,
            ).alias("hl_shift"),
        ),
        va,
        vb,
        run,
    )


def roc_auc(
    df: DataFrame,
    label: str,
    score: str,
    group_by: Sequence[str] = (),
    scale: int = 6,
    out_scale: int = 6,
) -> DataFrame:
    """Per-group ROC AUC of a score column against a 0/1 label — the
    ranking-quality number every model-assisted curation loop reads
    (quality classifiers, dedup scorers, relevance filters) — via the
    rank-sum identity ``AUC = U / (n_pos * n_neg)``: AUC is exactly
    the probability a random positive outranks a random negative,
    which is :func:`mann_whitney_u`'s U in disguise.

    Same exact-integer path as the U test: scores quantize to int64,
    collapse to per-VALUE (pos, neg) counts, midranks ride the
    cum-count prefix scan in DOUBLED units (``2·midrank = 2·cum_<v +
    cnt + 1`` keeps tie-midranks integral), and
    ``2U = Σ pos_v·2·midrank_v − n_pos·(n_pos+1)`` accumulates in
    decimal(38,0). One division at the end; ties get the standard
    1/2-credit automatically through midranks. Labels outside {0,1}
    raise in-plan.

    Grouped: the prefix scan partitions per group (one hash shuffle).
    UNGROUPED: with_running's range-partitioned scan — never a
    SinglePartition window. Returns ``(*group_by, n_pos, n_neg, auc)``
    with auc NULL when a class is empty (undefined, not 0).
    """
    from ..ops.window import with_running

    gb = list(group_by)
    m = F.lit(float(10**scale))
    y = F.col(label).cast("long")
    ychk = F.when(y.isin(0, 1), y).otherwise(
        F.raise_error(F.lit(f"roc_auc: label {label} must be 0/1"))
    )
    per = (
        df.filter(F.col(label).isNotNull() & F.col(score).isNotNull())
        .select(
            *gb,
            F.floor(F.col(score).cast("double") * m + F.lit(0.5))
            .cast("long")
            .alias("v"),
            ychk.alias("y"),
        )
        .groupBy(*gb, "v")
        .agg(
            F.sum("y").alias("pos"),
            (F.count(F.lit(1)) - F.sum("y")).alias("neg"),
        )
        .withColumn("cnt", F.col("pos") + F.col("neg"))
    )
    run = with_running(
        per,
        {"cum": ("sum", "cnt")},
        order_by="v",
        partition_by=gb if gb else None,
    )
    two_mid = F.lit(2) * (F.col("cum") - F.col("cnt")) + F.col("cnt") + F.lit(1)
    dec = "decimal(38,0)"
    agg = run.groupBy(*gb).agg(
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"),
        F.sum(F.col("pos").cast(dec) * two_mid.cast(dec)).alias("two_rpos"),
    )
    npos = F.col("n_pos").cast("double")
    nneg = F.col("n_neg").cast("double")
    two_u = F.col("two_rpos").cast("double") - npos * (npos + F.lit(1.0))
    auc = two_u / (F.lit(2.0) * npos * nneg)
    om = F.lit(float(10**out_scale))
    return agg.select(
        *gb,
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.floor(auc * om + F.lit(0.5)) / om,
        ).alias("auc"),
    )


def average_precision(
    df: DataFrame,
    label: str,
    score: str,
    group_by: Sequence[str] = (),
    scale: int = 6,
    term_scale: int = 8,
    out_scale: int = 6,
) -> DataFrame:
    """Per-group average precision (PR-AUC) — :func:`roc_auc`'s
    companion for the imbalanced case every corpus-curation classifier
    lives in (1% positives make ROC flatter than it deserves; the PR
    curve does not forgive false positives).

    Definition (the threshold-sum form sklearn uses):
    ``AP = Σ_v P(v) · ΔR(v)`` over DISTINCT scores v descending, with
    ``P(v) = cum_pos(v)/cum_cnt(v)`` and ``ΔR(v) = pos_v/n_pos`` — a
    per-VALUE table plus one descending prefix scan, the same shape as
    :func:`roc_auc` (scores quantize to int64; the scan orders by the
    NEGATED quantized score so with_running's ascending machinery
    serves both). Ties are handled exactly: a tie group contributes one
    threshold, as the definition requires.

    Determinism: ``pos_v`` and ``cum_pos`` are each cast to double
    BEFORE multiplying (an int64 product would overflow — and raise
    under ANSI — on ~3e9-row tie groups; the double product is exact
    below 2^53 and merely rounds above); each term pays ONE
    correctly-rounded division before floor-quantizing to
    ``term_scale`` — the dsum discipline — and the final AP divides
    the integer term-sum by n_pos once. Labels outside {0,1} raise
    in-plan. Returns ``(*group_by, n_pos, n_neg, ap)`` with ap NULL
    when there are no positives.
    """
    from ..ops.window import with_running

    gb = list(group_by)
    m = F.lit(float(10**scale))
    y = F.col(label).cast("long")
    ychk = F.when(y.isin(0, 1), y).otherwise(
        F.raise_error(F.lit(f"average_precision: label {label} must be 0/1"))
    )
    per = (
        df.filter(F.col(label).isNotNull() & F.col(score).isNotNull())
        .select(
            *gb,
            (-F.floor(F.col(score).cast("double") * m + F.lit(0.5)))
            .cast("long")
            .alias("nv"),
            ychk.alias("y"),
        )
        .groupBy(*gb, "nv")
        .agg(
            F.sum("y").alias("pos"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    run = with_running(
        per,
        {"cum_pos": ("sum", "pos"), "cum_cnt": ("sum", "cnt")},
        order_by="nv",
        partition_by=gb if gb else None,
    )
    tm = F.lit(float(10**term_scale))
    # Cast each factor to double BEFORE multiplying: an int64 product
    # of pos*cum_pos overflows (ANSI raise) on ~3e9-row tie groups,
    # while the double product merely rounds (exact below 2^53, where
    # both paths agree bit-for-bit). Mirrors roc_auc's wide-type
    # accumulation; ONE division per term.
    term_units = F.floor(
        F.col("pos").cast("double") * F.col("cum_pos").cast("double")
        / F.col("cum_cnt").cast("double")
        * tm
        + F.lit(0.5)
    ).cast("long")
    agg = run.groupBy(*gb).agg(
        F.sum("pos").alias("n_pos"),
        (F.sum("cnt") - F.sum("pos")).alias("n_neg"),
        F.sum(term_units).alias("__tu__"),
    )
    om = F.lit(float(10**out_scale))
    ap = (
        F.col("__tu__").cast("double") / tm / F.col("n_pos").cast("double")
    )
    return agg.select(
        *gb,
        "n_pos",
        "n_neg",
        F.when(
            F.col("n_pos") > 0, F.floor(ap * om + F.lit(0.5)) / om
        ).alias("ap"),
    )


def null_matrix(
    df: DataFrame,
    group_by: str,
    cols: Sequence[str] | None = None,
    out_scale: int = 6,
) -> DataFrame:
    """Per-group per-column completeness audit: ``(group, column,
    n_rows, n_null, null_rate)`` — the first table a data contract
    review reads ("source X stopped filling column Y last Tuesday").

    ONE aggregate pass computes every column's null count per group
    (map-side combining, |groups| rows out), then a codegen'd
    inline-struct unpivot to |groups| x |cols| rows — the same
    one-pass-then-unpivot shape as :func:`describe`, never a per-column
    job."""
    if cols is None:
        cols = [c for c in df.columns if c != group_by]
    cols = list(cols)
    aggs = [F.count(F.lit(1)).alias("__n__")] + [
        F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}__")
        for c in cols
    ]
    row = df.groupBy(F.col(group_by).alias("g")).agg(*aggs)
    pieces = ", ".join(
        f"named_struct('column', '{c}', 'n_null', `__nn_{c}__`)" for c in cols
    )
    ex = row.selectExpr("g", "__n__", f"inline(array({pieces}))")
    m = F.lit(float(10**out_scale))
    rate = F.col("n_null").cast("double") / F.col("__n__").cast("double")
    return ex.select(
        F.col("g").alias(group_by),
        F.col("column"),
        F.col("__n__").alias("n_rows"),
        "n_null",
        (F.floor(rate * m + F.lit(0.5)) / m).alias("null_rate"),
    )


def _binned_scores(
    df: DataFrame,
    label: str,
    score: str,
    gb: list,
    n_bins: int,
    scale: int,
    op_name: str,
) -> DataFrame:
    """Shared binning contract of :func:`reliability_bins` and
    :func:`calibration_report`: validate label∈{0,1} / score∈[0,1]
    in-plan, quantize scores to int64 units at ``scale``, and compute
    the integer-exact bin index ``min(floor(u·n_bins/10^scale),
    n_bins−1)``. Returns the ``(*gb, bin, u, y)`` projection both
    operators aggregate over — one definition, so the two ends of the
    calibration lane cannot drift apart."""
    m = 10**scale
    y = F.col(label).cast("long")
    ychk = F.when(y.isin(0, 1), y).otherwise(
        F.raise_error(F.lit(f"{op_name}: label {label} must be 0/1"))
    )
    s = F.col(score).cast("double")
    u = F.floor(s * F.lit(float(m)) + F.lit(0.5)).cast("long")
    uchk = F.when((s >= 0.0) & (s <= 1.0), u).otherwise(
        F.raise_error(F.lit(f"{op_name}: score {score} must be in [0,1]"))
    )
    b = F.least(
        F.floor(
            F.col("u").cast("double") * F.lit(float(n_bins)) / F.lit(float(m))
        ).cast("long"),
        F.lit(int(n_bins) - 1),
    )
    return (
        df.filter(F.col(label).isNotNull() & F.col(score).isNotNull())
        .select(*gb, uchk.alias("u"), ychk.alias("y"))
        .select(*gb, b.alias("bin"), "u", "y")
    )


def reliability_bins(
    df: DataFrame,
    label: str,
    score: str,
    group_by: Sequence[str] = (),
    n_bins: int = 10,
    scale: int = 6,
    out_scale: int = 6,
) -> DataFrame:
    """Per-group reliability table: predicted-probability bins x
    observed positive rate — the plot behind every calibration review
    (a quality classifier that says 0.9 should be right 90% of the
    time; when it is not, thresholds picked from its scores are lies).
    Completes the eval lane beside :func:`roc_auc` (ranking) and
    :func:`average_precision` (retrieval): calibration is the third
    axis neither measures.

    Scores quantize to int64 units at ``scale`` (the repo's dsum
    discipline), and the bin index is computed FROM the units —
    ``bin = min(floor(u·n_bins/10^scale), n_bins−1)`` — integer-exact,
    so a score of exactly 1.0 lands in the last bin and no float-edge
    row can land differently in another engine. ONE aggregate pass
    with map-side combine produces |groups|·n_bins rows: n, n_pos,
    mean predicted probability (exact unit-sum, one division), and
    observed rate (one division). Labels outside {0,1} and scores
    outside [0,1] raise in-plan: a "probability" of 1.7 is a caller
    bug, not a bin.

    Returns ``(*group_by, bin, n, n_pos, mean_pred, obs_rate)``.
    Scale shape: one hash shuffle keyed (group, bin); output bounded
    by |groups|·n_bins regardless of input rows.
    """
    gb = list(group_by)
    m = 10**scale
    per = (
        _binned_scores(
            df, label, score, gb, n_bins, scale, "reliability_bins"
        )
        .groupBy(*gb, "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").alias("n_pos"),
            F.sum(F.col("u").cast("decimal(38,0)")).alias("__su__"),
        )
    )
    om = F.lit(float(10**out_scale))
    mean_pred = (
        F.col("__su__").cast("double")
        / F.col("n").cast("double")
        / F.lit(float(m))
    )
    obs = F.col("n_pos").cast("double") / F.col("n").cast("double")
    return per.select(
        *gb,
        "bin",
        "n",
        "n_pos",
        (F.floor(mean_pred * om + F.lit(0.5)) / om).alias("mean_pred"),
        (F.floor(obs * om + F.lit(0.5)) / om).alias("obs_rate"),
    )


def calibration_report(
    df: DataFrame,
    label: str,
    score: str,
    group_by: Sequence[str] = (),
    n_bins: int = 10,
    scale: int = 6,
    out_scale: int = 6,
) -> DataFrame:
    """Per-group scalar calibration summary: ECE, MCE and the Brier
    score — the numbers a model gate thresholds on once the
    :func:`reliability_bins` plot has been read by a human.

    Exact-integer identities keep every statistic engine-portable:

    - ``ECE = Σ_b (n_b/N)·|obs_b − pred_b|`` telescopes to
      ``Σ_b |n_pos_b·10^s − Σu_b| / (10^s·N)`` — the numerator is an
      EXACT integer per bin (decimal(38,0) against 1e12-row groups),
      so ECE pays exactly ONE division.
    - ``MCE = max_b |obs_b − pred_b|`` — one correctly-rounded
      division per bin (≤ n_bins of them), then max.
    - ``Brier = Σ (p−y)² / N`` accumulates the exact per-row integer
      ``(u − y·10^s)²`` in decimal(38,0); one division by ``N·10^2s``.

    Two aggregate passes: the per-(group,bin) pass of
    reliability_bins, then a |groups|·n_bins → |groups| fold — the
    second shuffle moves a bounded table. Returns
    ``(*group_by, n, n_pos, ece, mce, brier)``.
    """
    gb = list(group_by)
    m = 10**scale
    dec = "decimal(38,0)"
    err = F.col("u") - F.col("y") * F.lit(m)
    per = (
        _binned_scores(
            df, label, score, gb, n_bins, scale, "calibration_report"
        )
        .groupBy(*gb, "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").alias("n_pos"),
            F.sum(F.col("u").cast(dec)).alias("su"),
            F.sum((err.cast(dec) * err.cast(dec))).alias("se"),
        )
    )
    return _calibration_fold(per, gb, scale, out_scale)


def _calibration_fold(
    per: DataFrame, gb: list, scale: int, out_scale: int
) -> DataFrame:
    """Fold the exact per-(group, bin) integer state ``(*gb, bin, n,
    n_pos, su, se)`` (``su``/``se`` decimal(38,0): Σu and Σ(u−y·10^s)²)
    into the calibration report ``(*gb, n, n_pos, ece, mce, brier)``.
    Shared by batch :func:`calibration_report` and the streaming
    snapshot merge (streaming/calibration.py) — ONE definition of the
    ECE/MCE/Brier arithmetic, so a drift monitor reads numbers
    batch-identical by construction."""
    m = 10**scale
    dec = "decimal(38,0)"
    # |n_pos_b * 10^s - su_b| : exact integer calibration gap per bin
    gap = F.abs(F.col("n_pos").cast(dec) * F.lit(m).cast(dec) - F.col("su"))
    mce_b = gap.cast("double") / (
        F.col("n").cast("double") * F.lit(float(m))
    )
    agg = per.groupBy(*gb).agg(
        F.sum("n").alias("n"),
        F.sum("n_pos").alias("n_pos"),
        F.sum(gap).alias("__gap__"),
        F.max(mce_b).alias("__mce__"),
        F.sum("se").alias("__se__"),
    )
    om = F.lit(float(10**out_scale))
    nn = F.col("n").cast("double")
    ece = F.col("__gap__").cast("double") / (nn * F.lit(float(m)))
    brier = F.col("__se__").cast("double") / (nn * F.lit(float(m * m)))

    def _q(c):
        return F.floor(c * om + F.lit(0.5)) / om

    return agg.select(
        *gb,
        "n",
        "n_pos",
        _q(ece).alias("ece"),
        _q(F.col("__mce__")).alias("mce"),
        _q(brier).alias("brier"),
    )


def brier_decomposition(
    df: DataFrame,
    label: str,
    score: str,
    n_bins: int = 10,
    scale: int = 6,
    term_scale: int = 15,
    out_scale: int = 6,
) -> DataFrame:
    """Murphy decomposition of the Brier score (Murphy 1973) — the
    ATTRIBUTION layer the calibration lane lacked:
    :func:`calibration_report` says HOW BAD (ECE/MCE/Brier as
    scalars); this says WHY, splitting the Brier score into

        BS = UNC + REL − RES + WBV

    where UNC = ō(1−ō) is the irreducible base-rate uncertainty,
    REL = (1/N)Σ_b n_b(p̄_b − ō_b)² the calibration error (forecast
    says 0.9, bin observes 0.7 — drives REL up), RES =
    (1/N)Σ_b n_b(ō_b − ō)² the resolution (how much the forecast
    SEPARATES outcomes — the only term a better model can GROW), and
    WBV the within-bin forecast variance the binning hides. A model
    gate reads it as: is my Brier bad because the world is noisy
    (UNC), because I'm miscalibrated (REL — recalibration fixes it),
    or because I can't discriminate (low RES — recalibration can't)?

    Determinism: the :func:`_binned_scores` contract (unit
    quantization, integer-exact bin index), then per-bin exact int
    sums (n_b, Σy, Σu, Σu², Σu·y) in decimal(38,0); the raw Brier
    folds from the exact integer identity Σ(u − y·10^s)² =
    Σu² − 2·10^s·Σuy + 10^{2s}·Σy; REL/RES per-bin quotient terms
    quantize to ``10^term_scale`` units before summing (the
    order-independent dsum discipline — the squared deviations ride
    exact ints cast to double ONCE, so both engines square identical
    doubles). ``within_bin_var`` is the closed residual
    BS − UNC − REL + RES = WBV − 2·WBCov (within-bin forecast
    variance minus TWICE the within-bin forecast/outcome covariance)
    — it is NOT non-negative: whenever forecasts discriminate inside
    a bin (outcomes co-vary with forecasts within the bin, e.g. one
    bin holding (0.21, y=0) and (0.39, y=1)), the covariance term
    dominates and the residual goes negative. Near zero it reads as
    "the binning hides little"; large |residual| of either sign says
    the bins are too coarse (round-13 advice #3 correction).

    Scale shape: ONE map-side-combining aggregate over the row volume
    produces ≤ n_bins rows; everything after is bounded (one ≤n_bins
    regroup + two broadcast attaches). Returns one row ``(n, n_pos,
    brier, uncertainty, reliability, resolution, within_bin_var)``.

    Caching contract: this function ``persist(MEMORY_AND_DISK)``-s a
    bounded intermediate that feeds multiple plan branches and does
    NOT unpersist it (the result is lazy; unpersisting before the
    caller's action would void the cache). The handle is attached to
    the result as ``unpersist_handles`` (core.cache.hold); release it
    with ``dataframes_jl_spark.release(result)`` once the result is
    consumed (or session-wide ``spark.catalog.clearCache()``).
    """
    from pyspark import StorageLevel

    m = 10**scale
    dec = "decimal(38,0)"
    # persist the ≤n_bins-row table: it feeds the totals AND the term
    # fold — unpersisted, the row-volume binned aggregate re-runs per
    # branch (the scan fan-out rule). Caller/clearCache unpersists.
    per_b = (
        _binned_scores(
            df, label, score, [], n_bins, scale, "brier_decomposition"
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("nb"),
            F.sum("y").alias("sy"),
            F.sum(F.col("u").cast(dec)).alias("su"),
            F.sum(F.col("u").cast(dec) * F.col("u").cast(dec)).alias(
                "su2"
            ),
            F.sum(F.col("u").cast(dec) * F.col("y").cast(dec)).alias(
                "suy"
            ),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tot = per_b.agg(
        F.sum("nb").alias("n"),
        F.sum("sy").alias("n_pos"),
        F.sum("su2").alias("tsu2"),
        F.sum("suy").alias("tsuy"),
    )
    tm = F.lit(float(10**term_scale))
    md = F.lit(float(m))
    nbd = F.col("nb").cast("double")
    nd = F.col("n").cast("double")
    # REL term: (Σu − 10^s·Σy)² / n_b — deviation exact in decimal,
    # cast to double once, squared as ONE IEEE multiply
    d_rel = (
        F.col("su") - F.lit(m).cast(dec) * F.col("sy").cast(dec)
    ).cast("double")
    t_rel = F.floor(d_rel * d_rel / nbd + F.lit(0.5)).cast(dec)
    # RES term: (Σy·N − n_pos·n_b)² / (n_b·N²), scaled by 10^ts
    d_res = (
        F.col("sy").cast(dec) * F.col("n").cast(dec)
        - F.col("n_pos").cast(dec) * F.col("nb").cast(dec)
    ).cast("double")
    t_res = F.floor(
        d_res * d_res / (nbd * nd * nd) * tm + F.lit(0.5)
    ).cast(dec)
    folded = (
        per_b.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(t_rel).alias("s_rel"),
            F.sum(t_res).alias("s_res"),
            F.max("n").alias("n"),
            F.max("n_pos").alias("n_pos"),
            F.max("tsu2").alias("tsu2"),
            F.max("tsuy").alias("tsuy"),
        )
    )
    n_d = F.col("n").cast("double")
    y_d = F.col("n_pos").cast("double")
    m2 = F.lit(float(m) * float(m))
    brier = (
        F.col("tsu2")
        - F.lit(2 * m).cast(dec) * F.col("tsuy")
        + F.lit(m).cast(dec) * F.lit(m).cast(dec)
        * F.col("n_pos").cast(dec)
    ).cast("double") / (n_d * m2)
    rate = y_d / n_d
    unc = rate * (F.lit(1.0) - rate)
    rel = F.col("s_rel").cast("double") / (n_d * m2)
    res = F.col("s_res").cast("double") / (n_d * tm)
    wbv = brier - unc - rel + res
    om = F.lit(float(10**out_scale))

    def _q(c):
        return F.when(
            F.col("n") > 0, F.floor(c * om + F.lit(0.5)) / om
        )

    from ..core.cache import hold

    return hold(
        folded.select(
            "n",
            F.col("n_pos").cast("long").alias("n_pos"),
            _q(brier).alias("brier"),
            _q(unc).alias("uncertainty"),
            _q(rel).alias("reliability"),
            _q(res).alias("resolution"),
            _q(wbv).alias("within_bin_var"),
        ),
        per_b,
    )


def cliffs_delta(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    out_scale: int = 6,
) -> DataFrame:
    """Cliff's delta between two frames' ``col`` distributions — the
    nonparametric EFFECT SIZE that answers the question
    :func:`mann_whitney_u`'s z-score does not: at 100 TB every
    difference is "significant", so gates must threshold on HOW LARGE
    the dominance is, not whether it exists.

    ``δ = P(a > b) − P(a < b)`` over random cross pairs, which is the
    rank-sum identity ``δ = 2U_a/(n_a·n_b) − 1`` — so this reuses
    mann_whitney_u's exact per-VALUE doubled-midrank path verbatim
    (ties get 1/2-credit automatically) and pays one extra projection:
    no new shuffle, no pair enumeration. Returns one row
    ``(n_a, n_b, delta, magnitude)`` with the standard Romano bands
    (|δ| < .147 negligible / < .33 small / < .474 medium / else
    large); delta NULL when either side is empty.
    """
    r = mann_whitney_u(df_a, df_b, col, out_scale=out_scale)
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    # u_stat is exact (possibly k + 1/2 under odd tie runs)
    delta = F.lit(2.0) * F.col("u_stat") / (na * nb) - F.lit(1.0)
    om = F.lit(float(10**out_scale))
    dq = F.floor(delta * om + F.lit(0.5)) / om
    ad = F.abs(dq)
    return r.select(
        "n_a",
        "n_b",
        F.when((F.col("n_a") > 0) & (F.col("n_b") > 0), dq).alias("delta"),
        F.when(
            (F.col("n_a") <= 0) | (F.col("n_b") <= 0), F.lit(None)
        )
        .when(ad < 0.147, F.lit("negligible"))
        .when(ad < 0.33, F.lit("small"))
        .when(ad < 0.474, F.lit("medium"))
        .otherwise(F.lit("large"))
        .alias("magnitude"),
    )


def bh_fdr(
    df: DataFrame,
    p_col: str,
    id_col: str,
    by: Sequence[str] = (),
    out_scale: int = 6,
) -> DataFrame:
    """Benjamini-Hochberg step-up FDR adjustment — the multiple-testing
    control every wide screen needs (per-segment A/B sweeps, per-brand
    drift tests, per-feature importance p-values): rank the m
    hypotheses by ascending p, then
    ``p_adj(i) = min_{j >= i} p(j)·m/j`` capped at 1, so rejecting
    ``p_adj <= q`` bounds the expected false-discovery fraction by q.

    Beyond-reference statistics operator (same justification as the
    AUC family). Plan shape: one aggregate for the per-group test
    count m (broadcast back), ranks via a per-group window when
    grouped — a p-value table is bounded by the hypothesis count, and
    grouped screens shard across groups — or via the range-partitioned
    global_row_number when ungrouped (never a SinglePartition window);
    the step-up "min of my own and every later raw value" is ONE
    running-min prefix scan over descending rank. No stage touches
    more than the hypothesis table.

    Determinism: raw values ``p·m/rank`` floor-quantize to
    ``out_scale`` BEFORE the running min (min over already-quantized
    int64 units — order-stable in any engine); ties in p break on
    ``id_col``. NULL or out-of-[0,1] p-values raise in-plan.

    Returns ``(*by, id_col, p_col, rank, p_adj)``, one row per input
    hypothesis.
    """
    from ..ops.sorting import global_row_number
    from ..ops.window import with_running

    gb = list(by)
    p = F.col(p_col).cast("double")
    pchk = F.when((p >= 0.0) & (p <= 1.0), p).otherwise(
        F.raise_error(F.lit(f"bh_fdr: {p_col} must be in [0, 1]"))
    )
    base = df.filter(F.col(id_col).isNotNull()).select(
        *gb, F.col(id_col).alias("__id__"), pchk.alias("__p__")
    )
    counts = base.groupBy(*gb).agg(F.count(F.lit(1)).alias("__m__"))
    if gb:
        from pyspark.sql import Window

        keyed = base.join(F.broadcast(counts), gb)
        rank = F.row_number().over(
            Window.partitionBy(*gb).orderBy(F.col("__p__"), F.col("__id__"))
        )
        ranked = keyed.withColumn("__rank__", rank.cast("long"))
    else:
        keyed = base.crossJoin(F.broadcast(counts))
        ranked = global_row_number(
            keyed, ["__p__", "__id__"], col_name="__rank__"
        )
    om = F.lit(float(10**out_scale))
    raw = F.least(
        F.floor(
            F.col("__p__")
            * F.col("__m__").cast("double")
            / F.col("__rank__").cast("double")
            * om
            + F.lit(0.5)
        ).cast("long"),
        F.lit(10**out_scale),
    )
    staged = ranked.select(
        *gb,
        "__id__",
        "__p__",
        "__rank__",
        (-F.col("__rank__")).alias("__rev__"),
        raw.alias("__raw__"),
    )
    run = with_running(
        staged,
        {"__minraw__": ("min", "__raw__")},
        order_by="__rev__",
        partition_by=gb if gb else None,
    )
    return run.select(
        *gb,
        F.col("__id__").alias(id_col),
        F.col("__p__").alias(p_col),
        F.col("__rank__").alias("rank"),
        (F.col("__minraw__").cast("double") / om).alias("p_adj"),
    )


def kruskal_wallis(
    df: DataFrame,
    value_col: str,
    group_col: str,
    out_scale: int = 6,
) -> DataFrame:
    """Kruskal-Wallis H test — mann_whitney_u's k-group extension: "do
    any of these k segments draw from a different distribution?", the
    one-shot screen a per-segment metric sweep runs BEFORE pairwise
    tests (k segments would need k(k-1)/2 U tests and an FDR pass;
    H asks the omnibus question in one statistic with k-1 degrees of
    freedom — compare to the chi-square table, e.g. 5.991 for k=3 at
    alpha=0.05).

    Beyond-reference statistics operator. EXACT integer path with
    ties, same machinery as mann_whitney_u: rows collapse to
    per-(group, value) counts, pooled midranks come from ONE
    ungrouped with_running prefix scan over the bounded per-VALUE
    table (doubled units so tie-midranks stay integral), per-group
    doubled rank sums are exact decimal(38,0), and only the final
    k-row fold divides:

        H = 12/(N(N+1)) · Σ_j R_j²/n_j − 3(N+1),
        H_adj = H / (1 − Σ(t³−t)/(N³−N))   (tie correction)

    Returns one row ``(n_groups, n, h, h_adj)``; ``h_adj`` is NULL
    when every value ties (zero variance — no test).
    """
    from ..ops.window import with_running

    per_gv = (
        df.select(
            F.col(group_col).cast("string").alias("g"),
            F.col(value_col).cast("double").alias("v"),
        )
        .filter(F.col("v").isNotNull() & F.col("g").isNotNull())
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_v = per_gv.groupBy("v").agg(F.sum("c").alias("cnt"))
    run = with_running(per_v, {"cum": ("sum", "cnt")}, order_by="v")
    two_mid = (
        F.lit(2) * (F.col("cum") - F.col("cnt")) + F.col("cnt") + F.lit(1)
    )
    dec = "decimal(38,0)"
    ranked = per_gv.join(
        run.select("v", two_mid.alias("tm"), "cnt"), "v"
    )
    per_g = ranked.groupBy("g").agg(
        F.sum("c").alias("nj"),
        F.sum(F.col("c").cast(dec) * F.col("tm").cast(dec)).alias("two_r"),
    )
    ties = run.agg(
        F.sum(
            F.col("cnt").cast(dec) * F.col("cnt").cast(dec)
            * F.col("cnt").cast(dec)
            - F.col("cnt").cast(dec)
        ).alias("tie_sum")
    )
    om = F.lit(float(10**out_scale))

    def _q(c):
        return F.floor(c * om + F.lit(0.5)) / om

    # bounded k-row fold: every sum below is over |groups| rows
    agg = per_g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("nj").alias("n"),
        F.sum(
            F.col("two_r").cast("double")
            * F.col("two_r").cast("double")
            / F.col("nj").cast("double")
        ).alias("s4"),  # 4 * sum Rj^2/nj
    ).crossJoin(F.broadcast(ties))
    nd = F.col("n").cast("double")
    h = (
        F.lit(12.0) / (nd * (nd + F.lit(1.0))) * (F.col("s4") / F.lit(4.0))
        - F.lit(3.0) * (nd + F.lit(1.0))
    )
    corr = F.lit(1.0) - F.col("tie_sum").cast("double") / (
        nd * nd * nd - nd
    )
    return agg.select(
        "n_groups",
        "n",
        _q(h).alias("h"),
        F.when(corr > 0.0, _q(h / corr)).alias("h_adj"),
    )


def anova_oneway(
    df: DataFrame,
    value_col: str,
    group_col: str,
    scale: int = 6,
    out_scale: int = 6,
) -> DataFrame:
    """One-way ANOVA across the k levels of ``group_col`` — the
    parametric sibling of :func:`kruskal_wallis`: "did the MEAN move
    in any segment?", reported two ways because pipeline segments
    never share a variance:

    - classic Fisher F on k-1 / N-k degrees of freedom (pooled
      variance — the textbook decomposition, plus ``eta_sq`` =
      SSB/SST so the caller sees effect size, not just significance);
    - Welch's F (Welch 1951) with Welch-Satterthwaite denominator
      df — the heteroscedasticity-robust form, the k-group extension
      of :func:`welch_ttest` and the one to trust when group sizes
      and spreads differ.

    Determinism: rows quantize to ``10^scale`` units once; each group
    reduces to exact (n, Σq int64, Σq² decimal(38,0)); every F is
    then +,-,*,/ over those exact integers (correctly-rounded IEEE,
    bit-identical across engines) and floor-quantized on output.

    Scale shape: ONE map-side-combining per-group aggregate is the
    only row-volume job; both statistics fold over the bounded k-row
    group table (classic F from Σ-identities: SSW = Σ_j(Σq²_j −
    (Σq_j)²/n_j), SSB = Σ_j(Σq_j)²/n_j − (Σq)²/N — no second pass,
    no join back). Returns one row ``(n_groups, n, f_stat, df_between,
    df_within, eta_sq, welch_f, welch_df)``; F columns are NULL when
    a denominator degenerates (k < 2, N ≤ k, or zero within-variance).
    The Welch columns use k_w = |Welch-eligible groups| (n_j > 1 and
    positive variance) in every (k−1)/(k−2)/(k²−1) term — groups that
    drop out of the weight sums also drop out of the dfs — and are
    NULL when k_w < 2.
    """
    m = F.lit(float(10**scale))
    dec = "decimal(38,0)"
    q = F.floor(F.col(value_col).cast("double") * m + F.lit(0.5)).cast(
        "long"
    )
    per_g = (
        df.filter(
            F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
        )
        .select(F.col(group_col).cast("string").alias("g"), q.alias("q"))
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("nj"),
            F.sum("q").alias("sj"),
            F.sum(F.col("q").cast(dec) * F.col("q").cast(dec)).alias(
                "ssj"
            ),
        )
    )
    njd = F.col("nj").cast("double")
    sjd = F.col("sj").cast("double")
    mean_j = sjd / njd
    # per-group sample variance in QUANTIZED units (exact-int inputs)
    var_j = (F.col("ssj").cast("double") - sjd * sjd / njd) / (
        njd - F.lit(1.0)
    )
    # Welch weight n_j/s_j² — defined only where the group has a
    # variance at all (n_j > 1 guards the (n_j−1) divide in BOTH
    # engines; DuckDB and Spark disagree on double x/0)
    w_ok = (njd > F.lit(1.0)) & (var_j > 0)
    w_j = F.when(w_ok, njd / var_j)
    # bounded k-row fold: every sum below is over |groups| rows
    agg = per_g.agg(
        F.count(F.lit(1)).alias("k"),
        # Welch-eligible group count: groups with n_j=1 or zero
        # variance drop out of every w_j sum, so the Welch dfs must
        # count only the groups that actually contribute (using the
        # full k here silently mixes two different k's — the
        # round-11 ADVICE finding)
        F.sum(F.when(w_ok, F.lit(1)).otherwise(F.lit(0))).alias("kw"),
        F.sum("nj").alias("n"),
        F.sum("sj").alias("s_tot"),
        F.sum(F.col("ssj")).alias("ss_tot"),
        F.sum(sjd * sjd / njd).alias("sb"),  # Σ (Σq_j)²/n_j
        F.sum(w_j).alias("w_sum"),
        F.sum(w_j * mean_j).alias("wm_sum"),
        F.sum(w_j * mean_j * mean_j).alias("wmm_sum"),
        # Welch df denominator needs Σ (1 − w_j/W)²/(n_j − 1) — the
        # W-dependent part folds AFTER this pass, so carry the three
        # W-free pieces: Σ 1/(n_j−1), Σ w_j/(n_j−1), Σ w_j²/(n_j−1)
        F.sum(F.when(w_ok, F.lit(1.0) / (njd - F.lit(1.0)))).alias(
            "inv_sum"
        ),
        F.sum(w_j / (njd - F.lit(1.0))).alias("winv_sum"),
        F.sum(w_j * w_j / (njd - F.lit(1.0))).alias("wwinv_sum"),
    )
    kd = F.col("k").cast("double")
    nd = F.col("n").cast("double")
    std = F.col("s_tot").cast("double")
    ssb = F.col("sb") - std * std / nd
    ssw = F.col("ss_tot").cast("double") - F.col("sb")
    sst = ssb + ssw
    f_classic = (ssb / (kd - F.lit(1.0))) / (ssw / (nd - kd))
    # Welch: F* = [Σw(m−m̄_w)²/(k−1)] / [1 + 2(k−2)/(k²−1)·Λ],
    # Λ = Σ(1−w/W)²/(n−1)/... folded from the carried W-free sums:
    # Σ(1−w/W)²/(n−1) = inv_sum − 2·winv_sum/W + wwinv_sum/W²
    wsum = F.col("w_sum")
    kwd = F.col("kw").cast("double")
    wvar = F.col("wmm_sum") - F.col("wm_sum") * F.col("wm_sum") / wsum
    lam = (
        F.col("inv_sum")
        - F.lit(2.0) * F.col("winv_sum") / wsum
        + F.col("wwinv_sum") / (wsum * wsum)
    ) / (kwd * kwd - F.lit(1.0))
    welch_f = (wvar / (kwd - F.lit(1.0))) / (
        F.lit(1.0) + F.lit(2.0) * (kwd - F.lit(2.0)) * lam
    )
    welch_df = F.lit(1.0) / (F.lit(3.0) * lam)
    om = F.lit(float(10**out_scale))

    def _q(c):
        return F.floor(c * om + F.lit(0.5)) / om

    ok = (F.col("k") > 1) & (nd > kd)
    return agg.select(
        F.col("k").alias("n_groups"),
        "n",
        F.when(ok & (ssw > 0), _q(f_classic)).alias("f_stat"),
        F.when(ok, kd - F.lit(1.0)).alias("df_between"),
        F.when(ok, nd - kd).alias("df_within"),
        F.when(ok & (sst > 0), _q(ssb / sst)).alias("eta_sq"),
        F.when(
            ok & (F.col("kw") > 1) & (wsum > 0) & (lam > 0), _q(welch_f)
        ).alias("welch_f"),
        F.when(ok & (F.col("kw") > 1) & (lam > 0), _q(welch_df)).alias(
            "welch_df"
        ),
    )


def kendall_tau_binned(
    df: DataFrame,
    x_col: str,
    y_col: str,
    x_scale: int = 2,
    y_scale: int = 2,
    out_scale: int = 6,
) -> DataFrame:
    """Kendall's tau-b between two numeric columns after quantizing
    x to ``10^x_scale`` and y to ``10^y_scale`` units — the rank-correlation lane's third
    member (cor reads linear association, cor_spearman monotone-
    via-ranks; tau reads pairwise CONCORDANCE, the probability scale
    auditors want: (C−D)/pairs is P[agree] − P[disagree]).

    Quantization is the scalability contract, not a shortcut: tau is
    invariant under strictly monotone maps, so binning only COLLAPSES
    near-ties — and tau-b's tie correction absorbs exactly that. The
    naive statistic is O(n²) pairs; over the quantized grid it is
    exact in |grid|² where |grid| is bounded by value range ×
    10^x_scale · 10^y_scale, independent of row count (pick the two
    scales — negative means coarser-than-integer buckets — so the
    grid stays ≲ 10⁴ cells; the pair join is then ≤ ~10⁸ cheap
    integer multiplies regardless of corpus size):

        C = Σ_cells n_ij · |{rows in cells strictly greater in BOTH}|
        D = Σ_cells n_ij · |{rows strictly greater in x, less in y}|
        tau_b = (C − D) / √((n0 − n1)(n0 − n2)),
        n0 = n(n−1)/2, n1 = Σ_x t(t−1)/2, n2 = Σ_y t(t−1)/2

    Scale shape: ONE map-side-combining (qx, qy) count aggregate is
    the only row-volume job; the strict-order pair counts are a
    broadcast self-join of that bounded grid (grid² cell pairs, each
    an int multiply), and the tie sums are two bounded regroups of
    the same grid. Everything up to the final divide is exact int64 /
    decimal(38,0). Returns one row ``(n, concordant, discordant,
    tau_b)``; tau_b is NULL when either margin is all-ties.
    """
    mx = F.lit(float(10**x_scale))
    my = F.lit(float(10**y_scale))
    dec = "decimal(38,0)"
    grid = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .select(
            F.floor(F.col(x_col).cast("double") * mx + F.lit(0.5))
            .cast("long")
            .alias("qx"),
            F.floor(F.col(y_col).cast("double") * my + F.lit(0.5))
            .cast("long")
            .alias("qy"),
        )
        .groupBy("qx", "qy")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    other = grid.select(
        F.col("qx").alias("px"),
        F.col("qy").alias("py"),
        F.col("c").alias("d"),
    )
    cd = F.col("c").cast(dec) * F.col("d").cast(dec)
    # all-x-in-one-bin: the px > qx join is EMPTY, so the ungrouped
    # sums would return NULL — coalesce to 0 so only tau_b is NULL in
    # the all-ties case (the documented contract; round-11 ADVICE)
    zero = F.lit(0).cast(dec)
    pairs = grid.join(
        F.broadcast(other), F.col("px") > F.col("qx"), "inner"
    ).agg(
        F.coalesce(
            F.sum(
                F.when(F.col("py") > F.col("qy"), cd).otherwise(F.lit(0))
            ).cast(dec),
            zero,
        ).alias("concordant"),
        F.coalesce(
            F.sum(
                F.when(F.col("py") < F.col("qy"), cd).otherwise(F.lit(0))
            ).cast(dec),
            zero,
        ).alias("discordant"),
    )
    c2 = F.col("t").cast(dec) * (F.col("t").cast(dec) - F.lit(1)) / F.lit(2)
    tx = (
        grid.groupBy("qx")
        .agg(F.sum("c").alias("t"))
        .agg(F.sum(c2).alias("n1"), F.sum("t").alias("n"))
    )
    ty = (
        grid.groupBy("qy")
        .agg(F.sum("c").alias("t"))
        .agg(F.sum(c2).alias("n2"))
    )
    om = F.lit(float(10**out_scale))
    joined = pairs.crossJoin(F.broadcast(tx)).crossJoin(F.broadcast(ty))
    nd = F.col("n").cast("double")
    n0 = nd * (nd - F.lit(1.0)) / F.lit(2.0)
    dx = n0 - F.col("n1").cast("double")
    dy = n0 - F.col("n2").cast("double")
    tau = (
        F.col("concordant").cast("double")
        - F.col("discordant").cast("double")
    ) / F.sqrt(dx * dy)
    return joined.select(
        "n",
        F.col("concordant").cast("long").alias("concordant"),
        F.col("discordant").cast("long").alias("discordant"),
        F.when(
            (dx > 0) & (dy > 0),
            F.floor(tau * om + F.lit(0.5)) / om,
        ).alias("tau_b"),
    )


def isotonic_calibration(
    df: DataFrame,
    label: str,
    score: str,
    group_by: Sequence[str] = (),
    n_bins: int = 20,
    scale: int = 6,
    out_scale: int = 6,
) -> DataFrame:
    """Isotonic (PAV) recalibration curve over the reliability bins —
    the lane's REPAIR step: :func:`reliability_bins` draws the
    miscalibration, :func:`calibration_report` prices it (ECE/Brier),
    and this fits the monotone map score→probability that a serving
    layer applies to FIX it (isotonic regression is the standard
    distribution-free recalibrator; Zadrozny & Elkan 2002 popularized
    it for classifier scores).

    Rather than the sequential pool-adjacent-violators sweep (a chain
    algorithm with no distributed form), the fit uses the minimax
    identity for the isotonic regression at bin i —

        iso_i = max_{j≤i} min_{k≥i} mean(y over bins j..k)

    (the classic max-min characterization of the least-squares
    monotone fit; interval means come from prefix sums, so the whole
    fit is joins + two bounded group-bys, no iteration, no driver).

    Scale shape: ONE map-side-combining (group, bin) aggregate is the
    only row-volume job (identical to reliability_bins — the
    |rows|-sized input collapses to |groups|·n_bins). The prefix
    sums ride a window over ≤ n_bins rows per group, the interval
    table is ≤ n_bins² bounded rows, and the minimax fold ≤ n_bins³
    — all broadcast-sized regardless of corpus size. Interval means
    are exact-int ratios (n_pos/n), so both engines compare identical
    doubles. Returns ``(*group_by, bin, n, n_pos, obs_rate,
    iso_rate)`` with iso_rate monotone non-decreasing in bin within
    every group.
    """
    gb = list(group_by)
    from pyspark import StorageLevel

    # four downstream branches (j-side, k-side, i-side, final join)
    # consume this bounded |groups|·n_bins table; without the persist
    # each branch re-runs the row-volume aggregate from the raw scan —
    # a 4x scan cost at 100 TB for a table of a few hundred rows.
    # Caller/clearCache owns unpersisting (the with_running contract).
    per = (
        _binned_scores(
            df, label, score, gb, n_bins, scale, "isotonic_calibration"
        )
        .groupBy(*gb, "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").alias("n_pos"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    wnd = (
        Window.partitionBy(*gb).orderBy("bin")
        if gb
        else Window.partitionBy().orderBy("bin")
    )
    # bounded window: <= n_bins rows per group ride this partition
    cum = per.select(
        *gb,
        "bin",
        "n",
        "n_pos",
        F.sum("n").over(wnd).alias("cn"),
        F.sum("n_pos").over(wnd).alias("cp"),
    )
    jside = cum.select(
        *[F.col(c).alias(f"j_{c}") for c in gb],
        F.col("bin").alias("jb"),
        (F.col("cn") - F.col("n")).alias("j_cn0"),
        (F.col("cp") - F.col("n_pos")).alias("j_cp0"),
    )
    kside = cum.select(
        *[F.col(c).alias(f"k_{c}") for c in gb],
        F.col("bin").alias("kb"),
        F.col("cn").alias("k_cn"),
        F.col("cp").alias("k_cp"),
    )
    jk_cond = F.col("jb") <= F.col("kb")
    for c in gb:
        jk_cond = jk_cond & (F.col(f"j_{c}") == F.col(f"k_{c}"))
    intervals = jside.join(F.broadcast(kside), jk_cond).select(
        *[F.col(f"j_{c}").alias(f"i_{c}") for c in gb],
        "jb",
        "kb",
        (
            (F.col("k_cp") - F.col("j_cp0")).cast("double")
            / (F.col("k_cn") - F.col("j_cn0")).cast("double")
        ).alias("avg"),
    )
    iside = per.select(
        *[F.col(c).alias(f"b_{c}") for c in gb],
        F.col("bin").alias("ib"),
    )
    i_cond = (F.col("jb") <= F.col("ib")) & (F.col("ib") <= F.col("kb"))
    for c in gb:
        i_cond = i_cond & (F.col(f"i_{c}") == F.col(f"b_{c}"))
    # n_bins^3-bounded minimax fold: min over k >= i, then max over j
    iso = (
        intervals.join(F.broadcast(iside), i_cond)
        .groupBy(*[F.col(f"b_{c}") for c in gb], "ib", "jb")
        .agg(F.min("avg").alias("mn"))
        .groupBy(*[F.col(f"b_{c}") for c in gb], "ib")
        .agg(F.max("mn").alias("iso"))
    )
    back_cond = F.col("bin") == F.col("ib")
    for c in gb:
        back_cond = back_cond & (F.col(c) == F.col(f"b_{c}"))
    om = F.lit(float(10**out_scale))

    def _q(c):
        return F.floor(c * om + F.lit(0.5)) / om

    obs = F.col("n_pos").cast("double") / F.col("n").cast("double")
    from ..core.cache import hold

    return hold(
        per.join(F.broadcast(iso), back_cond).select(
            *gb,
            "bin",
            "n",
            "n_pos",
            _q(obs).alias("obs_rate"),
            _q(F.col("iso")).alias("iso_rate"),
        ),
        per,
    )


def split_conformal(
    df: DataFrame,
    label: str,
    pred: str,
    key: str,
    alpha: float = 0.1,
    calib_frac: float = 0.5,
    buckets: int = 1000,
    scale: int = 6,
    out_scale: int = 6,
) -> DataFrame:
    """Split-conformal prediction interval for a regression column —
    the distribution-free finite-sample guarantee the eval lane's
    point metrics don't give: with NO assumption on the model or the
    errors, ``pred ± q_hat`` covers the true label with probability
    ≥ 1−alpha on exchangeable data (Vovk's split/inductive conformal;
    the modern reference treatment is Angelopoulos & Bates 2021).

    The frame splits into calibration/evaluation halves by the repo's
    leakage-safe key hash (ops.sampling.split_bucket — membership is a
    pure function of ``key``, so re-runs and appends never migrate a
    row across the split). On calibration, the nonconformity score is
    |label − pred| quantized to ``10^scale`` units (exact int64), and
    q_hat is the ⌈(n_cal+1)(1−alpha)⌉-th smallest score — an ORDER
    STATISTIC, selected exactly: per-unit counts + one range-
    partitioned prefix scan (never a SinglePartition sort), then the
    first unit whose running count reaches k. The evaluation half
    reports achieved coverage — the honesty check that the guarantee
    transferred.

    Returns one row ``(n_cal, n_test, k, q_hat, coverage)``; q_hat is
    NULL when k > n_cal (alpha too small for the calibration size —
    the interval is infinite and coverage trivially 1, reported NULL
    to flag the degenerate regime rather than hide it). An empty
    evaluation half reports n_test = 0 with coverage NULL while
    n_cal/k/q_hat stay calibration-derived (they ride the broadcast
    meta frame, not the test fold).

    Scale shape: two map-side-combining aggregates over the row volume
    (per-unit calibration counts; the evaluation fold), one bounded
    prefix scan over |distinct scores| rows, and broadcast crossJoins
    of 1-row frames. Nothing else moves.
    """
    from ..ops.sampling import split_bucket
    from ..ops.window import with_running

    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0,1), got {alpha}")
    if not 0.0 < calib_frac < 1.0:
        raise ValueError(f"calib_frac must be in (0,1), got {calib_frac}")
    m = F.lit(float(10**scale))
    r_unit = F.floor(
        F.abs(
            F.col(label).cast("double") - F.col(pred).cast("double")
        )
        * m
        + F.lit(0.5)
    ).cast("long")
    cut = int(round(calib_frac * buckets))
    base = df.filter(
        F.col(label).isNotNull() & F.col(pred).isNotNull()
    ).select(
        r_unit.alias("r"),
        (split_bucket(key, buckets) < F.lit(cut)).alias("is_cal"),
    )
    cal = (
        base.filter(F.col("is_cal"))
        .groupBy("r")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    run = with_running(cal, {"cum": ("sum", "cnt")}, order_by="r")
    tot = run.agg(F.sum("cnt").alias("n_cal"))
    k_expr = F.ceil(
        (F.col("n_cal").cast("double") + F.lit(1.0))
        * F.lit(1.0 - float(alpha))
    ).cast("long")
    tot_k = tot.select(k_expr.alias("k"), "n_cal")
    # ungrouped agg: exactly one row even when k > n_cal (empty filter
    # -> NULL min), so the degenerate regime surfaces as NULLs, never
    # as a vanished output row
    q_row = (
        run.crossJoin(F.broadcast(tot_k))
        .filter(F.col("cum") >= F.col("k"))
        .agg(F.min("r").alias("q_unit"))
    )
    meta = tot_k.crossJoin(F.broadcast(q_row))
    test = base.filter(~F.col("is_cal"))
    om = F.lit(float(10**out_scale))
    # 1-row broadcast: q_unit rides to the evaluation fold. Only the
    # TEST-side quantities come out of this aggregate — n_cal/k/q_unit
    # are re-attached from the meta frame afterwards, so an EMPTY
    # evaluation half (calib_frac ~ 1, tiny buckets) still reports the
    # calibration-derived columns instead of max-over-zero-rows NULLs
    # (the round-11 ADVICE finding)
    ev = test.crossJoin(F.broadcast(meta)).agg(
        F.count(F.lit(1)).alias("n_test"),
        F.coalesce(
            F.sum(
                F.when(F.col("r") <= F.col("q_unit"), 1).otherwise(0)
            ),
            F.lit(0),
        ).alias("n_cov"),
    )
    return meta.crossJoin(F.broadcast(ev)).select(
        "n_cal",
        "n_test",
        "k",
        (
            F.floor(
                F.col("q_unit").cast("double") / m * om + F.lit(0.5)
            )
            / om
        ).alias("q_hat"),
        F.when(
            F.col("q_unit").isNotNull() & (F.col("n_test") > 0),
            F.floor(
                F.col("n_cov").cast("double")
                / F.col("n_test").cast("double")
                * om
                + F.lit(0.5)
            )
            / om,
        ).alias("coverage"),
    )


def cronbach_alpha(
    df: DataFrame,
    items: Sequence[str],
    scale: int = 6,
    out_scale: int = 6,
) -> DataFrame:
    """Cronbach's alpha over k item columns — the internal-consistency
    coefficient (Cronbach 1951) the eval lane's agreement member
    kappa_agreement doesn't cover: kappa asks "do two RATERS agree?",
    alpha asks "do k ITEMS measure one underlying thing?" (rubric
    criteria, multi-judge scores, survey batteries):

        alpha = k/(k−1) · (1 − Σ_i var(item_i) / var(Σ_i item_i))

    Rows with ANY null item are dropped (the classic complete-case
    contract — a partial response has no total score). Returns one
    row ``(n, k, item_var_sum, total_var, alpha)``; alpha is NULL
    when n < 2 or the total variance is 0 (constant scores — no
    consistency to measure).

    Determinism: each item quantizes to ``10^scale`` int64 units
    once; the single aggregate carries per-item (Σq, Σq²) and the
    row-total (Σt, Σt²) as exact int64/decimal(38,0), so every
    variance is a correctly-rounded expression over exact integers.

    Scale shape: ONE map-side-combining aggregate with 2k+3 sums to
    a single row — no join, no window, no second pass.
    """
    ks = list(items)
    if len(ks) < 2:
        raise ValueError("cronbach_alpha needs >= 2 items")
    m = F.lit(float(10**scale))
    dec = "decimal(38,0)"
    keep = None
    for c in ks:
        cond = F.col(c).isNotNull()
        keep = cond if keep is None else (keep & cond)
    qs = [
        F.floor(F.col(c).cast("double") * m + F.lit(0.5))
        .cast("long")
        .alias(f"q{i}")
        for i, c in enumerate(ks)
    ]
    base = df.filter(keep).select(*qs)
    t = None
    for i in range(len(ks)):
        t = F.col(f"q{i}") if t is None else t + F.col(f"q{i}")
    base = base.select("*", t.alias("qt"))
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(len(ks)):
        aggs.append(F.sum(f"q{i}").alias(f"s{i}"))
        aggs.append(
            F.sum(
                F.col(f"q{i}").cast(dec) * F.col(f"q{i}").cast(dec)
            ).alias(f"ss{i}")
        )
    aggs.append(F.sum("qt").alias("st"))
    aggs.append(
        F.sum(F.col("qt").cast(dec) * F.col("qt").cast(dec)).alias("sst")
    )
    agg = base.agg(*aggs)
    n = F.col("n").cast("double")

    def var(s, ss):
        sd = F.col(s).cast("double")
        return (F.col(ss).cast("double") - sd * sd / n) / (n - F.lit(1.0))

    item_var = None
    for i in range(len(ks)):
        v = var(f"s{i}", f"ss{i}")
        item_var = v if item_var is None else item_var + v
    tot_var = var("st", "sst")
    kk = float(len(ks))
    alpha = F.lit(kk / (kk - 1.0)) * (F.lit(1.0) - item_var / tot_var)
    om = F.lit(float(10**out_scale))
    m2 = m * m

    def _q(c):
        return F.floor(c * om + F.lit(0.5)) / om

    ok = (F.col("n") > 1) & (tot_var > 0)
    return agg.select(
        "n",
        F.lit(len(ks)).alias("k"),
        F.when(F.col("n") > 1, _q(item_var / m2)).alias("item_var_sum"),
        F.when(F.col("n") > 1, _q(tot_var / m2)).alias("total_var"),
        F.when(ok, _q(alpha)).alias("alpha"),
    )


def cochran_armitage(
    df: DataFrame,
    success: str,
    group_col: str,
    scores: dict | None = None,
    out_scale: int = 6,
) -> DataFrame:
    """Cochran-Armitage trend test: is a binary rate MONOTONE in an
    ORDERED factor? The question between q_wilson_ci (one proportion
    per level) and q_anova (unordered omnibus): dose-response, tier-
    conversion, priority-SLA — "does the rate climb with the level?",
    one Z for the whole ladder (Cochran 1954, Armitage 1955):

        T = Σ_i w_i (x_i − n_i·p̄)
        Var(T) = p̄(1−p̄) · [Σ n_i w_i² − (Σ n_i w_i)²/N]
        Z = T / √Var(T)

    ``scores`` maps level → integer weight w_i (the level order);
    unmapped levels are EXCLUDED (an unordered level has no place on
    a trend axis). Returns one row ``(n, n_levels, t_stat, var_t,
    z)``; z is NULL when the pooled rate is degenerate (p̄ ∈ {0,1})
    or the score spread is zero.

    Determinism: per-level (n_i, x_i) are exact int64 from ONE
    map-side-combining aggregate; with integer scores, T·N and the
    bracket are exact integer folds over the bounded level table —
    only the final standardization divides.

    Scale shape: one aggregate pass, one bounded k-row fold. Nothing
    else moves.
    """
    if not scores:
        raise ValueError("cochran_armitage needs a level -> score map")
    w = F.lit(None).cast("long")
    expr = None
    for lvl, sc in scores.items():
        cond = F.col(group_col) == F.lit(lvl)
        expr = (
            F.when(cond, F.lit(int(sc)))
            if expr is None
            else expr.when(cond, F.lit(int(sc)))
        )
    w = expr.otherwise(F.lit(None).cast("long"))
    y = F.col(success).cast("long")
    ychk = F.when(y.isin(0, 1), y).otherwise(
        F.raise_error(
            F.lit("cochran_armitage: success column must be 0/1")
        )
    )
    base = (
        df.filter(F.col(success).isNotNull())
        .select(w.alias("w"), ychk.alias("y"))
        .filter(F.col("w").isNotNull())
    )
    per = base.groupBy("w").agg(
        F.count(F.lit(1)).alias("ni"),
        F.sum("y").alias("xi"),
    )
    dec = "decimal(38,0)"
    # bounded k-row fold: every sum below is over |levels| rows
    agg = per.agg(
        F.count(F.lit(1)).alias("n_levels"),
        F.sum("ni").alias("n"),
        F.sum("xi").alias("x"),
        F.sum(F.col("w").cast(dec) * F.col("xi").cast(dec)).alias("swx"),
        F.sum(F.col("w").cast(dec) * F.col("ni").cast(dec)).alias("swn"),
        F.sum(
            F.col("w").cast(dec)
            * F.col("w").cast(dec)
            * F.col("ni").cast(dec)
        ).alias("swwn"),
    )
    nd = F.col("n").cast("double")
    pbar = F.col("x").cast("double") / nd
    # T = Σ w x_i − p̄ Σ w n_i  (exact ints before the p̄ multiply)
    t = F.col("swx").cast("double") - pbar * F.col("swn").cast("double")
    bracket = F.col("swwn").cast("double") - F.col("swn").cast(
        "double"
    ) * F.col("swn").cast("double") / nd
    var_t = pbar * (F.lit(1.0) - pbar) * bracket
    om = F.lit(float(10**out_scale))

    def _q(c):
        return F.floor(c * om + F.lit(0.5)) / om

    return agg.select(
        "n",
        "n_levels",
        _q(t).alias("t_stat"),
        _q(var_t).alias("var_t"),
        F.when(var_t > 0, _q(t / F.sqrt(var_t))).alias("z"),
    )


def friedman_test(
    df: DataFrame,
    item_cols: Sequence[str],
    scale: int = 6,
    out_scale: int = 6,
) -> DataFrame:
    """Friedman rank test + Kendall's W over k treatment columns —
    the PAIRED k-sample member of the rank lane: kruskal_wallis asks
    "do k independent segments differ?", Friedman asks "do k
    treatments differ WITHIN blocks?" (each row is one block — a
    user, a query, a prompt — scored under every treatment), and
    Kendall's W = chi2_F/(n(k−1)) restates the same evidence as a
    0..1 concordance ("how strongly do the blocks agree on the
    ranking?"), the k-rater generalization of the agreement lane.

        chi2_F = [12/(n·k·(k+1)) · Σ_j R_j² − 3·n·(k+1)] / C,
        C = 1 − Σ_blocks Σ_t (t³−t) / (n·k·(k²−1))   (tie correction)

    Within-block midranks are computed PER ROW over the k-element
    value array — 2·rank = 2·|{less}| + |{equal incl. self}| + 1 via
    array filters, O(k²) codegen'd comparisons per row, no window, no
    shuffle beyond whatever built the block rows. Doubled ranks stay
    integral under ties; R_j sums and the tie term accumulate exact
    int64/decimal, and only the final normalizations divide. Rows
    with any NULL item drop (a block must score every treatment).

    Returns one row ``(n_blocks, k, chi2_f, w)``; NULL statistics
    when every block is all-ties (C ≤ 0 — no ranking information).
    """
    ks = list(item_cols)
    k = len(ks)
    if k < 2:
        raise ValueError("friedman_test needs >= 2 treatment columns")
    m = F.lit(float(10**scale))
    keep = None
    for c in ks:
        cond = F.col(c).isNotNull()
        keep = cond if keep is None else (keep & cond)
    arr = F.array(
        *[
            F.floor(F.col(c).cast("double") * m + F.lit(0.5)).cast(
                "long"
            )
            for c in ks
        ]
    )
    base = df.filter(keep).select(arr.alias("a"))

    # closure factories: a `lambda y, j=j` would have TWO parameters,
    # which pyspark's higher-order-function bridge interprets as the
    # (element, index) signature — j silently becomes the array index
    def _lt(j):
        return lambda y: y < F.col("a")[j]

    def _eq(j):
        return lambda y: y == F.col("a")[j]

    # doubled midrank of element j within its block's k-array
    dr = [
        F.lit(2) * F.size(F.filter(F.col("a"), _lt(j)))
        + F.size(F.filter(F.col("a"), _eq(j)))
        + F.lit(1)
        for j in range(k)
    ]
    # per-block tie term Σ_t (t³−t) = Σ_positions (e²−1)
    tie = F.aggregate(
        F.transform(
            F.col("a"),
            lambda x: F.size(F.filter(F.col("a"), lambda y: y == x))
            * F.size(F.filter(F.col("a"), lambda y: y == x))
            - F.lit(1),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    ranked = base.select(
        *[dr[j].cast("long").alias(f"d{j}") for j in range(k)],
        tie.cast("long").alias("tie"),
    )
    dec = "decimal(38,0)"
    aggs = [F.count(F.lit(1)).alias("n"), F.sum("tie").alias("tt")]
    for j in range(k):
        aggs.append(F.sum(F.col(f"d{j}").cast(dec)).alias(f"r{j}"))
    agg = ranked.agg(*aggs)
    nd = F.col("n").cast("double")
    kd = F.lit(float(k))
    # Σ R_j² from doubled sums: R_j = r_j/2 exactly
    srr = None
    for j in range(k):
        rj = F.col(f"r{j}").cast("double") / F.lit(2.0)
        srr = rj * rj if srr is None else srr + rj * rj
    chi_raw = (
        F.lit(12.0) / (nd * kd * (kd + F.lit(1.0))) * srr
        - F.lit(3.0) * nd * (kd + F.lit(1.0))
    )
    corr = F.lit(1.0) - F.col("tt").cast("double") / (
        nd * kd * (kd * kd - F.lit(1.0))
    )
    om = F.lit(float(10**out_scale))

    def _q(c):
        return F.floor(c * om + F.lit(0.5)) / om

    chi = chi_raw / corr
    return agg.select(
        F.col("n").alias("n_blocks"),
        F.lit(k).alias("k"),
        F.when(corr > 0, _q(chi)).alias("chi2_f"),
        F.when(
            corr > 0, _q(chi / (nd * (kd - F.lit(1.0))))
        ).alias("w"),
    )


def cuped_adjust(
    df: DataFrame,
    metric: str,
    covariate: str,
    variant_col: str,
    scale: int = 4,
    out_scale: int = 6,
) -> DataFrame:
    """CUPED-adjusted per-variant means (Deng, Xu, Kohavi & Walker
    2013) — the industry-standard A/B variance reduction: regress the
    metric on a pre-experiment covariate ONCE across all arms,

        theta = cov(X, Y) / var(X),
        Y_adj = Y − theta · (X − X̄_pooled),

    and compare arms on Y_adj — the adjustment is mean-preserving per
    arm up to the covariate imbalance it corrects, and shrinks metric
    variance by the squared correlation (var_ratio = 1 − ρ², also
    reported: the fraction of variance the covariate buys back,
    i.e. how much smaller the experiment could have been).

    Completes q_ab_test / q_welch_ttest's lane: those price the raw
    gap; CUPED is the production step BEFORE them.

    Determinism: X and Y quantize to int64 units once; pooled
    (n, Σx, Σy, Σxy, Σx², Σy²) come from ONE map-side-combining
    aggregate (decimals for the products) and per-variant (n, Σx, Σy)
    from a second keyed one; theta, rho², and every adjusted mean are
    then correctly-rounded expressions over exact integers, and the
    pooled 1-row frame broadcasts onto the bounded |variants| table.

    Returns one row per variant: ``(variant, n, mean_raw, mean_adj,
    theta, var_ratio)`` (theta/var_ratio repeated per row — the
    pooled fit). NULL theta/mean_adj when var(X) = 0.
    """
    m = F.lit(float(10**scale))
    dec = "decimal(38,0)"
    qx = F.floor(F.col(covariate).cast("double") * m + F.lit(0.5)).cast(
        "long"
    )
    qy = F.floor(F.col(metric).cast("double") * m + F.lit(0.5)).cast(
        "long"
    )
    base = df.filter(
        F.col(metric).isNotNull()
        & F.col(covariate).isNotNull()
        & F.col(variant_col).isNotNull()
    ).select(
        F.col(variant_col).cast("string").alias("variant"),
        qx.alias("qx"),
        qy.alias("qy"),
    )
    pooled = base.agg(
        F.count(F.lit(1)).alias("np"),
        F.sum("qx").alias("sx"),
        F.sum("qy").alias("sy"),
        F.sum(F.col("qx").cast(dec) * F.col("qy").cast(dec)).alias("sxy"),
        F.sum(F.col("qx").cast(dec) * F.col("qx").cast(dec)).alias("sxx"),
        F.sum(F.col("qy").cast(dec) * F.col("qy").cast(dec)).alias("syy"),
    )
    per_v = base.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qx").alias("vx"),
        F.sum("qy").alias("vy"),
    )
    j = per_v.crossJoin(F.broadcast(pooled))
    npd = F.col("np").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    cov_xy = F.col("sxy").cast("double") - sxd * syd / npd
    var_x = F.col("sxx").cast("double") - sxd * sxd / npd
    var_y = F.col("syy").cast("double") - syd * syd / npd
    theta = cov_xy / var_x
    rho2 = cov_xy * cov_xy / (var_x * var_y)
    nd = F.col("n").cast("double")
    mean_raw = F.col("vy").cast("double") / nd / m
    mean_adj = (
        F.col("vy").cast("double")
        - theta * (F.col("vx").cast("double") - sxd / npd * nd)
    ) / nd / m
    om = F.lit(float(10**out_scale))

    def _q(c):
        return F.floor(c * om + F.lit(0.5)) / om

    ok = var_x > 0
    return j.select(
        "variant",
        "n",
        _q(mean_raw).alias("mean_raw"),
        F.when(ok, _q(mean_adj)).alias("mean_adj"),
        F.when(ok, _q(theta)).alias("theta"),
        F.when(
            ok & (var_y > 0), _q(F.lit(1.0) - rho2)
        ).alias("var_ratio"),
    )


def brown_forsythe(
    df: DataFrame,
    value_col: str,
    group_col: str,
    scale: int = 6,
    out_scale: int = 6,
) -> DataFrame:
    """Brown-Forsythe test for equal VARIANCES across the k levels of
    ``group_col`` — the missing premise-check of the omnibus lane:
    :func:`anova_oneway` asks "did the mean move?" (and its Welch arm
    assumes the variances differ), :func:`kruskal_wallis` asks it in
    ranks; this asks whether the SPREADS themselves differ (Levene
    1960's test with Brown & Forsythe 1974's median centering — the
    robust form every stats package defaults to). The statistic is
    the one-way ANOVA F computed on the absolute deviations from the
    group MEDIAN:

        z_ij = |x_ij − med_j|,   F = [Σ n_j (z̄_j − z̄)²/(k−1)] /
                                     [Σ (z_ij − z̄_j)²/(N−k)]

    Determinism, exactly: values quantize to ``10^scale`` int64 units
    and collapse to per-(group, value) counts; each group's median
    comes from the SAME grouped prefix scan the rank tests use — as
    med2_j = u_(⌈n/2⌉) + u_(⌊n/2+1⌋), TWICE the interpolated median,
    an exact integer — so the deviations z' = |2u − med2_j| = 2z are
    exact int64 and F (scale-invariant in z) folds from exact
    (n_j, Σz', Σz'²) sums, decimal(38,0) for the squares. Both
    engines divide identical integers.

    Scale shape: ONE map-side-combining (group, value) count is the
    only row-volume job; the prefix scan and the median pick run over
    the bounded |group × distinct values| table; the bounded k-row
    median frame joins BACK onto that same per-value table
    (co-partitioned on group, broadcast-sized), and the final fold is
    one aggregate over it. Returns one row ``(n_groups, n, f_stat,
    df_between, df_within)``; f_stat is NULL when k < 2, N ≤ k, or
    the pooled within-spread is zero.
    """
    from ..ops.window import with_running

    m = F.lit(float(10**scale))
    q = F.floor(F.col(value_col).cast("double") * m + F.lit(0.5)).cast(
        "long"
    )
    per_v = (
        df.filter(
            F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
        )
        .select(F.col(group_col).cast("string").alias("g"), q.alias("u"))
        .groupBy("g", "u")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    run = with_running(
        per_v, {"cum": ("sum", "c")}, order_by="u", partition_by=["g"]
    )
    tot = per_v.groupBy("g").agg(F.sum("c").alias("n"))
    # order-statistic picks: k1 = ceil(n/2), k2 = floor(n/2) + 1 — for
    # odd n both hit the middle value, for even n the two central ones
    j = run.join(tot, "g")
    k1 = F.ceil(F.col("n").cast("double") / F.lit(2.0)).cast("long")
    k2 = F.floor(F.col("n") / F.lit(2)) + F.lit(1)
    med2 = (
        j.groupBy("g")
        .agg(
            F.min(F.when(F.col("cum") >= k1, F.col("u"))).alias("m1"),
            F.min(F.when(F.col("cum") >= k2, F.col("u"))).alias("m2"),
        )
        .select("g", (F.col("m1") + F.col("m2")).alias("med2"))
    )
    dec = "decimal(38,0)"
    z = F.abs(F.lit(2) * F.col("u") - F.col("med2"))
    per_g = (
        per_v.join(med2, "g")
        .select("g", "c", z.alias("z"))
        .groupBy("g")
        .agg(
            F.sum("c").alias("nj"),
            F.sum(F.col("c") * F.col("z")).alias("sj"),
            F.sum(
                F.col("c").cast(dec) * F.col("z").cast(dec)
                * F.col("z").cast(dec)
            ).alias("ssj"),
        )
    )
    njd = F.col("nj").cast("double")
    sjd = F.col("sj").cast("double")
    agg = per_g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("nj").alias("n"),
        F.sum("sj").alias("s_tot"),
        F.sum(F.col("ssj")).alias("ss_tot"),
        F.sum(sjd * sjd / njd).alias("sb"),
    )
    kd = F.col("k").cast("double")
    nd = F.col("n").cast("double")
    std = F.col("s_tot").cast("double")
    ssb = F.col("sb") - std * std / nd
    ssw = F.col("ss_tot").cast("double") - F.col("sb")
    f_stat = (ssb / (kd - F.lit(1.0))) / (ssw / (nd - kd))
    om = F.lit(float(10**out_scale))
    ok = (F.col("k") > 1) & (nd > kd)
    return agg.select(
        F.col("k").alias("n_groups"),
        "n",
        F.when(
            ok & (ssw > 0), F.floor(f_stat * om + F.lit(0.5)) / om
        ).alias("f_stat"),
        F.when(ok, kd - F.lit(1.0)).alias("df_between"),
        F.when(ok, nd - kd).alias("df_within"),
    )


def mood_median_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
    scale: int = 6,
    term_scale: int = 15,
    out_scale: int = 6,
) -> DataFrame:
    """Mood's median test across the k levels of ``group_col`` — the
    LOCATION sibling of :func:`brown_forsythe` in the omnibus lane's
    robust corner: ANOVA compares means (moment-fragile),
    Kruskal-Wallis compares rank sums (needs full rank machinery);
    Mood's test (Mood 1950) asks only "does each group straddle the
    POOLED median the way chance would?" — a 2×k chi-square on the
    counts above vs not-above the grand median, the heaviest-tail-
    proof location test there is and the one that survives arbitrary
    monotone transforms of the value.

    Statistic, exactly: with ``a_g`` = count above the pooled lower
    median, ``n_g`` group sizes, ``A = Σa_g``, ``N = Σn_g``,

        chi² = N·(Σ_g a_g²/(n_g·A) + Σ_g (n_g−a_g)²/(n_g·(N−A))) − N

    (the Σo²/e − N identity, so empty cells need no special-casing),
    df = k−1. Determinism: values quantize to ``10^scale`` int64
    units and collapse to per-(group, value) counts; the pooled
    median is an exact order statistic off ONE range-partitioned
    prefix scan (smallest u with 2·cum ≥ N — never SinglePartition);
    each group's two quotient terms quantize to ``10^term_scale``
    int64 units before summing (the dsum discipline: int64 sums are
    order-independent, double sums are not), and both engines fold
    identical integers. chi² is NULL when k < 2 or the median
    degenerates (A = 0 or A = N — every value on one side).

    Scale shape: ONE map-side-combining (group, value) count is the
    only row-volume job; the prefix scan runs over the bounded
    |distinct values| table, the median is a 1-row broadcast onto the
    bounded per-(group, value) table, and two bounded k-row
    aggregates finish. Returns one row
    ``(n_groups, n, n_above, grand_median, chi2, dof)``.

    Caching contract: this function ``persist(MEMORY_AND_DISK)``-s a
    bounded intermediate that feeds multiple plan branches and does
    NOT unpersist it (the result is lazy; unpersisting before the
    caller's action would void the cache). The handle is attached to
    the result as ``unpersist_handles`` (core.cache.hold); release it
    with ``dataframes_jl_spark.release(result)`` once the result is
    consumed (or session-wide ``spark.catalog.clearCache()``).
    """
    from ..ops.window import with_running

    m = F.lit(float(10**scale))
    q = F.floor(F.col(value_col).cast("double") * m + F.lit(0.5)).cast(
        "long"
    )
    from pyspark import StorageLevel

    # persist the bounded |group × distinct values| table: it feeds
    # the pooled prefix scan, the totals, AND the per-group straddle
    # counts — unpersisted, the row-volume count re-runs per branch
    # (the scan fan-out rule). Caller/clearCache owns unpersisting.
    per_v = (
        df.filter(
            F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
        )
        .select(F.col(group_col).cast("string").alias("g"), q.alias("u"))
        .groupBy("g", "u")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pooled = per_v.groupBy("u").agg(F.sum("c").alias("c"))
    run = with_running(pooled, {"cum": ("sum", "c")}, order_by="u")
    tot = pooled.agg(F.sum("c").alias("n_tot"))
    med = (
        run.crossJoin(F.broadcast(tot))
        .filter(F.lit(2) * F.col("cum") >= F.col("n_tot"))
        .agg(F.min("u").alias("med_u"))
    )
    per_g = (
        per_v.crossJoin(F.broadcast(med))
        .groupBy("g")
        .agg(
            F.sum("c").alias("ng"),
            F.coalesce(
                F.sum(F.when(F.col("u") > F.col("med_u"), F.col("c"))),
                F.lit(0),
            ).alias("ag"),
        )
    )
    tm = F.lit(float(10**term_scale))
    # per-group quotient terms need the grand totals. r15 attached
    # them by crossJoin(broadcast(totals)) and re-aggregated — two
    # 1-row aggregates and a broadcast join in sequence (guide §2.1:
    # fewest stages). r16 folds ONCE: the totals AND the k-bounded
    # (ng, ag) rows ride the same aggregate (collect_list over k =
    # |group levels| rows — bounded small by the test's contract), and
    # the quantized quotient terms fold in a projection via
    # F.aggregate. Arithmetic per term is bit-identical (same doubles,
    # same floor-to-int64 before the order-independent integer sum).
    ad = F.col("a_tot").cast("double")
    nd = F.col("n").cast("double")

    def _term_sum(num_fn):
        zero = F.lit(0).cast("long")
        return F.aggregate(
            F.col("rows"),
            zero,
            lambda acc, x: acc
            + F.floor(num_fn(x) * tm + F.lit(0.5)).cast("long"),
        )

    def _t1(x):
        agx = x["ag"].cast("double")
        ngx = x["ng"].cast("double")
        return agx * agx / (ngx * ad)

    def _t2(x):
        bgx = (x["ng"] - x["ag"]).cast("double")
        ngx = x["ng"].cast("double")
        return bgx * bgx / (ngx * (nd - ad))

    folded = per_g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ng").alias("n"),
        F.sum("ag").alias("a_tot"),
        F.collect_list(F.struct(F.col("ng"), F.col("ag"))).alias("rows"),
    ).select(
        "k",
        "n",
        "a_tot",
        _term_sum(_t1).alias("s1"),
        _term_sum(_t2).alias("s2"),
    )
    chi2 = (
        F.col("n").cast("double")
        * (F.col("s1") + F.col("s2")).cast("double")
        / tm
        - F.col("n").cast("double")
    )
    om = F.lit(float(10**out_scale))
    ok = (
        (F.col("k") > 1)
        & (F.col("a_tot") > 0)
        & (F.col("a_tot") < F.col("n"))
    )
    from ..core.cache import hold

    return hold(
        folded.crossJoin(F.broadcast(med)).select(
            F.col("k").alias("n_groups"),
            "n",
            F.col("a_tot").alias("n_above"),
            (F.col("med_u").cast("double") / m).alias("grand_median"),
            F.when(ok, F.floor(chi2 * om + F.lit(0.5)) / om).alias(
                "chi2"
            ),
            (F.col("k") - F.lit(1)).cast("long").alias("dof"),
        ),
        per_v,
        run,
    )
