"""Split-apply-combine (reference src/grouping.jl).

The reference splits eagerly (pooled composite key + counting sort →
GroupedDataFrame, src/grouping.jl:22-50) and applies Julia closures per
group. Spark-first mapping:

- scalar-result aggregation → ``groupBy().agg()`` (hash aggregate with
  map-side partial aggregation — the reference's two-phase distributed
  ``by`` at src/dataframe_blocks.jl:583-587 is what Spark does
  automatically);
- whole-partition transforms keeping all rows → window functions;
- arbitrary Python per-group functions (UDAF/UDTF-like, possibly
  multi-row results, reference map(f, gd) src/grouping.jl:120-126 and
  based_on multi-row at :186-192) → ``applyInPandas`` with declared or
  sampled-inferred schema.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, GroupedData
from pyspark.sql import functions as F

def _stable_mean(c: str) -> Column:
    """Order-independent mean: exact decimal summation, then one double
    division. A plain F.avg accumulates doubles in partition order, so its
    low bits (and a rounded digit at a .xx5 boundary) vary run-to-run;
    the decimal sum is exact and the double->decimal cast is tie-free."""
    col = F.col(c)
    return (F.sum(col.cast("decimal(18,6)")).cast("double") / F.count(col))


def _prod(c: str) -> Column:
    """Group product via exp-sum-log with an explicit zero guard: log(0)
    would be NULL (skipped by SUM), silently dropping the zero factor.
    Zeros are mapped to log(1)=0 per-row (also keeps ANSI mode happy),
    and the whole result is forced to 0 when any zero is present."""
    col = F.col(c)
    a = F.abs(col)
    safe_log = F.log(F.when(a == 0, F.lit(1.0)).otherwise(a))
    magnitude = F.exp(F.sum(safe_log))
    sign = F.when(
        F.sum(F.when(col < 0, 1).otherwise(0)) % 2 == 1, -1.0
    ).otherwise(1.0)
    return F.when(F.min(a) == 0, F.lit(0.0)).otherwise(magnitude * sign)


AGG_FUNCS: dict[str, Callable[[str], Column]] = {
    "sum": F.sum,
    "mean": _stable_mean,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "std": F.stddev_samp,
    "var": F.var_samp,
    "median": F.median,
    "first": F.first,
    "last": F.last,
    "prod": _prod,
    "skewness": F.skewness,
    "kurtosis": F.kurtosis,
}


def groupby(df: DataFrame, cols: str | Sequence[str]) -> GroupedData:
    """groupby(df, cols) (reference src/grouping.jl:22-50). NULL keys form
    their own group in both engines (§1.4.3 — semantics already match)."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    return df.groupBy(*cols)


def by(
    df: DataFrame,
    cols: str | Sequence[str],
    agg: dict[str, Column] | Callable | None = None,
    schema: str | None = None,
) -> DataFrame:
    """by(df, cols, f|ex) one-shot groupby+apply (reference
    src/grouping.jl:248-262).

    ``agg`` as dict name→Column expression → native aggregation.
    ``agg`` as callable pandas.DataFrame→pandas.DataFrame → applyInPandas
    (schema required, or inferred by running the function on a sampled
    group — the reference's promote-on-first-result behavior,
    src/grouping.jl:186-192).
    """
    cols = [cols] if isinstance(cols, str) else list(cols)
    gd = df.groupBy(*cols)
    if agg is None:
        return gd.count()
    if isinstance(agg, dict):
        return gd.agg(*[c.alias(n) for n, c in agg.items()])
    if callable(agg):
        if schema is None:
            schema = _infer_apply_schema(df, cols, agg)
        return gd.applyInPandas(_wrap_keyed(agg, cols), schema=schema)
    raise TypeError("agg must be dict[str, Column] or callable")


def _wrap_keyed(fn, cols):
    """Replicate group keys onto the result rows (reference combine
    src/grouping.jl:151-158): key columns are prepended if the user
    function didn't emit them."""

    def wrapped(key, pdf):
        out = fn(pdf)
        for i, c in enumerate(cols):
            if c not in out.columns:
                out.insert(i, c, key[i])
        return out

    return wrapped


def _infer_apply_schema(df: DataFrame, cols, fn, sample_rows: int = 1024) -> str:
    """Sample one group locally, run fn, derive the Spark schema from the
    resulting pandas frame (SURVEY §7 hard part #4).

    Inference sees only a ``sample_rows`` PREFIX of the sampled group:
    a skewed first group could otherwise materialize millions of rows
    on the driver just to learn column dtypes. A fn whose OUTPUT dtypes
    depend on seeing the whole group (rare; e.g. an all-NULL column in
    the prefix inferring differently) should pass ``schema=``
    explicitly — the gated queries all do."""
    first = df.limit(1).collect()
    if not first:
        raise ValueError("cannot infer schema from an empty DataFrame")
    key = {c: first[0][c] for c in cols}
    cond = None
    for c, v in key.items():
        this = F.col(c).eqNullSafe(F.lit(v))
        cond = this if cond is None else (cond & this)
    sample = df.filter(cond).limit(sample_rows).toPandas()
    out = fn(sample)
    parts = []
    for c in cols:
        if c not in out.columns:
            parts.append(f"{c} {dict(df.dtypes)[c]}")
    import pandas.api.types as pt

    for c in out.columns:
        d = out[c].dtype
        if pt.is_integer_dtype(d):
            t = "bigint"
        elif pt.is_float_dtype(d):
            t = "double"
        elif pt.is_bool_dtype(d):
            t = "boolean"
        elif pt.is_datetime64_any_dtype(d):
            t = "timestamp"
        else:
            t = "string"
        parts.append(f"{c} {t}")
    return ", ".join(parts)


def colwise(
    df: DataFrame,
    fns: str | Sequence[str],
    cols: Sequence[str] | None = None,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """colwise(fns, df|gd) (reference src/grouping.jl:202-245): apply each
    named aggregate to each column; result names ``{col}_{fn}`` matching
    the reference's header scheme (src/grouping.jl:213)."""
    fns = [fns] if isinstance(fns, str) else list(fns)
    if cols is None:
        numeric = {"int", "bigint", "double", "float", "smallint", "tinyint"}
        cols = [c for c, t in df.dtypes if t in numeric and c not in (group_cols or [])]
    exprs = []
    for c in cols:
        for fname in fns:
            if fname not in AGG_FUNCS:
                raise KeyError(f"unknown aggregate {fname!r}")
            exprs.append(AGG_FUNCS[fname](c).alias(f"{c}_{fname}"))
    if group_cols:
        return df.groupBy(*group_cols).agg(*exprs)
    return df.agg(*exprs)
