"""Reshaping: stack/melt, unstack, pivot_table, cut, paste
(reference src/reshape.jl, src/extras.jl).

The reference's lazy reshape views (StackedVector/RepeatedVector,
src/reshape.jl:117-226) need no analog: the generated ``stack`` SQL
expression is lazy in the Spark plan and never materializes the long
form until an action runs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stack(
    df: DataFrame,
    measure_vars: Sequence[str],
    id_vars: Sequence[str] | None = None,
    variable_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """stack(df, measure_vars, id_vars) wide→long (reference
    src/reshape.jl:16-24): one output row per (row, measure) pair with
    ``variable``/``value`` columns. Uses the SQL ``stack`` generator —
    no shuffle, runs inside whole-stage codegen."""
    id_vars = list(id_vars) if id_vars is not None else [
        c for c in df.columns if c not in measure_vars
    ]
    # promote measures to a common type for the single value column
    types = dict(df.dtypes)
    target = "double" if any(
        types[m] in ("int", "bigint", "float", "double") for m in measure_vars
    ) else "string"
    pairs = ", ".join(f"'{m}', CAST(`{m}` AS {target})" for m in measure_vars)
    expr = (
        f"stack({len(measure_vars)}, {pairs}) AS (`{variable_name}`, `{value_name}`)"
    )
    return df.selectExpr(*[f"`{c}`" for c in id_vars], expr)


def melt(
    df: DataFrame,
    id_vars: Sequence[str],
    measure_vars: Sequence[str] | None = None,
    **kw,
) -> DataFrame:
    """melt(df, id_vars[, measure_vars]) (reference src/reshape.jl:26-27):
    complement-of-ids stack."""
    if measure_vars is None:
        measure_vars = [c for c in df.columns if c not in id_vars]
    return stack(df, measure_vars, id_vars, **kw)


def unstack(
    df: DataFrame,
    rowkey: str | Sequence[str],
    colkey: str,
    value: str,
    colkey_values: Sequence[str] | None = None,
) -> DataFrame:
    """unstack(df, rowkey, colkey, value) long→wide (reference
    src/reshape.jl:35-63). Reference warns + last-write-wins on
    duplicates; ``F.last`` preserves that. Pass ``colkey_values`` to skip
    the extra distinct scan Spark otherwise runs to discover pivot
    columns (always pass it at scale)."""
    rowkey = [rowkey] if isinstance(rowkey, str) else list(rowkey)
    gd = df.groupBy(*rowkey)
    piv = gd.pivot(colkey, list(colkey_values)) if colkey_values else gd.pivot(colkey)
    return piv.agg(F.last(value))


def pivot_table(
    df: DataFrame,
    rows: str | Sequence[str],
    cols: str | Sequence[str],
    value: str,
    fun: str = "mean",
    colkey_values: Sequence[str] | None = None,
) -> DataFrame:
    """pivot_table(df, rows, cols, value, fun) (reference
    src/reshape.jl:78-103): group by rows×cols, aggregate, pivot.
    Multi-column colkeys are paste-joined with '_' exactly like the
    reference (src/reshape.jl:84-88)."""
    from .grouping import AGG_FUNCS

    rows = [rows] if isinstance(rows, str) else list(rows)
    cols = [cols] if isinstance(cols, str) else list(cols)
    colkey = F.concat_ws("_", *[F.col(c).cast("string") for c in cols])
    agg = AGG_FUNCS[fun](value)
    gd = df.withColumn("__colkey__", colkey).groupBy(*rows)
    piv = (
        gd.pivot("__colkey__", list(colkey_values))
        if colkey_values
        else gd.pivot("__colkey__")
    )
    return piv.agg(agg)


def cut(col: str | Column, breaks: Sequence[float]) -> Column:
    """cut(x, breaks) → interval-label factor column (reference export
    src/DataFrames.jl:78, tested test/extras.jl:17-33). Labels formatted
    ``(lo,hi]`` matching the reference; values outside the break range →
    NULL. Chained F.when — stays in codegen, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    expr = F.lit(None).cast("string")
    # build from the last interval backwards so firsts win naturally
    for lo, hi in reversed(list(zip(breaks[:-1], breaks[1:]))):
        label = f"({_fmt(lo)},{_fmt(hi)}]"
        expr = F.when((c > lo) & (c <= hi), F.lit(label)).otherwise(expr)
    return expr


def _fmt(x: float) -> str:
    return str(int(x)) if float(x).is_integer() else str(x)


def paste_columns(df: DataFrame, sep: str = "_", cols: Sequence[str] | None = None) -> Column:
    """paste_columns(d, sep) row-wise string-join (reference
    src/extras.jl:32-44) → concat_ws."""
    cols = cols if cols is not None else df.columns
    return F.concat_ws(sep, *[F.col(c).cast("string") for c in cols])


def crosstab(df: DataFrame, c1: str, c2: str) -> DataFrame:
    """xtab/xtabs/table (reference exports src/DataFrames.jl:153,162-163,
    impl vestigial) → native stat.crosstab."""
    return df.stat.crosstab(c1, c2)


def collapse_rare(
    df: DataFrame,
    col: str,
    min_count: int,
    other=None,
):
    """Long-tail category hygiene: replace every level of ``col`` whose
    GLOBAL occurrence count is below ``min_count`` with the ``other``
    sentinel (same type as the column — e.g. ``-1`` for ids, ``"OTHER"``
    for strings). The standard pre-encoding step before one-hot /
    embedding feature builds, and a k-anonymity coarsener.

    Plan: one map-side-combining distinct-with-counts aggregate
    (|levels| rows move, never |rows|), filtered to the KEEP set, then
    a broadcast-friendly left join marks survivors — at 100 TB the
    keep set is bounded by |levels above threshold|, which min_count
    itself caps at n/min_count entries. NULL levels pass through as
    NULL (they are "missing", not "rare").
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    keep = (
        df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("__lvl__"))
        .agg(F.count(F.lit(1)).alias("__n__"))
        .filter(F.col("__n__") >= min_count)
        .select("__lvl__", F.lit(True).alias("__keep__"))
    )
    j = df.join(
        F.broadcast(keep), df[col] == keep["__lvl__"], "left"
    )
    replaced = (
        F.when(F.col(col).isNull(), F.col(col))
        .when(F.col("__keep__"), F.col(col))
        .otherwise(F.lit(other))
        .alias(col)
    )
    return j.select(
        *[replaced if c == col else F.col(c) for c in df.columns]
    )
