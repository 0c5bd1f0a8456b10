"""Window-function equivalents of the reference's cumulative and
lag-based vector ops (SURVEY §2.5; reference src/operators.jl:58-60).

All take an explicit ordering (and optional partitioning): Spark tables
are unordered, so "cumulative over the frame's row order" must name the
order. Partitioned windows scale (state per key, no global sort);
unpartitioned ones plan a single-partition exchange — fine for
notebook-size frames, documented as the cost of positional semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _window(order_by, partition_by=None) -> WindowSpec:
    order_by = [order_by] if isinstance(order_by, (str, Column)) else list(order_by)
    if partition_by:
        partition_by = (
            [partition_by] if isinstance(partition_by, str) else list(partition_by)
        )
        return Window.partitionBy(*partition_by).orderBy(*order_by)
    return Window.orderBy(*order_by)


def _running(w: WindowSpec) -> WindowSpec:
    return w.rowsBetween(Window.unboundedPreceding, Window.currentRow)


def cumsum(col, order_by, partition_by=None) -> Column:
    """cumsum (reference src/operators.jl:60)."""
    return F.sum(col).over(_running(_window(order_by, partition_by)))


def cummax(col, order_by, partition_by=None) -> Column:
    return F.max(col).over(_running(_window(order_by, partition_by)))


def cummin(col, order_by, partition_by=None) -> Column:
    return F.min(col).over(_running(_window(order_by, partition_by)))


def cumprod(col, order_by, partition_by=None) -> Column:
    """cumprod via exp∘cumsum∘log with sign tracking (no native product
    window aggregate; stays JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    w = _running(_window(order_by, partition_by))
    log_mag = F.sum(F.log(F.abs(c))).over(w)
    n_neg = F.sum(F.when(c < 0, 1).otherwise(0)).over(w)
    any_zero = F.max(F.when(c == 0, 1).otherwise(0)).over(w)
    sign = F.when(n_neg % 2 == 1, -1.0).otherwise(1.0)
    return F.when(any_zero == 1, F.lit(0.0)).otherwise(sign * F.exp(log_mag))


def diff(col, order_by, partition_by=None) -> Column:
    """diff: col - lag(col) (reference src/operators.jl:58)."""
    c = F.col(col) if isinstance(col, str) else col
    w = _window(order_by, partition_by)
    return c - F.lag(c).over(w)


def reldiff(col, order_by, partition_by=None) -> Column:
    """reldiff: (col - lag)/lag (reference src/operators.jl:58)."""
    c = F.col(col) if isinstance(col, str) else col
    w = _window(order_by, partition_by)
    prev = F.lag(c).over(w)
    return (c - prev) / prev


def percent_change(col, order_by, partition_by=None) -> Column:
    """percent_change (reference export src/DataFrames.jl:121)."""
    return reldiff(col, order_by, partition_by) * 100.0


def rolling_window(
    order_by,
    preceding: int,
    following: int = 0,
    partition_by=None,
) -> WindowSpec:
    """RANGE-frame window over a NUMERIC ordering expression (e.g.
    microsecond epoch): frame = rows whose key lies in
    ``[current - preceding, current + following]``, boundary-inclusive,
    ties (peers) always included — the time-series rolling frame.

    Partitioned use scales: Spark keeps one sliding aggregate state per
    partition key inside the window exec, so cost is O(rows) after the
    partition shuffle — no per-frame rescan. An unpartitioned rolling
    window plans a SinglePartition sort; require an explicit opt-in by
    passing partition_by=None knowingly (documented, as with the other
    positional ops).
    """
    w = _window(order_by, partition_by)
    return w.rangeBetween(-int(preceding), int(following))


def rolling_stats(
    df: DataFrame,
    value_col: str,
    time_col: str,
    partition_by,
    width_seconds: int,
    scale: int = 4,
) -> DataFrame:
    """Rolling count/sum/mean/std/min/max of ``value_col`` over a
    trailing ``width_seconds`` event-time window per partition key.

    Determinism contract: sum and sum-of-squares are accumulated as
    QUANTIZED int64 (floor(x*10^scale+0.5)) so window-accumulation
    order cannot move the low bits; mean/std are then derived with one
    fixed double-arithmetic shape that an oracle engine can replicate
    op-for-op. |x|*10^scale and the frame totals must fit int64 —
    callers with larger magnitudes lower ``scale``.
    """
    m = float(10**scale)
    key = F.unix_micros(F.col(time_col))
    w = rolling_window(key, width_seconds * 1_000_000, 0, partition_by)
    q = F.floor(F.col(value_col) * F.lit(m) + F.lit(0.5)).cast("long")
    n = F.count(F.lit(1)).over(w)
    s = F.sum(q).over(w)
    sq = F.sum(q * q).over(w)
    mean = s.cast("double") / n / F.lit(m)
    # var = (sum(x^2) - sum(x)^2/n) / (n-1), in original units
    var = (
        sq.cast("double") / F.lit(m * m)
        - (s.cast("double") / F.lit(m)) * (s.cast("double") / F.lit(m)) / n
    ) / (n - F.lit(1))
    return df.select(
        *[c for c in df.columns],
        n.alias("roll_n"),
        (s.cast("double") / F.lit(m)).alias("roll_sum"),
        F.round(mean, 6).alias("roll_mean"),
        F.when(n > 1, F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 6)).alias(
            "roll_std"
        ),
        F.min(value_col).over(w).alias("roll_min"),
        F.max(value_col).over(w).alias("roll_max"),
    )


def ewma(
    df: DataFrame,
    value_col: str,
    time_col: str,
    partition_by: str,
    alpha: float,
    tiebreak: Sequence[str] = (),
    max_group_rows: int = 5_000_000,
) -> DataFrame:
    """Exponentially-weighted moving average of ``value_col`` per
    partition key in ``time_col`` order (pandas ``ewm(adjust=True)``
    semantics: y_i = sum_j (1-alpha)^(i-j) x_j / sum_j (1-alpha)^(i-j)).

    EWMA is a per-row recursion — not expressible with Spark's window
    frames without an overflow-prone (1-alpha)^(-j) rescaling — so this
    is the documented Pandas-UDF path: groups ship as Arrow batches,
    each computed by pandas' C kernel. ``applyInPandas`` materializes
    one GROUP per pandas frame, so the partition key must be
    fine-grained (a user/session/entity id, never a constant);
    ``max_group_rows`` fails loudly before an executor OOMs silently.

    The batch cross-check for this operator is q_ewma: the final EWMA
    per key must match the closed-form weighted sum computed
    independently (by the DuckDB oracle and by hand) to 6 decimals.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    from pyspark.sql.types import DoubleType, StructField, StructType

    # StructType.add mutates in place — never call it on df.schema
    schema = StructType(
        list(df.schema.fields) + [StructField("ewma", DoubleType())]
    )
    sort_cols = [time_col, *tiebreak]

    def _fn(pdf):
        if len(pdf) > max_group_rows:
            raise ValueError(
                f"ewma group exceeds max_group_rows={max_group_rows} "
                f"({len(pdf)} rows): partition key too coarse for the "
                "per-group pandas path"
            )
        pdf = pdf.sort_values(sort_cols)
        pdf["ewma"] = pdf[value_col].ewm(alpha=alpha, adjust=True).mean()
        return pdf

    return df.groupBy(partition_by).applyInPandas(_fn, schema)
