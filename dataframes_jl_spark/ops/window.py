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
