"""NA semantics (SURVEY §1.4): the deltas between the reference's NA and
Spark NULL, shipped as both behaviors behind explicit entry points.

The reference **propagates** NA through reductions — ``sum(dv)`` is NA
if any element is NA; users opt out via ``removeNA``/``nafilter``
(reference export src/DataFrames.jl:110-115; benchmark usage
benchmarks/datavector.jl). Spark aggregates **skip** nulls. ``na_agg``
produces reference-semantics aggregates; plain ``F.sum`` etc. remain the
Spark-native mode.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def na_agg(fn: Callable[[Column], Column], col: str | Column) -> Column:
    """NA-propagating aggregate (reference semantics, §1.4.1): result is
    NULL if the column contains any NULL, else the Spark aggregate.

    Single pass: the null probe is just another partial aggregate in the
    same HashAggregate — no extra scan or shuffle.
    """
    c = F.col(col) if isinstance(col, str) else col
    has_na = F.max(F.when(c.isNull(), 1).otherwise(0)) == 1
    return F.when(has_na, F.lit(None)).otherwise(fn(c))


def nafilter(col: str | Column) -> Column:
    """removeNA/nafilter as a filter predicate (reference
    src/DataFrames.jl:110-115)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull()


def nareplace(col: str | Column, value) -> Column:
    """nareplace: NA → value (reference src/DataFrames.jl:113-115)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(value))


def any_na(col: str | Column) -> Column:
    """NA-aware tri-state any() support (reference src/operators.jl:251-277):
    TRUE if any true; NULL if no true but some NA; else FALSE."""
    c = F.col(col) if isinstance(col, str) else col
    some_true = F.max(F.when(c, 1).otherwise(0)) == 1
    some_na = F.max(F.when(c.isNull(), 1).otherwise(0)) == 1
    return F.when(some_true, F.lit(True)).otherwise(
        F.when(some_na, F.lit(None).cast("boolean")).otherwise(F.lit(False))
    )


def all_na(col: str | Column) -> Column:
    """NA-aware tri-state all() (reference src/operators.jl:251-277)."""
    c = F.col(col) if isinstance(col, str) else col
    some_false = F.max(F.when(~c, 1).otherwise(0)) == 1
    some_na = F.max(F.when(c.isNull(), 1).otherwise(0)) == 1
    return F.when(some_false, F.lit(False)).otherwise(
        F.when(some_na, F.lit(None).cast("boolean")).otherwise(F.lit(True))
    )
