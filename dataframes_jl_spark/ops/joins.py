"""Joins with the reference's semantics (reference src/merge.jl:129-165).

Differences from raw Spark ``DataFrame.join`` that this wrapper restores:

- ``on=None`` → natural join on the first common column
  (reference src/merge.jl:133-136);
- NA join keys **match each other** (reference join_idx treats the NA
  group as a real key, src/merge.jl:8,30,82-84) → ``eqNullSafe``
  conditions, toggleable via ``na_equal``;
- duplicate non-key columns are dropped from the right side
  (reference ``without(df2, on)``, src/merge.jl:142) instead of
  producing ambiguous names.

The physical algorithm (reference join_idx src/merge.jl:5-73, a
pandas-style groupsort counting-sort join) is deliberately NOT
reimplemented: Catalyst picks BroadcastHashJoin / SortMergeJoin /
ShuffledHashJoin with AQE, which is the scale-correct choice.
``broadcast_right`` force-broadcasts a small right side (the
reference's distributed merge is exactly this,
src/dataframe_blocks.jl:535-547).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_KINDS = {
    "inner": "inner",
    "left": "left",
    "right": "right",
    "outer": "full_outer",
    "semi": "left_semi",
    "anti": "left_anti",
    "cross": "cross",
}


def join(
    df1: DataFrame,
    df2: DataFrame,
    on: str | Sequence[str] | None = None,
    kind: str = "inner",
    na_equal: bool = True,
    broadcast_right: bool = False,
) -> DataFrame:
    if kind not in _KINDS:
        raise ValueError(f"unknown join kind {kind!r}; one of {sorted(_KINDS)}")
    how = _KINDS[kind]

    if kind == "cross":
        return df1.crossJoin(df2)

    if on is None:
        common = [c for c in df1.columns if c in set(df2.columns)]
        if not common:
            raise ValueError("natural join: no common columns")
        on = [common[0]]
    elif isinstance(on, str):
        on = [on]
    else:
        on = list(on)

    right = F.broadcast(df2) if broadcast_right else df2

    if not na_equal:
        return df1.join(right, on=on, how=how)

    cond = None
    for k in on:
        c = df1[k].eqNullSafe(right[k])
        cond = c if cond is None else (cond & c)
    joined = df1.join(right, on=cond, how=how)
    if kind in ("semi", "anti"):
        return joined
    # collapse the duplicated key columns: keep a coalesced single key
    # (matters for right/outer where the left key can be null), then drop
    # duplicate non-key columns from the right (reference src/merge.jl:142).
    out_cols = []
    for c in df1.columns:
        if c in on:
            out_cols.append(F.coalesce(df1[c], right[c]).alias(c))
        else:
            out_cols.append(df1[c])
    for c in df2.columns:
        if c not in on and c not in df1.columns:
            out_cols.append(right[c])
    return joined.select(*out_cols)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
    right_cols: Sequence[str] | None = None,
    suffix: str = "_matched",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """As-of (nearest-predecessor) join — not in the reference (SURVEY
    §2.3 "Not present"), added as a first-class scale operator.

    For every left row, attach the single right row with the greatest
    ``on`` value <= the left's (``direction='backward'``; ``'forward'``
    mirrors it). Left-join semantics: unmatched left rows keep nulls.

    Scale path: the classic union-merge formulation — tag both sides,
    union, and take ``last(right_payload, ignorenulls) OVER
    (PARTITION BY by ORDER BY on, tag)``. ONE shuffle on the ``by``
    keys, no per-row range probe, no broadcast requirement on either
    side; both inputs stream through a single sort-merge pass exactly
    like a sort-merge join would. With no ``by`` keys the window
    degenerates to a single partition — pass keys at scale.

    ``tolerance`` (seconds for timestamp keys, else same units as
    ``on``) nulls out matches farther than the bound, like pandas
    ``merge_asof``. ``allow_exact_matches=False`` makes the comparison
    strict.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by = [by] if isinstance(by, str) else list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by]

    l_payload = F.struct(*[F.col(c) for c in left.columns])
    r_payload = F.struct(
        F.col(on).alias("__r_on__"), *[F.col(c) for c in right_cols]
    )
    l_t = left.select(l_payload.alias("__l__")).schema[0].dataType
    r_t = right.select(r_payload.alias("__r__")).schema[0].dataType

    l_side = left.select(
        *by,
        F.col(on).alias("__on__"),
        F.lit(1).alias("__is_left__"),
        l_payload.alias("__l__"),
        F.lit(None).cast(r_t).alias("__r__"),
    )
    r_side = right.select(
        *by,
        F.col(on).alias("__on__"),
        F.lit(0).alias("__is_left__"),
        F.lit(None).cast(l_t).alias("__l__"),
        r_payload.alias("__r__"),
    )
    # at equal `on`, the right row must sort before the left row exactly
    # when exact matches are allowed — the running `last` then sees it
    tag = F.col("__is_left__").asc() if allow_exact_matches else F.col("__is_left__").desc()
    key = F.col("__on__").asc() if direction == "backward" else F.col("__on__").desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(key, tag)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        l_side.unionByName(r_side)
        .withColumn("__m__", F.last("__r__", ignorenulls=True).over(w))
        .filter(F.col("__is_left__") == 1)
    )
    if tolerance is not None:
        dt = dict(left.dtypes)[on]
        if dt.startswith("timestamp"):
            # TIMESTAMP_NTZ cannot cast to double directly; hop through
            # TIMESTAMP_LTZ (session tz pinned UTC by load_table).
            def _secs(c):
                if dt == "timestamp_ntz":
                    c = c.cast("timestamp")
                return c.cast("double")

            dist = F.abs(_secs(F.col("__on__")) - _secs(F.col("__m__.__r_on__")))
        else:
            dist = F.abs(F.col("__on__") - F.col("__m__.__r_on__"))
        matched = matched.withColumn(
            "__m__", F.when(dist <= F.lit(float(tolerance)), F.col("__m__"))
        )
    taken = set(left.columns)
    out = [F.col(f"__l__.{c}").alias(c) for c in left.columns]
    out.append(F.col("__m__.__r_on__").alias(on + suffix))
    for c in right_cols:
        name = c + suffix if c in taken else c
        out.append(F.col(f"__m__.{c}").alias(name))
    return matched.select(*out)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    keys: Sequence[str] | None = None,
    bucket_width: float | None = None,
) -> DataFrame:
    """Range/interval join: each point row pairs with every interval row
    whose ``[lo, hi]`` contains it (optionally also matching ``keys``
    equi-columns). Not in the reference (SURVEY §2.3 "Not present") —
    added because a bare inequality join plans a nested-loop at scale.

    Scale path (``bucket_width`` set): quantize the domain into
    fixed-width buckets, explode each interval to the buckets it
    overlaps (``F.sequence`` — intervals are assumed short relative to
    the width), map each point to its single bucket, and equi-join on
    ``(bucket, *keys)`` — a hash join Catalyst can shuffle or broadcast
    — then re-check exact containment. Without ``bucket_width`` the
    plain theta-join is emitted (fine when one side broadcasts).
    """
    keys = list(keys or [])
    cond_keys = [points[k] == intervals[k] for k in keys]
    contains = (points[point_col] >= intervals[lo_col]) & (
        points[point_col] <= intervals[hi_col]
    )
    if bucket_width is None:
        cond = contains
        for c in cond_keys:
            cond = cond & c
        return points.join(intervals, cond)

    wdt = F.lit(float(bucket_width))
    iv = intervals.withColumn(
        "__bucket__",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / wdt).cast("bigint"),
                F.floor(F.col(hi_col) / wdt).cast("bigint"),
            )
        ),
    )
    pt = points.withColumn(
        "__bucket__", F.floor(F.col(point_col) / wdt).cast("bigint")
    )
    return (
        pt.join(iv, on=["__bucket__", *keys], how="inner")
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("__bucket__")
    )
