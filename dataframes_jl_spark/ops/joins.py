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

from pyspark.sql import DataFrame
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
