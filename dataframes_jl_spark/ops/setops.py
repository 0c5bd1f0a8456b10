"""Concatenation and set operations (reference src/dataframe.jl:1006-1131).

- ``vcat`` row-bind with union-by-name and NA-fill for missing columns
  (reference src/dataframe.jl:1098-1131) — exactly Spark
  ``unionByName(allowMissingColumns=True)``; column type promotion
  (reference vecbind_type src/dataframe.jl:1045-1096) is handled by
  casting to the common Spark type first.
- ``hcat`` column-bind by row position (reference src/dataframe.jl:1006-1021)
  — requires a row-id zip; duplicate names uniquified ``name_1``.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.index import make_unique

_PROMOTE = {
    ("bigint", "double"): "double",
    ("int", "double"): "double",
    ("int", "bigint"): "bigint",
    ("float", "double"): "double",
    ("boolean", "string"): "string",
    ("bigint", "string"): "string",
    ("double", "string"): "string",
}


def _common_type(a: str, b: str) -> str:
    if a == b:
        return a
    return _PROMOTE.get((a, b)) or _PROMOTE.get((b, a)) or "string"


def vcat(*dfs: DataFrame) -> DataFrame:
    """rbind/vcat union-by-name with NA fill + type promotion."""
    if len(dfs) == 1:
        return dfs[0]
    # compute promoted type per column name across all frames
    types: dict[str, str] = {}
    for df in dfs:
        for c, t in df.dtypes:
            types[c] = _common_type(types[c], t) if c in types else t
    casted = []
    for df in dfs:
        cur = dict(df.dtypes)
        sel = df
        for c, t in cur.items():
            if types[c] != t:
                sel = sel.withColumn(c, F.col(c).cast(types[c]))
        casted.append(sel)
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), casted
    )


def hcat(df1: DataFrame, df2: DataFrame) -> DataFrame:
    """cbind/hcat by row position via row-id zip (SURVEY §2.7).

    Row position is taken in each frame's current (partition-major)
    order via ``global_row_number`` over ``monotonically_increasing_id``
    — a range-partitioned rank, NOT a single-partition window, so the
    zip scales; the join on ``__rid__`` is then an ordinary shuffle
    join. Positional zip is still semantically fragile after shuffling
    ops — prefer a real join key when one exists."""
    names = make_unique([*df1.columns, *df2.columns])
    n1 = names[: len(df1.columns)]
    n2 = names[len(df1.columns):]

    def with_rid(df):
        from .sorting import global_row_number

        tmp = df.withColumn("__mono__", F.monotonically_increasing_id())
        return global_row_number(tmp, cols=["__mono__"], col_name="__rid__").drop(
            "__mono__"
        )

    a = with_rid(df1.toDF(*n1))
    b = with_rid(df2.toDF(*n2))
    return (
        a.join(b, on="__rid__", how="outer")
        .orderBy("__rid__")
        .drop("__rid__")
        .select(*names)
    )


def intersect_rows(df1: DataFrame, df2: DataFrame) -> DataFrame:
    """Row intersection (not in reference; free in Spark, SURVEY §2.7)."""
    return df1.intersect(df2)


def except_rows(df1: DataFrame, df2: DataFrame) -> DataFrame:
    """Row difference with multiplicity (exceptAll)."""
    return df1.exceptAll(df2)


def isequal_df(df1: DataFrame, df2: DataFrame) -> bool:
    """isequal(df1, df2) column-wise deep equality (reference
    src/operators.jl:202-212): same columns and same multiset of rows,
    checked distributively via two exceptAll probes."""
    if df1.columns != df2.columns:
        return False
    return df1.exceptAll(df2).isEmpty() and df2.exceptAll(df1).isEmpty()
