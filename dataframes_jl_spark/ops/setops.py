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

from pyspark.sql import DataFrame, Window
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
    """cbind/hcat by row position via row-id zip (SURVEY §2.7). The
    explicit global row_number is only correct/affordable at notebook
    scale; at cluster scale prefer a real join key."""
    names = make_unique([*df1.columns, *df2.columns])
    n1 = names[: len(df1.columns)]
    n2 = names[len(df1.columns):]

    def with_rid(df):
        w = Window.orderBy(F.monotonically_increasing_id())
        return df.withColumn("__rid__", F.row_number().over(w))

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
