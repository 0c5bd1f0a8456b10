"""JlDataFrame — the reference's mutable, dict-like DataFrame facade over
an immutable Spark DataFrame.

The reference's ``DataFrame`` (src/dataframe.jl:3-26) is a mutable,
column-oriented table addressable by name and row position. Spark
DataFrames are immutable and unordered, so this wrapper:

- presents dict-like column access / assignment / deletion by
  **rebinding** the underlying Spark plan (mutation facade, SURVEY §4);
- keeps an :class:`Index` for name dedup + column groups;
- isolates row-position semantics (``df[3:7]``, flipud, sortperm) behind
  a lazy ``__row_id__`` column that is only materialized when a
  positional op is actually used (SURVEY §7 hard part #1).

Everything stays a lazy Spark plan; nothing collects unless the user
asks (head/tail/collect/to_pandas).
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .index import Index, clean_colname, make_unique

ROW_ID = "__row_id__"


def _is_scalar(v: Any) -> bool:
    return isinstance(v, (int, float, str, bool, bytes)) or v is None


class JlDataFrame:
    """Dict-like mutable facade (reference AbstractDataFrame <:
    Associative{String,Any}, src/dataframe.jl:1)."""

    def __init__(self, sdf: DataFrame, index: Index | None = None):
        self._sdf = sdf
        self.index = index if index is not None else Index(sdf.columns)
        if self.index.names != sdf.columns:
            # dedup happened — apply to the plan
            self._sdf = sdf.toDF(*self.index.names)

    # ------------------------------------------------------------------ meta
    @property
    def sdf(self) -> DataFrame:
        """The underlying Spark DataFrame (row-id column hidden)."""
        if ROW_ID in self._sdf.columns:
            return self._sdf.drop(ROW_ID)
        return self._sdf

    @property
    def colnames(self) -> list[str]:
        return [c for c in self._sdf.columns if c != ROW_ID]

    @property
    def coltypes(self) -> dict[str, str]:
        return {c: t for c, t in self._sdf.dtypes if c != ROW_ID}

    def nrow(self) -> int:
        return self._sdf.count()

    def ncol(self) -> int:
        return len(self.colnames)

    def __len__(self) -> int:
        return self.ncol()

    def __repr__(self) -> str:
        return f"JlDataFrame[{self.ncol()} cols: {', '.join(self.colnames[:8])}...]"

    def _repr_html_(self) -> str:
        """HTML MIME output (reference writemime text/html,
        src/io.jl:805-862): render the head only — never the table."""
        return self._sdf.limit(10).toPandas()._repr_html_()

    # ------------------------------------------------------------- selection
    def __getitem__(self, key):
        """df[col] → JlDataFrame of one column; df[[cols]] / df[mask] /
        df[slice] column selection; df[rows, cols] row+column subset
        (reference src/dataframe.jl:343-406)."""
        if isinstance(key, tuple) and len(key) == 2:
            rows, cols = key
            return self._subset(rows, cols)
        names = self.index.expand(key)
        return JlDataFrame(self._project(names))

    def col(self, name: str) -> Column:
        """A Spark Column for use in expressions."""
        return self._sdf[name]

    def _project(self, names: Sequence[str]) -> DataFrame:
        keep = [n for n in self._sdf.columns if n == ROW_ID]
        return self._sdf.select(*names, *keep)

    def _subset(self, rows, cols) -> "JlDataFrame":
        names = self.index.expand(cols) if cols is not None else self.colnames
        base = self
        if rows is None:
            return JlDataFrame(base._project(names))
        if isinstance(rows, Column):
            return JlDataFrame(base._sdf.filter(rows).select(*names))
        if isinstance(rows, str):
            return JlDataFrame(base._sdf.filter(F.expr(rows)).select(*names))
        # positional rows — the one place we pay for ordering
        base = base.with_row_id()
        if isinstance(rows, slice):
            start = rows.start or 0
            stop = rows.stop if rows.stop is not None else 1 << 62
            cond = (F.col(ROW_ID) >= start) & (F.col(ROW_ID) < stop)
        elif isinstance(rows, (list, tuple)) and rows and all(
            isinstance(r, bool) for r in rows
        ):
            raise TypeError(
                "bool-mask row selection by Python list does not scale; "
                "use a Column predicate"
            )
        elif isinstance(rows, (list, tuple)):
            cond = F.col(ROW_ID).isin(list(rows))
        elif isinstance(rows, int):
            cond = F.col(ROW_ID) == rows
        else:
            raise TypeError(f"unsupported row selector: {type(rows)}")
        return JlDataFrame(base._sdf.filter(cond).select(*names))

    # ------------------------------------------------------------- mutation
    def __setitem__(self, key, value) -> None:
        """Column add/replace with scalar broadcast (reference
        insert_single_column! src/dataframe.jl:440-468, upgrade_scalar
        :491-494). Rebinds the plan — O(1), lazy."""
        if _is_scalar(value):
            value = F.lit(value)
        if not isinstance(value, Column):
            raise TypeError("assign a Spark Column or a scalar")
        if isinstance(key, str):
            self._sdf = self._sdf.withColumn(key, value)
            if key not in self.index:
                self.index = Index([*self.index.names, key])
                self.index._groups = dict(self.index._groups)
        else:
            raise TypeError("column assignment key must be a name")

    def __delitem__(self, key) -> None:
        """delete!(df, col) (reference src/dataframe.jl:965-979)."""
        names = self.index.expand(key)
        self._sdf = self._sdf.drop(*names)
        g = self.index.get_groups()
        self.index = Index([n for n in self.index.names if n not in names])
        for grp, cols in g.items():
            kept = [c for c in cols if c not in names]
            if kept:
                self.index.set_group(grp, kept)

    def without(self, key) -> "JlDataFrame":
        """Non-mutating column drop (reference src/dataframe.jl:988-997)."""
        names = self.index.expand(key)
        return JlDataFrame(self._sdf.drop(*names))

    def insert(self, pos: int, name: str, value) -> "JlDataFrame":
        """insert!(df, index, item, name) (reference src/dataframe.jl:794-809)."""
        if _is_scalar(value):
            value = F.lit(value)
        cols = list(self.colnames)
        cols.insert(pos, name)
        tmp = self._sdf.withColumn(name, value)
        return JlDataFrame(tmp.select(*cols))

    def rename(self, mapping: dict[str, str]) -> "JlDataFrame":
        """rename! (reference src/index.jl:26-57)."""
        sdf = self._sdf
        for old, new in mapping.items():
            sdf = sdf.withColumnRenamed(old, new)
        return JlDataFrame(sdf, self.index.rename(mapping))

    def clean_colnames(self) -> "JlDataFrame":
        """clean_colnames! (reference src/dataframe.jl:1523-1528)."""
        return self.rename(
            {n: c for n in self.colnames if (c := clean_colname(n)) != n}
        )

    # ------------------------------------------------------- expression ops
    def filter(self, predicate) -> "JlDataFrame":
        """sub/subset/filter (reference src/dataframe.jl:932-947);
        predicate is a Spark Column or SQL string."""
        if isinstance(predicate, str):
            predicate = F.expr(predicate)
        return JlDataFrame(self._sdf.filter(predicate))

    def with_(self, expr: str) -> DataFrame:
        """with(df, ex): evaluate an expression with columns in scope
        (reference src/dataframe.jl:1372-1392). SQL-expression strings
        replace the Julia quoted-Expr DSL; Catalyst does name resolution."""
        return self._sdf.select(F.expr(expr))

    def within(self, **exprs) -> "JlDataFrame":
        """within!(df, ex): add/replace computed columns (reference
        src/dataframe.jl:1295-1330). Accepts Column or SQL string values."""
        sdf = self._sdf
        for name, e in exprs.items():
            sdf = sdf.withColumn(name, F.expr(e) if isinstance(e, str) else e)
        return JlDataFrame(sdf)

    def based_on(self, **exprs) -> "JlDataFrame":
        """based_on(df, ex): fresh frame of only the assigned columns
        (reference src/dataframe.jl:1332-1370)."""
        cols = [
            (F.expr(e) if isinstance(e, str) else e).alias(name)
            for name, e in exprs.items()
        ]
        return JlDataFrame(self._sdf.select(*cols))

    transform = within  # @transform macro sugar (reference src/dataframe.jl:1231-1249)

    # ------------------------------------------------------------- NA logic
    def complete_cases(self) -> Column:
        """Boolean Column: row has no NA in any column (reference
        src/dataframe.jl:1412-1421)."""
        cond = F.lit(True)
        for c in self.colnames:
            cond = cond & F.col(c).isNotNull()
        return cond

    def drop_incomplete(self) -> "JlDataFrame":
        """complete_cases! ≡ dropna (reference src/dataframe.jl:1419-1421)."""
        return JlDataFrame(self.sdf.dropna())

    def isna(self) -> "JlDataFrame":
        """Elementwise null mask (reference src/dataframe.jl:1485-1511)."""
        return JlDataFrame(
            self.sdf.select(*[F.col(c).isNull().alias(c) for c in self.colnames])
        )

    # ------------------------------------------------------------ row order
    def with_row_id(self) -> "JlDataFrame":
        """Attach a 0-based dense ``__row_id__`` respecting current plan
        order. Lazy positional discipline (SURVEY §7 hard part #1).

        Uses monotonically_increasing_id (partition-local, sparse) made
        dense via ops.sorting.global_row_number — a range-partitioned
        rank with per-partition offsets, NOT a single-partition window,
        so positional ops stay distributed at scale.
        """
        if ROW_ID in self._sdf.columns:
            return self
        from ..ops.sorting import global_row_number

        tmp = self._sdf.withColumn("__mono__", F.monotonically_increasing_id())
        ranked = global_row_number(tmp, cols=["__mono__"], col_name=ROW_ID)
        out = JlDataFrame.__new__(JlDataFrame)
        out._sdf = ranked.withColumn(ROW_ID, F.col(ROW_ID) - 1).drop("__mono__")
        out.index = self.index
        return out

    def head(self, n: int = 6):
        """head(df, r) (reference src/dataframe.jl:834-835)."""
        return self.sdf.limit(n)

    def tail(self, n: int = 6):
        """tail via native DataFrame.tail (reference src/dataframe.jl:836-837)."""
        import pandas as pd

        rows = self.sdf.tail(n)
        return pd.DataFrame([r.asDict() for r in rows])

    def flipud(self) -> "JlDataFrame":
        """Reverse row order (reference src/dataframe.jl:1530-1537):
        descending sort on the positional row id."""
        base = self.with_row_id()
        return JlDataFrame(
            base._sdf.orderBy(F.col(ROW_ID).desc()).drop(ROW_ID)
        )

    # ------------------------------------------------------------ materialize
    def collect(self):
        return self.sdf.collect()

    def to_pandas(self):
        return self.sdf.toPandas()

    def duplicated(self) -> "JlDataFrame":
        """Boolean marker column for duplicate rows, first-wins (reference
        duplicated src/dataframe.jl:1452-1470): row_number over all
        columns > 1."""
        base = self.with_row_id()
        w = Window.partitionBy(*self.colnames).orderBy(F.col(ROW_ID))
        return JlDataFrame(
            base._sdf.withColumn("duplicated", F.row_number().over(w) > 1)
            .orderBy(ROW_ID)
            .drop(ROW_ID)
        )

    def unique(self) -> "JlDataFrame":
        """unique/drop_duplicates! (reference src/dataframe.jl:1472-1483)."""
        return JlDataFrame(self.sdf.dropDuplicates())

    # ------------------------------------------------------------- factors
    def pool(self, cols=None) -> "JlDataFrame":
        """pool/pool! factor semantics (reference src/dataframe.jl:
        2011-2032, PooledDataArray): register the sorted distinct levels
        of the given (default: all string) columns as wrapper-level
        metadata. Spark/Parquet already dictionary-encode at rest, so
        pooling is purely the *levels registry* used for factor
        semantics (contrasts, level iteration) — a bounded distinct
        collect per column, loud error past the cap."""
        from ..formula import MAX_FACTOR_LEVELS

        if cols is None:
            cols = [c for c, t in self.coltypes.items() if t == "string"]
        elif isinstance(cols, str):
            cols = [cols]
        out = JlDataFrame(self._sdf, self.index.copy())
        out._levels = dict(getattr(self, "_levels", {}))
        for c in cols:
            rows = (
                self.sdf.select(c)
                .distinct()
                .orderBy(c)
                .limit(MAX_FACTOR_LEVELS + 1)
                .collect()
            )
            if len(rows) > MAX_FACTOR_LEVELS:
                raise ValueError(
                    f"column {c!r} has more than {MAX_FACTOR_LEVELS} "
                    "distinct levels; refusing to pool (would OOM the "
                    "driver). Bucket/hash the column instead."
                )
            out._levels[c] = [r[c] for r in rows if r[c] is not None]
        return out

    def levels(self, col: str) -> list:
        """Registered factor levels of a pooled column (reference
        levels(PooledDataArray)); raises if the column was never
        pooled."""
        lv = getattr(self, "_levels", {})
        if col not in lv:
            raise KeyError(f"column {col!r} is not pooled; call .pool()")
        return list(lv[col])

    def is_pooled(self, col: str) -> bool:
        return col in getattr(self, "_levels", {})

    def drop_unused_levels(self) -> "JlDataFrame":
        """dropUnusedLevels! (reference src/formula.jl:172-177):
        recompute every pooled column's levels from the CURRENT rows —
        after filters, stale levels would otherwise survive in the
        registry."""
        return self.pool(list(getattr(self, "_levels", {}).keys()) or [])

    # ------------------------------------------------------------ conversion
    def to_dict(self) -> dict:
        """dict(df) — name → python list (reference
        src/dataframe.jl:1982-1998). Driver materialization: head-guard
        large frames yourself; this is the notebook escape hatch."""
        pdf = self._sdf.toPandas()
        return {c: pdf[c].tolist() for c in pdf.columns}

    def to_numpy(self):
        """array/matrix(df) → dense ndarray with promoted dtype
        (reference src/dataframe.jl:1423-1450)."""
        return self._sdf.toPandas().to_numpy()

    def hash(self, order_cols=None) -> int:
        """hash(df) (reference src/dataframe.jl:1965-1971): order-
        sensitive when ``order_cols`` gives a total order (row rank is
        mixed into each row hash), order-insensitive multiset hash
        otherwise. Distributed: per-row xxhash64, one aggregation."""
        from pyspark.sql import functions as F

        df = self._sdf
        if order_cols:
            from ..ops.sorting import global_row_number

            ranked = global_row_number(df, order_cols, col_name="__rid__")
            row_h = F.xxhash64(*[F.col(c) for c in df.columns], F.col("__rid__"))
            src = ranked
        else:
            row_h = F.xxhash64(*[F.col(c) for c in df.columns])
            src = df
        out = src.select(row_h.alias("h")).agg(
            F.sum("h").alias("s"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        return hash((out.s, out.n))

    def map_rows(self, fn, schema: str) -> DataFrame:
        """map(f, EachRow(df)) per-row UDF (reference
        src/dataframe.jl:1926) — Arrow-batched mapInPandas, never
        row-at-a-time Python."""
        import pandas as pd

        def run(batches):
            for pdf in batches:
                yield pd.DataFrame([fn(row) for _, row in pdf.iterrows()])

        return self.sdf.mapInPandas(run, schema=schema)
