"""Z-order (Morton-curve) data layout for multi-column scan pruning.

Partitioning (io/parquet.py:save) prunes on ONE leading column
hierarchy; bucketing co-locates ONE join key. When scans filter on
SEVERAL independent columns (user_id sometimes, event time other
times), neither helps the second column. Interleaving the bits of
both columns' quantized values and range-sorting files by that Morton
code keeps every file's min/max envelope TIGHT in every dimension at
once, so parquet footer stats skip most files for a predicate on ANY
of the z-ordered columns — the layout trick Delta/Iceberg expose as
OPTIMIZE ZORDER, built here from primitives: one driver-side min/max
agg, pure bit arithmetic for the code, one range repartition.

At 100 TB this is a write-amortized cost (one extra range shuffle at
layout time) bought back on every subsequent selective scan; the code
column itself is dropped before writing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _orderable_as_double(df: DataFrame, c: str) -> Column:
    """Numeric view of a column for range quantization — or a LOUD
    error. A string (or other unorderable-by-range) column under the
    old blanket double-cast was NULL-bucketed silently in permissive
    mode and raised CAST_INVALID_INPUT under ANSI; hash-quantizing it
    instead would destroy exactly the min/max locality Z-order exists
    to create, so refusing is the honest contract."""
    from pyspark.sql import types as T

    dt = df.schema[c].dataType
    col = F.col(c)
    if isinstance(dt, T.NumericType):
        return col.cast("double")
    if isinstance(dt, T.BooleanType):
        return col.cast("int").cast("double")
    if isinstance(dt, T.DateType):
        # date -> days since epoch (date cannot cast to double directly)
        return F.datediff(col, F.lit("1970-01-01")).cast("double")
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(col.cast("timestamp")).cast("double")
    raise ValueError(
        f"zorder_code: column {c!r} has type {dt.simpleString()}, which "
        "has no range quantization — Z-order needs numeric, boolean, "
        "date, or timestamp columns (hash-bucketing a string would not "
        "tighten file min/max envelopes; partition or bucket on it "
        "instead via io.parquet.save)"
    )


def zorder_code(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    col_name: str = "__zorder__",
) -> DataFrame:
    """Append the Morton interleave of the ``bits``-bit quantized
    values of ``cols``.

    Quantization is affine on the column's [min, max] (one tiny driver
    agg — 2 values per column); NULLs map to bucket 0 so they cluster
    in the lowest files. Interleaving round-robins bit i of column j
    into position ``i * n_cols + j`` — the classic Z-curve, every
    dimension contributing equally to locality. bits * n_cols must fit
    a signed int64 (<= 62).
    """
    cols = list(cols)
    if not cols:
        raise ValueError("zorder_code needs at least one column")
    if bits * len(cols) > 62:
        raise ValueError(
            f"bits*n_cols = {bits * len(cols)} exceeds 62 (int64 range)"
        )
    numeric = {c: _orderable_as_double(df, c) for c in cols}
    stats = df.agg(
        *[F.min(numeric[c]).alias(f"mn_{c}") for c in cols],
        *[F.max(numeric[c]).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    n = len(cols)
    top = (1 << bits) - 1
    code: Column = F.lit(0).cast("bigint")
    for j, c in enumerate(cols):
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        if mn is None or mx is None or mx == mn:
            continue  # constant/all-NULL column adds no information
        scale = float(top) / (mx - mn)
        bucket = F.least(
            F.lit(top),
            F.greatest(
                F.lit(0),
                F.floor((numeric[c] - F.lit(mn)) * F.lit(scale)).cast("bigint"),
            ),
        )
        bucket = F.coalesce(bucket, F.lit(0))
        for i in range(bits):
            # bit i of bucket -> position i*n + j of the code
            code = code + F.shiftleft(
                F.shiftright(bucket, i).bitwiseAND(F.lit(1)), i * n + j
            )
    return df.withColumn(col_name, code)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet laid out along the Z-curve of ``cols``:
    range-repartition on the Morton code (``num_files`` output files,
    default current parallelism), sort within partitions so row groups
    are tight too, drop the code, write. Subsequent reads prune files
    through ordinary parquet min/max stats on ANY of ``cols``."""
    coded = zorder_code(df, cols, bits)
    par = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        coded.repartitionByRange(par, F.col("__zorder__"))
        .sortWithinPartitions("__zorder__")
        .drop("__zorder__")
        .write.mode(mode)
        .parquet(path)
    )


def file_prune_stats(path: str, col: str, lo, hi) -> dict:
    """How many parquet files of ``path`` could contain rows with
    ``col`` in [lo, hi], judged ONLY by footer min/max — the same
    decision a Spark scan makes. Returns {"files": n, "candidates": m}.
    Diagnostic for layout quality (no Spark job; pyarrow footers)."""
    import pyarrow.parquet as pq
    from pyarrow import fs as pafs

    sel = pafs.FileSelector(path.removeprefix("file:"), recursive=True)
    local = pafs.LocalFileSystem()
    files = [
        f.path
        for f in local.get_file_info(sel)
        if f.is_file and f.path.endswith(".parquet")
    ]
    cand = 0
    for fp in files:
        md = pq.ParquetFile(fp).metadata
        overlaps = False
        for rg in range(md.num_row_groups):
            col_idx = {md.row_group(rg).column(i).path_in_schema: i
                       for i in range(md.row_group(rg).num_columns)}
            if col not in col_idx:
                overlaps = True
                break
            st = md.row_group(rg).column(col_idx[col]).statistics
            if st is None or st.min is None:
                overlaps = True
                break
            if not (st.max < lo or st.min > hi):
                overlaps = True
                break
        if overlaps:
            cand += 1
    return {"files": len(files), "candidates": cand}
