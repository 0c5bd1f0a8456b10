"""Time-series resampling: aggregate onto a regular time grid, then
MATERIALIZE the gaps and impute them (NULL / zero / LOCF / linear).

Beyond-reference operator: the reference engine (whose join family
lives in src/merge.jl) has no temporal-alignment ops at all — this
is part of the LLM-pipeline surface the build brief asks for. Align
an irregular event stream onto an every-N-seconds grid so
rolling/EWMA/drift operators see an evenly-spaced series. Spark has
no native resample; the naive recipe (collect distinct buckets,
cross join) is a driver trap.

Scale shape — every step is keyed, nothing single-reducer:

1. bucket + groupBy(keys, bucket): ONE map-side-combined shuffle on
   (keys, bucket) — the only pass over the raw table.
2. per-key grid: min/max bucket per key (#keys rows) -> ``sequence()``
   explode. The per-key array is guarded by an in-plan ``assert_true``
   (grid cells <= max_grid_per_key, default 1e6) so a mis-parsed
   ``every`` can't OOM an executor building a billion-cell array —
   the guard rides the projection, costing zero extra jobs.
3. grid LEFT JOIN aggregates on (keys, bucket): equi-join of two
   already-bucketed tables; AQE picks the strategy.
4. fill: per-key window ordered by bucket (last/first IGNORE NULLS) —
   partitioned by the resample keys, never an unpartitioned window.
   ``by=None`` (whole-table grid) therefore refuses locf/linear: that
   window would be the SinglePartition trap this repo bans
   (ops/window.py refuses it for the same reason).

Bucket discipline: the bucket is ``floor(epoch_seconds / every) *
every`` — second-granularity, closed-left buckets, identical
arithmetic on the DuckDB oracle side so both engines derive the same
grid from the same data.

Fill semantics per filled column: observed values pass through
untouched; ``zero`` imputes 0; ``locf`` carries the last observed
value forward (leading gaps stay NULL); ``linear`` interpolates
between the bracketing observed values on the epoch axis (leading
gaps stay NULL, trailing gaps carry forward — pandas
``interpolate(limit_direction='forward')`` semantics).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_FILLS = ("null", "zero", "locf", "linear")


def resample(
    df: DataFrame,
    ts_col: str,
    every_seconds: int,
    aggs: Mapping[str, Column],
    by: str | Sequence[str] | None = None,
    fill: str = "null",
    fill_cols: Sequence[str] | None = None,
    max_grid_per_key: int = 1_000_000,
    bucket_col: str = "bucket",
    persist_cells: bool = False,
) -> DataFrame:
    """Aggregate ``df`` onto a regular ``every_seconds`` grid per
    ``by``-key and materialize every grid cell between each key's
    first and last bucket (module doc for the scale shape).

    ``aggs`` maps output column name -> aggregate Column over the raw
    rows of one (key, bucket) cell. ``fill`` imputes gap cells for
    ``fill_cols`` (default: every agg output); non-filled columns keep
    NULL in gap cells.

    The grid's bounds derive from the cell aggregate, so the plan scans
    the source twice — the bounds pass column-pruned to (keys, ts)
    only, which is usually cheap on columnar sources. When the input is
    an expensive derived pipeline (not a parquet scan), pass
    ``persist_cells=True`` to materialize the (key, bucket) cells once
    (MEMORY_AND_DISK; caller owns unpersisting via
    ``spark.catalog.clearCache``).
    """
    if fill not in _FILLS:
        raise ValueError(f"fill must be one of {_FILLS}, got {fill!r}")
    if every_seconds <= 0:
        raise ValueError(f"every_seconds must be positive, got {every_seconds}")
    keys = [by] if isinstance(by, str) else list(by or [])
    if not keys and fill in ("locf", "linear"):
        raise ValueError(
            "fill='locf'/'linear' with by=None needs an unpartitioned "
            "window (the SinglePartition trap); resample by a key, or "
            "fill the whole-table series with ops.window.with_running"
        )
    out_cols = list(aggs)
    overlap = set(out_cols) & {*keys, bucket_col}
    if overlap:
        raise ValueError(f"agg names collide with keys/bucket: {sorted(overlap)}")

    sec = int(every_seconds)
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(sec)) * F.lit(sec)
    )
    cells = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(*keys, bucket.alias(bucket_col))
        .agg(*[c.alias(name) for name, c in aggs.items()])
    )
    if persist_cells:
        from pyspark import StorageLevel

        cells = cells.persist(StorageLevel.MEMORY_AND_DISK)

    bounds = cells.groupBy(*keys).agg(
        F.min(bucket_col).alias("__lo__"), F.max(bucket_col).alias("__hi__")
    )
    n_cells = (
        (F.unix_timestamp("__hi__") - F.unix_timestamp("__lo__")) / sec + 1
    ).cast("long")
    # assert_true returns NULL on success; folding it into the sequence
    # expression keeps the guard un-prunable and per-row (no extra job)
    grid_seq = F.when(
        F.assert_true(
            n_cells <= max_grid_per_key,
            F.concat(
                F.lit(f"resample: a key's grid exceeds {max_grid_per_key} "
                      f"cells at every={sec}s (span "),
                n_cells.cast("string"),
                F.lit(" cells); coarsen `every` or raise max_grid_per_key"),
            ),
        ).isNull(),
        F.sequence(
            F.col("__lo__"), F.col("__hi__"),
            F.expr(f"interval {sec} seconds"),
        ),
    )
    grid = bounds.select(
        *keys, F.explode(grid_seq).alias(bucket_col)
    )
    out = grid.join(cells, on=[*keys, bucket_col], how="left")

    if fill == "null":
        return out
    targets = list(fill_cols) if fill_cols is not None else out_cols
    missing = [c for c in targets if c not in out_cols]
    if missing:
        raise ValueError(f"fill_cols not in aggs: {missing}")
    if fill == "zero":
        return out.fillna(0, subset=targets)

    w_prev = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    if fill == "locf":
        return out.select(
            *keys,
            bucket_col,
            *[
                (F.last(c, ignorenulls=True).over(w_prev).alias(c)
                 if c in targets else F.col(c))
                for c in out_cols
            ],
        )

    # linear: bracketing observed value/epoch on each side; gaps with
    # both brackets interpolate on the epoch axis, trailing gaps LOCF
    w_next = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    t = F.unix_timestamp(bucket_col).cast("double")
    cols: list[Column] = []
    for c in out_cols:
        if c not in targets:
            cols.append(F.col(c))
            continue
        v = F.col(c).cast("double")
        obs_t = F.when(v.isNotNull(), t)
        pv = F.last(v, ignorenulls=True).over(w_prev)
        pt = F.last(obs_t, ignorenulls=True).over(w_prev)
        nv = F.first(v, ignorenulls=True).over(w_next)
        nt = F.first(obs_t, ignorenulls=True).over(w_next)
        # gap with both brackets: pt < t < nt strictly, so nt-pt > 0
        interp = pv + (nv - pv) * (t - pt) / (nt - pt)
        cols.append(
            F.when(v.isNotNull(), v)
            .when(pt.isNull(), F.lit(None).cast("double"))
            .when(nt.isNull(), pv)
            .otherwise(interp)
            .alias(c)
        )
    return out.select(*keys, bucket_col, *cols)
