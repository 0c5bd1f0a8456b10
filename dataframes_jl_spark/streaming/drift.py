"""Streaming categorical drift monitor: watermarked per-window level
counts on the stream side, Jensen-Shannon divergence against a
reference mix on the consumer side.

The production question — "is this hour's event mix drifting from the
trained-on distribution?" — splits into two halves with very different
state costs, and the split is the design:

* STREAM side (:func:`drift_stream`): one watermarked windowed
  ``groupBy(window, level)`` count — Spark's native streaming
  aggregate, state bounded by (windows in watermark) x |levels|, never
  by event volume. Emissions in update mode are (win_start, level, n)
  rows where ``n`` is the window's CUMULATIVE count so far — monotone
  non-decreasing per (window, level) over the stream's life.
* CONSUMER side (:func:`merge_drift_snapshots`): because emissions are
  monotone, ``max(n)`` per (window, level) over ALL accumulated
  emissions — stale intermediates included — reconstructs the exact
  final counts; the JSD against the reference then follows the same
  quantized-term discipline as functions.infotheory.jensen_shannon, so
  the result is bit-identical to a batch computation over the same
  rows (the registry gate q_stream_drift_merge proves exactly this
  against a DuckDB oracle that never sees the emission structure).

Cost shape: the consumer reduces a sink of (windows x levels x
batches) rows — bounded by time and category cardinality, never by
event count. Levels absent from a window contribute their reference
mass exactly (p = 0 -> term q·ln 2); levels absent from the reference
contribute p·ln 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drift_stream(
    events: DataFrame,
    ts_col: str,
    cat_col: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked per-window level counts (module doc). Emits
    ``(win_start, lvl, n)``; run with ``outputMode('update')``.

    The groupBy key is the FULL ``window()`` struct, not its ``start``
    field: projecting ``.getField("start")`` inside the key strips the
    event-time watermark metadata, so Spark would treat the aggregate
    as unwatermarked — state never evicted, growth unbounded in window
    count (and append mode refused outright). Grouping on the struct
    keeps eviction live; ``win_start`` is projected AFTER the
    aggregation, where metadata no longer matters.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("__win__"),
            F.col(cat_col).alias("lvl"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("__win__").getField("start").alias("win_start"), "lvl", "n"
        )
    )


def merge_drift_snapshots(
    emissions: DataFrame,
    reference: DataFrame,
    term_scale: int = 8,
    out_scale: int = 6,
) -> DataFrame:
    """Collapse accumulated update-mode emissions to final per-window
    counts (max per (window, level) — exact, monotonicity argument in
    the module doc) and score each window's JSD against ``reference``
    (a ``(lvl, ref_n)`` frame, e.g. the training mix).

    Returns one row per window: ``(win_start, n_events, n_levels,
    jsd, jsd_norm)``.
    """
    from pyspark.sql import Window

    latest = emissions.groupBy("win_start", "lvl").agg(F.max("n").alias("n"))
    # union of levels per window: every window scores against EVERY
    # reference level (missing -> p=0), plus its own extra levels.
    # The grid is |windows| x |ref levels| — bounded, broadcast-sized.
    wins = latest.select("win_start").distinct()
    ref = reference.select(
        F.col("lvl").alias("lvl"), F.col("ref_n").alias("ref_n")
    )
    # grid shares lineage with latest (wins derives from it); renaming
    # both sides' key columns through alias projections mints fresh
    # attribute ids, so the self-join resolves without ambiguity
    grid = wins.crossJoin(F.broadcast(ref)).select(
        F.col("win_start").alias("gw"),
        F.col("lvl").alias("gl"),
        "ref_n",
    )
    lat = latest.select(
        F.col("win_start").alias("lw"), F.col("lvl").alias("ll"), "n"
    )
    cond = F.col("gw").eqNullSafe(F.col("lw")) & F.col("gl").eqNullSafe(
        F.col("ll")
    )
    full = grid.join(lat, cond, "full_outer").select(
        F.coalesce(F.col("gw"), F.col("lw")).alias("win_start"),
        F.coalesce(F.col("gl"), F.col("ll")).alias("lvl"),
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.coalesce(F.col("ref_n"), F.lit(0)).alias("ref_n"),
    )
    ww = Window.partitionBy("win_start")
    wt = Window.partitionBy()
    t = full.select(
        "win_start",
        "n",
        "ref_n",
        F.sum("n").over(ww).alias("tot"),
        # each window's partition holds the full reference exactly once
        # (grid) plus ref_n=0 extras, so the per-window sum IS the
        # reference total — no separate job
        F.sum("ref_n").over(ww).alias("ref_tot"),
    )
    p = F.col("n").cast("double") / F.col("tot").cast("double")
    q = F.col("ref_n").cast("double") / F.col("ref_tot").cast("double")
    mid = (p + q) / F.lit(2.0)
    term = (
        F.when((F.col("n") > 0) & (mid > 0), p * F.log(p / mid)).otherwise(
            F.lit(0.0)
        )
        + F.when((F.col("ref_n") > 0) & (mid > 0), q * F.log(q / mid)).otherwise(
            F.lit(0.0)
        )
    ) / F.lit(2.0)
    m = F.lit(float(10**term_scale))
    import math as _math

    agg = t.groupBy("win_start").agg(
        F.max("tot").alias("n_events"),
        F.count(F.lit(1)).alias("n_levels"),
        (F.sum(F.floor(term * m + F.lit(0.5))) / m).alias("jsd"),
    )
    return agg.select(
        "win_start",
        "n_events",
        "n_levels",
        "jsd",
        (
            F.floor(
                F.col("jsd") / F.lit(_math.log(2.0)) * F.lit(1e6) + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("jsd_norm"),
    )
