"""Streaming CUSUM change-point monitor: watermarked per-window event
counts on the stream side, the batch CUSUM scan on the consumer side —
batch-identical verdicts.

The production question — "did this segment's arrival rate shift, and
when?" — is q_cusum_shift's (functions.stats.cusum_peaks) answer made
continuous. The split follows the lane's snapshot-merge contract
(streaming.drift / streaming.calibration):

* STREAM side (:func:`cusum_stream`): one watermarked windowed
  ``groupBy(group, window)`` count — state bounded by
  (groups x windows-in-watermark), never event volume. Update-mode
  emissions ``(g, win_start, n)`` carry the window's CUMULATIVE count
  so far: monotone non-decreasing per (g, window) over the stream's
  life.
* CONSUMER side (:func:`merge_cusum_snapshots`): monotonicity makes
  ``max(n)`` per (g, window) over the whole accumulated sink — stale
  intermediates included — the EXACT final day counts; the CUSUM scan
  then runs functions.stats.cusum_from_daily, the very same integer
  path the batch operator uses, so the peak day and normalized peak
  match a batch run over the same rows bit-for-bit (parity unit +
  the q_stream_cusum_merge oracle gate, which never sees the emission
  structure).

Cost shape: the merge reduces a sink of (groups x windows x batches)
rows — calendar- and cardinality-bounded; the CUSUM windows ride
per-group partitions bounded by the calendar, the
aggregate-then-window pattern everywhere in this repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cusum_stream(
    events: DataFrame,
    ts_col: str,
    group_col: str,
    window: str = "1 day",
    watermark: str = "2 days",
) -> DataFrame:
    """Watermarked per-(group, window) counts (module doc). Emits
    ``(g, win_start, n)``; run with ``outputMode('update')``.

    The groupBy key keeps the FULL ``window()`` struct (the drift-lane
    rule: projecting ``.start`` inside the key strips the event-time
    watermark metadata and state never evicts); ``win_start`` projects
    after the aggregate.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(group_col).alias("g"),
            F.window(F.col(ts_col), window).alias("__win__"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select("g", F.col("__win__.start").alias("win_start"), "n")
    )


def merge_cusum_snapshots(
    snaps: DataFrame,
    out_scale: int = 6,
) -> DataFrame:
    """Reduce an accumulated update-mode sink of :func:`cusum_stream`
    emissions to per-group CUSUM peaks, batch-identically (module
    doc). Returns ``(g, n_days, total_events, peak_day, peak_cusum)``
    — the cusum_peaks schema keyed by the stream's group column.
    """
    from ..functions.stats import cusum_from_daily

    daily = (
        snaps.groupBy("g", F.to_date(F.col("win_start")).alias("day"))
        .agg(F.max("n").alias("x"))
    )
    return cusum_from_daily(daily, ["g"], out_scale)
