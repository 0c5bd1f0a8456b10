"""Streaming lane for calibration drift — watch ECE / MCE / Brier move
on a serving pipeline with numbers BATCH-IDENTICAL to
:func:`~dataframes_jl_spark.functions.stats.calibration_report` over
the same rows.

Beyond-reference operator (the reference's surface stops at
describe/colwise moments — reference src/dataframe.jl; the batch
calibration lane is functions/stats.py and this is its streaming
twin, the same pairing as ops/expectations.py ↔
streaming/expectations.py).

Why exactness survives the stream: calibration_report's whole state is
the per-(group, bin) integer quadruple ``(n, n_pos, Σu, Σ(u−y·10^s)²)``
— every component a plain SUM of per-row integers, so cumulative
per-shard snapshots merge losslessly. Rows pass through the SAME
:func:`~dataframes_jl_spark.functions.stats._binned_scores` projection
as batch (one binning contract), shard by a hash of the quantized
(u, y) pair into ``shards`` substreams, and one
``applyInPandasWithState`` keyed ``(group…, bin, shard)`` keeps the
four counters. State is O(|groups|·n_bins·shards) — CONSTANT in rows.

int64-overflow discipline: per-row ``u ≤ 10^s`` and
``(u−y·10^s)² ≤ 10^2s``; at scale=6 the squared-error sum would
overflow a bigint near 9·10^6 rows per (bin, shard) cell. The state
therefore carries Σu and Σerr² as TWO longs each — a base-10^15
(hi, lo) carry pair, exact for up to ~9·10^18 CHUNKS — and the
consumer-side merge reassembles ``hi·10^15 + lo`` in decimal(38,0)
before handing the per-bin state to the shared
:func:`~dataframes_jl_spark.functions.stats._calibration_fold`.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# carry base for the (hi, lo) split: lo stays < 10^15, so one
# micro-batch can add ~8.9e3 worst-case rows per cell before a carry —
# and the carry itself is exact Python int arithmetic inside the fn
_CHUNK = 10**15

_COUNTERS = ["n", "n_pos", "su_hi", "su_lo", "se_hi", "se_lo"]
_CAL_STATE_SCHEMA = (
    "n long, n_pos long, su_hi long, su_lo long, se_hi long, se_lo long"
)


def _cal_schema(gb: Sequence[str]) -> str:
    cols = [f"`{g}` string" for g in gb]
    cols += ["bin long", "shard int"]
    cols += [f"{c} long" for c in _COUNTERS]
    return ", ".join(cols)


def calibration_stream(
    stream: DataFrame,
    label: str,
    score: str,
    group_by: Sequence[str] = (),
    n_bins: int = 10,
    scale: int = 6,
    shards: int = 32,
) -> DataFrame:
    """Evaluate calibration state incrementally over a streaming
    DataFrame (module doc). Group columns are carried as strings (the
    state key). Returns the update stream of CUMULATIVE per-(group,
    bin, shard) counter snapshots; reduce with
    :func:`merge_calibration_snapshots`."""
    from ..functions.stats import _binned_scores

    if shards < 1:
        raise ValueError("shards must be >= 1")
    gb = list(group_by)
    proj = _binned_scores(
        stream, label, score, gb, n_bins, scale, "calibration_stream"
    ).select(
        *[F.col(g).cast("string").alias(g) for g in gb],
        "bin",
        # value-hash sharding: quantized scores take up to 10^scale
        # distinct u values per bin, so realistic score distributions
        # spread; counters are plain sums, so ANY assignment is correct
        F.pmod(F.xxhash64(F.col("u"), F.col("y")), F.lit(shards))
        .cast("int")
        .alias("shard"),
        "u",
        "y",
    )
    m = 10**scale
    n_keys = len(gb)

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, np_, su_hi, su_lo, se_hi, se_lo = state.get
        else:
            n = np_ = su_hi = su_lo = se_hi = se_lo = 0
        # exact Python-int accumulation; only the stored pairs must
        # fit int64 (hi/lo carry keeps them there)
        su = int(su_hi) * _CHUNK + int(su_lo)
        se = int(se_hi) * _CHUNK + int(se_lo)
        n, np_ = int(n), int(np_)
        for pdf in pdfs:
            us = pdf["u"].astype(object)
            ys = pdf["y"].astype(object)
            n += len(pdf)
            np_ += int(sum(ys))
            su += int(sum(us))
            se += int(sum((u - y * m) ** 2 for u, y in zip(us, ys)))
        state.update(
            (n, np_, su // _CHUNK, su % _CHUNK, se // _CHUNK, se % _CHUNK)
        )
        yield pd.DataFrame(
            [
                list(key[:n_keys])
                + [key[n_keys], key[n_keys + 1]]
                + [n, np_, su // _CHUNK, su % _CHUNK, se // _CHUNK, se % _CHUNK]
            ],
            columns=[*gb, "bin", "shard", *_COUNTERS],
        )

    return proj.groupBy(*gb, "bin", "shard").applyInPandasWithState(
        fn,
        outputStructType=_cal_schema(gb),
        stateStructType=_CAL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def merge_calibration_snapshots(
    snapshots: DataFrame,
    group_by: Sequence[str] = (),
    scale: int = 6,
    out_scale: int = 6,
) -> DataFrame:
    """Batch helper: reduce an accumulated update-stream sink (several
    cumulative emissions per (group, bin, shard)) to the batch-shaped
    report ``(*group_by, n, n_pos, ece, mce, brier)``.

    ``n`` is strictly monotone per key and only touched keys emit, so
    the latest emission is the max of the n-led counter struct; shard
    states then SUM per (group, bin) — each row was counted in exactly
    one shard — and the per-bin integers feed the SAME
    ``_calibration_fold`` the batch operator uses. Output is
    |groups|-bounded."""
    gb = list(group_by)
    dec = "decimal(38,0)"
    latest = snapshots.groupBy(*gb, "bin", "shard").agg(
        F.max(F.struct(*_COUNTERS)).alias("s")
    )
    chunk = F.lit(_CHUNK).cast(dec)
    per = latest.groupBy(*gb, "bin").agg(
        F.sum("s.n").alias("n"),
        F.sum("s.n_pos").alias("n_pos"),
        F.sum(
            F.col("s.su_hi").cast(dec) * chunk + F.col("s.su_lo").cast(dec)
        ).alias("su"),
        F.sum(
            F.col("s.se_hi").cast(dec) * chunk + F.col("s.se_lo").cast(dec)
        ).alias("se"),
    )
    from ..functions.stats import _calibration_fold

    return _calibration_fold(per, gb, scale, out_scale)
