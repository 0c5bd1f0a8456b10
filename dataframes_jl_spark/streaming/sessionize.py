"""Sessionization: assign per-user session indexes from event-time gaps.

Two implementations of the same semantics:

- ``sessionize`` (batch): lag + gap-flag + running sum over a per-user
  window — one shuffle on user_id, no Python in the plan.
- ``sessionize_stream`` (streaming): arbitrary stateful processing via
  ``applyInPandasWithState`` (SURVEY §2.10 'Not present' — the custom
  stateful-operator surface Structured Streaming adds beyond the
  reference). State per user = (last event ts, current session index);
  memory is O(active users), not O(events), which is what makes it a
  100 TB operator.

A session breaks when the gap to the previous event of the same user
exceeds ``gap`` seconds. Session indexes are 1-based per user in event
order.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = "user_id bigint, ts timestamp, session_idx int"
_STATE_SCHEMA = "last_ts double, session_idx int"


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 3600.0,
    order_cols: Iterable[str] = (),
) -> DataFrame:
    """Batch sessionization: (user, ts, session_idx) for every event."""
    ob = [F.col(ts_col), *[F.col(c) for c in order_cols]]
    w = Window.partitionBy(user_col).orderBy(*ob)
    prev = F.lag(F.col(ts_col)).over(w)

    # TIMESTAMP_NTZ (parquet timestamp[us] without tz) cannot cast to
    # double directly; route it through TIMESTAMP_LTZ first (session tz
    # is UTC, so wall-clock values are unchanged).
    def _secs(c):
        if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
            c = c.cast("timestamp")
        return c.cast("double")

    gap = _secs(F.col(ts_col)) - _secs(prev)
    is_new = F.when(prev.isNull() | (gap > gap_seconds), 1).otherwise(0)
    run = Window.partitionBy(user_col).orderBy(*ob).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("session_idx", F.sum(is_new).over(run).cast("int"))


def sessionize_stream(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 3600.0,
) -> DataFrame:
    """Streaming sessionization over applyInPandasWithState.

    Correct under the micro-batch model as long as a user's events
    arrive in event-time order across batches (true for replayed logs;
    for out-of-order sources put a watermark + sort upstream). Within a
    batch, events are sorted per user before the gap scan.
    """

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.exists:
            last_ts, sess = state.get
        else:
            last_ts, sess = None, 0
        outs = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            idxs = []
            for t in pdf[ts_col]:
                tsec = t.timestamp()
                if last_ts is None or tsec - last_ts > gap_seconds:
                    sess += 1
                last_ts = tsec
                idxs.append(sess)
            outs.append(
                pd.DataFrame(
                    {
                        "user_id": pdf[user_col].values,
                        "ts": pdf[ts_col].values,
                        "session_idx": idxs,
                    }
                )
            )
        state.update((last_ts, sess))
        yield from outs

    return (
        events.groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
