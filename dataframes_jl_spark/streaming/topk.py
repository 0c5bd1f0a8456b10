"""Streaming heavy hitters: a sharded Misra-Gries sketch over an
unbounded keyed stream, with bounded state.

The batch operator (ops/frequency.py) bounds the SHUFFLE; the streaming
problem is bounding the STATE: a native
``groupBy(key).count()`` stream keeps one state row per distinct key —
unbounded over token-like keys. Here keys hash into ``shards``
substreams and each shard maintains one Misra-Gries summary of at most
``k`` counters (plus its substream row count), so total state is
O(shards * k) forever, independent of key cardinality.

Guarantee (same pigeonhole as the batch path, since shards partition
the stream): any key whose global frequency exceeds n/k satisfies
freq > n/k >= n_shard/k > n_shard/(k+1) in its OWN shard, and an MG
summary with k counters retains every key whose substream frequency
exceeds n_shard/(k+1). So the union of shard summaries is a guaranteed
candidate SUPERSET at every point in the stream; stored counts are
lower bounds that undercount by at most n_shard/(k+1).

Each micro-batch emits (outputMode 'update') the touched shards'
current summaries: rows (shard, key, lb_count, n_shard). A consumer
takes the LATEST row set per shard (n_shard is monotone — filter to
max per shard) and merges: candidates = all keys, lower bound = sum of
lb_count over shards (each key lives in exactly one shard, so the sum
is just its shard's value). Keys are tracked by their STRING form
(the sketch is an audit surface, like ops/skew.key_skew_report, not a
join payload).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..ops.frequency import _mg_compact

HH_SCHEMA = "shard int, key string, lb_count long, n_shard long"
_HH_STATE_SCHEMA = "keys array<string>, cnts array<long>, n bigint"


def heavy_hitters_stream(
    events: DataFrame,
    key_col: str,
    k: int = 100,
    shards: int = 32,
) -> DataFrame:
    """Bounded-state streaming heavy-hitter candidates (module doc).

    ``events`` is a streaming DataFrame; returns the update stream of
    shard summaries. NULL keys are ignored (as in the batch path)."""
    if k < 1 or shards < 1:
        raise ValueError("k and shards must be >= 1")
    bound = 4 * k
    keyed = events.select(
        F.col(key_col).cast("string").alias("__key__")
    ).filter(F.col("__key__").isNotNull()).withColumn(
        "__shard__",
        F.pmod(F.xxhash64("__key__"), F.lit(shards)).cast("int"),
    )

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        if state.exists:
            keys, cnts, n = state.get
            counters = dict(zip(keys, cnts))
        else:
            counters, n = {}, 0
        for pdf in pdfs:
            vc = pdf["__key__"].value_counts(dropna=True)
            n += int(vc.sum())
            for kk, c in vc.items():
                counters[kk] = counters.get(kk, 0) + int(c)
            if len(counters) > bound:
                counters = _mg_compact(counters, k)
        counters = _mg_compact(counters, k)
        state.update((list(counters.keys()), list(counters.values()), n))
        yield pd.DataFrame(
            {
                "shard": shard,
                "key": list(counters.keys()),
                "lb_count": list(counters.values()),
                "n_shard": n,
            }
        )

    return keyed.groupBy("__shard__").applyInPandasWithState(
        fn,
        outputStructType=HH_SCHEMA,
        stateStructType=_HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def merge_hh_snapshots(snapshots: DataFrame, k: int) -> DataFrame:
    """Batch helper: reduce an accumulated update-stream sink (several
    emissions per shard) to the final candidate table. Keeps each
    shard's LATEST emission (max n_shard — monotone per shard), then
    thresholds on each key's UPPER bound ub = lb + n_shard/(k+1)
    (the MG undercount cap): filtering on the lower bound could drop a
    true heavy hitter whose stored count was decremented, so the
    superset guarantee carries through only via ub. Returns
    (key, lb_count, ub_count, n_total) for keys with ub*k > n_total;
    exact counts need one batch pass over the archived stream
    (ops.frequency.heavy_hitters)."""
    # rename before rejoining: latest_n shares lineage with snapshots
    # (a self-join), and same-name attributes conflict in the analyzer
    latest_n = snapshots.groupBy("shard").agg(F.max("n_shard").alias("n_shard"))
    mx = latest_n.select(
        F.col("shard").alias("__s__"), F.col("n_shard").alias("__n__")
    )
    latest = snapshots.join(
        F.broadcast(mx),
        (F.col("shard") == F.col("__s__")) & (F.col("n_shard") == F.col("__n__")),
    ).select("shard", "key", "lb_count", "n_shard").dropDuplicates(["shard", "key"])
    n_total = latest_n.agg(F.sum("n_shard")).collect()[0][0] or 0
    ub = F.col("lb_count") + F.floor(F.col("n_shard") / F.lit(k + 1))
    return (
        latest.groupBy("key")
        .agg(
            F.sum("lb_count").alias("lb_count"),
            F.sum(ub).alias("ub_count"),
        )
        .withColumn("n_total", F.lit(int(n_total)).cast("long"))
        .filter(F.col("ub_count") * k > F.col("n_total"))
    )
