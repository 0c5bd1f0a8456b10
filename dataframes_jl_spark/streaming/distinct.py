"""Streaming distinct-count: a sharded HyperLogLog over an unbounded
keyed stream, with state bounded at shards x 2^p registers FOREVER.

The native streaming answer — ``dropDuplicates`` + count, or a
``groupBy`` over keys — keeps one state row per distinct key:
unbounded over user-id/token-like streams. Here keys hash into
``shards`` substreams and each shard maintains one 2^p-register HLL of
ITS keys. A key's (register, rho) pair is a pure function of the key
(ops/bloom._hll_parts_np — the bit-identical numpy twin of the batch
hash), so each key contributes to exactly one shard's sketch and the
max-merge of shard sketches IS the sketch of the union stream — the
same shard-merge algebra the batch path uses across executors.

Emissions (outputMode 'update') are the touched shards' nonzero
registers: rows (shard, reg, rho). Per (shard, reg), rho is MONOTONE
non-decreasing over the stream's life, so a consumer needs no
latest-snapshot filtering: max(rho) per register over ALL accumulated
emissions equals the current union sketch
(:func:`merge_distinct_snapshots` -> ops.bloom.hll_estimate). The
merged registers are bit-identical to batch ``hll_build`` over the
same rows — stream and batch lanes of a lambda pipeline can cross-
merge sketches freely.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..ops.bloom import _hll_parts_np

DISTINCT_SCHEMA = "shard int, reg int, rho int"


def distinct_stream(
    events: DataFrame,
    key_col: str,
    p: int = 8,
    shards: int = 32,
) -> DataFrame:
    """Bounded-state streaming cardinality sketch (module doc).

    ``events`` is a streaming DataFrame with an integer-typed
    ``key_col`` (same contract as batch ``hll_build``); returns the
    update stream of shard register snapshots. NULL keys are skipped
    (COUNT DISTINCT semantics)."""
    if not 4 <= p <= 14:
        raise ValueError(f"p must be in [4, 14], got {p}")
    if shards < 1:
        raise ValueError("shards must be >= 1")
    m = 1 << p
    keyed = (
        events.select(F.col(key_col).cast("long").alias("__key__"))
        .filter(F.col("__key__").isNotNull())
        .withColumn(
            "__shard__",
            F.pmod(F.xxhash64("__key__"), F.lit(shards)).cast("int"),
        )
    )

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        (shard,) = key
        if state.exists:
            rhos = np.array(state.get[0], dtype=np.int32)
        else:
            rhos = np.zeros(m, dtype=np.int32)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            reg, rho = _hll_parts_np(pdf["__key__"].to_numpy(), m)
            np.maximum.at(rhos, reg, rho)
        state.update((rhos.tolist(),))
        nz = np.nonzero(rhos)[0]
        yield pd.DataFrame(
            {
                "shard": np.full(len(nz), shard, dtype=np.int32),
                "reg": nz.astype(np.int32),
                "rho": rhos[nz],
            }
        )

    return keyed.groupBy("__shard__").applyInPandasWithState(
        fn,
        outputStructType=DISTINCT_SCHEMA,
        stateStructType="rhos array<int>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def merge_distinct_snapshots(snapshots: DataFrame, p: int = 8) -> DataFrame:
    """Batch helper: reduce an accumulated update-stream sink to the
    union sketch and estimate its cardinality. Because per-register
    rhos only grow, max over every accumulated emission equals the
    latest union sketch — stale snapshots can never inflate it."""
    from ..ops.bloom import hll_estimate

    sketch = snapshots.groupBy("reg").agg(F.max("rho").alias("rho"))
    return hll_estimate(sketch, p=p)
