"""Streaming quantile monitoring with bounded state: a sharded
bottom-k-by-hash sample over an unbounded keyed stream.

The batch quantile sketch (ops/qsketch.py) is a compaction tree over
the full row set — not incrementally maintainable under bounded state
without giving up set-determinism (textbook KLL keeps bounded state
but its content depends on arrival order and RNG, so no oracle could
replay it). The streaming lane therefore uses the OTHER classical
mergeable summary, the one whose state is a pure function of the row
set: keep the k rows whose avalanche-mixed uid hash is smallest
(bottom-k — the KMV construction pointed at values instead of
distinct counts). That sample is

* **bounded**: k rows + one counter per shard, forever;
* **set-deterministic**: bottom-k of a set — arrival order, batch
  boundaries, and shard scheduling cannot change it, so the DuckDB
  oracle rebuilds it from the raw rows (q_stream_quantile_merge);
* **exactly mergeable**: bottom-k of a union is the bottom-k of the
  concatenated bottom-k's, and per-shard row counts are monotone — so
  a consumer over an UPDATE-mode sink (stale emissions included)
  reconstructs the exact final state: max(n) per shard, distinct
  sample rows ranked by hash, first k per shard.

Estimator: a shard's sampled row stands for ``n_shard / k_shard`` raw
rows. To stay in integer arithmetic cross-engine, that weight is
quantized to ``(n_shard << WSHIFT) DIV k_shard`` and quantile queries
run the same cumulative-weight scan as ops/qsketch.sketch_quantiles.
Error is the uniform-sample bound O(1/sqrt(k)) per shard — wider than
the batch tree's, the price of bounded streaming state; a pipeline
that wants both launches the batch sketch over the same lake
partition and cross-checks.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..ops.qsketch import _mix_col, _mix_np

SAMPLE_SCHEMA = "shard int, n long, h long, uid long, q long"

# weight quantization: one sampled row counts (n << WSHIFT) / k raw
# rows; 20 fractional bits keep n*2^20 < 2^63 for any n < 8.8e12
WSHIFT = 20


def quantile_sample_stream(
    events: DataFrame,
    value_col: str,
    uid_col: str,
    k: int = 256,
    shards: int = 8,
    scale: int = 2,
) -> DataFrame:
    """Bounded-state streaming quantile sample (module doc). Emits the
    touched shards' full current state per micro-batch: rows
    ``(shard, n, h, uid, q)`` where ``n`` is the shard's exact row
    count so far (monotone) and the (h, uid, q) rows are its current
    bottom-k sample. Run with ``outputMode('update')``."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    m = float(10**scale)
    keyed = (
        events.select(
            F.col(uid_col).cast("long").alias("__uid__"),
            F.floor(F.col(value_col).cast("double") * F.lit(m) + F.lit(0.5))
            .cast("long")
            .alias("__q__"),
        )
        .filter(F.col("__uid__").isNotNull() & F.col("__q__").isNotNull())
    )

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, hs, us, qs = state.get
            h = np.array(hs, dtype=np.int64)
            u = np.array(us, dtype=np.int64)
            q = np.array(qs, dtype=np.int64)
        else:
            n = 0
            h = u = q = np.empty(0, dtype=np.int64)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            nu = pdf["__uid__"].to_numpy(np.int64)
            nq = pdf["__q__"].to_numpy(np.int64)
            nh = _mix_np(nu)
            n += len(nu)
            h = np.concatenate([h, nh])
            u = np.concatenate([u, nu])
            q = np.concatenate([q, nq])
            if len(h) > k:
                order = np.lexsort((u, h))[:k]
                h, u, q = h[order], u[order], q[order]
        state.update((int(n), h.tolist(), u.tolist(), q.tolist()))
        shard = key[0]
        yield pd.DataFrame(
            {
                "shard": np.full(len(h), shard, dtype=np.int32),
                "n": np.full(len(h), n, dtype=np.int64),
                "h": h,
                "uid": u,
                "q": q,
            }
        )

    # shard by the SAME mixed hash the sample ranks on — the oracle
    # recomputes both from uid with one mix chain (h is already >= 0)
    with_shard = keyed.withColumn(
        "__shard__",
        F.pmod(_mix_col(F.col("__uid__")), F.lit(shards)).cast("int"),
    )
    return with_shard.groupBy("__shard__").applyInPandasWithState(
        fn,
        outputStructType=SAMPLE_SCHEMA,
        stateStructType="n long, hs array<long>, us array<long>, qs array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def merge_sample_snapshots(
    snapshots: DataFrame,
    probs: Sequence[tuple[str, int, int]],
    k: int = 256,
    scale: int = 2,
) -> DataFrame:
    """Reduce an accumulated update-mode sink to the exact final
    sharded sample and estimate quantiles.

    Final state reconstruction is exact: ``max(n)`` per shard (counts
    are monotone), and the final bottom-k per shard is the bottom-k of
    ALL rows that shard ever emitted (every superseded row ranks below
    — i.e. hashes above — the final k-th row, so stale emissions can
    never displace a final-state row). Estimates follow the quantized
    per-shard weighting in the module doc. Returns
    ``(p_label, n, est)``."""
    from pyspark.sql import Window

    # latest_n / sample / ks all derive from `snapshots`: joining them
    # back together trips "Conflicting attributes" unless the join keys
    # are renamed through alias projections (fresh exprIds — the repo's
    # standard fix for shared-lineage self-joins)
    latest_n = (
        snapshots.groupBy("shard").agg(F.max("n").alias("n"))
        .select(F.col("shard").alias("sn"), "n")
    )
    distinct_rows = snapshots.select("shard", "h", "uid", "q").distinct()
    wr = Window.partitionBy("shard").orderBy("h", "uid")
    sample = (
        distinct_rows.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= k)
    )
    ks = (
        sample.groupBy("shard").agg(F.count(F.lit(1)).alias("ks"))
        .select(F.col("shard").alias("sk"), "ks")
    )
    weighted = (
        sample.join(latest_n, F.col("shard") == F.col("sn"))
        .join(ks, F.col("shard") == F.col("sk"))
        .withColumn("w", F.expr(f"(n * {1 << WSHIFT}) DIV ks"))
    )
    # exact total rows: sum of per-shard max(n), NOT over sample rows
    # (each shard's n repeats on its k rows)
    totals = latest_n.agg(F.sum("n").alias("n_exact"))
    # the weighted sample is bounded (shards * k rows) — the global
    # cumulative scan below is a bounded-window step, never data-sized
    wq = Window.orderBy("q", "h", "uid")
    wall = Window.partitionBy()
    cum = weighted.select(
        "q",
        F.sum("w").over(
            wq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum"),
        F.sum("w").over(wall).alias("W"),
    ).crossJoin(F.broadcast(totals))
    spark = snapshots.sparkSession
    targets = spark.createDataFrame(
        [(lbl, int(num), int(den)) for lbl, num, den in probs],
        "p_label string, num long, den long",
    )
    m = float(10**scale)
    return (
        cum.crossJoin(F.broadcast(targets))
        .withColumn("r", F.expr("(num * W + den - 1) DIV den"))
        .filter(F.col("cum") >= F.col("r"))
        .groupBy("p_label")
        .agg(
            F.max("n_exact").alias("n"),
            (F.min("q").cast("double") / F.lit(m)).alias("est"),
        )
    )
