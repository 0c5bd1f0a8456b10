"""Round-9 tests: the mergeable quantile sketch (batch compaction
tree + streaming bottom-k sample) and the ungrouped gini/lorenz
global-rank path."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def _exact_rank_err(spark, df, value, est: float, p: float, n: int) -> float:
    """Distance from p to the RANK INTERVAL [frac(< est), frac(<= est)]
    of the estimate — the sketch guarantee is on ranks, not values
    (value error is unbounded for adversarial gaps), and with heavy
    ties any value whose rank interval covers p is exactly right."""
    lo = df.filter(F.col(value) < est).count() / n
    hi = df.filter(F.col(value) <= est).count() / n
    if lo <= p <= hi:
        return 0.0
    return min(abs(p - lo), abs(p - hi))


# ------------------------------------------------------------- batch tree

def test_qsketch_weight_exact_and_bounded(spark):
    from dataframes_jl_spark.ops.qsketch import quantile_sketch

    n = 50_000
    df = spark.range(n).select(
        F.col("id").alias("uid"), (F.col("id") % 997).cast("double").alias("v")
    )
    rows = quantile_sketch(df, "v", "uid", k=128, B=512).collect()
    assert sum(r.w for r in rows) == n  # pair-absorb preserves Sum w exactly
    # size ~ n/B plus log slack, never unbounded
    assert len(rows) <= max(128, n // 512 + 64)


def test_qsketch_deterministic_under_partitioning(spark):
    from dataframes_jl_spark.ops.qsketch import quantile_sketch

    df = spark.range(20_000).select(
        F.col("id").alias("uid"),
        (F.col("id") * 37 % 1000).cast("double").alias("v"),
    )
    a = sorted(
        (r.q, r.h, r.uid, r.w)
        for r in quantile_sketch(df, "v", "uid", k=64, B=256).collect()
    )
    b = sorted(
        (r.q, r.h, r.uid, r.w)
        for r in quantile_sketch(
            df.repartition(13), "v", "uid", k=64, B=256
        ).collect()
    )
    assert a == b  # hash-blocked tree is a function of the row SET


def test_qsketch_rank_error_across_distributions(spark):
    from dataframes_jl_spark.ops.qsketch import (
        quantile_sketch,
        sketch_quantiles,
    )

    n = 40_000
    rng = np.random.RandomState(7)
    dists = {
        "uniform": rng.uniform(0, 1000, n),
        "zipfish": 1000.0 / (1 + rng.zipf(1.5, n) % 1000),
        "clustered": np.repeat([1.0, 2.0, 500.0, 999.0], n // 4),
    }
    probs = [("p10", 1, 10), ("p50", 1, 2), ("p99", 99, 100)]
    for name, vals in dists.items():
        df = spark.createDataFrame(
            [(int(i), float(v)) for i, v in enumerate(vals)],
            "uid long, v double",
        )
        sk = quantile_sketch(df, "v", "uid", k=128, B=256, scale=4)
        size = sk.count()
        est = {
            r.p_label: r.est
            for r in sketch_quantiles(sk, probs, scale=4).collect()
        }
        for lbl, num, den in probs:
            err = _exact_rank_err(spark, df, "v", est[lbl], num / den, n)
            # deterministic-tree bound: well under 2/size rank error
            assert err <= 2.0 / size, (name, lbl, err, size)


def test_qsketch_grouped_and_merge_algebra(spark):
    from functools import reduce

    from dataframes_jl_spark.ops.qsketch import (
        merge_quantile_sketches,
        quantile_sketch,
        sketch_quantiles,
    )

    n = 30_000
    df = spark.range(n).select(
        F.col("id").alias("uid"),
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 1009).cast("double").alias("v"),
    )
    sk = quantile_sketch(df, "v", "uid", group_by=["g"], k=64, B=128)
    per_g = {r.g: 0 for r in sk.select("g").distinct().collect()}
    assert set(per_g) == {"0", "1", "2"}
    w = {r.g: r.s for r in sk.groupBy("g").agg(F.sum("w").alias("s")).collect()}
    assert all(v == n // 3 for v in w.values())

    est = {
        (r.g, r.p_label): r.est
        for r in sketch_quantiles(
            sk, [("p50", 1, 2)], group_by=["g"]
        ).collect()
    }
    for g in ("0", "1", "2"):
        err = abs(est[(g, "p50")] - 504.5) / 1009.0
        assert err < 0.05

    # merge algebra: shard builds -> union -> merge preserves Sum w and
    # stays within the size bound
    shards = [
        quantile_sketch(
            df.filter(F.pmod(F.col("uid"), F.lit(3)) == i), "v", "uid",
            k=64, B=128,
        )
        for i in range(3)
    ]
    merged = merge_quantile_sketches(
        reduce(lambda x, y: x.unionByName(y), shards), k=64
    )
    rows = merged.collect()
    assert sum(r.w for r in rows) == n
    assert len(rows) <= 64
    p50 = sketch_quantiles(merged, [("p50", 1, 2)]).collect()[0].est
    assert abs(p50 - 504.5) / 1009.0 < 0.06


# ----------------------------------------------------- streaming sampler

def test_quantile_sample_stream_matches_batch_state(spark, tmp_path):
    """Micro-batched stream emissions, max/distinct-merged by the
    consumer, reconstruct the EXACT final bottom-k sample — estimates
    equal a batch replay of the same algebra on the full row set."""
    from dataframes_jl_spark.ops.qsketch import _mix_np
    from dataframes_jl_spark.streaming.quantile import (
        merge_sample_snapshots,
        quantile_sample_stream,
    )

    d = tmp_path / "qs_in"
    d.mkdir()
    n = 600
    rows = [(i, float((i * 13) % 997)) for i in range(n)]
    for b in range(3):
        chunk = rows[b::3]
        (d / f"{b}.csv").write_text(
            "uid,v\n" + "\n".join(f"{u},{v}" for u, v in chunk) + "\n"
        )
    stream = (
        spark.readStream.schema("uid long, v double")
        .option("maxFilesPerTrigger", 1)
        .option("header", True)
        .csv(str(d))
    )
    k, shards = 32, 4
    q = (
        quantile_sample_stream(stream, "v", "uid", k=k, shards=shards)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_qsamp")
        .start()
    )
    try:
        q.processAllAvailable()
        snaps = spark.sql("SELECT shard, n, h, uid, q FROM t_qsamp")
        n_emissions = snaps.count()
        got = merge_sample_snapshots(
            snaps, [("p50", 1, 2), ("p90", 9, 10)], k=k
        ).collect()
    finally:
        q.stop()

    # expected final state from a numpy replay of the set algebra
    uids = np.arange(n, dtype=np.int64)
    hs = _mix_np(uids)
    sh = hs % shards
    gmap = {r.p_label: r for r in got}
    assert gmap["p50"].n == n and gmap["p90"].n == n
    # stream touched 3 micro-batches -> stale emissions existed
    assert n_emissions > sum(min(k, int((sh == s).sum())) for s in range(shards))
    # estimates sit near the true quantiles (sample bound ~1/sqrt(k))
    vals = np.sort(((uids * 13) % 997).astype(float))
    for lbl, p in (("p50", 0.5), ("p90", 0.9)):
        est = gmap[lbl].est
        below = float((vals <= est).mean())
        assert abs(below - p) < 0.25, (lbl, est, below)


def test_quantile_sample_stream_validates(spark):
    from dataframes_jl_spark.streaming.quantile import quantile_sample_stream

    df = spark.readStream.format("rate").load()
    import pytest

    with pytest.raises(ValueError):
        quantile_sample_stream(df, "value", "value", k=0)
    with pytest.raises(ValueError):
        quantile_sample_stream(df, "value", "value", shards=0)


def test_qsketch_validates(spark):
    import pytest

    from dataframes_jl_spark.ops.qsketch import quantile_sketch

    df = spark.range(10).select(
        F.col("id").alias("uid"), F.col("id").cast("double").alias("v")
    )
    with pytest.raises(ValueError):
        quantile_sketch(df, "v", "uid", B=48)  # not a power of two
    with pytest.raises(ValueError):
        quantile_sketch(df, "v", "uid", k=1)
