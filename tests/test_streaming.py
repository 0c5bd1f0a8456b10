"""Streaming tests mirroring reference test/datastream.jl: minibatch
iteration counts + aggregate agreement, plus Structured Streaming
incremental aggregation."""

from __future__ import annotations

import math
import time

from pyspark.sql import functions as F

from dataframes_jl_spark.streaming import (
    DataStream,
    openstream,
    read_minibatch,
    stream_aggregate,
)
from dataframes_jl_spark.streaming.datastream import windowed_event_counts


def test_minibatch_iteration_counts(spark, tmp_path):
    p = tmp_path / "stream.csv"
    lines = ["a,b"] + [f"{i},{i * 0.5}" for i in range(100)]
    p.write_text("\n".join(lines) + "\n")
    ds = openstream(spark, str(p), nrows=7)
    chunks = list(ds)
    assert sum(len(c) for c in chunks) == 100
    assert all(len(c) <= 7 for c in chunks)
    first = read_minibatch(ds)
    assert len(first) == 7


def test_streaming_aggregates_match_batch(spark, tables):
    """Chunked-vs-whole agreement (reference test/datastream.jl:24-60,
    test_ddataframe chunked colsums check)."""
    li = tables["lineitem"].select("l_quantity", "l_extendedprice")
    ds = DataStream(li, nrows=500)
    means = ds.colmeans()
    batch = li.agg(
        F.avg("l_quantity").alias("q"), F.avg("l_extendedprice").alias("p")
    ).collect()[0]
    assert math.isclose(means["l_quantity"], batch.q, rel_tol=1e-9)
    assert math.isclose(means["l_extendedprice"], batch.p, rel_tol=1e-9)
    # chunk-accumulated mean agrees too (the reference's hand-rolled path)
    tot = n = 0.0
    for chunk in ds:
        tot += chunk["l_quantity"].sum()
        n += len(chunk)
    assert math.isclose(tot / n, batch.q, rel_tol=1e-9)


def test_structured_streaming_incremental(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "part1.csv").write_text("g,v\na,1.0\nb,2.0\n")
    (d / "part2.csv").write_text("g,v\na,3.0\nb,4.0\n")
    q = stream_aggregate(
        spark,
        str(d),
        schema="g string, v double",
        agg_exprs={"total": "sum(v)", "n": "count(1)"},
        group_by=["g"],
        query_name="t_stream_agg",
    )
    try:
        q.processAllAvailable()
        out = {
            r.g: (r.total, r.n)
            for r in spark.sql("SELECT * FROM t_stream_agg").collect()
        }
        assert out == {"a": (4.0, 2), "b": (6.0, 2)}
        # late-arriving file is incrementally folded in
        (d / "part3.csv").write_text("g,v\na,10.0\n")
        deadline = time.time() + 30
        while time.time() < deadline:
            q.processAllAvailable()
            row = spark.sql(
                "SELECT total FROM t_stream_agg WHERE g='a'"
            ).collect()
            if row and row[0].total == 14.0:
                break
            time.sleep(0.5)
        assert row[0].total == 14.0
    finally:
        q.stop()


def test_windowed_event_counts_batch(spark, tables):
    """Event-time tumbling window as batch rollup on the events table."""
    out = windowed_event_counts(tables["events"], window="1 day")
    rows = out.collect()
    assert all(r.n > 0 for r in rows)
    total = sum(r.n for r in rows)
    assert total == tables["events"].count()


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """Stateful applyInPandasWithState sessionization: state must carry
    across micro-batches (maxFilesPerTrigger=1 → one batch per file)."""
    from dataframes_jl_spark.streaming import sessionize, sessionize_stream

    d = tmp_path / "sess_in"
    d.mkdir()
    # user 1: events at 0h, 0.5h, 3h (gap>1h → new session), user 2: 0h, 2h
    (d / "a.csv").write_text(
        "user_id,ts\n"
        "1,2024-01-01 00:00:00\n"
        "1,2024-01-01 00:30:00\n"
        "2,2024-01-01 00:00:00\n"
    )
    (d / "b.csv").write_text(
        "user_id,ts\n"
        "1,2024-01-01 03:00:00\n"
        "2,2024-01-01 02:00:00\n"
    )
    schema = "user_id bigint, ts timestamp"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("header", True)
        .csv(str(d))
    )
    q = (
        sessionize_stream(stream, gap_seconds=3600.0)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_sessions")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.user_id, str(r.ts)): r.session_idx
            for r in spark.sql("SELECT * FROM t_sessions").collect()
        }
    finally:
        q.stop()
    batch_df = spark.read.schema(schema).option("header", True).csv(str(d))
    expect = {
        (r.user_id, str(r.ts)): r.session_idx
        for r in sessionize(batch_df, gap_seconds=3600.0).collect()
    }
    assert got == expect
    assert expect[(1, "2024-01-01 03:00:00")] == 2
    assert expect[(2, "2024-01-01 02:00:00")] == 2


def test_watermark_drops_late_events(spark, tmp_path):
    """Append-mode windowed aggregation finalizes a window once the
    watermark passes; a file arriving after that with an event inside
    the finalized window is dropped, not double-counted."""
    import time as _time

    from dataframes_jl_spark.streaming.datastream import windowed_event_counts

    d = tmp_path / "wm_in"
    d.mkdir()
    (d / "a.csv").write_text(
        "ts,event_type,value\n"
        "2024-01-01 00:10:00,click,1.0\n"
        "2024-01-01 00:20:00,click,1.0\n"
    )
    schema = "ts timestamp, event_type string, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("header", True)
        .csv(str(d))
    )
    out = windowed_event_counts(stream, window="1 hour", watermark="30 minutes")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_wm")
        .start()
    )
    try:
        q.processAllAvailable()
        # advance event time far past the first window + watermark,
        # then send a LATE event back into the finalized 00:00 window
        (d / "b.csv").write_text("ts,event_type,value\n2024-01-01 09:00:00,click,1.0\n")
        q.processAllAvailable()
        (d / "c.csv").write_text("ts,event_type,value\n2024-01-01 00:30:00,click,99.0\n")
        q.processAllAvailable()
        # one more on-time event so the engine emits anything still pending
        (d / "d.csv").write_text("ts,event_type,value\n2024-01-01 10:00:00,click,1.0\n")
        deadline = _time.time() + 30
        rows = []
        while _time.time() < deadline:
            q.processAllAvailable()
            rows = spark.sql(
                "SELECT * FROM t_wm WHERE window_start = TIMESTAMP '2024-01-01 00:00:00'"
            ).collect()
            if rows:
                break
        assert rows, "finalized first window never emitted"
        # the late 00:30 event (value 99) must NOT be in the finalized count
        assert rows[0].n == 2 and rows[0].total_value == 2.0
    finally:
        q.stop()


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Event-time stream-stream interval join: clicks joined to purchases
    of the same user within the preceding 30 minutes. Stream result
    (file source, one micro-batch per file) must equal the batch join on
    the same data; a purchase outside the interval must not match."""
    from dataframes_jl_spark.streaming import stream_stream_join

    cd = tmp_path / "clicks"
    pd_ = tmp_path / "purchases"
    cd.mkdir(), pd_.mkdir()
    (cd / "a.csv").write_text(
        "c_user,c_ts\n"
        "1,2024-01-01 00:20:00\n"
        "2,2024-01-01 00:40:00\n"
    )
    (cd / "b.csv").write_text("c_user,c_ts\n1,2024-01-01 01:30:00\n")
    (pd_ / "a.csv").write_text(
        "p_user,p_ts,amount\n"
        "1,2024-01-01 00:05:00,10.0\n"   # within 30m of click 00:20
        "2,2024-01-01 00:00:00,20.0\n"   # 40m before click 00:40 -> no match
    )
    (pd_ / "b.csv").write_text("p_user,p_ts,amount\n1,2024-01-01 01:10:00,30.0\n")
    cs = "c_user bigint, c_ts timestamp"
    ps = "p_user bigint, p_ts timestamp, amount double"

    def stream_of(d, schema):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("header", True)
            .csv(str(d))
        )

    joined = stream_stream_join(
        stream_of(cd, cs), stream_of(pd_, ps),
        left_key="c_user", right_key="p_user",
        left_ts="c_ts", right_ts="p_ts",
        watermark="10 minutes", max_lag="30 minutes",
    )
    q = joined.writeStream.outputMode("append").format("memory").queryName(
        "t_ssj"
    ).start()
    try:
        q.processAllAvailable()
        got = {
            (r.c_user, str(r.c_ts), str(r.p_ts), r.amount)
            for r in spark.sql("SELECT * FROM t_ssj").collect()
        }
    finally:
        q.stop()
    batch = stream_stream_join(
        spark.read.schema(cs).option("header", True).csv(str(cd)),
        spark.read.schema(ps).option("header", True).csv(str(pd_)),
        left_key="c_user", right_key="p_user",
        left_ts="c_ts", right_ts="p_ts",
        watermark="10 minutes", max_lag="30 minutes",
    )
    expect = {
        (r.c_user, str(r.c_ts), str(r.p_ts), r.amount) for r in batch.collect()
    }
    assert got == expect
    assert (1, "2024-01-01 00:20:00", "2024-01-01 00:05:00", 10.0) in got
    # user 2's purchase is outside the 30-minute interval
    assert not any(t[0] == 2 for t in got)


def test_stream_stream_join_rejects_overlap(spark):
    from dataframes_jl_spark.streaming import stream_stream_join

    df = spark.createDataFrame([(1,)], "k bigint")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="overlapping"):
        stream_stream_join(df, df, "k", "k", "k", "k")


def test_dedup_stream_bounded_state_matches_batch(spark, tmp_path):
    """dropDuplicatesWithinWatermark: re-delivered event ids within the
    watermark are dropped; stream output equals batch dropDuplicates."""
    from dataframes_jl_spark.streaming import dedup_stream

    d = tmp_path / "dedup_in"
    d.mkdir()
    (d / "a.csv").write_text(
        "event_id,ts,value\n"
        "1,2024-01-01 00:00:00,10.0\n"
        "2,2024-01-01 00:01:00,20.0\n"
    )
    (d / "b.csv").write_text(
        "event_id,ts,value\n"
        "1,2024-01-01 00:02:00,10.0\n"   # re-delivery of id 1 -> dropped
        "3,2024-01-01 00:03:00,30.0\n"
    )
    schema = "event_id bigint, ts timestamp, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("header", True)
        .csv(str(d))
    )
    q = (
        dedup_stream(stream, ["event_id"], ts_col="ts", watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_dedup")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r.event_id for r in spark.sql("SELECT * FROM t_dedup").collect()}
    finally:
        q.stop()
    batch = dedup_stream(
        spark.read.schema(schema).option("header", True).csv(str(d)),
        ["event_id"],
    )
    assert got == {r.event_id for r in batch.collect()} == {1, 2, 3}


def test_stream_to_parquet_exactly_once_resume(spark, tmp_path):
    """File-source -> parquet-sink with checkpoint: first drain writes
    everything once; a second drain over the same input writes NOTHING
    new (offsets committed); new input files produce only their rows."""
    import time as _t

    from dataframes_jl_spark.streaming.datastream import stream_to_parquet

    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    spark.range(0, 100).selectExpr("id", "id * 2 AS v").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "batch1"))

    schema = "id bigint, v bigint"
    def drain():
        stream = (
            spark.readStream.schema(schema).parquet(str(src / "*"))
        )
        q = stream_to_parquet(stream, str(out), str(ckpt))
        q.awaitTermination(120)
        q.stop()

    drain()
    assert spark.read.parquet(str(out)).count() == 100
    drain()  # same input, committed offsets -> no duplicates
    assert spark.read.parquet(str(out)).count() == 100

    spark.range(100, 130).selectExpr("id", "id * 2 AS v").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "batch2"))
    drain()
    got = spark.read.parquet(str(out))
    assert got.count() == 130
    assert got.selectExpr("max(id)").first()[0] == 129


def test_curate_stream_matches_batch(spark, tmp_path):
    """The curation pipeline (Gopher + C4 + PII redact + dedup) yields
    identical results run as a file stream or as one batch read."""
    import json

    from dataframes_jl_spark.streaming import curate_stream

    good = ("The quick brown fox jumps over the lazy dog. Then it runs "
            "off to the hills with plenty of energy. It naps at noon.")
    docs_a = [
        {"doc_id": 1, "ts": "2024-01-01 00:00:00", "text": good},
        {"doc_id": 2, "ts": "2024-01-01 00:01:00", "text": "too short."},
        {"doc_id": 3, "ts": "2024-01-01 00:02:00",
         "text": good + " Contact me at bob@example.com for more."},
    ]
    docs_b = [
        {"doc_id": 1, "ts": "2024-01-01 00:03:00", "text": good},  # re-delivery
        {"doc_id": 4, "ts": "2024-01-01 00:04:00",
         "text": "lorem ipsum " + good},                            # C4 drop
    ]
    d = tmp_path / "curate_in"
    d.mkdir()
    (d / "a.jsonl").write_text("\n".join(json.dumps(x) for x in docs_a))
    (d / "b.jsonl").write_text("\n".join(json.dumps(x) for x in docs_b))
    schema = "doc_id bigint, ts timestamp, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    q = (
        curate_stream(stream, ts_col="ts", watermark="10 minutes", min_words=10)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_curate")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {(r.doc_id, r.text) for r in spark.sql("SELECT doc_id, text FROM t_curate").collect()}
    finally:
        q.stop()
    batch = curate_stream(
        spark.read.schema(schema).json(str(d)), min_words=10
    )
    expect = {(r.doc_id, r.text) for r in batch.select("doc_id", "text").collect()}
    assert got == expect
    ids = {i for i, _ in got}
    assert ids == {1, 3}          # 2 too short, 4 lorem-ipsum, 1 deduped
    redacted = next(t for i, t in got if i == 3)
    assert "bob@example.com" not in redacted and "[PII]" in redacted


def test_heavy_hitters_stream_bounded_state(spark, tmp_path):
    """Sharded streaming MG sketch: state carries across micro-batches
    (maxFilesPerTrigger=1), the merged snapshot is a SUPERSET of the
    true heavy hitters, lower bounds never exceed true counts, and with
    fewer distinct keys than k the counts are exact."""
    import random
    from collections import Counter

    from dataframes_jl_spark.streaming.topk import (
        heavy_hitters_stream,
        merge_hh_snapshots,
    )

    d = tmp_path / "hh_in"
    d.mkdir()
    rng = random.Random(5)
    vocab = ["hot"] * 40 + [f"w{i}" for i in range(30)]
    batches = [[rng.choice(vocab) for _ in range(200)] for _ in range(3)]
    for i, b in enumerate(batches):
        (d / f"{i}.csv").write_text("k\n" + "\n".join(b) + "\n")
    stream = (
        spark.readStream.schema("k string")
        .option("maxFilesPerTrigger", 1)
        .option("header", True)
        .csv(str(d))
    )
    q = (
        heavy_hitters_stream(stream, "k", k=8, shards=4)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_hh")
        .start()
    )
    try:
        q.processAllAvailable()
        snaps = spark.sql("SELECT * FROM t_hh")
        merged = {r.key: r for r in merge_hh_snapshots(snaps, k=8).collect()}
    finally:
        q.stop()
    c = Counter(x for b in batches for x in b)
    n = sum(c.values())
    true_hh = {k for k, v in c.items() if v * 8 > n}
    assert true_hh <= set(merged)                     # superset guarantee
    for key, r in merged.items():
        assert r.lb_count <= c[key] <= r.ub_count     # MG bound
        assert r.n_total == n

    # exact regime: distinct keys < k -> no decrements ever, counts exact
    d2 = tmp_path / "hh_exact"
    d2.mkdir()
    (d2 / "0.csv").write_text("k\na\na\nb\n")
    (d2 / "1.csv").write_text("k\na\nc\n")
    stream2 = (
        spark.readStream.schema("k string")
        .option("maxFilesPerTrigger", 1)
        .option("header", True)
        .csv(str(d2))
    )
    q2 = (
        heavy_hitters_stream(stream2, "k", k=10, shards=2)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_hh2")
        .start()
    )
    try:
        q2.processAllAvailable()
        latest = merge_hh_snapshots(spark.sql("SELECT * FROM t_hh2"), k=10)
        got = {r.key: r.lb_count for r in latest.collect()}
    finally:
        q2.stop()
    # distinct < k: no decrements ever, every lb is the EXACT count
    # (all three keys clear 5/k=0.5, so all are reported)
    assert got == {"a": 3, "b": 1, "c": 1}


def test_distinct_stream_matches_batch_sketch(spark, tmp_path):
    """Sharded streaming HLL: state carries across micro-batches, the
    max-merge of ALL accumulated emissions is BIT-IDENTICAL to the
    batch hll_build sketch of the same rows (cross-mergeable lanes),
    and the estimate tracks the true cardinality."""
    import random

    from dataframes_jl_spark.ops.bloom import hll_build, hll_estimate
    from dataframes_jl_spark.streaming.distinct import (
        distinct_stream,
        merge_distinct_snapshots,
    )

    d = tmp_path / "dc_in"
    d.mkdir()
    rng = random.Random(11)
    batches = [[rng.randrange(0, 5000) for _ in range(400)] for _ in range(3)]
    for i, b in enumerate(batches):
        (d / f"{i}.csv").write_text("k\n" + "\n".join(map(str, b)) + "\n")
    stream = (
        spark.readStream.schema("k long")
        .option("maxFilesPerTrigger", 1)
        .option("header", True)
        .csv(str(d))
    )
    q = (
        distinct_stream(stream, "k", p=8, shards=4)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_dc")
        .start()
    )
    try:
        q.processAllAvailable()
        snaps = spark.sql("SELECT * FROM t_dc")
        stream_sketch = sorted(
            (r.reg, r.rho)
            for r in snaps.groupBy("reg").agg(F.max("rho").alias("rho")).collect()
        )
        est = merge_distinct_snapshots(snaps, p=8).collect()[0]
    finally:
        q.stop()

    flat = [x for b in batches for x in b]
    bdf = spark.createDataFrame([(x,) for x in flat], "k long")
    batch_sketch = sorted(
        (r.reg, r.rho) for r in hll_build(bdf, "k", p=8).collect()
    )
    assert stream_sketch == batch_sketch          # bit-identical lanes
    best = hll_estimate(hll_build(bdf, "k", p=8), p=8).collect()[0]
    assert est.estimate == best.estimate and est.method == best.method
    true_n = len(set(flat))
    assert abs(est.estimate / true_n - 1) < 0.25  # ~1.04/sqrt(256)*4


def test_distinct_stream_null_keys_and_guards(spark):
    import pytest

    from dataframes_jl_spark.streaming.distinct import distinct_stream

    with pytest.raises(ValueError, match="p must be"):
        distinct_stream(spark.range(1), "id", p=3)
    with pytest.raises(ValueError, match="shards"):
        distinct_stream(spark.range(1), "id", shards=0)
