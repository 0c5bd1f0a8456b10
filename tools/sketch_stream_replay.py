#!/usr/bin/env python
"""Rate-limited sf0.1 stream replay of the SKETCH lanes (round-12 ask
#8): STREAMPARITY.md proved the harness on CUSUM; this tool drives the
remaining two stateful-sketch streams — sharded HLL distinct and
sharded Misra-Gries top-k — through REAL Structured Streaming (file
source, applyInPandasWithState, update-mode emissions across many
micro-batches) at driver scale and asserts each lane's parity
contract against the batch core over the same rows:

- HLL: per-register rhos only grow, so the max-merge of EVERY
  accumulated emission (stale snapshots included) must be
  BIT-IDENTICAL to the batch ``hll_build`` sketch, and the estimate
  identical to the batch estimate.
- Misra-Gries: stored counts are batch-boundary-dependent by design,
  so the contract is the pigeonhole GUARANTEE, checked exactly:
  (a) every true heavy hitter (freq·k > n) of the exact batch count
  appears in the merged candidate set; (b) every candidate's exact
  frequency sits inside [lb_count, ub_count]; (c) n_total equals the
  exact row count.

Mechanics mirror tools/cusum_stream_replay.py: events re-sharded into
N chunk files in event_id order so every micro-batch UPDATES state
emitted by earlier ones, streamed with maxFilesPerTrigger=1, sunk to
memory in update mode, merged by the real consumer-side helpers.

Usage:  python tools/sketch_stream_replay.py [--sf-dir DIR] [--shards N]
Appends/refreshes two sections in STREAMPARITY.md (and prints them).
Exit 0 = both lanes pass, 1 = any violation.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

_MARK = "<!-- sketch-stream-replay -->"


def _shard_files(spark, ev, tmp: str, shards: int) -> str:
    from pyspark.sql import functions as F

    chunk_dir = os.path.join(tmp, "chunks")
    os.makedirs(chunk_dir)
    for s in range(shards):
        ev.filter(F.pmod(F.col("event_id"), F.lit(shards)) == s).coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(tmp, f"_w{s}"))
        part = [
            f
            for f in os.listdir(os.path.join(tmp, f"_w{s}"))
            if f.endswith(".parquet")
        ][0]
        shutil.move(
            os.path.join(tmp, f"_w{s}", part),
            os.path.join(chunk_dir, f"chunk_{s:02d}.parquet"),
        )
    return chunk_dir


def run(sf_dir: str, shards: int = 8) -> tuple[bool, str]:
    from pyspark.sql import functions as F

    from dataframes_jl_spark.ops.bloom import hll_build, hll_estimate
    from dataframes_jl_spark.session import get_spark, load_table
    from dataframes_jl_spark.streaming.distinct import (
        distinct_stream,
        merge_distinct_snapshots,
    )
    from dataframes_jl_spark.streaming.topk import (
        heavy_hitters_stream,
        merge_hh_snapshots,
    )

    spark = get_spark(app_name="djs-sketch-replay")
    spark.sparkContext.setLogLevel("ERROR")

    P, K = 8, 50
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    n_events = ev.count()

    problems: list[str] = []
    lines: list[str] = []

    tmp = tempfile.mkdtemp(prefix="sketch_replay_")
    try:
        chunk_dir = _shard_files(spark, ev, tmp, shards)
        schema = "event_id long, user_id long"

        # ---- lane 1: sharded HLL distinct -------------------------
        t0 = time.perf_counter()
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(chunk_dir)
        )
        q = (
            distinct_stream(stream, "user_id", p=P, shards=4)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("hll_replay_sink")
            .start()
        )
        try:
            q.processAllAvailable()
            hll_batches = len(q.recentProgress)
            snaps = spark.sql("SELECT * FROM hll_replay_sink")
            hll_snaps = snaps.count()
            stream_sketch = sorted(
                (r["reg"], r["rho"])
                for r in snaps.groupBy("reg")
                .agg(F.max("rho").alias("rho"))
                .collect()
            )
            est = merge_distinct_snapshots(snaps, p=P).collect()[0]
        finally:
            q.stop()
        hll_wall = time.perf_counter() - t0

        batch_sketch = sorted(
            (r["reg"], r["rho"])
            for r in hll_build(ev, "user_id", p=P).collect()
        )
        best = hll_estimate(hll_build(ev, "user_id", p=P), p=P).collect()[0]
        if stream_sketch != batch_sketch:
            diff = set(stream_sketch) ^ set(batch_sketch)
            problems.append(
                f"HLL sketch differs on {len(diff)} (reg, rho) pairs"
            )
        if (est["estimate"], est["method"]) != (
            best["estimate"],
            best["method"],
        ):
            problems.append(
                f"HLL estimate {est['estimate']}/{est['method']} != batch"
                f" {best['estimate']}/{best['method']}"
            )
        hll_ok = not problems
        lines += [
            f"{_MARK}",
            "",
            "## Sharded HLL distinct — stream replay vs batch sketch",
            "",
            "Generated by tools/sketch_stream_replay.py (round-12 ask #8).",
            "",
            f"- events: {n_events} rows ({sf_dir}); key = user_id, p = {P}",
            f"- micro-batches: {hll_batches}; sink rows (stale register"
            f" snapshots included): {hll_snaps}",
            f"- registers compared: {len(batch_sketch)}"
            f" (max-merge over the FULL emission history)",
            f"- estimate: stream {est['estimate']} ({est['method']})"
            f" vs batch {best['estimate']} ({best['method']})",
            f"- stream-side wall: {hll_wall:.1f} s",
            "",
            (
                "Result: **bit-identical** — every (register, rho) pair and"
                " the estimate match the batch `hll_build` of the same rows."
                if hll_ok
                else "Result: **MISMATCH** — see problems below."
            ),
            "",
        ]

        # ---- lane 2: sharded Misra-Gries top-k --------------------
        # user_id alone is near-uniform at sf0.1 (no key crosses n/k —
        # a vacuously-true superset check), so the MG lane streams a
        # deterministic SKEWED key: 40% of events collapse onto three
        # hot keys (each ~13% of mass, far above the 2% threshold)
        # and the rest keep their user tail — enough distinct tail
        # keys per shard to force real MG compactions.
        skew = (
            "CASE WHEN event_id % 5 < 2 THEN 'hot_' || (event_id % 3)"
            " ELSE 'u' || user_id END"
        )
        n_before = len(problems)
        t0 = time.perf_counter()
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(chunk_dir)
            .withColumn("hh_key", F.expr(skew))
        )
        q = (
            heavy_hitters_stream(stream, "hh_key", k=K, shards=4)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("hh_replay_sink")
            .start()
        )
        try:
            q.processAllAvailable()
            hh_batches = len(q.recentProgress)
            snaps = spark.sql("SELECT * FROM hh_replay_sink")
            hh_snaps = snaps.count()
            cand = {
                r["key"]: (r["lb_count"], r["ub_count"], r["n_total"])
                for r in merge_hh_snapshots(snaps, k=K).collect()
            }
        finally:
            q.stop()
        hh_wall = time.perf_counter() - t0

        exact = {
            str(r["v"]): r["c"]
            for r in ev.withColumn("hh_key", F.expr(skew))
            .filter(F.col("hh_key").isNotNull())
            .groupBy(F.col("hh_key").alias("v"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        n_exact = sum(exact.values())
        true_hh = {kk for kk, c in exact.items() if c * K > n_exact}
        missed = sorted(true_hh - set(cand))
        if missed:
            problems.append(
                f"MG superset violated: {len(missed)} true heavy hitters"
                f" missing (e.g. {missed[:5]})"
            )
        bad_bounds = [
            (kk, lb, exact.get(kk, 0), ub)
            for kk, (lb, ub, _) in cand.items()
            if not (lb <= exact.get(kk, 0) <= ub)
        ]
        if bad_bounds:
            problems.append(
                f"MG bounds violated for {len(bad_bounds)} keys"
                f" (e.g. {bad_bounds[:3]})"
            )
        n_totals = {nt for (_, _, nt) in cand.values()}
        if n_totals and n_totals != {n_exact}:
            problems.append(
                f"MG n_total {sorted(n_totals)} != exact row count {n_exact}"
            )
        mg_ok = len(problems) == n_before
        lines += [
            "## Sharded Misra-Gries top-k — stream replay vs exact batch",
            "",
            f"- events: {n_events} rows; key = deterministic skewed mix"
            f" (3 hot keys at ~13% mass each + the user tail), k = {K},"
            f" 4 state shards",
            f"- micro-batches: {hh_batches}; sink rows (stale summaries"
            f" included): {hh_snaps}",
            f"- true heavy hitters (freq·k > n, exact): {len(true_hh)};"
            f" merged candidates: {len(cand)}",
            f"- stream-side wall: {hh_wall:.1f} s",
            "",
            (
                "Result: **guarantee holds exactly** — every true heavy"
                " hitter is in the candidate set, every candidate's exact"
                " frequency lies in [lb_count, ub_count], and n_total"
                " equals the exact row count. (MG stored counts are"
                " batch-boundary-dependent by design, so the pigeonhole"
                " contract — not bit-equality of counters — is the"
                " invariant the stream must keep.)"
                if mg_ok
                else "Result: **VIOLATION**\n\n"
                + "\n".join(f"- {p}" for p in problems[n_before:])
            ),
            "",
        ]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    return not problems, "\n".join(lines)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    shards = 8
    argv = sys.argv[1:]
    if "--sf-dir" in argv:
        sf_dir = argv[argv.index("--sf-dir") + 1]
    if "--shards" in argv:
        shards = int(argv[argv.index("--shards") + 1])
    ok, report = run(sf_dir, shards)
    path = os.path.join(HERE, "STREAMPARITY.md")
    existing = ""
    if os.path.exists(path):
        existing = open(path).read()
        # refresh: drop a previous run's sections
        if _MARK in existing:
            existing = existing[: existing.index(_MARK)].rstrip() + "\n"
    with open(path, "w") as f:
        f.write(existing.rstrip() + "\n\n" + report)
    print(report)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
