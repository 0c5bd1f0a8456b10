#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line with per-query wall seconds.

Execution is measured with the noop sink (full computation, no result
serialization to the driver), after a warm-up action to amortize JVM/
codegen startup into none of the measured numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: one per operator family (filter+agg, multi-join, window,
# dedup, reshape, text) — extend as operators land
HEADLINE = [
    "q01_pricing_summary",
    "q03_nation_revenue",
    "q06_forecast_revenue",
    "q_window_topk_per_group",
    "q_cumulative_user_value",
    "q_pivot_status",
    "q_join_left",
    "q_distinct",
    "q_dedup_minhash_lsh",
    "q_dedup_simhash",
    "q_text_stats",
    "q_quality_score",
    "q_ann_bruteforce",
    "q_multimodal_decode",
    "q_sessionize",
    "q05_local_supplier_volume",
    "q_asof_join",
    "q_range_join",
]


def main() -> None:
    from dataframes_jl_spark.queries import QUERIES
    from dataframes_jl_spark.session import get_spark

    spark = get_spark(app_name="djs-bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in QUERIES]
    # warm-up pass: JVM, codegen caches, parquet footers, python workers —
    # measured numbers are steady-state throughput, not cold-start
    for name in names:
        QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
