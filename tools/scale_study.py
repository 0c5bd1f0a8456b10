#!/usr/bin/env python
"""Scaling-exponent study: run the heaviest headline queries at sf0.1
(driver data) and sf1 (tools/gen_scale_data.py replica, 10x rows) and
report per-query wall time plus the empirical scaling exponent
``log10(t_sf1 / t_sf0.1)`` — 1.0 = linear, <1 sub-linear (fixed
overheads amortizing), >1 super-linear (a quadratic term or a skewed
shuffle surfacing). Writes/refreshes the table in SCALING.md.

Usage: python tools/scale_study.py [sf1_dir]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"

# the queries whose 100 TB behavior the design argues for: every banded/
# bucketed dedup path, the probe-side-broadcast ANN/decontaminate paths,
# the inverted-index BM25, the TPC-H join/agg shapes, and the new
# span-level dedup
STUDY = [
    "q01_pricing_summary",
    "q03_nation_revenue",
    "q_dedup_minhash_lsh",
    "q_dedup_simhash",
    "q_dedup_spans",
    "q_bm25_search",
    "q_ann_bruteforce",
    "q_decontaminate",
    "q_vocab_approx",
    "q_kmeans_clusters",
]

# expected shapes, stated up front so the table reads as a claim check:
# sub-linear-to-linear everywhere; q_ann_bruteforce is O(|Q| * N) with a
# FIXED 20-query probe set -> linear in N by construction.


def _time_query(q, spark, sf_dir, repeats=3) -> float:
    import gc

    best = float("inf")
    for _ in range(repeats):
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        df = q(spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> int:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else os.path.join(".scale_data", "sf1")
    if not os.path.isdir(sf1):
        print(f"missing {sf1}: run tools/gen_scale_data.py first", file=sys.stderr)
        return 1

    from dataframes_jl_spark.queries import QUERIES
    from dataframes_jl_spark.session import get_spark

    spark = get_spark(app_name="djs-scale-study")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for name in STUDY:
        q = QUERIES[name]
        # warm both scales once (codegen, parquet footers)
        q(spark, SF01).write.format("noop").mode("overwrite").save()
        q(spark, sf1).write.format("noop").mode("overwrite").save()
        t_small = _time_query(q, spark, SF01)
        t_big = _time_query(q, spark, sf1)
        exp = round(math.log10(t_big / t_small), 2) if t_small > 0 else None
        rows.append((name, t_small, t_big, exp))
        print(f"{name:28s} sf0.1={t_small:7.3f}s sf1={t_big:7.3f}s exponent={exp}")

    lines = [
        "# SCALING — empirical scaling exponents",
        "",
        "10x row-count step: sf0.1 (driver parquet) vs sf1 (tools/",
        "gen_scale_data.py replica: 10x rows, shifted keys, per-replica",
        "token-suffixed document text so cross-replica docs are NOT",
        "near-dups — the near-dup pair count scales linearly, which is",
        "the honest corpus-growth model). local[32], noop sink, min of 3",
        "after warm-up. exponent = log10(t_sf1/t_sf0.1): 1.0 = linear,",
        "<1 = fixed overheads still amortizing at this scale, >1 =",
        "super-linear term (investigate before trusting at 100 TB).",
        "",
        "| query | sf0.1 (s) | sf1 (s) | exponent |",
        "|---|---|---|---|",
    ]
    for name, t_small, t_big, exp in rows:
        lines.append(f"| {name} | {t_small} | {t_big} | {exp} |")
    lines.append("")
    with open("SCALING.md", "w") as fh:
        fh.write("\n".join(lines))
    print("wrote SCALING.md")
    return 0


if __name__ == "__main__":
    sys.exit(main())
