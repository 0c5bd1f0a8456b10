#!/usr/bin/env python
"""SemDeDup scale measurement (the SCALING.md separate protocol).

Replicates the round-4 measurement exactly: embedding replicas
(.scale_data/emb_sf{1,10} from tools/gen_scale_data.py), k ~ sqrt(n)
driver-fit centroids (5 Lloyd iterations, fit OUTSIDE the timer),
threshold 0.3, noop sink, min of 3 timed runs of the PAIRS stage.
Round-5 under test: the assigned base auto-persists on the numpy
assignment path, so both pair-join sides read one materialization.

Usage: python tools/exp_semdedup.py [sf1|sf10 ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POINTS = {
    "sf0.1": "/root/testdata/sf0.1/embeddings.parquet",
    "sf1": ".scale_data/emb_sf1",
    "sf10": ".scale_data/emb_sf10",
}


def main() -> int:
    from dataframes_jl_spark.llm.cluster import fit_kmeans_driver, semdedup_pairs
    from dataframes_jl_spark.session import get_spark

    spark = get_spark(app_name="djs-semdedup-exp")
    spark.sparkContext.setLogLevel("ERROR")
    targets = sys.argv[1:] or ["sf1", "sf10"]
    for name in targets:
        path = POINTS[name]
        if not os.path.exists(path.split("/")[0] if not path.startswith("/") else path):
            print(f"{name}: missing {path}; run tools/gen_scale_data.py", file=sys.stderr)
            continue
        emb = spark.read.parquet(path)
        n = emb.count()
        k = max(8, int(math.sqrt(n)))
        centroids = fit_kmeans_driver(emb, k, "embedding", seed=42, max_iter=5)
        best = float("inf")
        for _ in range(3):
            import gc

            gc.collect()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            pairs = semdedup_pairs(emb, centroids, threshold=0.3)
            pairs.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: n={n} k={k} pairs_wall={best:.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
