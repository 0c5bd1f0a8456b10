#!/usr/bin/env python
"""Round-16 measurement harness (guide §1): per-query solo timing with
the noop sink + captured `.explain("formatted")` plans.

Usage:
    python tools/measure_r16.py [--plans] [--reps N] [query ...]

With no query names, measures the full bench HEADLINE battery. Writes
plans to plans/r16/<query>_<tag>.txt (tag from --tag, default
"before") and prints one JSON line with per-query min-of-N seconds.

Separate from bench.py on purpose: bench.py is the driver contract and
must not change methodology; this tool is the engineer-facing
microscope (solo timing isolates each query from battery ordering).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--plans", action="store_true", help="capture explain output")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--top", type=int, default=0,
                    help="only the N slowest per BENCH_LOCAL prior")
    args = ap.parse_args()

    from bench import HEADLINE, _latest_local_bench
    from dataframes_jl_spark.queries import QUERIES
    from dataframes_jl_spark.session import get_spark

    names = args.queries or [n for n in HEADLINE if n in QUERIES]
    if args.top:
        prior = (_latest_local_bench() or {}).get("queries", {})
        names = sorted(names, key=lambda n: -prior.get(n, 0.0))[: args.top]

    spark = get_spark(app_name="djs-measure-r16")
    spark.sparkContext.setLogLevel("ERROR")

    plans_dir = os.path.join(REPO, "plans", "r16")
    os.makedirs(plans_dir, exist_ok=True)

    # same worker prefork as bench.py so mapInPandas seats aren't
    # charged the numpy import
    def _touch(it):
        import numpy as np

        for batch in it:
            yield batch.assign(x=np.int64(0))

    cores = spark.sparkContext.defaultParallelism
    (spark.range(cores * 4, numPartitions=cores)
        .mapInPandas(_touch, "id long, x long")
        .write.format("noop").mode("overwrite").save())

    import gc

    def _drain_cleanup():
        # bench.py's drain, verbatim in spirit: async System.gc()
        # cleanup otherwise bleeds into the NEXT timed window (2-4x
        # inflation on sub-second queries — bench.py's round-6 lesson)
        spark.catalog.clearCache()
        gc.collect()
        try:
            jvm = spark.sparkContext._jvm
            beans = (
                jvm.java.lang.management.ManagementFactory
                .getGarbageCollectorMXBeans()
            )

            def _gc_count():
                total = 0
                it = beans.iterator()
                while it.hasNext():
                    c = it.next().getCollectionCount()
                    if c > 0:
                        total += c
                return total

            before = _gc_count()
            jvm.System.gc()
            deadline = time.perf_counter() + 1.0
            while time.perf_counter() < deadline and _gc_count() <= before:
                time.sleep(0.02)
        except Exception:
            pass
        time.sleep(0.15)

    timings: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        if args.plans:
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        # warm-up
        spark.sparkContext.setJobDescription(f"warm:{name}")
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        for rep in range(args.reps):
            _drain_cleanup()
            df = fn(spark, SF_DIR)
            spark.sparkContext.setJobDescription(f"timed:{name}#{rep}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
        spark.sparkContext.setJobDescription(None)
        print(f"  {timings[name]:8.3f}  {name}", file=sys.stderr)

    out = {
        "metric": "solo_query_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": dict(sorted(timings.items(), key=lambda x: -x[1])),
        "sf": SF_DIR,
        "tag": args.tag,
    }
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
