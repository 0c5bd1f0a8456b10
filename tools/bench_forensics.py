#!/usr/bin/env python
"""Name the battery-vs-solo bench gap (round-7 verdict #3/#7).

Protocol, one JVM per phase so phases cannot contaminate each other:

  phase solo   — fresh session: warm each suspect once, then min-of-3
                 with the bench's own drain. This is the number the
                 scale-pin harness reproduces.
  phase post   — fresh session: run ONE full battery pass (warm-up +
                 timed, exactly bench.py's loop), THEN re-measure the
                 suspects min-of-3 in the same session. If post-battery
                 min matches the battery's recorded number (slow), the
                 cause is persistent session state; if it matches solo
                 (fast), the cause is interleaving (what ran immediately
                 before the suspect inside the pass).

Each measurement snapshots JVM state first (heap used after GC, SQL
cache entries, persistent RDDs, broadcast-block count, listener-bus
queue size) so a state cause is nameable, not just detectable.

Usage: python tools/bench_forensics.py solo|post [query ...]
Prints one JSON line per phase.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SUSPECTS = ["q_dedup_spans", "q_cm_sketch", "q09_product_profit"]


def _jvm_state(spark) -> dict:
    out: dict = {}
    try:
        jvm = spark.sparkContext._jvm
        rt = jvm.java.lang.Runtime.getRuntime()
        out["heap_used_mb"] = round(
            (rt.totalMemory() - rt.freeMemory()) / 1e6, 1
        )
        out["sql_cache_entries"] = (
            spark._jsparkSession.sharedState().cacheManager().cachedData().size()
        )
        sc = spark.sparkContext._jsc.sc()
        out["persistent_rdds"] = sc.getPersistentRDDs().size()
        mf = jvm.java.lang.management.ManagementFactory
        # codegen compiles one class per generated stage; unbounded
        # growth here means metaspace/JIT pressure in late battery
        out["loaded_classes"] = mf.getClassLoadingMXBean().getLoadedClassCount()
        out["jvm_threads"] = mf.getThreadMXBean().getThreadCount()
    except Exception as e:  # diagnostics must never fail the run
        out["probe_error"] = repr(e)[:120]
    return out


def _measure(spark, names, drain, n=3) -> dict:
    from dataframes_jl_spark.queries import QUERIES

    per = {}
    for name in names:
        states = []
        best = None
        for _ in range(n):
            drain(spark)
            states.append(_jvm_state(spark))
            df = QUERIES[name](spark, SF_DIR)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            best = dt if best is None else min(best, dt)
        per[name] = {"min_sec": best, "pre_state": states[-1]}
    return per


def _drain(spark):
    # bench.py's _drain_cleanup, verbatim semantics
    import gc

    spark.catalog.clearCache()
    gc.collect()
    try:
        jvm = spark.sparkContext._jvm
        beans = (
            jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
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


def main() -> None:
    phase = sys.argv[1] if len(sys.argv) > 1 else "solo"
    names = sys.argv[2:] or SUSPECTS

    from dataframes_jl_spark.queries import QUERIES
    from dataframes_jl_spark.session import get_spark

    spark = get_spark(app_name=f"djs-forensics-{phase}")
    spark.sparkContext.setLogLevel("ERROR")

    if phase == "solo":
        for name in names:  # warm-up, as bench.py does
            QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
        result = _measure(spark, names, _drain)
        print(json.dumps({"phase": "solo", "sf_dir": SF_DIR, "per": result}))
        return

    if phase == "post":
        import bench

        battery = [n for n in bench.HEADLINE if n in QUERIES]
        for name in battery:  # warm-up pass
            QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
        pass_timings = {}
        for name in battery:  # one timed pass, bench.py's loop shape
            _drain(spark)
            df = QUERIES[name](spark, SF_DIR)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            pass_timings[name] = round(time.perf_counter() - t0, 3)
        state_after_battery = _jvm_state(spark)
        result = _measure(spark, names, _drain)
        print(
            json.dumps(
                {
                    "phase": "post",
                    "sf_dir": SF_DIR,
                    "battery_pass": {n: pass_timings[n] for n in names},
                    "state_after_battery": state_after_battery,
                    "per": result,
                }
            )
        )
        return

    raise SystemExit(f"unknown phase {phase!r}")


if __name__ == "__main__":
    main()
