#!/usr/bin/env python
"""Round-16 microscope: per-query job/stage accounting.

For each query: warm once, drain, then run the noop action inside a
dedicated job group and report wall seconds, number of Spark jobs,
number of stages, and summed task time — separating "how many
sequential stage-jobs does this chain schedule" (the fold-chain
overhead hypothesis, r15 verdict #4) from "how much work do the tasks
do".

Usage: python tools/profile_jobs_r16.py q_mood_median_lean q_conformal
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    from dataframes_jl_spark.queries import QUERIES
    from dataframes_jl_spark.session import get_spark

    spark = get_spark(app_name="djs-profile-r16")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # same worker prefork as bench.py
    def _touch(it):
        import numpy as np

        for batch in it:
            yield batch.assign(x=np.int64(0))

    cores = sc.defaultParallelism
    (spark.range(cores * 4, numPartitions=cores)
        .mapInPandas(_touch, "id long, x long")
        .write.format("noop").mode("overwrite").save())

    import gc

    def _drain():
        spark.catalog.clearCache()
        gc.collect()
        try:
            jvm = sc._jvm
            jvm.System.gc()
        except Exception:
            pass
        time.sleep(0.3)

    out = {}
    for name in names:
        fn = QUERIES[name]
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        _drain()
        df = fn(spark, SF_DIR)
        grp = f"prof:{name}"
        sc.setJobGroup(grp, name)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        st = sc.statusTracker()
        jobs = st.getJobIdsForGroup(grp)
        n_stages = 0
        n_tasks = 0
        for j in jobs:
            ji = st.getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds:
                si = st.getStageInfo(s)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        out[name] = {
            "wall": round(wall, 3),
            "jobs": len(jobs),
            "stages": n_stages,
            "tasks": n_tasks,
        }
        print(name, out[name], file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
