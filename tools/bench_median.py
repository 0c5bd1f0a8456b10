#!/usr/bin/env python
"""Median-of-3 battery record (round-11 ask #5).

A single bench.py run is one draw from a ±10% ambient distribution
(JVM layout, page cache, GC phase): round 11's committed snapshot
(41.9 s) and the driver's post-commit re-run (46.3 s) differed by
10.5% with zero per-query regressions. The round RECORD should not
depend on which JVM ran last, so the committed BENCH_LOCAL_r{N} is
now produced by this wrapper: three FRESH bench.py processes (three
JVMs — within-JVM repeats share warmup state and undercount the
ambient spread), per-query MEDIAN wall, total = sum of medians.

Usage:  python tools/bench_median.py            # 3 runs, prints record
        python tools/bench_median.py --runs 5
Writes nothing; redirect stdout to BENCH_LOCAL_r{N}.json. Run on an
IDLE machine — concurrent pytest/Spark inflates walls 2-3x.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    runs = 3
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    records = []
    for i in range(runs):
        proc = subprocess.run(
            [sys.executable, os.path.join(HERE, "bench.py")],
            capture_output=True,
            text=True,
            cwd=HERE,
        )
        line = None
        for ln in proc.stdout.splitlines():
            ln = ln.strip()
            if ln.startswith("{") and '"metric"' in ln:
                line = ln
        if line is None:
            print(f"run {i + 1}/{runs}: no JSON line", file=sys.stderr)
            print(proc.stdout[-2000:], file=sys.stderr)
            print(proc.stderr[-2000:], file=sys.stderr)
            return 1
        rec = json.loads(line)
        records.append(rec)
        print(
            f"run {i + 1}/{runs}: total {rec['value']}s",
            file=sys.stderr,
            flush=True,
        )

    names = list(records[0]["queries"])
    med = {
        n: round(statistics.median(r["queries"][n] for r in records), 3)
        for n in names
    }
    out = dict(records[-1])  # carries sf / notes / vs_prior shape
    out["queries"] = med
    out["value"] = round(sum(med.values()), 3)
    out["protocol"] = (
        f"median of {runs} fresh-JVM bench.py runs per query "
        f"(totals per run: {[r['value'] for r in records]}); "
        "single-run records are one draw from a ~±10% ambient band"
    )
    # recompute vs_prior against the same prior bench.py used, from
    # the MEDIAN walls
    vp = records[-1].get("vs_prior")
    if vp and vp.get("prior_total"):
        sys.path.insert(0, HERE)
        import bench as _b

        prior = _b._latest_local_bench() or _b._latest_recorded_bench()
        ref = (prior or {}).get("queries", {})
        out["vs_prior"] = {
            "prior_total": prior.get("value") if prior else None,
            "ratio": (
                round(out["value"] / prior["value"], 3)
                if prior and prior.get("value")
                else None
            ),
            "regressed": {
                n: {"now": t, "was": ref[n], "ratio": round(t / ref[n], 2)}
                for n, t in med.items()
                if n in ref and ref[n] > 0 and t / ref[n] > 1.5
            },
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
