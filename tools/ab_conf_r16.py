#!/usr/bin/env python
"""Interleaved A/B of one boolean session conf: alternates fresh
subprocess sessions A(conf=false)/B(conf=true), min-of-reps per side,
per query. Ambient drift hits both sides equally (r15 noise protocol).

Usage: python tools/ab_conf_r16.py <conf-key> q1 q2 ... [--alts N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time, gc
sys.path.insert(0, {repo!r})
from dataframes_jl_spark.session import get_spark
spark = get_spark(app_name="ab", extra_conf={{{key!r}: {val!r}}})
spark.sparkContext.setLogLevel("ERROR")
assert spark.conf.get({key!r}) == {val!r}
def _touch(it):
    import numpy as np
    for b in it: yield b.assign(x=np.int64(0))
cores = spark.sparkContext.defaultParallelism
spark.range(cores*4, numPartitions=cores).mapInPandas(_touch,"id long, x long").write.format("noop").mode("overwrite").save()
from dataframes_jl_spark.queries import QUERIES
sf = "/root/testdata/sf0.1"
out = {{}}
for name in {names!r}:
    fn = QUERIES[name]
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    best = 9e9
    for _ in range(2):
        spark.catalog.clearCache(); gc.collect(); time.sleep(0.1)
        df = fn(spark, sf)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    out[name] = round(best, 3)
print("RESULT " + json.dumps(out))
"""


def run_side(key: str, val: str, names: list[str]) -> dict:
    code = CHILD.format(repo=REPO, key=key, val=val, names=names)
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=900,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"side {val} failed: {p.stderr[-2000:]}")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    key, names = args[0], args[1:]
    alts = 3
    for a in sys.argv[1:]:
        if a.startswith("--alts"):
            alts = int(a.split("=")[1])
    best = {"false": {}, "true": {}}
    for i in range(alts):
        for val in ("false", "true"):
            r = run_side(key, val, names)
            for n, t in r.items():
                cur = best[val].get(n)
                best[val][n] = t if cur is None else min(cur, t)
            print(f"alt {i} {val}: {r}", file=sys.stderr)
    print(json.dumps({
        "conf": key,
        "false": best["false"],
        "true": best["true"],
        "ratio_true_over_false": {
            n: round(best["true"][n] / best["false"][n], 3)
            for n in names if best["false"].get(n)
        },
    }, indent=1))


if __name__ == "__main__":
    main()
