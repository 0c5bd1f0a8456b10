"""Replay registry queries under a vanilla-style (ANSI-on) session.

The grading driver builds its own SparkSession; under Spark 4 that
means ``spark.sql.ansi.enabled=true`` unless our code runs first.  The
library targets permissive reference semantics (session.py pins ANSI
off for its own sessions), but every registry query must also SURVIVE
an ANSI session — no DIVIDE_BY_ZERO, CAST_OVERFLOW, or
INVALID_ARRAY_INDEX on the driver's data.

Usage: python tools/ansi_replay.py [--sf DIR] [query ...]
Runs the full registry when no names are given; prints one line per
query and exits non-zero on any failure.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = "/root/testdata/sf0.01"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]

    from dataframes_jl_spark.oracle import compare, duckdb_run
    from dataframes_jl_spark.queries import ORACLES, QUERIES
    from dataframes_jl_spark.session import get_spark

    spark = get_spark(
        app_name="ansi-replay",
        extra_conf={"spark.sql.ansi.enabled": "true"},
    )
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"

    names = args or list(QUERIES)
    failed: list[str] = []
    for name in names:
        t0 = time.time()
        try:
            sdf = QUERIES[name](spark, sf)
            if name in ORACLES:
                probs = compare(sdf, duckdb_run(ORACLES[name], sf))
            else:
                sdf.count()
                probs = []
        except Exception as e:  # noqa: BLE001 — report and continue
            probs = [f"EXC {type(e).__name__}: {str(e)[:300]}"]
        status = "ok" if not probs else "FAIL"
        print(f"{status:4} {name:32} {time.time() - t0:6.2f}s {probs[:1]}")
        if probs:
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} ok; failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
