"""Replay registry queries under a vanilla-style (ANSI-on) session.

The grading driver builds its own SparkSession; under Spark 4 that
means ``spark.sql.ansi.enabled=true`` unless our code runs first.  The
library targets permissive reference semantics (session.py pins ANSI
off for its own sessions), but every registry query must also SURVIVE
an ANSI session — no DIVIDE_BY_ZERO, CAST_OVERFLOW, or
INVALID_ARRAY_INDEX on the driver's data.

Usage: python tools/ansi_replay.py [--sf DIR] [query ...]
Runs the full registry when no names are given; prints one line per
query and exits non-zero on any failure. Unknown flags and unknown
query names fail loudly up front (argparse) instead of silently
replaying the wrong dataset.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument(
        "--sf",
        default="/root/testdata/sf0.01",
        metavar="DIR",
        help="scale-factor data directory (default %(default)s)",
    )
    ap.add_argument(
        "queries",
        nargs="*",
        help="registry query names (default: the full registry)",
    )
    opts = ap.parse_args()

    from dataframes_jl_spark.oracle import compare, duckdb_run
    from dataframes_jl_spark.queries import ORACLES, QUERIES
    from dataframes_jl_spark.session import get_spark

    unknown = [n for n in opts.queries if n not in QUERIES]
    if unknown:
        ap.error(f"unknown queries {unknown}; names come from the registry")

    spark = get_spark(
        app_name="ansi-replay",
        extra_conf={"spark.sql.ansi.enabled": "true"},
    )
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"

    names = opts.queries or list(QUERIES)
    failed: list[str] = []
    for name in names:
        t0 = time.time()
        try:
            sdf = QUERIES[name](spark, opts.sf)
            if name in ORACLES:
                probs = compare(sdf, duckdb_run(ORACLES[name], opts.sf))
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
