#!/usr/bin/env python
"""Generate larger scale factors from the driver's sf0.1 parquet by
K-fold replication with shifted keys — used ONLY for the scaling-
exponent study (SCALING.md), never for correctness gates.

Design notes (what makes the replication an honest scale model):

* Fact tables (lineitem, orders, customer, supplier, part, events,
  documents, embeddings) are replicated K times with every synthetic
  key shifted by ``replica * KEY_OFFSET`` so joins stay consistent
  within a replica and keys never collide across replicas.
* Dimension tables (nation, region) are NOT replicated and foreign
  keys into them (c_nationkey, s_nationkey) are NOT shifted — group-by
  cardinality on real-world dimensions stays constant as data grows,
  which is how a production corpus scales.
* Document text gets a per-replica suffix welded onto every token
  (``tok`` -> ``tok_r3``), so every shingle differs across replicas:
  cross-replica docs are NOT near-duplicates and the near-dup pair
  count scales linearly with K (replicating text verbatim would grow
  within-group pairs quadratically and fake a super-linear exponent).
* Customer names get a per-replica tag for the same reason (round-8:
  verbatim replication left each c_name duplicated K times, so
  q_fuzzy_match's CORRECT output alone was ~K^2/2 exact-dup pairs per
  name — the sf10 warm-up spilled the disk dry computing an honest but
  quadratic answer the replica design, not the plan, created). The tag
  doubles every digit of the replica number ("-r1177" for replica 17),
  so any two distinct tags are >= 2 edits apart and max_dist=1 fuzzy
  matching never pairs across replicas: pair count scales linearly,
  the model a real growing customer table follows.
* Embedding vectors get a per-replica CIRCULAR ROLL of their
  components (round-10: the same trap in embedding space — verbatim
  vectors made every replica an exact cosine-1 duplicate, so
  q_semdedup's CORRECT within-cluster pair output alone was ~K^2/2
  pairs per vector and the sf10 measurement ran ~5e9 honest pair
  evaluations). A roll is an orthogonal transform: every within-
  replica distance, norm, and cosine is EXACTLY preserved (cluster
  structure stays honest), while a vector and its rolled copy
  correlate like a lagged random series — far below any dedup
  threshold — so the near-dup pair count scales linearly, the model a
  real growing embedding corpus follows. Roll offsets are distinct
  per replica (1 + (r*7 mod 63) over dim 64), so every replica PAIR
  also sees a distinct relative lag.
* Timestamps are left unchanged — event-time range is a property of
  the window, not the corpus size.

Usage: python tools/gen_scale_data.py [K] [outdir] [--tables t1,t2]
Defaults: K=10 (i.e. sf1 from sf0.1), outdir=.scale_data/sf1, all tables
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
KEY_OFFSET = 1_000_000_000

SHIFT_KEYS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_TABLES = ["nation", "region"]


def main() -> int:
    args = list(sys.argv[1:])
    only: set[str] | None = None
    if "--tables" in args:
        i = args.index("--tables")
        only = set(args[i + 1].split(","))
        del args[i:i + 2]
    k = int(args[0]) if len(args) > 0 else 10
    out = args[1] if len(args) > 1 else os.path.join(".scale_data", "sf1")
    os.makedirs(out, exist_ok=True)

    from pyspark.sql import functions as F

    from dataframes_jl_spark.session import get_spark

    spark = get_spark(app_name="djs-gen-scale")
    spark.sparkContext.setLogLevel("ERROR")

    copy_tables = [t for t in COPY_TABLES if only is None or t in only]
    shift_tables = {
        t: ks for t, ks in SHIFT_KEYS.items() if only is None or t in only
    }
    for t in copy_tables:
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")

    for t, keys in shift_tables.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for r in range(k):
            p = df
            for c in keys:
                p = p.withColumn(c, F.col(c) + F.lit(r * KEY_OFFSET))
            if t == "documents" and r > 0:
                # weld a replica suffix onto every token: all shingles
                # differ across replicas -> no cross-replica near-dups
                p = p.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", rf"$1_r{r}")
                )
            if t == "embeddings" and r > 0:
                # per-replica circular roll (orthogonal; module doc):
                # within-replica geometry exact, cross-replica cosine
                # decorrelated — near-dup pairs scale linearly
                s = 1 + (r * 7) % 63
                p = p.withColumn(
                    "embedding",
                    F.concat(
                        F.slice(F.col("embedding"), 64 - s + 1, s),
                        F.slice(F.col("embedding"), 1, 64 - s),
                    ),
                )
            if t == "customer" and r > 0:
                # doubled-digit replica tag: any two tags differ by
                # >= 2 edits, so distance-1 fuzzy matching never pairs
                # across replicas (module docstring)
                tag = "".join(ch * 2 for ch in f"{r:02d}")
                p = p.withColumn(
                    "c_name", F.concat(F.col("c_name"), F.lit(f"-r{tag}"))
                )
            parts.append(p)
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        n_out = min(64, max(8, 4 * k))
        big.repartition(n_out).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(f"{t}: x{k} -> {out}/{t}.parquet")

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
