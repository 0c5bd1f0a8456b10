#!/usr/bin/env python
"""Experiment: minhash LSH banded-table construction variants at sf0.1.

A: current _lsh_tables (shuffle2 ships (id, sh, hs))
B: no second shuffle — shingle+hash let1-bound inside one projection
C: shuffle2 ships (id, hs) only; verify table branches off shuffle1
"""
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from dataframes_jl_spark.functions.hof import let1
from dataframes_jl_spark.llm.dedup import (
    _MAX_HASHES,
    _shingle_hashes,
    _sig_slot,
    _verify_pairs,
    shingles,
)
from dataframes_jl_spark.session import get_spark

SF = "/root/testdata/sf0.1"
NH, BANDS, N = 64, 32, 3


def pairs_from(banded, sh_tab, threshold=0.5):
    a = banded.select("band", "bucket", F.col("id").alias("id_a"))
    b = banded.select("band", "bucket", F.col("id").alias("id_b"))
    cand = (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return _verify_pairs(cand, sh_tab, sh_tab, threshold)


def tables_A(df, par):
    from dataframes_jl_spark.llm.dedup import _lsh_tables

    return _lsh_tables(df, "doc_id", "text", NH, BANDS, N, par)


def _bb_of(hs, rows_per_band):
    sl = [_sig_slot(hs, i) for i in range(NH)]
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*sl[b * rows_per_band : (b + 1) * rows_per_band]).alias(
                    "bucket"
                ),
            )
            for b in range(BANDS)
        ]
    )


def tables_B(df, par):
    rpb = NH // BANDS
    base = df.select(F.col("doc_id").alias("id"), F.col("text").alias("__t__")).repartition(
        par, "id"
    )
    bb = let1(
        shingles("__t__", N),
        lambda sh: F.when(F.size(sh) > 0, let1(_shingle_hashes(sh), lambda hs: _bb_of(hs, rpb))),
    )
    banded = base.select("id", F.explode(bb).alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    sh_tab = base.select("id", shingles("__t__", N).alias("sh"))
    return banded, sh_tab


def tables_C(df, par):
    rpb = NH // BANDS
    base = df.select(F.col("doc_id").alias("id"), F.col("text").alias("__t__")).repartition(
        par, "id"
    )
    hashed = base.select(
        "id", _shingle_hashes(shingles("__t__", N)).alias("hs")
    ).repartition(par, "id")
    sl = [_sig_slot(F.col("hs"), i) for i in range(NH)]
    buckets = [
        F.xxhash64(*sl[b * rpb : (b + 1) * rpb]) for b in range(BANDS)
    ]
    bb_arr = F.array(
        *[F.struct(F.lit(b).alias("band"), buckets[b].alias("bucket")) for b in range(BANDS)]
    )
    banded = hashed.select(
        "id", F.explode(F.when(F.size("hs") > 0, bb_arr)).alias("bb")
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    sh_tab = base.select("id", shingles("__t__", N).alias("sh"))
    return banded, sh_tab


def main():
    spark = get_spark(app_name="exp-minhash")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    par = spark.sparkContext.defaultParallelism
    variants = {"A": tables_A, "B": tables_B, "C": tables_C}
    counts = {}
    for name, fn in variants.items():
        out = pairs_from(*fn(docs, par))
        out.write.format("noop").mode("overwrite").save()  # warm
    for rnd in range(6):
        for name, fn in variants.items():
            import gc

            gc.collect()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
            out = pairs_from(*fn(docs, par))
            t0 = time.perf_counter()
            out.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            counts.setdefault(name, []).append(round(dt, 3))
    for name, fn in variants.items():
        n = pairs_from(*fn(docs, par)).count()
        print(name, "times:", counts[name], "min:", min(counts[name]), "pairs:", n)


if __name__ == "__main__":
    main()
