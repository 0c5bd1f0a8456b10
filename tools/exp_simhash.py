#!/usr/bin/env python
"""Experiment: simhash signature construction — shuffle barriers (A,
current) vs nested let1 bindings in one projection (B)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column, functions as F

from dataframes_jl_spark.functions.hof import let1
from dataframes_jl_spark.llm.dedup import simhash_band_pairs, simhash_signatures
from dataframes_jl_spark.llm.text import tokens
from dataframes_jl_spark.session import get_spark

SF = "/root/testdata/sf0.1"


def sigs_B(df, par):
    base = df.select(F.col("doc_id").alias("id"), F.col("text").alias("__t__")).repartition(
        par, "id"
    )

    def bitvec(h: Column) -> Column:
        return F.array(
            *[F.shiftright(h, p).bitwiseAND(F.lit(1)).cast("int") for p in range(64)]
        )

    def pack(ones: Column, n_tok: Column) -> Column:
        sig = None
        for p in range(64):
            bit = F.when(
                F.element_at(ones, p + 1) * 2 > n_tok, F.lit(1).cast("bigint")
            ).otherwise(F.lit(0).cast("bigint"))
            term = F.shiftleft(bit, p)
            sig = term if sig is None else sig.bitwiseOR(term)
        return sig

    sig = let1(
        tokens("__t__"),
        lambda t: let1(
            F.aggregate(
                F.transform(t, lambda x: F.xxhash64(x)),
                F.array_repeat(F.lit(0), 64),
                lambda acc, h: F.zip_with(acc, bitvec(h), lambda x, y: x + y),
            ),
            lambda ones: pack(ones, F.size(t)),
        ),
    )
    return base.select("id", sig.alias("sig"))


def main():
    spark = get_spark(app_name="exp-simhash")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    par = spark.sparkContext.defaultParallelism
    variants = {
        "A": lambda: simhash_band_pairs(simhash_signatures(docs, "doc_id", "text"), 12),
        "B": lambda: simhash_band_pairs(sigs_B(docs, par), 12),
    }
    counts = {}
    for name, fn in variants.items():
        fn().write.format("noop").mode("overwrite").save()
    for _ in range(6):
        for name, fn in variants.items():
            import gc

            gc.collect()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
            out = fn()
            t0 = time.perf_counter()
            out.write.format("noop").mode("overwrite").save()
            counts.setdefault(name, []).append(round(time.perf_counter() - t0, 3))
    for name, fn in variants.items():
        n = fn().count()
        print(name, "times:", counts[name], "min:", min(counts[name]), "pairs:", n)


if __name__ == "__main__":
    main()
