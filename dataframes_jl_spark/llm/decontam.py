"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

The standard training-data hygiene step (beyond the reference's scope —
it has no text operators at all): before training, every document whose
n-grams overlap an eval benchmark above a threshold is dropped so the
model cannot memorize test answers.

Scale shape (the part that matters at 100 TB):

- The EVAL side is always small (benchmarks are thousands of documents,
  not billions). Its exploded shingle table is **broadcast**, so the
  corpus-side probe is a map-only broadcast hash join — the 100 TB train
  corpus is scanned once, never shuffled on shingle.
- Only matching (train, eval, shingle) rows survive the join; the
  per-pair aggregation shuffles just those hits (bounded by eval size x
  contamination rate), not the corpus.
- ``hash_shingles=True`` joins on ``xxhash64(shingle)`` longs instead of
  raw n-gram strings — smaller broadcast table and cheaper probe-side
  equality, at a ~1e-9 per-pair collision risk (can only overcount
  ``common`` by 1). Off by default because raw strings are the
  oracle-exact baseline.

Everything is pure Column expressions (codegen, no UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles


def ngram_overlap(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    hash_shingles: bool = False,
) -> DataFrame:
    """Per (train_id, eval_id) pair with >=1 shared distinct word
    n-gram: ``common`` shared-shingle count and ``coverage`` = the
    fraction of the EVAL doc's distinct n-grams present in the train
    doc (the decontamination signal: how much of the benchmark item the
    training document contains).
    """
    par = train.sparkSession.sparkContext.defaultParallelism

    def exploded(df: DataFrame, id_alias: str, keep_n: bool) -> DataFrame:
        sh = (
            df.select(F.col(id_col).alias(id_alias), F.col(text_col).alias("__t__"))
            .repartition(par, id_alias)
            .select(id_alias, shingles("__t__", n).alias("sh"))
        )
        cols = [id_alias]
        if keep_n:
            sh = sh.withColumn("n_eval_sh", F.size("sh"))
            cols.append("n_eval_sh")
        # explode_OUTER, not explode: for a plain explode Catalyst infers
        # `size(sh) > 0` and pushes the whole shingle expression below the
        # repartition Exchange into the (often single-partition) scan —
        # the n-gram build then runs twice, once serially. explode_outer
        # triggers no filter inference; dropping the null rows afterwards
        # keeps the semantics and leaves the build 1x, post-exchange.
        ex = sh.select(*cols, F.explode_outer("sh").alias("shingle")).filter(
            F.col("shingle").isNotNull()
        )
        if hash_shingles:
            ex = ex.withColumn("shingle", F.xxhash64("shingle"))
        return ex

    tr = exploded(train, "train_id", keep_n=False)
    ev = F.broadcast(exploded(eval_df, "eval_id", keep_n=True))
    return (
        tr.join(ev, on="shingle")
        .groupBy("train_id", "eval_id", "n_eval_sh")
        .agg(F.count(F.lit(1)).alias("common"))
        .select(
            "train_id",
            "eval_id",
            "common",
            # eval docs shorter than the shingle width have 0 shingles;
            # NULL coverage, never an ANSI DIVIDE_BY_ZERO
            F.try_divide(F.col("common"), F.col("n_eval_sh")).alias("coverage"),
        )
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    hash_shingles: bool = False,
) -> DataFrame:
    """Training corpus minus contaminated documents.

    A train doc is contaminated when its best eval-doc coverage reaches
    ``threshold``. Implemented as a broadcast left-anti join on the
    flagged id set, so the corpus passes through untouched except for
    the dropped rows.
    """
    flagged = (
        ngram_overlap(train, eval_df, id_col, text_col, n, hash_shingles)
        .filter(F.col("coverage") >= threshold)
        .select(F.col("train_id").alias(id_col))
        .distinct()
    )
    return train.join(F.broadcast(flagged), on=id_col, how="left_anti")


def contamination_report(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    hash_shingles: bool = False,
) -> DataFrame:
    """Per contaminated train doc: how many eval docs it hits and its
    worst (max) coverage — the audit artifact a data pipeline logs
    before dropping documents."""
    ov = ngram_overlap(train, eval_df, id_col, text_col, n, hash_shingles)
    return (
        ov.filter(F.col("coverage") >= threshold)
        .groupBy("train_id")
        .agg(
            F.count(F.lit(1)).alias("n_eval_hits"),
            F.max("common").alias("max_common"),
            F.max("coverage").alias("max_coverage"),
        )
    )
