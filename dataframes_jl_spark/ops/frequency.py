"""Exact heavy hitters with a Misra-Gries shuffle bound.

The operator answers "which keys exceed a 1/k share of the table?" —
power users, hot shards, dominant n-grams — EXACTLY, without ever
shuffling the full distinct-key set. A plain
``groupBy(col).count().filter(cnt*k > n)`` is correct but its shuffle
width is the number of DISTINCT keys: over token or n-gram columns at
100 TB that is billions-to-trillions of rows of shuffle for an answer
of at most k rows. Here the shuffle is bounded by ``partitions x k``
regardless of key cardinality:

1. One pass builds a Misra-Gries summary (Misra & Gries 1982) per
   input partition inside ``mapInPandas`` — at most ``k`` counters per
   partition, batch-merged via vectorized ``value_counts`` so the
   Python loop touches counters, not rows. Each summary also carries
   its partition's non-null row count in a sentinel row, so the global
   ``n`` comes from the same scan (no separate count job).
2. The union of per-partition candidate keys is a guaranteed SUPERSET
   of the true heavy hitters: if ``freq(x) > n/k`` globally then by
   pigeonhole some partition has ``freq_p(x) > n_p/k > n_p/(k+1)``,
   and an MG summary with k counters retains every key whose
   partition frequency exceeds ``n_p/(k+1)``.
3. A second scan exact-counts ONLY the candidates (a broadcast
   semi-join of at most ``partitions x k`` keys) and applies the
   threshold. The result is exact and deterministic — the sketch only
   bounds the shuffle, it never decides membership.

Cost: two scans of the input instead of one, in exchange for a shuffle
that cannot exceed ``partitions x k`` rows. At 100 TB the second scan
is sequential parquet read (cheap, column-pruned to one column); the
avoided shuffle of the full key set is the bottleneck that matters.

Reference parity: the reference engine has no heavy-hitter operator;
this is part of the beyond-reference LLM-pipeline surface (corpus
token/domain audits) the build brief asks for.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def _mg_compact(counters: dict, k: int) -> dict:
    """One Misra-Gries decrement round: subtract the (k+1)-th largest
    stored count from every counter and drop the non-positive ones,
    leaving at most k. Each round removes >= (k+1)*dec total mass, so
    cumulative decrement per partition is <= n_p/(k+1) — the classic
    MG error bound, which the superset argument in the module
    docstring relies on."""
    if len(counters) <= k:
        return counters
    vals = sorted(counters.values(), reverse=True)
    dec = vals[k]
    return {key: c - dec for key, c in counters.items() if c > dec}


def mg_partition_summaries(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: at most k (key, lower-bound
    count) rows per input partition, plus one sentinel row (key NULL)
    carrying the partition's non-null row count. Arrow-batched; the
    per-row work is pandas ``value_counts`` (C speed), the Python loop
    is over counter entries only (<= 4k at any time)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    field = df.schema[col]
    out_schema = StructType(
        [
            StructField(field.name, field.dataType, True),
            StructField("__mg_cnt__", LongType(), False),
        ]
    )
    # compact lazily at 4k entries: amortizes the sort to O(log) rounds
    # per partition while keeping the dict small enough to stay cheap.
    bound = 4 * k

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        n_p = 0
        key_dtype = None
        for pdf in batches:
            if key_dtype is None:
                key_dtype = pdf[col].dtype
            vc = pdf[col].value_counts(dropna=True)
            n_p += int(vc.sum())
            for key, c in vc.items():
                counters[key] = counters.get(key, 0) + int(c)
            if len(counters) > bound:
                counters = _mg_compact(counters, k)
        counters = _mg_compact(counters, k)
        keys = list(counters.keys())
        # keep keys in a dtype that round-trips EXACTLY through Arrow:
        # appending a plain None to an int64 list coerces the column to
        # float64, silently rounding bigint keys above 2^53 (which then
        # miss the exact-count semi-join). Nullable Int64 keeps the
        # sentinel NULL without touching key bits.
        if key_dtype is not None and pd.api.types.is_integer_dtype(key_dtype):
            key_arr = pd.array([int(key) for key in keys] + [pd.NA], dtype="Int64")
        else:
            key_arr = pd.Series(keys + [None], dtype="object")
        yield pd.DataFrame(
            {
                col: key_arr,
                "__mg_cnt__": [counters[key] for key in keys] + [n_p],
            }
        )

    # drop NULL keys BEFORE Arrow: an int64 column containing nulls
    # arrives in pandas as float64, corrupting >2^53 keys at the batch
    # boundary (same failure mode as the sentinel, one layer earlier).
    return (
        df.select(col).filter(F.col(col).isNotNull()).mapInPandas(summarize, out_schema)
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int,
    *,
    summaries: DataFrame | None = None,
    collect_limit: int = 1_000_000,
) -> DataFrame:
    """All values of ``col`` with count strictly greater than n/k
    (n = non-null rows), exactly, with shuffle bounded by
    ``partitions x k`` instead of the distinct-key count.

    Returns (col, cnt, share) sorted nowhere — at most k rows, so the
    caller can order. ``summaries`` lets a caller reuse a
    pre-materialized sketch DataFrame.

    The candidate summary is BOUNDED at ``partitions x (k+1)`` rows by
    the MG invariant — but unlike the repo's other bounded fits that
    bound GROWS with cluster size (50k partitions x k=1000 is 50M
    rows). So the driver round-trip is gated: when the static bound
    ``input_partitions x (k+1)`` fits under ``collect_limit``, the
    summary collects once and the candidate set ships back out as a
    broadcast literal (one mapInPandas scan, materialized exactly
    once). Above the limit NOTHING touches the driver: ``n`` rides the
    plan as a broadcast 1-row cross join and the candidates come from
    a distinct over the summary DataFrame feeding a semi-join. That
    path evaluates the summary subtree twice (the n-branch and the
    candidate-branch), trading one extra column-pruned scan for a
    driver footprint of zero — the right trade at exactly the cluster
    sizes where the bound is large. Either path is exact: the superset
    property holds per-evaluation and ``n`` is the true non-null count
    regardless of partitioning."""
    spark = df.sparkSession
    if summaries is None:
        summaries = mg_partition_summaries(df, col, k)
    # static bound, known without running a job: partitions x (k+1)
    bound_rows = df.rdd.getNumPartitions() * (k + 1)
    if bound_rows > collect_limit:
        return _heavy_hitters_distributed(df, col, k, summaries)
    rows = summaries.collect()
    n = sum(r[1] for r in rows if r[0] is None)
    cand_keys = sorted({r[0] for r in rows if r[0] is not None})
    if n == 0 or not cand_keys:
        empty = df.select(
            F.col(col),
            F.lit(0).cast("long").alias("cnt"),
            F.lit(0.0).alias("share"),
        )
        return empty.filter(F.lit(False))
    field = df.schema[col]
    cands = spark.createDataFrame(
        [(key,) for key in cand_keys], StructType([StructField(field.name, field.dataType, True)])
    )
    exact = (
        df.select(col)
        .filter(F.col(col).isNotNull())
        .join(F.broadcast(cands), col, "semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * k > F.lit(n))
    )
    return exact.withColumn("share", F.col("cnt") / F.lit(float(n)))


def _heavy_hitters_distributed(
    df: DataFrame, col: str, k: int, summaries: DataFrame
) -> DataFrame:
    """Driver-free verdict: ``n`` and the candidate set stay in-plan.

    The sentinel rows (key NULL) aggregate to the exact non-null count
    ``n`` — one row, broadcast into the verdict via cross join; the
    non-sentinel keys distinct into the candidate table for the
    semi-join. No collect, no createDataFrame, no persist: the summary
    mapInPandas runs once per branch (two column-pruned scans), which
    is the documented price of a zero driver footprint."""
    n_df = (
        summaries.filter(F.col(col).isNull())
        .agg(F.sum("__mg_cnt__").alias("__n__"))
        .select(F.coalesce(F.col("__n__"), F.lit(0)).alias("__n__"))
    )
    cands = summaries.filter(F.col(col).isNotNull()).select(col).distinct()
    return (
        df.select(col)
        .filter(F.col(col).isNotNull())
        .join(cands, col, "semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(n_df))
        .filter(F.col("cnt") * k > F.col("__n__"))
        .withColumn("share", F.col("cnt") / F.col("__n__").cast("double"))
        .drop("__n__")
    )


# AMS sign-hash parameters. The sign hash should be (near-)4-wise
# independent for the AMS variance bound to hold - and an AFFINE map
# (the ops.sampling multiplicative hash) provably is not: over
# consecutive ids its parity bit alternates almost perfectly, the
# signed sums collapse toward zero, and the estimator under-reads F2
# by ~30x (measured on the sf0.01 user_id stream before this was
# caught). We use DEGREE-3 polynomials over GF(P) in Horner form —
# the Carter-Wegman 4-wise family's SHAPE — but honesty note
# (round-13 advice #4): the coefficients below are a fixed affine
# progression of (seed, r), NOT random draws from the family, so the
# textbook Var ≤ 2·F2² bound is not formally guaranteed; structured
# key sets could in principle correlate with the fixed polynomials.
# The rel_err gate in the oracle/unit battery is the empirical check.
# Horner evaluation keeps every intermediate < P*x_max ~ 1e18,
# inside int64 for BOTH engines - no overflow, no engine-private
# hashing.
_AMS_P = 1_000_000_007
_AMS_MULT = 2_654_435_761 % _AMS_P
_AMS_SALT = 1_000_003
_AMS_COEF_STEP = 7_919


def _ams_coeffs(seed: int, r: int) -> list[int]:
    """Deterministic per-row polynomial coefficients (a3..a0): the
    row/seed folded through the multiplicative map - fixed, public,
    reproducible in SQL as plain integer literals."""
    return [
        ((seed + r * _AMS_SALT + k * _AMS_COEF_STEP) % _AMS_P)
        * _AMS_MULT
        % _AMS_P
        for k in range(4)
    ]


def ams_f2(
    df: DataFrame,
    col: str,
    n_rows: int = 8,
    seed: int = 7,
    out_scale: int = 6,
) -> DataFrame:
    """AMS second-frequency-moment sketch (Alon, Matias & Szegedy
    1996) beside its exact baseline - the SELF-JOIN-SIZE planning
    number the sketch lane lacked: F2 = Σ_v f_v² is exactly the row
    count a self-equijoin on ``col`` produces, the quantity that
    decides "can I join this on user_id or will one hot key explode
    the shuffle?". HLL answers |distinct| (F0), Count-Min answers
    point frequencies; F2 is the skew-weighted mass neither reads.

    Estimator: ``n_rows`` ±1 sign hashes, each the parity of a
    deterministic degree-3 polynomial over GF(P) in Horner form —
    FIXED pseudorandom polynomials (a heuristic stand-in for the
    Carter-Wegman 4-wise family; see the coefficient honesty note
    above — the quoted AMS bound assumes random draws, and the
    rel_err column is the empirical check). Every intermediate fits
    int64, so the DuckDB oracle replays every sign. Each sketch
    counter is the plain streaming sum S_r = Σ_rows sign_r(v) - ONE
    map-side-combining aggregate, trivially mergeable across
    shards/streams (sum of sums) - with E[S_r²] = F2 and, under a
    true 4-wise family, Var ≤ 2·F2², putting mean_r S_r² within
    ~sqrt(2/n_rows)·F2. The exact baseline Σ f_v² folds from
    per-value counts in decimal(38,0) (second row-volume pass, the
    documented cost of certifying the estimate; production keeps only
    the sketch pass). S_r is exact int64 (|S_r| ≤ N), squares exact
    in decimal - both engines fold identical integers.

    Returns one row ``(n, n_distinct, f2_exact, f2_est, rel_err)``
    with rel_err = |est − exact| / exact (NULL on an empty input).
    """
    x = F.pmod(F.col(col).cast("long"), F.lit(_AMS_P))
    sums = []
    for r in range(n_rows):
        a3, a2, a1, a0 = _ams_coeffs(seed, r)
        h = F.lit(a3)
        for a in (a2, a1, a0):
            h = F.pmod(h * x + F.lit(a), F.lit(_AMS_P))
        sign = F.lit(1) - F.lit(2) * F.pmod(h, F.lit(2))
        sums.append(F.sum(sign).alias(f"s{r}"))
    base = df.filter(F.col(col).isNotNull())
    sk = base.agg(F.count(F.lit(1)).alias("n"), *sums)
    dec = "decimal(38,0)"
    est_num = None
    for r in range(n_rows):
        sq = F.col(f"s{r}").cast(dec) * F.col(f"s{r}").cast(dec)
        est_num = sq if est_num is None else est_num + sq
    exact = (
        base.groupBy(F.col(col).cast("long").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(F.col("c").cast(dec) * F.col("c").cast(dec)).alias(
                "f2_exact"
            ),
        )
    )
    om = F.lit(float(10**out_scale))
    est = est_num.cast("double") / F.lit(float(n_rows))
    ex = F.col("f2_exact").cast("double")
    rel = F.abs(est - ex) / ex
    return sk.crossJoin(F.broadcast(exact)).select(
        "n",
        "n_distinct",
        F.col("f2_exact").cast("long").alias("f2_exact"),
        F.when(
            F.col("n") > 0, F.floor(est * om + F.lit(0.5)) / om
        ).alias("f2_est"),
        F.when(
            (F.col("n") > 0) & (ex > 0),
            F.floor(rel * om + F.lit(0.5)) / om,
        ).alias("rel_err"),
    )
