"""Sampling operators — not in the reference (no sampling surface
exists there; SURVEY §2 has no entry), added as first-class scale
operators: subsampling a 100 TB corpus and rebalancing strata are
routine steps of a training-data pipeline.

All three are single-pass, shuffle-free row filters:

- ``sample``: seeded Bernoulli row sample (Spark native, per-partition
  XORShift — deterministic for a fixed seed AND a fixed partitioning).
- ``sample_by``: stratified per-key fractions (``DataFrame.sampleBy``),
  e.g. downsample the dominant language while keeping the tail.
- ``systematic_sample``: keyed modulus filter — fully deterministic
  regardless of partitioning, reproducible across engines, and thus the
  variant the DuckDB oracle can check value-for-value. The filter is a
  plain comparison on a key expression, so it is pushed into the scan
  where the key is a stored column.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Seeded Bernoulli sample without replacement."""
    return df.sample(withReplacement=False, fraction=fraction, seed=seed)


def sample_by(
    df: DataFrame, col: str, fractions: Mapping, seed: int = 42
) -> DataFrame:
    """Stratified sample: per-stratum keep-fractions (keys absent from
    ``fractions`` are dropped, matching ``DataFrame.sampleBy``)."""
    return df.sampleBy(col, dict(fractions), seed=seed)


def systematic_sample(
    df: DataFrame, key: str | Column, every: int, offset: int = 0
) -> DataFrame:
    """Keep rows where ``key % every == offset`` — a 1/``every``
    systematic sample keyed on a stored column. Deterministic under any
    partitioning (the decision depends only on the row), so results are
    engine-reproducible; use a well-distributed key (an id, a hash)."""
    if every <= 0:
        raise ValueError("every must be positive")
    k = F.col(key) if isinstance(key, str) else key
    return df.filter(F.pmod(k, F.lit(every)) == F.lit(offset % every))


# Multiplier for the bucketing hash below: a 31-bit odd constant
# (Knuth's 2654435761 truncated into the modulus field) applied mod the
# Mersenne-ish prime 1e9+7. (key % P) * MULT stays < 2^61, so the
# arithmetic never overflows int64 under ANSI mode and is expressible
# identically in any engine with 64-bit integer math.
_SPLIT_P = 1_000_000_007
_SPLIT_MULT = 2_654_435_761 % _SPLIT_P


def split_bucket(key: str | Column, buckets: int = 1000) -> Column:
    """Deterministic bucket in [0, buckets) from an integer key.

    Pure int64 arithmetic (no engine-specific hash), so an external
    system — or the DuckDB oracle — can reproduce the assignment
    bit-for-bit: bucket = ((key mod P) * MULT mod P) mod buckets.
    """
    k = F.col(key) if isinstance(key, str) else key
    h = F.pmod(F.pmod(k, F.lit(_SPLIT_P)) * F.lit(_SPLIT_MULT), F.lit(_SPLIT_P))
    return F.pmod(h, F.lit(buckets)).cast("int")


def split_bucket_sql(key: str, buckets: int = 1000) -> str:
    """DuckDB mirror of :func:`split_bucket` for oracle SQL."""
    return (
        f"CAST((((({key}) % {_SPLIT_P}) * {_SPLIT_MULT}) % {_SPLIT_P})"
        f" % {buckets} AS INT)"
    )


def hash_split(
    df: DataFrame,
    key: str | Column,
    weights: Mapping[str, float],
    buckets: int = 1000,
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split (train/val/test …) by hashing a
    stable key — the standard leakage-safe corpus split: membership
    depends only on the key, so re-runs, new shards, and incremental
    appends land every row in the same split; no shuffle, no state.

    ``weights`` maps split name -> fraction; fractions must sum to ~1.
    Rows are routed by contiguous bucket ranges over ``split_bucket``.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    b = split_bucket(key, buckets)
    expr = None
    lo = 0
    for name, w in weights.items():
        hi = lo + int(round(w * buckets))
        cond = (b >= lo) & (b < hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo = hi
    # any residue from rounding joins the last named split
    last = list(weights)[-1]
    return df.withColumn(split_col, expr.otherwise(F.lit(last)))


def stratified_sample(
    df: DataFrame,
    strata: str,
    frac: float,
    key: str,
    buckets: int = 64,
) -> DataFrame:
    """EXACT proportional-allocation stratified sample: within each
    stratum, rank rows by the deterministic :func:`split_bucket` hash
    of ``key`` (key itself as tiebreak - a total order) and keep the
    first ``floor(frac·n_g)``. The two guarantees ``sampleBy``'s
    Bernoulli draw cannot give: the per-stratum sample size is EXACT
    (a 1% sample of a 100-row stratum is 1 row, never 0 or 3), and
    membership is a pure function of the data - re-runs, engine
    changes, and the DuckDB oracle select the identical rows.

    Scale shape - two-level rank, never one-task-per-stratum: a
    naive ``row_number() OVER (PARTITION BY stratum)`` serializes
    each stratum into ONE task (measured 17 s at sf10 with 3 strata
    vs ~1 s here). Instead the hash space splits into ``buckets``
    RANGE buckets (order-consistent: every row of bucket b hashes
    below every row of b+1, and equal hashes share a bucket, so the
    tiebreak stays inside one task); the row volume takes ONE shuffle
    keyed (stratum, bucket) with |strata|·buckets-way parallelism and
    a local sort, and the stratum rank reassembles as
    local row_number + the lower-buckets offset - offsets and
    per-stratum totals ride a bounded |strata|·buckets aggregate
    broadcast back. Selection quality note: ranking by the
    multiplicative hash makes the sample hash-uniform over keys, not
    the first-k by key order.

    NULL strata are a FIRST-CLASS stratum: groupBy/window already
    treat NULL as its own group, and the offset join is null-safe
    (eqNullSafe), so NULL-stratum rows get their own exact
    floor(frac·n_NULL) allocation instead of silently vanishing
    through an equi-join (round-13 advice #1).

    The keep threshold is computed in INTEGER arithmetic: ``frac``'s
    decimal literal becomes an exact rational num/den
    (``Fraction(str(frac))``), and a row survives iff
    ``rank·den <= num·n_g`` — exactly ``rank <= floor(frac·n_g)`` with
    no IEEE-double boundary case (0.7 of a 10-row stratum keeps 7,
    where ``floor(0.7 * 10.0)`` in doubles keeps 6 — round-13 advice
    #2).
    """
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac must be in (0, 1], got {frac}")
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    from fractions import Fraction

    from pyspark.sql import Window

    fr = Fraction(str(frac))
    num, den = fr.numerator, fr.denominator

    h = split_bucket(key, _SPLIT_P)  # full-range hash, not bucketed
    width = (_SPLIT_P + buckets - 1) // buckets
    base = df.withColumn("__h__", h).withColumn(
        "__b__", F.floor(F.col("__h__") / F.lit(width)).cast("int")
    )
    counts = base.groupBy(strata, "__b__").agg(
        F.count(F.lit(1)).alias("__c__")
    )
    # bounded |strata|·buckets table: running offset + stratum total
    woff = (
        Window.partitionBy(strata)
        .orderBy("__b__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy(strata)
    offs = counts.select(
        strata,
        "__b__",
        (F.sum("__c__").over(woff) - F.col("__c__")).alias("__off__"),
        F.sum("__c__").over(wtot).alias("__ng__"),
    )
    w = Window.partitionBy(strata, "__b__").orderBy(
        F.col("__h__").asc(), F.col(key).asc()
    )
    offs = offs.withColumnRenamed(strata, "__s__").withColumnRenamed(
        "__b__", "__ob__"
    )
    ranked = base.withColumn("__rn__", F.row_number().over(w))
    return (
        ranked.join(
            F.broadcast(offs),
            ranked[strata].eqNullSafe(offs["__s__"])
            & (ranked["__b__"] == offs["__ob__"]),
        )
        .filter(
            # decimal(38,0) products: num/den come from the decimal
            # literal (e.g. 0.3333333333333333 -> den 1e16) and n_g is
            # unbounded, so int64 multiplication could overflow under
            # ANSI; 38-digit decimals cannot here.
            (F.col("__rn__") + F.col("__off__")).cast("decimal(38,0)")
            * F.lit(den).cast("decimal(38,0)")
            <= F.lit(num).cast("decimal(38,0)")
            * F.col("__ng__").cast("decimal(38,0)")
        )
        .drop(
            "__h__", "__b__", "__rn__", "__off__", "__ng__", "__s__", "__ob__"
        )
    )


def weighted_sample(
    df: DataFrame,
    weight: str | Column,
    k: int,
    key: str | Column = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis A-ES).

    Each row gets an exponential key ``-ln(u) / w`` with ``u`` uniform
    in (0, 1]; the ``k`` smallest keys are a weight-proportional sample
    without replacement. One distributed top-k (TakeOrderedAndProject —
    per-partition heaps, no global sort), no state, deterministic:
    ``u`` comes from the same pure-int64 multiplicative hash as
    :func:`split_bucket` (seed folded into the key), so the selection
    is reproducible in any engine with 64-bit ints and libm log —
    including the DuckDB oracle.
    """
    kcol = F.col(key) if isinstance(key, str) else key
    wcol = F.col(weight) if isinstance(weight, str) else weight
    h = F.pmod(
        F.pmod(kcol + F.lit(seed), F.lit(_SPLIT_P)) * F.lit(_SPLIT_MULT),
        F.lit(_SPLIT_P),
    )
    u = (h + F.lit(1.0)) / F.lit(float(_SPLIT_P + 1))  # (0, 1]
    # A-ES is defined for w > 0; zero/negative/NULL weights must never
    # win a slot (a negative weight would otherwise sort FIRST), so they
    # get an infinite key — drawn only if k exceeds the positive pool.
    es_key = F.when(wcol > 0, -F.log(u) / wcol).otherwise(
        F.lit(float("inf"))
    )
    return (
        df.withColumn("__es_key__", es_key)
        .orderBy(F.col("__es_key__").asc(), kcol.asc())
        .limit(k)
        .drop("__es_key__")
    )


def take_per_group(
    df: DataFrame,
    group: str | Column,
    k: int,
    key: str | Column = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic fixed-k sample per group (stratified take-k).

    The standard corpus-balancing op: cap every stratum (domain,
    language, shard) at ``k`` documents. Rows are ranked inside each
    group by the same pure-int64 multiplicative hash as
    :func:`split_bucket` (seed folded in), so the selection is a pure
    function of (key, seed) — stable across re-runs and engines — and
    uniform within the group. One shuffle on the group key; the window
    is rank-only (no payload accumulation), so partitions stream.
    """
    kcol = F.col(key) if isinstance(key, str) else key
    gcol = F.col(group) if isinstance(group, str) else group
    h = F.pmod(
        F.pmod(kcol + F.lit(seed), F.lit(_SPLIT_P)) * F.lit(_SPLIT_MULT),
        F.lit(_SPLIT_P),
    )
    w = Window.partitionBy(gcol).orderBy(h.asc(), kcol.asc())
    return (
        df.withColumn("__rk__", F.row_number().over(w))
        .filter(F.col("__rk__") <= k)
        .drop("__rk__")
    )
