"""Engine-portable Bloom filter for join prefiltering.

The use case: a semi-join where the build side is too large to ship as
a broadcast hash relation but its MEMBERSHIP fits a few kilobytes of
bitmap. Classic Bloom semantics — no false negatives, tunable false-
positive rate ~ (1 - e^{-k n / m})^k — so it is a PREFILTER: rows that
fail are definitely not matches and skip the expensive exact join; rows
that pass still go through it.

Everything is pure int64 Column arithmetic (affine hashes mod the
Mersenne-ish prime 1e9+7, the same mod-first overflow-safe discipline
as ops.sampling), and the bitmap is built with 32-bit segments via
``bit_or`` aggregates — so a DuckDB oracle can rebuild the identical
bitmap and replay every membership test bit-for-bit. Spark's built-in
``bloom_filter_agg`` is not exposed to SQL and its hash is engine-
private; this one trades a little speed for reproducibility.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_P = 1_000_000_007
# k affine hash functions: (key mod P) * A + B mod P, A/B < P so the
# product stays < (1e9+7)^2 < 2^63 — never overflows int64 under ANSI.
_HASHES = [
    (2_654_435_761 % _P, 97),
    (2_246_822_519 % _P, 1_013),
    (3_266_489_917 % _P, 11_317),
    (668_265_263 % _P, 104_729),
]


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    ks = F.pmod(key, F.lit(_P))
    return [
        F.pmod(F.pmod(ks * F.lit(a) + F.lit(b), F.lit(_P)), F.lit(m_bits))
        for a, b in _HASHES[:k]
    ]


def bloom_build(
    df: DataFrame,
    key: str | Column,
    m_bits: int = 2048,
    k: int = 4,
) -> DataFrame:
    """Build the bitmap: one row per non-empty 32-bit segment,
    ``(seg, bits)``. One explode (k rows per build key) + one hash
    aggregate — the bitmap is at most ``m_bits/32`` rows no matter how
    large the build side is.
    """
    if not 1 <= k <= len(_HASHES):
        raise ValueError(f"k must be in [1, {len(_HASHES)}]")
    if m_bits % 32 != 0:
        raise ValueError("m_bits must be a multiple of 32")
    kc = F.col(key) if isinstance(key, str) else key
    pos = F.explode(F.array(*_positions(kc, m_bits, k))).alias("h")
    return (
        df.select(pos)
        .select(
            (F.col("h") / 32).cast("int").alias("seg"),
            # shiftleft with a COLUMN bit count needs the SQL form (the
            # Python wrapper only accepts a literal numBits)
            F.expr("shiftleft(cast(1 as bigint), cast(pmod(h, 32) as int))").alias("b"),
        )
        .groupBy("seg")
        .agg(F.bit_or("b").alias("bits"))
    )


def bloom_prefilter(
    df: DataFrame,
    key: str | Column,
    bloom: DataFrame,
    m_bits: int = 2048,
    k: int = 4,
    result_col: str = "__bloom_pass__",
) -> DataFrame:
    """Annotate ``df`` with a boolean: does ``key`` pass the Bloom
    filter built by :func:`bloom_build`?

    The probe explodes each row into its k (seg, bit) probes, joins the
    (tiny, broadcast) bitmap on the segment id, and requires ALL k bits
    present. No false negatives: filter on the flag and feed survivors
    to the exact join.

    NULL keys get ``True``: the filter cannot hash them, and under this
    repo's NA-matching join semantics (ops.joins.join matches NA keys
    via eqNullSafe by default) a NULL probe key CAN be a real match —
    flagging it False would be a false negative, which this filter must
    never produce. The exact join downstream decides.
    """
    kc = F.col(key) if isinstance(key, str) else key
    tagged = df.withColumn("__bk__", kc)
    # membership is per DISTINCT key: without the distinct, a key
    # appearing in r rows would contribute r*k probe rows and the
    # all-bits-present count could never equal k
    probes = tagged.select("__bk__").filter(F.col("__bk__").isNotNull()).distinct().select(
        "__bk__", F.posexplode(F.array(*_positions(F.col("__bk__"), m_bits, k)))
    ).select(
        "__bk__",
        F.col("pos").alias("__i__"),
        (F.col("col") / 32).cast("int").alias("seg"),
        F.pmod(F.col("col"), F.lit(32)).cast("int").alias("bit"),
    )
    hit = (
        probes.join(F.broadcast(bloom), on="seg", how="left")
        .withColumn(
            "__hit__",
            F.coalesce(
                F.expr("(shiftright(bits, bit) & 1) = 1"),
                F.lit(False),
            ),
        )
        .groupBy("__bk__")
        .agg((F.sum(F.when(F.col("__hit__"), 1).otherwise(0)) == k).alias(result_col))
    )
    return (
        tagged.join(hit, on="__bk__", how="left")
        .withColumn(
            result_col,
            F.when(F.col("__bk__").isNull(), F.lit(True)).otherwise(
                F.col(result_col)
            ),
        )
        .drop("__bk__")
    )


def cm_build(
    df: DataFrame,
    key: str | Column,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of key
    frequencies: ``depth`` counter rows of ``width`` cells; cell
    (i, h_i(key)) accumulates every occurrence.

    Output: (row, col, cnt) — at most depth*width rows regardless of
    input cardinality, built with one explode + one hash aggregate
    (map-side partial counts). Same engine-portable affine hashes as
    the Bloom filter, so an oracle rebuilds the identical sketch.
    """
    if not 1 <= depth <= len(_HASHES):
        raise ValueError(f"depth must be in [1, {len(_HASHES)}]")
    kc = F.col(key) if isinstance(key, str) else key
    probes = df.select(
        F.posexplode(F.array(*_positions(kc, width, depth)))
    ).select(F.col("pos").alias("row"), F.col("col").alias("col"))
    return probes.groupBy("row", "col").agg(F.count(F.lit(1)).alias("cnt"))


def cm_estimate(
    df: DataFrame,
    key: str | Column,
    sketch: DataFrame,
    width: int = 1024,
    depth: int = 4,
    result_col: str = "cm_count",
) -> DataFrame:
    """Estimated frequency of each DISTINCT key in ``df`` against a
    :func:`cm_build` sketch: min over the key's depth counters.

    Count-Min guarantee: the estimate NEVER undercounts; it overcounts
    by at most the collision mass (within eN with probability 1-δ for
    width=e/ε, depth=ln(1/δ)). Output: (key, cm_count).
    """
    kc = F.col(key) if isinstance(key, str) else key
    keys = df.select(kc.alias("key")).distinct()
    probes = keys.select(
        "key", F.posexplode(F.array(*_positions(F.col("key"), width, depth)))
    ).select("key", F.col("pos").alias("row"), F.col("col").alias("col"))
    return (
        probes.join(F.broadcast(sketch), on=["row", "col"], how="left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(result_col))
    )


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007) — same engine-portable discipline
# ---------------------------------------------------------------------------

# The Bloom/CM affine family is pairwise-independent — enough for
# POSITIONS, but HLL's max-rank statistic needs avalanche: with plain
# affine hashes the measured estimates ran ±60% off on sequential keys.
# So HLL mixes with three ARX-style rounds alternating an affine map
# mod P (non-linear over GF(2)) and an xor-shift (non-linear mod P).
# Every intermediate stays < P < 2^30 and every product < P^2 < 2^63 —
# overflow-free int64 even under ANSI, and replayable in any engine
# with *, %, xor, and >>. Measured on sequential/random/offset key
# sets: estimates within ~1-2 sigma of HLL's theoretical 1.04/sqrt(m).
_HLL_ROUNDS = [
    (654_435_747, 97, 13),
    (374_761_393, 268_435_399, 11),
    (668_265_263, 104_729, 15),
]
# pre-scramble for the rank hash so (register, rank) decorrelate
_HLL_RHO_SEED = (913_151_717, 776_531_401)
# h2 is uniform in [0, P) with P just over 2^29; ranks beyond 30 cannot
# occur, so an all-zero h2 (probability ~2^-30 per key) pins the
# register to the cap instead of overflowing the estimator.
_HLL_MAX_RHO = 31


def _hll_mix(h: Column) -> Column:
    for a, b, s in _HLL_ROUNDS:
        h = F.pmod(h * F.lit(a) + F.lit(b), F.lit(_P))
        h = h.bitwiseXOR(F.shiftright(h, s))
    return h


def _hll_parts(key: Column, m: int) -> tuple[Column, Column]:
    """(register, rho) for one key — pure int64/exact-dyadic arithmetic
    both engines replay bit-for-bit. rho = 1 + trailing zeros of the
    rank hash, extracted with the lowest-set-bit identity
    ``L = h - (h & (h-1))`` and ``log2`` of an exact power of two
    (exact in any IEEE implementation; the +0.5/floor absorbs a stray
    ulp anyway)."""
    ks = F.pmod(key, F.lit(_P))
    a0, b0 = _HLL_RHO_SEED
    h1 = _hll_mix(ks)
    h2 = _hll_mix(F.pmod(ks * F.lit(a0) + F.lit(b0), F.lit(_P)))
    reg = F.pmod(h1, F.lit(m)).cast("int")
    low = h2 - h2.bitwiseAND(h2 - F.lit(1))
    rho = F.when(h2 == 0, F.lit(_HLL_MAX_RHO)).otherwise(
        F.floor(F.log2(low) + F.lit(0.5)).cast("int") + F.lit(1)
    )
    return reg, rho


def _hll_parts_np(keys, m: int):
    """Numpy twin of :func:`_hll_parts` — BIT-IDENTICAL (register, rho)
    arrays for an int64 key vector, from the same _HLL_ROUNDS /
    _HLL_RHO_SEED constants. Exists so streaming state operators
    (streaming/distinct.py) build sketches that max-merge exactly with
    batch :func:`hll_build` output. Overflow-safe for the same reason
    as the Column path: every mixed value stays < _P < 2^30, so each
    ``h * a`` product is < 2^60 inside int64."""
    import numpy as np

    ks = np.mod(keys.astype(np.int64), _P)  # pmod: non-negative, as Spark

    def mix(h):
        for a, b, s in _HLL_ROUNDS:
            h = np.mod(h * a + b, _P)
            h = h ^ (h >> s)
        return h

    h1 = mix(ks)
    a0, b0 = _HLL_RHO_SEED
    h2 = mix(np.mod(ks * a0 + b0, _P))
    reg = np.mod(h1, m).astype(np.int32)
    low = h2 - (h2 & (h2 - 1))
    rho = np.where(
        h2 == 0,
        np.int32(_HLL_MAX_RHO),
        (np.floor(np.log2(np.maximum(low, 1)) + 0.5)).astype(np.int32) + 1,
    ).astype(np.int32)
    return reg, rho


def hll_build(
    df: DataFrame,
    key: str | Column,
    p: int = 8,
    by: tuple[str, ...] = (),
) -> DataFrame:
    """HyperLogLog sketch of an integer key column: ``(reg, rho)`` with
    at most ``2^p`` rows — fixed-size no matter the input cardinality,
    built with ONE map-side-combining hash aggregate (max per register).

    Shard-mergeable like the other sketches here: union + max per
    register (:func:`hll_merge`) equals the sketch of the union — the
    property that lets 1000 executors sketch 100 TB independently and
    combine 256-row results. NULL keys are skipped (COUNT DISTINCT
    semantics).

    ``by`` builds ONE SKETCH PER GROUP in the same single aggregate —
    ``(by…, reg, rho)``, at most ``2^p`` rows per group. This is the
    per-source / per-language cardinality-audit pattern: a 100 TB scan
    reduces to ``n_groups * 2^p`` rows in one pass, where per-group
    ``COUNT(DISTINCT)`` would shuffle every distinct key."""
    if not 4 <= p <= 14:
        raise ValueError(f"p must be in [4, 14], got {p}")
    kc = F.col(key) if isinstance(key, str) else key
    by = list(by)
    reg, rho = _hll_parts(F.col("__k__"), 1 << p)
    return (
        df.select(kc.alias("__k__"), *[F.col(b) for b in by])
        .filter(F.col("__k__").isNotNull())
        .select(*by, reg.alias("reg"), rho.alias("rho"))
        .groupBy(*by, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union + max per register: the sketch of the shard union.

    All inputs must have been built with the SAME ``p`` (register ids
    from different precisions do not line up); a mixed merge is caught
    at :func:`hll_estimate` time when the register count exceeds
    ``2^p`` — pass the build-time ``p`` there. Grouped sketches merge
    by passing the same ``by`` columns."""
    from functools import reduce

    un = reduce(lambda a, b: a.unionByName(b), sketches)
    keys = [c for c in un.columns if c != "rho"]
    return un.groupBy(*keys).agg(F.max("rho").alias("rho"))


def hll_estimate(
    sketch: DataFrame, p: int = 8, by: tuple[str, ...] = ()
) -> DataFrame:
    """Cardinality estimate from a :func:`hll_build` sketch.

    Standard HLL estimator: ``alpha_m * m^2 / S`` where S sums
    ``2^-rho`` over all m registers (absent registers contribute 2^0);
    small-range correction switches to linear counting
    ``m * ln(m / V)`` when the raw estimate is below 2.5m and empty
    registers remain. S is a sum of <= m exact dyadic rationals
    spanning 2^-31..1 — fewer than 53 mantissa bits total, so it is
    EXACT regardless of accumulation order and the estimate is
    engine-reproducible (round the final double; ln may differ by an
    ulp between libms).

    Output: one row ``(method, n_regs, v_zero, estimate)`` — or one
    row per group when ``by`` names the grouped-sketch key columns."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = sketch.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_regs"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("__s_used__"),
    )
    v = F.lit(m) - F.col("n_regs")
    # coalesce: an EMPTY sketch (no rows seen) sums to NULL; 0 routes it
    # to linear counting with V=m -> estimate 0, the right answer
    s = F.coalesce(F.col("__s_used__"), F.lit(0.0)) + v.cast("double")
    raw = F.lit(alpha * m * m) / s
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    use_linear = (raw <= F.lit(2.5 * m)) & (v > 0)
    # p-mismatch guard: estimating a sketch built with HIGHER p under a
    # lower one would silently mis-scale (n_regs can exceed m with no
    # other symptom) — fail the job loudly instead. assert_true returns
    # NULL when the predicate holds, so the wrap is value-transparent.
    # Folded into EVERY output column that carries the mis-scaled value
    # (method AND estimate): a caller selecting just `estimate` lets
    # column pruning drop the other columns, and a guard living only in
    # `method` would be pruned away with it.
    ok = F.assert_true(
        F.col("n_regs") <= F.lit(m),
        F.concat(
            F.lit(f"hll_estimate(p={p}): sketch has "),
            F.col("n_regs").cast("string"),
            F.lit(f" registers > m={m}; it was built (or merged from "
                  "sketches built) with a larger p — pass that p"),
        ),
    )
    return agg.select(
        *by,
        F.when(
            ok.isNull() & use_linear, F.lit("linear")
        ).otherwise(F.lit("hll")).alias("method"),
        F.col("n_regs").cast("bigint").alias("n_regs"),
        v.cast("bigint").alias("v_zero"),
        F.when(
            ok.isNull() & use_linear, linear
        ).otherwise(raw).alias("estimate"),
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) sketch — Bar-Yossef et al. 2002 bottom-k
# ---------------------------------------------------------------------------
# HLL estimates ONE set's cardinality in 2^p registers; KMV keeps the k
# SMALLEST hash values instead, which makes it closed under set algebra:
# the bottom-k of a union is computable from the two sketches alone, and
# the fraction of the union's bottom-k present in both sides is an
# unbiased Jaccard estimator. That is the cross-corpus question HLL
# cannot answer — "how much do corpus A and corpus B overlap?" — asked
# before any expensive dedup/decontamination join is launched. Same
# engine-portable discipline: the avalanche-mixed hash is exact int64
# arithmetic any engine replays bit-for-bit, so the sketch (and every
# estimate derived from it) is value-gated against an oracle rebuild.


def kmv_build(df: DataFrame, key: str | Column, k: int = 256) -> DataFrame:
    """Bottom-``k`` distinct mixed-hash values of an integer key column
    — one column ``h``, at most ``k`` rows.

    Plan: map-side hash projection, distinct on ``h`` (map-side
    combining aggregate over DISTINCT VALUES, never raw rows), then a
    ``TakeOrderedAndProject`` top-k — each partition contributes its
    own bottom-k and the driver merges #partitions * k candidates, so
    no global sort materializes. NULL keys are skipped."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    kc = F.col(key) if isinstance(key, str) else key
    h = _hll_mix(F.pmod(kc, F.lit(_P)))
    return (
        df.select(h.alias("h"))
        .filter(kc.isNotNull())
        .dropDuplicates(["h"])
        .orderBy("h")
        .limit(k)
    )


def kmv_union(a: DataFrame, b: DataFrame, k: int) -> DataFrame:
    """Bottom-``k`` of the union: KMV's closure property — the union's
    sketch is derivable from the two sketches alone (both are supersets
    of the union's bottom-k candidates below their own k-th value)."""
    return a.unionByName(b).dropDuplicates(["h"]).orderBy("h").limit(k)


def kmv_estimate(sketch: DataFrame, k: int) -> DataFrame:
    """Distinct-count estimate from a :func:`kmv_build` sketch.

    Fewer than ``k`` hashes -> the sketch saw EVERY distinct hash, so
    the count is exact (method 'exact'). Otherwise the classic
    order-statistics estimate ``(k-1) * P / h_(k)`` with ``h_(k)`` the
    largest retained hash (uniform order statistic over [0, P)).
    ``h_(k) = 0`` is impossible for k >= 2 distinct values, so the
    division is ANSI-safe by construction (still when-guarded)."""
    agg = sketch.agg(
        F.count(F.lit(1)).alias("n_hashes"),
        F.max("h").alias("__hk__"),
    )
    exact = F.col("n_hashes") < F.lit(k)
    est = F.when(
        F.col("__hk__") > 0,
        F.lit(float(k - 1)) * F.lit(float(_P)) / F.col("__hk__").cast("double"),
    )
    return agg.select(
        F.when(exact, F.lit("exact")).otherwise(F.lit("kmv")).alias("method"),
        F.col("n_hashes").cast("bigint").alias("n_hashes"),
        F.when(exact, F.col("n_hashes").cast("double"))
        .otherwise(est)
        .alias("estimate"),
    )


def kmv_overlap(a: DataFrame, b: DataFrame, k: int) -> DataFrame:
    """Jaccard / union / intersection estimates for two KMV sketches.

    The union's bottom-k is a uniform sample of the union's distinct
    hashes; the fraction of it present in BOTH input sketches is an
    unbiased Jaccard estimator, and intersection = jaccard * union.
    One row: ``(n_union_hashes, jaccard, union_est, inter_est)``.
    Everything operates on <= k-row frames (broadcast-joined), so cost
    is independent of the corpora the sketches summarize. The input
    sketches are persisted ONLY for the duration of this call (the
    corpus scans behind them run once, not once per branch), the
    one-row result is materialized eagerly, and both caches are
    released before returning — repeated calls in a long-lived
    session leave no cache blocks behind."""
    a = a.persist()
    b = b.persist()
    try:
        u = kmv_union(a, b, k)
        both = (
            u.join(F.broadcast(a.select(F.col("h").alias("h"))), "h", "semi")
            .join(F.broadcast(b.select(F.col("h").alias("h"))), "h", "semi")
        )
        stats = u.agg(
            F.count(F.lit(1)).alias("n_union_hashes"), F.max("h").alias("__hk__")
        ).crossJoin(both.agg(F.count(F.lit(1)).alias("__n_both__")))
        exact = F.col("n_union_hashes") < F.lit(k)
        union_est = F.when(exact, F.col("n_union_hashes").cast("double")).otherwise(
            F.when(
                F.col("__hk__") > 0,
                F.lit(float(k - 1))
                * F.lit(float(_P))
                / F.col("__hk__").cast("double"),
            )
        )
        jacc = F.when(
            F.col("n_union_hashes") > 0,
            F.col("__n_both__").cast("double") / F.col("n_union_hashes"),
        )
        out = stats.select(
            F.col("n_union_hashes").cast("bigint").alias("n_union_hashes"),
            jacc.alias("jaccard"),
            union_est.alias("union_est"),
            (jacc * union_est).alias("inter_est"),
        )
        rows = out.collect()
        return a.sparkSession.createDataFrame(rows, out.schema)
    finally:
        a.unpersist()
        b.unpersist()
