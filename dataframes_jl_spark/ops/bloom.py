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
