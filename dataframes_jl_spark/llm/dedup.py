"""Deduplication at corpus scale: exact, n-gram Jaccard, MinHash+LSH,
SimHash.

Scale design:
- **exact**: one hash-aggregate on the key — the cheapest possible plan.
- **jaccard_pairs** (exact near-dup): shingle-explode + equi-join on the
  shingle, then per-pair intersection counting — exact but quadratic in
  the worst case; used as the verifier and the small-scale oracle path.
- **minhash_lsh_pairs**: per-doc signatures computed *inside codegen*
  with nested higher-order functions (no explosion: H×S xxhash calls
  per row), banded into B buckets, candidates = docs sharing a band
  bucket, then **verified with exact Jaccard** — so the output equals
  the exact pair set whenever LSH recall is 1, and is always a subset
  of it. At 100 TB only the banded candidates are joined, never all
  pairs.
- **simhash**: 64-bit signature from per-token hashes, near-dups via
  16-bit band buckets + Hamming verification.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens


# ---------------------------------------------------------------- exact


def exact_dedup(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup: keep the min-id representative per duplicate group.
    One hash aggregate; no window, no sort."""
    return df.groupBy(*cols).agg(F.min(id_col).alias(id_col)).select(id_col, *cols)


# -------------------------------------------------------------- shingles


def shingles(col: str | Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as array<string> (JVM-side)."""
    t = tokens(col)
    n_sh = F.size(t) - (n - 1)
    # sequence(0, -1) counts DOWN in Spark — guard short docs explicitly
    return F.when(n_sh <= 0, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), n_sh - 1),
                lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
            )
        )
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs (id_a < id_b, jaccard ≥
    threshold).

    Plan: explode distinct shingles → self equi-join on shingle (Spark
    plans a shuffled hash join on the shingle key — the classic
    inverted-index intersection) → count common shingles per pair →
    filter on |A∩B| / (|A|+|B|-|A∩B|).
    """
    sh = df.select(
        F.col(id_col).alias("id"), shingles(text_col, n).alias("sh")
    ).withColumn("n_sh", F.size("sh"))
    ex = sh.select("id", "n_sh", F.explode("sh").alias("shingle"))
    a = ex.select(
        F.col("id").alias("id_a"), F.col("n_sh").alias("na"), "shingle"
    )
    b = ex.select(
        F.col("id").alias("id_b"), F.col("n_sh").alias("nb"), "shingle"
    )
    pairs = (
        a.join(b, on="shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    jac = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --------------------------------------------------------------- minhash


def minhash_signature(col: str | Column, num_hashes: int = 64, n: int = 3) -> Column:
    """MinHash signature as array<bigint>, computed entirely in codegen:
    sig[i] = min over shingles of xxhash64(shingle, seed_i). No row
    explosion, no shuffle — H×S hash evaluations per document."""
    sh = shingles(col, n)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda seed: F.array_min(
            F.transform(sh, lambda s: F.xxhash64(s, seed))
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 32,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash LSH near-dup pairs, exact-Jaccard verified.

    bands=32 over 64 hashes (rows/band=2) → candidate probability
    1-(1-j²)³² — ≥0.9996 for j≥0.5 — so at the default threshold the
    verified output matches the exact jaccard_pairs result w.h.p. while
    joining only band-bucket collisions (linear + collision-bounded,
    not all-pairs).
    """
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("__text__"),
        minhash_signature(text_col, num_hashes, n).alias("sig"),
    )
    banded = sig.select(
        "id",
        "__text__",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda h: h.cast("string"),
                            ),
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("id", "__text__", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a = banded.select(
        F.col("band"), F.col("bucket"), F.col("id").alias("id_a"), F.col("__text__").alias("ta")
    )
    b = banded.select(
        F.col("band"), F.col("bucket"), F.col("id").alias("id_b"), F.col("__text__").alias("tb")
    )
    cand = (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ta", "tb")
        .dropDuplicates(["id_a", "id_b"])
    )
    # exact verification on the candidate set only
    sa, sb = shingles("ta", n), shingles("tb", n)
    common = F.size(F.array_intersect(sa, sb))
    union = F.size(sa) + F.size(sb) - common
    jac = common / union
    return (
        cand.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --------------------------------------------------------------- simhash


def simhash(col: str | Column, bits: int = 64) -> Column:
    """SimHash signature as a ``bits``-char '0'/'1' string: bit p is 1
    iff a majority of token hashes have bit p set. Bit-string form keeps
    everything in built-in string/array functions (variable bit-shifts
    by a Column are not supported) and stays engine-portable."""
    t = tokens(col)
    n = F.size(t)
    # 64-char two's-complement binary of each token hash
    binhs = F.transform(t, lambda x: F.lpad(F.bin(F.xxhash64(x)), 64, "0"))
    bit_chars = F.transform(
        F.sequence(F.lit(1), F.lit(bits)),
        lambda p: F.when(
            F.size(F.filter(binhs, lambda s: s.substr(p, F.lit(1)) == "1")) * 2 > n,
            F.lit("1"),
        ).otherwise(F.lit("0")),
    )
    return F.array_join(bit_chars, "")


def hamming(a: Column, b: Column, bits: int = 64) -> Column:
    """Hamming distance between two equal-length bit strings."""
    return F.size(
        F.filter(
            F.sequence(F.lit(1), F.lit(bits)),
            lambda p: a.substr(p, F.lit(1)) != b.substr(p, F.lit(1)),
        )
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs with Hamming distance ≤ max_hamming.

    Banding: split the 64-bit signature into 4×16-bit chunks; any pair
    within Hamming ≤3 shares at least one identical chunk (pigeonhole),
    so the chunk-bucket join has recall 1 — then verify the exact
    Hamming distance with bit_count(xor).
    """
    sig = df.select(F.col(id_col).alias("id"), simhash(text_col).alias("sig"))
    chunks = [
        sig.select(
            F.lit(i).alias("chunk"),
            F.substring("sig", i * 16 + 1, 16).alias("bucket"),
            "id",
            "sig",
        )
        for i in range(4)
    ]
    from functools import reduce

    chunked = reduce(lambda x, y: x.unionByName(y), chunks)
    a = chunked.select("chunk", "bucket", F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    b = chunked.select("chunk", "bucket", F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    return (
        a.join(b, on=["chunk", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", hamming(F.col("sig_a"), F.col("sig_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_dup_pairs(
    df,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    bucketed: bool = False,
    dim: int = 64,
    num_planes: int = 8,
    num_tables: int = 6,
):
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cos_sim) with
    id_a < id_b and cos_sim >= threshold.

    ``bucketed=False`` (default): exact all-pairs — O(n²) cross join,
    correct baseline, only for modest n or a pre-blocked partition.
    ``bucketed=True``: hyperplane-LSH blocking (llm.similarity) — only
    pairs sharing a signature in >=1 of ``num_tables`` tables are
    scored; recall < 1 by construction but work is bounded by bucket
    occupancy, which is the 100 TB path.
    """
    from functools import reduce

    from .similarity import _as_double, cosine, hyperplane_signature

    base = df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    )
    if not bucketed:
        a = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
        b = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    else:
        parts = []
        for t in range(num_tables):
            parts.append(
                base.select(
                    "id",
                    "v",
                    F.lit(t).alias("table"),
                    hyperplane_signature(
                        F.col("v"), dim, num_planes, seed=11 + 17 * t
                    ).alias("bucket"),
                )
            )
        tabbed = reduce(lambda x, y: x.unionByName(y), parts)
        a = tabbed.select(
            "table", "bucket", F.col("id").alias("id_a"), F.col("v").alias("va")
        )
        b = tabbed.select(
            "table", "bucket", F.col("id").alias("id_b"), F.col("v").alias("vb")
        )
        pairs = (
            a.join(b, on=["table", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
    return (
        pairs.select(
            "id_a",
            "id_b",
            cosine(F.col("va"), F.col("vb")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
