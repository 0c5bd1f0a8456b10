"""Edit-distance-bounded fuzzy matching (entity resolution).

Near-duplicate TEXTS are covered by MinHash/SimHash (llm/dedup.py);
near-duplicate SHORT STRINGS — names, titles, SKUs, usernames — need
EDIT distance, where a one-character typo must still match. The
all-pairs plan is quadratic; the scalable plan is FastSS deletion-
neighborhood blocking (Bocek et al. 2007, public):

    two strings within edit distance k share at least one common
    element of their depth-<=k deletion neighborhoods

so emitting every string's deletion variants (depth 1: the string
itself plus each single-character deletion, n+1 variants for length n)
and equi-joining on the variant finds EVERY pair with distance <= 1 —
no recall loss, unlike prefix/phonetic blocking. Candidates then
verify with the exact ``levenshtein`` (built-in JVM function in Spark,
same function in DuckDB — which is what makes the operator fully
oracle-gatable).

Scale shape: linear explode (bounded by ``max_len``) -> hash
equi-join on the variant -> pair dedup -> verify. The quadratic
blowup danger is a hot block (many strings sharing a variant), the
same failure mode as LSH buckets; variants are hashed to int64 so the
join never ships the variant strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _deletion_variants(s: Column, depth: int) -> Column:
    """Array of deletion variants of ``s`` up to ``depth`` deletions,
    including ``s`` itself — pure JVM higher-order functions, no UDF.

    Depth d multiplies variant count by ~length each level (C(n, d)
    distinct variants); callers bound length via ``max_len``.
    """
    out = F.array(s)
    frontier = F.array(s)
    for _ in range(depth):
        # delete char i (1-based substring arithmetic) from every
        # frontier string; guard the empty string (sequence() with
        # start > stop would COUNT DOWN, not return empty)
        frontier = F.array_distinct(
            F.flatten(
                F.transform(
                    frontier,
                    lambda t: F.when(
                        F.length(t) > 0,
                        F.transform(
                            F.sequence(F.lit(1), F.length(t)),
                            lambda i: F.concat(
                                F.substring(t, F.lit(1), i - 1),
                                F.substring(t, i + 1, F.length(t)),
                            ),
                        ),
                    ).otherwise(F.array().cast("array<string>")),
                )
            )
        )
        out = F.array_distinct(F.concat(out, frontier))
    return out


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 1,
    max_len: int = 256,
    num_partitions: int | None = None,
) -> DataFrame:
    """All pairs with ``levenshtein(a, b) <= max_dist`` as
    ``(id_a, id_b, dist)`` with ``id_a < id_b`` — exact result
    (FastSS blocking has recall 1), never all-pairs.

    ``max_dist`` is the deletion-neighborhood depth; variant count
    grows ~C(len, d) per string, so depth 1-2 on short strings is the
    designed regime. Strings longer than ``max_len`` raise loudly
    rather than silently exploding the block table (and the O(n*m)
    verify); raise the cap knowingly for longer keys. NULL texts are
    skipped.
    """
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    # loud length contract, enforced IN the scan pass (assert_true
    # returns NULL when the predicate holds, so the wrap is value-
    # transparent) — a separate eager check job would re-scan the
    # corpus just to validate, which is the wrong trade at 100 TB
    guard = F.assert_true(
        F.length(F.col("txt")) <= F.lit(max_len),
        F.concat(
            F.lit(
                f"fuzzy_pairs: {text_col!r} longer than max_len={max_len} "
                "at id="
            ),
            F.col("id").cast("string"),
            F.lit(
                "; deletion blocking and levenshtein verification are "
                "designed for short keys — raise max_len only if you "
                f"accept ~len^{max_dist} variants per row"
            ),
        ),
    )
    src = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("txt"))
        .filter(F.col("txt").isNotNull())
        .withColumn("txt", F.when(guard.isNull(), F.col("txt")))
        .repartition(num_partitions, "id")
    )

    # block table: (variant hash, id) — variants never leave the map side
    blocks = src.select(
        "id",
        F.explode(
            F.transform(
                _deletion_variants(F.col("txt"), max_dist),
                lambda v: F.xxhash64(v),
            )
        ).alias("v"),
    ).dropDuplicates(["id", "v"])

    a = blocks.select(F.col("v"), F.col("id").alias("id_a"))
    b = blocks.select(F.col("v"), F.col("id").alias("id_b"))
    cand = (
        a.join(b, "v")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    ta = src.select(F.col("id").alias("id_a"), F.col("txt").alias("__ta__"))
    tb = src.select(F.col("id").alias("id_b"), F.col("txt").alias("__tb__"))
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("dist", F.levenshtein("__ta__", "__tb__"))
        .filter(F.col("dist") <= max_dist)
        .select("id_a", "id_b", F.col("dist").cast("long").alias("dist"))
    )
