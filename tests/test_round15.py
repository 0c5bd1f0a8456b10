"""Round-15 additions: the structural persist/unpersist contract
(core.cache.hold / release — round-14 verdict ask #4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _n_cached_rdds(spark) -> int:
    """Number of RDD blocks the JVM currently tracks as persisted."""
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def _assert_released(spark, result):
    """Consume the result, then release() and assert the JVM tracks
    zero persisted RDDs — the structural form of the old 'call
    clearCache once consumed' docstring contract."""
    from dataframes_jl_spark import release

    handles = getattr(result, "unpersist_handles", ())
    assert handles, "result should carry at least one persisted handle"
    rows = result.collect()
    assert _n_cached_rdds(spark) > 0  # the cache was real
    release(result)
    assert _n_cached_rdds(spark) == 0
    # idempotent
    release(result)
    assert _n_cached_rdds(spark) == 0
    return rows


@pytest.fixture(autouse=True)
def _clean_cache(spark):
    spark.catalog.clearCache()
    yield
    spark.catalog.clearCache()


def test_release_mood_median(spark):
    from dataframes_jl_spark.functions.stats import mood_median_test

    df = spark.createDataFrame(
        [("a", float(v)) for v in (1, 2, 3, 9)]
        + [("b", float(v)) for v in (4, 5, 6, 7)],
        "g string, v double",
    )
    rows = _assert_released(spark, mood_median_test(df, "v", "g"))
    assert rows[0]["n_groups"] == 2 and rows[0]["n"] == 8


def test_release_hodges_lehmann(spark):
    from dataframes_jl_spark.functions.stats import hodges_lehmann_shift

    a = spark.createDataFrame([(float(v),) for v in (1, 2, 3)], "v double")
    b = spark.createDataFrame([(float(v),) for v in (4, 6, 8)], "v double")
    rows = _assert_released(spark, hodges_lehmann_shift(a, b, "v"))
    assert rows[0]["hl_shift"] == pytest.approx(-4.0)


def test_release_triangle_count(spark):
    from dataframes_jl_spark.ops.graph import triangle_count

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src int, dst int"
    )
    rows = _assert_released(spark, triangle_count(edges))
    assert rows[0]["n_triangles"] == 1


def test_release_wasserstein_energy(spark):
    from dataframes_jl_spark.functions.stats import (
        energy_distance,
        wasserstein_1d,
    )

    a = spark.createDataFrame([(float(v),) for v in range(8)], "v double")
    b = spark.createDataFrame(
        [(float(v) + 2.0,) for v in range(8)], "v double"
    )
    rows = _assert_released(spark, wasserstein_1d(a, b, "v"))
    assert rows[0]["w1"] == pytest.approx(2.0)
    rows = _assert_released(spark, energy_distance(a, b, "v"))
    assert rows[0]["energy"] is not None


def test_release_brier_decomposition(spark):
    from dataframes_jl_spark.functions.stats import brier_decomposition

    df = spark.createDataFrame(
        [(1, 0.9), (0, 0.1), (1, 0.8), (0, 0.3), (1, 0.6), (0, 0.4)],
        "y int, p double",
    )
    rows = _assert_released(spark, brier_decomposition(df, "y", "p"))
    assert rows[0]["n"] == 6


def test_release_footrule_and_rbo(spark):
    from dataframes_jl_spark.functions.ranking import (
        rbo_topk,
        spearman_footrule,
    )

    df = spark.createDataFrame(
        [(i, float(i), float(10 - i)) for i in range(1, 6)],
        "id int, a double, b double",
    )
    rows = _assert_released(spark, spearman_footrule(df, "a", "b", "id"))
    # n=5 fully reversed: F = 4+2+0+2+4 = 12, max = floor(25/2) = 12
    assert rows[0]["footrule"] == 12
    assert rows[0]["norm_footrule"] == pytest.approx(1.0)
    rows = _assert_released(spark, rbo_topk(df, "a", "b", "id", k=3))
    assert rows[0]["n_joint"] >= 1


def test_footrule_exact_divisor_small_odd_n(spark):
    """n=3 fully reversed: F = 2+0+2 = 4, ⌊9/2⌋ = 4 → EXACTLY 1.0
    (the round-14 advice case: n²/2 in doubles gave 0.888889)."""
    from dataframes_jl_spark.functions.ranking import spearman_footrule

    df = spark.createDataFrame(
        [(1, 3.0, 1.0), (2, 2.0, 2.0), (3, 1.0, 3.0)],
        "id int, a double, b double",
    )
    out = spearman_footrule(df, "a", "b", "id")
    row = out.collect()[0]
    from dataframes_jl_spark import release

    release(out)
    assert row["footrule"] == 4
    assert row["norm_footrule"] == pytest.approx(1.0)


def test_hold_dedupes_and_propagates(spark):
    from dataframes_jl_spark.core.cache import hold, release

    base = spark.range(10).persist()
    mid = hold(base.select((F.col("id") * 2).alias("x")), base)
    out = hold(mid.select(F.sum("x").alias("s")), mid, base)
    assert len(out.unpersist_handles) == 1  # deduped by identity
    out.collect()
    release(out)
    assert _n_cached_rdds(spark) == 0


def test_containment_prefix_low_jaccard_subsets(spark):
    """The round-14 verdict ask #6 fixture in miniature: planted pairs
    with containment >= 0.8 but Jaccard <= 0.3 (a short doc quoted in
    a much longer one) that Jaccard-targeted MinHash banding misses.
    The prefix-filter lane must find every one (deterministic
    recall 1) and agree exactly with the quadratic baseline."""
    from dataframes_jl_spark.llm.dedup import (
        containment_pairs,
        containment_pairs_prefix,
    )

    words = [f"w{i:03d}" for i in range(60)]
    long_doc = " ".join(words)                       # 58 shingles
    quote = " ".join(words[:14])                     # 12 shingles, all in long
    other = " ".join(f"x{i:03d}" for i in range(40)) # disjoint
    quote2 = " ".join(f"x{i:03d}" for i in range(8, 20))
    docs = spark.createDataFrame(
        [(1, long_doc), (2, quote), (3, other), (4, quote2)],
        "doc_id int, text string",
    )
    got = containment_pairs_prefix(
        docs, "doc_id", "text", n=3, threshold=0.8
    )
    rows = {(r["id_a"], r["id_b"]): r for r in got.collect()}
    assert set(rows) == {(1, 2), (3, 4)}
    # quote side containment exactly 1.0; Jaccard would be 12/58 ~ 0.21
    assert rows[(1, 2)]["containment_b"] == 1.0
    assert rows[(3, 4)]["containment_b"] == 1.0
    # agrees exactly with the quadratic baseline
    base = {
        (r["id_a"], r["id_b"]): (r["containment_a"], r["containment_b"])
        for r in containment_pairs(
            docs, "doc_id", "text", n=3, threshold=0.8
        ).collect()
    }
    assert base == {
        k: (v["containment_a"], v["containment_b"]) for k, v in rows.items()
    }


def test_containment_prefix_matches_exact_on_neardups(spark):
    """On the ordinary near-dup regime the prefix lane returns the
    identical pair set as the exact baseline (recall 1 AND precision 1
    - verification is exact)."""
    from dataframes_jl_spark.llm.dedup import (
        containment_pairs,
        containment_pairs_prefix,
    )

    base_words = [f"t{i:03d}" for i in range(30)]
    variants = []
    for d in range(6):
        w = list(base_words)
        if d % 2 == 1:
            w[7] = f"mut{d}"
        variants.append((d, " ".join(w)))
    docs = spark.createDataFrame(variants, "doc_id int, text string")

    def key(df):
        return sorted(
            (r["id_a"], r["id_b"], r["containment_a"], r["containment_b"])
            for r in df.collect()
        )

    exact = key(containment_pairs(docs, "doc_id", "text", threshold=0.8))
    pref = key(
        containment_pairs_prefix(docs, "doc_id", "text", threshold=0.8)
    )
    assert exact == pref and len(exact) > 0
