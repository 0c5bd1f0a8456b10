"""Frequent item pairs (market-basket co-occurrence) with support,
confidence, and lift.

Beyond-reference operator: co-occurrence mining — "parts ordered
together", "domains cited together", token collocations — is the
2-itemset core of Apriori (Agrawal & Srikant 1994, public). Higher
orders fall out by re-applying the same prune+join; the pair level is
what a curation pipeline actually reads (lift tables, co-citation
graphs).

Scale shape — the whole design is the Apriori prune, applied BEFORE the
quadratic step:

1. distinct (basket, item) — one shuffle, removes within-basket dupes
   so a basket contributes each pair once;
2. item support counts — map-side-combining aggregate, |items| rows;
3. **prune**: only items with count >= min_count survive (downward
   closure: a pair can never be frequent if either member is not).
   The pruned item list joins back as a broadcast semi-join when small;
4. pair generation: self-join ON basket with item_a < item_b — the
   only quadratic step, and it is quadratic per basket in the PRUNED
   width, not the raw width;
5. pair counts + metrics from the (tiny) pair table joined to the
   (tiny) item-count table.

A pathological basket (one order holding 10^5 frequent items) makes
step 4 explode quadratically; ``max_basket`` bounds it — oversized
baskets raise loudly (in-plan assert) rather than silently OOM a
worker, same contract as the fuzzy-match length guard.

Metrics are exact ratios of exact longs, floor-quantized (the dsum
discipline) so every engine reports identical values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def frequent_pairs(
    df: DataFrame,
    basket: str | Column,
    item: str | Column,
    min_count: int = 2,
    max_basket: int = 10_000,
    metric_scale: int = 6,
) -> DataFrame:
    """Frequent co-occurring item pairs.

    Returns ``(item_a, item_b, n_pair, n_a, n_b, support, confidence,
    lift)`` for unordered pairs whose BOTH members appear in at least
    ``min_count`` distinct baskets — and only pairs that co-occur at
    least once, with:

    - ``support``     n_pair / n_baskets
    - ``confidence``  n_pair / n_a (P(b in basket | a in basket),
                      directional: reported for the a->b direction;
                      the b->a value is n_pair / n_b)
    - ``lift``        n_pair * n_baskets / (n_a * n_b)

    ``item_a < item_b`` under the column's natural ordering; items must
    be non-NULL (NULL items are dropped — a NULL co-occurrence is
    meaningless).

    Caching contract: persists the vocabulary-bounded item-count table
    (it feeds the prune list and both metric join sides) and attaches
    the handle to the result as ``unpersist_handles`` — release with
    ``dataframes_jl_spark.release(result)`` once consumed (or
    session-wide ``spark.catalog.clearCache()``); pre-contract callers
    that never release simply accumulate one bounded cached table per
    call, exactly like the r14 operators that pioneered the contract.
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    b = (F.col(basket) if isinstance(basket, str) else basket).alias("basket")
    i = (F.col(item) if isinstance(item, str) else item).alias("item")
    pairs_src = (
        df.select(b, i)
        .filter(F.col("item").isNotNull() & F.col("basket").isNotNull())
        .distinct()
    )
    n_baskets_df = pairs_src.select(
        F.count_distinct("basket").alias("n_baskets")
    )
    # item_counts feeds THREE branches (the prune list and both metric
    # join sides); unpersisted, each re-runs the distinct shuffle AND
    # the count aggregate above it (7 source scans in the physical
    # plan). The table is |items|-bounded — one row per distinct item,
    # a vocabulary at any corpus scale — so persist it; the handle
    # rides the result per the core.cache contract.
    item_counts = (
        pairs_src.groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_item"))
        .persist()
    )
    frequent = item_counts.filter(F.col("n_item") >= min_count)

    # no forced broadcast: the pruned item list is usually tiny (AQE
    # converts to a broadcast semi-join at runtime) but CAN be large at
    # corpus scale, where the shuffle semi-join is the correct plan
    kept = pairs_src.join(frequent.select("item"), "item", "semi")
    # loud bound on the quadratic step: a basket wider than max_basket
    # after pruning would generate ~width^2/2 pairs on one key
    wb = Window.partitionBy("basket")
    kept = kept.withColumn("__bw__", F.count(F.lit(1)).over(wb))
    guard = F.assert_true(
        F.col("__bw__") <= F.lit(max_basket),
        F.lit(f"frequent_pairs: basket wider than max_basket={max_basket} "
              "after pruning; raise max_basket or min_count"),
    )
    kept = kept.withColumn("__g__", guard)

    left = kept.select(
        F.col("basket"), F.col("item").alias("item_a"), F.col("__g__")
    )
    right = kept.select(
        F.col("basket").alias("basket_r"), F.col("item").alias("item_b")
    )
    pair_counts = (
        left.join(
            right,
            (F.col("basket") == F.col("basket_r"))
            & (F.col("item_a") < F.col("item_b")),
        )
        .groupBy("item_a", "item_b")
        # MAX carries the assert guard through the aggregate so column
        # pruning cannot drop it (the hll_estimate lesson)
        .agg(F.count(F.lit(1)).alias("n_pair"), F.max("__g__").alias("__g__"))
    )
    ca = item_counts.select(
        F.col("item").alias("item_a"), F.col("n_item").alias("n_a")
    )
    cb = item_counts.select(
        F.col("item").alias("item_b"), F.col("n_item").alias("n_b")
    )
    m = F.lit(float(10**metric_scale))

    def _q(x: Column) -> Column:
        return F.floor(x * m + F.lit(0.5)) / m

    out = (
        pair_counts.join(ca, "item_a")
        .join(cb, "item_b")
        .crossJoin(F.broadcast(n_baskets_df))
    )
    nb = F.col("n_baskets").cast("double")
    final = out.select(
        "item_a",
        "item_b",
        # guard folded as when(isnull(assert), x) WITHOUT otherwise —
        # both-branches-equal forms get simplified away by Catalyst,
        # this one cannot be (assert_true is null iff it didn't raise)
        F.when(F.col("__g__").isNull(), F.col("n_pair")).alias("n_pair"),
        "n_a",
        "n_b",
        _q(F.col("n_pair") / nb).alias("support"),
        _q(F.col("n_pair") / F.col("n_a")).alias("confidence"),
        # n_a*n_b multiplies as DOUBLE: two longs can overflow int64 at
        # corpus scale (ANSI would raise; the double product cannot)
        _q(
            F.col("n_pair") * nb
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
        ).alias("lift"),
    )
    from ..core.cache import hold

    return hold(final, item_counts)


def npmi_pairs(
    df: DataFrame,
    basket: str | Column,
    item: str | Column,
    min_count: int = 2,
    metric_scale: int = 6,
) -> DataFrame:
    """(Normalized) pointwise mutual information for co-occurring item
    pairs — the collocation score that separates "co-occurs because
    both are popular" (lift ~ 1, npmi ~ 0) from genuine association
    (npmi -> 1), the standard phrase/bundle detector over
    :func:`frequent_pairs`' pruned pair table.

    Identities on the already-computed columns: ``pmi = ln(lift)`` and
    ``npmi = pmi / (−ln(support))`` — so this adds ZERO data movement
    beyond frequent_pairs itself; the ln runs on the QUANTIZED
    support/lift values (deterministic inputs → the quantized outputs
    absorb libm drift, the repo's standard treatment). ``npmi`` is
    NULL when support = 1 (−ln 0 denominator: the pair is in every
    basket and normalization is undefined) or lift quantized to 0.
    Returns frequent_pairs' columns plus ``(pmi, npmi)``.
    """
    base = frequent_pairs(
        df, basket, item, min_count=min_count, metric_scale=metric_scale
    )
    om = F.lit(float(10**metric_scale))

    def _q(c):
        return F.floor(c * om + F.lit(0.5)) / om

    pmi = F.log(F.col("lift"))
    npmi = pmi / (-F.log(F.col("support")))
    out = base.select(
        "*",
        F.when(F.col("lift") > 0, _q(pmi)).alias("pmi"),
        F.when(
            (F.col("lift") > 0) & (F.col("support") < 1.0), _q(npmi)
        ).alias("npmi"),
    )
    from ..core.cache import hold

    # propagate frequent_pairs' cache handles through the projection
    return hold(out, base)


def audience_overlap(
    df: DataFrame,
    key: str,
    group_col: str,
    out_scale: int = 6,
) -> DataFrame:
    """EXACT pairwise audience overlap between the values of
    ``group_col``: for every unordered segment pair, how many ``key``
    entities belong to both, with Jaccard and Szymkiewicz-Simpson
    overlap coefficients — the cross-segment twin of
    :func:`frequent_pairs` (baskets = entities, items = segments) and
    the exact counterpart of ops.qsketch's KMV overlap estimate: KMV
    answers it from sketches when the segment count is huge; this
    answers it exactly while |segments| is small (event types,
    sources, languages — the dashboard case).

    Returns one row per pair ``(group_a, group_b, n_a, n_b, n_both,
    jaccard, overlap)`` with group_a < group_b lexically; every
    metric an exact-int ratio, floor-quantized.

    Scale shape: ONE row-volume shuffle total — the per-entity
    ``collect_set`` of segments (the distinct step folded into it);
    singles and ordered pairs then EXPLODE from each entity's set in
    the same projection (quadratic only in the per-entity segment
    COUNT, ≤ |segments|, a bounded dashboard-scale number) into one
    map-side-combining count whose bounded |segments|²-row output is
    persisted for its two consumers (totals, pairs). No self-join of
    the entity table, no second scan.
    """
    from pyspark import StorageLevel

    sets = (
        df.filter(F.col(key).isNotNull() & F.col(group_col).isNotNull())
        .select(
            F.col(key).alias("k"),
            F.col(group_col).cast("string").alias("g"),
        )
        .groupBy("k")
        .agg(F.collect_set("g").alias("gs"))
    )
    # one exploded stream carries BOTH the per-segment memberships
    # (b IS NULL marker rows) and the ordered segment pairs
    items = sets.select(
        F.explode(
            F.expr(
                "concat("
                " transform(gs, x -> struct(x as a,"
                "                           cast(null as string) as b)),"
                " flatten(transform(gs, x ->"
                "   transform(filter(gs, y -> y > x),"
                "             y -> struct(x as a, y as b))))"
                ")"
            )
        ).alias("p")
    )
    counts = (
        items.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tot = counts.filter(F.col("b").isNull()).select(
        F.col("a").alias("g"), F.col("c").alias("n")
    )
    pairs = counts.filter(F.col("b").isNotNull()).select(
        F.col("a").alias("group_a"),
        F.col("b").alias("group_b"),
        F.col("c").alias("n_both"),
    )
    om = F.lit(float(10**out_scale))

    def _q(c):
        return F.floor(c * om + F.lit(0.5)) / om

    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    both = F.col("n_both").cast("double")
    return (
        pairs.join(
            F.broadcast(tot.select(F.col("g").alias("group_a"),
                                   F.col("n").alias("n_a"))),
            "group_a",
        )
        .join(
            F.broadcast(tot.select(F.col("g").alias("group_b"),
                                   F.col("n").alias("n_b"))),
            "group_b",
        )
        .select(
            "group_a",
            "group_b",
            "n_a",
            "n_b",
            "n_both",
            _q(both / (na + nb - both)).alias("jaccard"),
            _q(both / F.least(na, nb)).alias("overlap"),
        )
    )
