"""Round-8 regression tests: the three ADVICE fixes (NULL-keyed diff
identity, KS NaN tie-break, single-scan equi-depth ranks)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


# ------------------------------------------------------ NULL-keyed diff

def test_table_diff_pairs_null_keys(spark):
    """A NULL key must pair across snapshots (null-safe join), not split
    into a spurious added+removed pair."""
    from dataframes_jl_spark.ops.diff import table_diff

    old = spark.createDataFrame(
        [(None, 10), (1, 20)], "k int, v int"
    )
    new = spark.createDataFrame(
        [(None, 11), (1, 20)], "k int, v int"
    )
    rows = {(r.k, r.status) for r in table_diff(old, new, ["k"]).collect()}
    assert rows == {(None, "changed"), (1, "unchanged")}


def test_apply_diff_identity_with_null_keys(spark):
    """apply_diff(old, table_diff(old, new)) == new must hold when key
    values include NULL (removed NULL-keyed rows must actually be
    removed; added NULL-keyed rows must not duplicate)."""
    from dataframes_jl_spark.ops.diff import apply_diff, table_diff

    old = spark.createDataFrame(
        [(None, "stale"), (1, "keep"), (2, "gone")], "k int, v string"
    )
    new = spark.createDataFrame(
        [(None, "fresh"), (1, "keep"), (3, "born")], "k int, v string"
    )
    applied = apply_diff(old, table_diff(old, new, ["k"]), ["k"])
    got = sorted(
        ((r.k, r.v) for r in applied.collect()),
        key=lambda t: (t[0] is None, t[0] or 0, t[1]),
    )
    want = sorted(
        ((r.k, r.v) for r in new.collect()),
        key=lambda t: (t[0] is None, t[0] or 0, t[1]),
    )
    assert got == want


def test_apply_diff_identity_null_key_added_and_removed(spark):
    """The two NULL-key failure modes from the advice, isolated: a
    NULL-keyed 'removed' row and a NULL-keyed 'added' row."""
    from dataframes_jl_spark.ops.diff import apply_diff, table_diff

    # removed: NULL key only in old
    old = spark.createDataFrame([(None, 1), (1, 2)], "k int, v int")
    new = spark.createDataFrame([(1, 2)], "k int, v int")
    applied = apply_diff(old, table_diff(old, new, ["k"]), ["k"])
    assert [(r.k, r.v) for r in applied.collect()] == [(1, 2)]

    # added: NULL key only in new — exactly one output row, not two
    old2 = spark.createDataFrame([(1, 2)], "k int, v int")
    new2 = spark.createDataFrame([(None, 9), (1, 2)], "k int, v int")
    applied2 = apply_diff(old2, table_diff(old2, new2, ["k"]), ["k"])
    got = sorted(
        ((r.k, r.v) for r in applied2.collect()),
        key=lambda t: (t[0] is None, t[0] or 0),
    )
    assert got == [(1, 2), (None, 9)]


# ------------------------------------------------------ KS NaN tie-break

def test_ks_statistic_nan_tie_prefers_finite(spark):
    """When NaN ties with a finite value at the max ECDF gap, ks_at must
    report the smallest FINITE value (the oracle's ORDER BY gap DESC,
    v ASC), not NaN."""
    from dataframes_jl_spark.functions.stats import ks_statistic

    nan = float("nan")
    # NaN is the GREATEST value, so at its row both ECDFs are complete
    # and its gap is 0 — NaN can only tie at the max gap when the max
    # gap IS 0, i.e. identical distributions. There the old
    # max(struct(gap, -v)) picked NaN (-NaN is NaN, sorts greatest);
    # the oracle's ORDER BY gap DESC, v ASC picks the smallest value.
    a = spark.createDataFrame([(1.0,), (nan,)], "v double")
    r = ks_statistic(a, a, "v").collect()[0]
    assert r.ks_stat == 0.0
    assert r.ks_at == 1.0 and not math.isnan(r.ks_at)


def test_ks_statistic_nan_mass_still_counts(spark):
    """NaN rows carry ECDF mass like any value; with a genuine nonzero
    sup the statistic and location are unaffected by the demotion."""
    from dataframes_jl_spark.functions.stats import ks_statistic

    nan = float("nan")
    # a={1,2,NaN}, b={5,6,NaN}, n=3 each. Integer gaps |cum_a*3-cum_b*3|:
    # v=1: 3; v=2: 6; v=5: 3; v=6: 0; v=NaN: 0 -> sup at v=2.
    a = spark.createDataFrame([(1.0,), (2.0,), (nan,)], "v double")
    b = spark.createDataFrame([(5.0,), (6.0,), (nan,)], "v double")
    r = ks_statistic(a, b, "v").collect()[0]
    assert r.ks_at == 2.0
    assert abs(r.ks_stat - 2.0 / 3.0) < 1e-8


# ------------------------------------------- equi-depth single-scan ranks

def test_exact_ranks_n_matches_exact_ranks(spark):
    from dataframes_jl_spark.ops.selection import exact_ranks, exact_ranks_n

    df = spark.range(1, 101).select(F.col("id").cast("double").alias("v"))
    vals, n = exact_ranks_n(df, "v", lambda n: [1, n // 2, n])
    assert n == 100
    assert vals == exact_ranks(df, "v", [1, 50, 100])
    assert vals == [1.0, 50.0, 100.0]


def test_exact_ranks_n_empty(spark):
    from dataframes_jl_spark.ops.selection import exact_ranks_n

    df = spark.createDataFrame([], "v double")
    vals, n = exact_ranks_n(df, "v", lambda n: [1])
    assert (vals, n) == ([], 0)


def test_equidepth_histogram_single_head_scan(spark):
    """The histogram derives its ranks from the selection engine's own
    head-stats n — results unchanged vs round 7, one fewer scan."""
    from dataframes_jl_spark.ops.histogram import equidepth_histogram

    df = spark.range(1, 41).select(F.col("id").cast("double").alias("v"))
    out = {r.bucket: r for r in equidepth_histogram(df, "v", k=4).collect()}
    assert len(out) == 4
    assert out[0].lo == 1.0 and out[3].hi == 40.0
    assert sum(r.n_rows for r in out.values()) == 40
    for b in range(4):
        assert out[b].n_rows == 10
