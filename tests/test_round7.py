"""Unit tests for the round-7 operators: Markov transitions,
categorical association, equi-depth histograms / exact ranks,
frequent pairs, CDC apply, referential integrity, KS drift,
char-class entropy, triangle counting."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- markov

def test_transition_matrix_basic(spark):
    from dataframes_jl_spark.ops.markov import transition_matrix

    rows = [
        # user 1: a -> b -> a   user 2: a -> b
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"),
        (2, 1, "a"), (2, 2, "b"),
    ]
    df = spark.createDataFrame(rows, "uid long, seq long, st string")
    out = {
        (r.from_state, r.to_state): (r.n, r.n_from, r.prob)
        for r in transition_matrix(df, "uid", "st", ["seq"]).collect()
    }
    assert out[("a", "b")] == (2, 2, 1.0)
    assert out[("b", "a")] == (1, 1, 1.0)
    assert ("b", "b") not in out and ("a", "a") not in out


def test_transition_counts_terminal_rows_excluded(spark):
    from dataframes_jl_spark.ops.markov import transition_counts

    df = spark.createDataFrame(
        [(1, 1, "x")], "uid long, seq long, st string"
    )
    assert transition_counts(df, "uid", "st", ["seq"]).count() == 0


# ------------------------------------------------------------ infotheory

def test_association_independent_and_dependent(spark):
    from dataframes_jl_spark.functions.infotheory import association

    # perfectly independent 2x2: every cell 25
    indep = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "uv" for _ in range(25)],
        "a string, b string",
    )
    row = association(indep, "a", "b").collect()[0]
    assert row.n_total == 100
    assert abs(row.chi2) < 1e-6 and abs(row.mutual_info) < 1e-6
    assert row.cramers_v == 0.0

    # perfectly dependent: a == b
    dep = spark.createDataFrame(
        [(c, c) for c in "xy" for _ in range(50)], "a string, b string"
    )
    row = association(dep, "a", "b").collect()[0]
    assert row.chi2 == pytest.approx(100.0, abs=1e-6)  # n * V^2, V=1
    assert row.mutual_info == pytest.approx(math.log(2), abs=1e-6)
    assert row.cramers_v == pytest.approx(1.0, abs=1e-6)


def test_association_null_level_counts(spark):
    from dataframes_jl_spark.functions.infotheory import association

    df = spark.createDataFrame(
        [("x", "u"), (None, "u"), ("x", None)], "a string, b string"
    )
    row = association(df, "a", "b").collect()[0]
    assert row.n_levels_a == 2 and row.n_levels_b == 2


# ------------------------------------------------- exact ranks / histogram

def test_exact_ranks_match_sorted(spark):
    from dataframes_jl_spark.ops.selection import exact_ranks

    vals = [float(x) for x in [7, 1, 5, 3, 9, 5, 2, 8, 5, 4]]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    srt = sorted(vals)
    ranks = [1, 3, 5, 7, 10]
    got = exact_ranks(df, "v", ranks, n_buckets=4, collect_limit=3)
    assert got == [srt[r - 1] for r in ranks]
    with pytest.raises(ValueError):
        exact_ranks(df, "v", [0])
    with pytest.raises(ValueError):
        exact_ranks(df, "v", [11])


def test_equidepth_histogram_counts_and_ties(spark):
    from dataframes_jl_spark.ops.histogram import equidepth_histogram

    # 8 rows, k=4 -> boundaries at ranks 2,4,6; tie mass on 2.0
    vals = [1.0, 2.0, 2.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = {r.bucket: r for r in equidepth_histogram(df, "v", k=4).collect()}
    assert len(out) == 4
    assert out[0].lo == 1.0 and out[3].hi == 6.0
    # every row lands exactly once
    assert sum(r.n_rows for r in out.values()) == 8
    # ties at a boundary land in the lower bucket: boundary_1 = rank2 = 2.0,
    # all three 2.0s plus 1.0 sit at bucket 0
    assert out[0].n_rows == 4


def test_equidepth_histogram_empty(spark):
    from dataframes_jl_spark.ops.histogram import equidepth_histogram

    df = spark.createDataFrame([], "v double")
    assert equidepth_histogram(df, "v", k=3).count() == 0


# ---------------------------------------------------------------- basket

def test_frequent_pairs_known(spark):
    from dataframes_jl_spark.ops.basket import frequent_pairs

    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"),
        (4, "c"),
        (4, "c"),  # within-basket dupe must not double-count
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = {
        (r.item_a, r.item_b): r
        for r in frequent_pairs(df, "basket", "item", min_count=2).collect()
    }
    ab = out[("a", "b")]
    assert ab.n_pair == 3 and ab.n_a == 3 and ab.n_b == 3
    assert ab.support == pytest.approx(0.75)
    assert ab.confidence == pytest.approx(1.0)
    assert ab.lift == pytest.approx(3 * 4 / 9, abs=1e-6)
    # c appears in 2 baskets (dupe collapsed) but co-occurs with a/b once
    assert out[("a", "c")].n_pair == 1


def test_frequent_pairs_basket_guard(spark):
    from dataframes_jl_spark.ops.basket import frequent_pairs

    df = spark.createDataFrame(
        [(1, f"i{k}") for k in range(5)], "basket long, item string"
    )
    with pytest.raises(Exception, match="max_basket"):
        frequent_pairs(df, "basket", "item", min_count=1, max_basket=3).collect()


# ------------------------------------------------------------- apply_diff

def test_apply_diff_inverts_table_diff(spark):
    from dataframes_jl_spark.ops.diff import apply_diff, table_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, "d", 40)],
        "k long, s string, v long",
    )
    new = spark.createDataFrame(
        [(1, "a", 10),          # unchanged
         (2, "B", 20),          # changed
         (4, "d", None),        # changed to NULL
         (5, "e", 50)],         # added (3 removed)
        "k long, s string, v long",
    )
    changes = table_diff(old, new, ["k"])
    applied = apply_diff(old, changes, ["k"])
    got = sorted((r.k, r.s, r.v) for r in applied.collect())
    want = sorted((r.k, r.s, r.v) for r in new.collect())
    assert got == want


def test_apply_diff_missing_payload_raises(spark):
    from dataframes_jl_spark.ops.diff import apply_diff

    old = spark.createDataFrame([(1, "a")], "k long, s string")
    ch = spark.createDataFrame([(1, "added")], "k long, status string")
    with pytest.raises(ValueError, match="new_"):
        apply_diff(old, ch, ["k"])


# -------------------------------------------------------------- integrity

def test_check_relation_counts(spark):
    from dataframes_jl_spark.ops.integrity import check_relation

    child = spark.createDataFrame(
        [(1,), (1,), (2,), (9,), (9,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (2,), (3,)], "pk long")
    r = check_relation("t", child, "fk", parent, "pk").collect()[0]
    assert r.n_child == 6 and r.n_null_fk == 1
    assert r.n_orphan_rows == 2 and r.n_orphan_keys == 1   # key 9
    assert r.n_parent == 4 and r.n_parent_dup_keys == 1    # pk 2 twice
    assert r.orphan_rate == pytest.approx(2 / 5, abs=1e-6)


# --------------------------------------------------------------------- ks

def test_ks_statistic_identical_and_disjoint(spark):
    from dataframes_jl_spark.functions.stats import ks_statistic

    a = spark.createDataFrame([(float(i),) for i in range(10)], "v double")
    same = ks_statistic(a, a, "v").collect()[0]
    assert same.ks_stat == 0.0

    b = spark.createDataFrame([(float(i + 100),) for i in range(7)], "v double")
    far = ks_statistic(a, b, "v").collect()[0]
    assert far.ks_stat == 1.0 and far.n_a == 10 and far.n_b == 7
    assert far.ks_at == 9.0  # gap first maximal at a's top value


def test_ks_statistic_known_half(spark):
    from dataframes_jl_spark.functions.stats import ks_statistic

    # a = {1,2,3,4}, b = {3,4,5,6}: sup gap = 1/2 at v=2
    a = spark.createDataFrame([(v,) for v in [1.0, 2.0, 3.0, 4.0]], "v double")
    b = spark.createDataFrame([(v,) for v in [3.0, 4.0, 5.0, 6.0]], "v double")
    r = ks_statistic(a, b, "v").collect()[0]
    assert r.ks_stat == pytest.approx(0.5)
    assert r.ks_at == 2.0


# ---------------------------------------------------------------- entropy

def test_char_class_entropy_values(spark):
    from dataframes_jl_spark.llm.text import char_class_entropy

    df = spark.createDataFrame(
        [("aaaa",), ("aA1 ",), ("",), (None,)], "t string"
    )
    got = [r.h for r in df.select(char_class_entropy("t").alias("h")).collect()]
    assert got[0] == 0.0                                # one class
    assert got[1] == pytest.approx(math.log(4), abs=1e-6)  # 4 classes uniform
    assert got[2] is None and got[3] is None


def test_char_class_counts_partition(spark):
    from dataframes_jl_spark.llm.text import char_class_counts

    df = spark.createDataFrame([("aB3 .\tü",)], "t string")
    cols = char_class_counts("t")
    row = df.select(*[c.alias(k) for k, c in cols.items()]).collect()[0]
    assert row.lower == 1 and row.upper == 1 and row.digit == 1
    assert row.space == 2          # ' ' and '\t'
    assert row.other == 2          # '.' and 'ü'


# --------------------------------------------------------------- triangle

def test_triangle_count_known_graphs(spark):
    from dataframes_jl_spark.ops.graph import triangle_count

    def tc(edges):
        df = spark.createDataFrame(edges, "src long, dst long")
        return triangle_count(df).collect()[0]

    # K4: 4 triangles; duplicate/reversed/self edges collapse
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    k4 += [(0, 0), (1, 2), (2, 1)]
    r = tc(k4)
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 6, 4)

    # 4-cycle: no triangles
    r = tc([(0, 1), (1, 2), (2, 3), (3, 0)])
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 4, 0)

    # star (hub + 5 leaves): no triangles, skewed degrees
    r = tc([(9, leaf) for leaf in range(5)])
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (6, 5, 0)
