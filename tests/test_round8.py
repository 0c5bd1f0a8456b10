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


# ----------------------------------------------------------- gini / lorenz

def test_gini_known_values(spark):
    from dataframes_jl_spark.ops.inequality import gini

    # perfectly equal: G = (2*Σi*x)/(n*Σx) - (n+1)/n with x=c →
    # 2*(n(n+1)/2)/(n*n) - (n+1)/n = 0
    eq = spark.createDataFrame([(float(10),) for _ in range(5)], "v double")
    assert gini(eq, "v").collect()[0].gini == 0.0

    # maximal concentration: one holder of everything, n=5 →
    # G = 2*5*x/(5*x) - 6/5 = 2 - 1.2 = 0.8 (= (n-1)/n)
    conc = spark.createDataFrame(
        [(0.0,), (0.0,), (0.0,), (0.0,), (100.0,)], "v double"
    )
    assert abs(gini(conc, "v").collect()[0].gini - 0.8) < 1e-9


def test_gini_grouped_and_negative_excluded(spark):
    from dataframes_jl_spark.ops.inequality import gini

    df = spark.createDataFrame(
        [("a", 10.0), ("a", 10.0), ("b", 0.0), ("b", 100.0), ("b", -5.0)],
        "g string, v double",
    )
    out = {r.g: r for r in gini(df, "v", group_by=["g"]).collect()}
    assert out["a"].gini == 0.0 and out["a"].n == 2
    assert out["b"].n == 2  # negative excluded
    assert abs(out["b"].gini - 0.5) < 1e-9  # n=2, one holds all: (n-1)/n


def test_lorenz_deciles_monotone(spark):
    from dataframes_jl_spark.ops.inequality import lorenz_deciles

    df = spark.range(1, 101).selectExpr("CAST(id AS DOUBLE) AS v", "id AS k")
    rows = sorted(
        lorenz_deciles(df, "v", tiebreak="k").collect(),
        key=lambda r: r.decile,
    )
    shares = [r.cum_share for r in rows]
    assert len(shares) == 10
    assert all(b >= a for a, b in zip(shares, shares[1:]))
    assert abs(shares[-1] - 1.0) < 1e-9
    # bottom decile of 1..100 holds (1+..+10)/5050
    assert abs(shares[0] - 55.0 / 5050.0) < 1e-5


# ------------------------------------------------------------ cohens kappa

def test_cohens_kappa_perfect_and_chance(spark):
    from dataframes_jl_spark.functions.infotheory import cohens_kappa

    same = spark.createDataFrame(
        [("x", "x"), ("y", "y"), ("x", "x"), ("y", "y")], "a string, b string"
    )
    r = cohens_kappa(same, "a", "b").collect()[0]
    assert r.kappa == 1.0 and r.p_observed == 1.0

    # independent margins, agreement exactly at chance -> kappa 0
    rows = [("x", "x"), ("x", "y"), ("y", "x"), ("y", "y")]
    ind = spark.createDataFrame(rows, "a string, b string")
    r2 = cohens_kappa(ind, "a", "b").collect()[0]
    assert r2.kappa == 0.0 and r2.p_observed == 0.5 and r2.p_expected == 0.5


# ----------------------------------------------------------------- benford

def test_benford_audit_shape(spark):
    from dataframes_jl_spark.ops.integrity import benford_audit
    from pyspark.sql import functions as F  # noqa: F811

    df = spark.range(1, 1000).select(
        (F.col("id").cast("double") / 100.0).alias("v")
    )
    rows = {r.digit: r for r in benford_audit(df, "v").collect()}
    assert set(rows) <= set(range(1, 10))
    assert sum(r.n_values for r in rows.values()) == 999
    total_ppm = sum(r.obs_ppm for r in rows.values())
    assert abs(total_ppm - 1_000_000) <= len(rows)  # floor rounding slack
    # uniform 1..999 puts ~111/999 on each leading digit -> obs far from
    # Benford's 30.1% for digit 1
    assert rows[1].exp_ppm == 301030
    assert rows[1].dev_ppm == rows[1].obs_ppm - rows[1].exp_ppm


def test_benford_excludes_nonpositive(spark):
    from dataframes_jl_spark.ops.integrity import benford_audit

    df = spark.createDataFrame(
        [(0.0,), (-12.0,), (None,), (19.0,), (1.2,)], "v double"
    )
    rows = {r.digit: r.n_values for r in benford_audit(df, "v").collect()}
    # 9-row contract: zero-observation digits report explicitly
    assert rows == {1: 2, **{d: 0 for d in range(2, 10)}}


def test_benford_nine_row_contract(spark):
    """A digit with zero mass is the loudest anomaly — it must appear
    with obs_ppm=0 and dev_ppm=-exp_ppm, and empty input still yields
    the 9-row spine (no ANSI /0)."""
    from dataframes_jl_spark.ops.integrity import benford_audit

    df = spark.createDataFrame([(1.0,), (1.5,), (2.0,)], "v double")
    rows = {r.digit: r for r in benford_audit(df, "v").collect()}
    assert set(rows) == set(range(1, 10))
    assert rows[9].n_values == 0 and rows[9].obs_ppm == 0
    assert rows[9].dev_ppm == -rows[9].exp_ppm
    empty = benford_audit(df.filter("v < 0"), "v").collect()
    assert len(empty) == 9 and all(r.obs_ppm == 0 for r in empty)


# ------------------------------------------------------------ survivorship

def test_survivorship_latest_non_null(spark):
    from dataframes_jl_spark.ops.scd import survivorship

    df = spark.createDataFrame(
        [
            (1, 1, "old@x", "NY"),
            (1, 2, None, "LA"),      # newest row has a gap in email
            (2, 1, "b@x", None),
            (2, 2, None, None),
        ],
        "k int, seq int, email string, city string",
    )
    out = {r.k: r for r in survivorship(df, ["k"], ["seq"]).collect()}
    assert out[1].email == "old@x" and out[1].city == "LA"
    assert out[2].email == "b@x" and out[2].city is None
    assert out[1].n_versions == 2 and out[1].last_rn == 2


def test_survivorship_requires_keys(spark):
    from dataframes_jl_spark.ops.scd import survivorship

    df = spark.createDataFrame([(1, 1)], "k int, seq int")
    import pytest as _pt

    with _pt.raises(ValueError):
        survivorship(df, [], ["seq"])


# ------------------------------------------------------------- decayed sum

def test_decayed_sum_halving(spark):
    from dataframes_jl_spark.functions.stats import decayed_sum

    df = spark.createDataFrame(
        [
            ("u", "2024-01-15 00:00:00", 8.0),   # newest -> weight 1
            ("u", "2024-01-08 00:00:00", 8.0),   # 7 days -> 1 period -> 0.5
            ("u", "2024-01-01 00:00:00", 8.0),   # 14 days -> 2 -> 0.25
        ],
        "g string, ts string, v double",
    ).selectExpr("g", "CAST(ts AS TIMESTAMP) AS ts", "v AS v")
    r = decayed_sum(df, "v", "ts", ["g"]).collect()[0]
    assert r.n_events == 3
    assert abs(r.decayed_sum - (8.0 + 4.0 + 2.0)) < 1e-9


# ------------------------------------------------------------------- cusum

def test_cusum_detects_level_shift(spark):
    from dataframes_jl_spark.functions.stats import cusum_peaks
    from pyspark.sql import functions as F  # noqa: F811

    # 10 quiet days (1 event/day) then 5 loud days (5 events/day):
    # the CUSUM peak lands on the last loud day
    rows = []
    eid = 0
    for d in range(1, 11):
        rows.append((f"2024-01-{d:02d} 10:00:00",))
    for d in range(11, 16):
        for _ in range(5):
            rows.append((f"2024-01-{d:02d} 10:00:00",))
    df = spark.createDataFrame(rows, "ts string").select(
        F.col("ts").cast("timestamp").alias("ts"), F.lit("t").alias("g")
    )
    r = cusum_peaks(df, "ts", ["g"]).collect()[0]
    assert str(r.peak_day) == "2024-01-15"
    assert r.n_days == 15 and r.total_events == 35
    assert r.peak_cusum > 0


# ----------------------------------------------------------------- ab test

def test_two_proportion_ztest_known(spark):
    import math as _m

    from dataframes_jl_spark.functions.stats import two_proportion_ztest

    rows = [(0, True)] * 30 + [(0, False)] * 70 + [(1, True)] * 50 + [(1, False)] * 50
    df = spark.createDataFrame(rows, "variant int, converted boolean")
    r = two_proportion_ztest(df, "variant", "converted").collect()[0]
    assert (r.n_a, r.x_a, r.n_b, r.x_b) == (100, 30, 100, 50)
    p = 80 / 200
    z = (0.3 - 0.5) / _m.sqrt(p * (1 - p) * (1 / 100 + 1 / 100))
    assert abs(r.z_score - z) < 1e-5


def test_two_proportion_ztest_rejects_three_variants(spark):
    import pytest as _pt

    from dataframes_jl_spark.functions.stats import two_proportion_ztest

    df = spark.createDataFrame(
        [(0, True), (1, False), (2, True)], "variant int, converted boolean"
    )
    with _pt.raises(Exception, match="exactly 2 levels"):
        two_proportion_ztest(df, "variant", "converted").collect()


# --------------------------------------------------------------- winsorize

def test_winsorized_stats_clamps_tails(spark):
    from dataframes_jl_spark.functions.stats import winsorized_stats
    from pyspark.sql import functions as F  # noqa: F811

    # 1..100 with winsorize at p05/p95: bounds are the elements at
    # rank ceil(0.05*100)=5 and ceil(0.95*100)=95
    df = spark.range(1, 101).select(
        F.col("id").cast("double").alias("v"), F.lit("g").alias("seg")
    )
    r = winsorized_stats(df, "v", ["seg"]).collect()[0]
    assert r.lo_bound == 5.0 and r.hi_bound == 95.0
    # clamped sum: 4 values raised to 5 (+10 -1-2-3-4=+10), 5 values
    # lowered to 95 (96..100 -> -1-2-3-4-5 = -15): 5050 + 10 - 15 = 5045
    assert abs(r.winsorized_mean - 50.45) < 1e-9
    assert r.n == 100


# ------------------------------------------------------------- containment

def test_containment_detects_subset(spark):
    from dataframes_jl_spark.llm.dedup import containment_pairs

    quote = "the quick brown fox jumps over the lazy dog"
    article = quote + " and then it ran far away into the woods tonight"
    df = spark.createDataFrame(
        [(1, quote), (2, article), (3, "completely unrelated text here okay")],
        "doc_id long, text string",
    )
    rows = {(r.id_a, r.id_b): r for r in
            containment_pairs(df, "doc_id", "text", threshold=0.8).collect()}
    assert (1, 2) in rows
    r = rows[(1, 2)]
    # every shingle of the quote appears in the article
    assert r.containment_a == 1.0
    assert r.containment_b < 1.0
    assert (1, 3) not in rows and (2, 3) not in rows


# ----------------------------------------------------------- assortativity

def test_assortativity_star_negative_clique_flat(spark):
    from dataframes_jl_spark.ops.graph import degree_assortativity

    # star: hub degree 5, leaves degree 1 -> perfectly disassortative
    star = spark.createDataFrame(
        [(9, leaf) for leaf in range(5)], "src long, dst long"
    )
    r = degree_assortativity(star).collect()[0]
    assert r.n_stubs == 10
    assert r.assortativity == -1.0

    # K4: all degrees equal -> zero variance -> defined 0.0
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    r2 = degree_assortativity(
        spark.createDataFrame(k4, "src long, dst long")
    ).collect()[0]
    assert r2.assortativity == 0.0


# ------------------------------------------------------- confusion metrics

def test_confusion_metrics_known(spark):
    from dataframes_jl_spark.functions.infotheory import confusion_metrics

    # truth: 3 x, 2 y; pred: x right twice, y always called x
    rows = [("x", "x"), ("x", "x"), ("x", "y"), ("y", "x"), ("y", "x")]
    df = spark.createDataFrame(rows, "truth string, pred string")
    out = {r.label: r for r in confusion_metrics(df, "truth", "pred").collect()}
    x = out["x"]
    assert (x.tp, x.pred_pos, x.actual_pos) == (2, 4, 3)
    assert x.precision == 0.5 and abs(x.recall - 2 / 3) < 1e-5
    assert abs(x.f1 - 4 / 7) < 1e-5
    y = out["y"]
    assert (y.tp, y.pred_pos, y.actual_pos) == (0, 1, 2)
    assert y.precision == 0.0 and y.recall == 0.0 and y.f1 == 0.0


def test_confusion_metrics_class_only_in_pred(spark):
    from dataframes_jl_spark.functions.infotheory import confusion_metrics

    df = spark.createDataFrame(
        [("a", "b"), ("a", "a")], "truth string, pred string"
    )
    out = {r.label: r for r in confusion_metrics(df, "truth", "pred").collect()}
    assert out["b"].actual_pos == 0 and out["b"].pred_pos == 1
    assert out["b"].recall == 0.0


# ----------------------------------------------------------- rare collapse

def test_collapse_rare_folds_tail(spark):
    from dataframes_jl_spark.ops.reshape import collapse_rare
    from pyspark.sql import functions as F  # noqa: F811

    rows = [("a",)] * 5 + [("b",)] * 2 + [("c",)] * 1 + [(None,)]
    df = spark.createDataFrame(rows, "cat string")
    out = collapse_rare(df, "cat", 3, other="OTHER")
    counts = {
        r.cat: r.n for r in out.groupBy("cat").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {"a": 5, "OTHER": 3, None: 1}
    assert out.columns == ["cat"]


def test_collapse_rare_preserves_other_columns(spark):
    from dataframes_jl_spark.ops.reshape import collapse_rare

    df = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 30)], "k int, v int"
    )
    out = collapse_rare(df, "k", 2, other=-1)
    got = sorted((r.k, r.v) for r in out.collect())
    assert got == [(-1, 30), (1, 10), (1, 20)]


# ---------------------------------------------------------------- welch t

def test_welch_ttest_known(spark):
    import math as _m

    from dataframes_jl_spark.functions.stats import welch_ttest

    a = spark.createDataFrame([(x,) for x in [1.0, 2.0, 3.0, 4.0]], "v double")
    b = spark.createDataFrame([(x,) for x in [3.0, 5.0, 7.0]], "v double")
    r = welch_ttest(a, b, "v").collect()[0]
    assert (r.n_a, r.n_b) == (4, 3)
    # means 2.5 and 5, vars 5/3 and 4
    sea, seb = (5 / 3) / 4, 4 / 3
    t = (2.5 - 5.0) / _m.sqrt(sea + seb)
    df = (sea + seb) ** 2 / (sea**2 / 3 + seb**2 / 2)
    assert abs(r.t_stat - t) < 1e-5
    assert abs(r.df - df) < 1e-5
    assert r.mean_a == 2.5 and r.mean_b == 5.0


def test_welch_ttest_identical_zero(spark):
    from dataframes_jl_spark.functions.stats import welch_ttest

    a = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "v double")
    r = welch_ttest(a, a, "v").collect()[0]
    assert r.t_stat == 0.0


# ------------------------------------------------------------ mann-whitney

def test_mann_whitney_known_no_ties(spark):
    from dataframes_jl_spark.functions.stats import mann_whitney_u

    # a = {1,2}, b = {3,4,5}: every b beats every a -> U_a = 0
    a = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    b = spark.createDataFrame([(3.0,), (4.0,), (5.0,)], "v double")
    r = mann_whitney_u(a, b, "v").collect()[0]
    assert (r.n_a, r.n_b) == (2, 3)
    assert r.u_stat == 0.0
    assert r.z_score < 0

    # symmetric swap: U_b = n_a*n_b - U_a = 6
    r2 = mann_whitney_u(b, a, "v").collect()[0]
    assert r2.u_stat == 6.0
    assert abs(r2.z_score + r.z_score) < 1e-9


def test_mann_whitney_ties_midrank(spark):
    from dataframes_jl_spark.functions.stats import mann_whitney_u

    # a = {1,1}, b = {1,2}: ranks of the three 1s are midrank 2 each.
    # R_a = 4, U_a = R_a - n_a(n_a+1)/2 = 4 - 3 = 1
    a = spark.createDataFrame([(1.0,), (1.0,)], "v double")
    b = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    r = mann_whitney_u(a, b, "v").collect()[0]
    assert r.u_stat == 1.0


def test_mann_whitney_all_tied_zero_z(spark):
    from dataframes_jl_spark.functions.stats import mann_whitney_u

    a = spark.createDataFrame([(7.0,), (7.0,)], "v double")
    r = mann_whitney_u(a, a, "v").collect()[0]
    assert r.z_score == 0.0  # variance degenerates under total ties


# --------------------------------------------------------------------- jsd

def test_jensen_shannon_bounds(spark):
    import math as _m

    from dataframes_jl_spark.functions.infotheory import jensen_shannon

    same = spark.createDataFrame([("x",), ("y",), ("x",)], "c string")
    r = jensen_shannon(same, same, "c").collect()[0]
    assert r.jsd == 0.0 and r.jsd_norm == 0.0

    a = spark.createDataFrame([("x",), ("x",)], "c string")
    b = spark.createDataFrame([("y",), ("y",)], "c string")
    r2 = jensen_shannon(a, b, "c").collect()[0]
    assert abs(r2.jsd - _m.log(2.0)) < 1e-6
    assert abs(r2.jsd_norm - 1.0) < 1e-6
    assert r2.n_levels == 2


# ----------------------------------------------------- metamorphic laws

def test_gini_scale_invariant(spark):
    """Gini is invariant under positive scaling of the values."""
    from dataframes_jl_spark.ops.inequality import gini

    base = spark.createDataFrame(
        [(float(x),) for x in [1, 5, 5, 20, 100]], "v double"
    )
    scaled = base.selectExpr("v * 7 AS v")
    g1 = gini(base, "v").collect()[0].gini
    g2 = gini(scaled, "v").collect()[0].gini
    assert abs(g1 - g2) < 1e-6


def test_kappa_symmetric(spark):
    """Cohen's kappa is symmetric in its two raters."""
    from dataframes_jl_spark.functions.infotheory import cohens_kappa

    rows = [("x", "y"), ("x", "x"), ("y", "y"), ("y", "x"), ("x", "x")]
    df = spark.createDataFrame(rows, "a string, b string")
    k1 = cohens_kappa(df, "a", "b").collect()[0].kappa
    k2 = cohens_kappa(df, "b", "a").collect()[0].kappa
    assert k1 == k2


def test_jsd_symmetric(spark):
    from dataframes_jl_spark.functions.infotheory import jensen_shannon

    a = spark.createDataFrame([("x",), ("x",), ("y",)], "c string")
    b = spark.createDataFrame([("x",), ("y",), ("y",), ("z",)], "c string")
    j1 = jensen_shannon(a, b, "c").collect()[0].jsd
    j2 = jensen_shannon(b, a, "c").collect()[0].jsd
    assert j1 == j2 and 0.0 < j1 < 0.6931472


def test_welch_antisymmetric(spark):
    from dataframes_jl_spark.functions.stats import welch_ttest

    a = spark.createDataFrame([(1.0,), (2.0,), (4.0,)], "v double")
    b = spark.createDataFrame([(3.0,), (6.0,), (9.0,), (1.0,)], "v double")
    t1 = welch_ttest(a, b, "v").collect()[0]
    t2 = welch_ttest(b, a, "v").collect()[0]
    assert abs(t1.t_stat + t2.t_stat) < 2e-6  # quantization slack
    assert abs(t1.df - t2.df) < 2e-6


def test_decayed_sum_shift_invariant(spark):
    """Shifting ALL timestamps by the same delta leaves the decayed sum
    unchanged (age is measured from the data's own max day)."""
    from dataframes_jl_spark.functions.stats import decayed_sum
    from pyspark.sql import functions as F  # noqa: F811

    df = spark.createDataFrame(
        [("g", "2024-01-01 00:00:00", 5.0), ("g", "2024-01-10 00:00:00", 3.0)],
        "g string, ts string, v double",
    ).select("g", F.col("ts").cast("timestamp").alias("ts"), F.col("v"))
    shifted = df.select("g", (F.col("ts") + F.expr("INTERVAL 100 DAYS")).alias("ts"), "v")
    d1 = decayed_sum(df, "v", "ts", ["g"]).collect()[0].decayed_sum
    d2 = decayed_sum(shifted, "v", "ts", ["g"]).collect()[0].decayed_sum
    assert d1 == d2


def test_benford_scale_by_power_of_ten_invariant(spark):
    """Multiplying every value by 10 leaves first digits unchanged."""
    from dataframes_jl_spark.ops.integrity import benford_audit
    from pyspark.sql import functions as F  # noqa: F811

    df = spark.range(1, 500).select((F.col("id") * 1.37).alias("v"))
    d1 = {r.digit: r.n_values for r in benford_audit(df, "v").collect()}
    d2 = {
        r.digit: r.n_values
        for r in benford_audit(df.selectExpr("v * 10 AS v"), "v").collect()
    }
    assert d1 == d2


def test_survivorship_idempotent(spark):
    """Running survivorship on its own single-version output returns
    the same records."""
    from dataframes_jl_spark.ops.scd import survivorship

    df = spark.createDataFrame(
        [(1, 1, "a", None), (1, 2, None, "b"), (2, 1, "c", "d")],
        "k int, seq int, x string, y string",
    )
    once = survivorship(df, ["k"], ["seq"]).select("k", "x", "y")
    again = survivorship(
        once.withColumn("seq", F.lit(1)), ["k"], ["seq"]
    ).select("k", "x", "y")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, again.collect()))


def test_containment_subset_of_jaccard_candidates(spark):
    """Every jaccard>=t pair is a containment pair at the same common
    count; containment at threshold 0 reproduces all sharing pairs."""
    from dataframes_jl_spark.llm.dedup import containment_pairs, jaccard_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta zeta"),
            (3, "one two three four five"),
        ],
        "doc_id long, text string",
    )
    jp = {(r.id_a, r.id_b) for r in jaccard_pairs(docs, "doc_id", "text", threshold=0.3).collect()}
    cp = {(r.id_a, r.id_b) for r in containment_pairs(docs, "doc_id", "text", threshold=0.0).collect()}
    assert jp <= cp


# ---------------------------------------------------------- stream drift

def test_drift_stream_merge_matches_batch(spark, tmp_path):
    """Update-mode emissions across micro-batches, max-merged by the
    consumer, reconstruct the exact per-window counts — and the JSD
    equals the batch computation over the same rows."""
    from dataframes_jl_spark.streaming.drift import (
        drift_stream,
        merge_drift_snapshots,
    )

    d = tmp_path / "drift_in"
    d.mkdir()
    # two event-time hours; level mix shifts in hour 2; 3 micro-batches
    rows = []
    for i in range(120):
        hour = 10 if i % 2 == 0 else 11
        lvl = "a" if (i % 3 == 0 or hour == 10) else "b"
        rows.append((f"2024-03-01 {hour}:{i % 60:02d}:00", lvl))
    for b in range(3):
        chunk = rows[b::3]
        (d / f"{b}.csv").write_text(
            "ts,lvl\n" + "\n".join(f"{t},{l}" for t, l in chunk) + "\n"
        )
    stream = (
        spark.readStream.schema("ts timestamp, lvl string")
        .option("maxFilesPerTrigger", 1)
        .option("header", True)
        .csv(str(d))
    )
    q = (
        drift_stream(stream, "ts", "lvl", window="1 hour", watermark="4 hours")
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_drift")
        .start()
    )
    try:
        q.processAllAvailable()
        snaps = spark.sql("SELECT win_start, lvl, n FROM t_drift")
        n_emissions = snaps.count()
        bdf = spark.createDataFrame(rows, "ts string, lvl string").select(
            F.col("ts").cast("timestamp").alias("ts"), "lvl"
        )
        ref = bdf.groupBy(F.col("lvl")).agg(F.count(F.lit(1)).alias("ref_n"))
        merged = {
            str(r.win_start): r
            for r in merge_drift_snapshots(snaps, ref).collect()
        }
    finally:
        q.stop()

    # consumer counts == exact batch per-window counts
    exact = {
        (str(r.win_start), r.lvl): r.n
        for r in bdf.groupBy(
            F.window("ts", "1 hour").getField("start").alias("win_start"), "lvl"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {
        (str(r.win_start), r.lvl): r.n
        for r in spark.sql(
            "SELECT win_start, lvl, MAX(n) AS n FROM t_drift GROUP BY 1, 2"
        ).collect()
    }
    assert got == exact
    # multiple batches touched hour 10 -> stale intermediates existed
    assert n_emissions > len(exact)
    # hour 10 is all 'a' (mix [1,0]); hour 11 is 1/3 a, 2/3 b: its JSD
    # vs the global reference must be smaller than hour 10's
    w10 = [v for k, v in merged.items() if "10:00:00" in k][0]
    w11 = [v for k, v in merged.items() if "11:00:00" in k][0]
    assert w10.jsd > w11.jsd >= 0.0
    assert 0.0 <= w10.jsd_norm <= 1.0


# ------------------------------------------------------------ vocab / oov

def test_oov_stats_known(spark):
    from dataframes_jl_spark.llm.relevance import oov_stats, vocab_topn

    docs = spark.createDataFrame(
        [
            ("a", "cat dog cat dog cat"),
            ("b", "cat zebra quokka dog"),
        ],
        "src string, text string",
    )
    v = {r.term for r in vocab_topn(docs, "text", n=2).collect()}
    assert v == {"cat", "dog"}
    out = {r.src: r for r in oov_stats(docs, "src", "text", vocab_size=2).collect()}
    assert out["a"].n_oov == 0 and out["a"].oov_rate == 0.0
    assert out["b"].n_tokens == 4 and out["b"].n_oov == 2
    assert out["b"].oov_rate == 0.5


def test_vocab_topn_boundary_tie_deterministic(spark):
    from dataframes_jl_spark.llm.relevance import vocab_topn

    # b and c tie at count 2; term-asc tiebreak keeps 'b' at n=2
    docs = spark.createDataFrame(
        [("x", "a a a b b c c")], "src string, text string"
    )
    v = [r.term for r in vocab_topn(docs, "text", n=2).collect()]
    assert v == ["a", "b"]


# ------------------------------------------------------------ char-lm score

def test_char_lm_scores_separate_garbage(spark):
    from dataframes_jl_spark.llm.text import char_bigram_table, char_lm_scores

    prose = "the quick brown fox jumps over the lazy dog and runs home"
    train = spark.createDataFrame(
        [("good", prose), ("good", prose[::-1])], "src string, text string"
    )
    table = char_bigram_table(train, "text")
    rows = {r.bg: r for r in table.collect()}
    # logp is a true conditional log-prob: sums to ~1 per context
    import math as _m
    by_ctx = {}
    for bg, r in rows.items():
        by_ctx.setdefault(bg[0], []).append(_m.exp(r.logp))
    for probs in by_ctx.values():
        assert abs(sum(probs) - 1.0) < 1e-4
    # held-out scoring: junk hits unseen transitions -> floor penalties
    score = spark.createDataFrame(
        [("good", prose), ("junk", "qxqzqjqxqzqj")], "src string, text string"
    )
    out = {r.src: r for r in char_lm_scores(score, table, "src", "text").collect()}
    assert out["junk"].avg_logp < out["good"].avg_logp


def test_char_lm_unseen_bigram_floor(spark):
    from dataframes_jl_spark.llm.text import char_bigram_table, char_lm_scores

    train = spark.createDataFrame([("t", "ababab")], "src string, text string")
    table = char_bigram_table(train, "text")
    score_new = spark.createDataFrame(
        [("new", "zz")], "src string, text string"
    )
    out = char_lm_scores(score_new, table, "src", "text").collect()[0]
    assert out.n_bigrams == 1
    assert out.avg_logp < 0  # floor penalty applied, not NULL/crash


# ------------------------------------------------------------- theil-sen

def test_theilsen_resists_outlier(spark):
    from dataframes_jl_spark.functions.timeseries import theilsen_trend
    from pyspark.sql import functions as F  # noqa: F811

    # counts 1,2,3,...,9 per day (slope 1) with day 5 spiked to 50:
    # OLS would bend; the pairwise-slope median stays ~1
    rows = []
    for d in range(1, 10):
        n = 50 if d == 5 else d
        for i in range(n):
            rows.append((f"2024-02-{d:02d} 08:{i % 60:02d}:{i // 60:02d}",))
    df = spark.createDataFrame(rows, "ts string").select(
        F.col("ts").cast("timestamp").alias("ts"), F.lit("g").alias("k")
    )
    r = theilsen_trend(df, "ts", ["k"]).collect()[0]
    assert r.n_days == 9 and r.n_pairs == 36
    assert abs(r.trend_per_day - 1.0) < 0.35


def test_theilsen_single_day_null(spark):
    from dataframes_jl_spark.functions.timeseries import theilsen_trend
    from pyspark.sql import functions as F  # noqa: F811

    df = spark.createDataFrame(
        [("2024-02-01 00:00:00",)] * 3, "ts string"
    ).select(F.col("ts").cast("timestamp").alias("ts"), F.lit("g").alias("k"))
    r = theilsen_trend(df, "ts", ["k"]).collect()[0]
    assert r.n_days == 1 and r.n_pairs == 0 and r.trend_per_day is None


# -------------------------------------------------------- autocorrelation

def test_autocorrelation_period_two(spark):
    from dataframes_jl_spark.functions.timeseries import autocorrelation
    from pyspark.sql import functions as F  # noqa: F811

    # alternating 1,3,1,3,... daily counts: ACF(1) ~ -1, ACF(2) ~ +1
    rows = []
    for d in range(1, 13):
        n = 3 if d % 2 == 0 else 1
        for i in range(n):
            rows.append((f"2024-02-{d:02d} 08:0{i}:00",))
    df = spark.createDataFrame(rows, "ts string").select(
        F.col("ts").cast("timestamp").alias("ts"), F.lit("g").alias("k")
    )
    out = {r.lag: r.acf for r in autocorrelation(df, "ts", ["k"], max_lag=3).collect()}
    assert out[1] < -0.8 and out[2] > 0.8
    assert -1.0 <= out[3] <= 1.0


def test_autocorrelation_constant_series_null(spark):
    from dataframes_jl_spark.functions.timeseries import autocorrelation
    from pyspark.sql import functions as F  # noqa: F811

    rows = [(f"2024-02-{d:02d} 08:00:00",) for d in range(1, 6)]
    df = spark.createDataFrame(rows, "ts string").select(
        F.col("ts").cast("timestamp").alias("ts"), F.lit("g").alias("k")
    )
    out = {r.lag: r.acf for r in autocorrelation(df, "ts", ["k"], max_lag=2).collect()}
    # zero variance -> den = 0 -> NULL, not a crash or a fake 1.0
    assert out == {1: None, 2: None}


# --------------------------------------------------- join size estimate

def test_join_size_estimate_equals_actual(spark):
    from dataframes_jl_spark.ops.skew import join_size_estimate

    a = spark.createDataFrame(
        [(1,), (1,), (2,), (3,), (None,)], "jk int"
    )
    b = spark.createDataFrame(
        [(1,), (2,), (2,), (4,), (None,)], "jk int"
    )
    r = join_size_estimate(a, b, "jk").collect()[0]
    # key 1: 2*1=2, key 2: 1*2=2 -> est 4; keys 3/4/None never match
    assert int(r.est_join_rows) == 4
    assert r.n_matching_keys == 2
    assert int(r.max_single_key_rows) == 2
    actual = a.join(b, "jk").count()
    assert int(r.est_join_rows) == actual


# ------------------------------------------------------- cell residuals

def test_standardized_residuals_uniform_zero(spark):
    from dataframes_jl_spark.functions.infotheory import standardized_residuals

    # perfectly independent uniform 2x2: every residual is 0
    rows = [("x", "u"), ("x", "v"), ("y", "u"), ("y", "v")] * 5
    df = spark.createDataFrame(rows, "a string, b string")
    out = standardized_residuals(df, "a", "b").collect()
    assert len(out) == 4
    assert all(r.std_residual == 0.0 and r.expected == 5.0 for r in out)


def test_standardized_residuals_detect_excess(spark):
    from dataframes_jl_spark.functions.infotheory import standardized_residuals

    rows = [("x", "u")] * 9 + [("x", "v")] * 1 + [("y", "u")] * 1 + [("y", "v")] * 9
    df = spark.createDataFrame(rows, "a string, b string")
    out = {(r.a, r.b): r.std_residual for r in standardized_residuals(df, "a", "b").collect()}
    # E = 5 everywhere; (9-5)/sqrt(5) = 1.788854, (1-5)/sqrt(5) = -1.788854
    assert abs(out[("x", "u")] - 1.788854) < 1e-6
    assert abs(out[("y", "v")] - 1.788854) < 1e-6
    assert abs(out[("x", "v")] + 1.788854) < 1e-6
    assert abs(out[("y", "u")] + 1.788854) < 1e-6


# ----------------------------------------------------------- null matrix

def test_null_matrix_rates(spark):
    from dataframes_jl_spark.functions.stats import null_matrix

    df = spark.createDataFrame(
        [("s1", 1, None), ("s1", None, "a"), ("s2", 3, "b"), ("s2", 4, "c")],
        "src string, x int, y string",
    )
    out = {(r.src, r.column): r for r in null_matrix(df, "src").collect()}
    assert out[("s1", "x")].n_null == 1 and out[("s1", "x")].null_rate == 0.5
    assert out[("s1", "y")].n_null == 1
    assert out[("s2", "x")].n_null == 0 and out[("s2", "x")].null_rate == 0.0
    assert all(r.n_rows == 2 for r in out.values())


def test_drift_stream_keeps_watermark_append_mode(spark, tmp_path):
    """Grouping by the FULL window() struct preserves the event-time
    watermark on the aggregate: append mode must be ACCEPTED (the old
    .getField("start")-in-key form stripped the metadata and Spark
    refused append outright — and never evicted state in update mode)."""
    from dataframes_jl_spark.streaming.drift import drift_stream

    d = tmp_path / "drift_wm"
    d.mkdir()
    (d / "a.csv").write_text(
        "ts,lvl\n2024-03-01 10:00:00,a\n2024-03-01 15:00:00,b\n"
    )
    stream = (
        spark.readStream.schema("ts timestamp, lvl string")
        .option("header", True)
        .csv(str(d))
    )
    q = (
        drift_stream(stream, "ts", "lvl", window="1 hour", watermark="2 hours")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_drift_wm")
        .start()
    )
    try:
        q.processAllAvailable()
        # the 15:00 event advances the watermark past hour 10 -> the
        # hour-10 window is finalized and emitted in append mode
        rows = spark.sql(
            "SELECT win_start, lvl, n FROM t_drift_wm"
        ).collect()
    finally:
        q.stop()
    got = {(str(r.win_start), r.lvl, r.n) for r in rows}
    assert ("2024-03-01 10:00:00", "a", 1) in got


# ------------------------------------------- NULL-level infotheory merges

def test_jsd_null_level_single_row(spark):
    """NULL is a level (contingency convention): present on BOTH sides
    it must merge into ONE row via eqNullSafe — a plain equi-join would
    split it, inflate n_levels, and add two p*ln2 terms. Here the two
    frames are identical, so JSD must be exactly 0."""
    from dataframes_jl_spark.functions.infotheory import jensen_shannon

    df = spark.createDataFrame(
        [("x",), ("x",), (None,), (None,), ("y",)], "c string"
    )
    r = jensen_shannon(df, df, "c").collect()[0]
    assert r.n_levels == 3
    assert r.jsd == 0.0 and r.jsd_norm == 0.0


def test_confusion_null_class_one_row(spark):
    """A NULL class must yield ONE row with its true diagonal tp and
    both margins — not split into tp=0 fragments."""
    from dataframes_jl_spark.functions.infotheory import confusion_metrics

    df = spark.createDataFrame(
        [(None, None), (None, "a"), ("a", None), ("a", "a"), ("b", "a")],
        "t string, p string",
    )
    rows = {r.label: r for r in confusion_metrics(df, "t", "p").collect()}
    assert set(rows) == {None, "a", "b"}
    nr = rows[None]
    assert nr.tp == 1 and nr.actual_pos == 2 and nr.pred_pos == 2
    assert rows["a"].tp == 1 and rows["a"].pred_pos == 3
    assert rows["a"].actual_pos == 2
    assert rows["b"].tp == 0 and rows["b"].actual_pos == 1 and rows["b"].pred_pos == 0
