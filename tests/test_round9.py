"""Round-9 tests: the mergeable quantile sketch (batch compaction
tree + streaming bottom-k sample) and the ungrouped gini/lorenz
global-rank path."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def _exact_rank_err(spark, df, value, est: float, p: float, n: int) -> float:
    """Distance from p to the RANK INTERVAL [frac(< est), frac(<= est)]
    of the estimate — the sketch guarantee is on ranks, not values
    (value error is unbounded for adversarial gaps), and with heavy
    ties any value whose rank interval covers p is exactly right."""
    lo = df.filter(F.col(value) < est).count() / n
    hi = df.filter(F.col(value) <= est).count() / n
    if lo <= p <= hi:
        return 0.0
    return min(abs(p - lo), abs(p - hi))


# ------------------------------------------------------------- batch tree

def test_qsketch_weight_exact_and_bounded(spark):
    from dataframes_jl_spark.ops.qsketch import quantile_sketch

    n = 50_000
    df = spark.range(n).select(
        F.col("id").alias("uid"), (F.col("id") % 997).cast("double").alias("v")
    )
    rows = quantile_sketch(df, "v", "uid", k=128, B=512).collect()
    assert sum(r.w for r in rows) == n  # pair-absorb preserves Sum w exactly
    # size ~ n/B plus log slack, never unbounded
    assert len(rows) <= max(128, n // 512 + 64)


def test_qsketch_deterministic_under_partitioning(spark):
    from dataframes_jl_spark.ops.qsketch import quantile_sketch

    df = spark.range(20_000).select(
        F.col("id").alias("uid"),
        (F.col("id") * 37 % 1000).cast("double").alias("v"),
    )
    a = sorted(
        (r.q, r.h, r.uid, r.w)
        for r in quantile_sketch(df, "v", "uid", k=64, B=256).collect()
    )
    b = sorted(
        (r.q, r.h, r.uid, r.w)
        for r in quantile_sketch(
            df.repartition(13), "v", "uid", k=64, B=256
        ).collect()
    )
    assert a == b  # hash-blocked tree is a function of the row SET


def test_qsketch_rank_error_across_distributions(spark):
    from dataframes_jl_spark.ops.qsketch import (
        quantile_sketch,
        sketch_quantiles,
    )

    n = 40_000
    rng = np.random.RandomState(7)
    dists = {
        "uniform": rng.uniform(0, 1000, n),
        "zipfish": 1000.0 / (1 + rng.zipf(1.5, n) % 1000),
        "clustered": np.repeat([1.0, 2.0, 500.0, 999.0], n // 4),
    }
    probs = [("p10", 1, 10), ("p50", 1, 2), ("p99", 99, 100)]
    for name, vals in dists.items():
        df = spark.createDataFrame(
            [(int(i), float(v)) for i, v in enumerate(vals)],
            "uid long, v double",
        )
        sk = quantile_sketch(df, "v", "uid", k=128, B=256, scale=4)
        size = sk.count()
        est = {
            r.p_label: r.est
            for r in sketch_quantiles(sk, probs, scale=4).collect()
        }
        for lbl, num, den in probs:
            err = _exact_rank_err(spark, df, "v", est[lbl], num / den, n)
            # deterministic-tree bound: well under 2/size rank error
            assert err <= 2.0 / size, (name, lbl, err, size)


def test_qsketch_grouped_and_merge_algebra(spark):
    from functools import reduce

    from dataframes_jl_spark.ops.qsketch import (
        merge_quantile_sketches,
        quantile_sketch,
        sketch_quantiles,
    )

    n = 30_000
    df = spark.range(n).select(
        F.col("id").alias("uid"),
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 1009).cast("double").alias("v"),
    )
    sk = quantile_sketch(df, "v", "uid", group_by=["g"], k=64, B=128)
    per_g = {r.g: 0 for r in sk.select("g").distinct().collect()}
    assert set(per_g) == {"0", "1", "2"}
    w = {r.g: r.s for r in sk.groupBy("g").agg(F.sum("w").alias("s")).collect()}
    assert all(v == n // 3 for v in w.values())

    est = {
        (r.g, r.p_label): r.est
        for r in sketch_quantiles(
            sk, [("p50", 1, 2)], group_by=["g"]
        ).collect()
    }
    for g in ("0", "1", "2"):
        err = abs(est[(g, "p50")] - 504.5) / 1009.0
        assert err < 0.05

    # merge algebra: shard builds -> union -> merge preserves Sum w and
    # stays within the size bound
    shards = [
        quantile_sketch(
            df.filter(F.pmod(F.col("uid"), F.lit(3)) == i), "v", "uid",
            k=64, B=128,
        )
        for i in range(3)
    ]
    merged = merge_quantile_sketches(
        reduce(lambda x, y: x.unionByName(y), shards), k=64
    )
    rows = merged.collect()
    assert sum(r.w for r in rows) == n
    assert len(rows) <= 64
    p50 = sketch_quantiles(merged, [("p50", 1, 2)]).collect()[0].est
    assert abs(p50 - 504.5) / 1009.0 < 0.06


# ----------------------------------------------------- streaming sampler

def test_quantile_sample_stream_matches_batch_state(spark, tmp_path):
    """Micro-batched stream emissions, max/distinct-merged by the
    consumer, reconstruct the EXACT final bottom-k sample — estimates
    equal a batch replay of the same algebra on the full row set."""
    from dataframes_jl_spark.ops.qsketch import _mix_np
    from dataframes_jl_spark.streaming.quantile import (
        merge_sample_snapshots,
        quantile_sample_stream,
    )

    d = tmp_path / "qs_in"
    d.mkdir()
    n = 600
    rows = [(i, float((i * 13) % 997)) for i in range(n)]
    for b in range(3):
        chunk = rows[b::3]
        (d / f"{b}.csv").write_text(
            "uid,v\n" + "\n".join(f"{u},{v}" for u, v in chunk) + "\n"
        )
    stream = (
        spark.readStream.schema("uid long, v double")
        .option("maxFilesPerTrigger", 1)
        .option("header", True)
        .csv(str(d))
    )
    k, shards = 32, 4
    q = (
        quantile_sample_stream(stream, "v", "uid", k=k, shards=shards)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_qsamp")
        .start()
    )
    try:
        q.processAllAvailable()
        snaps = spark.sql("SELECT shard, n, h, uid, q FROM t_qsamp")
        n_emissions = snaps.count()
        got = merge_sample_snapshots(
            snaps, [("p50", 1, 2), ("p90", 9, 10)], k=k
        ).collect()
    finally:
        q.stop()

    # expected final state from a numpy replay of the set algebra
    uids = np.arange(n, dtype=np.int64)
    hs = _mix_np(uids)
    sh = hs % shards
    gmap = {r.p_label: r for r in got}
    assert gmap["p50"].n == n and gmap["p90"].n == n
    # stream touched 3 micro-batches -> stale emissions existed
    assert n_emissions > sum(min(k, int((sh == s).sum())) for s in range(shards))
    # estimates sit near the true quantiles (sample bound ~1/sqrt(k))
    vals = np.sort(((uids * 13) % 997).astype(float))
    for lbl, p in (("p50", 0.5), ("p90", 0.9)):
        est = gmap[lbl].est
        below = float((vals <= est).mean())
        assert abs(below - p) < 0.25, (lbl, est, below)


def test_quantile_sample_stream_validates(spark):
    from dataframes_jl_spark.streaming.quantile import quantile_sample_stream

    df = spark.readStream.format("rate").load()
    import pytest

    with pytest.raises(ValueError):
        quantile_sample_stream(df, "value", "value", k=0)
    with pytest.raises(ValueError):
        quantile_sample_stream(df, "value", "value", shards=0)


def test_qsketch_validates(spark):
    import pytest

    from dataframes_jl_spark.ops.qsketch import quantile_sketch

    df = spark.range(10).select(
        F.col("id").alias("uid"), F.col("id").cast("double").alias("v")
    )
    with pytest.raises(ValueError):
        quantile_sketch(df, "v", "uid", B=48)  # not a power of two
    with pytest.raises(ValueError):
        quantile_sketch(df, "v", "uid", k=1)


# ---------------------------------------------------------------- ROC AUC

def test_roc_auc_known_values(spark):
    from dataframes_jl_spark.functions.stats import roc_auc

    # perfect separation -> 1.0; reversed -> 0.0
    df = spark.createDataFrame(
        [(1, 10.0), (1, 9.0), (0, 2.0), (0, 1.0)], "y int, s double"
    )
    assert roc_auc(df, "y", "s").collect()[0].auc == 1.0
    rev = df.selectExpr("1 - y AS y", "s")
    assert roc_auc(rev, "y", "s").collect()[0].auc == 0.0


def test_roc_auc_ties_get_half_credit(spark):
    from dataframes_jl_spark.functions.stats import roc_auc

    # one positive and one negative share the same score: each of the
    # 1x1 comparisons is a tie -> AUC = 0.5 exactly via midranks
    df = spark.createDataFrame([(1, 5.0), (0, 5.0)], "y int, s double")
    assert roc_auc(df, "y", "s").collect()[0].auc == 0.5
    # sklearn-checkable mixed case: y=[0,0,1,1], s=[1,2,2,3]
    # pairs: (1@2 vs 0@1)=1, (1@2 vs 0@2)=.5, (1@3 vs both)=2 -> 3.5/4
    df2 = spark.createDataFrame(
        [(0, 1.0), (0, 2.0), (1, 2.0), (1, 3.0)], "y int, s double"
    )
    assert roc_auc(df2, "y", "s").collect()[0].auc == 0.875


def test_roc_auc_degenerate_class_null(spark):
    from dataframes_jl_spark.functions.stats import roc_auc

    df = spark.createDataFrame([(1, 1.0), (1, 2.0)], "y int, s double")
    r = roc_auc(df, "y", "s").collect()[0]
    assert r.auc is None and r.n_neg == 0


def test_roc_auc_rejects_nonbinary_label(spark):
    import pytest

    from dataframes_jl_spark.functions.stats import roc_auc

    df = spark.createDataFrame([(2, 1.0)], "y int, s double")
    # raise_error surfaces as a Spark USER_RAISED_EXCEPTION at collect
    with pytest.raises(Exception, match="must be 0/1"):
        roc_auc(df, "y", "s").collect()


# ---------------------------------------------------- linear interpolation

def test_interpolate_linear_exact_lerp(spark):
    from dataframes_jl_spark.functions.timeseries import interpolate_linear

    rows = [
        ("a", "2024-01-01 00:00:00", 10.0),
        ("a", "2024-01-01 00:00:10", None),   # 1/3 of the way -> 20.0
        ("a", "2024-01-01 00:00:30", 40.0),
        ("a", "2024-01-01 00:00:40", None),   # trailing -> stays NULL
        ("b", "2024-01-01 00:00:00", None),   # leading -> stays NULL
        ("b", "2024-01-01 00:00:05", 7.0),
    ]
    df = spark.createDataFrame(rows, "g string, ts string, v double").select(
        "g", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out = {
        (r.g, str(r.ts)): (r.v, r.filled)
        for r in interpolate_linear(df, "ts", "v", ["g"]).collect()
    }
    assert out[("a", "2024-01-01 00:00:10")] == (20.0, True)
    assert out[("a", "2024-01-01 00:00:40")] == (None, False)
    assert out[("b", "2024-01-01 00:00:00")] == (None, False)
    # non-null rows pass through untouched
    assert out[("a", "2024-01-01 00:00:00")] == (10.0, False)


def test_interpolate_linear_requires_groups(spark):
    import pytest

    from dataframes_jl_spark.functions.timeseries import interpolate_linear

    df = spark.createDataFrame([("2024-01-01", 1.0)], "ts string, v double")
    with pytest.raises(ValueError):
        interpolate_linear(df, "ts", "v", [])


# ------------------------------------------------------------ attribution

def test_attribution_models(spark):
    from dataframes_jl_spark.ops.attribution import attribute_conversions

    rows = [
        # user 1: email then ad touch, then a $100 purchase
        (1, "2024-01-01 00:00:00", 1, "email", 0.0),
        (1, "2024-01-02 00:00:00", 2, "ad", 0.0),
        (1, "2024-01-03 00:00:00", 3, "buy", 100.0),
        # user 2: no touches -> (direct)
        (2, "2024-01-05 00:00:00", 4, "buy", 50.0),
        # user 3: touch OUTSIDE the 30-day lookback -> (direct)
        (3, "2023-11-01 00:00:00", 5, "ad", 0.0),
        (3, "2024-01-05 00:00:00", 6, "buy", 10.0),
    ]
    df = spark.createDataFrame(
        rows, "u long, ts string, eid long, ch string, v double"
    ).select("u", F.col("ts").cast("timestamp").alias("ts"), "eid", "ch", "v")
    out = {
        r.ch: r
        for r in attribute_conversions(
            df, "u", "ts", "eid", "ch", "v",
            is_conversion=F.col("ch") == "buy", lookback_days=30,
        ).collect()
    }
    assert out["email"].credit_first == 100.0  # first touch takes all
    assert out["email"].credit_last == 0.0
    assert out["ad"].credit_last == 100.0      # last touch takes all
    assert out["ad"].credit_first == 0.0
    assert out["email"].credit_linear == 50.0  # linear splits evenly
    assert out["ad"].credit_linear == 50.0
    d = out["(direct)"]
    assert d.credit_first == d.credit_last == d.credit_linear == 60.0
    assert d.n_last == 2 and out["ad"].n_last == 1


def test_attribution_linear_rounding_conserves_mass(spark):
    from dataframes_jl_spark.ops.attribution import attribute_conversions

    # 3 touches split $1.00: floor-quantized sub-cent shares sum back
    # to within a cent of the conversion value
    rows = [(1, f"2024-01-0{i} 00:00:00", i, "t", 0.0) for i in (1, 2, 3)]
    rows.append((1, "2024-01-04 00:00:00", 9, "buy", 1.0))
    df = spark.createDataFrame(
        rows, "u long, ts string, eid long, ch string, v double"
    ).selectExpr("u", "CAST(ts AS TIMESTAMP) AS ts", "eid", "ch", "v")
    out = {
        r.ch: r
        for r in attribute_conversions(
            df, "u", "ts", "eid", "ch", "v",
            is_conversion=F.col("ch") == "buy",
        ).collect()
    }
    assert abs(out["t"].credit_linear - 1.0) <= 0.01


# ------------------------------------------------------ average precision

def test_average_precision_known_values(spark):
    from dataframes_jl_spark.functions.stats import average_precision

    # perfect ranking -> 1.0
    df = spark.createDataFrame(
        [(1, 4.0), (1, 3.0), (0, 2.0), (0, 1.0)], "y int, s double"
    )
    assert average_precision(df, "y", "s").collect()[0].ap == 1.0
    # sklearn cross-check: y=[0,0,1,1], s=[0.1,0.4,0.35,0.8]
    # thresholds desc: 0.8(P=1,dR=.5) -> 0.4(P=.5,dR=0) -> 0.35(P=2/3,
    # dR=.5) -> 0.1(P=.5,dR=0) => AP = .5*1 + .5*2/3 = 0.833333
    df2 = spark.createDataFrame(
        [(0, 0.1), (0, 0.4), (1, 0.35), (1, 0.8)], "y int, s double"
    )
    assert abs(average_precision(df2, "y", "s").collect()[0].ap - 0.833333) < 1e-6


def test_average_precision_no_positives_null(spark):
    from dataframes_jl_spark.functions.stats import average_precision

    df = spark.createDataFrame([(0, 1.0), (0, 2.0)], "y int, s double")
    r = average_precision(df, "y", "s").collect()[0]
    assert r.ap is None and r.n_pos == 0 and r.n_neg == 2


# ------------------------------------------------------------ expectations

def test_expectations_rules(spark):
    from dataframes_jl_spark.ops.expectations import (
        accepted_values,
        expect,
        foreign_key,
        in_range,
        matches,
        not_null,
        unique,
    )

    df = spark.createDataFrame(
        [
            (1, 10.0, "A", "x1"),
            (2, -5.0, "B", "x2"),     # range violation; B not accepted
            (None, 3.0, "A", "zz"),   # null id; regex violation
            (2, None, "A", "x3"),     # duplicate id; NULL skips range
        ],
        "id int, v double, flag string, code string",
    )
    parent = spark.createDataFrame([(1,), (9,)], "pk int")
    rep = {
        (r.rule, r.column): r
        for r in expect(
            df,
            [
                not_null("id"),
                in_range("v", 0.0, 100.0),
                accepted_values("flag", ["A"]),
                matches("code", "^x[0-9]$"),
                unique("id"),
                foreign_key("id", parent, "pk"),
            ],
        ).collect()
    }
    assert rep[("not_null", "id")].n_violations == 1
    assert rep[("in_range", "v")].n_violations == 1      # NULL not billed
    assert rep[("accepted_values", "flag")].n_violations == 1
    assert rep[("matches", "code")].n_violations == 1
    u = rep[("unique", "id")]
    assert u.n_checked == 3 and u.n_violations == 1      # id=2 twice
    fk = rep[("foreign_key", "id")]
    # both id=2 rows miss the parent -> multiplicity-weighted count
    assert fk.n_checked == 3 and fk.n_violations == 2
    assert not fk.passed and rep[("matches", "code")].passed is False


def test_expectations_all_pass_and_empty_rules(spark):
    import pytest

    from dataframes_jl_spark.ops.expectations import expect, not_null

    df = spark.createDataFrame([(1,)], "id int")
    rep = expect(df, [not_null("id")]).collect()
    assert rep[0].passed and rep[0].n_checked == 1
    with pytest.raises(ValueError):
        expect(df, [])


# ------------------------------------------------------------ Kaplan-Meier

def test_kaplan_meier_textbook(spark):
    from dataframes_jl_spark.functions.survival import kaplan_meier

    # classic toy: events at t=1 (n=5 -> S=4/5), t=3 of 3 at risk after
    # a censoring at t=2 (S = 4/5 * 2/3), censored tail at t=4,5
    rows = [(1.0, 1), (2.0, 0), (3.0, 1), (4.0, 0), (5.0, 0)]
    df = spark.createDataFrame(rows, "dur double, e int")
    out = {r.t: r for r in kaplan_meier(df, "dur", "e").collect()}
    assert set(out) == {1, 3}
    assert out[1].n_risk == 5 and out[1].n_events == 1
    assert abs(out[1].survival - 0.8) < 1e-6
    assert out[3].n_risk == 3
    assert abs(out[3].survival - 0.8 * (2.0 / 3.0)) < 1e-5


def test_kaplan_meier_full_collapse_zero(spark):
    from dataframes_jl_spark.functions.survival import kaplan_meier

    # everyone converts at the last time: S must clamp to exactly 0
    df = spark.createDataFrame([(1.0, 1), (2.0, 1)], "dur double, e int")
    out = {r.t: r.survival for r in kaplan_meier(df, "dur", "e").collect()}
    assert out[1] == 0.5 and out[2] == 0.0


def test_kaplan_meier_ties_and_censor_same_time(spark):
    from dataframes_jl_spark.functions.survival import kaplan_meier

    # d=2, c=1 at t=1 with n=4: S = (4-2)/4; censoring at the same t
    # does not change S but shows in n_censored
    df = spark.createDataFrame(
        [(1.0, 1), (1.0, 1), (1.0, 0), (9.0, 0)], "dur double, e int"
    )
    r = {x.t: x for x in kaplan_meier(df, "dur", "e").collect()}[1]
    assert r.n_risk == 4 and r.n_events == 2 and r.n_censored == 1
    assert abs(r.survival - 0.5) < 1e-6


def test_kaplan_meier_rejects_bad_event(spark):
    import pytest

    from dataframes_jl_spark.functions.survival import kaplan_meier

    df = spark.createDataFrame([(1.0, 2)], "dur double, e int")
    with pytest.raises(Exception, match="must be 0/1"):
        kaplan_meier(df, "dur", "e").collect()


# ---------------------------------------------------------- target encode

def test_target_encode_shrinkage(spark):
    from dataframes_jl_spark.ops.encoding import target_encode

    rows = [("a", 10.0)] * 100 + [("b", 0.0)] * 100 + [("rare", 10.0)]
    df = spark.createDataFrame(rows, "c string, y double")
    out = {r.c: r for r in target_encode(df, "c", "y", m=20.0).collect()}
    prior = (100 * 10.0 + 100 * 0.0 + 10.0) / 201  # ~5.0249
    # heavy levels sit near their own mean, the rare level near prior
    assert abs(out["a"].enc - (1000 + 20 * prior) / 120) < 1e-4
    assert abs(out["rare"].enc - (10 + 20 * prior) / 21) < 1e-4
    assert out["rare"].n == 1
    # m=0 degenerates to the plain per-level mean
    raw = {r.c: r.enc for r in target_encode(df, "c", "y", m=0.0).collect()}
    assert raw["a"] == 10.0 and raw["b"] == 0.0


def test_target_encode_null_level_kept(spark):
    from dataframes_jl_spark.ops.encoding import target_encode

    df = spark.createDataFrame(
        [(None, 4.0), (None, 6.0), ("x", 1.0)], "c string, y double"
    )
    out = {r.c: r for r in target_encode(df, "c", "y", m=0.0).collect()}
    assert out[None].n == 2 and out[None].enc == 5.0


# -------------------------------------------------------------- NPMI pairs

def test_npmi_pairs_identities(spark):
    import math

    from dataframes_jl_spark.ops.basket import npmi_pairs

    # items 1,2 always together (3 of 4 baskets); basket 4 breaks
    # universality (support=1 would NULL npmi by the -ln 0 guard)
    rows = [(b, i) for b in (1, 2, 3) for i in (1, 2)] + [(3, 3), (4, 3)]
    df = spark.createDataFrame(rows, "basket int, item int")
    out = {
        (r.item_a, r.item_b): r
        for r in npmi_pairs(df, "basket", "item", min_count=1).collect()
    }
    perfect = out[(1, 2)]
    # whenever-together pair: p_ab = p_a = p_b -> npmi = 1 exactly
    assert abs(perfect.npmi - 1.0) < 1e-5
    assert abs(perfect.pmi - math.log(perfect.lift)) < 1e-4
    mixed = out[(1, 3)]
    assert mixed.npmi < perfect.npmi
    # universal pair on its own corpus -> npmi NULL by contract
    uni = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (2, 2)], "basket int, item int"
    )
    u = npmi_pairs(uni, "basket", "item", min_count=1).collect()[0]
    assert u.npmi is None and u.support == 1.0


# ---------------------------------------------------------- lexical ops

def test_log_odds_direction_and_prior(spark):
    from dataframes_jl_spark.llm.lexical import log_odds_tokens

    a = spark.createDataFrame(
        [("alpha alpha alpha shared shared",)] * 4, "text string"
    )
    b = spark.createDataFrame(
        [("beta beta beta shared shared",)] * 4, "text string"
    )
    out = {
        r.term: r
        for r in log_odds_tokens(a, b, "text", alpha0=10.0, min_count=1).collect()
    }
    # corpus-marking terms score with the right sign; shared term ~ 0
    assert out["alpha"].z > 1.0 and out["beta"].z < -1.0
    assert abs(out["shared"].z) < 0.5
    assert out["alpha"].cnt_a == 12 and out["alpha"].cnt_b == 0
    # antisymmetry: swapping corpora negates z (quantization slack)
    rev = {
        r.term: r.z
        for r in log_odds_tokens(b, a, "text", alpha0=10.0, min_count=1).collect()
    }
    for t in ("alpha", "beta", "shared"):
        assert abs(out[t].z + rev[t]) < 1e-5


def test_lexical_diversity_known(spark):
    from dataframes_jl_spark.llm.lexical import lexical_diversity

    df = spark.createDataFrame(
        [
            ("tpl", "a a a a"),              # 4 tokens, 1 type, 0 hapax
            ("var", "w x y z"),              # 4 tokens, 4 types, all hapax
        ],
        "src string, text string",
    )
    out = {r.src: r for r in lexical_diversity(df, "src", "text").collect()}
    t = out["tpl"]
    assert (t.n_tokens, t.n_types, t.n_hapax) == (4, 1, 0)
    assert t.ttr == 0.25 and t.hapax_share == 0.0
    v = out["var"]
    assert v.ttr == 1.0 and v.hapax_share == 1.0
