"""Round-10 additions: calibration eval lane + streaming expectations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_reliability_bins_exact_small(spark):
    from dataframes_jl_spark.functions.stats import reliability_bins

    rows = [
        # (label, score)
        (1, 0.95), (0, 0.92), (1, 0.90),   # bin 9
        (0, 0.05), (0, 0.01), (1, 0.12),   # bins 0,0,1
        (1, 1.0),                          # score 1.0 -> last bin
        (None, 0.5), (1, None),            # dropped
    ]
    df = spark.createDataFrame(rows, "y int, p double")
    out = {r["bin"]: r for r in reliability_bins(df, "y", "p").collect()}
    assert out[9]["n"] == 4 and out[9]["n_pos"] == 3
    assert out[9]["mean_pred"] == pytest.approx((0.95 + 0.92 + 0.90 + 1.0) / 4)
    assert out[9]["obs_rate"] == pytest.approx(0.75)
    assert out[0]["n"] == 2 and out[0]["n_pos"] == 0
    assert out[1]["n"] == 1 and out[1]["obs_rate"] == 1.0
    assert sum(r["n"] for r in out.values()) == 7


def test_calibration_report_known_values(spark):
    from dataframes_jl_spark.functions.stats import calibration_report

    # one bin (0.7): 4 rows, 3 positive -> |obs - pred| = |0.75-0.7| = 0.05
    rows = [(1, 0.7), (1, 0.7), (1, 0.7), (0, 0.7)]
    df = spark.createDataFrame(rows, "y int, p double")
    r = calibration_report(df, "y", "p").collect()[0]
    assert r["n"] == 4 and r["n_pos"] == 3
    assert r["ece"] == pytest.approx(0.05)
    assert r["mce"] == pytest.approx(0.05)
    # Brier: 3*(0.3^2) + 1*(0.7^2) = 0.27+0.49 = 0.76 ; /4 = 0.19
    assert r["brier"] == pytest.approx(0.19)


def test_calibration_perfectly_calibrated(spark):
    from dataframes_jl_spark.functions.stats import calibration_report

    # bin 2 (p=0.25): 1 of 4 positive; bin 7 (p=0.75): 3 of 4 positive
    rows = [(1, 0.25), (0, 0.25), (0, 0.25), (0, 0.25),
            (1, 0.75), (1, 0.75), (1, 0.75), (0, 0.75)]
    df = spark.createDataFrame(rows, "y int, p double")
    r = calibration_report(df, "y", "p").collect()[0]
    assert r["ece"] == 0.0 and r["mce"] == 0.0


def test_calibration_rejects_bad_inputs(spark):
    from dataframes_jl_spark.functions.stats import calibration_report

    bad_label = spark.createDataFrame([(2, 0.5)], "y int, p double")
    with pytest.raises(Exception, match="must be 0/1"):
        calibration_report(bad_label, "y", "p").collect()
    bad_score = spark.createDataFrame([(1, 1.5)], "y int, p double")
    with pytest.raises(Exception, match="must be in"):
        calibration_report(bad_score, "y", "p").collect()


def test_expect_stream_matches_batch(spark, tmp_path):
    """Stream-vs-batch parity: the merged snapshot report equals
    expect() over the same rows — row rules, a foreign key against a
    static parent, and an exact unique rule with cross-batch dups."""
    from dataframes_jl_spark.ops.expectations import (
        accepted_values,
        expect,
        foreign_key,
        in_range,
        not_null,
        unique,
    )
    from dataframes_jl_spark.streaming.expectations import (
        expect_stream,
        merge_expectation_snapshots,
    )

    parent = spark.createDataFrame([(i,) for i in range(8)], "pk long")
    rows = []
    for i in range(90):
        v = None if i % 9 == 0 else float(i % 20)  # some NULLs, some >12
        cat = "x" if i % 7 else "zz"               # some off-list
        fk = i % 12                                # 8..11 violate the FK
        k = i % 30                                 # duplicate key every 30
        rows.append((v, cat, fk, k))
    d = tmp_path / "exp_in"
    d.mkdir()
    for b in range(3):
        chunk = rows[b::3]
        (d / f"{b}.csv").write_text(
            "v,cat,fk,k\n"
            + "\n".join(
                f"{'' if v is None else v},{c},{f},{kk}"
                for v, c, f, kk in chunk
            )
            + "\n"
        )
    schema = "v double, cat string, fk long, k long"
    rules = [
        not_null("v"),
        in_range("v", 0.0, 12.0),
        accepted_values("cat", ["x", "y"]),
        foreign_key("fk", parent, "pk"),
        unique("k"),
    ]
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("header", True)
        .csv(str(d))
    )
    q = (
        expect_stream(stream, rules, shards=4)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_exp")
        .start()
    )
    try:
        q.processAllAvailable()
        snaps = spark.sql(
            "SELECT rule_id, shard, n_checked, n_violations FROM t_exp"
        )
        # stale cumulative intermediates must exist (3 micro-batches)
        assert snaps.count() > snaps.select("rule_id", "shard").distinct().count()
        got = {
            (r["rule"], r["column"]): (r["n_checked"], r["n_violations"], r["passed"])
            for r in merge_expectation_snapshots(snaps, rules).collect()
        }
    finally:
        q.stop()

    bdf = spark.createDataFrame(rows, schema)
    want = {
        (r["rule"], r["column"]): (r["n_checked"], r["n_violations"], r["passed"])
        for r in expect(bdf, rules).collect()
    }
    assert got == want
    # sanity: the fixture actually exercises every rule
    assert all(nv > 0 for (_, nv, _) in want.values())


def test_expect_stream_validates(spark):
    from dataframes_jl_spark.streaming.expectations import expect_stream

    df = spark.createDataFrame([(1,)], "a int")
    with pytest.raises(ValueError, match="at least one rule"):
        expect_stream(df, [])


def test_nelson_aalen_known_values(spark):
    from dataframes_jl_spark.functions.survival import nelson_aalen

    # durations: events at t=1 (n=5), t=3 (n=3, after censor at 2)
    rows = [(1.0, 1), (2.0, 0), (3.0, 1), (4.0, 0), (5.0, 1)]
    df = spark.createDataFrame(rows, "dur double, e int")
    out = {r["t"]: r for r in nelson_aalen(df, "dur", "e").collect()}
    assert set(out) == {1, 3, 5}
    # H(1) = 1/5; H(3) = 1/5 + 1/3; H(5) = + 1/1
    assert out[1]["cum_hazard"] == pytest.approx(0.2)
    assert out[3]["cum_hazard"] == pytest.approx(0.2 + 1 / 3, abs=1e-6)
    assert out[5]["cum_hazard"] == pytest.approx(0.2 + 1 / 3 + 1.0, abs=1e-6)
    assert out[1]["n_risk"] == 5 and out[3]["n_risk"] == 3
    # se(1) = sqrt(1/25)
    assert out[1]["se_hazard"] == pytest.approx(0.2)


def test_nelson_aalen_breslow_vs_km(spark, tables):
    """exp(-H) >= KM survival pointwise (Breslow bound), and both
    estimators agree on the risk-set bookkeeping columns."""
    import math

    from dataframes_jl_spark.functions.survival import (
        kaplan_meier,
        nelson_aalen,
    )

    li = tables["lineitem"].select(
        (F.col("l_quantity") % 7).cast("double").alias("dur"),
        (F.col("l_linenumber") % 2).alias("e"),
    )
    km = {r["t"]: r for r in kaplan_meier(li, "dur", "e").collect()}
    na = {r["t"]: r for r in nelson_aalen(li, "dur", "e").collect()}
    assert set(km) == set(na)
    for t in km:
        assert na[t]["n_risk"] == km[t]["n_risk"]
        assert na[t]["n_events"] == km[t]["n_events"]
        breslow = math.exp(-na[t]["cum_hazard"])
        assert breslow >= km[t]["survival"] - 1e-6


def test_cliffs_delta_known_values(spark):
    from dataframes_jl_spark.functions.stats import cliffs_delta

    # a completely dominates b -> delta = +1
    a = spark.createDataFrame([(10.0,), (11.0,), (12.0,)], "v double")
    b = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    r = cliffs_delta(a, b, "v").collect()[0]
    assert r["delta"] == 1.0 and r["magnitude"] == "large"
    # identical distributions -> delta = 0
    r0 = cliffs_delta(a, a, "v").collect()[0]
    assert r0["delta"] == 0.0 and r0["magnitude"] == "negligible"


def test_cliffs_delta_ties_half_credit(spark):
    from dataframes_jl_spark.functions.stats import cliffs_delta

    # a = {1, 2}, b = {2, 3}: pairs (1<2), (1<3), (2=2 tie), (2<3)
    # delta = (0 - 3)/4 = -0.75
    a = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    b = spark.createDataFrame([(2.0,), (3.0,)], "v double")
    r = cliffs_delta(a, b, "v").collect()[0]
    assert r["delta"] == pytest.approx(-0.75)
    assert r["magnitude"] == "large"


def test_zipf_fit_exact_powerlaw(spark):
    from dataframes_jl_spark.llm.lexical import zipf_fit

    # construct counts following cnt = round(1000 / rank): slope ~ -1
    words = []
    for rank in range(1, 21):
        w = f"w{rank:02d}"
        words.extend([w] * max(1, round(1000 / rank)))
    df = spark.createDataFrame([(" ".join(words),)], "text string")
    r = zipf_fit(df, "text").collect()[0]
    assert r["n_types"] == 20
    assert r["slope"] == pytest.approx(-1.0, abs=0.02)
    assert r["r2"] > 0.999


def test_zipf_fit_degenerate(spark):
    from dataframes_jl_spark.llm.lexical import zipf_fit

    one = spark.createDataFrame([("hello hello",)], "text string")
    r = zipf_fit(one, "text").collect()[0]
    assert r["n_types"] == 1 and r["slope"] is None and r["r2"] is None


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    from dataframes_jl_spark.ops.bootstrap import bootstrap_mean_ci

    rows = [(i, float(50 + (i * 37) % 101)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, v double")
    r1 = bootstrap_mean_ci(df, "id", "v", n_boot=100).collect()[0]
    r2 = bootstrap_mean_ci(df, "id", "v", n_boot=100).collect()[0]
    assert r1 == r2  # hash-seeded: bit-identical across runs
    assert r1["n"] == 2000
    assert r1["boot_lo"] <= r1["mean"] <= r1["boot_hi"]
    # CI half-width should be a few boot_se's, and se ~ sd/sqrt(n):
    # values span ~29 sd -> se ~ 0.65; sanity band, not exactness
    assert 0.1 < r1["boot_se"] < 3.0
    assert (r1["boot_hi"] - r1["boot_lo"]) < 10 * r1["boot_se"]


def test_bootstrap_ci_grouped_shrinks_with_n(spark):
    from dataframes_jl_spark.ops.bootstrap import bootstrap_mean_ci

    rows = [(i, "big" if i < 3000 else "small", float(i % 97))
            for i in range(3300)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    out = {r["g"]: r for r in
           bootstrap_mean_ci(df, "id", "v", group_by=["g"], n_boot=100).collect()}
    assert out["big"]["n"] == 3000 and out["small"]["n"] == 300
    # same value distribution -> the 10x-larger group has a tighter CI
    assert (out["big"]["boot_hi"] - out["big"]["boot_lo"]) < (
        out["small"]["boot_hi"] - out["small"]["boot_lo"]
    )


def test_poisson_weights_mean_one(spark):
    """Over many (row, replicate) draws the Poisson(1) weights must
    average ~1 — the property that makes replicate totals unbiased."""
    from dataframes_jl_spark.ops.bloom import _P, _hll_mix
    from dataframes_jl_spark.ops.bootstrap import (
        _BOOT_SPREAD,
        poisson_weight,
    )

    df = spark.range(20000).select(
        F.pmod(F.col("id"), F.lit(_P)).alias("ks"),
        F.explode(F.sequence(F.lit(0), F.lit(4))).alias("b"),
    )
    h = _hll_mix(
        F.pmod(F.col("ks") + F.col("b").cast("long") * F.lit(_BOOT_SPREAD),
               F.lit(_P))
    )
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(_P + 1))
    stats = df.select(poisson_weight(u).alias("w")).agg(
        F.avg("w").alias("m"), F.var_samp("w").alias("v")
    ).collect()[0]
    assert stats["m"] == pytest.approx(1.0, abs=0.02)
    assert stats["v"] == pytest.approx(1.0, abs=0.05)
