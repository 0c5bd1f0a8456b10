"""Round-13 additions: ASCII netpbm decoders (P3/P2/P1), the energy-
distance drift member, Mood's median test, the Murphy Brier
decomposition, the mojibake audit, exact stratified sampling, and the
AMS F2 sketch — every expected value below is hand-checked closed
form, never an engine readback."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ASCII netpbm decoders
# ---------------------------------------------------------------------------


def test_p3_decode_comment_and_maxval():
    """Constant-color 2x2 P3 at maxval 9 with a header comment:
    luma = (0.299*3 + 0.587*5 + 0.114*7)/9."""
    from dataframes_jl_spark.llm.multimodal import _decode_ppm_ascii

    p3 = b"P3\n# comment\n2 2\n9\n" + b"\n".join([b"3 5 7"] * 4) + b"\n"
    w, h, c, luma = _decode_ppm_ascii(p3)
    assert (w, h, c) == (2, 2, 3)
    assert luma == (0.299 * 3 + 0.587 * 5 + 0.114 * 7) / 9


def test_p2_decode_non255_maxval():
    """3x2 P2 gradient at maxval 999 — the >8-bit range binary P5
    refuses: mean = (10+11+12)/3/999."""
    from dataframes_jl_spark.llm.multimodal import _decode_pgm_ascii

    p2 = b"P2\n3 2\n999\n10 11 12\n10 11 12\n"
    assert _decode_pgm_ascii(p2) == (3, 2, 1, (10 + 11 + 12) / 3 / 999)


def test_p1_packed_digits_and_comment():
    """P1 raster with PACKED digits (no whitespace between samples)
    and an inline comment: 4x2, rows '1100' -> white fraction 0.5."""
    from dataframes_jl_spark.llm.multimodal import _decode_pbm_ascii

    p1 = b"P1\n4 2\n# raster comment\n1100\n1100\n"
    assert _decode_pbm_ascii(p1) == (4, 2, 1, 0.5)


def test_ascii_decoders_magic_miss_and_truncation():
    """Contract parity with the binary family: None on a magic miss
    (fall through), ValueError on truncation/malformed samples."""
    from dataframes_jl_spark.llm.multimodal import (
        _decode_pbm_ascii,
        _decode_pgm_ascii,
        _decode_ppm_ascii,
    )

    assert _decode_pgm_ascii(b"P5\n1 1\n255\n\x10") is None
    assert _decode_ppm_ascii(b"JUNK") is None
    with pytest.raises(ValueError):
        _decode_pbm_ascii(b"P1\n4 2\n110")  # 3 of 8 pixels
    with pytest.raises(ValueError):
        _decode_pgm_ascii(b"P2\n2 1\n9\n3 17\n")  # sample > maxval
    with pytest.raises(ValueError):
        _decode_pbm_ascii(b"P1\n2 1\n12\n")  # non-0/1 sample


def test_netpbm_dispatch_covers_ascii():
    from dataframes_jl_spark.llm.multimodal import _decode_netpbm

    assert _decode_netpbm(b"P1\n1 1\n0\n") == (1, 1, 1, 1.0)
    assert _decode_netpbm(b"P2\n1 1\n4\n2\n") == (1, 1, 1, 0.5)
    assert _decode_netpbm(b"not an image") is None


def test_synth_ascii_roundtrip(spark):
    """Synth -> decode round trip for all three plain formats at a
    handful of ids; features must equal the closed generation forms."""
    from dataframes_jl_spark.llm.multimodal import (
        decode_images,
        synth_pbm_ascii_images,
        synth_pgm_ascii_images,
        synth_ppm_ascii_images,
    )

    ids = spark.createDataFrame(
        [(i,) for i in (0, 1, 7, 12, 123)], "media_id bigint"
    )
    p3 = {
        r["media_id"]: r
        for r in decode_images(
            synth_ppm_ascii_images(ids, width=5, height=4, maxval=9),
            fake=False,
        ).collect()
    }
    for i in (0, 1, 7, 12, 123):
        r, g, b = 3 * i % 10, 5 * i % 10, 7 * i % 10
        row = p3[i]
        assert (row["width"], row["height"], row["channels"]) == (5, 4, 3)
        assert row["mean_luma"] == pytest.approx(
            (0.299 * 20 * r + 0.587 * 20 * g + 0.114 * 20 * b) / 20 / 9
        )
    p2 = {
        r["media_id"]: r
        for r in decode_images(
            synth_pgm_ascii_images(ids, width=8, height=5, maxval=999),
            fake=False,
        ).collect()
    }
    for i in (0, 1, 7, 12, 123):
        g0 = 67 * i % 993
        assert p2[i]["mean_luma"] == pytest.approx(
            5 * (8 * g0 + 28) / 40 / 999
        )
    p1 = {
        r["media_id"]: r
        for r in decode_images(
            synth_pbm_ascii_images(ids, width=9, height=4), fake=False
        ).collect()
    }
    for i in (0, 1, 7, 12, 123):
        b = i % 10
        assert p1[i]["mean_luma"] == pytest.approx((9 - b) / 9)


# ---------------------------------------------------------------------------
# energy_distance
# ---------------------------------------------------------------------------


def _energy_brute(xs, ys):
    exy = sum(abs(x - y) for x in xs for y in ys) / (len(xs) * len(ys))
    exx = sum(abs(a - b) for a in xs for b in xs) / (len(xs) ** 2)
    eyy = sum(abs(a - b) for a in ys for b in ys) / (len(ys) ** 2)
    return exy, exx, eyy, 2 * exy - exx - eyy


def test_energy_distance_matches_brute_force(spark):
    from dataframes_jl_spark.functions.stats import energy_distance

    xs = [0.1, 0.5, 0.5, 2.0, 3.25]
    ys = [0.4, 0.9, 1.5, 1.5]
    a = spark.createDataFrame([(v,) for v in xs], "x double")
    b = spark.createDataFrame([(v,) for v in ys], "x double")
    r = energy_distance(a, b, "x", scale=4).collect()[0]
    exy, exx, eyy, d2 = _energy_brute(xs, ys)
    assert (r["n_a"], r["n_b"]) == (5, 4)
    assert r["e_xy"] == pytest.approx(exy, abs=2e-6)
    assert r["e_xx"] == pytest.approx(exx, abs=2e-6)
    assert r["e_yy"] == pytest.approx(eyy, abs=2e-6)
    assert r["energy"] == pytest.approx(d2, abs=4e-6)


def test_energy_distance_identical_samples_zero(spark):
    from dataframes_jl_spark.functions.stats import energy_distance

    xs = [1.0, 2.0, 2.0, 5.0]
    a = spark.createDataFrame([(v,) for v in xs], "x double")
    r = energy_distance(a, a, "x").collect()[0]
    assert r["energy"] == 0.0


def test_energy_distance_empty_side_null(spark):
    from dataframes_jl_spark.functions.stats import energy_distance

    a = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    b = spark.createDataFrame([], "x double")
    r = energy_distance(a, b, "x").collect()[0]
    assert r["n_b"] == 0 and r["energy"] is None


# ---------------------------------------------------------------------------
# mood_median_test
# ---------------------------------------------------------------------------


def test_mood_median_hand_checked(spark):
    """g1 = [1,2,3,4], g2 = [5,6,7,8]: pooled lower median 4, above
    counts (0, 4), A=4, N=8 -> chi2 = N*(0 + 16/16 + 16/16 + 0) - 8
    = 8."""
    from dataframes_jl_spark.functions.stats import mood_median_test

    rows = [("g1", v) for v in [1.0, 2.0, 3.0, 4.0]] + [
        ("g2", v) for v in [5.0, 6.0, 7.0, 8.0]
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    r = mood_median_test(df, "x", "g", scale=0).collect()[0]
    assert (r["n_groups"], r["n"], r["n_above"]) == (2, 8, 4)
    assert r["grand_median"] == 4.0
    assert r["chi2"] == pytest.approx(8.0, abs=1e-6)
    assert r["dof"] == 1


def test_mood_median_no_signal_is_small(spark):
    """Interleaved groups straddle the median evenly: chi2 ~ 0."""
    from dataframes_jl_spark.functions.stats import mood_median_test

    rows = [("a", float(v)) for v in range(1, 9, 2)] + [
        ("b", float(v)) for v in range(2, 10, 2)
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    r = mood_median_test(df, "x", "g", scale=0).collect()[0]
    # median 4 (lower); above: a has {5,7} = 2, b has {6,8} = 2 -> equal
    assert r["chi2"] == pytest.approx(0.0, abs=1e-6)


def test_mood_median_degenerate_null(spark):
    """All values equal: nothing above the median -> chi2 NULL."""
    from dataframes_jl_spark.functions.stats import mood_median_test

    rows = [("a", 2.0), ("a", 2.0), ("b", 2.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    r = mood_median_test(df, "x", "g", scale=0).collect()[0]
    assert r["chi2"] is None


# ---------------------------------------------------------------------------
# brier_decomposition
# ---------------------------------------------------------------------------


def test_brier_decomposition_identity_and_values(spark):
    """Forecasts exactly at bin centers so WBV = 0 within rounding:
    two bins (0.25 x4 with 1 positive, 0.75 x4 with 3 positives) ->
    perfectly calibrated: REL = 0, BS = UNC - RES exactly."""
    from dataframes_jl_spark.functions.stats import brier_decomposition

    rows = [(0.25, 1), (0.25, 0), (0.25, 0), (0.25, 0)] + [
        (0.75, 1), (0.75, 1), (0.75, 1), (0.75, 0)
    ]
    df = spark.createDataFrame(rows, "p double, y int")
    r = brier_decomposition(df, "y", "p", n_bins=4, scale=6).collect()[0]
    assert (r["n"], r["n_pos"]) == (8, 4)
    # BS = mean (p - y)^2 = (0.0625*3 + 0.5625)*2/8 = 0.1875
    assert r["brier"] == pytest.approx(0.1875, abs=1e-6)
    assert r["uncertainty"] == pytest.approx(0.25, abs=1e-6)
    assert r["reliability"] == pytest.approx(0.0, abs=1e-6)
    # RES = (1/8)*(4*(0.25-0.5)^2 + 4*(0.75-0.5)^2) = 0.0625
    assert r["resolution"] == pytest.approx(0.0625, abs=1e-6)
    assert r["within_bin_var"] == pytest.approx(0.0, abs=2e-6)


def test_brier_decomposition_murphy_identity(spark):
    """On an arbitrary mix, BS = UNC + REL - RES + residual holds by
    construction; UNC/REL/RES are non-negative. The residual is
    WBV - 2*WBCov and is NOT sign-constrained (round-13 advice #3):
    forecasts that discriminate inside a bin drive it negative."""
    from dataframes_jl_spark.functions.stats import brier_decomposition

    rows = [
        (0.1, 0), (0.2, 1), (0.35, 0), (0.35, 1), (0.6, 1),
        (0.62, 0), (0.9, 1), (0.95, 1), (0.05, 0), (0.5, 1),
    ]
    df = spark.createDataFrame(rows, "p double, y int")
    r = brier_decomposition(df, "y", "p", n_bins=5).collect()[0]
    lhs = r["brier"]
    rhs = (
        r["uncertainty"] + r["reliability"] - r["resolution"]
        + r["within_bin_var"]
    )
    assert lhs == pytest.approx(rhs, abs=5e-6)
    for k in ("uncertainty", "reliability", "resolution"):
        assert r[k] >= -1e-6


def test_brier_decomposition_residual_goes_negative_when_discriminating(
    spark,
):
    """The advice's own counterexample: one bin holding (0.21, y=0) and
    (0.39, y=1) — within-bin covariance dominates, residual < 0."""
    from dataframes_jl_spark.functions.stats import brier_decomposition

    df = spark.createDataFrame(
        [(0.21, 0), (0.39, 1)], "p double, y int"
    )
    r = brier_decomposition(df, "y", "p", n_bins=5).collect()[0]
    assert r["within_bin_var"] < 0
    rhs = (
        r["uncertainty"] + r["reliability"] - r["resolution"]
        + r["within_bin_var"]
    )
    assert r["brier"] == pytest.approx(rhs, abs=5e-6)


# ---------------------------------------------------------------------------
# mojibake_audit
# ---------------------------------------------------------------------------


def test_mojibake_audit_counts(spark):
    from dataframes_jl_spark.llm.text import mojibake_audit

    rows = [
        ("clean text",),
        ("bad � twice �",),
        ("double Ã© enc",),
        ("c1 \u0092 artifact",),
        ("c0 \u0001 junk \u0007",),
        (None,),
    ]
    df = spark.createDataFrame(rows, "text string")
    r = mojibake_audit(df, "text").collect()[0]
    assert r["n_docs"] == 6
    assert (r["docs_fffd"], r["n_fffd"]) == (1, 2)
    assert (r["docs_double_utf8"], r["n_double_utf8"]) == (1, 1)
    assert (r["docs_c1_control"], r["n_c1_control"]) == (1, 1)
    assert (r["docs_c0_control"], r["n_c0_control"]) == (1, 2)
    assert r["clean_docs"] == 2  # "clean text" and the NULL doc


def test_mojibake_tab_newline_cr_are_clean(spark):
    from dataframes_jl_spark.llm.text import mojibake_audit

    df = spark.createDataFrame(
        [("line1\nline2\twith\rright",)], "text string"
    )
    r = mojibake_audit(df, "text").collect()[0]
    assert r["clean_docs"] == 1


# ---------------------------------------------------------------------------
# stratified_sample
# ---------------------------------------------------------------------------


def test_stratified_sample_exact_allocation(spark):
    """floor(frac*n_g) rows per stratum, exactly; determinism: two
    runs select the same keys."""
    from dataframes_jl_spark.ops.sampling import stratified_sample

    rows = [("a", i) for i in range(10)] + [("b", i + 100) for i in range(7)]
    df = spark.createDataFrame(rows, "s string, k bigint")
    got = stratified_sample(df, "s", 0.3, "k")
    per = {
        r["s"]: r["cnt"]
        for r in got.groupBy("s").agg(F.count("*").alias("cnt")).collect()
    }
    assert per == {"a": 3, "b": 2}
    keys1 = sorted(r["k"] for r in got.collect())
    keys2 = sorted(r["k"] for r in stratified_sample(df, "s", 0.3, "k").collect())
    assert keys1 == keys2


def test_stratified_sample_tiny_stratum_rounds_down(spark):
    from dataframes_jl_spark.ops.sampling import stratified_sample

    rows = [("a", i) for i in range(3)] + [("b", 99)]
    df = spark.createDataFrame(rows, "s string, k bigint")
    got = stratified_sample(df, "s", 0.25, "k").collect()
    # a: floor(0.75) = 0; b: floor(0.25) = 0
    assert got == []


def test_stratified_sample_frac_validation(spark):
    from dataframes_jl_spark.ops.sampling import stratified_sample

    df = spark.createDataFrame([("a", 1)], "s string, k bigint")
    with pytest.raises(ValueError):
        stratified_sample(df, "s", 0.0, "k")
    with pytest.raises(ValueError):
        stratified_sample(df, "s", 1.5, "k")


# ---------------------------------------------------------------------------
# ams_f2
# ---------------------------------------------------------------------------


def test_ams_f2_exact_baseline_and_bound(spark):
    """f = (4, 3, 2, 1) over 4 values: F2 = 30 exactly; the 8-row
    4-wise estimate must land within the documented ~sqrt(2/8)
    variance envelope (3 sigma)."""
    from dataframes_jl_spark.ops.frequency import ams_f2

    vals = [1] * 4 + [2] * 3 + [3] * 2 + [4]
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    r = ams_f2(df, "v", n_rows=8, seed=7).collect()[0]
    assert (r["n"], r["n_distinct"], r["f2_exact"]) == (10, 4, 30)
    assert r["f2_est"] is not None
    assert abs(r["f2_est"] - 30) <= 3 * math.sqrt(2.0 / 8.0) * 30
    assert r["rel_err"] == pytest.approx(
        abs(r["f2_est"] - 30) / 30, abs=2e-6
    )


def test_ams_f2_sign_sums_match_python(spark):
    """The sketch counters are pure integer arithmetic: replay row 0's
    polynomial in Python and compare S_0 exactly."""
    from dataframes_jl_spark.ops.frequency import _AMS_P, _ams_coeffs, ams_f2

    vals = [5, 5, 9, 14, 14, 14, 200]
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    a3, a2, a1, a0 = _ams_coeffs(7, 0)

    def sign(v):
        x = v % _AMS_P
        h = a3
        for a in (a2, a1, a0):
            h = (h * x + a) % _AMS_P
        return 1 - 2 * (h % 2)

    s0 = sum(sign(v) for v in vals)
    est_rows = df.agg(
        F.sum(
            F.lit(1)
            - F.lit(2)
            * F.pmod(
                F.pmod(
                    (
                        F.pmod(
                            (
                                F.pmod(
                                    F.lit(a3) * F.pmod(F.col("v"), F.lit(_AMS_P))
                                    + F.lit(a2),
                                    F.lit(_AMS_P),
                                )
                            )
                            * F.pmod(F.col("v"), F.lit(_AMS_P))
                            + F.lit(a1),
                            F.lit(_AMS_P),
                        )
                    )
                    * F.pmod(F.col("v"), F.lit(_AMS_P))
                    + F.lit(a0),
                    F.lit(_AMS_P),
                ),
                F.lit(2),
            )
        ).alias("s0")
    ).collect()[0]
    assert est_rows["s0"] == s0
    # and the operator's empty-input contract
    empty = spark.createDataFrame([], "v bigint")
    r = ams_f2(empty, "v").collect()[0]
    assert r["n"] == 0 and r["f2_est"] is None


def test_ams_f2_merge_property(spark):
    """Counters are plain sums: sketching two shards separately and
    adding the counters equals sketching the union (run the operator
    on the union vs manual shard sums of the same signs)."""
    from dataframes_jl_spark.ops.frequency import _AMS_P, _ams_coeffs

    a = [1, 2, 2, 3]
    b = [3, 3, 4]
    a3, a2, a1, a0 = _ams_coeffs(7, 3)

    def sign(v):
        x = v % _AMS_P
        h = a3
        for c in (a2, a1, a0):
            h = (h * x + c) % _AMS_P
        return 1 - 2 * (h % 2)

    assert sum(map(sign, a)) + sum(map(sign, b)) == sum(
        map(sign, a + b)
    )
