"""Round-12 fixes and additions: the five round-11 ADVICE findings
(Welch k_w, kendall coalesce, netpbm sniff, conformal empty-eval,
truncation-audit dim guard) plus the real PGM (P5) / PBM (P4)
decoders that widen the netpbm family."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ADVICE #1: anova_oneway Welch path must use the Welch-eligible k
# ---------------------------------------------------------------------------


def test_anova_welch_k_excludes_ineligible_groups(spark):
    """A singleton group (n_j = 1) and a zero-variance group drop out
    of the Welch weight sums — the dfs must count only the eligible
    groups, so adding such groups must NOT move welch_f/welch_df."""
    from dataframes_jl_spark.functions.stats import anova_oneway

    base = [("a", v) for v in [1.0, 2.0, 3.0, 5.0]] + [
        ("b", v) for v in [2.0, 4.0, 6.0, 7.0]
    ] + [("c", v) for v in [1.0, 1.5, 4.0]]
    eligible = spark.createDataFrame(base, "g string, x double")
    with_bad = spark.createDataFrame(
        base + [("single", 9.0)] + [("const", 2.0), ("const", 2.0)],
        "g string, x double",
    )
    r0 = anova_oneway(eligible, "x", "g").collect()[0]
    r1 = anova_oneway(with_bad, "x", "g").collect()[0]
    assert r1["n_groups"] == 5
    # Welch stats identical: the two ineligible groups contribute
    # nothing to weights NOR to the k_w-based dfs
    assert r1["welch_f"] == r0["welch_f"]
    assert r1["welch_df"] == r0["welch_df"]
    # classic F still sees all groups (pooled variance uses full k)
    assert r1["f_stat"] != r0["f_stat"]


def test_anova_welch_null_when_fewer_than_two_eligible(spark):
    """One eligible group + one singleton: classic F is defined
    (k = 2), Welch is NULL (k_w = 1 — there is no second variance
    to compare against)."""
    from dataframes_jl_spark.functions.stats import anova_oneway

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 4.0), ("b", 9.0)],
        "g string, x double",
    )
    r = anova_oneway(df, "x", "g").collect()[0]
    assert r["f_stat"] is not None
    assert r["welch_f"] is None
    assert r["welch_df"] is None


# ---------------------------------------------------------------------------
# ADVICE #2: kendall_tau_binned all-x-ties returns 0 counts, NULL tau
# ---------------------------------------------------------------------------


def test_kendall_tau_all_x_one_bin(spark):
    """All x in one bin: the px > qx pair join is empty — concordant
    and discordant must be 0 (not NULL); only tau_b is NULL."""
    from dataframes_jl_spark.functions.stats import kendall_tau_binned

    df = spark.createDataFrame(
        [(1.0, float(y)) for y in range(6)], "x double, y double"
    )
    r = kendall_tau_binned(df, "x", "y", x_scale=0, y_scale=0).collect()[0]
    assert r["concordant"] == 0
    assert r["discordant"] == 0
    assert r["tau_b"] is None


# ---------------------------------------------------------------------------
# ADVICE #3 + ask #7: netpbm sniff tightening and the P5/P4 decoders
# ---------------------------------------------------------------------------


def test_netpbm_sniff_requires_separator():
    """A non-netpbm binary that merely starts 0x50 0x36 ('P6') must
    fall through (None), not die in the strict parser; same for a
    bare 2-byte magic."""
    from dataframes_jl_spark.llm.multimodal import (
        _decode_pbm,
        _decode_pgm,
        _decode_ppm,
    )

    assert _decode_ppm(b"P6ZIPPY-NOT-AN-IMAGE" + b"\x00" * 64) is None
    assert _decode_ppm(b"P6") is None
    assert _decode_pgm(b"P5QQ" + b"\x01" * 16) is None
    assert _decode_pbm(b"P4!!" + b"\x01" * 16) is None
    # comment immediately after the magic is a legal separator
    ppm = b"P6#c\n2 1 255\n" + bytes([10, 20, 30, 40, 50, 60])
    assert _decode_ppm(ppm) == (
        2,
        1,
        3,
        (0.299 * 50 + 0.587 * 70 + 0.114 * 90) / 2 / 255.0,
    )


def test_decode_pgm_hand_checked():
    """P5 4x2, gradient row 10..13: sum = 2*(10+11+12+13) = 92,
    mean_luma = 92/8/255."""
    from dataframes_jl_spark.llm.multimodal import _decode_pgm

    payload = b"P5\n4 2\n255\n" + bytes([10, 11, 12, 13]) * 2
    w, h, c, luma = _decode_pgm(payload)
    assert (w, h, c) == (4, 2, 1)
    assert luma == 92 / 8 / 255.0
    with pytest.raises(ValueError):
        _decode_pgm(b"P5\n4 2\n255\n" + bytes([1, 2, 3]))  # truncated
    with pytest.raises(ValueError):
        _decode_pgm(b"P5\n2 1\n65535\n\x00\x00")  # 16-bit maxval


def test_decode_pbm_masks_row_padding():
    """P4 12x2 with the first 5 bits of each row black: rows pack to
    2 bytes (0b11111000, 0b00000000) and the 4 trailing pad bits per
    row must NOT count — luma = (12-5)/12. A buggy decoder that reads
    all 16 bits per row would divide black mass differently."""
    from dataframes_jl_spark.llm.multimodal import _decode_pbm

    row = bytes([0b11111000, 0b00000000])
    payload = b"P4\n12 2\n" + row * 2
    w, h, c, luma = _decode_pbm(payload)
    assert (w, h, c) == (12, 2, 1)
    assert luma == (12 - 5) / 12
    # pad bits set to 1 must still be ignored
    dirty = bytes([0b11111000, 0b00001111])
    assert _decode_pbm(b"P4\n12 2\n" + dirty * 2)[3] == (12 - 5) / 12
    with pytest.raises(ValueError):
        _decode_pbm(b"P4\n12 2\n" + row)  # truncated raster


def test_synth_netpbm_roundtrip(spark):
    """Synthesize P5 and P4 payloads and decode them through the
    REAL kernel (fake=False): features must equal the closed-form
    generation formulas for every id."""
    from dataframes_jl_spark.llm.multimodal import (
        decode_images,
        synth_pbm_images,
        synth_pgm_images,
    )

    ids = spark.range(0, 40).select(F.col("id").alias("media_id"))
    pgm = decode_images(
        synth_pgm_images(ids, "media_id", width=8, height=6),
        "payload",
        "media_id",
        fake=False,
    )
    for r in pgm.collect():
        g0 = 53 * r["media_id"] % 248
        total = 6 * (8 * g0 + 28)
        assert (r["width"], r["height"], r["channels"]) == (8, 6, 1)
        assert r["mean_luma"] == total / 48 / 255.0
    pbm = decode_images(
        synth_pbm_images(ids, "media_id", width=12, height=6),
        "payload",
        "media_id",
        fake=False,
    )
    for r in pbm.collect():
        b = r["media_id"] % 13
        assert (r["width"], r["height"], r["channels"]) == (12, 6, 1)
        assert r["mean_luma"] == (72 - 6 * b) / 72


# ---------------------------------------------------------------------------
# ADVICE #4: split_conformal with an empty evaluation half
# ---------------------------------------------------------------------------


def test_split_conformal_empty_eval_half(spark):
    """calib_frac ~ 1 puts every bucket in calibration: n_cal/k/q_hat
    must still be reported (they are calibration-derived), with
    n_test = 0 and coverage NULL."""
    from dataframes_jl_spark.functions.stats import split_conformal

    df = spark.createDataFrame(
        [(i, float(i), float(i) + (i % 3) * 0.5) for i in range(40)],
        "key long, y double, yhat double",
    )
    r = split_conformal(
        df, "y", "yhat", "key", alpha=0.2, calib_frac=0.999, buckets=2
    ).collect()
    assert len(r) == 1
    row = r[0]
    assert row["n_test"] == 0
    assert row["n_cal"] == 40
    assert row["k"] is not None
    assert row["q_hat"] is not None
    assert row["coverage"] is None


# ---------------------------------------------------------------------------
# ADVICE #5: truncation_audit rejects dims wider than the embedding
# ---------------------------------------------------------------------------


def test_truncation_audit_overwide_dim_yields_no_row(spark):
    """dims wider than the vector must NOT report a fake lossless
    gap-0 row; valid dims are unaffected."""
    from dataframes_jl_spark.llm.quant import truncation_audit

    rows = [
        (i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(8)])
        for i in range(30)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = truncation_audit(emb, dims=(4, 8, 16)).collect()
    got = {r["dim"]: r for r in out}
    assert 16 not in got  # over-wide: no row, not gap 0
    assert set(got) == {4, 8}
    # d == full width IS lossless and must report gap 0
    assert got[8]["mean_abs_gap"] == 0.0
    assert got[4]["n_pairs"] == 29


# ---------------------------------------------------------------------------
# Round-12 new operators: hand-checked values
# ---------------------------------------------------------------------------


def test_wasserstein_hand_values(spark):
    """A={0,1}, B={1,2}: quantile functions differ by 1 everywhere, so
    W1 = 1 exactly; a pure shift by c gives W1 = c; identical
    distributions give 0; empty side gives NULL."""
    from dataframes_jl_spark.functions.stats import wasserstein_1d

    mk = lambda vals: spark.createDataFrame(
        [(float(v),) for v in vals], "x double"
    )
    r = wasserstein_1d(mk([0, 1]), mk([1, 2]), "x", scale=0).collect()[0]
    assert (r["n_a"], r["n_b"], r["w1"]) == (2, 2, 1.0)
    r = wasserstein_1d(
        mk([1, 5, 9]), mk([3.5, 7.5, 11.5]), "x", scale=2
    ).collect()[0]
    assert r["w1"] == 2.5
    r = wasserstein_1d(mk([3, 7]), mk([3, 7]), "x", scale=0).collect()[0]
    assert r["w1"] == 0.0
    r = wasserstein_1d(mk([1]), mk([]), "x", scale=0).collect()[0]
    assert r["n_b"] == 0 and r["w1"] is None


def test_atkinson_hand_values(spark):
    """x=[1,4]: geometric mean 2, arithmetic 2.5 => A = 0.2; constant
    column => 0; the index is scale-invariant (x and 100x match)."""
    from dataframes_jl_spark.ops.inequality import atkinson_index

    df = spark.createDataFrame([(1.0,), (4.0,)], "x double")
    r = atkinson_index(df, "x", scale=0).collect()[0]
    assert abs(r["atkinson"] - 0.2) < 2e-6
    const = spark.createDataFrame([(5.0,)] * 4, "x double")
    assert atkinson_index(const, "x", scale=0).collect()[0]["atkinson"] == 0.0
    big = spark.createDataFrame([(100.0,), (400.0,)], "x double")
    rb = atkinson_index(big, "x", scale=0).collect()[0]
    assert abs(rb["atkinson"] - r["atkinson"]) < 2e-6


def test_hhi_hand_values(spark):
    """Two equal entities => HHI 0.5, top_share 0.5; monopoly => 1;
    shares 3:1 => 0.625."""
    from dataframes_jl_spark.ops.inequality import hhi_concentration

    df = spark.createDataFrame(
        [("s", "e1", 10.0), ("s", "e2", 10.0), ("m", "e1", 8.0)],
        "g string, e string, x double",
    )
    got = {
        r["g"]: r
        for r in hhi_concentration(
            df, "x", entity="e", group_by=["g"], scale=0
        ).collect()
    }
    assert got["s"]["hhi"] == 0.5 and got["s"]["top_share"] == 0.5
    assert got["m"]["hhi"] == 1.0 and got["m"]["n_entities"] == 1
    df2 = spark.createDataFrame(
        [("g", "a", 3.0), ("g", "b", 1.0)], "g string, e string, x double"
    )
    r = hhi_concentration(df2, "x", entity="e", group_by=["g"], scale=0)
    row = r.collect()[0]
    assert row["hhi"] == 0.625 and row["top_share"] == 0.75


def test_term_burstiness_hand_values(spark):
    """Docs 'a a b' / 'a c' / 'c': term a has df=2, tf=3, ss=5 over
    n=3 docs => per_doc 1.5, vmr (3*5-9)/(3*3)=2/3; c: vmr 1/3."""
    from dataframes_jl_spark.llm.lexical import term_burstiness

    docs = spark.createDataFrame(
        [("a a b",), ("a c",), ("c",)], "text string"
    )
    got = {r["term"]: r for r in term_burstiness(docs, "text").collect()}
    assert got["a"]["df_docs"] == 2 and got["a"]["tf"] == 3
    assert got["a"]["per_doc"] == 1.5
    assert abs(got["a"]["vmr"] - 2 / 3) < 2e-6
    assert got["c"]["per_doc"] == 1.0
    assert abs(got["c"]["vmr"] - 1 / 3) < 2e-6
    # b occurs once: vmr = (3*1-1)/(3*1) = 2/3
    assert abs(got["b"]["vmr"] - 2 / 3) < 2e-6


def test_brown_forsythe_hand_values(spark):
    """a=[1,2,3,4] (median 2.5, |z|=1.5,.5,.5,1.5), b=[10,20,30]
    (median 20, |z|=10,0,10): in doubled units z'=(3,1,1,3)/(20,0,20),
    SSB/SSW computed by hand => F = 220.190476/54.133333 = 4.067557;
    equal-spread groups => F ~ 0; one group => NULL f_stat."""
    from dataframes_jl_spark.functions.stats import brown_forsythe

    rows = [("a", v) for v in [1.0, 2.0, 3.0, 4.0]] + [
        ("b", v) for v in [10.0, 20.0, 30.0]
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    r = brown_forsythe(df, "x", "g", scale=0).collect()[0]
    assert (r["n_groups"], r["n"]) == (2, 7)
    sb = 64 / 4 + 1600 / 3
    ssb = sb - 48.0 * 48.0 / 7
    ssw = 820 - sb
    f = (ssb / 1.0) / (ssw / 5.0)
    # Python's summation order differs from the engine's fold by an
    # ulp, which can flip the 1e-6 quantization digit — compare to
    # within one quantum
    assert abs(r["f_stat"] - f) < 2e-6
    assert (r["df_between"], r["df_within"]) == (1.0, 5.0)
    # identical deviation PATTERNS, shifted location: mean |z| equal in
    # both groups => SSB = 0 => F = 0 (within-spread stays positive)
    same = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 4.0), ("b", 11.0), ("b", 12.0), ("b", 14.0)],
        "g string, x double",
    )
    assert brown_forsythe(same, "x", "g", scale=0).collect()[0]["f_stat"] == 0.0
    # ALL deviations identical: SSW = 0 — genuinely undefined, NULL
    degen = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 11.0), ("b", 13.0)],
        "g string, x double",
    )
    assert brown_forsythe(degen, "x", "g", scale=0).collect()[0]["f_stat"] is None
    one = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, x double")
    assert brown_forsythe(one, "x", "g", scale=0).collect()[0]["f_stat"] is None


def test_label_silhouette_hand_values(spark):
    """Two well-separated 2-D labels: centroids (1,0) and (11,0);
    point (0,0) has a=1, b=121 => s=120/121; (2,0) a=1, b=81 =>
    s=80/81 — per-label means check exactly under the 1e-6 per-point
    quantization. A singleton third label reports s=1 (documented
    simplified-variant artifact)."""
    from dataframes_jl_spark.llm.cluster import label_silhouette

    rows = [
        (0, [0.0, 0.0]),
        (0, [2.0, 0.0]),
        (1, [10.0, 0.0]),
        (1, [12.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "label int, embedding array<double>")
    got = {r["label"]: r for r in label_silhouette(df).collect()}
    import math

    su = [math.floor(120 / 121 * 1e6 + 0.5), math.floor(80 / 81 * 1e6 + 0.5)]
    want = math.floor(sum(su) / 2 + 0.5) / 1e6
    assert got[0]["mean_sil"] == want
    assert got[1]["mean_sil"] == want  # symmetric construction
    assert got[0]["mean_a"] == 1.0 and got[0]["mean_b"] == 101.0
    single = rows + [(2, [100.0, 0.0])]
    df2 = spark.createDataFrame(
        single, "label int, embedding array<double>"
    )
    got2 = {r["label"]: r for r in label_silhouette(df2).collect()}
    assert got2[2]["mean_sil"] == 1.0 and got2[2]["mean_a"] == 0.0
