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


# ---------------------------------------------------------------- PNG/BMP


def _png_of(ctype, w, h, raw_px, extra=b"", depth=8):
    """Hand-build a PNG with filter 0 rows from raw sample bytes."""
    import struct
    import zlib

    from dataframes_jl_spark.llm.multimodal import _PNG_SIG, _png_chunk

    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    stride = w * ch
    stream = b"".join(
        b"\x00" + raw_px[y * stride : (y + 1) * stride] for y in range(h)
    )
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + extra
        + _png_chunk(b"IDAT", zlib.compress(stream))
        + _png_chunk(b"IEND", b"")
    )


def test_png_color_types():
    from dataframes_jl_spark.llm.multimodal import _decode_png, _png_chunk

    # gray (type 0): 2x2 values 0,85,170,255 -> mean 127.5/255 = 0.5
    w, h, ch, luma = _decode_png(_png_of(0, 2, 2, bytes([0, 85, 170, 255])))
    assert (w, h, ch) == (2, 2, 1) and luma == pytest.approx(0.5)
    # RGBA (type 6): alpha ignored in luma
    px = bytes([255, 0, 0, 7, 0, 255, 0, 9])  # red + green, odd alphas
    w, h, ch, luma = _decode_png(_png_of(6, 2, 1, px))
    assert (w, h, ch) == (2, 1, 4)
    assert luma == pytest.approx((0.299 * 255 + 0.587 * 255) / 2 / 255.0)
    # gray+alpha (type 4)
    w, h, ch, luma = _decode_png(_png_of(4, 2, 1, bytes([100, 3, 200, 250])))
    assert (w, h, ch) == (2, 1, 2) and luma == pytest.approx(150 / 255.0)
    # palette (type 3): 2 entries, indices 0/1 -> decodes to RGB
    plte = _png_chunk(b"PLTE", bytes([255, 255, 255, 0, 0, 0]))
    w, h, ch, luma = _decode_png(_png_of(3, 2, 1, bytes([0, 1]), extra=plte))
    assert (w, h, ch) == (2, 1, 3) and luma == pytest.approx(0.5)


def test_png_rejections():
    from dataframes_jl_spark.llm.multimodal import _decode_png

    assert _decode_png(b"definitely not a png") is None
    with pytest.raises(NotImplementedError):
        _decode_png(_png_of(0, 2, 2, bytes(8), depth=16))
    # corrupt a CRC byte -> ValueError, not silent garbage
    good = bytearray(_png_of(0, 2, 2, bytes([0, 85, 170, 255])))
    good[-5] ^= 0xFF  # inside IEND CRC
    with pytest.raises(ValueError):
        _decode_png(bytes(good))


def test_png_filters_roundtrip_nonuniform():
    """Every filter type over a raster where each filter's prediction
    is non-trivial (random-ish bytes), encoder/decoder must invert."""
    from dataframes_jl_spark.llm.multimodal import (
        _decode_png,
        _encode_png_rgb8,
    )

    w, h = 7, 5
    rows = [
        bytes(((x * 37 + y * 91 + (x * y) % 13) * 17) % 256
              for x in range(3 * w))
        for y in range(h)
    ]
    payload = _encode_png_rgb8(rows, w, h)
    import numpy as np

    flat = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(-1, 3)
    sums = flat.sum(axis=0, dtype=np.int64)
    exp = (
        0.299 * float(sums[0]) + 0.587 * float(sums[1]) + 0.114 * float(sums[2])
    ) / (w * h) / 255.0
    got = _decode_png(payload)
    assert got[0] == w and got[1] == h and got[2] == 3
    assert got[3] == pytest.approx(exp, abs=1e-12)


def test_bmp_variants():
    import struct

    from dataframes_jl_spark.llm.multimodal import (
        _decode_bmp,
        _encode_bmp_rgb8,
    )

    assert _decode_bmp(b"not a bmp") is None
    # odd width exercises row padding
    w, h = 3, 2
    rows = [bytes([10, 20, 30] * w), bytes([200, 100, 50] * w)]
    payload = _encode_bmp_rgb8(rows, w, h)
    got = _decode_bmp(payload)
    import numpy as np

    flat = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(-1, 3)
    sums = flat.sum(axis=0, dtype=np.int64)
    exp = (
        0.299 * float(sums[0]) + 0.587 * float(sums[1]) + 0.114 * float(sums[2])
    ) / (w * h) / 255.0
    assert got == (w, h, 3, pytest.approx(exp))
    # 8-bit BMP -> NotImplementedError, honest gap
    bad = bytearray(payload)
    bad[28:30] = struct.pack("<H", 8)
    with pytest.raises(NotImplementedError):
        _decode_bmp(bytes(bad))


def test_decode_images_mixed_formats(spark):
    """One frame mixing netpbm, PNG, and BMP payloads through the real
    mapInPandas kernel — the dispatch order must route each format to
    its parser."""
    from dataframes_jl_spark.llm.multimodal import (
        _encode_bmp_rgb8,
        _encode_png_rgb8,
        decode_images,
    )

    red_row = bytes([255, 0, 0] * 4)
    png = _encode_png_rgb8([red_row] * 3, 4, 3)
    bmp = _encode_bmp_rgb8([red_row] * 3, 4, 3)
    ppm = b"P6\n4 3\n255\n" + bytes([255, 0, 0]) * 12
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(bmp)), (3, bytearray(ppm))],
        "media_id long, payload binary",
    )
    rows = {
        r["media_id"]: r for r in decode_images(df, "payload").collect()
    }
    exp = 0.299  # pure red
    for mid in (1, 2, 3):
        r = rows[mid]
        assert (r["width"], r["height"], r["channels"]) == (4, 3, 3)
        assert r["mean_luma"] == pytest.approx(exp)


def test_weighted_minhash_pairs_exact(spark):
    """Weighted vs unweighted Jaccard semantics: repetition mass must
    count. Verified against hand-computed exact values."""
    from dataframes_jl_spark.llm.dedup import weighted_minhash_pairs

    docs = [
        (1, "a a a b c"),        # counts {a:3,b:1,c:1}
        (2, "a a a b d"),        # J_w(1,2) = 4/6 = 0.666667
        (3, "x y z"),
        (4, "x y z z"),          # J_w(3,4) = 3/4 = 0.75
        (5, ""),                 # empty doc pairs with nothing
        (6, "a b c"),            # unweighted J(1,6)=3/4=0.75 but
                                 # J_w(1,6) = 3/(5+3-3) = 0.6
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        (r["id_a"], r["id_b"]): r["wjaccard"]
        for r in weighted_minhash_pairs(
            df, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert got[(1, 2)] == pytest.approx(0.666667)
    assert got[(3, 4)] == pytest.approx(0.75)
    assert got[(1, 6)] == pytest.approx(0.6)
    assert (1, 5) not in got and (5, 6) not in got


def test_weighted_minhash_cap_distortion(spark):
    """Counts above max_weight stop influencing the SKETCH but the
    exact verify still scores them: a pair whose similarity is pure
    high-count mass still verifies with the true J_w."""
    from dataframes_jl_spark.llm.dedup import weighted_minhash_pairs

    df = spark.createDataFrame(
        [(1, " ".join(["spam"] * 40 + ["x"])),
         (2, " ".join(["spam"] * 38 + ["y"]))],
        "doc_id int, text string",
    )
    got = weighted_minhash_pairs(
        df, "doc_id", "text", threshold=0.5, max_weight=8
    ).collect()
    # exact: min 38 / (41 + 39 - 38) = 38/42 = 0.904762
    assert len(got) == 1
    assert got[0]["wjaccard"] == pytest.approx(0.904762)


def test_dsir_weights_cache_contract_and_totals(spark):
    """r15 optimization: dsir_weights derives corpus totals from one
    map-side size() pass (not a re-aggregation of the count table) and
    persists the vocab-sized vt table. The VALUES must be unchanged vs
    the naive formulation, and the cache must ride the result as a
    release()-able handle (core.cache contract)."""
    from dataframes_jl_spark import release
    from dataframes_jl_spark.llm.mixture import dsir_weights

    df = spark.createDataFrame(
        [
            (1, "aa bb aa cc", "t"),
            (2, "bb bb dd", "t"),
            (3, "aa zz zz qq rr", "r"),
            (4, "   ", "r"),
            (5, None, "r"),
        ],
        "doc_id int, text string, src string",
    )
    target = df.filter(F.col("src") == "t")
    out = dsir_weights(target, df, "doc_id", "text", vocab_size=3)
    rows = {r["id"]: r for r in out.collect()}
    # n_tok: exact whitespace token counts; blank/NULL docs -> 0 tokens
    assert rows[1]["n_tok"] == 4 and rows[3]["n_tok"] == 5
    assert rows[4]["n_tok"] == 0 and rows[4]["log_weight"] == 0.0
    assert rows[5]["n_tok"] == 0 and rows[5]["log_weight"] == 0.0
    # hand-checked smoothed log-ratio for doc 1 (all tokens in vocab
    # or OOV against n_t=7, n_r=12, V=3): target-like docs score > 0
    assert rows[1]["log_weight"] > 0 > rows[3]["log_weight"]
    # structural persist contract: vt cache attached, release() clears
    handles = getattr(out, "unpersist_handles", ())
    assert len(handles) == 1 and handles[0].is_cached
    release(out)
    assert not handles[0].is_cached


def test_frequent_pairs_cache_contract(spark):
    """r15 optimization: frequent_pairs persists the |items|-bounded
    item_counts table (3 consumers) and npmi_pairs propagates the
    handle through its projection; release() must clear it."""
    from dataframes_jl_spark import release
    from dataframes_jl_spark.ops.basket import npmi_pairs

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c")],
        "basket int, item string",
    )
    out = npmi_pairs(df, "basket", "item", min_count=2)
    rows = {(r["item_a"], r["item_b"]): r for r in out.collect()}
    assert rows[("a", "b")]["n_pair"] == 2
    assert rows[("a", "b")]["n_a"] == 3 and rows[("a", "b")]["n_b"] == 2
    handles = getattr(out, "unpersist_handles", ())
    assert len(handles) == 1 and handles[0].is_cached
    release(out)
    assert not handles[0].is_cached


def test_attribution_left_join_direct_and_null_channel(spark):
    """r15 optimization: attribute_conversions computes the (direct)
    fallback from the SAME left join that produces the credits (the
    inner-join + anti-join branch re-executed the user join). Edge
    cases the marker must keep exact: a conversion with no in-window
    touch gets FULL (direct) credit in every model, and a touch whose
    channel value is legitimately NULL stays a NULL-channel credit,
    never (direct)."""
    from dataframes_jl_spark.ops.attribution import attribute_conversions

    df = spark.createDataFrame(
        [
            # user 1: touch (ch A) then conversion of 10.00
            (1, 100, 1, "A", 0.0, 0),
            (1, 200, 2, None, 10.0, 1),
            # user 2: conversion with NO touch -> (direct) 5.00
            (2, 300, 3, None, 5.0, 1),
            # user 3: touch with NULL channel then conversion of 2.00
            (3, 100, 4, None, 0.0, 0),
            (3, 150, 5, None, 2.0, 1),
        ],
        "u int, t long, uid int, ch string, v double, conv int",
    )
    ev = df.select(
        "u", F.timestamp_seconds("t").alias("ts"), "uid", "ch", "v", "conv"
    )
    out = {
        r["ch"]: r
        for r in attribute_conversions(
            ev, "u", "ts", "uid", "ch", "v",
            is_conversion=F.col("conv") == 1,
        ).collect()
    }
    assert out["A"]["credit_first"] == 10.0 and out["A"]["n_last"] == 1
    assert out["(direct)"]["credit_first"] == 5.0
    assert out["(direct)"]["credit_last"] == 5.0
    assert out["(direct)"]["credit_linear"] == 5.0
    # NULL-channel touch is a real channel value, not (direct)
    assert out[None]["credit_first"] == 2.0 and out[None]["n_last"] == 1


def test_gopher_report_matches_rule_columns(spark):
    """r15 optimization: gopher_report (let1-bound struct behind a
    Generate boundary, one tokenization per row) must equal the
    dict-of-Columns surface field for field, including NULL/blank
    text edge rows."""
    from dataframes_jl_spark.llm import gopher_rules, token_count
    from dataframes_jl_spark.llm.text import gopher_report

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat with a hat and that"),
            (2, ""),
            (3, None),
            (4, "- a\n- b\n- c"),
            (5, "####### lots of symbols #### here ..."),
        ],
        "doc_id int, text string",
    )
    rules = gopher_rules("text", min_words=5)
    ref = df.select(
        "doc_id",
        token_count("text").alias("n_words"),
        *[c.alias(k) for k, c in rules.items()],
    )
    got = gopher_report(df, "text", ["doc_id"], min_words=5)
    assert got.columns == ref.columns
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))
