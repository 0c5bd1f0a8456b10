"""LLM-pipeline operator tests: dedup (exact/jaccard/minhash/simhash),
similarity search, text analysis, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataframes_jl_spark.llm import (
    brute_force_topk,
    doc_fingerprint,
    exact_dedup,
    jaccard_pairs,
    language_id,
    lsh_topk,
    minhash_lsh_pairs,
    minhash_signature,
    quality_score,
    shingles,
    simhash,
    simhash_pairs,
    token_count,
)
from dataframes_jl_spark.llm.multimodal import (
    attach_media_meta,
    decode_images,
    frame_sample_plan,
)


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (4, "completely different content about spark engines and shuffles"),
        (5, "   "),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_dedup(docs):
    out = exact_dedup(docs, ["text"], "doc_id")
    assert out.count() == 4  # 1&3 merged
    kept = {r.doc_id for r in out.collect()}
    assert 1 in kept and 3 not in kept  # min-id representative


def test_shingles_and_token_count(docs):
    row = docs.filter("doc_id = 1").select(
        shingles("text", 3).alias("sh"), token_count("text").alias("tc")
    ).collect()[0]
    assert row.tc == 9
    assert len(row.sh) == 7
    assert "the quick brown" in row.sh
    blank = docs.filter("doc_id = 5").select(token_count("text").alias("tc")).collect()[0]
    assert blank.tc == 0


def test_jaccard_pairs_exact(docs):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in
             jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.3).collect()}
    assert (1, 3) in pairs and pairs[(1, 3)] == 1.0  # identical
    assert (1, 2) in pairs and 0.3 <= pairs[(1, 2)] < 1.0  # near-dup
    assert not any(4 in p for p in pairs)


def test_minhash_matches_exact_jaccard(docs):
    exact = {(r.id_a, r.id_b) for r in
             jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()}
    approx = {(r.id_a, r.id_b) for r in
              minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5).collect()}
    assert approx == exact  # verified LSH equals exact set here


def test_minhash_signature_properties(docs):
    sigs = {r.doc_id: r.sig for r in docs.filter("doc_id in (1,3,4)").select(
        "doc_id", minhash_signature("text", 32).alias("sig")).collect()}
    assert sigs[1] == sigs[3]  # identical docs → identical signatures
    assert sigs[1] != sigs[4]
    assert len(sigs[1]) == 32


def test_simhash_pairs(docs):
    sh = {r.doc_id: r.s for r in docs.select(
        "doc_id", simhash("text").alias("s")).collect()}
    assert sh[1] == sh[3]
    pairs = {(r.id_a, r.id_b): r.hamming for r in
             simhash_pairs(docs, "doc_id", "text", max_hamming=10).collect()}
    assert pairs.get((1, 3)) == 0
    # near-dup docs should be within a small hamming distance
    assert (1, 2) in pairs


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "e d c b a")],
        "doc_id bigint, text string",
    )
    fps = {r.doc_id: r.fp for r in df.select(
        "doc_id", doc_fingerprint("text").alias("fp")).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]  # order matters


def test_language_id_and_quality(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is in the house"),
            (2, "der Hund ist nicht ein Katze und das Haus"),
            (3, "xyzzy plugh"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r.lang for r in df.select(
        "doc_id", language_id("text").alias("lang")).collect()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "und"
    q = df.select(quality_score("text").alias("q")).collect()
    assert all(0.0 <= r.q <= 1.0 for r in q)


def test_brute_force_topk(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),   # closest to 1
        (3, [0.0, 1.0, 0.0]),
        (4, [-1.0, 0.0, 0.0]),  # opposite of 1
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = brute_force_topk(df, df, k=2)
    top1 = {r.neighbor_id for r in out.filter("query_id = 1 and rank = 1").collect()}
    assert top1 == {2}
    # rank 2 for query 1 must be 3 (cos 0) not 4 (cos -1)
    r2 = out.filter("query_id = 1 and rank = 2").collect()[0]
    assert r2.neighbor_id == 3


def test_lsh_topk_recall_on_testdata(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = brute_force_topk(emb, emb, k=1)
    approx = lsh_topk(emb, k=1, num_planes=4, num_tables=8)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall > 0.5, f"LSH top-1 recall too low: {recall}"


def test_multimodal_plumbing(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"fake-image-bytes-1")), (2, bytearray(b"fake-image-bytes-2"))],
        "id bigint, payload binary",
    )
    media = attach_media_meta(df, "id", "payload", kind="image", mime="image/png")
    metas = media.collect()
    assert all(m.n_bytes == 18 and len(m.sha256) == 64 for m in metas)
    feats = decode_images(media, fake=True).collect()
    assert len(feats) == 2
    assert all(64 <= f.width < 256 and 0 <= f.mean_luma <= 1 for f in feats)
    # determinism: same payload → same features
    again = decode_images(media, fake=True).collect()
    assert sorted(map(tuple, feats)) == sorted(map(tuple, again))
    # real mode must refuse loudly when Pillow is absent
    import importlib.util

    if importlib.util.find_spec("PIL") is None:
        with pytest.raises(Exception, match="NotImplementedError|image decoding"):
            decode_images(media, fake=False).collect()
    plan = frame_sample_plan(media.withColumn("n_bytes", F.lit(90000)), every_n=30)
    assert plan.filter("media_id = 1").count() == 3  # frames 0,30,60


@pytest.mark.skipif(
    __import__("importlib.util", fromlist=["util"]).find_spec("PIL") is None,
    reason="Pillow not installed in this container",
)
def test_real_image_kernel_with_pillow(spark):
    """When the environment gains Pillow the real kernels light up:
    decode a generated PNG and check exact dimensions + luma."""
    import io

    from PIL import Image

    from dataframes_jl_spark.llm.multimodal import resize_images

    buf = io.BytesIO()
    Image.new("RGB", (20, 10), color=(255, 255, 255)).save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()))], "id bigint, payload binary"
    )
    media = attach_media_meta(df, "id", "payload", kind="image", mime="image/png")
    f = decode_images(media, fake=False).collect()[0]
    assert (f.width, f.height, f.channels) == (20, 10, 3)
    assert f.mean_luma > 0.99
    r = resize_images(media, 8, 4, fake=False).collect()[0]
    assert Image.open(io.BytesIO(r.payload)).size == (8, 4)


def test_ivf_topk_recall_on_testdata(spark):
    from dataframes_jl_spark.llm import brute_force_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = brute_force_topk(emb, emb, k=1)
    approx = ivf_topk(emb, k=1, n_centroids=8, n_probe=3)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall > 0.6, f"IVF top-1 recall too low: {recall}"


def test_embedding_dup_pairs_exact_vs_bucketed(spark):
    import random

    from dataframes_jl_spark.llm import embedding_dup_pairs

    # planted near-dups: 20 random base vectors, 10 of them duplicated
    # with tiny noise — those 10 pairs (i, i+100) are the ground truth
    rng = random.Random(7)
    rows = []
    for i in range(20):
        v = [rng.gauss(0, 1) for _ in range(16)]
        rows.append((i, v))
        if i < 10:
            rows.append((i + 100, [x + rng.gauss(0, 0.01) for x in v]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    exact = embedding_dup_pairs(df, threshold=0.99, bucketed=False)
    e = {(r.id_a, r.id_b) for r in exact.collect()}
    assert e == {(i, i + 100) for i in range(10)}
    bucketed = embedding_dup_pairs(
        df, threshold=0.99, bucketed=True, dim=16, num_planes=4, num_tables=8
    )
    b = {(r.id_a, r.id_b) for r in bucketed.collect()}
    # bucketed mode returns a subset of the exact pair set (no false
    # positives); near-identical vectors almost always share a bucket
    assert b <= e
    assert len(b) / len(e) >= 0.8, f"bucketed recall too low: {len(b)}/{len(e)}"
    # DEFAULT args take the bucketed path: no cartesian product in the
    # plan — the quadratic baseline must be opted into with
    # bucketed=False (round-4 verdict wrong-item #3)
    default_plan = (
        embedding_dup_pairs(df, threshold=0.99)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in default_plan
    assert "BroadcastNestedLoopJoin" not in default_plan


def test_dedup_clusters_and_corpus(spark):
    from dataframes_jl_spark.llm.dedup import dedup_clusters, dedup_corpus

    # two components: {1,2,3,4} via chain, {10,11}; 99 isolated (no pair)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a bigint, id_b bigint"
    )
    got = {
        (r.id, r.cluster) for r in dedup_clusters(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in [1, 2, 3, 4, 10, 11, 99]],
        "doc_id bigint, text string",
    )
    kept = {r.doc_id for r in dedup_corpus(docs, pairs, "doc_id").collect()}
    assert kept == {1, 10, 99}


def test_jaccard_hashed_matches_exact(docs):
    from dataframes_jl_spark.llm.dedup import jaccard_pairs

    exact = {(r.id_a, r.id_b): round(r.jaccard, 9) for r in
             jaccard_pairs(docs, "doc_id", "text", threshold=0.3).collect()}
    hashed = {(r.id_a, r.id_b): round(r.jaccard, 9) for r in
              jaccard_pairs(docs, "doc_id", "text", threshold=0.3,
                            hash_shingles=True).collect()}
    # 64-bit shingle hashing must not change any pair at test scale
    assert exact == hashed and len(exact) > 0


def test_pack_offset_matches_manual(spark):
    from dataframes_jl_spark.llm import pack_offset

    df = spark.createDataFrame(
        [("s", i, sz) for i, sz in enumerate([30, 30, 30, 30, 30])],
        "source string, doc_id bigint, n_chars bigint",
    )
    bins = {r.doc_id: r.bin for r in pack_offset(df, "n_chars", 100, by="source").collect()}
    # start offsets 0,30,60,90,120 -> bins 0,0,0,0,1
    assert bins == {0: 0, 1: 0, 2: 0, 3: 0, 4: 1}


def test_pack_greedy_never_overflows(spark):
    from dataframes_jl_spark.llm import pack_greedy

    import random
    rng = random.Random(7)
    rows = [("s%d" % (i % 3), i, rng.randint(10, 90)) for i in range(200)]
    df = spark.createDataFrame(rows, "source string, doc_id bigint, n_chars bigint")
    packed = pack_greedy(df, "n_chars", 100, by="source").collect()
    fills = {}
    for r in packed:
        fills.setdefault((r.source, r.bin), 0)
        fills[(r.source, r.bin)] += r.n_chars
    assert all(v <= 100 for v in fills.values())
    assert len(packed) == 200
    # greedy fills at least as tightly as one-item-per-bin
    assert len(fills) < 200


def test_resize_images_plumbing(spark):
    from dataframes_jl_spark.llm.multimodal import resize_images

    df = spark.createDataFrame(
        [(i, bytes([i]) * 100) for i in range(10)],
        "media_id bigint, payload binary",
    )
    out = resize_images(df, 32, 16, fake=True).collect()
    assert len(out) == 10
    assert all(r.width == 32 and r.height == 16 for r in out)
    assert all(len(r.payload) == (32 * 16) // 64 for r in out)
    # deterministic: same input payload -> same resized payload
    a = resize_images(df, 32, 16, fake=True).collect()
    assert {r.media_id: bytes(r.payload) for r in a} == {
        r.media_id: bytes(r.payload) for r in out
    }
    import pytest as _p
    with _p.raises(Exception, match="NotImplementedError|Pillow"):
        resize_images(df, 8, 8, fake=False).collect()


# ------------------------------------------------------------ decontam


def test_decontaminate_drops_overlapping_docs(spark):
    from dataframes_jl_spark.llm import (
        contamination_report,
        decontaminate,
        ngram_overlap,
    )

    ev = spark.createDataFrame(
        [(100, "what is the capital of france")],
        "doc_id bigint, text string",
    )
    tr = spark.createDataFrame(
        [
            # contains the full eval doc verbatim -> coverage 1.0
            (1, "trivia answer what is the capital of france it is paris"),
            # shares "is the capital"/"the capital of" -> 2 of 4 grams
            (2, "berlin is the capital of germany"),
            # no overlap at all
            (3, "spark shuffles partition data across executors"),
        ],
        "doc_id bigint, text string",
    )
    ov = {
        (r["train_id"], r["eval_id"]): r["coverage"]
        for r in ngram_overlap(tr, ev, n=3).collect()
    }
    assert ov[(1, 100)] == 1.0
    assert ov[(2, 100)] == 0.5
    assert (3, 100) not in ov

    kept = decontaminate(tr, ev, n=3, threshold=0.8)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3]

    rep = contamination_report(tr, ev, n=3, threshold=0.8).collect()
    assert [r["train_id"] for r in rep] == [1]
    assert rep[0]["n_eval_hits"] == 1 and rep[0]["max_coverage"] == 1.0


def test_ngram_overlap_hashed_matches_raw(spark):
    from dataframes_jl_spark.llm import ngram_overlap

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ev = docs.filter(F.col("source") == "src0")
    tr = docs.filter(F.col("source") != "src0")
    raw = {
        (r["train_id"], r["eval_id"]): (r["common"], r["coverage"])
        for r in ngram_overlap(tr, ev).collect()
    }
    hashed = {
        (r["train_id"], r["eval_id"]): (r["common"], r["coverage"])
        for r in ngram_overlap(tr, ev, hash_shingles=True).collect()
    }
    assert raw == hashed and len(raw) > 0


# ------------------------------------------------------------- cluster


def test_kmeans_assign_picks_nearest_and_breaks_ties_low(spark):
    from dataframes_jl_spark.llm import cluster_profile, kmeans_assign

    emb = spark.createDataFrame(
        [
            (0, [0.0, 0.0]),
            (1, [10.0, 10.0]),
            (2, [0.4, 0.0]),   # nearest centroid 0
            (3, [9.0, 10.0]),  # nearest centroid 1
            (4, [5.0, 5.0]),   # exactly between -> tie -> cluster 0
        ],
        "vec_id bigint, embedding array<double>",
    )
    cents = [[0.0, 0.0], [10.0, 10.0]]
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(emb, cents, scale=6).collect()
    }
    assert got == {0: 0, 1: 1, 2: 0, 3: 1, 4: 0}

    prof = {
        r["cluster"]: r["n_vecs"]
        for r in cluster_profile(
            kmeans_assign(emb, cents, scale=6)
        ).collect()
    }
    assert prof == {0: 3, 1: 2}


def test_cluster_embeddings_end_to_end(spark):
    from dataframes_jl_spark.llm import cluster_embeddings

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = cluster_embeddings(emb, k=4, seed=7)
    rows = out.collect()
    assert len(rows) == emb.count()
    clusters = {r["cluster"] for r in rows}
    assert clusters <= set(range(4)) and len(clusters) > 1
    assert all(r["qdist2"] >= 0 for r in rows)


# ------------------------------------------------------------- mixture


def test_mixture_weights_uniform_and_target(spark):
    from dataframes_jl_spark.llm import domain_stats, mixture_weights

    docs = spark.createDataFrame(
        [
            (1, "a b c d", "web"),
            (2, "e f g h", "web"),
            (3, "i j", "code"),
        ],
        "doc_id bigint, text string, source string",
    )
    stats = {r["source"]: r for r in domain_stats(docs).collect()}
    assert stats["web"]["n_tokens"] == 8 and stats["code"]["n_tokens"] == 2
    assert abs(stats["web"]["token_share"] - 0.8) < 1e-12

    uni = {r["source"]: r["weight"] for r in mixture_weights(docs).collect()}
    # uniform target: web share 0.8 -> weight 0.5/0.8; code 0.2 -> 0.5/0.2
    assert abs(uni["web"] - 0.625) < 1e-12
    assert abs(uni["code"] - 2.5) < 1e-12

    tgt = {
        r["source"]: r["weight"]
        for r in mixture_weights(docs, target={"web": 1.0}).collect()
    }
    assert abs(tgt["web"] - 1.25) < 1e-12 and tgt["code"] == 0.0


def test_text_signals_linear_on_long_docs(spark):
    """Regression pin for the round-4 HOF-closure fix: a lambda closing
    over an outer expression re-evaluates it per element (O(doc^2)) —
    a 50k-token doc must finish in bounded time AND produce the same
    values as a small-doc equivalent computation."""
    import time

    from dataframes_jl_spark.llm.dedup import minhash_signature, simhash
    from dataframes_jl_spark.llm.text import doc_fingerprint, top_bigram_fraction

    doc = " ".join(["aa", "bb", "cc", "dd"][i % 4] for i in range(50_000))
    df = spark.createDataFrame([(doc,)], "text string")
    t0 = time.time()
    row = df.select(
        top_bigram_fraction("text").alias("f"),
        doc_fingerprint("text").alias("fp"),
        F.length(simhash("text")).alias("shlen"),
        F.size(minhash_signature("text")).alias("mhlen"),
    ).collect()[0]
    elapsed = time.time() - t0
    # quadratic pre-fix behavior took minutes at this size; linear is seconds
    assert elapsed < 60, f"long-doc text signals took {elapsed:.1f}s — quadratic?"
    # 'aa bb' repeats 12500x of 49999 bigram slots
    assert abs(row.f - 12500 / 49999) < 1e-9
    assert row.shlen == 64 and row.mhlen == 64


def test_top_bigram_fraction_values(spark):
    from dataframes_jl_spark.llm.text import top_bigram_fraction

    df = spark.createDataFrame(
        [("a b a b a b",), ("x y z",), ("",), ("w",)], "text string"
    )
    vals = [r.f for r in df.select(top_bigram_fraction("text").alias("f")).collect()]
    # "a b" fills 3 of 5 slots; "x y"/"y z" tie at 1 of 2; short docs 0
    assert vals == [3 / 5, 1 / 2, 0.0, 0.0]


def test_pack_greedy_shard_guard(spark):
    """An oversized shard must fail loudly before applyInPandas
    materializes it (round-3 verdict #7), and the guard must name the
    offending shard."""
    import pytest as _pytest

    from dataframes_jl_spark.llm.packing import pack_greedy

    df = spark.range(100).select(
        F.lit("web").alias("source"),
        F.col("id").alias("doc_id"),
        F.lit(10).alias("n_tok"),
    )
    with _pytest.raises(ValueError, match="web"):
        pack_greedy(df, "n_tok", budget=50, max_shard_rows=10)
    # within bounds: packs fine
    out = pack_greedy(df, "n_tok", budget=50, max_shard_rows=1000)
    assert out.where(F.col("bin") == 0).count() == 5


# ----------------------------------------------------------------- spans


@pytest.fixture()
def span_docs(spark):
    core = "c0 c1 c2 c3 c4 c5"  # 6-token shared run
    rows = [
        (1, f"x1 x2 {core} y1 y2"),          # run at pos 2
        (2, f"z1 {core} z2 z3 z4"),          # run at pos 1
        (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),   # unrelated
        (4, "w1 w2"),                        # shorter than n
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_duplicated_spans_diagonal_merge(span_docs):
    from dataframes_jl_spark.llm import duplicated_spans

    out = duplicated_spans(
        span_docs, "doc_id", "text", n=3, min_len=5, max_df=8
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert (r.a_start, r.b_start, r.length) == (2, 1, 6)


def test_duplicated_spans_min_len_filters(span_docs):
    from dataframes_jl_spark.llm import duplicated_spans

    out = duplicated_spans(
        span_docs, "doc_id", "text", n=3, min_len=7, max_df=8
    ).collect()
    assert out == []


def test_duplicated_spans_max_df_guard(spark):
    from dataframes_jl_spark.llm import duplicated_spans

    # the same 5-token run in 4 docs: with max_df=2 every gram of the run
    # has doc-frequency 4 > 2, so the boilerplate guard drops all pairs
    rows = [(i, f"p{i} a b c d e s{i}") for i in range(1, 5)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    assert (
        duplicated_spans(df, "doc_id", "text", n=3, min_len=5, max_df=2).count() == 0
    )
    assert (
        duplicated_spans(df, "doc_id", "text", n=3, min_len=5, max_df=8).count() == 6
    )  # all 4-choose-2 pairs


def test_duplicated_spans_hash_grams_same_result(span_docs):
    from dataframes_jl_spark.llm import duplicated_spans

    exact = duplicated_spans(span_docs, "doc_id", "text", n=3, min_len=5, max_df=8)
    hashed = duplicated_spans(
        span_docs, "doc_id", "text", n=3, min_len=5, max_df=8, hash_grams=True
    )
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, hashed.collect()))


def test_span_dup_fraction_interval_merge(spark):
    from dataframes_jl_spark.llm import span_dup_fraction

    # doc 1 shares [0,6) with doc 2 and [3,9) with doc 3: the merged
    # coverage for doc 1 is [0,9) = 9 tokens of 10, not 6+6
    rows = [
        (1, "a b c d e f g h i j"),
        (2, "a b c d e f x2 y2 z2 w2"),   # matches doc1[0:6)
        (3, "x3 y3 z3 w3 d e f g h i"),   # matches doc1[3:9)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r.id: (r.n_tokens, r.dup_tokens, r.dup_fraction)
        for r in span_dup_fraction(
            df, "doc_id", "text", n=3, min_len=5, max_df=8
        ).collect()
    }
    assert out[1] == (10, 9, 0.9)
    assert out[2] == (10, 6, 0.6)
    assert out[3] == (10, 6, 0.6)


# ------------------------------------------------------------- semdedup


def test_semdedup_pairs_only_within_cluster(spark):
    from dataframes_jl_spark.llm import semdedup, semdedup_pairs

    # ids 0/1 are near-identical in cluster 0; id 3 is cosine-close to
    # both but assigned to cluster 1 — cross-cluster pairs must NOT be
    # scored.
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.999, 0.01]),
            (2, [0.0, 1.0]),
            (3, [0.6, 0.55]),
        ],
        "vec_id bigint, embedding array<double>",
    )
    cents = [[1.0, 0.0], [0.55, 0.6]]
    pairs = semdedup_pairs(emb, cents, threshold=0.95).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(0, 1)}
    # survivors drop the higher id of each qualifying pair
    kept = {r.vec_id for r in semdedup(emb, cents, threshold=0.95).collect()}
    assert kept == {0, 2, 3}


def test_semdedup_pairs_no_cartesian_product(spark):
    from dataframes_jl_spark.llm import semdedup_pairs

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)],
        "vec_id bigint, embedding array<double>",
    )
    plan = semdedup_pairs(emb, [[0.0, 0.0], [19.0, 1.0]])._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ------------------------------------------------------------- gopher


def test_gopher_rules_reference_cases(spark):
    from dataframes_jl_spark.llm import gopher_pass, gopher_rules

    good = (
        "The quick brown fox jumps over the lazy dog and runs off to "
        "the hills with plenty of energy that morning, having seen "
        "nothing strange at all."
    )
    bullets = "\n".join(f"- item {i}" for i in range(10))
    symbols = "# " * 30 + "word"
    short = "tiny text"
    rows = [(1, good), (2, bullets), (3, symbols), (4, short), (5, "")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    rules = gopher_rules("text", min_words=5)
    out = {
        r["doc_id"]: r.asDict()
        for r in df.select(
            "doc_id",
            *[c.alias(n) for n, c in rules.items()],
            gopher_pass("text", min_words=5).alias("keep"),
        ).collect()
    }
    assert out[1]["keep"] is True
    assert out[2]["bullet_lines_ok"] is False  # 100% bullet lines
    assert out[3]["symbol_ratio_ok"] is False  # '#' per word >> 0.1
    assert out[4]["word_count_ok"] is False    # below the 5-word floor
    assert out[5]["keep"] is False             # empty: fails word count
    assert out[5]["word_count_ok"] is False


# ------------------------------------------------------- token budget


def test_take_token_budget_caps_and_overrides(spark):
    from dataframes_jl_spark.llm import take_token_budget

    # source A: 3 docs x 4 tokens; source B: one 10-token doc
    rows = [
        (1, "A", "a b c d"),
        (2, "A", "e f g h"),
        (3, "A", "i j k l"),
        (4, "B", "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    # budget 8: exactly two A docs fit; B's single doc (10 tokens) is a
    # hard-cap exclusion, so B contributes nothing
    out = take_token_budget(df, budget=8)
    got = {r.doc_id: r.cum_tokens for r in out.collect()}
    assert len(got) == 2 and all(v <= 8 for v in got.values())
    assert 4 not in got
    # per-domain override lets B through
    out2 = take_token_budget(df, budget=8, budgets={"B": 10})
    assert 4 in {r.doc_id for r in out2.collect()}
    # determinism: same prefix on re-run
    assert got == {r.doc_id: r.cum_tokens for r in take_token_budget(df, budget=8).collect()}


# ------------------------------------------------------------------ c4


def test_c4_line_and_page_rules(spark):
    from dataframes_jl_spark.llm import c4_clean_lines, c4_keep

    rows = [
        (1, "This line has five good words.\nshort one\nAnother proper five word line!\nuses javascript so it drops."),
        (2, "lorem ipsum dolor sit amet. This otherwise fine sentence stays here. One more good sentence follows now."),
        (3, "function() { return 1; } This has sentences. Three of them here. And one more to spare."),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: (r.clean, r.keep) for r in df.select(
        "doc_id",
        c4_clean_lines("text").alias("clean"),
        c4_keep("text").alias("keep"),
    ).collect()}
    # doc 1: keeps the two punctuation-terminated >=5-word lines,
    # drops the short line and the javascript line
    assert out[1][0] == "This line has five good words.\nAnother proper five word line!"
    assert out[2][1] is False  # lorem ipsum page-level drop
    assert out[3][1] is False  # curly brace page-level drop


def test_kmeans_assign_np_matches_literal(spark):
    import random

    from dataframes_jl_spark.llm import kmeans_assign, kmeans_assign_np

    rng = random.Random(3)
    emb = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(200)],
        "vec_id bigint, embedding array<double>",
    )
    cents = [[rng.gauss(0, 1) for _ in range(8)] for _ in range(5)]
    lit = {r.vec_id: r.cluster for r in kmeans_assign(emb, cents).collect()}
    vec = {r.vec_id: r.cluster for r in kmeans_assign_np(emb, cents).collect()}
    assert lit == vec


def test_text_ops_null_safe(spark):
    from dataframes_jl_spark.llm import (
        c4_clean_lines,
        c4_keep,
        gopher_pass,
        take_token_budget,
        token_count,
    )

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "one two three")],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: (r.tc, r.gp, r.c4c, r.c4k)
        for r in df.select(
            "doc_id",
            token_count("text").alias("tc"),
            gopher_pass("text", min_words=2).alias("gp"),
            c4_clean_lines("text").alias("c4c"),
            c4_keep("text").alias("c4k"),
        ).collect()
    }
    assert got[1] == (0, False, "", False)  # NULL: never -1, never NULL flags
    assert got[2] == (0, False, "", False)
    assert got[3][0] == 3
    # a NULL-text doc must not INCREASE the remaining budget
    srcd = df.withColumn("source", F.lit("s"))
    kept = take_token_budget(srcd, budget=3)
    assert all(r.n_tokens >= 0 and r.cum_tokens >= 0 for r in kept.collect())


def test_quantize_roundtrip_and_zero_vector(spark):
    import math
    import random

    from dataframes_jl_spark.llm import dequantize, quantize_embeddings

    rng = random.Random(17)
    rows = [(i, [rng.uniform(-2, 2) for _ in range(16)]) for i in range(50)]
    rows.append((99, [0.0] * 16))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    q = quantize_embeddings(df, "vec_id", "embedding")
    out = q.select("vec_id", "qvec", "scale",
                   dequantize(F.col("qvec"), F.col("scale")).alias("d")).collect()
    orig = dict(rows)
    for r in out:
        if r.vec_id == 99:
            assert r.scale == 0.0 and all(v == 0 for v in r.qvec)
            continue
        assert all(-127 <= c <= 127 for c in r.qvec)
        # max abs reconstruction error <= scale/(2*127) per dim (half a step)
        step = r.scale / 127.0
        for a, b in zip(orig[r.vec_id], r.d):
            assert abs(a - b) <= step / 2 + 1e-12
    with __import__("pytest").raises(ValueError):
        quantize_embeddings(df, bits=1)


def test_quantized_rescore_topk_matches_exact(spark):
    import random

    from dataframes_jl_spark.llm import brute_force_topk, quantized_rescore_topk

    rng = random.Random(23)
    emb = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(32)]) for i in range(80)],
        "vec_id bigint, embedding array<double>",
    )
    probes = emb.filter("vec_id < 10")
    exact = {(r.query_id, r.rank): r.neighbor_id
             for r in brute_force_topk(probes, emb, k=3).collect()}
    quant = {(r.query_id, r.rank): r.neighbor_id
             for r in quantized_rescore_topk(probes, emb, k=3).collect()}
    # exact rescore over an int8 shortlist recovers the true top-3
    hits = sum(1 for key in exact if quant.get(key) == exact[key])
    assert hits / len(exact) >= 0.9


def test_ivf_large_quantizer_numpy_path(spark):
    from dataframes_jl_spark.llm import brute_force_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {(r.query_id, r.neighbor_id)
             for r in brute_force_topk(emb, emb, k=1).collect()}
    # n_centroids > 32 exercises the Arrow/numpy assignment+probe path
    approx = {(r.query_id, r.neighbor_id)
              for r in ivf_topk(emb, k=1, n_centroids=40, n_probe=8).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall > 0.6, f"large-quantizer IVF recall too low: {recall}"


def test_take_token_budget_huge_ids_no_ansi_overflow(spark):
    """ids >= 2^31 (replicated scale corpora) must not overflow the
    affine hash under ANSI mode (code-review finding)."""
    from dataframes_jl_spark.llm import take_token_budget

    rows = [(4_000_000_000 + i, "s", "a b c") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = take_token_budget(df, budget=9)
    assert out.count() == 3  # 3 tokens each, 9-token budget -> 3 docs


def test_assign_np_qdist_units_match_literal(spark):
    """cluster_profile must read the same dispersion from either
    assignment path (code-review finding: unit mismatch)."""
    import random

    from dataframes_jl_spark.llm import cluster_profile, kmeans_assign, kmeans_assign_np

    rng = random.Random(9)
    emb = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(100)],
        "vec_id bigint, embedding array<double>",
    )
    cents = [[rng.gauss(0, 1) for _ in range(8)] for _ in range(4)]
    lit = {r.cluster: (r.n_vecs, round(r.avg_dist2, 4))
           for r in cluster_profile(kmeans_assign(emb, cents)).collect()}
    vec = {r.cluster: (r.n_vecs, round(r.avg_dist2, 4))
           for r in cluster_profile(kmeans_assign_np(emb, cents)).collect()}
    assert lit == vec


def test_fuzzy_pairs_fixture_and_bruteforce(spark):
    """FastSS blocking must find EXACTLY the brute-force levenshtein
    pairs: a hand fixture (substitution, insertion, deletion, miss),
    then a randomized corpus cross-checked against the quadratic
    definition computed in-Spark."""
    import random

    from pyspark.sql import functions as F

    from dataframes_jl_spark.llm import fuzzy_pairs

    rows = [
        (1, "martha"),
        (2, "marhta"),   # transposition: dist 2 to martha, but dist 1
        #                  to marta (delete the h)
        (3, "marta"),    # deletion of 'h' -> dist 1 to martha
        (4, "martha"),   # exact dup -> dist 0
        (5, "zebra"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = sorted(
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_pairs(df, "id", "name", max_dist=1).collect()
    )
    assert got == [(1, 3, 1), (1, 4, 0), (2, 3, 1), (3, 4, 1)]

    rng = random.Random(17)
    words = [
        "".join(rng.choice("ab") for _ in range(rng.randint(3, 6)))
        for _ in range(60)
    ]
    corpus = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "id long, name string"
    )
    fast = sorted(
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_pairs(corpus, "id", "name", max_dist=1).collect()
    )
    # brute force via Spark's own levenshtein (same function verified)
    a = corpus.select(F.col("id").alias("id_a"), F.col("name").alias("na"))
    b = corpus.select(F.col("id").alias("id_b"), F.col("name").alias("nb"))
    brute = sorted(
        (r.id_a, r.id_b, r.dist)
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("na", "nb").cast("long"))
        .filter(F.col("dist") <= 1)
        .collect()
    )
    assert fast == brute


def test_fuzzy_pairs_depth2_and_guards(spark):
    """max_dist=2 catches the transposition the depth-1 pass cannot;
    over-long strings raise instead of exploding the block table."""
    import pytest
    from dataframes_jl_spark.llm import fuzzy_pairs

    df = spark.createDataFrame(
        [(1, "martha"), (2, "marhta")], "id long, name string"
    )
    got = fuzzy_pairs(df, "id", "name", max_dist=2).collect()
    assert [(r.id_a, r.id_b, r.dist) for r in got] == [(1, 2, 2)]

    long_df = spark.createDataFrame([(1, "x" * 300)], "id long, name string")
    with pytest.raises(Exception, match="max_len"):
        fuzzy_pairs(long_df, "id", "name", max_dist=1).collect()


def test_temperature_weights_limits(spark):
    """T=1 reproduces the natural mix (weight ~= 1 for every domain);
    higher T flattens: the heaviest domain's target share shrinks and
    the lightest grows, monotonically in T."""
    from dataframes_jl_spark.llm.mixture import temperature_weights

    rows = (
        [("big", "w " * 90)] * 10
        + [("mid", "w " * 9)] * 10
        + [("small", "w")] * 10
    )
    df = spark.createDataFrame(rows, "source string, text string")

    t1 = {r.source: r for r in temperature_weights(df, temperature=1.0).collect()}
    assert all(abs(r.weight - 1.0) < 1e-6 for r in t1.values())
    assert abs(sum(r.target_share for r in t1.values()) - 1.0) < 1e-9

    prev_big, prev_small = t1["big"].target_share, t1["small"].target_share
    for T in (2.0, 4.0, 16.0):
        tw = {r.source: r for r in temperature_weights(df, temperature=T).collect()}
        assert tw["big"].target_share < prev_big
        assert tw["small"].target_share > prev_small
        prev_big, prev_small = tw["big"].target_share, tw["small"].target_share
    # near-uniform at high T
    assert abs(prev_big - 1 / 3) < 0.05 and abs(prev_small - 1 / 3) < 0.05
