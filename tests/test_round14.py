"""Round-14 regression units: degenerate conformal split THROUGH the
DuckDB oracle gate, stratified-sample NULL-stratum / integer-threshold
contracts, bench_median round detection."""

from __future__ import annotations

import pandas as pd
import pytest

from dataframes_jl_spark.oracle import compare

from conftest import SF_DIR


def test_split_conformal_degenerate_split_through_oracle_gate(spark):
    """Round-13 advice #4: the empty-evaluation-half contract (one row,
    n_test=0, coverage NULL, calibration stats intact) must be
    certifiable through the SAME differential gate the driver runs —
    Spark result vs a DuckDB oracle that mirrors the degenerate branch
    (ungrouped eval aggregate re-attached to the calibration meta row,
    never a vanished output row)."""
    import duckdb

    from dataframes_jl_spark.functions.stats import split_conformal
    from dataframes_jl_spark.ops.sampling import split_bucket_sql

    rows = [(i, float(i), float(i) + (i % 3) * 0.5) for i in range(40)]
    sdf = spark.createDataFrame(rows, "key long, y double, yhat double")
    out = split_conformal(
        sdf, "y", "yhat", "key", alpha=0.2, calib_frac=0.999, buckets=2
    )

    con = duckdb.connect()
    con.register(
        "t", pd.DataFrame(rows, columns=["key", "y", "yhat"])
    )
    b = split_bucket_sql("key", 2)
    cut = int(round(0.999 * 2))  # = 2: every bucket is calibration
    oracle = f"""
    WITH base AS (
      SELECT CAST(FLOOR(ABS(y - yhat) * 1e6 + 0.5) AS BIGINT) AS r,
             {b} < {cut} AS is_cal
      FROM t WHERE y IS NOT NULL AND yhat IS NOT NULL
    ),
    cal AS (
      SELECT r, CAST(COUNT(*) AS BIGINT) AS cnt FROM base WHERE is_cal GROUP BY 1
    ),
    run AS (
      SELECT r, CAST(SUM(cnt) OVER (ORDER BY r) AS BIGINT) AS cum FROM cal
    ),
    tot AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n_cal,
             CAST(CEIL((CAST(SUM(cnt) AS DOUBLE) + 1.0) * 0.8) AS BIGINT) AS k
      FROM cal
    ),
    q AS (SELECT MIN(r) AS q_unit FROM run, tot WHERE cum >= k),
    ev AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(COALESCE(SUM(CASE WHEN b.r <= q.q_unit THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS n_cov
      FROM base b, q WHERE NOT b.is_cal
    )
    SELECT t.n_cal, ev.n_test, t.k,
           FLOOR(CAST(q.q_unit AS DOUBLE) / 1e6 * 1e6 + 0.5) / 1e6 AS q_hat,
           CASE WHEN q.q_unit IS NOT NULL AND ev.n_test > 0 THEN
             FLOOR(CAST(ev.n_cov AS DOUBLE) / CAST(ev.n_test AS DOUBLE)
                   * 1e6 + 0.5) / 1e6 END AS coverage
    FROM tot t, q, ev
    """
    pdf = con.execute(oracle).fetchdf()
    assert len(pdf) == 1 and pdf["n_test"][0] == 0
    problems = compare(out, pdf)
    assert not problems, problems


def test_stratified_sample_null_stratum_first_class(spark):
    """Round-13 advice #1: NULL strata must receive their own exact
    floor(frac*n_NULL) allocation (null-safe offset join), not vanish
    through the equi-join."""
    from pyspark.sql import functions as F

    from dataframes_jl_spark.ops.sampling import stratified_sample

    rows = [(i, None if i % 2 == 0 else "A") for i in range(40)]
    df = spark.createDataFrame(rows, "key long, s string")
    out = stratified_sample(df, "s", 0.5, "key")
    got = {
        r["s"]: r["n"]
        for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()
    }
    assert got == {None: 10, "A": 10}


def test_stratified_sample_integer_threshold_exact_floor(spark):
    """Round-13 advice #2: frac=0.7 on a 10-row stratum keeps exactly
    7 rows (floor(0.7*10) in rational arithmetic), where the IEEE
    double floor(6.999...96) would keep 6."""
    from pyspark.sql import functions as F

    from dataframes_jl_spark.ops.sampling import stratified_sample

    df = spark.createDataFrame(
        [(i, "g") for i in range(10)], "key long, s string"
    )
    out = stratified_sample(df, "s", 0.7, "key")
    assert out.count() == 7


def test_bench_median_round_resolution(tmp_path):
    """Round-13 advice #3 'Done' unit: the wrapper's target slot is
    latest driver BENCH_r{N} + 1 regardless of what BENCH_LOCAL files
    exist, and vs_prior resolution never self-references — a
    pre-existing current-round local record must not shadow the prior
    round."""
    import importlib.util
    import json as _json
    import os
    import sys

    spec = importlib.util.spec_from_file_location(
        "bench_median",
        os.path.join(os.path.dirname(__file__), "..", "tools", "bench_median.py"),
    )
    bm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bm)

    base = str(tmp_path)
    # driver records through r13; local records through r14 (the
    # "current round's record already exists" hazard)
    for rn in (12, 13):
        (tmp_path / f"BENCH_r{rn:02d}.json").write_text("{}")
    for rn in (13, 14):
        (tmp_path / f"BENCH_LOCAL_r{rn:02d}.json").write_text(
            _json.dumps({"value": rn})
        )

    target = bm._target_round(base)
    assert target == 14  # latest driver record + 1, NOT local max + 1

    recs = bm._local_records(base)
    assert set(recs) == {13, 14}
    # the wrapper's prior rule: newest round STRICTLY BELOW the target
    priors = [r for r in recs if r < target]
    assert max(priors) == 13


# ---------------------------------------------------------------------------
# round-14 operators
# ---------------------------------------------------------------------------


def test_spearman_footrule_reversal_and_identity(spark):
    """Reversed ranking: F = n^2/2 for even n (here 4 -> 8), norm 1.0;
    identical ranking: F = 0, norm 0.0."""
    from dataframes_jl_spark.functions.ranking import spearman_footrule

    rev = spark.createDataFrame(
        [(i, float(i), float(-i)) for i in range(1, 5)],
        "id long, a double, b double",
    )
    r = spearman_footrule(rev, "a", "b", "id").collect()[0]
    assert (r["n"], r["footrule"], r["norm_footrule"]) == (4, 8, 1.0)

    same = spark.createDataFrame(
        [(i, float(i), float(i)) for i in range(1, 6)],
        "id long, a double, b double",
    )
    r = spearman_footrule(same, "a", "b", "id").collect()[0]
    assert (r["n"], r["footrule"], r["norm_footrule"]) == (5, 0, 0.0)


def test_rbo_identical_and_disjoint(spark):
    """Identical lists at k=10, p=0.9: RBO = 1 - p^k = 0.651322
    (closed form); disjoint prefixes: n_joint 0, rbo 0.0."""
    from dataframes_jl_spark.functions.ranking import rbo_topk

    same = spark.createDataFrame(
        [(i, float(100 - i), float(100 - i)) for i in range(1, 21)],
        "id long, a double, b double",
    )
    r = rbo_topk(same, "a", "b", "id", k=10, p=0.9).collect()[0]
    assert r["n_joint"] == 10
    assert r["rbo"] == pytest.approx(1.0 - 0.9**10, abs=2e-6)

    # a ranks ids 1..4 on top; b ranks 5..8 on top (k=2 prefixes disjoint)
    disj = spark.createDataFrame(
        [(i, float(10 - i), float(i)) for i in range(1, 9)],
        "id long, a double, b double",
    )
    r = rbo_topk(disj, "a", "b", "id", k=2, p=0.9).collect()[0]
    assert (r["n_joint"], r["rbo"]) == (0, 0.0)


def test_hodges_lehmann_hand_checks(spark):
    """Odd pair-count median and the even-N midpoint convention."""
    from dataframes_jl_spark.functions.stats import hodges_lehmann_shift

    a = spark.createDataFrame([(float(x),) for x in [1, 2, 3, 4, 5]], "v double")
    b = spark.createDataFrame([(float(x),) for x in [3, 4, 5, 6, 7]], "v double")
    r = hodges_lehmann_shift(a, b, "v").collect()[0]
    assert (r["n_a"], r["n_b"], r["n_pairs"], r["hl_shift"]) == (5, 5, 25.0, -2.0)

    # even N: diffs of {1,2} x {1,3} = [-2,-1,0,1] -> (-1+0)/2 = -0.5
    a2 = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    b2 = spark.createDataFrame([(1.0,), (3.0,)], "v double")
    r = hodges_lehmann_shift(a2, b2, "v").collect()[0]
    assert (r["n_pairs"], r["hl_shift"]) == (4.0, -0.5)


def test_containment_lsh_equals_exact_on_testdata(spark):
    """The LSH lane must reproduce the exact containment pair set on
    the near-dup corpus (recall-1 regime: every containment-0.8 pair
    has jaccard >= 0.8 here, candidate probability 1-6e-15)."""
    from dataframes_jl_spark.llm.dedup import (
        containment_pairs,
        containment_pairs_lsh,
    )

    docs = spark.read.parquet(SF_DIR + "/documents.parquet")
    exact = set(
        map(tuple, containment_pairs(docs, "doc_id", "text", n=3, threshold=0.8).collect())
    )
    lsh = set(
        map(tuple, containment_pairs_lsh(docs, "doc_id", "text", n=3, threshold=0.8).collect())
    )
    assert lsh == exact and len(exact) > 0


def test_dsir_weights_hand_corpus(spark):
    """Hand corpus replayed with the same integer quantization in
    Python: vocab = top-2 raw tokens (count desc, token asc) = {c, a};
    b falls to the OOV bucket; every per-token log-ratio is
    floor(ln(p)*1e9+0.5) int64."""
    import math

    from dataframes_jl_spark.llm.mixture import dsir_weights

    target = spark.createDataFrame([(0, "a a b")], "doc_id long, text string")
    raw = spark.createDataFrame(
        [(1, "a b c"), (2, "c c"), (3, None), (4, "   ")],
        "doc_id long, text string",
    )
    out = {
        r["id"]: (r["n_tok"], r["log_weight"])
        for r in dsir_weights(target, raw, "doc_id", "text", vocab_size=2).collect()
    }

    def q(x):
        return math.floor(math.log(x) * 1e9 + 0.5)

    V1 = 3.0  # vocab_size + 1
    n_t, n_r = 3.0, 5.0
    lr_a = q(3.0 / (n_t + V1)) - q(2.0 / (n_r + V1))
    lr_c = q(1.0 / (n_t + V1)) - q(4.0 / (n_r + V1))
    lr_oov = q(2.0 / (n_t + V1)) - q(2.0 / (n_r + V1))  # b

    def out_q(units):
        return math.floor(units / 1e9 * 1e6 + 0.5) / 1e6

    assert out[1] == (3, out_q(lr_a + lr_oov + lr_c))
    assert out[2] == (2, out_q(2 * lr_c))
    # NULL / whitespace-only docs: zero evidence, weight 0
    assert out[3] == (0, 0.0)
    assert out[4] == (0, 0.0)


def test_dsir_weights_target_lookalike_scores_higher(spark):
    """Directionality: a raw doc made of target-typical tokens must
    outscore one made of raw-typical tokens."""
    from dataframes_jl_spark.llm.mixture import dsir_weights

    target = spark.createDataFrame(
        [(i, "quality prose " * 5) for i in range(10)],
        "doc_id long, text string",
    )
    raw_rows = [(i, "quality prose " * 5) for i in range(5)] + [
        (100 + i, "spam junk " * 5) for i in range(50)
    ]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    w = {
        r["id"]: r["log_weight"]
        for r in dsir_weights(target, raw, "doc_id", "text", vocab_size=4).collect()
    }
    assert w[0] > w[100]


def test_theils_u_deterministic_and_independent(spark):
    """b determines a exactly -> U(a|b) = 1 both ways on a bijective
    map; independent columns -> U ~ 0."""
    from dataframes_jl_spark.functions.infotheory import theils_u

    det = spark.createDataFrame(
        [("x", "p"), ("x", "p"), ("y", "q"), ("y", "q"), ("z", "r")],
        "a string, b string",
    )
    r = det.transform(lambda d: theils_u(d, "a", "b")).collect()[0]
    assert r["u_a_given_b"] == 1.0 and r["u_b_given_a"] == 1.0

    # independent: every (a, b) combination equally likely -> MI = 0
    ind = spark.createDataFrame(
        [(x, y) for x in "xy" for y in "pq" for _ in range(5)],
        "a string, b string",
    )
    r = theils_u(ind, "a", "b").collect()[0]
    assert abs(r["u_symmetric"]) < 1e-6


def test_theils_u_asymmetry(spark):
    """Direction: a (fine) determines b (coarse) but not vice versa ->
    U(b|a) = 1 while U(a|b) < 1."""
    from dataframes_jl_spark.functions.infotheory import theils_u

    rows = [("a1", "g1"), ("a2", "g1"), ("a3", "g2"), ("a4", "g2")]
    df = spark.createDataFrame(rows * 3, "a string, b string")
    r = theils_u(df, "a", "b").collect()[0]
    assert r["u_b_given_a"] == 1.0
    assert r["u_a_given_b"] < 1.0


def test_krippendorff_alpha_hand_cases(spark):
    """Perfect agreement -> 1.0; systematic disagreement (every unit
    split A/B) -> the textbook -0.5; single-rating units drop out."""
    from dataframes_jl_spark.functions.infotheory import krippendorff_alpha

    perfect = spark.createDataFrame(
        [(1, "A"), (1, "A"), (2, "B"), (2, "B"), (3, "A"), (3, "A"),
         (9, "Z")],  # single rating: excluded
        "u long, c string",
    )
    r = krippendorff_alpha(perfect, "u", "c").collect()[0]
    assert (r["n_units"], r["n_ratings"], r["alpha"]) == (3, 6, 1.0)

    disagree = spark.createDataFrame(
        [(1, "A"), (1, "B"), (2, "A"), (2, "B")], "u long, c string"
    )
    r = krippendorff_alpha(disagree, "u", "c").collect()[0]
    assert r["alpha"] == -0.5

    # degenerate: one label everywhere -> D_e = 0 -> NULL, not 1.0
    const = spark.createDataFrame(
        [(1, "A"), (1, "A"), (2, "A"), (2, "A")], "u long, c string"
    )
    r = krippendorff_alpha(const, "u", "c").collect()[0]
    assert r["alpha"] is None
