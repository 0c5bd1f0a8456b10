"""Round-14 regression units: degenerate conformal split THROUGH the
DuckDB oracle gate, stratified-sample NULL-stratum / integer-threshold
contracts, bench_median round detection."""

from __future__ import annotations

import pandas as pd

from dataframes_jl_spark.oracle import compare


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
