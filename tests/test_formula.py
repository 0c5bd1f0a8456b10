"""Formula/ModelMatrix tests (reference src/formula.jl semantics)."""

from __future__ import annotations

import pytest

from dataframes_jl_spark.formula import Formula, ModelFrame, model_matrix


def test_parse_basic():
    f = Formula.parse("y ~ a + b")
    assert f.lhs == "y" and f.rhs_terms == [("a",), ("b",)] and f.intercept


def test_parse_interaction_and_star():
    f = Formula.parse("y ~ a & b")
    assert f.rhs_terms == [("a", "b")]
    g = Formula.parse("y ~ a * b")
    assert g.rhs_terms == [("a",), ("b",), ("a", "b")]


def test_parse_intercept_removal():
    assert not Formula.parse("y ~ 0 + a").intercept
    assert not Formula.parse("y ~ a - 1").intercept


@pytest.fixture()
def mdf(spark):
    return spark.createDataFrame(
        [
            (1.0, 2.0, "red", 10.0),
            (2.0, 3.0, "green", 20.0),
            (3.0, 4.0, "blue", 30.0),
            (4.0, None, "green", 40.0),
        ],
        "y double, x double, c string, z double",
    )


def test_model_frame_na_omit(mdf):
    mf = ModelFrame.build("y ~ x + c", mdf)
    assert mf.df.count() == 3  # NA row dropped (reference :152-177)


def test_model_matrix_treatment_contrasts(mdf):
    mm = model_matrix("y ~ x + c", mdf)
    # base level 'blue' dropped; sorted levels blue<green<red
    assert mm.coefnames == ["(Intercept)", "x", "c:green", "c:red"]
    rows = {r.y: r for r in mm.df.collect()}
    assert rows[2.0]["c:green"] == 1.0 and rows[2.0]["c:red"] == 0.0
    assert rows[1.0]["c:red"] == 1.0
    assert all(r["(Intercept)"] == 1.0 for r in mm.df.collect())


def test_model_matrix_interaction_products(mdf):
    mm = model_matrix("y ~ x & z", mdf)
    assert mm.coefnames == ["(Intercept)", "x&z"]
    rows = {r.y: r for r in mm.df.collect()}
    assert rows[1.0]["x&z"] == 20.0  # 2*10


def test_model_matrix_star_expansion(mdf):
    mm = model_matrix("y ~ x * z", mdf)
    assert mm.coefnames == ["(Intercept)", "x", "z", "x&z"]


def test_categorical_interaction(mdf):
    mm = model_matrix("y ~ x & c", mdf)
    assert mm.coefnames == ["(Intercept)", "x&c:green", "x&c:red"]
    rows = {r.y: r for r in mm.df.collect()}
    assert rows[2.0]["x&c:green"] == 3.0


def test_factor_level_cap_fails_fast(spark, monkeypatch):
    """High-cardinality factors must fail loudly instead of collecting
    unbounded distinct levels to the driver."""
    import dataframes_jl_spark.formula as fmod

    df = spark.range(50).selectExpr(
        "CAST(id AS DOUBLE) AS y", "CAST(id AS STRING) AS c"
    )
    monkeypatch.setattr(fmod, "MAX_FACTOR_LEVELS", 10)
    with pytest.raises(ValueError, match="distinct levels"):
        model_matrix("y ~ c", df)
