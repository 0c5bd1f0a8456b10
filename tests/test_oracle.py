"""Differential correctness: every registry query vs its DuckDB oracle,
replicating the driver's gate locally (sf0.01 by default)."""

from __future__ import annotations

import pytest

from dataframes_jl_spark.oracle import compare, duckdb_run
from dataframes_jl_spark.queries import ORACLES, QUERIES

from conftest import SF_DIR_ORACLE


def _query_names():
    return sorted(QUERIES.keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_vs_oracle(spark, name):
    q = QUERIES[name]
    sdf = q(spark, SF_DIR_ORACLE)
    assert sdf.columns, f"{name}: empty schema"
    if name not in ORACLES:
        # rows-only check for non-SQL-expressible ops (driver does the same)
        assert sdf.count() >= 0
        return
    opdf = duckdb_run(ORACLES[name], SF_DIR_ORACLE)
    problems = compare(sdf, opdf)
    assert not problems, f"{name}: " + "; ".join(problems)
