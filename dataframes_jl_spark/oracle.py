"""DuckDB differential oracle harness.

Mirrors the driver's correctness gate: run each registry query on Spark
and its oracle SQL on DuckDB over the same parquet tables, then compare
row count, column names, and values order-insensitively.
"""

from __future__ import annotations

import math

from .session import TPCH_TABLES


def duckdb_run(sql: str, sf_dir: str):
    """Run oracle SQL with the parquet tables registered as views.

    Driver testdata ships each table as a single parquet FILE; the
    replicated scale sets (.scale_data/sf1, sf10) are Spark-written
    DIRECTORIES of part files — glob those so the same oracles replay
    at any scale point."""
    import os

    import duckdb

    con = duckdb.connect()
    for t in TPCH_TABLES:
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
        )
    return con.execute(sql).fetchdf()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _dtype_class(dtype: str) -> str:
    if dtype.startswith(("int", "uint")):
        return "int"
    if dtype.startswith("float"):
        return "float"
    if dtype.startswith("bool"):
        return "bool"
    return "obj"


def compare(spark_df, oracle_pdf, float_tol: float = 0.0) -> list[str]:
    """Return a list of mismatch descriptions (empty == match).

    STRICT by default: the driver's gate stringifies values before
    hashing, so ``5`` (int64) vs ``5.0`` (DuckDB HUGEINT→float64) is a
    driver failure even though the numbers are equal. We therefore flag
    dtype-class drift (int vs float vs bool) and compare values exactly
    (NaN==NaN aside). Pass ``float_tol>0`` only for diagnostics.
    """
    import pandas as pd

    problems: list[str] = []
    spark_pdf = spark_df.toPandas()

    s_cols = sorted(spark_pdf.columns)
    o_cols = sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        return [f"column mismatch: spark={s_cols} oracle={o_cols}"]

    for c in s_cols:
        sk = _dtype_class(str(spark_pdf[c].dtype))
        ok = _dtype_class(str(oracle_pdf[c].dtype))
        if sk != ok:
            problems.append(
                f"dtype class {c}: spark={spark_pdf[c].dtype} oracle={oracle_pdf[c].dtype}"
            )

    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")

    def canon(pdf: pd.DataFrame) -> list[tuple]:
        rows = []
        for rec in pdf[s_cols].itertuples(index=False, name=None):
            rows.append(tuple(_norm_cell(v) for v in rec))
        return sorted(rows, key=lambda r: tuple(str(x) for x in r))

    s_rows, o_rows = canon(spark_pdf), canon(oracle_pdf)
    n_bad = 0
    for i, (sr, orr) in enumerate(zip(s_rows, o_rows)):
        if sr == orr:
            continue
        ok = len(sr) == len(orr)
        if ok:
            for a, b in zip(sr, orr):
                if a == b:
                    continue
                if (
                    float_tol > 0
                    and isinstance(a, (int, float))
                    and isinstance(b, (int, float))
                    and not isinstance(a, bool)
                    and not isinstance(b, bool)
                    and math.isclose(float(a), float(b), rel_tol=float_tol, abs_tol=float_tol)
                ):
                    continue
                ok = False
                break
        if not ok:
            n_bad += 1
            if n_bad <= 3:
                problems.append(f"row {i}: spark={sr} oracle={orr}")
    if n_bad > 3:
        problems.append(f"... {n_bad} mismatched rows total")
    return problems
