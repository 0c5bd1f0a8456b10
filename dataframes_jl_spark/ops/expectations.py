"""Declarative data-quality expectations evaluated in one pass — the
publish gate a 100 TB ingest runs before promoting a partition.

Beyond-reference operator (the reference's validation surface stops at
``findcorruption``'s CSV-level checks — reference src/io.jl; this is
the table-level contract layer built on top): a rule list compiles to
ONE map-side-combining aggregate over the frame — every row-predicate
rule (not_null / in_range / accepted_values / matches) is a
conditional counter in the same aggregate row, ``unique`` rides the
same pass as ``count - count_distinct``, and only ``foreign_key``
rules cost extra jobs (one broadcast-or-SMJ anti-join count each,
over the DISTINCT child keys — |keys| rows move, never |rows|).

The report is the inline-unpivoted rule table
``(rule, column, n_checked, n_violations, passed)`` — bounded by the
rule count, so a gate can ``.collect()`` it. Conventions: NULL rows
are counted as CHECKED but not violating for value rules (a NULL
discount is a completeness problem, which ``not_null`` owns — double-
billing one row to two rules makes reports unactionable); ``unique``
and ``foreign_key`` check non-NULL keys only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def not_null(column: str) -> dict:
    return {"rule": "not_null", "column": column}


def in_range(column: str, lo, hi) -> dict:
    return {"rule": "in_range", "column": column, "lo": lo, "hi": hi}


def accepted_values(column: str, values: list) -> dict:
    return {"rule": "accepted_values", "column": column, "values": list(values)}


def matches(column: str, pattern: str) -> dict:
    return {"rule": "matches", "column": column, "pattern": pattern}


def unique(columns: list[str] | str) -> dict:
    cols = [columns] if isinstance(columns, str) else list(columns)
    return {"rule": "unique", "column": ",".join(cols), "columns": cols}


def foreign_key(column: str, parent: DataFrame, pk: str) -> dict:
    return {"rule": "foreign_key", "column": column, "parent": parent, "pk": pk}


def _violation_pred(r: dict):
    c = F.col(r["column"])
    if r["rule"] == "not_null":
        return c.isNull()
    if r["rule"] == "in_range":
        # NULL -> not a violation here (not_null owns completeness)
        return c.isNotNull() & ((c < F.lit(r["lo"])) | (c > F.lit(r["hi"])))
    if r["rule"] == "accepted_values":
        return c.isNotNull() & ~c.isin(*r["values"])
    if r["rule"] == "matches":
        return c.isNotNull() & ~c.rlike(r["pattern"])
    raise ValueError(f"unknown row rule {r['rule']}")


def expect(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate ``rules`` (built with this module's constructors)
    against ``df``; returns the bounded report frame (module doc)."""
    if not rules:
        raise ValueError("expect() needs at least one rule")
    row_rules = [r for r in rules if r["rule"] not in ("unique", "foreign_key")]
    uni_rules = [r for r in rules if r["rule"] == "unique"]
    fk_rules = [r for r in rules if r["rule"] == "foreign_key"]

    aggs = [F.count(F.lit(1)).alias("__n__")]
    for i, r in enumerate(row_rules):
        aggs.append(
            F.count(F.when(_violation_pred(r), F.lit(1))).alias(f"__v{i}__")
        )
    for j, r in enumerate(uni_rules):
        key = [F.col(c) for c in r["columns"]]
        nn = F.struct(*key)
        all_nn = None
        for c in r["columns"]:
            cond = F.col(c).isNotNull()
            all_nn = cond if all_nn is None else (all_nn & cond)
        aggs.append(F.count(F.when(all_nn, F.lit(1))).alias(f"__uc{j}__"))
        aggs.append(
            F.count_distinct(F.when(all_nn, nn)).alias(f"__ud{j}__")
        )
    one = df.agg(*aggs)

    entries = []
    for i, r in enumerate(row_rules):
        entries.append(
            F.struct(
                F.lit(r["rule"]).alias("rule"),
                F.lit(r["column"]).alias("column"),
                F.col("__n__").alias("n_checked"),
                F.col(f"__v{i}__").alias("n_violations"),
            )
        )
    for j, r in enumerate(uni_rules):
        entries.append(
            F.struct(
                F.lit("unique").alias("rule"),
                F.lit(r["column"]).alias("column"),
                F.col(f"__uc{j}__").alias("n_checked"),
                (F.col(f"__uc{j}__") - F.col(f"__ud{j}__")).alias(
                    "n_violations"
                ),
            )
        )
    report = one.select(F.explode(F.array(*entries)).alias("e")).select(
        "e.rule", "e.column", "e.n_checked", "e.n_violations"
    )

    for r in fk_rules:
        child_keys = (
            df.filter(F.col(r["column"]).isNotNull())
            .select(F.col(r["column"]).alias("__k__"))
        )
        n_checked = child_keys.groupBy().agg(F.count(F.lit(1)).alias("nc"))
        # DISTINCT keys anti-join the parent: |keys| rows move, and the
        # missing-key count weights each by its child multiplicity
        per_key = child_keys.groupBy("__k__").agg(
            F.count(F.lit(1)).alias("mult")
        )
        parent_keys = (
            r["parent"]
            .filter(F.col(r["pk"]).isNotNull())
            .select(F.col(r["pk"]).alias("__pk__"))
            .distinct()
        )
        missing = (
            per_key.join(
                parent_keys, F.col("__k__") == F.col("__pk__"), "left_anti"
            )
            .groupBy()
            .agg(F.coalesce(F.sum("mult"), F.lit(0)).alias("nv"))
        )
        fk_row = n_checked.crossJoin(F.broadcast(missing)).select(
            F.lit("foreign_key").alias("rule"),
            F.lit(r["column"]).alias("column"),
            F.col("nc").alias("n_checked"),
            F.col("nv").alias("n_violations"),
        )
        report = report.unionByName(fk_row)

    return report.select(
        "rule",
        "column",
        "n_checked",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )
