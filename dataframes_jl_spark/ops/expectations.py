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
    against ``df``; returns the bounded report frame (module doc).

    Plan shape (r16, guide §2.3 "aggregate before you shuffle"): the
    row-predicate rules compile to ONE aggregate of pure conditional
    counters — map-side partial combine, a 1-row exchange. ``unique``
    and ``foreign_key`` rules no longer ride that aggregate as
    ``count_distinct`` (two distinct key-sets forced an Expand xN
    re-shuffle of every row) nor pay a private per-rule exchange:
    all key rules sharing a LEAD column fold over one
    ``groupBy(lead)`` pre-aggregate — |distinct keys| rows move once,
    uniqueness counts and the FK anti-join both read that table.
    Counting semantics are unchanged: unique/foreign_key check
    non-NULL keys only; a composite unique counts rows where EVERY
    key column is non-NULL."""
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
    one = df.agg(*aggs)

    # ---- key rules: one per-lead-column aggregate serves every
    # unique() and foreign_key() on that lead column -----------------
    leads: list[str] = []
    for r in uni_rules:
        if r["columns"][0] not in leads:
            leads.append(r["columns"][0])
    for r in fk_rules:
        if r["column"] not in leads:
            leads.append(r["column"])

    fold_frames = []  # 1-row frames crossJoined into `one`
    fk_cols: dict[int, tuple[str, str]] = {}  # fk idx -> (nc, nv) col names
    for li, lead in enumerate(leads):
        my_unis = [
            (j, r) for j, r in enumerate(uni_rules) if r["columns"][0] == lead
        ]
        my_fks = [
            (i, r) for i, r in enumerate(fk_rules) if r["column"] == lead
        ]
        key_aggs = [F.count(F.lit(1)).alias("__mult__")]
        for j, r in my_unis:
            rest = r["columns"][1:]
            if rest:
                all_nn = None
                for c in rest:
                    cond = F.col(c).isNotNull()
                    all_nn = cond if all_nn is None else (all_nn & cond)
                key_aggs.append(
                    F.count(F.when(all_nn, F.lit(1))).alias(f"__kc{j}__")
                )
                key_aggs.append(
                    F.count_distinct(
                        F.when(all_nn, F.struct(*[F.col(c) for c in rest]))
                    ).alias(f"__kd{j}__")
                )
        per_key = (
            df.filter(F.col(lead).isNotNull())
            .groupBy(F.col(lead).alias("__k__"))
            .agg(*key_aggs)
        )
        fold_aggs = [F.sum("__mult__").alias(f"__nn{li}__"),
                     F.count(F.lit(1)).alias(f"__nk{li}__")]
        for j, r in my_unis:
            if r["columns"][1:]:
                fold_aggs.append(F.sum(f"__kc{j}__").alias(f"__uc{j}__"))
                fold_aggs.append(F.sum(f"__kd{j}__").alias(f"__ud{j}__"))
        fold_frames.append(per_key.agg(*fold_aggs))
        for i, r in my_fks:
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
                .agg(
                    F.coalesce(F.sum("__mult__"), F.lit(0)).alias(
                        f"__fknv{i}__"
                    )
                )
            )
            fk_cols[i] = (f"__nn{li}__", f"__fknv{i}__")
            fold_frames.append(missing)

    for ff in fold_frames:
        one = one.crossJoin(F.broadcast(ff))

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
        li = leads.index(r["columns"][0])
        if r["columns"][1:]:
            nc = F.col(f"__uc{j}__")
            nv = F.col(f"__uc{j}__") - F.col(f"__ud{j}__")
        else:
            nc = F.col(f"__nn{li}__")
            nv = F.col(f"__nn{li}__") - F.col(f"__nk{li}__")
        entries.append(
            F.struct(
                F.lit("unique").alias("rule"),
                F.lit(r["column"]).alias("column"),
                F.coalesce(nc, F.lit(0)).alias("n_checked"),
                F.coalesce(nv, F.lit(0)).alias("n_violations"),
            )
        )
    for i, r in enumerate(fk_rules):
        nc_col, nv_col = fk_cols[i]
        entries.append(
            F.struct(
                F.lit("foreign_key").alias("rule"),
                F.lit(r["column"]).alias("column"),
                F.coalesce(F.col(nc_col), F.lit(0)).alias("n_checked"),
                F.col(nv_col).alias("n_violations"),
            )
        )
    report = one.select(F.explode(F.array(*entries)).alias("e")).select(
        "e.rule", "e.column", "e.n_checked", "e.n_violations"
    )

    return report.select(
        "rule",
        "column",
        "n_checked",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )
