"""Streaming lane for the declarative expectations gate — the
incremental publish gate a 100 TB ingest runs WHILE loading, with
verdicts identical to the batch :func:`~dataframes_jl_spark.ops.
expectations.expect` over the same rows.

Beyond-reference operator (the reference's validation surface stops at
``findcorruption``'s CSV-level checks — reference src/io.jl; the batch
contract layer is ops/expectations.py and this is its streaming twin).

Why a stateful lane instead of a streaming aggregate: every ROW rule
(not_null / in_range / accepted_values / matches) and every
FOREIGN-KEY rule against a static parent is row-local, so its counters
are plain sums — but ``unique`` is a cross-row property, and Spark
disallows distinct aggregation on streams. The state layer makes
uniqueness exact with the repo's standard sharding trick
(streaming/topk.py, distinct.py): keys hash into ``shards`` substreams
so each key lives in exactly ONE shard's state, per-shard duplicate
counts are exact, and shard summaries SUM. State is O(|distinct
unique-rule keys|) — the same asymptotics the batch count_distinct
shuffle pays, inherent to exact uniqueness — while row-rule state is
O(shards · rules), constant.

One ``applyInPandasWithState`` over a UNION of lanes keyed by
``(rule_id, shard)``:

- the ``rows`` lane carries one row per input row with two boolean
  arrays (checked, violated) — one slot per row/FK rule, FK violation
  flags pre-computed by a stream-static broadcast left join against
  the parent's distinct keys (each emitted rule_id ``r{i}``/``f{k}``);
- each ``unique`` rule ``u{j}`` gets a key-affine lane carrying the
  key's string form.

Each micro-batch the touched groups emit CUMULATIVE rows
``(rule_id, shard, n_checked, n_violations)`` (outputMode update).
All four counters are monotone, so the consumer-side
:func:`merge_expectation_snapshots` keeps the latest emission per
(rule_id, shard) — max of the (n_checked, n_violations) struct — sums
over shards, and labels rule_ids back to (rule, column) from the same
rule list: batch-identical verdicts at any point in the stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..ops.expectations import _violation_pred

EXP_SCHEMA = "rule_id string, shard int, n_checked long, n_violations long"
_EXP_STATE_SCHEMA = "ncs array<long>, nvs array<long>, keys array<string>, n bigint"


def _split_rules(rules: list[dict]):
    row_rules = [r for r in rules if r["rule"] not in ("unique", "foreign_key")]
    uni_rules = [r for r in rules if r["rule"] == "unique"]
    fk_rules = [r for r in rules if r["rule"] == "foreign_key"]
    return row_rules, uni_rules, fk_rules


def rule_labels(rules: list[dict]) -> list[tuple[str, str, str]]:
    """Stable ``(rule_id, rule, column)`` labels for a rule list —
    the contract shared by the stream emissions and the merge."""
    row_rules, uni_rules, fk_rules = _split_rules(rules)
    out = [(f"r{i}", r["rule"], r["column"]) for i, r in enumerate(row_rules)]
    out += [(f"f{k}", "foreign_key", r["column"]) for k, r in enumerate(fk_rules)]
    out += [(f"u{j}", "unique", r["column"]) for j, r in enumerate(uni_rules)]
    return out


def expect_stream(
    stream: DataFrame,
    rules: list[dict],
    shards: int = 32,
) -> DataFrame:
    """Evaluate ``rules`` incrementally over a streaming DataFrame
    (module doc). Returns the update stream of cumulative per-(rule,
    shard) counter snapshots; reduce with
    :func:`merge_expectation_snapshots`."""
    if not rules:
        raise ValueError("expect_stream() needs at least one rule")
    if shards < 1:
        raise ValueError("shards must be >= 1")
    row_rules, uni_rules, fk_rules = _split_rules(rules)
    n_flags = len(row_rules) + len(fk_rules)

    lanes: list[DataFrame] = []
    if n_flags:
        work = stream
        fk_flag_cols: list[str] = []
        for k, r in enumerate(fk_rules):
            pk = f"__pk{k}__"
            parent_keys = (
                r["parent"]
                .filter(F.col(r["pk"]).isNotNull())
                .select(F.col(r["pk"]).alias(pk))
                .distinct()
            )
            # stream-static broadcast left join: the parent key set is
            # a dimension — bounded — so each micro-batch pays a map-
            # side hash probe, never a shuffle of the stream
            work = work.join(
                F.broadcast(parent_keys),
                F.col(r["column"]) == F.col(pk),
                "left_outer",
            )
            fk_flag_cols.append(pk)
        checked = [F.lit(True) for _ in row_rules] + [
            F.col(r["column"]).isNotNull() for r in fk_rules
        ]
        violated = [
            F.coalesce(_violation_pred(r), F.lit(False)) for r in row_rules
        ] + [
            F.col(r["column"]).isNotNull() & F.col(pk).isNull()
            for r, pk in zip(fk_rules, fk_flag_cols)
        ]
        involved = sorted(
            {r["column"] for r in row_rules} | {r["column"] for r in fk_rules}
        )
        rows_lane = work.select(
            F.lit("rows").alias("rid"),
            F.pmod(
                F.xxhash64(*[F.col(c).cast("string") for c in involved]),
                F.lit(shards),
            )
            .cast("int")
            .alias("shard"),
            F.array(*checked).alias("chk"),
            F.array(*violated).alias("vio"),
            F.lit(None).cast("string").alias("ukey"),
        )
        lanes.append(rows_lane)
    for j, r in enumerate(uni_rules):
        all_nn = None
        for c in r["columns"]:
            cond = F.col(c).isNotNull()
            all_nn = cond if all_nn is None else (all_nn & cond)
        keystr = F.concat_ws(
            "\x1f", *[F.col(c).cast("string") for c in r["columns"]]
        )
        # key-affine sharding: a key's every occurrence lands in the
        # same shard, so per-shard duplicate counts are exact and sum
        lanes.append(
            stream.filter(all_nn).select(
                F.lit(f"u{j}").alias("rid"),
                F.pmod(F.xxhash64(keystr), F.lit(shards))
                .cast("int")
                .alias("shard"),
                F.lit(None).cast("array<boolean>").alias("chk"),
                F.lit(None).cast("array<boolean>").alias("vio"),
                keystr.alias("ukey"),
            )
        )
    if not lanes:
        raise ValueError("expect_stream(): rules compiled to no lanes")
    unioned = lanes[0]
    for ln in lanes[1:]:
        unioned = unioned.unionByName(ln)

    labels = rule_labels(rules)
    flag_ids = [rid for rid, rule, _ in labels if rule != "unique"]

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rid, shard = key
        if rid == "rows":
            if state.exists:
                ncs, nvs, _, _ = state.get
                ncs, nvs = list(ncs), list(nvs)
            else:
                ncs, nvs = [0] * n_flags, [0] * n_flags
            for pdf in pdfs:
                for i in range(n_flags):
                    ncs[i] += int(sum(bool(a[i]) for a in pdf["chk"]))
                    nvs[i] += int(sum(bool(a[i]) for a in pdf["vio"]))
            state.update((ncs, nvs, [], 0))
            yield pd.DataFrame(
                {
                    "rule_id": flag_ids,
                    "shard": shard,
                    "n_checked": ncs,
                    "n_violations": nvs,
                }
            )
        else:
            if state.exists:
                _, _, keys, n = state.get
                seen = set(keys)
                n = int(n)
            else:
                seen, n = set(), 0
            for pdf in pdfs:
                vals = pdf["ukey"].dropna()
                n += int(len(vals))
                seen.update(vals.tolist())
            state.update(([], [], list(seen), n))
            yield pd.DataFrame(
                {
                    "rule_id": [rid],
                    "shard": [shard],
                    "n_checked": [n],
                    "n_violations": [n - len(seen)],
                }
            )

    return unioned.groupBy("rid", "shard").applyInPandasWithState(
        fn,
        outputStructType=EXP_SCHEMA,
        stateStructType=_EXP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def merge_expectation_snapshots(
    snapshots: DataFrame, rules: list[dict]
) -> DataFrame:
    """Batch helper: reduce an accumulated update-stream sink (several
    cumulative emissions per (rule_id, shard)) to the batch-shaped
    report ``(rule, column, n_checked, n_violations, passed)``.

    Every counter is monotone per (rule_id, shard), so the latest
    emission is the max of the (n_checked, n_violations) struct; shard
    totals then SUM (row lanes: disjoint row subsets; unique lanes:
    each key owned by one shard). Labels come from the same rule list
    the stream compiled, via a broadcast join of the bounded rule
    table — output is rule-count-bounded, collect()-safe."""
    spark = SparkSession.getActiveSession() or snapshots.sparkSession
    latest = snapshots.groupBy("rule_id", "shard").agg(
        F.max(F.struct("n_checked", "n_violations")).alias("s")
    )
    per_rule = latest.groupBy("rule_id").agg(
        F.sum("s.n_checked").alias("n_checked"),
        F.sum("s.n_violations").alias("n_violations"),
    )
    lab = spark.createDataFrame(
        rule_labels(rules), "rule_id string, rule string, column string"
    ).withColumnRenamed("rule_id", "__rid__")
    return (
        per_rule.join(
            F.broadcast(lab), F.col("rule_id") == F.col("__rid__"), "inner"
        )
        .select(
            "rule",
            "column",
            "n_checked",
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )
    )
