"""Overlapping-interval merge (interval union / coverage flattening).

The classic "merge overlapping intervals" op — flatten a set of
[start, end] spans into maximal disjoint spans — appears all over a
training-data pipeline: event sessions into busy periods, matched
duplicate spans into coverage masks (llm/spans.py builds per-doc run
merges the same way), time-range dedup before joins. Per-key merging
is a partitioned window; the hard part is the WHOLE-TABLE merge,
where the textbook single-node algorithm ("sort, then sweep carrying
a running max end") looks inherently sequential.

It isn't: like the distributed prefix scan in ops/window.py, the sweep
state that crosses partition boundaries is tiny — for interval merging
it is ONE number per partition (the max end seen so far) plus ONE
count per partition (how many groups opened). So the plan is:

1. range-repartition + local sort on (start, end, tiebreak) — the same
   parallel sampled shuffle global_row_number uses, persisted so every
   job reads one boundary draw;
2. job A (tiny): per-partition max(end) -> prefix-max "carry_max" per
   partition, computed on the driver over #partitions rows;
3. with carry_max inlined as a literal pid->value map, a row's
   effective preceding max is greatest(local window max, carry) and
   its "opens a new group" flag is a pure executor expression;
4. job B (tiny): per-partition flag totals -> prefix-sum group-id
   offsets (rows before a partition's first flag belong to the last
   group opened earlier, which offset_p indexes exactly);
5. final pass: gid = local running flag sum + offset; groupBy(gid)
   aggregates each merged span. One data shuffle (the range
   partition), two #partitions-row jobs, one bounded groupBy.

Touching intervals merge (new group only when start > preceding max):
[1,3] + [3,5] -> [1,5].
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(
    df: DataFrame,
    start_col: str,
    end_col: str,
    partition_by=None,
    tiebreak: tuple[str, ...] = (),
    extra_aggs: dict | None = None,
) -> DataFrame:
    """Merge overlapping/touching [start, end] intervals into maximal
    disjoint spans.

    Returns one row per merged span: ``partition_by`` columns (if
    any), ``gid`` (1-based span index in start order), ``start_col``
    (min), ``end_col`` (max), ``n`` (source-interval count), plus any
    ``extra_aggs`` (name -> Column aggregate expression).

    ``start_col``/``end_col`` must be mutually comparable orderable
    columns (numerics, timestamps); rows with NULL start or end are
    dropped (an unbounded interval has no merge semantics here).
    ``tiebreak`` columns make the sweep ordering total when
    (start, end) ties — required for a deterministic ``gid``.
    """
    aggs = [
        F.min(start_col).alias(start_col),
        F.max(end_col).alias(end_col),
        F.count(F.lit(1)).alias("n"),
    ] + [c.alias(nm) for nm, c in (extra_aggs or {}).items()]
    src = df.filter(F.col(start_col).isNotNull() & F.col(end_col).isNotNull())
    ob = [F.col(start_col), F.col(end_col), *[F.col(t) for t in tiebreak]]

    if partition_by:
        pb = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        w = Window.partitionBy(*pb).orderBy(*ob)
        pmax = F.max(end_col).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        )
        flag = F.when(
            pmax.isNull() | (F.col(start_col) > pmax), 1
        ).otherwise(0)
        gid = F.sum(flag).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            src.withColumn("gid", gid.cast("bigint"))
            .groupBy(*pb, "gid")
            .agg(*aggs)
        )

    # ---- whole-table path: range partition + two tiny carry jobs ----
    from pyspark import StorageLevel

    parted = (
        src.repartitionByRange(*ob)
        .sortWithinPartitions(*ob)
        .withColumn("__pid__", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    w = Window.partitionBy("__pid__").orderBy(*ob)

    # job A: per-partition max end -> exclusive prefix max per pid
    ends = sorted(
        (r["__pid__"], r["mx"])
        for r in parted.groupBy("__pid__").agg(F.max(end_col).alias("mx")).collect()
    )
    carry_max: dict[int, object] = {}
    acc = None
    for pid, mx in ends:
        if acc is not None:
            carry_max[pid] = acc
        acc = mx if acc is None or (mx is not None and mx > acc) else acc

    def _carry_expr() -> Column | None:
        if not carry_max:
            return None
        m = F.create_map(*[F.lit(x) for kv in carry_max.items() for x in kv])
        return m[F.col("__pid__")]

    carry = _carry_expr()
    local_pmax = F.max(end_col).over(w.rowsBetween(Window.unboundedPreceding, -1))
    pre = (
        local_pmax
        if carry is None
        else F.greatest(local_pmax, carry)  # greatest skips NULLs
    )
    flag = F.when(pre.isNull() | (F.col(start_col) > pre), 1).otherwise(0)
    flagged = parted.withColumn("__flag__", flag)

    # job B: per-partition flag totals -> exclusive prefix-sum offsets
    totals = sorted(
        (r["__pid__"], r["t"])
        for r in flagged.groupBy("__pid__").agg(F.sum("__flag__").alias("t")).collect()
    )
    offsets: dict[int, int] = {}
    run = 0
    for pid, t in totals:
        offsets[pid] = run
        run += int(t or 0)
    omap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    gid = (
        F.sum("__flag__").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        + F.coalesce(omap[F.col("__pid__")], F.lit(0))
    ).cast("bigint")
    return (
        flagged.withColumn("gid", gid)
        .groupBy("gid")
        .agg(*aggs)
    )
