"""Sequence packing: assign documents to fixed-budget training bins
(context windows) — a training-data-pipeline operator with no reference
counterpart (the reference has no notion of token budgets; this extends
SURVEY §2's beyond-reference LLM surface alongside llm/text.py).

Two variants, two scale strategies:

- ``pack_offset``: closed-form next-fit approximation — bin id is
  ``floor(start_offset / budget)`` where ``start_offset`` is the
  exclusive running sum of sizes within the shard. One window over the
  shard key (single keyed shuffle), pure SQL semantics (DuckDB-oracle
  checkable). Items may straddle a bin boundary: a bin's true content
  can exceed ``budget`` by at most one item's tail — acceptable when
  documents are much smaller than the context window, the common case.
- ``pack_greedy``: exact next-fit — a new bin starts whenever adding
  the item would overflow the budget, so no bin exceeds ``budget``
  unless a single item alone does. The recurrence is inherently
  sequential per shard, so it runs as one Arrow-batched
  ``applyInPandas`` pass per shard; shards pack independently and in
  parallel (the 100 TB path: pick shards sized to executor memory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_offset(
    df: DataFrame,
    size_col: str,
    budget: int,
    by: str = "source",
    order_col: str = "doc_id",
    bin_col: str = "bin",
) -> DataFrame:
    """Approximate next-fit packing: ``bin = floor(exclusive_cumsum /
    budget)`` within each ``by`` shard, ordered by ``order_col``."""
    w = (
        Window.partitionBy(by)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return df.withColumn(
        bin_col, F.floor(start / F.lit(budget)).cast("bigint")
    )


def pack_greedy(
    df: DataFrame,
    size_col: str,
    budget: int,
    by: str = "source",
    order_col: str = "doc_id",
    bin_col: str = "bin",
    max_shard_rows: int | None = 5_000_000,
) -> DataFrame:
    """Exact next-fit packing per shard via applyInPandas (sequential
    recurrence: new bin when the running fill would overflow).

    ``applyInPandas`` materializes each shard as ONE pandas frame in
    executor memory — an unbounded shard OOMs the executor during the
    Arrow concat, before user code runs. ``max_shard_rows`` therefore
    pre-counts shard sizes (one cheap aggregate job at call time) and
    raises loudly, naming the offenders, instead of letting the job die
    mid-stage (round-3 verdict #7). Set ``None`` to skip the check (and
    its eager job) when shard bounds are already known; oversized shards
    should use ``pack_offset``, whose window recurrence never
    materializes a shard.
    """
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    if max_shard_rows is not None:
        big = (
            df.groupBy(by)
            .agg(F.count(F.lit(1)).alias("__n__"))
            .filter(F.col("__n__") > max_shard_rows)
            .limit(5)
            .collect()
        )
        if big:
            detail = ", ".join(f"{r[by]}={r['__n__']}" for r in big)
            raise ValueError(
                f"pack_greedy: shard(s) exceed max_shard_rows="
                f"{max_shard_rows} ({detail}); each shard is materialized "
                "in executor memory — use pack_offset for oversized "
                "shards, split the shard key, or raise max_shard_rows "
                "deliberately"
            )

    # copy — StructType.add would mutate the frame's cached schema
    schema = StructType(
        list(df.schema.fields) + [StructField(bin_col, LongType())]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        bins, fill, b = [], 0, 0
        for s in pdf[size_col]:
            s = int(s)
            if fill > 0 and fill + s > budget:
                b += 1
                fill = 0
            fill += s
            bins.append(b)
        pdf[bin_col] = pd.Series(bins, dtype="int64")
        return pdf

    return df.groupBy(by).applyInPandas(pack, schema=schema)
