"""Retrieval-quality metrics — recall@k, MRR@k, nDCG@k per query —
the numbers every similarity-search / RAG-retrieval change is judged
by. The ANN lane (llm.similarity) produces ranked candidate lists;
this module scores them against binary relevance labels, so "did the
IVF shortlist hurt recall" becomes one oracle-checkable table.

Beyond-reference analytics operator (the reference's surface has no
ranking evaluation; its nearest ancestor is ordering, reference
src/operators.jl sort paths). Spark-first design:

- ranks are per-QUERY ``row_number`` windows ordered by
  ``(score DESC, id)`` — a query's candidate list is bounded by the
  retrieval fan-out (top-N shortlists), so the window state is small
  and queries shard across partitions; score ALL-pairs output should
  be pre-pruned (``ops.sorting.take_per_group``) before scoring, and
  the docstring contract makes that the caller's knob, not a hidden
  re-rank;
- the relevant-count denominator is ONE map-side-combining aggregate
  over the full candidate set (recall@k needs |relevant| even when
  relevant docs fall outside the top k);
- DCG / ideal-DCG terms ``1/log2(rank+1)`` floor-quantize to
  ``dcg_scale`` BEFORE the exact int64 sums (the repo's per-term
  libm-drift absorption); the ideal DCG is a closed
  ``F.aggregate(F.sequence(1, min(k, n_rel)))`` fold — k terms of
  codegen, no second ranking pass.

Determinism: binary relevance is enforced in-plan (a graded label
raises rather than silently truncating); score ties break on the id
column; every ratio is a single correctly-rounded division of exact
int64 sums, floor-quantized to ``out_scale``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rank_metrics(
    df: DataFrame,
    query_col: str,
    score_col: str,
    rel_col: str,
    id_col: str,
    k: int = 10,
    out_scale: int = 6,
    dcg_scale: int = 8,
) -> DataFrame:
    """Per-query retrieval metrics over a scored candidate table
    (module doc). Returns one row per query:
    ``(query_col, n_rel, hits_k, recall_k, mrr_k, ndcg_k)`` where

    - ``recall_k`` = |relevant in top k| / |relevant|  (NULL when the
      query has no relevant candidates — undefined, not zero);
    - ``mrr_k``    = 1 / rank of the first relevant candidate in the
      top k, 0.0 when none made the cut;
    - ``ndcg_k``   = binary-relevance DCG@k / ideal-DCG@k (NULL when
      no relevant candidates exist).
    """
    if k < 1:
        raise ValueError("rank_metrics: k must be >= 1")
    r = F.col(rel_col).cast("long")
    rchk = F.when(r.isin(0, 1), r).otherwise(
        F.raise_error(F.lit(f"rank_metrics: {rel_col} must be 0/1"))
    )
    base = df.filter(
        F.col(query_col).isNotNull()
        & F.col(score_col).isNotNull()
        & F.col(rel_col).isNotNull()
    ).select(
        F.col(query_col).alias("__q__"),
        F.col(score_col).alias("__s__"),
        F.col(id_col).alias("__i__"),
        rchk.alias("__r__"),
    )
    totals = base.groupBy("__q__").agg(F.sum("__r__").alias("n_rel"))
    w = Window.partitionBy("__q__").orderBy(
        F.col("__s__").desc(), F.col("__i__")
    )
    ranked = base.withColumn("__rank__", F.row_number().over(w)).filter(
        F.col("__rank__") <= k
    )
    dm = F.lit(float(10**dcg_scale))
    dcg_term = F.floor(
        F.lit(1.0) / F.log2(F.col("__rank__").cast("double") + F.lit(1.0))
        * dm
        + F.lit(0.5)
    ).cast("long")
    top = ranked.groupBy("__q__").agg(
        F.sum("__r__").alias("hits_k"),
        F.min(F.when(F.col("__r__") == 1, F.col("__rank__"))).alias(
            "__first__"
        ),
        F.sum(F.when(F.col("__r__") == 1, dcg_term).otherwise(F.lit(0)))
        .alias("__dcg__"),
    )
    joined = totals.join(top, "__q__", "left").select(
        "__q__",
        "n_rel",
        F.coalesce(F.col("hits_k"), F.lit(0)).alias("hits_k"),
        "__first__",
        F.coalesce(F.col("__dcg__"), F.lit(0)).alias("__dcg__"),
    )
    # ideal DCG: the first min(k, n_rel) ranks all relevant — a bounded
    # closed-form fold (<= k codegen'd terms), no second ranking pass
    ideal = F.aggregate(
        F.sequence(
            F.lit(1), F.least(F.lit(k), F.col("n_rel")).cast("int")
        ),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.floor(
            F.lit(1.0) / F.log2(i.cast("double") + F.lit(1.0)) * dm
            + F.lit(0.5)
        ).cast("long"),
    )
    om = F.lit(float(10**out_scale))

    def _q(c: Column) -> Column:
        return F.floor(c * om + F.lit(0.5)) / om

    has_rel = F.col("n_rel") > 0
    return joined.select(
        F.col("__q__").alias(query_col),
        "n_rel",
        "hits_k",
        F.when(
            has_rel,
            _q(F.col("hits_k").cast("double") / F.col("n_rel").cast("double")),
        ).alias("recall_k"),
        F.coalesce(
            _q(F.lit(1.0) / F.col("__first__").cast("double")), F.lit(0.0)
        ).alias("mrr_k"),
        F.when(
            has_rel,
            _q(
                F.col("__dcg__").cast("double")
                / ideal.cast("double")
            ),
        ).alias("ndcg_k"),
    )
