"""Domain-mixture accounting: per-domain token shares and sampling
weights for assembling a training mix.

A corpus is rarely trained on as-is: each domain/source is up- or
down-sampled toward a target token distribution. The inputs to that
decision are exactly two hash aggregates over the corpus — per-domain
document/token counts and the global total — so this is a map-side
partial-agg + tiny shuffle even at 100 TB. The resulting per-domain
weight (``target_share / actual_share``) is the multiplier a sampler
(e.g. ops.sampling.bernoulli_sample with per-domain rates) applies.

Token counts are exact integer sums of whitespace-token counts, so all
shares are ratios of bigints — deterministic across engines and
partition orders.
"""

from __future__ import annotations

from typing import Mapping, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import token_count


def domain_stats(
    docs: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain corpus accounting: documents, tokens, and this
    domain's share of all tokens. One aggregate + a broadcast of the
    1-row global total."""
    per = docs.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(text_col)).alias("n_tokens"),
    )
    total = per.agg(F.sum("n_tokens").alias("__total_tokens__"))
    return per.crossJoin(F.broadcast(total)).select(
        domain_col,
        "n_docs",
        "n_tokens",
        (F.col("n_tokens") / F.col("__total_tokens__")).alias("token_share"),
    )


def mixture_weights(
    docs: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    target: Optional[Mapping[str, float]] = None,
) -> DataFrame:
    """Per-domain sampling weight to hit a target token distribution.

    ``target`` maps domain -> desired token share; domains absent from
    the map get weight 0 (dropped from the mix). ``target=None`` means
    uniform: every observed domain gets an equal share. The weight is
    ``target_share / actual_share`` — multiply each domain's natural
    sampling rate by it to realize the mix.
    """
    stats = domain_stats(docs, domain_col, text_col)
    if target is None:
        counted = stats.crossJoin(
            F.broadcast(stats.agg(F.count(F.lit(1)).alias("__n_domains__")))
        )
        tgt = F.lit(1.0) / F.col("__n_domains__")
        out = counted
    else:
        mapping = F.create_map(
            *[F.lit(x) for kv in target.items() for x in kv]
        )
        tgt = F.coalesce(mapping[F.col(domain_col)], F.lit(0.0))
        out = stats
    return out.select(
        domain_col,
        "n_docs",
        "n_tokens",
        "token_share",
        (tgt / F.col("token_share")).alias("weight"),
    )
