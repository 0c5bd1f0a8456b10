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
        # try_divide: an all-empty corpus has 0 total tokens — NULL
        # share beats an ANSI DIVIDE_BY_ZERO crash
        F.try_divide(F.col("n_tokens"), F.col("__total_tokens__")).alias(
            "token_share"
        ),
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


def take_token_budget(
    docs: DataFrame,
    budget: int,
    domain_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    budgets: Optional[Mapping[str, int]] = None,
) -> DataFrame:
    """Deterministic per-domain token-budget sampling: within each
    domain, order documents by a reproducible affine hash of the id (an
    engine-portable "shuffle" — no rand()) and keep the prefix whose
    cumulative token count stays within the domain's budget.

    ``budgets`` overrides the scalar ``budget`` per domain (domains
    absent from the map fall back to ``budget``). A document whose own
    tokens would push the running total past the budget is excluded —
    budgets are hard caps, so a domain whose first document exceeds the
    budget contributes nothing.

    Output: input columns + ``n_tokens`` and ``cum_tokens`` (inclusive
    running total in hash order) for the kept rows.

    Scale: one ``partitionBy(domain)`` window — cumulative sums are
    per-domain sequential by nature, so a domain's rows pass through
    one task. Fine up to domains of ~10^8 rows; beyond that, pre-
    aggregate to (domain, hash-bucket) partial sums and prefix-scan the
    bucket totals (the global_row_number two-phase trick) before
    window-summing within buckets.
    """
    from pyspark.sql import Window

    # mod-first: a raw id * 2654435761 overflows int64 (ANSI crash) for
    # ids >= ~3.47e9 — real at scale (replicated corpora shift ids by
    # 1e9 per replica). (id mod 2^31) * MULT < 5.7e18 stays in range,
    # and is the identity transform for ids < 2^31 (same sample order).
    # Integer id contract: non-integer id columns raise under ANSI.
    key = F.pmod(
        F.pmod(F.col(id_col), F.lit(2147483648)) * F.lit(2654435761),
        F.lit(2147483648),
    )
    w = (
        Window.partitionBy(domain_col)
        .orderBy(key, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if budgets is not None:
        mapping = F.create_map(*[F.lit(x) for kv in budgets.items() for x in kv])
        cap = F.coalesce(mapping[F.col(domain_col)], F.lit(budget))
    else:
        cap = F.lit(budget)
    return (
        docs.withColumn("n_tokens", token_count(text_col))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= cap)
    )


def temperature_weights(
    docs: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    temperature: float = 2.0,
    scale: int = 9,
) -> DataFrame:
    """Temperature-flattened mixture (the multilingual/UniMax sampling
    rule): target share proportional to token_share^(1/T). T=1 keeps
    the natural mix, T->inf approaches uniform; 1<T<4 up-samples tail
    domains without letting any single domain dominate.

    Same two-aggregate shape as mixture_weights (tiny per-domain stats,
    broadcast total). Engine-portability: pow is NOT correctly rounded
    in every runtime (Java Math.pow is 1-ulp), so the powered shares
    are quantized to 10^-scale units BEFORE normalizing and the
    normalizer is a sum of exact int64 units — the dsum discipline —
    keeping target_share/weight bit-stable across engines and
    partition orders.

    Returns (domain, n_docs, n_tokens, token_share, target_share,
    weight) with weight = target_share / token_share.
    """
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    stats = domain_stats(docs, domain_col, text_col)
    m = F.lit(float(10**scale))
    powed = stats.withColumn(
        "__pq__",
        F.floor(F.pow(F.col("token_share"), F.lit(1.0 / temperature)) * m + F.lit(0.5)),
    )
    tot = powed.agg(F.sum("__pq__").alias("__z__"))
    out = powed.crossJoin(F.broadcast(tot))
    target = F.col("__pq__") / F.col("__z__")
    return out.select(
        domain_col,
        "n_docs",
        "n_tokens",
        "token_share",
        target.alias("target_share"),
        (target / F.col("token_share")).alias("weight"),
    )


def dsir_weights(
    target: DataFrame,
    raw: DataFrame,
    id_col: str,
    text_col: str,
    vocab_size: int = 2048,
    logp_scale: int = 9,
    out_scale: int = 6,
) -> DataFrame:
    """DSIR-style importance weights (Data Selection via Importance
    Resampling, Xie et al. 2023): score every ``raw`` document by how
    much more likely its unigrams are under the ``target`` corpus's
    bag-of-words model than under ``raw``'s own — the standard
    "select pretraining data that looks like my high-quality target"
    operation (the original uses hashed n-gram features; this variant
    uses a deterministic top-V RAW vocabulary + one OOV bucket so the
    DuckDB oracle replays the features as plain strings, no engine-
    private hashing).

    log_weight(doc) = Σ_tokens [ln p̂_t(tok) − ln p̂_r(tok)] with
    add-one smoothing over V+1 events (V vocab + OOV):
    p̂(tok) = (cnt(tok)+1)/(n_tokens+V+1). Each per-token log-ratio is
    floor-quantized to ``10^logp_scale`` units IMMEDIATELY (the
    char_lm_quality libm-absorption discipline: both engines ln the
    identical rational, the quantization absorbs any final-ulp
    disagreement), so the per-doc sum is an exact int64 fold —
    order-independent and engine-portable. Resample by feeding
    ``exp(log_weight)`` (or a temperature-flattened version) to
    ops.sampling.weighted_sample.

    Scale shape: two map-side-combining token-count aggregates (one
    per corpus), ONE top-V selection (TakeOrderedAndProject — per-
    partition heaps, never a global sort; ties break on the token
    string so the vocabulary is deterministic), a V+1-row log-ratio
    table BROADCAST to the raw-corpus token explode, and one per-doc
    aggregate. The only row-volume shuffles are the two token counts
    and the final per-doc groupBy.

    Returns one row per raw document: ``(id, n_tok, log_weight)``;
    empty/whitespace-only docs get log_weight 0.0 (no evidence either
    way), n_tok 0.

    Caching contract: persists the V+1-row log-ratio table (a few KB
    at any corpus scale; it feeds the broadcast scorer AND the OOV
    mass) and attaches the handle to the result as
    ``unpersist_handles`` — release with
    ``dataframes_jl_spark.release(result)`` once consumed (or
    session-wide ``spark.catalog.clearCache()``).
    """
    if vocab_size < 1:
        raise ValueError("dsir_weights: vocab_size must be >= 1")
    from .text import tokens

    def tok_counts(df: DataFrame) -> DataFrame:
        return (
            df.filter(F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""))
            .select(F.explode(tokens(text_col)).alias("tok"))
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    def tok_total(df: DataFrame, alias: str) -> DataFrame:
        # total token count WITHOUT the explode+shuffle of tok_counts:
        # sum of per-doc token-array sizes over one map-side pass —
        # identical to SUM(c) over the count table (every exploded
        # token is counted exactly once either way), at a scan +
        # 1-row aggregate instead of a corpus-wide re-aggregation
        return (
            df.filter(
                F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
            )
            .select(F.size(tokens(text_col)).alias("__n__"))
            .agg(F.sum("__n__").cast("long").alias(alias))
        )

    ct = tok_counts(target)
    cr = tok_counts(raw)
    from ..ops.sorting import order, top_k

    vocab = top_k(
        cr.select("tok", "c"),
        [order("c", rev=True), order("tok", rev=False)],
        vocab_size,
    ).select(F.col("tok").alias("v_tok"), F.col("c").alias("cr_v"))
    # vocab rows with target counts attached; OOV mass = totals minus
    # in-vocab mass (no second pass over the token tables)
    # vt feeds BOTH the ratio table and the in-vocab-mass aggregate;
    # unpersisted, each consumer re-runs the two corpus-wide
    # tokenize+explode+count subtrees beneath it. The table is exactly
    # ``vocab_size`` rows, so the cache is a few KB at ANY corpus
    # scale — persist it (handle rides the result per the core.cache
    # contract).
    vt = (
        vocab.join(
            ct.select(F.col("tok").alias("v_tok"), F.col("c").alias("ct_v")),
            "v_tok",
            "left",
        )
        .select(
            "v_tok",
            F.coalesce("ct_v", F.lit(0)).alias("ct_v"),
            "cr_v",
        )
        .persist()
    )
    tot_t = tok_total(target, "n_t")
    tot_r = tok_total(raw, "n_r")
    invoc = vt.agg(
        F.coalesce(F.sum("ct_v"), F.lit(0)).alias("ct_in"),
        F.coalesce(F.sum("cr_v"), F.lit(0)).alias("cr_in"),
    )
    m = F.lit(float(10**logp_scale))
    vp1 = F.lit(float(vocab_size + 1))

    def lr(ct_c, cr_c, n_t, n_r):
        pt = (ct_c.cast("double") + F.lit(1.0)) / (
            n_t.cast("double") + vp1
        )
        pr = (cr_c.cast("double") + F.lit(1.0)) / (
            n_r.cast("double") + vp1
        )
        # per-TERM floor quantization of each ln before the difference
        # is NOT needed: both engines ln the identical rationals and
        # the DIFFERENCE is quantized — but quantizing each ln
        # separately makes the oracle mirror trivially exact, so do
        # that (two int64 terms, one subtraction).
        qt = F.floor(F.log(pt) * m + F.lit(0.5)).cast("long")
        qr = F.floor(F.log(pr) * m + F.lit(0.5)).cast("long")
        return qt - qr

    lrs = (
        vt.crossJoin(F.broadcast(tot_t))
        .crossJoin(F.broadcast(tot_r))
        .select(
            "v_tok",
            lr(F.col("ct_v"), F.col("cr_v"), F.col("n_t"), F.col("n_r")).alias(
                "__lr__"
            ),
        )
    )
    oov = (
        invoc.crossJoin(F.broadcast(tot_t))
        .crossJoin(F.broadcast(tot_r))
        .select(
            lr(
                F.col("n_t") - F.col("ct_in"),
                F.col("n_r") - F.col("cr_in"),
                F.col("n_t"),
                F.col("n_r"),
            ).alias("__oov_lr__")
        )
    )
    doc_toks = raw.select(
        F.col(id_col).alias("id"),
        F.explode_outer(tokens(text_col)).alias("tok"),
    ).select(
        "id",
        F.when(F.col("tok") == "", None).otherwise(F.col("tok")).alias("tok"),
    )
    om = F.lit(float(10**out_scale))
    scored = (
        doc_toks.join(F.broadcast(lrs), doc_toks["tok"] == lrs["v_tok"], "left")
        .crossJoin(F.broadcast(oov))
        .select(
            "id",
            F.col("tok"),
            F.when(F.col("tok").isNull(), F.lit(0).cast("long"))
            .otherwise(F.coalesce(F.col("__lr__"), F.col("__oov_lr__")))
            .alias("__w__"),
        )
    )
    out = (
        scored.groupBy("id")
        .agg(
            F.sum(F.when(F.col("tok").isNotNull(), 1).otherwise(0)).alias(
                "n_tok"
            ),
            F.sum("__w__").alias("__lw__"),
        )
        .select(
            "id",
            "n_tok",
            (
                F.floor(
                    F.col("__lw__").cast("double") / m * om + F.lit(0.5)
                )
                / om
            ).alias("log_weight"),
        )
    )
    from ..core.cache import hold

    return hold(out, vt)
