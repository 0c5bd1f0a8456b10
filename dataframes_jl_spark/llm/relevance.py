"""Corpus relevance scoring: TF-IDF and BM25 over a document table.

Retrieval-style relevance is a core training-data operation (quality
filtering against a seed set, dedup-aware mining, targeted corpus
queries). The reference has no text operators at all (SURVEY §2.9's
closest scalar ops are numeric), so this is a beyond-reference family,
built the same Spark-first way as llm/text.py: pure Column expressions
and two-phase aggregates — no UDFs.

Scale shape (what survives 100 TB):

- Term statistics are classic map-reduce: explode tokens → per-doc
  term counts (partial aggregation collapses each partition's tokens
  before any exchange) → document frequencies via a second partial agg
  keyed on the term. Shuffles carry (term, count) pairs, never token
  streams.
- BM25 query scoring filters the posting lists to the query's terms
  BEFORE any join or shuffle (an `isin` over inlined literals at the
  scan), so per-query cost is bounded by the query terms' posting
  lists, not the corpus.
- Corpus-level scalars (N, avgdl) ride in on a broadcast of a 1-row
  aggregate — no driver round-trip in the plan.
- explode_outer + notnull rather than explode: a plain explode makes
  Catalyst infer `size(tokens) > 0` and push the tokenizer below the
  repartition into the scan stage (see llm/decontam.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm_tokens(col: str | Column) -> Column:
    """Lowercased word tokens (letters/digits runs) → array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(F.trim(c)), r"[^a-z0-9]+")
    return F.filter(toks, lambda t: t != "")


def term_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per (doc, term): term frequency ``tf`` and doc length ``dl``.

    One explode + one (id, term) aggregation; ``dl`` is computed on the
    un-exploded row and carried through, so no second pass over text.
    """
    par = docs.sparkSession.sparkContext.defaultParallelism
    base = (
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t__"))
        .repartition(par, "id")
        .select("id", _norm_tokens("__t__").alias("toks"))
        .select("id", "toks", F.size("toks").alias("dl"))
    )
    ex = base.select(
        "id", "dl", F.explode_outer("toks").alias("term")
    ).filter(F.col("term").isNotNull())
    return ex.groupBy("id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )


def doc_frequencies(tstats: DataFrame) -> DataFrame:
    """(term, df): number of documents containing each term."""
    return tstats.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def tf_idf(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per (doc, term) smoothed TF-IDF:
    ``tf * (ln((N + 1) / (df + 1)) + 1)`` (sklearn-style smoothing, so
    unseen-term idf stays finite)."""
    ts = term_stats(docs, id_col, text_col)
    dfreq = doc_frequencies(ts)
    n_docs = docs.select(
        F.count(F.lit(1)).cast("double").alias("__n_docs__")
    )
    return (
        ts.join(dfreq, on="term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            "term",
            "tf",
            (
                F.col("tf")
                * (
                    F.log(
                        (F.col("__n_docs__") + 1.0) / (F.col("df") + 1.0)
                    )
                    + 1.0
                )
            ).alias("tfidf"),
        )
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    quantize_scale: int | None = None,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Per-document BM25 relevance against a bag of query terms.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) (the standard
    non-negative Robertson idf).

    The posting lists are filtered to ``query_terms`` before the df
    join, so the scored row volume is Σ_t |postings(t)| — independent
    of vocabulary size.

    With a precomputed ``stats`` (the standard inverted-index
    materialization — compute :func:`term_stats` once, write or
    ``persist()`` it), every consumer reads the index and per-query
    cost is bounded by the posting lists. WITHOUT ``stats``, the naive
    shape would execute the full-vocabulary term_stats lineage (explode
    + an (id, term) shuffle of the corpus's entire token multiset)
    three times; instead the ad-hoc path specializes each consumer:
    postings explode only tokens matching the query terms (the shuffle
    carries query-term hits, not the vocabulary), document frequencies
    come from those same filtered postings (a doc contributes exactly
    one (id, term) row per contained term), and avgdl/N need only
    ``size(tokens)`` — no explode, no shuffle, a 1-row partial
    aggregate. Three corpus text scans (map-side CPU), zero full-vocab
    shuffles.
    """
    terms = sorted(set(query_terms))
    if stats is not None:
        # df/avgdl/N must come from the FULL corpus, not filtered lists.
        full = stats
        ts = full.filter(F.col("term").isin(terms))
        dfreq = doc_frequencies(full).filter(F.col("term").isin(terms))
        # avgdl = mean token count per doc; derive from dl directly for
        # exactness (sum tf == dl per doc by construction).
        avgdl = full.select("id", "dl").dropDuplicates(["id"]).agg(
            (F.sum("dl") / F.count(F.lit(1))).alias("__avgdl__"),
            F.count(F.lit(1)).cast("double").alias("__n__"),
        )
    else:
        par = docs.sparkSession.sparkContext.defaultParallelism
        term_arr = F.array(*[F.lit(t) for t in terms])
        base = (
            docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t__"))
            .repartition(par, "id")
            .select("id", _norm_tokens("__t__").alias("toks"))
        )
        hits = base.select(
            "id",
            F.size("toks").alias("dl"),
            F.explode_outer(
                F.filter("toks", lambda t: F.array_contains(term_arr, t))
            ).alias("term"),
        ).filter(F.col("term").isNotNull())
        ts = hits.groupBy("id", "term").agg(
            F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
        )
        dfreq = ts.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        # N and avgdl over docs with >= 1 token — the same population the
        # inverted index holds (empty docs never reach term_stats), so
        # stats= and ad-hoc paths score identically. Conditional count
        # instead of a filter node: a size(toks) predicate would be
        # projection-collapsed below the repartition and re-run the
        # tokenizer in the scan stage.
        nonempty = F.count(F.when(F.col("dl") > 0, 1))
        avgdl = base.select(F.size("toks").alias("dl")).agg(
            # try_divide: an all-empty corpus has nonempty == 0 — NULL
            # avgdl propagates to NULL scores, never an ANSI crash
            F.try_divide(F.sum("dl"), nonempty).alias("__avgdl__"),
            nonempty.cast("double").alias("__n__"),
        )
    idf = (
        F.log(
            1.0
            + (F.col("__n__") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
    ).alias("idf")
    scored = (
        ts.join(F.broadcast(dfreq), on="term")
        .crossJoin(F.broadcast(avgdl))
        .select(
            "id",
            "term",
            (
                idf
                * (
                    F.col("tf")
                    * (k1 + 1.0)
                    / (
                        F.col("tf")
                        + k1
                        * (
                            1.0
                            - b
                            + b * F.col("dl") / F.col("__avgdl__")
                        )
                    )
                )
            ).alias("term_score"),
        )
    )
    score_col = F.col("term_score")
    if quantize_scale is not None:
        # per-term quantization BEFORE the sum: the per-doc score becomes
        # an exact int64 sum — independent of accumulation order and
        # bit-identical across engines (per-term doubles are computed
        # row-wise from integer stats, never accumulated).
        score_col = F.floor(
            score_col * F.lit(float(10**quantize_scale)) + F.lit(0.5)
        ).cast("bigint")
    agg_score = F.sum(score_col)
    if quantize_scale is not None:
        agg_score = agg_score.cast("bigint")
    return scored.groupBy("id").agg(
        agg_score.alias("score"),
        F.count(F.lit(1)).alias("n_matched"),
    )


def vocab_topn(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 1000,
) -> DataFrame:
    """Top-``n`` corpus vocabulary by total occurrence count as
    ``(term, cnt)``, ties broken by term ascending (deterministic —
    an unordered tie at the vocabulary boundary would make OOV rates
    flicker between runs and engines).

    One explode + map-side-combining count + TakeOrderedAndProject:
    the |distinct terms| table is the only thing ranked, never rows.
    """
    terms = (
        docs.select(_norm_tokens(text_col).alias("toks"))
        .select(F.explode_outer("toks").alias("term"))
        .filter(F.col("term").isNotNull())
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return terms.orderBy(F.col("cnt").desc(), F.col("term").asc()).limit(n)


def oov_stats(
    docs: DataFrame,
    group_by: str,
    text_col: str = "text",
    vocab_size: int = 1000,
    out_scale: int = 6,
) -> DataFrame:
    """Out-of-vocabulary audit per group: what fraction of each group's
    token OCCURRENCES falls outside the corpus's own top-``vocab_size``
    vocabulary — the tokenizer-fit / domain-shift signal a training
    pipeline reads before committing a vocab (a source with 30% OOV
    against the pooled top-N is a different register or language).

    Plan: one explode + (group, term) count, the bounded vocab from
    :func:`vocab_topn` broadcast to a left-semi-style membership mark
    (a left join against ≤ vocab_size rows), then one aggregate to
    |groups| rows. OOV is decided on exact counts; the rate is one
    division, floor-quantized.
    """
    gt = (
        docs.select(F.col(group_by).alias("g"), _norm_tokens(text_col).alias("toks"))
        .select("g", F.explode_outer("toks").alias("term"))
        .filter(F.col("term").isNotNull())
        .groupBy("g", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vocab = vocab_topn(docs, text_col, vocab_size).select(
        "term", F.lit(True).alias("__in__")
    )
    j = gt.join(F.broadcast(vocab), ["term"], "left")
    m = F.lit(float(10**out_scale))
    agg = j.groupBy("g").agg(
        F.sum("cnt").alias("n_tokens"),
        F.sum(F.when(F.col("__in__").isNull(), F.col("cnt")).otherwise(F.lit(0))).alias(
            "n_oov"
        ),
    )
    rate = F.col("n_oov").cast("double") / F.col("n_tokens").cast("double")
    return agg.select(
        F.col("g").alias(group_by),
        "n_tokens",
        "n_oov",
        (F.floor(rate * m + F.lit(0.5)) / m).alias("oov_rate"),
    )
