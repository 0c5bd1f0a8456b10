"""End-to-end corpus curation — the composed pipeline a training-data
run actually executes, as ONE lazy Spark plan: quality filter →
exact dedup → MinHash-LSH near-dedup → benchmark decontamination →
per-domain token-budget sampling → sequence packing.

Beyond-reference composition (the reference has the pieces' ancestors
— filtering via expression indexing, reference src/dataframe.jl;
grouping src/grouping.jl — but no corpus pipeline); every stage here
is an already-oracle-gated operator from this package, so the value of
the composition gate is INTEGRATION evidence: the stages compose
without re-materialization, stage boundaries agree on schema/ids, and
the final numbers match an independent end-to-end DuckDB derivation.

100 TB shape (stage by stage):
- quality: pure codegen'd projection predicates (llm/text.py), no
  shuffle — runs inside the scan stage;
- exact dedup: one hash aggregate on the text (min-id representative)
  + a semi join back on id;
- near-dedup: banded MinHash-LSH candidates → exact-Jaccard verify
  (llm/dedup.py — only band-bucket collisions are ever joined), then
  min-label connected components over the PAIR set (bounded by dup
  count, not corpus size) and one left-anti join;
- decontamination: broadcast inverted-index join against the eval
  side's n-grams (the eval corpus is the small side by construction);
- token budget: per-domain deterministic hash-order prefix under an
  exact integer cumsum (one keyed window);
- packing: closed-form exclusive-cumsum bin ids (no sequential state).
No stage collects to the driver; every shuffle is keyed by id, domain,
or band bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .decontam import decontaminate
from .dedup import dedup_corpus, minhash_lsh_pairs
from .mixture import take_token_budget
from .packing import pack_offset
from .text import gopher_pass


def curate_corpus(
    docs: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "source",
    min_words: int = 50,
    min_stopwords: int = 2,
    jaccard_n: int = 3,
    jaccard_threshold: float = 0.5,
    decontam_n: int = 5,
    decontam_threshold: float = 0.2,
    budget: int = 1500,
    seq_len: int = 512,
) -> DataFrame:
    """Run the full curation chain over ``docs`` (module doc) and
    return the packed training set: the input columns of the surviving
    rows plus ``n_tokens``, ``cum_tokens`` (budget order) and ``bin``
    (pack id per domain). Aggregate per domain for the publish report.
    """
    # 1 — quality: Gopher rule AND, a scan-stage predicate
    q = docs.filter(
        gopher_pass(
            F.col(text_col), min_words=min_words, min_stopwords=min_stopwords
        )
    )
    # 2 — exact dedup: min-id representative per identical text, then
    # a semi join back so every surviving row keeps its full schema
    reps = q.groupBy(text_col).agg(F.min(id_col).alias(id_col)).select(id_col)
    d1 = q.join(reps, id_col, "left_semi")
    # 3 — near-dedup: LSH candidates, exact-verified pairs, min-label
    # cluster representatives survive. The rows hint (one cheap count of
    # the RAW source scan — an upper bound on the filtered corpus) keeps
    # the LSH spill-regime auto-sizing without eagerly re-computing the
    # quality+dedup subtree for a count.
    pairs = minhash_lsh_pairs(
        d1, id_col, text_col, num_hashes=64, bands=32,
        n=jaccard_n, threshold=jaccard_threshold, rows=docs.count(),
    )
    d2 = dedup_corpus(d1, pairs, id_col)
    # 4 — decontaminate against the eval benchmark (broadcast probe)
    d3 = decontaminate(
        d2, eval_df, id_col, text_col,
        n=decontam_n, threshold=decontam_threshold, hash_shingles=True,
    )
    # 5 — deterministic per-domain token budget
    d4 = take_token_budget(
        d3, budget=budget, domain_col=domain_col,
        text_col=text_col, id_col=id_col,
    )
    # 6 — pack into fixed-token training bins per domain
    return pack_offset(d4, "n_tokens", seq_len, by=domain_col, order_col=id_col)


def curation_report(curated: DataFrame, domain_col: str = "source") -> DataFrame:
    """Per-domain publish summary of a :func:`curate_corpus` output:
    ``(domain, n_docs, n_tokens, n_packs)`` — the bounded table a
    pipeline logs (and gates on) before shipping the shards."""
    return curated.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.countDistinct("bin").alias("n_packs"),
    )
