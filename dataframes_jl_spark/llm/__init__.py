"""Large-scale training-data-pipeline operators (beyond the reference's
own surface; SURVEY §7 phase 7): deduplication, similarity search, text
analysis, multimodal column plumbing.

Design rules for 100 TB:
- everything expressible with built-in higher-order functions stays
  JVM-side (no Python in the hot path);
- candidate generation (LSH banding) bounds the pair space before any
  quadratic verification;
- Pandas UDFs only where vectorized numpy genuinely wins (dense
  embedding math) — always Arrow-batched.
"""

from .dedup import (  # noqa: F401
    embedding_dup_pairs,
    containment_pairs,
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_lsh_pairs_between,
    minhash_signature,
    shingles,
    simhash,
    simhash_band_pairs,
    simhash_pairs,
    simhash_signatures,
)
from .fuzzy import fuzzy_pairs  # noqa: F401
from .similarity import brute_force_topk, ivf_topk, lsh_topk  # noqa: F401
from .text import (  # noqa: F401
    c4_clean_lines,
    c4_keep,
    c4_page_flags,
    chunk_documents,
    doc_fingerprint,
    gopher_pass,
    gopher_rules,
    language_id,
    quality_score,
    token_count,
)
from .packing import pack_greedy, pack_offset  # noqa: F401
from .decontam import (  # noqa: F401
    contamination_report,
    decontaminate,
    ngram_overlap,
)
from .cluster import (  # noqa: F401
    cluster_embeddings,
    cluster_profile,
    fit_kmeans_driver,
    fit_pca_driver,
    kmeans_assign,
    kmeans_assign_np,
    pca_project,
    semdedup,
    semdedup_pairs,
)
from .quant import (  # noqa: F401
    dequantize,
    quantize_embeddings,
    quantized_rescore_topk,
)
from .mixture import (  # noqa: F401
    domain_stats,
    mixture_weights,
    take_token_budget,
)
from .relevance import bm25_scores, doc_frequencies, term_stats, tf_idf  # noqa: F401
from .spans import (  # noqa: F401
    duplicated_spans,
    position_ngrams,
    span_dup_fraction,
)
from .lexical import lexical_diversity, log_odds_tokens  # noqa: F401
