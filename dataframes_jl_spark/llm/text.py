"""Text analysis operators over document tables: tokenization, language
ID, quality scoring, fingerprinting.

All pure Column expressions (split/filter/transform/aggregate higher-
order functions) — whole-stage codegen, no UDFs, linear scans that
partition-parallelize trivially at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization of trimmed text → array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: str | Column) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.trim(c) == "", F.lit(0)).otherwise(F.size(tokens(c)))


def bpe_ish_token_count(col: str | Column) -> Column:
    """BPE-ish proxy token count: word-piece boundaries at letter/digit/
    punctuation transitions (a regex approximation of byte-pair merges —
    useful as a fast budget estimator, not a real tokenizer)."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.split(c, r"(?<=\W)(?=\w)|(?<=\w)(?=\W)|(?<=[a-z])(?=[A-Z])")
    return F.size(F.filter(pieces, lambda p: F.trim(p) != ""))


# Marker stopwords per language for the n-gram/stopword heuristic.
# Tiny on purpose: broadcast-free (inlined into the plan as literals).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans"],
    "es": ["el", "la", "los", "las", "y", "es", "una", "que"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不"],
}


def lang_scores(col: str | Column) -> dict[str, Column]:
    """Per-language marker-hit counts over whitespace tokens."""
    t = tokens(col)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(t, lambda x: F.array_contains(arr, F.lower(x))))
    return out


def language_id(col: str | Column, default: str = "und") -> Column:
    """Language ID: argmax of marker-stopword counts; ``default`` when no
    marker hits. Deterministic tie-break by language code order."""
    scores = lang_scores(col)
    # build argmax with a deterministic order
    langs = sorted(scores)
    best_lang = F.lit(default)
    best_score = F.lit(0)
    for lang in langs:
        s = scores[lang]
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    return best_lang


def quality_score(col: str | Column) -> Column:
    """Document quality heuristic in [0,1]: blend of length band,
    alpha ratio, punctuation ratio, mean word length band — the usual
    cheap pre-filters for LLM training corpora."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(c, r"[^.,;:!?]", ""))
    n_tok = token_count(c)
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    mean_word = F.when(n_tok > 0, n_alpha / n_tok).otherwise(0.0)
    len_band = F.when((n_chars >= 100) & (n_chars <= 20000), 1.0).otherwise(
        F.when(n_chars > 0, 0.5).otherwise(0.0)
    )
    word_band = F.when((mean_word >= 3) & (mean_word <= 10), 1.0).otherwise(0.5)
    punct_band = F.when(punct_ratio <= 0.1, 1.0).otherwise(0.5)
    return F.round(
        0.4 * len_band + 0.3 * alpha_ratio + 0.2 * word_band + 0.1 * punct_band, 6
    )


def doc_fingerprint(col: str | Column, n: int = 3) -> Column:
    """Order-sensitive document fingerprint: xxhash64 rolling over word
    n-gram hashes (hash of hashes — one pass, codegen). Two documents
    with identical token streams get identical fingerprints."""
    t = tokens(col)
    n_sh = F.size(t) - (n - 1)
    grams = F.when(n_sh <= 0, F.array().cast("array<bigint>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_sh - 1),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(t, i + 1, n))),
        )
    )
    return F.xxhash64(F.concat_ws(",", F.transform(grams, lambda g: g.cast("string"))))
