"""Text analysis operators over document tables: tokenization, language
ID, quality scoring, fingerprinting.

All pure Column expressions (split/filter/transform/aggregate higher-
order functions) — whole-stage codegen, no UDFs, linear scans that
partition-parallelize trivially at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.hof import let1


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization of trimmed text → array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: str | Column) -> Column:
    """Whitespace token count; 0 for NULL/empty/blank text (without the
    NULL guard, ``size(split(NULL))`` is -1 — legacy Spark — and a NULL
    document would DECREASE any cumulative token sum built on this)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.isNull() | (F.trim(c) == ""), F.lit(0)
    ).otherwise(F.size(tokens(c)))


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
    score = 0.4 * len_band + 0.3 * alpha_ratio + 0.2 * word_band + 0.1 * punct_band
    # floor(x*1e6+0.5)/1e6, NOT round(x, 6): Spark's round decimalizes
    # the double while DuckDB's multiplies first, and the decimal
    # weights park scores exactly on .xxxxxx5 boundaries where the two
    # disagree by 1 ulp (hit at sf0.01). The explicit floor form is the
    # same IEEE multiply/add/floor in every engine.
    return F.floor(score * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def doc_fingerprint(col: str | Column, n: int = 3) -> Column:
    """Order-sensitive document fingerprint: xxhash64 rolling over word
    n-gram hashes (hash of hashes — one pass, codegen). Two documents
    with identical token streams get identical fingerprints."""
    def _grams(t: Column) -> Column:
        n_sh = F.size(t) - (n - 1)
        return F.when(n_sh <= 0, F.array().cast("array<bigint>")).otherwise(
            F.transform(
                F.sequence(F.lit(0), n_sh - 1),
                # t is a let1-bound lambda variable: slice() here is
                # O(n-gram width) per element, not a per-element re-split
                lambda i: F.xxhash64(F.concat_ws(" ", F.slice(t, i + 1, n))),
            )
        )

    grams = let1(tokens(col), _grams)
    return F.xxhash64(F.concat_ws(",", F.transform(grams, lambda g: g.cast("string"))))


def bigrams(col: str | Column) -> Column:
    """Consecutive word bigrams (space-joined) — [] for <2 tokens.
    Linear per doc: the token array is let1-bound so the zip_with sees a
    lambda variable, and the pair build is a zip of the array with its
    own tail (never an element_at(t, i) closure that re-splits the
    document per element)."""
    return let1(
        tokens(col),
        lambda t: F.when(F.size(t) < 2, F.array().cast("array<string>")).otherwise(
            F.zip_with(
                F.slice(t, 1, F.size(t) - 1),
                F.slice(t, 2, F.size(t) - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ),
    )


def dup_token_fraction(col: str | Column) -> Column:
    """Fraction of tokens that repeat an earlier token:
    1 - distinct/total. 0.0 for empty text."""
    t = tokens(col)
    c = F.col(col) if isinstance(col, str) else col
    n = F.when(F.trim(c) == "", F.lit(0)).otherwise(F.size(t))
    return F.when(n == 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(t)).cast("double") / n
    )


def dup_line_fraction(col: str | Column) -> Column:
    """Fraction of newline-separated lines that duplicate an earlier
    line (Gopher-style boilerplate signal). 0.0 for single-line text."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.split(c, r"\n")
    n = F.size(lines)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(lines)).cast("double") / n
    )


def top_bigram_fraction(col: str | Column) -> Column:
    """Fraction of all bigram slots occupied by the single most frequent
    bigram — the Gopher top-2-gram repetition signal. O(n log n) per doc:
    sort the bigram array, then a single linear aggregate() pass tracks
    the longest run of equal adjacent elements (the max count). Replaces
    the round-3 O(d·n) distinct×filter nested scan that stalled tasks on
    long documents. Whole-stage codegen, no shuffle, no UDF. 0.0 for <2
    tokens."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def _step(a: Column, x: Column) -> Column:
        run = F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(a["best"], run).alias("best")
        )

    def _frac(bg: Column) -> Column:
        top = F.aggregate(F.array_sort(bg), zero, _step, lambda a: a["best"])
        return F.when(F.size(bg) == 0, F.lit(0.0)).otherwise(
            top.cast("double") / F.size(bg)
        )

    return let1(bigrams(col), _frac)


# Gopher document-quality rules (Rae et al. 2021, "Scaling Language
# Models: Methods, Analysis & Insights from Training Gopher", App. A).
# Published thresholds; "symbol" = '#' or '...' as in the paper.  Every
# rule is a pure Column expression over one tokenization / one line
# split — codegen, linear per doc, no UDF, no shuffle.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    col: str | Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_stopwords: int = 2,
) -> dict[str, Column]:
    """Gopher quality-filter rule booleans (True = rule passes).

    Returns the seven published rules keyed by name; AND them (or use
    :func:`gopher_pass`) for the overall keep/drop decision. Thresholds
    are the paper's; ``min_words``/``max_words``/``min_stopwords`` are
    exposed because small-document or domain-specific corpora usually
    relax the 50-word floor and the 2-of-8-stopwords floor (technical
    text legitimately uses few of the paper's English stopwords).
    """
    c = F.col(col) if isinstance(col, str) else col
    return _gopher_rule_cols(
        c, tokens(c), token_count(c), F.split(c, "\n"),
        min_words, max_words, min_stopwords,
    )


def _gopher_rule_cols(
    c: Column,
    t: Column,
    n_words: Column,
    lines: Column,
    min_words: int,
    max_words: int,
    min_stopwords: int,
) -> dict[str, Column]:
    """Rule bodies over CALLER-SUPPLIED tokenization/line-split
    expressions. :func:`gopher_rules` passes the raw expressions (each
    output column re-derives them — fine when a caller consumes one or
    two rules); :func:`gopher_report` passes let1-bound variables so
    the whole seven-rule report tokenizes once per row."""
    n_lines = F.size(lines)
    # mean raw word length (paper: in [3, 10])
    word_len_sum = F.aggregate(
        t, F.lit(0), lambda acc, w: acc + F.length(w), lambda acc: acc
    )
    mean_word_len = F.when(n_words > 0, word_len_sum / n_words).otherwise(0.0)
    # symbols: '#' plus non-overlapping '...' occurrences
    n_hash = F.length(c) - F.length(F.regexp_replace(c, "#", ""))
    n_ellipsis = F.size(F.split(c, r"\.{3}", -1)) - 1
    symbol_ratio = F.when(
        n_words > 0, (n_hash + n_ellipsis) / n_words.cast("double")
    ).otherwise(0.0)
    bullet_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]")))
        / n_lines.cast("double"),
    ).otherwise(0.0)
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda l: l.rlike(r"(…|\.\.\.)\s*$")))
        / n_lines.cast("double"),
    ).otherwise(0.0)
    alpha_word_frac = F.when(
        n_words > 0,
        F.size(F.filter(t, lambda w: w.rlike("[A-Za-z]"))) / n_words.cast("double"),
    ).otherwise(0.0)
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop = let1(
        F.transform(t, F.lower),
        lambda lt: F.size(F.filter(stop_arr, lambda s: F.array_contains(lt, s))),
    )
    return {
        "word_count_ok": (n_words >= min_words) & (n_words <= max_words),
        "mean_word_len_ok": (mean_word_len >= 3) & (mean_word_len <= 10),
        "symbol_ratio_ok": symbol_ratio <= 0.1,
        "bullet_lines_ok": bullet_frac <= 0.9,
        "ellipsis_lines_ok": ellipsis_frac <= 0.3,
        "alpha_words_ok": alpha_word_frac >= 0.8,
        "stopwords_ok": n_stop >= min_stopwords,
    }


GOPHER_RULE_NAMES = (
    "word_count_ok",
    "mean_word_len_ok",
    "symbol_ratio_ok",
    "bullet_lines_ok",
    "ellipsis_lines_ok",
    "alpha_words_ok",
    "stopwords_ok",
)


def gopher_report(
    df,
    col: str | Column,
    passthrough: list[str],
    min_words: int = 50,
    max_words: int = 100_000,
    min_stopwords: int = 2,
):
    """All seven :func:`gopher_rules` booleans plus ``n_words`` as a
    DataFrame, with the tokenization, line split, and token count each
    evaluated ONCE per row.

    The dict-of-Columns surface re-derives the shared subexpressions
    per output column (15 tokenizations per row measured in
    q_gopher_rules' plan — lambda-bearing expressions fall out of
    whole-stage codegen and its subexpression elimination), so the
    report form binds them with let1 and unpacks the rule struct
    through a Generate boundary (functions.hof.unpack_once). Measured
    2.5x faster at sf0.1 on identical output."""
    from ..functions.hof import unpack_once

    c = F.col(col) if isinstance(col, str) else col
    gen = let1(
        tokens(c),
        lambda t: let1(
            F.split(c, "\n"),
            lambda lines: let1(
                token_count(c),
                lambda n_words: F.struct(
                    n_words.alias("n_words"),
                    *[
                        v.alias(k)
                        for k, v in _gopher_rule_cols(
                            c, t, n_words, lines,
                            min_words, max_words, min_stopwords,
                        ).items()
                    ],
                ),
            ),
        ),
    )
    return unpack_once(
        df, passthrough, gen, ["n_words", *GOPHER_RULE_NAMES]
    )


def gopher_pass(col: str | Column, **kw) -> Column:
    """Overall Gopher keep/drop: AND of all :func:`gopher_rules`,
    with the shared tokenization/line-split/count let1-bound so the
    conjunction evaluates them once per row (a single output column
    CAN share bindings; only cross-column sharing needs
    :func:`gopher_report`'s Generate boundary)."""
    c = F.col(col) if isinstance(col, str) else col

    def _conj(rules: dict[str, Column]) -> Column:
        out = F.lit(True)
        for r in rules.values():
            out = out & r
        return out

    return let1(
        tokens(c),
        lambda t: let1(
            F.split(c, "\n"),
            lambda lines: let1(
                token_count(c),
                lambda n_words: _conj(
                    _gopher_rule_cols(c, t, n_words, lines, **_kw_defaults(kw))
                ),
            ),
        ),
    )


def _kw_defaults(kw: dict) -> dict:
    out = {"min_words": 50, "max_words": 100_000, "min_stopwords": 2}
    unknown = set(kw) - set(out)
    if unknown:
        # a misspelled threshold silently reverting to its default is a
        # curation bug factory — fail like the old **kw forwarding did
        raise TypeError(
            f"gopher_pass: unknown keyword arguments {sorted(unknown)}; "
            f"accepted: {sorted(out)}"
        )
    out.update(kw)
    return out


def c4_clean_lines(col: str | Column, min_words: int = 5) -> Column:
    """C4 line-level cleanup (Raffel et al. 2020 §2.2): keep only lines
    that end in a terminal punctuation mark, contain at least
    ``min_words`` words, and do not mention 'javascript'; re-join the
    survivors with newlines.  One line split + one filter — codegen,
    linear per document."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    kept = F.filter(
        F.split(c, "\n"),
        lambda l: F.trim(l).rlike(r'[.!?"]$')
        & (F.size(F.split(F.trim(l), r"\s+")) >= min_words)
        & ~F.lower(l).contains("javascript"),
    )
    return F.array_join(kept, "\n")


def c4_page_flags(col: str | Column, min_sentences: int = 3) -> dict[str, Column]:
    """C4 page-level filter booleans (True = rule passes): no
    'lorem ipsum', no '{' (code), and at least ``min_sentences``
    terminal-punctuation sentences.  NULL text behaves as empty (the
    flags are real booleans, never NULL — a NULL flag would silently
    drop through both keep- and drop-filters)."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    return {
        "no_lorem_ipsum": ~F.lower(c).contains("lorem ipsum"),
        "no_curly_brace": ~c.contains("{"),
        "min_sentences_ok": F.regexp_count(c, F.lit("[.!?]")) >= min_sentences,
    }


def c4_keep(col: str | Column, min_sentences: int = 3) -> Column:
    """Overall C4 page keep/drop: AND of :func:`c4_page_flags`."""
    out = F.lit(True)
    for flag in c4_page_flags(col, min_sentences).values():
        out = out & flag
    return out


# PII patterns: kept to syntax valid in BOTH Java regex (Spark) and RE2
# (DuckDB) so oracle SQL can mirror the counts 1:1. Intentionally simple
# — recall-oriented pre-filters, not validators.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\+?[0-9][0-9()\- ]{7,14}[0-9]",
}


def pii_counts(col: str | Column) -> dict[str, Column]:
    """Per-kind PII match counts (email / ipv4 / phone)."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        kind: F.regexp_count(c, F.lit(pat)) for kind, pat in PII_PATTERNS.items()
    }


def redact_pii(col: str | Column, token: str = "[PII]") -> Column:
    """Replace every PII match with ``token``. Pure regexp_replace chain
    — codegen, linear scan, safe at any scale."""
    c = F.col(col) if isinstance(col, str) else col
    for pat in PII_PATTERNS.values():
        c = F.regexp_replace(c, pat, token)
    return c


def ngram_top_k(docs: DataFrame, col: str = "text", k: int = 20) -> DataFrame:
    """Corpus-wide top-k bigrams by occurrence count.

    explode → two-phase count aggregate (map-side partial combine) →
    TakeOrderedAndProject for the top-k: no global sort, one shuffle on
    the bigram key. Count ties broken by bigram text so the result set
    is deterministic. At 100 TB the partial aggregate collapses each
    partition to its distinct bigrams before the exchange — the shuffle
    carries (bigram, count) pairs, not token streams.
    """
    return (
        docs.select(F.explode(bigrams(col)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("ngram"))
        .limit(k)
    )


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    stride: int = 64,
) -> DataFrame:
    """Split documents into overlapping token windows (the standard
    pre-training/RAG chunker): windows of ``chunk_tokens`` whitespace
    tokens starting every ``stride`` tokens, last partial window kept.

    Map-only — per-row sequence + explode, zero shuffles; chunk volume
    is (n_tokens/stride) rows per doc, each carrying only its own
    window's text. explode_outer keeps Catalyst from inferring a
    size()>0 filter that would re-run tokenization below the scan
    projection (see llm/decontam.py), and empty docs simply drop out.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = tokens(F.col(text_col))
    n = F.when(F.trim(F.col(text_col)) == "", F.lit(0)).otherwise(F.size(toks))
    starts = F.when(
        n > 0, F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    )
    ex = (
        docs.select(
            F.col(id_col).alias("id"),
            toks.alias("__toks__"),
            F.explode_outer(starts).alias("start"),
        )
        .filter(F.col("start").isNotNull())
    )
    chunk = F.slice(F.col("__toks__"), F.col("start") + 1, chunk_tokens)
    return ex.select(
        F.col("id").alias(id_col),
        (F.col("start") / stride).cast("int").alias("chunk_idx"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.size(chunk).alias("chunk_n_tokens"),
    )


def ngrams(col: str | Column, n: int) -> Column:
    """Consecutive word n-grams (space-joined) for arbitrary n — [] for
    short/NULL docs. Generalizes :func:`bigrams`: the token array is
    let1-bound once, and each gram is an array_join over a slice — the
    per-doc cost is O(tokens * n) with no re-split per element."""
    if n < 1:
        raise ValueError("n must be >= 1")
    c = F.col(col) if isinstance(col, str) else col
    return let1(
        tokens(col),
        lambda t: F.when(
            # blank text must short-circuit: split('', '\s+') is ['']
            # — one EMPTY token — which at n=1 would emit a '' gram.
            c.isNull() | (F.trim(c) == "") | (F.size(t) < n),
            F.array().cast("array<string>"),
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (n - 1)),
                lambda i: F.array_join(F.slice(t, i, n), " "),
            )
        ),
    )


def ngram_counts(
    docs, col: str = "text", n: int = 3, min_count: int = 2
):
    """Corpus n-gram frequency table pruned to grams seen at least
    ``min_count`` times — the count-based LM / contamination-fingerprint
    building block. explode → ONE count aggregate with map-side partial
    combine (each partition collapses to its distinct grams before the
    exchange) → post-aggregate HAVING; returns (ngram, cnt).

    The shuffle carries (gram, partial-count) pairs. When the distinct-
    gram population itself is the bottleneck (trillions at 100 TB), cap
    the shuffle with the Misra-Gries path instead:
    ``ops.frequency.heavy_hitters`` over the exploded grams bounds the
    exchange at partitions x k regardless of cardinality."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    return (
        docs.select(F.explode(ngrams(col, n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )


# ---------------------------------------------------------------------------
# Character-class entropy (quality signal)
# ---------------------------------------------------------------------------

# Regexes partition every character into exactly one class, so the five
# counts sum to length(text) and the shares form a distribution. All
# counts come from length-difference arithmetic (regexp_replace strips
# the class), so the whole signal is codegen'd string ops — no explode,
# no UDF: per-document cost is O(chars) map-side, shuffle cost zero.
_CHAR_CLASSES = {
    "lower": "[a-z]",
    "upper": "[A-Z]",
    "digit": "[0-9]",
    "space": r"[ \t\n\r]",
    # everything else (punctuation, symbols, non-ASCII)
}


def char_class_counts(col: str | Column) -> dict[str, Column]:
    """Per-class character counts; 'other' is the complement so the
    five always sum to the document length."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    out: dict[str, Column] = {}
    rest = n
    for name, pat in _CHAR_CLASSES.items():
        cnt = n - F.length(F.regexp_replace(c, pat, ""))
        out[name] = cnt
        rest = rest - cnt
    out["other"] = rest
    return out


def char_class_entropy(col: str | Column, scale: int = 6) -> Column:
    """Shannon entropy (nats) of the 5-way character-class distribution
    — a cheap garbage detector: natural prose sits near ~1.0-1.2 nats
    (mixed case+space+punct), base64/hex blobs and repeated-char runs
    collapse toward 0-at-one-class or pin at the class-uniform maximum.

    Entropy term per class: -(k/n) ln(k/n), summed only over k > 0 (the
    0 ln 0 = 0 convention), floor-quantized to ``scale`` decimals so
    the libm ln's last ulp cannot flip a gate. Empty/NULL text yields
    NULL (no distribution to score).
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c).cast("double")
    counts = char_class_counts(c)
    h: Column = F.lit(0.0)
    for cnt in counts.values():
        k = cnt.cast("double")
        p = k / n
        h = h + F.when(cnt > 0, -p * F.log(p)).otherwise(F.lit(0.0))
    m = F.lit(float(10**scale))
    return F.when(n > 0, F.floor(h * m + F.lit(0.5)) / m)


def char_bigram_table(
    docs: DataFrame,
    text_col: str = "text",
    term_scale: int = 8,
) -> DataFrame:
    """Corpus character-bigram log-probability table
    ``(bg, cnt, ctx_cnt, logp)`` — the training half of the KenLM-style
    perplexity proxy (:func:`char_lm_scores`): ``logp = ln(cnt /
    ctx_cnt)`` where ``ctx_cnt`` is the first character's total
    continuation count.

    The table is bounded by |alphabet|² regardless of corpus size; the
    extraction is one codegen'd transform+explode and one
    map-side-combining count. ``logp`` is floor-quantized to
    ``term_scale`` decimals IN the table, so every downstream sum over
    it is exact integer arithmetic (the dsum discipline — libm ln
    drift is absorbed here, once, not per document).
    """
    c = F.col(text_col)
    bgs = F.transform(
        F.sequence(F.lit(1), F.length(c) - 1),
        lambda i: F.substring(c, i, 2),
    )
    ex = (
        docs.select(F.when(F.length(c) >= 2, bgs).alias("bgs"))
        .select(F.explode_outer("bgs").alias("bg"))
        .filter(F.col("bg").isNotNull())
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from pyspark.sql import Window

    # context totals as a window over the bounded bigram table
    wc = Window.partitionBy(F.substring(F.col("bg"), 1, 1))
    m = F.lit(float(10**term_scale))
    ctx = F.sum("cnt").over(wc)
    logp = F.floor(
        F.log(F.col("cnt").cast("double") / ctx.cast("double")) * m + F.lit(0.5)
    ) / m
    return ex.select(
        "bg", "cnt", ctx.alias("ctx_cnt"), logp.alias("logp")
    )


def char_lm_scores(
    docs: DataFrame,
    table: DataFrame,
    group_by: str,
    text_col: str = "text",
    term_scale: int = 8,
    out_scale: int = 6,
) -> DataFrame:
    """Average per-bigram log-probability per group under a
    :func:`char_bigram_table` model — the cheap perplexity proxy that
    separates prose from base64/garbage without an external LM: garbage
    hits rare transitions and scores far more negative.

    Per (doc-group, bigram) counts join the broadcast bounded model
    table; unseen bigrams take the floor penalty ``ln(1/(ctx_max+1))``
    of the whole model (quantized like every other term). The group
    score is the POOLED mean — exact integer sum of quantized logp
    weighted by occurrence counts, divided once.

    Returns ``(group, n_bigrams, avg_logp)``.

    Caching contract: persists the |alphabet|²-bounded model table (it
    feeds the broadcast scorer AND the unseen-bigram floor aggregate —
    unpersisted, each consumer re-ran the full training explode+count
    over the corpus); the handle rides the result as
    ``unpersist_handles`` — release with
    ``dataframes_jl_spark.release(result)`` once consumed.
    """
    from pyspark import StorageLevel

    from ..core.cache import hold

    table = table.persist(StorageLevel.MEMORY_AND_DISK)
    c = F.col(text_col)
    bgs = F.transform(
        F.sequence(F.lit(1), F.length(c) - 1),
        lambda i: F.substring(c, i, 2),
    )
    gb = (
        docs.select(
            F.col(group_by).alias("g"),
            F.when(F.length(c) >= 2, bgs).alias("bgs"),
        )
        .select("g", F.explode_outer("bgs").alias("bg"))
        .filter(F.col("bg").isNotNull())
        .groupBy("g", "bg")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    m = F.lit(float(10**term_scale))
    # unseen-bigram floor: one row, ln(1/(max ctx + 1)), same quantization
    floor_row = table.agg(
        (
            F.floor(
                F.log(F.lit(1.0) / (F.max("ctx_cnt").cast("double") + F.lit(1.0)))
                * m
                + F.lit(0.5)
            )
            / m
        ).alias("__floor_logp__")
    )
    j = (
        gb.join(F.broadcast(table.select("bg", "logp")), ["bg"], "left")
        .crossJoin(F.broadcast(floor_row))
        .select(
            "g",
            "cnt",
            F.coalesce("logp", F.col("__floor_logp__")).alias("lp"),
        )
    )
    om = F.lit(float(10**out_scale))
    # lp is k/10^term_scale for integer k, but lp*m only recovers k to
    # within an ulp — floor(x+0.5) re-integerizes exactly, so the
    # weighted sum is pure int64 arithmetic (order-independent)
    units = F.floor(F.col("lp") * m + F.lit(0.5)).cast("long")
    # units reaches ~logp·10^8 ≈ 2.5e9 per bigram; Σ cnt·units overflows
    # int64 around 4e9 occurrences — accumulate in decimal(38,0) like
    # welch_ttest/autocorrelation, cast to double only for the final avg
    dec = "decimal(38,0)"
    agg = j.groupBy("g").agg(
        F.sum("cnt").alias("n_bigrams"),
        F.sum(F.col("cnt").cast(dec) * units.cast(dec)).alias("__su__"),
    )
    avg = (
        F.col("__su__").cast("double") / m / F.col("n_bigrams").cast("double")
    )
    return hold(
        agg.select(
            F.col("g").alias(group_by),
            "n_bigrams",
            (F.floor(avg * om + F.lit(0.5)) / om).alias("avg_logp"),
        ),
        table,
    )


def readability_scores(col: str | Column) -> dict[str, Column]:
    """Flesch reading-ease / Flesch-Kincaid grade built entirely from
    codegen'd string counts — the classic readability quality signal
    (Flesch 1948, Kincaid 1975; public formulas) a curation pass runs
    beside gopher_rules: Gopher prices STRUCTURE (lengths, ratios),
    readability prices PROSE DIFFICULTY, and the two disagree on
    boilerplate vs dense legal text.

        ease  = 206.835 − 1.015·(words/sentences) − 84.6·(syll/word)
        grade = 0.39·(words/sentences) + 11.8·(syll/word) − 15.59

    Counting contracts (deterministic, explode-free, O(chars)/row):
    words = whitespace token count (token_count); sentences =
    terminal-punctuation runs ``[.!?]+`` clamped to ≥ 1 so a
    fragment counts as one sentence; syllables ≈ vowel GROUPS per
    word ``[aeiouy]+`` (the standard cheap proxy — a trailing silent
    'e' overcounts ~5%, bias shared by both engines since it is the
    same regexp), clamped to ≥ words so every word carries at least
    one syllable. NULL text yields NULL scores (no prose, no grade).

    Returns ``{"words", "sentences", "syllables", "flesch_ease",
    "fk_grade"}`` — compose into a select; all five are plain Column
    expressions, no shuffle, no UDF.
    """
    c = F.col(col) if isinstance(col, str) else col
    lc = F.lower(c)
    words = token_count(col)
    sentences = F.greatest(
        F.regexp_count(c, F.lit(r"[.!?]+")), F.lit(1)
    )
    syllables = F.greatest(
        F.regexp_count(lc, F.lit(r"[aeiouy]+")), words
    )
    wd = words.cast("double")
    wps = wd / sentences.cast("double")
    spw = syllables.cast("double") / wd
    ok = c.isNotNull() & (words > 0)
    ease = (
        F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    )
    grade = (
        F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
    )
    return {
        "words": F.when(c.isNotNull(), words),
        "sentences": F.when(c.isNotNull(), sentences),
        "syllables": F.when(c.isNotNull(), syllables),
        "flesch_ease": F.when(ok, ease),
        "fk_grade": F.when(ok, grade),
    }


def readability_report(
    docs: DataFrame,
    col: str = "text",
    group_by: Sequence[str] = (),
    scale: int = 4,
    out_scale: int = 4,
) -> DataFrame:
    """Per-group readability rollup: document count plus mean Flesch
    ease and mean FK grade — the corpus-card row. Per-document scores
    floor-quantize to ``10^scale`` units (int64) BEFORE the mean (the
    dsum discipline: integer sums are order-independent, so the
    group mean is bit-identical in any engine), then ONE map-side-
    combining aggregate. Documents with no words are excluded from
    the means but counted in ``n_docs``.
    """
    gb = list(group_by)
    m = F.lit(float(10**scale))
    sc = readability_scores(col)
    qe = F.floor(sc["flesch_ease"] * m + F.lit(0.5)).cast("long")
    qg = F.floor(sc["fk_grade"] * m + F.lit(0.5)).cast("long")
    base = docs.select(*gb, qe.alias("qe"), qg.alias("qg"))
    agg = base.groupBy(*gb).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("qe").alias("n_scored"),
        F.sum("qe").alias("se"),
        F.sum("qg").alias("sg"),
    )
    om = F.lit(float(10**out_scale))

    def _q(c_):
        return F.floor(c_ * om + F.lit(0.5)) / om

    return agg.select(
        *gb,
        "n_docs",
        "n_scored",
        F.when(
            F.col("n_scored") > 0,
            _q(
                F.col("se").cast("double")
                / F.col("n_scored").cast("double")
                / m
            ),
        ).alias("mean_ease"),
        F.when(
            F.col("n_scored") > 0,
            _q(
                F.col("sg").cast("double")
                / F.col("n_scored").cast("double")
                / m
            ),
        ).alias("mean_grade"),
    )


# Encoding-artifact patterns (escape-built so the source file stays
# pure ASCII). All are plain character classes a SQL oracle mirrors
# verbatim:
#  - U+FFFD REPLACEMENT CHARACTER: a decoder already gave up once.
#  - C1 controls U+0080-U+009F: the classic CP1252-read-as-Latin-1
#    artifact (curly quotes become invisible controls).
#  - C0 controls except tab/newline/CR: binary junk inside "text".
#  - U+00C3 + Latin-1-supplement continuation (U+0080-U+00BF):
#    UTF-8 bytes decoded as Latin-1 then re-encoded - 'e-acute'
#    becomes 'A-tilde, copyright-sign' - the canonical
#    double-encoding fingerprint.
_MOJIBAKE_PATTERNS = {
    "fffd": "\ufffd",
    "c1_control": "[\u0080-\u009f]",
    "c0_control": "[\u0000-\u0008\u000b\u000c\u000e-\u001f]",
    "double_utf8": "\u00c3[\u0080-\u00bf]",
}


def mojibake_audit(
    docs: DataFrame,
    col: str = "text",
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Encoding-artifact audit over a text corpus - the data-quality
    check upstream of every text operator in this package: tokenizers,
    LM scores, and dedup shingles all silently degrade on mojibake,
    and at 100 TB nobody eyeballs the bytes. Flags the four artifact
    families in ``_MOJIBAKE_PATTERNS`` (replacement chars, C1/C0
    controls, double-encoded UTF-8) and reports, per group, the
    document counts and total occurrence counts of each - the triage
    numbers that decide "re-decode this source with cp1252" vs "drop
    it".

    Scale shape: ONE map-side-combining aggregate; every count is a
    JVM-side ``regexp_count`` (whole-stage codegen, no UDF). Exact
    integers end-to-end - a SQL oracle reproduces every column with
    the same character-class regexes. Returns one row per group:
    ``(*group_by, n_docs, docs_fffd, n_fffd, docs_c1_control,
    n_c1_control, docs_c0_control, n_c0_control, docs_double_utf8,
    n_double_utf8, clean_docs)``.
    """
    gb = list(group_by)
    t = F.coalesce(F.col(col), F.lit(""))
    cnt = {
        k: F.regexp_count(t, F.lit(p))
        for k, p in _MOJIBAKE_PATTERNS.items()
    }
    proj = docs.select(
        *gb, *[c.alias(f"__{k}__") for k, c in cnt.items()]
    )
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    clean = F.lit(True)
    for k in _MOJIBAKE_PATTERNS:
        aggs.append(
            F.sum(F.when(F.col(f"__{k}__") > 0, 1).otherwise(0)).alias(
                f"docs_{k}"
            )
        )
        aggs.append(F.sum(F.col(f"__{k}__")).alias(f"n_{k}"))
        clean = clean & (F.col(f"__{k}__") == 0)
    aggs.append(F.sum(F.when(clean, 1).otherwise(0)).alias("clean_docs"))
    return proj.groupBy(*gb).agg(*aggs)
