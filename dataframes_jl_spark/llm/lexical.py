"""Corpus-level lexical analytics: informative-Dirichlet log-odds
("fighting words") divergence between two corpora, and per-source
lexical diversity.

Beyond-reference text-curation operators (the reference's string
surface stops at scalar helpers — reference src/operators.jl; these
are the corpus-comparison layer a dataset card reports):

* :func:`log_odds_tokens` — Monroe/Colaresi/Quinn's log-odds with an
  informative Dirichlet prior, the standard "which words distinguish
  corpus A from corpus B" statistic that raw frequency ratios get
  wrong (rare words explode) and plain PMI gets wrong (no variance
  control). For token w with counts ``a_w``/``b_w``, totals
  ``n_a``/``n_b``, and prior ``α_w = α0 · p_w`` from the POOLED
  corpus frequency ``p_w``:

      δ_w = ln[(a_w+α_w)/(n_a+α0−a_w−α_w)]
          − ln[(b_w+α_w)/(n_b+α0−b_w−α_w)]
      z_w = δ_w / sqrt(1/(a_w+α_w) + 1/(b_w+α_w))

* :func:`lexical_diversity` — per-group type/token counts, type-token
  ratio, and hapax share (the fraction of types seen exactly once) —
  the cheap template-detection signal: templated/generated text shows
  abnormally LOW diversity for its length.

Shape: one token explode + map-side-combining (side, term) count is
the only row-volume job; everything after operates on the bounded
|distinct terms| table (merge, priors, z-scores — jsd's cost class,
with per-term output instead of one number). Determinism: counts are
exact longs; each ln/sqrt result is floor-quantized on OUTPUT only
(every input to the transcendentals is a ratio of exact integers, so
both engines evaluate identical doubles; quantization absorbs libm
drift — the repo's jsd/char-lm treatment).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(col: str | Column) -> Column:
    """The repo's standard word tokenizer (llm.relevance contract):
    lowercased letter/digit runs."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(F.trim(c)), r"[^a-z0-9]+")
    return F.filter(toks, lambda t: t != "")


def _term_counts(df: DataFrame, text_col: str, name: str) -> DataFrame:
    return (
        df.select(_tokens(text_col).alias("toks"))
        .select(F.explode_outer("toks").alias("term"))
        .filter(F.col("term").isNotNull())
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias(name))
    )


def log_odds_tokens(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
    alpha0: float = 500.0,
    min_count: int = 5,
    out_scale: int = 6,
) -> DataFrame:
    """Per-term informative-Dirichlet log-odds of corpus A vs B
    (module doc). ``min_count`` drops terms whose POOLED count is
    below the threshold (their z is prior-dominated noise). Returns
    ``(term, cnt_a, cnt_b, delta, z)`` — positive z means the term
    marks corpus A."""
    ca = _term_counts(df_a, text_col, "ca").select(
        F.col("term").alias("ta"), "ca"
    )
    cb = _term_counts(df_b, text_col, "cb").select(
        F.col("term").alias("tb"), "cb"
    )
    merged = ca.join(
        cb, F.col("ta") == F.col("tb"), "full_outer"
    ).select(
        F.coalesce("ta", "tb").alias("term"),
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    ).filter((F.col("ca") + F.col("cb")) >= F.lit(int(min_count)))
    # corpus totals via a 1-row aggregate broadcast back over the term
    # table (the target_encode pattern) — NOT an empty-partition
    # window: the distinct-term table grows with corpus vocabulary, so
    # Window.partitionBy() would funnel it through SinglePartition.
    # Totals cover only the analyzed (post-threshold) vocabulary — the
    # prior is defined on it, a fixed convention the oracle replays
    # (either choice is valid; this one keeps one pass).
    totals = merged.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    ).select("na", "nb", (F.col("na") + F.col("nb")).alias("nt"))
    t = merged.crossJoin(F.broadcast(totals))
    a0 = F.lit(float(alpha0))
    aw = a0 * (F.col("ca") + F.col("cb")).cast("double") / F.col(
        "nt"
    ).cast("double")
    fa = F.col("ca").cast("double") + aw
    fb = F.col("cb").cast("double") + aw
    ga = F.col("na").cast("double") + a0 - fa
    gb = F.col("nb").cast("double") + a0 - fb
    delta = F.log(fa / ga) - F.log(fb / gb)
    z = delta / F.sqrt(F.lit(1.0) / fa + F.lit(1.0) / fb)
    om = F.lit(float(10**out_scale))

    def _q(c):
        return F.floor(c * om + F.lit(0.5)) / om

    return t.select(
        "term",
        F.col("ca").alias("cnt_a"),
        F.col("cb").alias("cnt_b"),
        _q(delta).alias("delta"),
        _q(z).alias("z"),
    )


def lexical_diversity(
    df: DataFrame,
    group_by: str,
    text_col: str = "text",
    out_scale: int = 6,
) -> DataFrame:
    """Per-group lexical diversity (module doc): returns
    ``(group, n_tokens, n_types, n_hapax, ttr, hapax_share)``."""
    per_term = (
        df.select(F.col(group_by).alias("g"), _tokens(text_col).alias("toks"))
        .select("g", F.explode_outer("toks").alias("term"))
        .filter(F.col("term").isNotNull())
        .groupBy("g", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    agg = per_term.groupBy("g").agg(
        F.sum("cnt").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.count(F.when(F.col("cnt") == 1, F.lit(1))).alias("n_hapax"),
    )
    om = F.lit(float(10**out_scale))

    def _q(c):
        return F.floor(c * om + F.lit(0.5)) / om

    return agg.select(
        F.col("g").alias(group_by),
        "n_tokens",
        "n_types",
        "n_hapax",
        F.when(
            F.col("n_tokens") > 0,
            _q(F.col("n_types").cast("double") / F.col("n_tokens").cast("double")),
        ).alias("ttr"),
        F.when(
            F.col("n_types") > 0,
            _q(F.col("n_hapax").cast("double") / F.col("n_types").cast("double")),
        ).alias("hapax_share"),
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    term_scale: int = 8,
    out_scale: int = 6,
) -> DataFrame:
    """Zipf-law fit over the corpus vocabulary: least-squares slope of
    ``ln(freq)`` against ``ln(rank)`` — the corpus-health number that
    catches generated/boilerplate corpora (natural text sits near
    slope −1; templated spam flattens the head, OCR noise fattens the
    tail and drags r² down).

    Shape: one explode+groupBy builds the term-count table (vocabulary
    rows, the same table every lexical operator here shares), ranks
    come from ops.sorting.global_row_number under the TOTAL order
    (count desc, term asc) — range-partitioned rank, never a
    SinglePartition window; the regression is ONE aggregate over
    per-term floor-quantized ``ln`` products (libm drift absorbed
    per-term, sums exact int64/decimal — the dsum discipline).
    Within a tied-count block the rank ASSIGNMENT among terms is
    lexicographic scaffolding; the regression is invariant to it (y is
    constant inside the block, and the block occupies a fixed rank
    run), so the statistic is a property of the count multiset.

    Returns one row ``(n_types, n_tokens, slope, intercept, r2)`` —
    slope/intercept of ln(freq) = slope·ln(rank) + intercept; NULL
    slope/r2 when fewer than 2 types survive ``min_count``.
    """
    from ..ops.sorting import global_row_number, order

    counts = (
        df.select(_tokens(text_col).alias("toks"))
        .select(F.explode_outer("toks").alias("term"))
        .filter(F.col("term").isNotNull())
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= F.lit(int(min_count)))
    )
    ranked = global_row_number(
        counts,
        [order("cnt", rev=True), order("term")],
        col_name="rank",
    )
    tm = F.lit(float(10**term_scale))
    dec = "decimal(38,0)"
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("cnt").cast("double"))

    def _qt(c):
        return F.floor(c * tm + F.lit(0.5)).cast("long")

    per = ranked.select(
        F.col("cnt"),
        _qt(x).alias("xu"),
        _qt(y).alias("yu"),
    )
    agg = per.agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("cnt").alias("n_tokens"),
        F.sum(F.col("xu").cast(dec)).alias("sx"),
        F.sum(F.col("yu").cast(dec)).alias("sy"),
        F.sum(F.col("xu").cast(dec) * F.col("yu").cast(dec)).alias("sxy"),
        F.sum(F.col("xu").cast(dec) * F.col("xu").cast(dec)).alias("sxx"),
        F.sum(F.col("yu").cast(dec) * F.col("yu").cast(dec)).alias("syy"),
    )
    n = F.col("n_types").cast("double")
    sx = F.col("sx").cast("double") / tm
    sy = F.col("sy").cast("double") / tm
    sxy = F.col("sxy").cast("double") / tm / tm
    sxx = F.col("sxx").cast("double") / tm / tm
    syy = F.col("syy").cast("double") / tm / tm
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    slope = cov / varx
    intercept = (sy - slope * sx) / n
    r2 = (cov * cov) / (varx * vary)
    om = F.lit(float(10**out_scale))

    def _q(c):
        return F.floor(c * om + F.lit(0.5)) / om

    ok = (F.col("n_types") >= 2) & (varx > 0)
    return agg.select(
        "n_types",
        "n_tokens",
        F.when(ok, _q(slope)).alias("slope"),
        F.when(ok, _q(intercept)).alias("intercept"),
        F.when(ok & (vary > 0), _q(r2)).alias("r2"),
    )


def good_turing(
    df: DataFrame,
    text_col: str = "text",
    max_r: int = 10,
    out_scale: int = 8,
) -> DataFrame:
    """Good-Turing frequency-of-frequencies estimate over the corpus
    vocabulary — the coverage question a tokenizer/dataset card has to
    answer: "how much probability mass belongs to words this corpus
    has NOT seen (or has seen only r times)?". Where zipf_fit reads
    the SHAPE of the count distribution and vocab_approx its SIZE,
    Good-Turing reads its MASS: the unseen mass is n_1/N (Turing's
    estimate — the hapax share of tokens), and a type observed r
    times should be credited a smoothed count r* = (r+1)·n_{r+1}/n_r
    rather than r.

    Returns one row per frequency r = 0..max_r (rows exist only where
    n_r does, plus the always-present r = 0 row):

    - ``freq``     r (0 = the unseen bucket)
    - ``n_types``  n_r, #types seen exactly r times (NULL at r = 0 —
      the vocabulary outside the corpus is unknown by definition)
    - ``r_star``   Turing-smoothed count (r+1)·n_{r+1}/n_r (NULL at
      r = 0 and wherever n_{r+1} = 0)
    - ``raw_mass`` r·n_r/N, the empirical token share at r
    - ``gt_mass``  (r+1)·n_{r+1}/N = n_r·r*/N, the Good-Turing mass
      credited to the bucket; at r = 0 this IS the unseen mass n_1/N.
      The column telescopes: Σ_{r=0..∞} gt_mass = 1 exactly.

    Scale shape: ONE token explode + map-side-combining term count is
    the only row-volume job (the shared lexical-table shape); the
    frequency-of-frequencies regroup carries |distinct counts| rows
    (≤ ~√(2N) by pigeonhole), and the r↔r+1 alignment is a broadcast
    self-join of that bounded table. Determinism: every output is a
    ratio of exact int64 counts — both engines evaluate identical
    doubles — floor-quantized to ``out_scale`` decimals on output.
    """
    tc = _term_counts(df, text_col, "c")
    fof = tc.groupBy(F.col("c").alias("freq")).agg(
        F.count(F.lit(1)).alias("n_types")
    )
    # r+1 alignment: rename the key through a projection (fresh
    # exprIds — the repo's shared-lineage self-join rule)
    nxt = fof.select(
        (F.col("freq") - F.lit(1)).alias("prev_freq"),
        F.col("n_types").alias("n_next"),
    )
    totals = fof.agg(
        F.sum(F.col("freq") * F.col("n_types")).alias("n_tokens"),
        F.sum(
            F.when(F.col("freq") == 1, F.col("n_types")).otherwise(F.lit(0))
        ).alias("n_hapax"),
    )
    om = F.lit(float(10**out_scale))

    def _q(c):
        return F.floor(c * om + F.lit(0.5)) / om

    nd = F.col("n_tokens").cast("double")
    body = (
        fof.filter(
            (F.col("freq") >= 1) & (F.col("freq") <= F.lit(int(max_r)))
        )
        .join(
            F.broadcast(nxt),
            F.col("freq") == F.col("prev_freq"),
            "left",
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "freq",
            "n_types",
            F.when(
                F.col("n_next").isNotNull(),
                _q(
                    (F.col("freq") + F.lit(1)).cast("double")
                    * F.col("n_next").cast("double")
                    / F.col("n_types").cast("double")
                ),
            ).alias("r_star"),
            _q(
                F.col("freq").cast("double")
                * F.col("n_types").cast("double")
                / nd
            ).alias("raw_mass"),
            _q(
                (F.col("freq") + F.lit(1)).cast("double")
                * F.coalesce(F.col("n_next"), F.lit(0)).cast("double")
                / nd
            ).alias("gt_mass"),
        )
    )
    unseen = totals.select(
        F.lit(0).cast("long").alias("freq"),
        F.lit(None).cast("long").alias("n_types"),
        F.lit(None).cast("double").alias("r_star"),
        F.lit(0.0).alias("raw_mass"),
        _q(F.col("n_hapax").cast("double") / nd).alias("gt_mass"),
    )
    return unseen.unionByName(body)


def chao1_richness(
    df: DataFrame,
    text_col: str = "text",
    n: int = 1,
    out_scale: int = 6,
) -> DataFrame:
    """Chao1 lower-bound estimate of TRUE vocabulary size (Chao 1984)
    — the question :func:`good_turing` leaves open: GT prices the
    probability MASS of unseen types (n₁/N); Chao1 prices their
    COUNT. A dataset card wants both: "7% of tokens will be novel"
    (GT) and "the corpus vocabulary is ≥ ~1.8× what we observed"
    (Chao1). Uses the bias-corrected form, defined even when no
    doubletons exist:

        Ŝ = S_obs + f₁(f₁ − 1) / (2(f₂ + 1))

    plus the abundance-coverage estimate Ĉ = 1 − f₁/N (Turing) so the
    caller reads "this corpus covers Ĉ of its own type distribution".

    Returns one row ``(n_tokens, s_obs, f1, f2, chao1, coverage)``.

    ``n`` picks the type unit: 1 = single terms (the module's
    lowercased-alnum-run tokenizer), n > 1 = space-joined word
    n-grams over the SAME tokenizer — the estimator is most telling
    on n-grams, where the type space is genuinely open (a small
    closed vocabulary saturates at f₁ = 0 and Chao1 degenerates to
    S_obs, which is the correct answer but an empty question).

    Scale shape: ONE token explode + map-side-combining term count
    (the shared lexical-table shape) and one fold of that to a single
    row — f₁/f₂/S_obs/N are four conditional sums over the same pass.
    The n-gram path is the same shape (each doc emits tokens−n+1
    grams, built as array_join-over-slice — O(tokens·n) per doc,
    shuffle unchanged). Everything is a ratio of exact int64 counts,
    floor-quantized to ``out_scale`` on output.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    if n == 1:
        tc = _term_counts(df, text_col, "c")
    else:
        toks = _tokens(text_col)
        grams = F.when(
            F.size(toks) < n, F.array().cast("array<string>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        )
        tc = (
            df.select(F.explode_outer(grams).alias("term"))
            .filter(F.col("term").isNotNull())
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("c"))
        )
    agg = tc.agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("s_obs"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).alias("f2"),
    )
    om = F.lit(float(10**out_scale))

    def _q(c):
        return F.floor(c * om + F.lit(0.5)) / om

    f1 = F.col("f1").cast("double")
    f2 = F.col("f2").cast("double")
    chao1 = F.col("s_obs").cast("double") + f1 * (f1 - F.lit(1.0)) / (
        F.lit(2.0) * (f2 + F.lit(1.0))
    )
    cov = F.lit(1.0) - f1 / F.col("n_tokens").cast("double")
    return agg.select(
        "n_tokens",
        "s_obs",
        "f1",
        "f2",
        _q(chao1).alias("chao1"),
        _q(cov).alias("coverage"),
    )


def term_burstiness(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 100,
    out_scale: int = 6,
) -> DataFrame:
    """Per-term burstiness over the corpus — the lexical lane's
    CLUMPING diagnostic: frequency alone (zipf_fit, good_turing) says
    how OFTEN a term occurs; burstiness says how it is SPREAD. A term
    with tf = 1000 over 1000 docs is function-word-like; the same tf
    packed into 40 docs is topical/boilerplate (Church & Gale 1995
    made this the standard content-word signal; a curation pipeline
    uses it to separate template spam from genuinely topical terms).

    Reported per term over the ``top_k`` by total count:

    - ``df_docs`` — documents containing the term,
    - ``tf`` — total occurrences,
    - ``per_doc`` — mean occurrences per CONTAINING doc (tf/df, the
      Church-Gale burstiness; 1.0 = never repeats within a doc),
    - ``vmr`` — variance-to-mean ratio of the per-doc count over ALL
      n docs, zeros included (1 = Poisson scatter, >1 = clumped):
      closed-form from exact sums, vmr = (n·Σc² − tf²)/(n·tf), no
      zero rows ever materialized.

    Determinism: every reported ratio is a ratio of exact int64 sums
    (Σc, Σc² per term, corpus doc count) — both engines divide the
    same integers; floor-quantized on output. Top-k selection orders
    by (tf DESC, term ASC) — a total order, so the cut is unique.

    Scale shape: ONE (doc, term) map-side-combining count (the token
    explode is the only row-volume job), one |postings|-row regroup
    to per-term sums, then a top-k — Spark plans
    TakeOrderedAndProject (per-partition k-heaps, no global sort).
    The corpus doc count rides a 1-row broadcast.
    """
    per_dt = (
        df.select(
            F.monotonically_increasing_id().alias("__doc__"),
            _tokens(text_col).alias("toks"),
        )
        .select("__doc__", F.explode_outer("toks").alias("term"))
        .filter(F.col("term").isNotNull())
        .groupBy("__doc__", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dec = "decimal(38,0)"
    per_term = per_dt.groupBy("term").agg(
        F.count(F.lit(1)).alias("df_docs"),
        F.sum("c").alias("tf"),
        F.sum(F.col("c").cast(dec) * F.col("c").cast(dec)).alias("ss"),
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    top = (
        per_term.orderBy(F.col("tf").desc(), F.col("term"))
        .limit(int(top_k))
        .crossJoin(F.broadcast(n_docs))
    )
    om = F.lit(float(10**out_scale))

    def _q(c):
        return F.floor(c * om + F.lit(0.5)) / om

    tfd = F.col("tf").cast("double")
    nd = F.col("n_docs").cast("double")
    vmr = (nd * F.col("ss").cast("double") - tfd * tfd) / (nd * tfd)
    return top.select(
        "term",
        "df_docs",
        "tf",
        _q(tfd / F.col("df_docs").cast("double")).alias("per_doc"),
        _q(vmr).alias("vmr"),
    )
