"""Exact substring-level deduplication: find duplicated token spans
shared verbatim between documents (the span-level companion to the
doc-level MinHash/SimHash paths in :mod:`.dedup`).

Algorithm (the distributed shape of suffix-style training-data dedup,
cf. Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better" — reference repo has no span-level operator; this is a
beyond-reference addition):

1. every document emits its position n-grams ``(id, pos, gram)`` —
   one row per token position, gram = the n tokens starting there;
2. grams whose document frequency exceeds ``max_df`` are dropped
   (boilerplate guard — a gram in thousands of docs would otherwise
   produce a quadratic pair blow-up, and carries no dedup signal);
3. a self-equi-join on the gram key yields matching positions
   ``(id_a, pos_a, id_b, pos_b)``;
4. matches on the same diagonal (``pos_a - pos_b`` constant) that are
   CONTIGUOUS merge into maximal spans via the islands trick
   (``pos_a - row_number()`` is constant exactly along a gapless run);
5. spans shorter than ``min_len`` tokens are discarded.

Scale notes: the only all-to-all movement is the gram-key shuffle
(linear in corpus token count) and the diagonal-run windows, whose
partition key ``(id_a, id_b, offset)`` is fine-grained by construction.
``hash_grams=True`` replaces the gram string with its xxhash64 before
the shuffle — at 100 TB that ships 8 bytes per token instead of the
n-token string (the 1-in-2^64 collision risk is the standard trade;
the exact-string mode is the oracle-checkable default).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hof import let1
from .text import tokens


def position_ngrams(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    hash_grams: bool = False,
) -> DataFrame:
    """``(id, pos, gram)`` — one row per token position (0-based), gram
    = the ``n`` whitespace tokens starting there, space-joined (or
    xxhash64'd with ``hash_grams``). Documents shorter than ``n``
    tokens emit nothing (the ungated `when` makes the array NULL and
    explode drops the row — an explicit filter would push below the
    scan and re-run tokenization)."""
    # the >=n guard lives INSIDE the let1 so tokenization runs once per
    # row; `when` without `otherwise` makes short docs NULL, and explode
    # of NULL drops the row. (An unguarded sequence(0, size-n) would go
    # DESCENDING for short docs — Spark's sequence auto-steps -1 — and
    # emit negative positions.)
    structs = let1(
        tokens(text_col),
        lambda tk: F.when(
            F.size(tk) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(tk) - n),
                lambda i: F.struct(
                    i.cast("long").alias("pos"),
                    F.concat_ws(" ", F.slice(tk, i + F.lit(1), n)).alias("gram"),
                ),
            ),
        ),
    )
    out = df.select(
        F.col(id_col).alias("id"), F.explode(structs).alias("pg")
    ).select("id", F.col("pg.pos").alias("pos"), F.col("pg.gram").alias("gram"))
    if hash_grams:
        out = out.withColumn("gram", F.xxhash64("gram"))
    return out


def duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_len: int = 16,
    max_df: int = 64,
    hash_grams: bool = False,
    persist: bool = False,
) -> DataFrame:
    """Maximal duplicated token spans between document pairs.

    Returns ``(id_a, id_b, a_start, b_start, length)`` with
    ``id_a < id_b``: the ``length`` tokens at ``a_start`` (0-based) in
    doc a equal the ``length`` tokens at ``b_start`` in doc b, extended
    maximally along the match diagonal, ``length >= min_len``.

    One gram-key shuffle + two fine-grained window passes; no
    cartesian anywhere. ``max_df`` caps the per-gram join fan-out so a
    boilerplate gram (page headers, license blocks) cannot go
    quadratic — raise it knowingly, never to infinity.

    The gram table feeds BOTH the document-frequency aggregate and the
    pair join, so its lineage (tokenize + explode over the whole
    corpus) executes twice; ``persist=True`` materializes it once
    (MEMORY_AND_DISK) — the right call for any corpus where
    tokenization dominates. The count-then-join two-pass shape is
    deliberate: a single-pass ``collect_list`` posting-list variant
    avoids the second pass but must materialize a boilerplate gram's
    full posting list in one aggregation buffer BEFORE the cap can
    drop it — an executor-memory hazard the counting aggregate does
    not have.
    """
    if min_len < n:
        raise ValueError(f"min_len={min_len} must be >= n={n}")
    grams = position_ngrams(df, id_col, text_col, n=n, hash_grams=hash_grams)
    if persist:
        grams = grams.persist()

    # document-frequency cap: computed once, applied before the join
    rare = (
        grams.groupBy("gram")
        .agg(F.count_distinct("id").alias("__df__"))
        .filter((F.col("__df__") > 1) & (F.col("__df__") <= max_df))
        .select("gram")
    )
    g = grams.join(rare, on="gram")

    a = g.select("gram", F.col("id").alias("id_a"), F.col("pos").alias("pos_a"))
    b = g.select("gram", F.col("id").alias("id_b"), F.col("pos").alias("pos_b"))
    m = (
        a.join(b, on="gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "pos_a", "pos_b")
    )

    # a gram repeated inside one doc yields duplicate (pos_a, pos_b)
    # rows only via distinct gram strings at the same positions —
    # impossible — but the SAME diagonal can be hit at one position
    # by two different grams only if gram strings collide; with
    # hash_grams a 64-bit collision could duplicate a row, and
    # row_number double-counts duplicates and would split runs. The
    # dedup rides the diagonal window's OWN exchange (duplicates share
    # (id_a, id_b, offset) and sort adjacently on pos_a, so a lag
    # filter keeps exactly one) — r15's dropDuplicates paid a full
    # extra exchange of the match table for the same guarantee.
    diag = m.withColumn("offset", F.col("pos_a") - F.col("pos_b"))
    w = Window.partitionBy("id_a", "id_b", "offset").orderBy("pos_a")
    prev = F.lag("pos_a").over(w)
    deduped = diag.withColumn("__prev__", prev).filter(
        F.col("__prev__").isNull() | (F.col("pos_a") != F.col("__prev__"))
    )
    runs = deduped.withColumn(
        "__run__", F.col("pos_a") - F.row_number().over(w)
    )
    spans = (
        runs.groupBy("id_a", "id_b", "offset", "__run__")
        .agg(
            F.min("pos_a").alias("a_start"),
            (F.max("pos_a") - F.min("pos_a") + F.lit(n)).alias("length"),
        )
        .filter(F.col("length") >= min_len)
        .select(
            "id_a",
            "id_b",
            "a_start",
            (F.col("a_start") - F.col("offset")).alias("b_start"),
            "length",
        )
    )
    return spans


def span_dup_fraction(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_len: int = 16,
    max_df: int = 64,
    hash_grams: bool = False,
    persist: bool = False,
) -> DataFrame:
    """Per-document duplicated-token budget: for each doc that shares
    at least one span, the number of its token positions covered by
    some duplicated span (overlaps merged) and the covered fraction.

    Returns ``(id, n_tokens, dup_tokens, dup_fraction)``. Coverage is
    computed by interval-merging each doc's spans with one more islands
    pass — still no per-doc collect."""
    spans = duplicated_spans(
        df, id_col, text_col, n=n, min_len=min_len, max_df=max_df,
        hash_grams=hash_grams, persist=persist,
    )
    per_doc = (
        spans.select(
            F.col("id_a").alias("id"), F.col("a_start").alias("s"), "length"
        )
        .unionByName(
            spans.select(
                F.col("id_b").alias("id"), F.col("b_start").alias("s"), "length"
            )
        )
        .withColumn("e", F.col("s") + F.col("length"))
        # distinct BEFORE merging: duplicate intervals (the same span
        # shared with two partner docs) make the window order a non-total
        # order — an engine that sorts ties differently between the
        # prev_max pass and the cumulative-sum pass double-counts the
        # group (observed in DuckDB: dup_fraction 2.0). After distinct,
        # (s, e) is a total order per doc and the merge is deterministic
        # in any engine. Coverage is a set union — duplicates carry
        # nothing.
        .dropDuplicates(["id", "s", "e"])
    )

    # merge overlapping [s, e) intervals per doc: an interval starts a
    # new group iff s > running max(e) over all earlier intervals
    w = Window.partitionBy("id").orderBy("s", "e")
    prev_max = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    grp = F.sum(
        F.when(F.col("s") > F.coalesce(prev_max, F.lit(-1)), 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    merged = (
        per_doc.withColumn("__g__", grp)
        .groupBy("id", "__g__")
        .agg((F.max("e") - F.min("s")).alias("cov"))
        .groupBy("id")
        .agg(F.sum("cov").alias("dup_tokens"))
    )

    from .text import token_count

    counts = df.select(
        F.col(id_col).alias("id"), token_count(text_col).alias("n_tokens")
    )
    return merged.join(counts, on="id").select(
        "id",
        "n_tokens",
        "dup_tokens",
        F.round(F.col("dup_tokens") / F.col("n_tokens"), 6).alias("dup_fraction"),
    )
