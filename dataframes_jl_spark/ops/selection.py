"""Distributed selection: EXACT order statistics / quantiles of a
column without ever buffering the column.

Spark's exact ``percentile`` aggregate materializes every (value,
count) pair of a group in executor memory — fine for per-segment
audits, impossible for a 100 TB single group. ``percentile_approx``
bounds memory but is approximate. This module computes EXACT quantiles
with bounded memory via iterative histogram refinement (the classic
distributed-selection scheme): each round is ONE aggregate job that
buckets the surviving candidates into ``n_buckets`` counts, the target
rank picks its bucket, and the candidate set shrinks by ~n_buckets per
round — 3 rounds at 8192 buckets resolve ~5e11 rows to a collectable
remainder. Every round is a scan + map-side-combined count whose
shuffle is n_buckets rows; driver state is O(n_buckets +
collect_limit) regardless of input size.

The selector is WEIGHT-AWARE: one engine serves both the row-ranked
path (``exact_quantiles``/``exact_median``, weight 1 per row) and the
weighted path (``weighted_quantiles``/``weighted_median`` — e.g. the
token-weighted median document length, where each document counts with
its token mass). Histograms aggregate ``sum(weight)`` for rank
placement and ``count(*)`` for collectability; a row's weight never
inflates the collected remainder.

Float-boundary discipline: the filter that carries a rank's candidate
set from round to round is the SAME floor-bucket expression the
histogram counted with (a chained Column predicate), never a
re-derived numeric interval — so a value that rounds across a bucket
edge in ``lo + i*width`` arithmetic cannot be counted in one bucket
and collected from another. The affine (lo, hi) pair is only the next
round's bucketing frame and is widened by one bucket on each side,
which is harmless: membership is decided by the predicate chain.

Repeated-value pileups (a value occurring > collect_limit times) stall
the narrowing at an ulp-wide interval; the remainder is then resolved
from (value, weight) pairs — one groupBy over the pinched candidate
set — so a value repeated 10^12 times never needs 10^12 rows moved.

Interpolation (unweighted path) matches ``percentile_cont`` / DuckDB
``quantile_cont`` (linear on h = (n-1)q). The weighted path returns
the LOWER weighted quantile: the smallest v whose cumulative weight
reaches ``ceil(q * W)`` — the mass-based definition an oracle can
replay with a cumulative-sum window. NaN inputs are rejected loudly
(Spark orders NaN above all doubles; silently ranking it would corrupt
the result); NULLs are ignored as in every quantile implementation.
Infinities are legal: their masses are counted in the head job and
their ranks resolved arithmetically, so the histogram refinement only
ever sees the finite sub-range — an infinite min/max would otherwise
make every bucket width infinite and degenerate the narrowing into
collecting the whole column.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_quantiles(
    df: DataFrame,
    col: str,
    qs: Sequence[float],
    n_buckets: int = 8192,
    collect_limit: int = 200_000,
    max_rounds: int = 8,
) -> list[float]:
    """Exact linear-interpolated quantiles of ``df[col]``, one result
    per entry of ``qs``, computed with bounded memory (module doc).

    All requested order statistics are narrowed together; ranks whose
    candidate sets coincide (the common case: the two bracketing ranks
    of one quantile) share each round's single histogram job.
    """
    for q in qs:
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"quantile {q} outside [0, 1]")
    vals = (
        df.select(F.col(col).cast("double").alias("v"))
        .filter(F.col("v").isNotNull())
        .withColumn("w", F.lit(1).cast("long"))
    )

    head, n, w_ninf, w_pinf = _head_stats(vals, col, "exact_quantiles")
    if n == 0:
        return [float("nan")] * len(qs)

    hs = [(n - 1) * q for q in qs]
    # 1-indexed weighted ranks: row at 0-indexed position i is the
    # value whose cumulative unit weight reaches i+1
    ranks = sorted({r for h in hs for r in (math.floor(h) + 1, math.ceil(h) + 1)})
    found = _select_with_infinities(
        vals, ranks, head, n, w_ninf, w_pinf,
        n_buckets, collect_limit, max_rounds,
    )
    out = []
    for h in hs:
        flo, fhi = found[math.floor(h) + 1], found[math.ceil(h) + 1]
        # explicit equal-rank return: the lerp below is NaN for two
        # equal infinities (inf - inf)
        out.append(flo if flo == fhi else flo + (fhi - flo) * (h - math.floor(h)))
    return out


def exact_ranks(
    df: DataFrame,
    col: str,
    ranks: Sequence[int],
    n_buckets: int = 8192,
    collect_limit: int = 200_000,
    max_rounds: int = 8,
) -> list[float]:
    """Exact order statistics at the given 1-indexed ranks — the
    DISCRETE counterpart of :func:`exact_quantiles`: every returned
    value is an element of the column (no interpolation), so the
    result is bit-reproducible in any engine that can sort (an
    interpolated quantile's last ulp depends on the engine's lerp
    formula; a selected element does not). Same bounded-memory
    narrowing engine, all ranks share each round's histogram job."""
    found, n = exact_ranks_n(
        df, col, lambda n: ranks,
        n_buckets=n_buckets, collect_limit=collect_limit,
        max_rounds=max_rounds,
    )
    if n == 0:
        raise ValueError("ranks must lie in [1, 0]")
    return found


def exact_ranks_n(
    df: DataFrame,
    col: str,
    ranks_fn,
    n_buckets: int = 8192,
    collect_limit: int = 200_000,
    max_rounds: int = 8,
) -> tuple[list[float], int]:
    """:func:`exact_ranks` with the ranks DERIVED from the row count:
    ``ranks_fn(n)`` receives the non-null count the engine's own
    head-stats scan measured and returns the 1-indexed ranks to select.

    This is the single-scan contract callers like equi-depth histograms
    need — deriving ranks from a separate ``count()`` job both costs an
    extra full scan and can disagree with the engine's n on a
    re-evaluated non-deterministic source, tripping the bounds check.
    Returns ``(values, n)``; ``([], 0)`` on an all-null column."""
    vals = (
        df.select(F.col(col).cast("double").alias("v"))
        .filter(F.col("v").isNotNull())
        .withColumn("w", F.lit(1).cast("long"))
    )
    head, n, w_ninf, w_pinf = _head_stats(vals, col, "exact_ranks")
    if n == 0:
        return [], 0
    ranks = list(ranks_fn(int(n)))
    rs = sorted(set(int(r) for r in ranks))
    if any(r < 1 or r > n for r in rs):
        raise ValueError(f"ranks must lie in [1, {n}]")
    found = _select_with_infinities(
        vals, rs, head, n, w_ninf, w_pinf,
        n_buckets, collect_limit, max_rounds,
    )
    return [found[int(r)] for r in ranks], int(n)


def exact_median(df: DataFrame, col: str, **kw) -> float:
    """Exact interpolated median with bounded memory."""
    return exact_quantiles(df, col, [0.5], **kw)[0]


def weighted_quantiles(
    df: DataFrame,
    col: str,
    weight_col: str,
    qs: Sequence[float],
    n_buckets: int = 8192,
    collect_limit: int = 200_000,
    max_rounds: int = 8,
) -> list[float]:
    """Exact LOWER weighted quantiles of ``df[col]`` under integer
    weights ``df[weight_col]``: for each q, the smallest value whose
    cumulative weight (in value order) reaches ``ceil(q * W)`` where W
    is the total weight — e.g. the token-weighted median document
    length. Bounded memory (module doc); weights must be positive
    integers (loud error otherwise — a silent cast would corrupt the
    mass distribution).
    """
    for q in qs:
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"quantile {q} outside [0, 1]")
    w = F.col(weight_col)
    vals = (
        df.select(
            F.col(col).cast("double").alias("v"),
            w.cast("long").alias("w"),
            (w.isNull() | (w.cast("double") != F.floor(w)) | (w <= 0))
            .cast("int").alias("bad_w"),
        )
        .filter(F.col("v").isNotNull())
    )
    bad = vals.agg(F.max("bad_w").alias("bad_w")).collect()[0].bad_w
    if bad:
        raise ValueError(
            f"weighted_quantiles: {weight_col!r} must be positive integers "
            "(NULL / non-integer / non-positive weight found)"
        )
    vals = vals.drop("bad_w")
    head, n, w_ninf, w_pinf = _head_stats(vals, col, "weighted_quantiles")
    if n == 0:
        return [float("nan")] * len(qs)
    total_w = int(head.total_w)
    # same double arithmetic as the oracle's CEIL(q * W)
    ranks = sorted({max(1, math.ceil(q * total_w)) for q in qs})
    found = _select_with_infinities(
        vals, ranks, head, total_w, w_ninf, w_pinf,
        n_buckets, collect_limit, max_rounds,
    )
    return [found[max(1, math.ceil(q * total_w))] for q in qs]


def weighted_median(df: DataFrame, col: str, weight_col: str, **kw) -> float:
    """Exact lower weighted median with bounded memory."""
    return weighted_quantiles(df, col, weight_col, [0.5], **kw)[0]


_NINF, _PINF = float("-inf"), float("inf")


def _finite_pred() -> Column:
    return (
        ~F.isnan("v")
        & (F.col("v") != F.lit(_NINF))
        & (F.col("v") != F.lit(_PINF))
    )


def _head_stats(vals: DataFrame, col: str, fname: str):
    """ONE job over (v, w): total/infinite weight masses, finite row
    count and min/max, NaN flag. Infinities are legal inputs — their
    ranks resolve arithmetically (module doc) — NaN is not."""
    fin = _finite_pred()
    row = vals.agg(
        F.coalesce(F.sum("w"), F.lit(0)).alias("total_w"),
        F.coalesce(
            F.sum(F.when(F.col("v") == F.lit(_NINF), F.col("w"))), F.lit(0)
        ).alias("w_ninf"),
        F.coalesce(
            F.sum(F.when(F.col("v") == F.lit(_PINF), F.col("w"))), F.lit(0)
        ).alias("w_pinf"),
        F.count(F.when(fin, F.lit(1))).alias("n_fin"),
        F.min(F.when(fin, F.col("v"))).alias("lo"),
        F.max(F.when(fin, F.col("v"))).alias("hi"),
        F.max(F.isnan("v").cast("int")).alias("has_nan"),
    ).collect()[0]
    if row.has_nan:
        raise ValueError(f"{fname}: NaN values in {col!r}")
    return row, int(row.total_w), int(row.w_ninf), int(row.w_pinf)


def _select_with_infinities(
    vals: DataFrame,
    ranks: list[int],
    head,
    W: int,
    w_ninf: int,
    w_pinf: int,
    n_buckets: int,
    collect_limit: int,
    max_rounds: int,
) -> dict[int, float]:
    """Route each 1-indexed weighted rank: the lowest ``w_ninf`` mass
    is -inf, the highest ``w_pinf`` mass is +inf, everything between
    narrows over the FINITE sub-range only. Without this split an
    infinite min/max makes every histogram width infinite and the
    refinement would degenerate to collecting every distinct value —
    the exact driver-buffering trap this module exists to avoid."""
    found: dict[int, float] = {}
    fin_ranks = set()
    for r in ranks:
        if r <= w_ninf:
            found[r] = _NINF
        elif r > W - w_pinf:
            found[r] = _PINF
        else:
            fin_ranks.add(r - w_ninf)
    if fin_ranks:
        sub = _select_ranks(
            vals.filter(_finite_pred()),
            sorted(fin_ranks),
            int(head.n_fin),
            float(head.lo),
            float(head.hi),
            n_buckets,
            collect_limit,
            max_rounds,
        )
        for r in ranks:
            if r not in found:
                found[r] = sub[r - w_ninf]
    return found


class _Bracket:
    """One rank-set's narrowing state: predicate chain (the truth), the
    affine frame for the next histogram, total weight strictly below
    the candidate set, row count (collectability) and weight of the
    set (from the last histogram)."""

    __slots__ = ("ranks", "pred", "lo", "hi", "w_below", "rows", "depth")

    def __init__(self, ranks, pred, lo, hi, w_below, rows, depth):
        self.ranks = ranks
        self.pred = pred
        self.lo = lo
        self.hi = hi
        self.w_below = w_below
        self.rows = rows
        self.depth = depth


def _select_ranks(
    vals: DataFrame,
    ranks: list[int],
    total_rows_hint: int,
    lo: float,
    hi: float,
    n_buckets: int,
    collect_limit: int,
    max_rounds: int,
) -> dict[int, float]:
    """Value at each 1-indexed WEIGHTED rank of ``vals`` (columns
    ``v`` double, ``w`` long): the smallest v whose cumulative weight
    in value order reaches the rank. Unit weights reduce to row order
    statistics."""
    found: dict[int, float] = {}
    if lo == hi:
        return {r: lo for r in ranks}
    open_brackets = [
        _Bracket(list(ranks), F.lit(True), lo, hi, 0, total_rows_hint, 0)
    ]

    while open_brackets:
        b = open_brackets.pop()
        if b.rows <= collect_limit:
            rows = sorted(
                (x.v, int(x.w)) for x in vals.filter(b.pred).collect()
            )
            assert len(rows) == b.rows, "histogram/collection drift"
            _resolve(found, b, rows)
            continue
        width = (b.hi - b.lo) / n_buckets
        if b.depth >= max_rounds or width <= 0.0 or not math.isfinite(width):
            # pinched by repeated values: resolve from (value, weight)
            pairs = sorted(
                (row.v, int(row.tw))
                for row in vals.filter(b.pred)
                .groupBy("v")
                .agg(F.sum("w").alias("tw"))
                .collect()
            )
            _resolve(found, b, pairs)
            continue
        bucket: Column = F.least(
            F.lit(n_buckets - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col("v") - F.lit(b.lo)) / F.lit(width)).cast("int"),
            ),
        )
        hist = (
            vals.filter(b.pred)
            .groupBy(bucket.alias("b"))
            .agg(F.sum("w").alias("tw"), F.count(F.lit(1)).alias("rc"))
            .collect()
        )
        weights = [0] * n_buckets
        rowcounts = [0] * n_buckets
        for row in hist:
            weights[int(row.b)] = int(row.tw)
            rowcounts[int(row.b)] = int(row.rc)
        # place each rank in its bucket; ranks sharing a bucket share
        # the child bracket (and therefore later jobs)
        cums = [0] * (n_buckets + 1)
        for i in range(n_buckets):
            cums[i + 1] = cums[i] + weights[i]
        children: dict[int, _Bracket] = {}
        for r in b.ranks:
            # local 1-indexed weighted target within this bracket
            t = r - b.w_below
            # rightmost bucket whose cumulative weight start is < t
            bi = _bucket_of(cums, t - 1)
            child = children.get(bi)
            if child is None:
                # frame widened a bucket each side; membership is the
                # predicate, the frame only shapes the next histogram
                child = _Bracket(
                    [],
                    b.pred & (bucket == F.lit(bi)),
                    b.lo + max(bi - 1, 0) * width,
                    min(b.lo + (bi + 2) * width, b.hi),
                    b.w_below + cums[bi],
                    rowcounts[bi],
                    b.depth + 1,
                )
                children[bi] = child
            child.ranks.append(r)
        open_brackets.extend(children.values())
    return found


def _resolve(
    found: dict[int, float], b: _Bracket, pairs: list[tuple[float, int]]
) -> None:
    """Walk sorted (value, weight) pairs to place every rank of the
    bracket: rank r lands on the first value whose local cumulative
    weight reaches r - w_below."""
    for r in b.ranks:
        t, cum = r - b.w_below, 0
        for v, wt in pairs:
            cum += wt
            if cum >= t:
                found[r] = v
                break
        else:  # pragma: no cover - histogram invariant
            raise AssertionError("rank beyond bracket weight")


def _bucket_of(cums: list[int], idx: int) -> int:
    """Largest bi with cums[bi] <= idx < cums[bi+1] (binary search)."""
    lo_i, hi_i = 0, len(cums) - 2
    while lo_i < hi_i:
        mid = (lo_i + hi_i + 1) // 2
        if cums[mid] <= idx:
            lo_i = mid
        else:
            hi_i = mid - 1
    return lo_i
