"""Referential-integrity audit: orphan foreign keys, NULL rates, and
parent-key duplication across table relations.

Beyond-reference operator: the data-contract check every pipeline runs
before publishing — "does every lineitem point at a real part?" — as
one row per declared relation.

Scale shape, per relation: the child aggregates map-side to its
DISTINCT fk values WITH counts first (|distinct keys| rows move, not
|child| rows), then ONE equi-join against the parent's distinct keys
answers both orphan questions; totals ride along in single-row
broadcast frames. Nothing proportional to the child's row count
crosses the wire after the first combine, no driver state, and the
per-relation results union into one report.

(If the parent is known-small a broadcast join is free via AQE; the
code does not force it — at 100 TB a parent can be the big side.)
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_relation(
    name: str,
    child: DataFrame,
    fk: str,
    parent: DataFrame,
    pk: str,
) -> DataFrame:
    """One-row integrity report for ``child.fk -> parent.pk``.

    Columns: ``relation, n_child, n_null_fk, n_orphan_rows,
    n_orphan_keys, n_parent, n_parent_dup_keys, orphan_rate`` — where
    orphan rows/keys are child rows / distinct fk values with a
    non-NULL fk that matches no parent key, and ``n_parent_dup_keys``
    counts parent keys that appear more than once (a duplicated pk is
    an integrity defect even when no child is orphaned).
    ``orphan_rate`` is over non-NULL child rows, floor-quantized to 6
    decimals (engine-stable ratio of exact longs).
    """
    fkeys = (
        child.select(F.col(fk).alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    pkeys = (
        parent.select(F.col(pk).alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_pk"))
    )
    joined = fkeys.join(pkeys, "k", "left")
    orphan = joined.agg(
        F.coalesce(F.sum("n_rows"), F.lit(0)).alias("n_nonnull"),
        F.coalesce(
            F.sum(F.when(F.col("n_pk").isNull(), F.col("n_rows"))), F.lit(0)
        ).alias("n_orphan_rows"),
        F.coalesce(
            F.sum(F.when(F.col("n_pk").isNull(), 1)), F.lit(0)
        ).alias("n_orphan_keys"),
    )
    child_tot = child.agg(
        F.count(F.lit(1)).alias("n_child"),
        F.sum(F.col(fk).isNull().cast("long")).alias("n_null_fk"),
    )
    parent_tot = pkeys.agg(
        F.coalesce(F.sum("n_pk"), F.lit(0)).alias("n_parent"),
        F.coalesce(
            F.sum(F.when(F.col("n_pk") > 1, 1)), F.lit(0)
        ).alias("n_parent_dup_keys"),
    )
    m = F.lit(1e6)
    rate = F.when(
        F.col("n_nonnull") > 0,
        F.floor(F.col("n_orphan_rows") / F.col("n_nonnull") * m + F.lit(0.5))
        / m,
    ).otherwise(F.lit(0.0))
    return (
        orphan.crossJoin(F.broadcast(child_tot))
        .crossJoin(F.broadcast(parent_tot))
        .select(
            F.lit(name).alias("relation"),
            "n_child",
            "n_null_fk",
            "n_orphan_rows",
            "n_orphan_keys",
            "n_parent",
            "n_parent_dup_keys",
            rate.alias("orphan_rate"),
        )
    )


def integrity_report(
    relations: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Union of :func:`check_relation` over ``(name, child, fk, parent,
    pk)`` tuples — the table a publish gate reads."""
    if not relations:
        raise ValueError("integrity_report needs at least one relation")
    return reduce(
        DataFrame.unionByName,
        [check_relation(*r) for r in relations],
    )


# Benford first-digit frequencies log10(1 + 1/d), d = 1..9, as ppm
# LITERALS (computed once here, never via in-engine log10 — libm log
# is not correctly-rounded, so an in-plan log10 could differ by an ulp
# between engines; nine constants cannot).
_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def benford_audit(
    df: DataFrame,
    col: str,
    cents_scale: int = 2,
) -> DataFrame:
    """First-significant-digit distribution of a positive numeric
    column against Benford's law — the classic fabricated-/synthetic-
    data smell test for financial and count columns.

    Returns 9 rows ``(digit, n_values, obs_ppm, exp_ppm, dev_ppm)``:
    observed and expected frequency in parts-per-million, and their
    signed difference. Rows with NULL or ``<= 0`` values are excluded
    (Benford is defined on positive magnitudes).

    Determinism: the value is quantized to integer units
    (``·10^cents_scale``, floor+0.5) and the first digit is the first
    character of the INTEGER's decimal rendering — integer-to-string is
    exact and identical in every engine, where ``floor(x / 10^floor(
    log10 x))`` would hinge on libm log10 at exact powers of ten. The
    expected ppm are nine literal constants (see ``_BENFORD_PPM``).
    obs_ppm is floor(n·10^6/total + 0.5) computed in double — exact for
    n < 2^53, i.e. any table this side of 9e15 rows.

    Scale shape: nine conditional counters in ONE map-side-combining
    aggregate row (so zero-mass digits cost nothing extra), inline-
    unpivoted to the 9 output rows. No join, no window; nothing but
    nine longs crosses the single exchange.
    """
    m = F.lit(float(10**cents_scale))
    units = F.floor(F.col(col).cast("double") * m + F.lit(0.5)).cast("long")
    digit = F.substring(units.cast("string"), 1, 1).cast("int")
    # the 9-row contract is load-bearing: a digit with ZERO observations
    # is the loudest Benford anomaly, and a grouped output simply omits
    # it — so count all nine digits as conditional counters in ONE
    # map-side-combining aggregate row (zero included for free), then
    # inline-unpivot to 9 rows. No join, no window, one exchange.
    one = (
        df.filter(F.col(col).isNotNull() & (F.col(col) > 0))
        # digit 0 exists only when the value quantizes to 0 (0.001 at
        # scale 2); it is excluded like non-positive values
        .select(digit.alias("d"))
        .agg(
            *[
                F.count(F.when(F.col("d") == d, F.lit(1))).alias(f"n{d}")
                for d in range(1, 10)
            ]
        )
        .withColumn(
            "total", sum(F.col(f"n{d}") for d in range(1, 10)).cast("double")
        )
    )
    rows = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("digit"),
                        F.col(f"n{d}").alias("n_values"),
                    )
                    for d in range(1, 10)
                ]
            )
        ).alias("e"),
        "total",
    ).select("e.digit", "e.n_values", "total")
    exp_ppm = F.create_map(
        *[F.lit(x) for kv in _BENFORD_PPM.items() for x in kv]
    )[F.col("digit")]
    # 9 rows exist even on an EMPTY input, where total=0 — guard the
    # ratio (ANSI raises on /0) and report obs_ppm=0
    obs_ppm = F.when(
        F.col("total") > 0,
        F.floor(
            F.col("n_values").cast("double") * F.lit(1e6) / F.col("total")
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return rows.select(
        "digit",
        "n_values",
        obs_ppm.alias("obs_ppm"),
        exp_ppm.alias("exp_ppm"),
        (obs_ppm - exp_ppm).alias("dev_ppm"),
    )
