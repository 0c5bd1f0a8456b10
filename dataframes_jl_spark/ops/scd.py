"""Warehouse/product-analytics operators: SCD type-2 (collapse a change
log into validity intervals, apply update batches to a dimension) and
ordered funnel analysis over event streams.

The reference is a batch analytics engine with no warehouse-merge
surface; these are the beyond-reference completion of that family. Both
operators are pure DataFrame compositions — per-key windows and
broadcast-able joins — so they inherit Spark's partitioning: a key's
history lives in one task, keys parallelize freely.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_log(
    df: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str,
    tie_cols: Sequence[str] = (),
) -> DataFrame:
    """Collapse an append-only change log into SCD2 validity intervals.

    Consecutive rows (per key, ordered by ``ts_col`` then ``tie_cols``)
    with identical tracked attributes merge into one interval; each
    change point opens a new version. Output: key + attrs +
    ``valid_from`` (change-point timestamp) + ``valid_to`` (next
    change-point, NULL for the current version).

    Attribute comparison is null-safe (NULL == NULL holds), so a NULL
    attribute value does not open a new version on every row. One
    ``partitionBy(key)`` window pair — no SinglePartition, per-key
    history sequential by nature.
    """
    key_cols, attr_cols = list(key_cols), list(attr_cols)
    order = [F.col(ts_col), *[F.col(c) for c in tie_cols]]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    changed = F.lit(False)
    for c in attr_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    first = F.row_number().over(w) == 1
    starts = (
        df.withColumn("__start__", first | changed)
        .filter(F.col("__start__"))
        .select(*key_cols, *attr_cols, F.col(ts_col).alias("valid_from"), *tie_cols)
    )
    w2 = Window.partitionBy(*key_cols).orderBy(
        F.col("valid_from"), *[F.col(c) for c in tie_cols]
    )
    return starts.select(
        *key_cols,
        *attr_cols,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    )


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    eff_col: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Apply an update batch to an SCD2 dimension (one row per key in
    ``updates``; ``eff_col`` is the batch's effective timestamp column).

    - changed attributes: the open version is closed at the effective
      time and a new open version is inserted;
    - unchanged or absent keys: rows pass through untouched;
    - brand-new keys: inserted as open versions;
    - historical (already-closed) rows: pass through untouched.

    The updates side is a batch (usually small): Spark broadcasts it
    both ways; the dimension is never collected or rewritten beyond the
    touched keys' rows.

    The dimension must contain EXACTLY key + attr + from + to columns —
    anything else raises, because the merge projections would silently
    drop it (losing a surrogate key or audit column on every merge
    cycle is worse than failing loudly).
    """
    key_cols, attr_cols = list(key_cols), list(attr_cols)
    expected = set(key_cols) | set(attr_cols) | {from_col, to_col}
    extra = [c for c in dim.columns if c not in expected]
    if extra:
        raise ValueError(
            f"scd2_merge would silently drop dimension columns {extra}: "
            "list them in attr_cols (tracked) or project them out first"
        )
    cur = dim.filter(F.col(to_col).isNull())
    hist = dim.filter(F.col(to_col).isNotNull())
    up = updates.select(
        *[F.col(c).alias(f"__u_{c}") for c in key_cols],
        *[F.col(c).alias(f"__u_{c}") for c in attr_cols],
        F.col(eff_col).alias("__u_eff"),
    )
    cond = [F.col(k) == F.col(f"__u_{k}") for k in key_cols]
    joined = cur.join(up, cond, "full_outer")
    same = F.lit(True)
    for c in attr_cols:
        same = same & F.col(c).eqNullSafe(F.col(f"__u_{c}"))
    has_cur = F.col(from_col).isNotNull()
    has_up = F.col("__u_eff").isNotNull()
    # surviving current rows: untouched keys, unchanged keys, and the
    # closed-out predecessor of changed keys
    kept = joined.filter(has_cur).select(
        *key_cols,
        *attr_cols,
        F.col(from_col),
        F.when(has_up & ~same, F.col("__u_eff")).otherwise(F.col(to_col)).alias(
            to_col
        ),
    )
    # new open versions: changed keys and brand-new keys
    inserted = joined.filter(has_up & (~has_cur | ~same)).select(
        *[F.coalesce(F.col(f"__u_{k}"), F.col(k)).alias(k) for k in key_cols],
        *[F.col(f"__u_{c}").alias(c) for c in attr_cols],
        F.col("__u_eff").alias(from_col),
        F.lit(None).cast(dim.schema[to_col].dataType).alias(to_col),
    )
    return hist.select(*kept.columns).unionByName(kept).unionByName(inserted)


def funnel_steps(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: Sequence[str],
    within_seconds: float | None = None,
) -> DataFrame:
    """Ordered-funnel step times per user: for each user, the earliest
    time they completed step i STRICTLY AFTER completing step i-1.

    Output: one row per user with ``step_0 .. step_{k-1}`` timestamp
    columns (NULL = never reached).  A later step only counts if it
    happens after the user's earliest qualifying previous step — the
    standard ordered-funnel semantics, not mere per-step presence.
    ``within_seconds`` additionally bounds each step-to-step gap (the
    "converted within N hours" business question); the column must be
    a timestamp when it is set.

    Plan shape: ONE hash shuffle on the user key, then k chained
    Window projections over the same partitioning (Catalyst keeps them
    in a single exchange); no collect_list, so per-user state is k
    timestamps regardless of event volume.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col)
    t, ty = F.col(ts_col), F.col(type_col)
    # TIMESTAMP_NTZ cannot cast to double directly; hop through
    # TIMESTAMP_LTZ first (session tz pinned UTC by load_table) — the
    # same trap ops.joins.asof_join's tolerance path documents.
    is_ntz = dict(df.dtypes).get(ts_col) == "timestamp_ntz"

    def _secs(c):
        return (c.cast("timestamp") if is_ntz else c).cast("double")

    out = df
    for i, step in enumerate(steps):
        cond = ty == step
        if i > 0:
            prev = F.col(f"step_{i - 1}")
            cond = cond & (t > prev)
            if within_seconds is not None:
                cond = cond & (
                    _secs(t) - _secs(prev) <= F.lit(float(within_seconds))
                )
        out = out.withColumn(f"step_{i}", F.min(F.when(cond, t)).over(w))
    return out.groupBy(user_col).agg(
        *[F.min(f"step_{i}").alias(f"step_{i}") for i in range(len(steps))]
    )


def funnel_counts(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Funnel summary: users reaching each ordered step + conversion
    from the previous step. One row per step, in order.  The per-step
    rows come from ONE `inline` over the single aggregate row — never a
    union of k selects, which would re-execute the per-user lineage k
    times."""
    per_user = funnel_steps(df, user_col, type_col, ts_col, steps)
    agg = per_user.agg(
        *[
            F.count(F.col(f"step_{i}")).cast("long").alias(f"__n{i}__")
            for i in range(len(steps))
        ]
    )
    structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("step_idx"),
                F.lit(step).alias("step"),
                F.col(f"__n{i}__").alias("n_users"),
                (
                    # Zero-guard: an empty previous step must yield NULL
                    # conversion deterministically (ANSI sessions raise on
                    # x/0, and DuckDB/Spark disagree on the un-guarded
                    # result, breaking oracle parity).
                    F.when(
                        F.col(f"__n{i - 1}__") > 0,
                        F.col(f"__n{i}__") / F.col(f"__n{i - 1}__"),
                    )
                    if i > 0
                    else F.lit(1.0)
                ).alias("conversion"),
            )
            for i, step in enumerate(steps)
        ]
    )
    return agg.select(F.inline(structs))


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period: str = "month",
) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-activity
    period, tracked by how many are active N periods later.

    Output: (cohort, period_offset, n_active, retention) — one row per
    (cohort period, offset >= 0), retention = n_active / cohort size.
    Offsets are calendar-period differences (months or days).

    Plan shape: one user-key aggregate for cohort assignment (min
    timestamp), rejoined to the distinct (user, period) activity set —
    both keyed on the user, so the join reuses the aggregate's
    partitioning; then one small aggregate on (cohort, offset).
    """
    if period == "month":
        bucket = lambda c: F.date_trunc("month", c)  # noqa: E731
        offset = lambda a, b: F.months_between(a, b).cast("long")  # noqa: E731
    elif period == "day":
        bucket = lambda c: F.date_trunc("day", c)  # noqa: E731
        offset = lambda a, b: F.datediff(F.to_date(a), F.to_date(b)).cast("long")  # noqa: E731
    else:
        raise ValueError(f"period must be 'month' or 'day', got {period!r}")
    u, t = F.col(user_col), F.col(ts_col)
    cohorts = df.groupBy(user_col).agg(bucket(F.min(t)).alias("cohort"))
    activity = df.select(user_col, bucket(t).alias("p")).distinct()
    joined = activity.join(cohorts, on=user_col)
    per_cell = joined.groupBy(
        "cohort", offset(F.col("p"), F.col("cohort")).alias("period_offset")
    ).agg(F.count_distinct(user_col).alias("n_active"))
    sizes = per_cell.filter(F.col("period_offset") == 0).select(
        F.col("cohort").alias("__c__"), F.col("n_active").alias("__size__")
    )
    return (
        per_cell.join(F.broadcast(sizes), F.col("cohort") == F.col("__c__"))
        .select(
            "cohort",
            "period_offset",
            "n_active",
            (F.col("n_active") / F.col("__size__")).alias("retention"),
        )
    )


def scd2_lookup(
    fact: DataFrame,
    dim: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    attr_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Point-in-time dimension lookup: attach to each fact row the SCD2
    version that was valid AT the fact's timestamp
    (``valid_from <= ts < valid_to``, open-ended current versions
    included).  This is the reason SCD2 history exists — joining a fact
    to today's attributes silently rewrites the past.

    Scale path: an as-of join on ``valid_from`` per key (ONE union-
    merge shuffle, no range nested loop — ops.joins.asof_join), then a
    null-out where the matched version had already been closed before
    the fact's time.  Left-join semantics: facts before the key's first
    version, or falling in a gap, keep NULL attributes.
    """
    from .joins import asof_join

    key_cols = list(key_cols)
    if attr_cols is None:
        attr_cols = [
            c for c in dim.columns
            if c not in set(key_cols) | {from_col, to_col}
        ]
    # the attributes come back under their own names: a fact column
    # sharing a dim attribute's name would collide after the rename —
    # fail loudly (same policy as scd2_merge) instead of producing an
    # ambiguous frame
    clash = [c for c in attr_cols if c in fact.columns]
    if clash:
        raise ValueError(
            f"scd2_lookup: fact columns {clash} collide with dimension "
            "attributes — rename them on one side first"
        )
    # zero-length versions (valid_from == valid_to, which scd2_from_log
    # legitimately emits for same-timestamp changes) can never satisfy
    # valid_from <= ts < valid_to; dropping them up front also removes
    # the only possible same-valid_from tie in the as-of match
    live = dim.filter(
        F.col(to_col).isNull() | (F.col(to_col) > F.col(from_col))
    )
    right = live.select(
        *key_cols, F.col(from_col).alias("__vf__"), F.col(to_col).alias("__vt__"),
        *attr_cols,
    ).withColumnRenamed("__vf__", ts_col)
    out = asof_join(
        fact,
        right,
        on=ts_col,
        by=key_cols,
        direction="backward",
        right_cols=["__vt__", *attr_cols],
        suffix="__scd2__",
    )
    for c in ["__vt__", *attr_cols]:
        out = out.withColumnRenamed(f"{c}__scd2__", c)
    # the as-of match is the latest version OPENED at/before ts; if that
    # version was already closed (valid_to <= ts), the fact falls in a
    # gap — blank the attributes, exactly like an unmatched left row
    stale = F.col("__vt__").isNotNull() & (F.col("__vt__") <= F.col(ts_col))
    cleaned = out
    for c in attr_cols:
        cleaned = cleaned.withColumn(
            c, F.when(stale, F.lit(None).cast(dim.schema[c].dataType)).otherwise(F.col(c))
        )
    # drop the helper AND the matched valid_from the as-of join emits —
    # neither is part of the documented output schema
    return cleaned.drop("__vt__", f"{ts_col}__scd2__")


def survivorship(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    cols: Sequence[str] | None = None,
) -> DataFrame:
    """Golden-record (survivorship) merge: collapse every key's row
    versions to ONE record taking, per column independently, the value
    from the LATEST row where that column is non-NULL — the standard
    MDM rule ("most recent known value per field"), which a plain
    "latest row wins" gets wrong the moment the newest row has gaps.

    ``order_by`` defines recency (later = higher), with the FULL tuple
    required to be unique per key (pass a row id as the last element —
    an ambiguous tie would make "the latest non-null" nondeterministic;
    this is the same determinism contract as sorting.global_row_number).

    Implementation: one ``row_number`` window over (keys, order_by) to
    turn recency into a dense int, then ONE aggregate with per-column
    ``max_by(col, rn) FILTER (WHERE col IS NOT NULL)`` — a single
    shuffle on the key for the window and a map-side-combining agg on
    the same key (AQE coalesces the second exchange; the partitioning
    is reused). No join, no collect; |keys| rows out.

    Returns one row per key: the key columns, every payload column's
    survivor value, ``n_versions``, and ``last_rn`` (= n_versions, an
    invariant the tests pin).
    """
    keys = list(keys)
    order_by = list(order_by)
    if not keys or not order_by:
        raise ValueError("survivorship needs keys and order_by")
    if cols is None:
        cols = [c for c in df.columns if c not in keys and c not in order_by]
    cols = list(cols)
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_by])
    ranked = df.select(
        *keys, *cols, F.row_number().over(w).alias("__rn__")
    )
    survivors = [
        F.expr(
            f"max_by(`{c}`, __rn__) FILTER (WHERE `{c}` IS NOT NULL)"
        ).alias(c)
        for c in cols
    ]
    return ranked.groupBy(*keys).agg(
        *survivors,
        F.count(F.lit(1)).alias("n_versions"),
        F.max("__rn__").alias("last_rn"),
    )
