"""Snapshot diff: compare two versions of a keyed table.

The data-ops question behind every pipeline rerun — "what changed
between yesterday's table and today's?" — is ONE full-outer equi-join
on the key with null-safe column comparison. At 100 TB both sides
shuffle on the same key (or join exchange-free if both snapshots were
bucket-written on it, io/parquet.py:save), so the diff costs what one
join costs; no driver materialization, no row hashing that an oracle
engine could not replay (null-safe column equality is portable SQL —
``IS NOT DISTINCT FROM`` — where a private 64-bit row hash is not).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _nullsafe_key_cond(
    left_alias: str, right_alias: str, keys: Sequence[str]
) -> Column:
    """``AND`` of per-key null-safe equalities between two aliased sides."""
    cond = F.lit(True)
    for k in keys:
        cond = cond & F.col(f"{left_alias}.{k}").eqNullSafe(
            F.col(f"{right_alias}.{k}")
        )
    return cond


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-status diff of two keyed snapshots.

    Returns one row per key present in either side: the key columns,
    ``status`` in ``added`` (key only in ``new``), ``removed`` (only in
    ``old``), ``changed`` (both, any compared column differs under
    null-safe equality), ``unchanged`` — plus every compared column in
    its ``old_``/``new_`` form for changed-row inspection.

    ``compare_cols`` defaults to all shared non-key columns; the keys
    must be unique per side (a duplicate key makes "the" old/new row
    ill-defined — enforce upstream with exact dedup).
    """
    keys = list(keys)
    if not keys:
        raise ValueError("table_diff needs at least one key column")
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in keys]
    compare_cols = list(compare_cols)

    o = old.select(
        *keys,
        F.lit(1).alias("__in_old__"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    ).alias("__o__")
    n = new.select(
        *keys,
        F.lit(1).alias("__in_new__"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    ).alias("__n__")
    # Null-safe key equality (<=>): a NULL key is a value like any other,
    # so a NULL-keyed row pairs with its counterpart instead of splitting
    # into a spurious added+removed pair. Spark still plans <=> join keys
    # as an equi-join (SMJ/BHJ), so the one-shuffle cost claim holds.
    cond = _nullsafe_key_cond("__o__", "__n__", keys)
    j = o.join(n, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"__o__.{k}"), F.col(f"__n__.{k}")).alias(k)
            for k in keys
        ],
        "__in_old__",
        "__in_new__",
        *[f"old_{c}" for c in compare_cols],
        *[f"new_{c}" for c in compare_cols],
    )
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    status = (
        F.when(F.col("__in_old__").isNull(), F.lit("added"))
        .when(F.col("__in_new__").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        *keys,
        status.alias("status"),
        *[F.col(f"old_{c}") for c in compare_cols],
        *[F.col(f"new_{c}") for c in compare_cols],
    )


def apply_diff(
    snapshot: DataFrame,
    changeset: DataFrame,
    keys: Sequence[str],
    status_col: str = "status",
    new_prefix: str = "new_",
) -> DataFrame:
    """Apply a :func:`table_diff`-shaped changeset to ``snapshot`` —
    the inverse operation, so ``apply_diff(old, table_diff(old, new))``
    reproduces ``new`` exactly (the gate asserts this identity).

    The changeset carries ``status`` in added/removed/changed/unchanged
    and the ``new_``-prefixed payload columns. Semantics (CDC
    last-writer-wins):

    - keys marked ``removed`` are dropped;
    - keys marked ``added``/``changed`` take the changeset's ``new_``
      values (upsert);
    - keys absent from the changeset — or present as ``unchanged`` —
      keep the snapshot row.

    One left join on the key (both sides shuffle once; exchange-free if
    both were bucket-written on the key), then a column-wise coalesce:
    no windows, no driver state, the cost of one join at any scale.
    """
    keys = list(keys)
    if not keys:
        raise ValueError("apply_diff needs at least one key column")
    payload = [c for c in snapshot.columns if c not in keys]
    missing = [c for c in payload if new_prefix + c not in changeset.columns]
    if missing:
        raise ValueError(
            f"changeset lacks {new_prefix}* columns for {missing}"
        )
    ch = changeset.select(
        *keys,
        F.col(status_col).alias("__st__"),
        *[F.col(new_prefix + c).alias(f"__nv_{c}__") for c in payload],
    )
    # Null-safe joins throughout so NULL key values round-trip the
    # documented identity apply(old, diff(old, new)) == new: a plain
    # equi-join never matches NULL keys, which would let a NULL-keyed
    # 'removed' row survive and duplicate a NULL-keyed 'added' row.
    s = snapshot.alias("__s__")
    c_ = ch.alias("__c__")
    j = s.join(
        c_, _nullsafe_key_cond("__s__", "__c__", keys), "left"
    ).filter(F.col("__st__").isNull() | (F.col("__st__") != "removed"))
    take_new = F.col("__st__").isin("added", "changed")
    updated = j.select(
        *[F.col(f"__s__.{k}").alias(k) for k in keys],
        *[
            F.when(take_new, F.col(f"__nv_{c}__"))
            .otherwise(F.col(f"__s__.{c}"))
            .alias(c)
            for c in payload
        ],
    )
    inserts = (
        ch.filter(F.col("__st__") == "added")
        .alias("__c__")
        .join(
            snapshot.select(*keys).alias("__s__"),
            _nullsafe_key_cond("__c__", "__s__", keys),
            "anti",
        )
        .select(*keys, *[F.col(f"__nv_{c}__").alias(c) for c in payload])
    )
    return updated.unionByName(inserts)


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Per-status row counts of :func:`table_diff` — the one-look
    answer ("12 added, 3 changed, 0 removed") that gates a publish."""
    d = table_diff(old, new, keys, compare_cols)
    return d.groupBy("status").agg(F.count(F.lit(1)).alias("n"))
