"""Scale-adaptive partitioning helpers.

One rule, used by every CPU-bound map-only lane: an UNDER-partitioned
input (a single-file scan, a collapsed post-AQE exchange) must be
spread before an expensive per-row kernel — but an input that is
already parallel must NOT pay a second exchange, and a TINY input must
not be sliced into ``defaultParallelism`` near-empty tasks whose
scheduling costs more than the work (r15 verdict #2: blind
spread-to-parallelism inverse-scaled the small lanes at local[32]).
At 100 TB every source has thousands of splits and :func:`spread` is
the identity; locally it is what keeps a one-file table from
serializing a heavy projection onto one core.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# Logical operators through which a partition-count probe is safe:
# none of them puts an exchange (or an eagerly-materialized AQE stage)
# between the probe and the leaves, so ``df.rdd.getNumPartitions()``
# only runs cheap physical planning over the scan. Anything else —
# joins, aggregates, repartitions, windows — means probing would
# finalize/execute upstream shuffle stages at DataFrame-construction
# time (the r15 ADVICE eager-execution hazard), and those inputs are
# already parallel (their exchange is at defaultParallelism), so
# spread returns them unchanged instead of probing.
_PROBE_SAFE_NODES = frozenset(
    {
        "Project",
        "Filter",
        "Relation",
        "LogicalRelation",
        "LocalRelation",
        "InMemoryRelation",
        "Union",
        "Sample",
        "Generate",
        "SubqueryAlias",
        "ResolvedHint",
    }
)

_NODE_RE = re.compile(r"^[\s:+\-*]*'?([A-Za-z][A-Za-z0-9_]*)", re.M)


def _optimized_plan(df: DataFrame):
    return df._jdf.queryExecution().optimizedPlan()


def _plan_nodes(jplan) -> set[str]:
    return set(_NODE_RE.findall(jplan.treeString()))


def _plan_size_bytes(jplan) -> int | None:
    """Catalyst's sizeInBytes estimate for the optimized plan — pure
    statistics propagation (file sizes x projection-width ratios), no
    execution, no extra planning pass."""
    try:
        sz = jplan.stats().sizeInBytes()
        return sz if isinstance(sz, int) else int(sz.toString())
    except Exception:
        return None


def spread(
    df: DataFrame,
    min_partitions: int | None = None,
    bytes_per_task: int | None = None,
) -> DataFrame:
    """Repartition ``df`` up to a target partition count ONLY when its
    current plan yields fewer partitions. Shuffles exactly the columns
    ``df`` carries — callers should project narrow FIRST (guide §2.3:
    never ship a payload column through an exchange whose only purpose
    is parallelism).

    Target: ``min_partitions`` (default: the cluster's default
    parallelism), additionally capped by estimated data volume when
    ``bytes_per_task`` is given — ``ceil(est_bytes / bytes_per_task)``
    partitions, so a tiny input gets a few real tasks instead of
    ``parallelism`` near-empty ones (guide §2.5; the estimate is
    Catalyst's sizeInBytes, a compressed-file-size-based lower bound,
    so choose ``bytes_per_task`` for the KERNEL's cost per input byte,
    not for the 128 MB scan-split rule of thumb).

    Inputs whose plan contains anything beyond scan/project/filter-
    shaped operators are returned unchanged without probing: their
    exchange already ran at cluster parallelism, and probing a
    shuffle-bearing plan with ``df.rdd`` would eagerly materialize AQE
    stages at construction time (r15 ADVICE hazard).
    """
    sc = df.sparkSession.sparkContext
    par = min_partitions or sc.defaultParallelism
    jplan = _optimized_plan(df)
    if not _plan_nodes(jplan) <= _PROBE_SAFE_NODES:
        return df
    target = par
    if bytes_per_task:
        est = _plan_size_bytes(jplan)
        if est is not None and 0 <= est < (1 << 60):
            target = min(par, max(1, -(-est // int(bytes_per_task))))
    if target <= 1 or df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
