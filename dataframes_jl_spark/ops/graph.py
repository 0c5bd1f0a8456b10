"""Graph analytics over edge tables: PageRank.

(The other graph op this engine ships — connected components via
min-label propagation with pointer doubling — lives in
``llm.dedup.dedup_clusters``, where dedup pair-resolution needed it.)

PageRank here is the fixed-iteration power method with damping and NO
dangling-mass redistribution (nodes without out-edges leak their rank —
the common simplified convention; document/normalize downstream if the
graph has many sinks).

Determinism contract: per-target contribution sums are int64-quantized
(floor(x * 10^scale + 0.5), summed as longs) before the damped update,
so every iteration — and therefore the final ranks — is a pure function
of the graph, independent of partitioning and engine.  A DuckDB oracle
can replay all iterations as chained CTEs and match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 5,
    damping: float = 0.85,
    scale: int = 9,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge list. Output: (id, rank).

    Plan shape per iteration: one join of the edge table to the current
    ranks on the source key and one hash aggregate on the destination —
    both keyed shuffles AQE can co-partition; ranks are
    ``localCheckpoint``-ed each round so the lineage stays O(1) instead
    of growing by two joins per iteration (the classic iterative-Spark
    trap).  Driver holds nothing but the loop counter.
    """
    m = float(10**scale)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    n = verts.count()
    if n == 0:
        raise ValueError(
            "pagerank: empty edge set (no vertices) — an upstream filter "
            "probably matched nothing"
        )
    outdeg = e.groupBy(F.col("src").alias("od_id")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    # degree-annotated edges materialized ONCE: every iteration joins
    # ranks against this, instead of re-scanning + re-deduping +
    # re-aggregating the raw edge table n_iter times. localCheckpoint
    # also leaves the frame hash-partitioned on src, so the
    # per-iteration ranks join reuses the layout.
    e_deg = (
        e.join(outdeg, e.src == F.col("od_id"))
        .select("src", "dst", "outdeg")
        .localCheckpoint()
    )
    base = float((1.0 - damping) / n)
    ranks = verts.select("id", F.lit(1.0 / n).alias("rank")).localCheckpoint()
    for _ in range(n_iter):
        contribs = (
            e_deg.join(ranks, e_deg.src == ranks.id)
            .select(
                F.col("dst"),
                F.floor(
                    F.col("rank") / F.col("outdeg") * F.lit(m) + F.lit(0.5)
                ).cast("long").alias("qc"),
            )
        )
        sums = contribs.groupBy("dst").agg(F.sum("qc").alias("qsum"))
        ranks = (
            verts.join(sums, verts.id == sums.dst, "left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping) * (F.coalesce(F.col("qsum"), F.lit(0)) / F.lit(m))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def pagerank_oracle_sql(
    edges_sql: str,
    n_iter: int = 5,
    damping: float = 0.85,
    scale: int = 9,
) -> str:
    """DuckDB SQL replaying :func:`pagerank` exactly: the same quantized
    update chained as one CTE pair per iteration.  ``edges_sql`` must
    select columns (src, dst)."""
    m = f"1e{scale}"
    parts = [
        f"WITH e AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        ", verts AS (SELECT src AS id FROM e UNION SELECT dst FROM e)",
        ", n AS (SELECT COUNT(*) AS n FROM verts)",
        ", outdeg AS (SELECT src AS od_id, COUNT(*) AS outdeg FROM e GROUP BY src)",
        ", r0 AS (SELECT id, 1.0 / n.n AS rank FROM verts, n)",
    ]
    for i in range(n_iter):
        parts.append(
            f""", s{i + 1} AS (
      SELECT dst, SUM(CAST(FLOOR(r.rank / outdeg * {m} + 0.5) AS BIGINT)) AS qsum
      FROM e JOIN r{i} r ON r.id = e.src
      JOIN outdeg ON od_id = e.src
      GROUP BY dst
    )"""
        )
        parts.append(
            f""", r{i + 1} AS (
      SELECT v.id,
             (1.0 - {damping}) / n.n
               + {damping} * (CAST(COALESCE(s.qsum, 0) AS DOUBLE) / {m}) AS rank
      FROM verts v CROSS JOIN n LEFT JOIN s{i + 1} s ON s.dst = v.id
    )"""
        )
    parts.append(f"SELECT id, rank FROM r{n_iter}")
    return "\n".join(parts)


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Global triangle count of the UNDIRECTED simple graph spanned by
    an edge list (self-loops dropped, direction and multiplicity
    collapsed). Output: one row ``(n_nodes, n_edges, n_triangles)``.

    The clustering-backbone statistic (community quality, spam/bot
    subgraph detection). Algorithm: compact-forward with DEGREE
    ORIENTATION (Latapy 2008, public) — orient every undirected edge
    from its lower-(degree, id) endpoint to the higher one, so each
    triangle {a,b,c} is generated by exactly one wedge and, crucially,
    every node's OUT-degree is O(sqrt(m)) no matter how skewed the raw
    degree distribution is: a celebrity node with 10^7 neighbours
    receives its wedges from low-degree sources instead of exploding
    10^14 wedge pairs on one key. Plan: two self-joins of the oriented
    edge table (wedge build + closing-edge semi check), all keyed
    equi-joins, no windows, no driver state.

    Both bounded edge tables persist (MEMORY_AND_DISK): ``und`` feeds
    the degree aggregate AND the orientation join, and ``oriented``
    feeds THREE branches (both wedge sides + the closing-edge probe) —
    unpersisted, Spark re-ran the whole distinct+degree+join pipeline
    per branch (ReuseExchange only matches identical exchanges), which
    is where the sf10 wall's 54–113 s draw-to-draw volatility lived.
    Caller/clearCache owns unpersisting (the with_running contract).

    Caching contract: this function ``persist(MEMORY_AND_DISK)``-s a
    bounded intermediate that feeds multiple plan branches and does
    NOT unpersist it (the result is lazy; unpersisting before the
    caller's action would void the cache). The handle is attached to
    the result as ``unpersist_handles`` (core.cache.hold); release it
    with ``dataframes_jl_spark.release(result)`` once the result is
    consumed (or session-wide ``spark.catalog.clearCache()``).
    """
    from pyspark import StorageLevel

    u = F.least(F.col(src), F.col(dst)).alias("u")
    v = F.greatest(F.col(src), F.col(dst)).alias("v")
    und = (
        edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .filter(F.col(src) != F.col(dst))
        .select(u, v)
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = (
        und.select(F.col("u").alias("id"))
        .unionAll(und.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum("deg") / 2).cast("long").alias("n_edges"),
    )
    du = deg.select(F.col("id").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("dv"))
    ann = und.join(du, "u").join(dv, "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ann.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    e1 = oriented
    e2 = oriented.select(F.col("a").alias("b"), F.col("b").alias("c"))
    wedges = e1.join(e2, "b").select("a", "b", "c")
    closing = oriented.select(F.col("a"), F.col("b").alias("c"))
    tri = wedges.join(closing, ["a", "c"], "semi").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    from ..core.cache import hold

    return hold(
        stats.crossJoin(F.broadcast(tri)).select(
            "n_nodes", "n_edges", "n_triangles"
        ),
        und,
        oriented,
    )


def degree_assortativity(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    out_scale: int = 6,
) -> DataFrame:
    """Degree assortativity coefficient of the undirected simple graph:
    the Pearson correlation of endpoint degrees over all edge stubs
    (each undirected edge contributes BOTH (d_u, d_v) and (d_v, d_u) —
    the standard definition, which also makes the statistic symmetric
    by construction). Positive = hubs link to hubs (social graphs),
    negative = hubs link to leaves (the web, spam/bot subgraphs) —
    the one-number homophily audit of any entity graph.

    Determinism: the five Pearson sums (Σx, Σy=Σx, Σxy, Σx², Σy²=Σx²)
    are EXACT decimal(38,0) sums of integer degree products; only the
    final correlation arithmetic (+,-,*,/ and sqrt — all correctly-
    rounded IEEE) touches floats, so the quantized coefficient is
    bit-identical in any engine. 38 digits hold Σd_u·d_v for any graph
    this side of 10^12 edges with 10^7-degree hubs.

    Scale shape: one degree aggregate, two broadcast-friendly joins to
    annotate edges, one map-side-combining sum to a single row — the
    same cost class as a degree histogram, nothing quadratic.
    """
    u = F.least(F.col(src), F.col(dst)).alias("u")
    v = F.greatest(F.col(src), F.col(dst)).alias("v")
    und = (
        edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .filter(F.col(src) != F.col(dst))
        .select(u, v)
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("id"))
        .unionAll(und.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("id").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("dv"))
    ann = und.join(du, "u").join(dv, "v")
    # both stub directions in one pass: symmetric sums collapse to
    # sx (= sy) and sxx (= syy); only sxy needs the cross product
    dec = "decimal(38,0)"
    agg = ann.agg(
        (F.count(F.lit(1)) * 2).alias("n_stubs"),
        F.sum((F.col("du") + F.col("dv")).cast(dec)).alias("sx"),
        F.sum(
            (F.lit(2).cast(dec) * F.col("du").cast(dec) * F.col("dv").cast(dec))
        ).alias("sxy"),
        F.sum(
            (
                F.col("du").cast(dec) * F.col("du").cast(dec)
                + F.col("dv").cast(dec) * F.col("dv").cast(dec)
            )
        ).alias("sxx"),
    )
    n = F.col("n_stubs").cast("double")
    sx = F.col("sx").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    num = n * sxy - sx * sx
    den = n * sxx - sx * sx
    m = F.lit(float(10**out_scale))
    r = F.when(den > 0, num / den).otherwise(F.lit(0.0))
    return agg.select(
        "n_stubs",
        (F.floor(r * m + F.lit(0.5)) / m).alias("assortativity"),
    )
