"""Similarity search over embedding columns (array<float>).

- **brute_force_topk**: exact cosine top-k per query — the baseline.
  Dot products via zip_with/aggregate stay JVM-side; ranking is a
  per-query window (partition by query id — scales out).
- **lsh_topk**: random-hyperplane LSH bucketing as the scale path:
  candidates share a signature prefix bucket, exact cosine only within
  buckets + multiprobe neighbor buckets. Recall < 1 by construction;
  parameters trade recall for the candidate-set size bound.

At 100 TB the brute-force path is only for a broadcast-sized query set
(cross join = |Q|×|C| — fine when Q is small and broadcast); the LSH
path bounds work per query by bucket occupancy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns, JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity, NULL for zero-norm inputs. The guard matters:
    0/0 is NaN, and Spark orders NaN LARGER than any number, so an
    unguarded zero vector would rank above every real neighbor and pass
    >=threshold filters. try_divide evaluates the quotient ONCE (a
    when() guard on the denominator would re-run both norm aggregates
    per row), yields NULL instead of raising on a zero denominator
    under an ANSI session, and the same NULL under a permissive one;
    nanvl then maps a NaN dot (NaN vector components) to NULL too."""
    return F.nanvl(
        F.try_divide(dot(a, b), norm(a) * norm(b)),
        F.lit(None).cast("double"),
    )


def safe_cos_div(num: Column, denom: Column) -> Column:
    """num/denom with NULL (not NaN/Inf) when denom is zero."""
    return F.when(denom != 0, num / denom)


def _as_double(c: Column) -> Column:
    return c.cast("array<double>")


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cos_sim, rank).

    Self-search convention: a row never matches itself (query_id !=
    neighbor_id). Ties broken by neighbor id for determinism.
    """
    from ..core.partition import spread

    q = queries.select(
        F.col(q_id).alias("query_id"), _as_double(F.col(q_vec)).alias("qv")
    )
    # the corpus side streams the broadcast-nested-loop cosine: a
    # single-file corpus scan would run every dot product on one core
    # (guide §2.5 input-skew fix; spread is the identity at scale)
    c = spread(
        corpus.select(
            F.col(c_id).alias("neighbor_id"), _as_double(F.col(c_vec)).alias("cv")
        )
    )
    if broadcast_queries:
        q = F.broadcast(q)
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _plane_normals(dim: int, num_planes: int, seed: int) -> list[list[float]]:
    """Deterministic gaussian hyperplane normals (fixed seed → identical
    buckets across runs/engines), shipped as plan literals."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num_planes)]


def hyperplane_signature(
    vec: Column, dim: int, num_planes: int = 16, seed: int = 7
) -> Column:
    """Random-hyperplane sign signature as an int bucket id.

    Normals are precomputed driver-side and inlined as literal arrays —
    the per-row work is num_planes × dim multiplies in codegen, no
    hashing. ``vec`` should be a materialized attribute (not an inlined
    expression): it is referenced once per plane.
    """
    planes = _plane_normals(dim, num_planes, seed)
    sig: Column = F.lit(0).cast("bigint")
    for plane in planes:
        normal = F.array(*[F.lit(float(x)) for x in plane])
        d = F.aggregate(
            F.zip_with(vec, normal, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig * 2 + F.when(d >= 0, 1).otherwise(0)
    return sig


def lsh_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 12,
    num_tables: int = 4,
) -> DataFrame:
    """Approximate self-join top-k: per vector, top-k among vectors
    sharing an LSH bucket in ANY of ``num_tables`` hash tables.

    Work is bounded by per-bucket occupancy instead of |corpus|²; at
    1000 executors each bucket's candidates co-locate via the
    (table, bucket) shuffle key — no broadcast of the corpus.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    base = df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    ).repartition(par, "id")  # materialize v; parallelize the signature stage
    # one signature column per table (distinct seeds), unioned — keeps the
    # hyperplane math per-table-specialized inside codegen
    parts = []
    for t in range(num_tables):
        parts.append(
            base.select(
                "id",
                "v",
                F.lit(t).alias("table"),
                hyperplane_signature(
                    F.col("v"), dim, num_planes, seed=7 + 31 * t
                ).alias("bucket"),
            )
        )
    from functools import reduce

    tabbed = reduce(lambda a, b: a.unionByName(b), parts)

    # bucket join on bare ids (vectors would ship num_tables x through
    # the exchange); vectors + norms re-attach after pair dedup so each
    # pair is scored with one dot product and a divide
    a = tabbed.select("table", "bucket", F.col("id").alias("query_id"))
    b = tabbed.select("table", "bucket", F.col("id").alias("neighbor_id"))
    cand = (
        a.join(b, on=["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    vt = base.withColumn("nrm", norm(F.col("v")))
    scored = (
        cand.join(
            vt.select(F.col("id").alias("query_id"), F.col("v").alias("qv"),
                      F.col("nrm").alias("qn")),
            on="query_id",
        )
        .join(
            vt.select(F.col("id").alias("neighbor_id"), F.col("v").alias("cv"),
                      F.col("nrm").alias("cn")),
            on="neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            safe_cos_div(
                dot(F.col("qv"), F.col("cv")), F.col("qn") * F.col("cn")
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivf_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 3,
    seed: int = 42,
    max_iter: int = 10,
) -> DataFrame:
    """IVF (inverted-file) approximate self-join top-k.

    Coarse quantizer: KMeans (Spark ML) over the corpus; every vector is
    assigned to its nearest centroid (the "inverted list"). Each query
    probes its ``n_probe`` nearest centroids and computes exact cosine
    only against those lists.

    Scale shape: the coarse quantizer is fit DRIVER-SIDE on a bounded
    sample (cluster geometry converges long before |corpus| rows — one
    sample-collect job, numpy Lloyd iterations in milliseconds, no
    iterative cluster jobs), then the centroids are embedded as literal
    expressions so both corpus assignment and query probing are MAP-ONLY
    (array_min / array_sort over an n_centroids-element struct array —
    no crossJoin, no per-id window shuffle). The corpus then shuffles
    ONCE on centroid id; queries fan out n_probe× and join on centroid
    id — per-query work is bounded by list occupancy
    (~N/n_centroids × n_probe), not N.
    """
    import numpy as np

    par = df.sparkSession.sparkContext.defaultParallelism
    # drop null vectors up front: without this a null embedding would be
    # coalesced onto centroid 0 below and surface as a null-scored
    # candidate (round-3 advice); with it the coalesce stays a pure
    # nullability annotation for the plan-shape goal
    base = (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
        .repartition(par, "id")
    )
    # bounded sample -> driver; Lloyd's with k-means++-style seeded init.
    # The subset is chosen by a hash STRIDE on the id and collected in id
    # order, so the fitted centroids are a pure function of (data, seed) —
    # independent of partition count/layout. (`.sample()` + unordered
    # collect made the quantizer, and hence recall, layout-dependent.)
    n_rows = base.count()
    cap = max(4096, 64 * n_centroids)
    stride = max(1, int(n_rows // cap))
    fit_src = (
        base.filter(F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(stride)) == 0)
        if stride > 1
        else base
    )
    X = np.array(
        [r["v"] for r in fit_src.select("id", "v").orderBy("id").collect()]
    )
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(max_iter):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d2.argmin(1)
        newC = np.stack(
            [X[a == j].mean(0) if (a == j).any() else C[j] for j in range(len(C))]
        )
        if np.allclose(newC, C):
            break
        C = newC

    if len(C) > 32:
        # Large quantizers: the literal struct array below grows with
        # k x dim and falls out of whole-stage codegen (quadratically
        # interpreted past a few dozen centroids — the same wall the
        # SemDeDup path hit). The Arrow/numpy probe computes the full
        # distance matrix per batch with one matmul; same lowest-id
        # tie-break. ONE probe pass serves both sides — the assignment
        # is probes[0] — and it is persisted because the corpus side
        # and the query side would otherwise each re-run the matmul
        # over every vector.
        from .cluster import kmeans_probe_np

        probed = kmeans_probe_np(
            base, C.tolist(), "id", "v", n_probe, keep=("v",)
        ).persist()
        assigned = probed.select(
            "id", "v", F.element_at("probes", 1).alias("centroid")
        )
        probes = (
            probed.select(
                F.col("id").alias("query_id"),
                F.col("v").alias("qv"),
                norm(F.col("v")).alias("qn"),
                F.explode_outer("probes").alias("centroid"),
            )
            .filter(F.col("centroid").isNotNull())
        )
    else:
        def sq_dist_lit(v: Column, center) -> Column:
            cv = F.array(*[F.lit(float(x)) for x in center])
            return F.aggregate(
                F.zip_with(v, cv, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )

        # (distance, centroid) structs; struct ordering = min distance,
        # centroid id as tie-break — argmin and top-n_probe are pure
        # expressions over this array, map-side, whole-stage codegen
        dist_structs = F.array(
            *[
                F.struct(
                    sq_dist_lit(F.col("v"), C[j]).alias("d"),
                    F.lit(j).alias("centroid"),
                )
                for j in range(len(C))
            ]
        )
        # coalesce-with-literal makes the key non-nullable, so the centroid
        # join can't infer an IsNotNull filter that would re-evaluate the
        # full distance array a second time in a pre-join Filter stage.
        assigned = base.select(
            "id",
            "v",
            F.coalesce(F.array_min(dist_structs)["centroid"], F.lit(0)).alias(
                "centroid"
            ),
        )
        probes = (
            base.withColumn("nrm", norm(F.col("v")))
            .select(
                F.col("id").alias("query_id"),
                F.col("v").alias("qv"),
                F.col("nrm").alias("qn"),
                # explode_outer: plain explode would infer size(...)>0 and
                # duplicate the distance-sort into a scan-side Filter.
                F.explode_outer(
                    F.slice(F.array_sort(dist_structs), 1, n_probe)
                ).alias("__pc__"),
            )
            .filter(F.col("__pc__").isNotNull())
            .select(
                "query_id",
                "qv",
                "qn",
                F.coalesce(F.col("__pc__.centroid"), F.lit(0)).alias("centroid"),
            )
        )
    # norms carried on both sides: per-pair cost is one dot + one divide
    cand = (
        probes.join(assigned.withColumn("cn", norm(F.col("v"))), on="centroid")
        .filter(F.col("query_id") != F.col("id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            safe_cos_div(
                dot(F.col("qv"), F.col("v")), F.col("qn") * F.col("cn")
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return cand.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
