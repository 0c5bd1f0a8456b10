"""Embedding clustering for corpus curation: k-means assignment and
cluster profiling at scale.

Semantic clustering is the workhorse of training-data curation —
near-duplicate pruning across paraphrases, topic balancing, and
cluster-based quality filtering all start from "assign every embedding
to a centroid, then reason per cluster".

Scale shape (same contract as llm.similarity.ivf_topk's coarse
quantizer):

- **Fit is driver-side on a bounded sample.** Cluster geometry
  converges long before |corpus| rows; one sample-collect job, numpy
  Lloyd iterations in milliseconds, no iterative Spark jobs over the
  full corpus.
- **Assignment is map-only.** Centroids are inlined as literal arrays,
  the argmin over k squared distances is an ``array_min`` over a
  k-element struct array — no crossJoin, no shuffle; a 100 TB corpus is
  assigned in a single scan.
- **Profiling is one hash aggregate** on the cluster id.

Distances are quantized PER DIMENSION (``floor(diff^2 * 10^scale +
0.5)`` as long, then an integer sum) before the argmin, so the distance
— and therefore the assignment — is independent of summation order and
bit-identical across engines; ties broken by lowest centroid id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import _as_double


def fit_kmeans_driver(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
    sample_cap: int | None = None,
) -> list[list[float]]:
    """Driver-side Lloyd's k-means over a bounded sample; returns the
    centroids as plain Python lists ready to inline as literals."""
    import numpy as np

    # deterministic bounded sample: hash-stride on a row hash, collected
    # in hash order, so the fit is independent of partition layout (the
    # same fix as llm/similarity.py's IVF quantizer).
    base = df.select(
        _as_double(F.col(vec_col)).alias("v"),
        F.xxhash64(F.col(vec_col), F.lit(seed)).alias("__h__"),
    )
    n_rows = base.count()
    cap = sample_cap or max(4096, 64 * k)
    stride = max(1, int(n_rows // cap))
    fit_src = (
        base.filter(F.pmod("__h__", F.lit(stride)) == 0) if stride > 1 else base
    )
    X = np.array([r["v"] for r in fit_src.orderBy("__h__").select("v").collect()])
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(k, len(X)), replace=False)]
    # ||x-c||^2 = ||x||^2 + ||c||^2 - 2 x.c via matmul: the broadcast
    # cube (n, k, d) materializes n*k*d floats per iteration (6.5 GB at
    # the k ~ sqrt(n) regime's 28k-sample/447-centroid fit — round-10
    # finding); the matmul form is O(n*k) memory and BLAS-fast. The
    # argmin ranks by the x-independent-term-dropped form, identical
    # ordering up to fp rounding; nothing downstream gates on fit
    # numerics (assignment gates use fixed seed centroids).
    x2 = (X**2).sum(1)
    for _ in range(max_iter):
        d2 = x2[:, None] + (C**2).sum(1)[None, :] - 2.0 * (X @ C.T)
        a = d2.argmin(1)
        newC = np.stack(
            [X[a == j].mean(0) if (a == j).any() else C[j] for j in range(len(C))]
        )
        if np.allclose(newC, C):
            break
        C = newC
    return [[float(x) for x in row] for row in C]


def _qdist_lit(v: Column, center: list[float], scale: int) -> Column:
    """Quantized squared L2 distance to a literal centroid: per-dim
    ``floor(diff^2 * 10^scale + 0.5)`` longs, summed with exact integer
    addition (order-independent, engine-reproducible)."""
    cv = F.array(*[F.lit(float(x)) for x in center])
    m = F.lit(float(10**scale))
    return F.aggregate(
        F.zip_with(
            v,
            cv,
            lambda x, y: F.floor((x - y) * (x - y) * m + F.lit(0.5)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def kmeans_assign(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 6,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Map-only nearest-centroid assignment against literal centroids.

    Output: (id_col, *keep, cluster, qdist2) where qdist2 is the squared
    L2 distance in ``10^-scale`` units (long, per-dimension quantized) —
    exact integer comparisons make the argmin and any downstream
    aggregation order-independent and engine-reproducible. ``keep``
    passes extra columns through so callers that need the vector after
    assignment don't pay a join-back.
    """
    v = _as_double(F.col(vec_col))
    structs = F.array(
        *[
            F.struct(
                _qdist_lit(v, c, scale).alias("qd"),
                F.lit(j).alias("cluster"),
            )
            for j, c in enumerate(centroids)
        ]
    )
    # NULL vector => NULL cluster/qdist2, explicitly: without the guard
    # struct-min over all-NULL qd fields picks an arbitrary first struct
    # (cluster 0 with NULL distance), which is an artifact, not a policy.
    # kmeans_assign_np emits the identical NULL/NULL row.
    ok = F.col(vec_col).isNotNull()
    # Materialize the argmin struct in its OWN projection, then extract
    # the two fields from the struct column: the k x dim HOF distance
    # expression is interpreted (no whole-stage codegen for
    # aggregate/zip_with), so referencing best["cluster"] and
    # best["qd"] in one projection evaluates the whole thing TWICE —
    # measured 1.3x-2.5x on the sf0.1 profile. Field extraction from a
    # NULL struct is NULL, preserving the NULL-vector policy.
    tmp = "__kmeans_best__"
    assert tmp not in (id_col, *keep)
    mid = df.select(
        F.col(id_col),
        *[F.col(k) for k in keep],
        F.when(ok, F.array_min(structs)).alias(tmp),
    )
    return mid.select(
        F.col(id_col),
        *[F.col(k) for k in keep],
        F.col(f"{tmp}.cluster").alias("cluster"),
        F.col(f"{tmp}.qd").alias("qdist2"),
    )


def kmeans_assign_np(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 6,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Vectorized nearest-centroid assignment: Arrow-batched numpy
    matmul over ``mapInPandas``.

    The literal-inlined :func:`kmeans_assign` is engine-exact (the
    oracle gates use it) but its generated expression grows with
    k x dim and falls out of whole-stage codegen past a few dozen
    centroids.  This path computes ||v||^2 - 2 v.C^T + ||C||^2 for a
    whole Arrow batch in one BLAS call, so k in the hundreds-to-
    thousands (SemDeDup's k ~ sqrt(n)) costs one matmul per batch.

    Output is BIT-IDENTICAL to :func:`kmeans_assign`: the float
    distances only shortlist candidate centroids, and the reported
    qdist2 (and the argmin among the shortlist) is recomputed with the
    literal path's per-dimension quantization — per-dim
    ``floor(diff^2 * 10^scale + 0.5)`` summed as int64.  Per-dim
    quantized totals sit within ``dim/2`` units of ``d2 * 10^scale``,
    so any centroid whose float distance exceeds the float minimum by
    more than ``dim / 10^scale`` cannot win the quantized argmin; only
    the (rare) rows with a second centroid inside that margin pay the
    per-candidate requantization.  Ties break to the lowest centroid
    id, same as the literal path.  NULL vectors pass through with NULL
    cluster/qdist2, exactly as kmeans_assign emits them.
    """
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)
    k, dim = C.shape
    c_sq = (C * C).sum(axis=1)
    m = float(10**scale)
    src = df.select(
        F.col(id_col), *[F.col(k_) for k_ in keep], _as_double(F.col(vec_col)).alias("__v__")
    )
    out_fields = [f for f in src.schema.fields if f.name != "__v__"]
    schema_ddl = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in out_fields]
        + ["cluster int", "qdist2 bigint"]
    )
    keep_cols = [id_col, *keep]

    def _qd_rows(V: "np.ndarray", c: "np.ndarray") -> "np.ndarray":
        # The literal path's exact integer distance for a block of rows.
        diff = V - c[None, :]
        return np.floor(diff * diff * m + 0.5).astype("int64").sum(axis=1)

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            n = len(pdf)
            cl_out = np.full(n, -1, dtype="int64")
            qd_out = np.zeros(n, dtype="int64")
            mask = pdf["__v__"].notna().to_numpy()
            if mask.any():
                # one stacked conversion, not one np.asarray per row —
                # Arrow hands the list column over as an object array of
                # ndarrays, which vstack concatenates in a single C call
                V = np.vstack(pdf["__v__"][mask].to_numpy()).astype(
                    np.float64, copy=False
                )
                v_sq = (V * V).sum(axis=1)
                d2 = v_sq[:, None] - 2.0 * (V @ C.T) + c_sq[None, :]
                cl = d2.argmin(axis=1)
                qd = np.empty(len(V), dtype="int64")
                # Exact qdist2 for the float winner, vectorized per centroid.
                for j in np.unique(cl):
                    rows = cl == j
                    qd[rows] = _qd_rows(V[rows], C[j])
                # Rows where another centroid's float distance is within the
                # quantization margin: requantize every candidate exactly.
                # The margin covers BOTH error sources: dim/m bounds the
                # per-dim quantization rounding, and the second term bounds
                # the float evaluation error of the expanded form
                # ||v||^2 - 2 v.C^T + ||C||^2, which loses ~eps * ||v||^2
                # to cancellation for near-duplicate vectors — without it,
                # large-norm embeddings could exclude the true quantized
                # argmin from the shortlist.
                fp_err = 8.0 * np.finfo(np.float64).eps * (v_sq + c_sq.max())
                margin = dim / m + fp_err
                d2min = d2[np.arange(len(V)), cl]
                alt = d2 <= (d2min[:, None] + margin[:, None])
                multi = np.where(alt.sum(axis=1) > 1)[0]
                if len(multi):
                    best_q = np.full(len(multi), np.iinfo(np.int64).max, dtype="int64")
                    best_c = np.zeros(len(multi), dtype="int64")
                    for j in range(k):
                        sub = np.where(alt[multi, j])[0]
                        if not len(sub):
                            continue
                        qj = _qd_rows(V[multi[sub]], C[j])
                        win = qj < best_q[sub]  # strict: ties keep lower j
                        best_q[sub[win]] = qj[win]
                        best_c[sub[win]] = j
                    cl[multi] = best_c
                    qd[multi] = best_q
                cl_out[mask] = cl
                qd_out[mask] = qd
            out = pdf[keep_cols].copy()
            # masked-array construction: no per-row Python loop in the
            # Arrow-batch hot path (IntegerArray mask=True means missing)
            out["cluster"] = pd.arrays.IntegerArray(
                cl_out.astype("int32"), mask=~mask
            )
            out["qdist2"] = pd.arrays.IntegerArray(qd_out, mask=~mask)
            yield out

    return src.mapInPandas(assign, schema_ddl)


def kmeans_probe_np(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 3,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Top-``n_probe`` nearest centroids per row, Arrow/numpy path.

    Output: (id, *keep, probes array<int>) — the vectorized companion
    to the literal ``array_sort(dist_structs)`` probe used by
    :func:`..similarity.ivf_topk` at small k. Ties break to the lowest
    centroid id (stable argsort), matching the struct-sort order.
    """
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    c_sq = (C * C).sum(axis=1)
    n_probe = min(n_probe, len(centroids))
    src = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col), *[F.col(k) for k in keep], _as_double(F.col(vec_col)).alias("__v__")
    )
    out_fields = [f for f in src.schema.fields if f.name != "__v__"]
    schema_ddl = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in out_fields]
        + ["probes array<int>"]
    )
    keep_cols = [id_col, *keep]

    def probe(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.vstack(pdf["__v__"].to_numpy()).astype(np.float64, copy=False)
            d2 = (V * V).sum(axis=1)[:, None] - 2.0 * (V @ C.T) + c_sq[None, :]
            idx = np.argsort(d2, axis=1, kind="stable")[:, :n_probe]
            out = pdf[keep_cols].copy()
            out["probes"] = [row.astype("int32").tolist() for row in idx]
            yield out

    return src.mapInPandas(probe, schema_ddl)


def cluster_profile(assigned: DataFrame, scale: int = 6) -> DataFrame:
    """Per-cluster curation stats: size and mean squared distance to the
    centroid (a dispersion signal — tight clusters are near-duplicate
    candidates, loose ones are topically diffuse)."""
    m = float(10**scale)
    return assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        (F.sum("qdist2") / (F.count(F.lit(1)) * F.lit(m))).alias("avg_dist2"),
    )


def cluster_embeddings(
    df: DataFrame,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
) -> DataFrame:
    """Fit (driver-side, bounded) + assign (map-only): the one-call
    semantic clustering entry point."""
    centroids = fit_kmeans_driver(df, k, vec_col, seed, max_iter)
    return kmeans_assign(df, centroids, id_col, vec_col)


def semdedup_pairs(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    scale: int = 6,
    persist: bool | None = None,
) -> DataFrame:
    """SemDeDup candidate pairs (Abbas et al. 2023, "SemDeDup: Data-
    efficient learning at web-scale through semantic deduplication"):
    cluster embeddings to literal centroids, then score pairwise cosine
    ONLY within each cluster.

    ``persist=None`` (default) auto-persists the assigned base exactly
    when assignment takes the Arrow/numpy path (k > 32): both sides of
    the pair join read it, and re-running a Python-worker matmul stage
    twice is the measurable double-read SCALING.md flagged at sf10.
    The literal-inlined path stays unpersisted by default — re-running
    codegen'd column arithmetic is cheaper than caching the vectors —
    and either choice can be forced with True/False.

    Output: (id_a, id_b, cluster, cos_sim) with id_a < id_b and
    cos_sim >= threshold.  The cluster key bounds the quadratic — the
    self-join shuffles both sides on ``cluster`` and each cluster's
    pair loop runs in its own task, so total work is Σ|cluster|², not
    |corpus|².  At 100 TB the centroid count is chosen so clusters fit
    a task (the paper uses k ≈ √n); skewed clusters can be sub-split by
    re-clustering, not by salting (pairs must stay co-located).
    """
    from .similarity import _as_double, dot, norm

    # Null vectors are dropped up front (they belong to no cluster) and
    # the cluster key is coalesced non-nullable: otherwise Catalyst
    # infers IsNotNull(<argmin>) from the equi-join and re-evaluates the
    # whole centroid argmin as a scan-stage filter — the inferred-filter
    # trap the IVF path plan-pins against. The vector rides through
    # ``keep`` so there is no join-back to re-attach it.
    # Assignment path: the literal-inlined engine-exact argmin up to a
    # few dozen centroids (the oracle-gated regime), the Arrow/numpy
    # matmul beyond that (SemDeDup's k ~ sqrt(n) regime, where the
    # inlined expression falls out of codegen and goes quadratically
    # interpreted).
    filtered = df.filter(F.col(vec_col).isNotNull())
    np_path = len(centroids) > 32
    if persist is None:
        persist = np_path
    if np_path:
        assigned = kmeans_assign_np(
            filtered, centroids, id_col, vec_col, scale, keep=(vec_col,)
        )
    else:
        assigned = kmeans_assign(
            filtered, centroids, id_col, vec_col, scale, keep=(vec_col,)
        )
    # Each row's norm is computed ONCE here and carried through the
    # join: cos(a,b) = dot/(na*nb) then costs one aggregate per pair
    # instead of three (measured 3x+ on the pair stage). Same arithmetic
    # expression as similarity.cosine, so results are bit-identical —
    # nanvl guards the 0/0 NaN exactly as cosine() does.
    base = assigned.select(
        F.col(id_col).alias("id"),
        F.coalesce("cluster", F.lit(0)).alias("cluster"),
        _as_double(F.col(vec_col)).alias("v"),
    ).select("id", "cluster", "v", norm(F.col("v")).alias("nv"))
    if persist:
        # both join sides read `base`: without a persist the whole
        # assignment lineage executes twice. Worth it whenever the
        # assignment is the numpy path over a large corpus; caller (or
        # executor eviction) owns unpersisting.
        base = base.persist()
    # Spread the probe side: a single-file source scans as one
    # partition, and when AQE broadcasts the build side the whole pair
    # loop would otherwise run in that one task. Hash-repartitioning on
    # id keeps the broadcast-join path parallel; if the build side is
    # too big to broadcast the join falls back to SMJ on ``cluster``,
    # whose parallelism is the cluster count (the paper's k ≈ √n makes
    # that ample at scale).
    par = df.sparkSession.sparkContext.defaultParallelism
    a = base.repartition(par, "id").select(
        F.col("id").alias("id_a"),
        "cluster",
        F.col("v").alias("va"),
        F.col("nv").alias("na"),
    )
    b = base.select(
        F.col("id").alias("id_b"),
        "cluster",
        F.col("v").alias("vb"),
        F.col("nv").alias("nb"),
    )
    cos = F.nanvl(
        F.try_divide(dot(F.col("va"), F.col("vb")), F.col("na") * F.col("nb")),
        F.lit(None).cast("double"),
    )
    return (
        a.join(b, on="cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "cluster", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def semdedup(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    scale: int = 6,
) -> DataFrame:
    """SemDeDup survivors: drop every row that is the HIGHER id of some
    within-cluster pair with cosine >= threshold (keep-lowest-id — the
    paper's keep-one-per-group policy with a deterministic
    representative).  One broadcast-able anti-join over the pair ids."""
    drops = (
        semdedup_pairs(df, centroids, id_col, vec_col, threshold, scale)
        .select(F.col("id_b").alias("__drop_id__"))
        .distinct()
    )
    return df.join(
        drops, F.col(id_col) == F.col("__drop_id__"), "left_anti"
    )


def fit_pca_driver(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    seed: int = 42,
    sample_cap: int | None = None,
) -> tuple[list[float], list[list[float]], list[float]]:
    """Driver-side PCA fit over a deterministic bounded sample:
    returns (mean, components[k][dim], explained_variance[k]).

    Same scale shape as :func:`fit_kmeans_driver`: covariance geometry
    converges long before |corpus| rows, so one hash-stride sample +
    a numpy SVD on the driver replaces an iterative distributed solver;
    the k x dim component matrix is tiny and inlines as literals, so
    applying the projection is MAP-ONLY (no join, no shuffle).
    """
    import numpy as np

    base = df.select(
        _as_double(F.col(vec_col)).alias("v"),
        F.xxhash64(F.col(vec_col), F.lit(seed)).alias("__h__"),
    )
    n_rows = base.count()
    cap = sample_cap or 8192
    stride = max(1, int(n_rows // cap))
    fit_src = (
        base.filter(F.pmod("__h__", F.lit(stride)) == 0) if stride > 1 else base
    )
    X = np.array([r["v"] for r in fit_src.orderBy("__h__").select("v").collect()])
    mu = X.mean(0)
    _, s, vt = np.linalg.svd(X - mu, full_matrices=False)
    var = (s**2) / max(len(X) - 1, 1)
    if len(vt) < k:
        # fail loudly: silently returning fewer than k components makes
        # downstream fixed-width projections wrong (round-3 advice)
        raise ValueError(
            f"PCA fit produced only {len(vt)} components (sample rows="
            f"{len(X)}, rank-limited) but k={k} were requested — lower k "
            "or raise sample_cap"
        )
    return mu.tolist(), vt[:k].tolist(), var[:k].tolist()


def pca_project(
    df: DataFrame,
    mean: list[float],
    components: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten_variance: list[float] | None = None,
) -> DataFrame:
    """Project vectors onto fitted components — map-only, codegen.

    Each output coordinate j is dot(v - mean, components[j]), computed
    as one fused aggregate over the centered vector with the component
    inlined as literals; with ``whiten_variance`` the coordinate is
    scaled by 1/sqrt(var_j) (unit-variance whitening, the usual prep
    before cosine ANN or k-means on embeddings). Degenerate variances
    raise here rather than silently emitting inf coordinates: double
    division by sqrt(0.0) does not error even under ANSI, and an inf
    poisons every downstream cosine/centroid (round-3 advice).
    """
    if whiten_variance is not None:
        bad = [j for j, w in enumerate(whiten_variance) if not w > 1e-12]
        if bad:
            raise ValueError(
                f"whiten_variance has zero/near-zero components at {bad} "
                "(<= 1e-12): whitening would divide by ~0 and emit inf — "
                "drop those components or skip whitening"
            )
    v = _as_double(F.col(vec_col))
    mu = F.array(*[F.lit(float(m)) for m in mean])
    centered = F.zip_with(v, mu, lambda x, m: x - m)
    coords = []
    for j, comp in enumerate(components):
        cj = F.array(*[F.lit(float(c)) for c in comp])
        d = F.aggregate(
            F.zip_with(centered, cj, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        if whiten_variance is not None:
            d = d / F.lit(float(whiten_variance[j]) ** 0.5)
        coords.append(d)
    return df.withColumn(out_col, F.array(*coords))


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    scale: int = 6,
) -> dict:
    """Exact per-label mean vectors as plain Python lists — the
    bounded control-plane step behind :func:`label_silhouette` (the
    kmeans_fit precedent: the BIG data never leaves the cluster, only
    the |labels|·dim sum table does).

    Each component quantizes to ``10^scale`` int64 units once;
    posexplode + ONE map-side-combining (label, dim) aggregate of
    exact integer sums is the only row-volume job. The centroid
    component c_d = S_d / (n·10^scale) is a ratio of exact integers,
    so both engines (and any re-run) materialize the identical
    double. Returns {label: [c_0 … c_{D−1}]}.
    """
    m = F.lit(float(10**scale))
    per = (
        df.filter(F.col(label_col).isNotNull() & F.col(vec_col).isNotNull())
        .select(
            F.col(label_col).alias("__l__"),
            F.posexplode(_as_double(F.col(vec_col))).alias("__d__", "x"),
        )
        .groupBy("__l__", "__d__")
        .agg(
            F.sum(
                F.floor(F.col("x") * m + F.lit(0.5)).cast("long")
            ).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    rows = per.collect()  # bounded: |labels| x dim
    by_label: dict = {}
    for r in rows:
        by_label.setdefault(r["__l__"], {})[r["__d__"]] = (r["s"], r["n"])
    mm = float(10**scale)
    return {
        lab: [
            dims[d][0] / (dims[d][1] * mm) for d in sorted(dims)
        ]
        for lab, dims in sorted(by_label.items())
    }


def label_silhouette(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    scale: int = 6,
    out_scale: int = 6,
) -> DataFrame:
    """Simplified (centroid-based) silhouette per label — the
    clustering-quality number the eval lane was missing: q_kmeans
    profiles WITHIN-cluster dispersion, q_dedup_embedding finds
    near-pairs; silhouette asks "are the label regions actually
    SEPARATED?" per point as s = (b − a)/max(a, b) with a = distance
    to the OWN label centroid and b = the nearest OTHER label
    centroid (the simplified/medoid-free variant — Hruschka et al.
    2004 — which replaces the classic all-pairs a/b with centroid
    distances: O(n·k) instead of O(n²), the only form that scales).
    s ≈ 1: compact and far from the next label; s ≈ 0: on the
    boundary; s < 0: closer to another label's centroid than its own
    (likely mislabeled or mixed region).

    Determinism: centroids are exact-integer ratios
    (:func:`label_centroids`); distances are the per-dim-quantized
    exact int64 sums of kmeans_assign (`_qdist_lit`); s is a closed
    expression over those integers, quantized per POINT to
    ``out_scale`` int64 units, so the per-label mean is a ratio of
    exact sums. max(a, b) = 0 (a point identical to every centroid)
    reports s = 0 by convention. A singleton label has a = its own
    distance to itself = 0 → s = 1 against any distinct neighbor —
    the documented simplified-variant artifact (classic silhouette
    defines 0 there; at corpus scale singleton labels are a data bug
    the 1.0 makes visible).

    Scale shape: one posexplode aggregate for centroids (bounded
    collect), then ONE map-only projection computing |labels|
    quantized distances per row (literal-inlined centroids, no join,
    no shuffle beyond the final |labels|-row aggregate). Returns
    ``(label, n, mean_sil, mean_a, mean_b)`` sorted by label.
    """
    cents = label_centroids(df, label_col, vec_col, scale)
    if len(cents) < 2:
        raise ValueError("label_silhouette needs >= 2 labels")
    v = _as_double(F.col(vec_col))
    structs = F.array(
        *[
            F.struct(
                F.lit(lab).alias("l"),
                _qdist_lit(v, c, scale).alias("qd"),
            )
            for lab, c in cents.items()
        ]
    )
    base = df.filter(
        F.col(label_col).isNotNull() & F.col(vec_col).isNotNull()
    ).select(F.col(label_col).alias("pl"), structs.alias("ds"))
    # materialize the distance array ONCE per row, then split it into
    # own-label (a) and min-other (b) in a second projection — the
    # |labels| x dim HOF expression is interpreted, so re-deriving it
    # per output column would evaluate it twice (the kmeans_assign
    # double-eval lesson)
    mid = base.select(
        "pl",
        F.element_at(
            F.filter(F.col("ds"), lambda s: s["l"] == F.col("pl")), 1
        )["qd"].alias("a"),
        F.array_min(
            F.transform(
                F.filter(F.col("ds"), lambda s: s["l"] != F.col("pl")),
                lambda s: s["qd"],
            )
        ).alias("b"),
    )
    om = F.lit(float(10**out_scale))
    ad = F.col("a").cast("double")
    bd = F.col("b").cast("double")
    su = F.when(
        F.greatest(F.col("a"), F.col("b")) > 0,
        F.floor((bd - ad) / F.greatest(ad, bd) * om + F.lit(0.5)).cast(
            "long"
        ),
    ).otherwise(F.lit(0).cast("long"))
    agg = mid.select("pl", F.col("a"), F.col("b"), su.alias("su")).groupBy(
        "pl"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("su").alias("ss"),
        F.sum("a").alias("sa"),
        F.sum("b").alias("sb"),
    )
    nd = F.col("n").cast("double")
    m = F.lit(float(10**scale))

    def _q(c):
        return F.floor(c * om + F.lit(0.5)) / om

    return agg.select(
        F.col("pl").alias("label"),
        "n",
        (
            F.floor(F.col("ss").cast("double") / nd + F.lit(0.5)) / om
        ).alias("mean_sil"),
        _q(F.col("sa").cast("double") / nd / m).alias("mean_a"),
        _q(F.col("sb").cast("double") / nd / m).alias("mean_b"),
    ).orderBy("label")
