"""Embedding quantization: per-vector symmetric int8 (and general
bit-width) codes for cheap storage and transport of embedding columns.

At 100 TB an `array<float>` embedding column is routinely the widest
thing in the table; symmetric linear quantization (the standard
faiss/SQ8 scheme) stores 1 byte per dimension plus one float scale per
vector — a 4x cut vs float32 with ~1e-2 cosine error on unit-norm-ish
data. Everything here is a map-only Column expression: quantize and
dequantize are one projection each, no UDF, no shuffle.

Determinism: the code is ``floor(x / scale * qmax + 0.5)`` — IEEE
division/multiplication are exactly rounded and floor is exact, so the
integer codes are bit-identical across engines and partition orders
(the DuckDB oracle replays them 1:1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import _as_double


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Per-vector symmetric quantization to signed ``bits``-bit codes.

    Output: (id, qvec array<smallint>, scale double) with
    ``x_i ~ qvec_i * scale / qmax``, ``qmax = 2^(bits-1) - 1``.
    Zero vectors get scale 0 and all-zero codes. The codes fit a
    ``tinyint`` at bits<=8 — kept ``smallint`` so bits up to 16 share
    one schema; cast down at write time if the sink supports it.
    """
    if not 2 <= bits <= 16:
        raise ValueError(f"bits={bits} out of range [2, 16]")
    qmax = float(2 ** (bits - 1) - 1)
    v = _as_double(F.col(vec_col))
    scale = F.array_max(F.transform(v, F.abs))
    qvec = F.when(
        scale > 0,
        F.transform(
            v,
            lambda x: F.floor(x / scale * F.lit(qmax) + F.lit(0.5)).cast("smallint"),
        ),
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast("smallint")))
    return df.select(
        F.col(id_col),
        qvec.alias("qvec"),
        scale.alias("scale"),
    )


def dequantize(qvec: Column, scale: Column, bits: int = 8) -> Column:
    """Reconstruct an approximate double vector from codes + scale."""
    qmax = float(2 ** (bits - 1) - 1)
    return F.transform(qvec, lambda q: q.cast("double") * scale / F.lit(qmax))


def quantized_rescore_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    shortlist: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Two-stage top-k: shortlist on int8 codes, exact rescore on floats.

    Stage 1 scans the quantized corpus (1 byte/dim — the column a
    100 TB deployment actually keeps hot) and ranks by integer dot
    product; symmetric per-vector quantization preserves cosine order
    up to half-step noise, so a ``shortlist`` of a few k recovers the
    true top-k with recall ~1.  Stage 2 re-attaches full-precision
    vectors for shortlisted pairs only and reranks with exact cosine —
    ``|Q| * shortlist`` float operations instead of ``|Q| * n``.

    Same contract as :func:`..similarity.brute_force_topk`:
    (query_id, neighbor_id, cos_sim, rank), self-matches excluded,
    ties by neighbor id.  Scan cost is still O(|Q| * n) — the win is
    4-8x less bandwidth on the scan stage; for sub-linear candidate
    generation compose with the IVF/LSH paths instead.
    """
    from pyspark.sql import Window

    from .similarity import _as_double, cosine

    if shortlist is None:
        shortlist = max(3 * k, k + 8)
    cq = quantize_embeddings(corpus, id_col, vec_col, bits)
    qq = quantize_embeddings(queries, id_col, vec_col, bits)
    # integer dot product of codes; norm factors make it a cosine
    # estimate (scales cancel in the per-query ordering).
    idot = F.aggregate(
        F.zip_with(
            F.col("qa"), F.col("qb"), lambda x, y: (x.cast("long") * y.cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    inorm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x.cast("long") * x.cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).cast("double")
    )
    a = F.broadcast(
        qq.select(F.col(id_col).alias("query_id"), F.col("qvec").alias("qa"))
    )
    b = cq.select(F.col(id_col).alias("neighbor_id"), F.col("qvec").alias("qb"))
    approx = (
        a.crossJoin(b)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.nanvl(
                idot.cast("double") / (inorm(F.col("qa")) * inorm(F.col("qb"))),
                F.lit(None).cast("double"),
            ).alias("qcos"),
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("qcos").desc(), F.col("neighbor_id")
    )
    cand = approx.withColumn("r1", F.row_number().over(w1)).filter(
        F.col("r1") <= shortlist
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    rescored = (
        cand.select("query_id", "neighbor_id")
        .join(F.broadcast(qv), on="query_id")
        .join(cv, on="neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return rescored.withColumn("rank", F.row_number().over(w2)).filter(
        F.col("rank") <= k
    )


def truncation_audit(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: Sequence[int] = (8, 16, 32),
    out_scale: int = 6,
) -> DataFrame:
    """Matryoshka-style truncation audit: how much cosine structure
    survives keeping only the first d dimensions? The sibling of
    :func:`quantize_embeddings` on the OTHER axis — int8 shrinks each
    coordinate, truncation drops coordinates — and the measurement a
    pipeline runs before committing to a truncated index (MRL,
    Kusupati et al. 2022, made prefix-truncation the standard cheap
    embedding downgrade; the audit tells you what it costs on YOUR
    corpus).

    Pairs are the deterministic consecutive-id sample (b = a+1): a
    linear, shuffle-light probe set that re-runs identically anywhere
    (the repo's leakage-safe determinism contract), with no quadratic
    pair volume at any corpus size. For each dim d the pair scores
    cos(a[:d], b[:d]) and the full-width cosine quantize to 1e-6
    units FIRST; gaps |q_d − q_full| are then exact integers, so the
    three reported means are ratios of exact int64 sums.

    Returns one row per dim: ``(dim, n_pairs, mean_cos_full,
    mean_cos_trunc, mean_abs_gap)`` — a flat mean_abs_gap curve means
    the index can drop to that width; pairs where either side has a
    zero-norm prefix are excluded from that dim's row (cosine
    undefined), and a dim WIDER than the embedding yields no row at
    all (rather than a fake gap-0 "lossless" entry — F.slice would
    silently return the full vector).

    Scale shape: ONE self-join keyed by consecutive id (co-partitioned
    hash join, no broadcast needed, linear), |dims| score columns per
    pair computed in one projection, one map-side-combining aggregate
    per dim via an explode of the bounded dims array.
    """
    from .similarity import cosine

    ds = [int(d) for d in dims]
    if not ds or min(ds) < 1:
        raise ValueError("dims must be positive ints")
    a = emb.select(
        F.col(id_col).alias("ia"),
        F.col(vec_col).cast("array<double>").alias("va"),
    )
    b = emb.select(
        (F.col(id_col) - F.lit(1)).alias("ia"),
        F.col(vec_col).cast("array<double>").alias("vb"),
    )
    pairs = a.join(b, "ia")
    m = F.lit(float(10**out_scale))

    def _qu(c):
        return F.floor(c * m + F.lit(0.5)).cast("long")

    full = _qu(cosine(F.col("va"), F.col("vb"))).alias("qf")
    # a dim WIDER than the embedding must not masquerade as a lossless
    # truncation (F.slice silently stops at the vector end, so cos
    # would equal the full-width cosine and report gap 0 — the
    # round-11 ADVICE finding); NULL the score so the filter below
    # drops that dim's pairs, leaving the invalid width with no row
    per_dim = F.array(
        *[
            F.struct(
                F.lit(d).alias("dim"),
                F.when(
                    F.size(F.col("va")) >= F.lit(d),
                    _qu(
                        cosine(
                            F.slice(F.col("va"), 1, d),
                            F.slice(F.col("vb"), 1, d),
                        )
                    ),
                ).alias("qd"),
            )
            for d in ds
        ]
    )
    ex = (
        pairs.select(full, F.explode(per_dim).alias("s"))
        .select("qf", F.col("s.dim").alias("dim"), F.col("s.qd").alias("qd"))
        # cosine() yields NULL for zero-norm prefixes — exclude the
        # pair from THAT dim's row only
        .filter(F.col("qf").isNotNull() & F.col("qd").isNotNull())
    )
    agg = ex.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("qf").alias("sf"),
        F.sum("qd").alias("sd"),
        F.sum(F.abs(F.col("qd") - F.col("qf"))).alias("sg"),
    )
    om = F.lit(float(10**out_scale))

    def _q(c):
        return F.floor(c * om + F.lit(0.5)) / om

    nd = F.col("n_pairs").cast("double")
    return agg.select(
        "dim",
        "n_pairs",
        _q(F.col("sf").cast("double") / nd / m).alias("mean_cos_full"),
        _q(F.col("sd").cast("double") / nd / m).alias("mean_cos_trunc"),
        _q(F.col("sg").cast("double") / nd / m).alias("mean_abs_gap"),
    )
