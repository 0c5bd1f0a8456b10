"""Mergeable quantile sketch: a deterministic KLL-style compaction
tree (Munro-Paterson / MRL lineage) with the repo's engine-portable
determinism treatment.

Reference scope: quantiles in the reference are exact (describe /
quantile over a materialized column — reference/src/dataframe.jl's
describe path); this module is the beyond-reference scale companion:
a BOUNDED summary whose build, merge, and query are all deterministic
integer/dyadic arithmetic, so a second engine (the DuckDB oracle)
rebuilds the sketch bit-for-bit from the same raw rows — the same
contract ops/bloom.py establishes for HLL/KMV state.

Why not textbook KLL: KLL's random compaction coin gives the optimal
(1/k)·sqrt(log) error but makes the sketch a function of RNG state and
arrival order — not replayable across engines, not gateable. The
classical DETERMINISTIC lineage (Munro-Paterson 1980; Manku-
Rajagopalan-Lindsay 1998) collapses sorted buffers pairwise instead;
this module uses that shape with two repo-specific choices:

* **Hash-blocked leaves.** Rows are assigned to one of ``B`` leaf
  blocks by an avalanche-mixed hash of their unique id
  (ops/bloom._hll_mix — the ARX rounds DuckDB replays exactly), so the
  tree is a function of the row SET, independent of partitioning,
  arrival order, or cluster size. B is the scale knob: the collapse
  tree has ``log2(B)`` block levels and the post-tree rounds operate
  on ~n/B rows.
* **Pair-absorb compaction.** A collapse sorts a block pair by
  ``(value, hash, uid)`` and keeps every other row, adding the dropped
  neighbor's weight to the kept row (odd tail keeps itself). Total
  weight is EXACTLY preserved (Σw = n always — no MRL padding), and
  the kept side alternates by level parity so the one-sided rank bias
  cancels instead of accumulating. Rank error grows with the weight of
  absorbed neighbors, i.e. like the deterministic-sketch bound
  O(n·log(n/(Bk))/size) — measured in tests/test_round9.py at well
  under 2/size for uniform, zipf, and clustered inputs.

Values are quantized to int64 units BEFORE sketching (the dsum
discipline); weights are int64; a quantile query is "first row of the
value-ordered sketch whose cumulative weight reaches ceil(p·n)" — all
integer, one exact division at the end. Merging sketches (the shard /
executor / day-partition algebra) is the same pair-absorb on the
concatenated rows, halving until the size bound holds — associative
enough for a tree reduce because every step is a deterministic
function of the input set (merge ORDER must be fixed for bit-equality;
the operators here define it as "concatenate, then collapse").

Scale shape: one map-side projection computes (q, h, blk); the local
tree runs inside ``applyInPandas`` per hash-super-block (one shuffle,
Arrow-batched numpy — no per-row Python); the cross-block tail
operates on n/B-bounded data. Distributed honesty: nothing above the
B-fold reduction ever funnels raw rows through one task.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bloom import _HLL_ROUNDS, _P


def _mix_np(keys: np.ndarray) -> np.ndarray:
    """Numpy twin of ops.bloom._hll_mix on pmod(key, P) — bit-identical
    to the Column path and to the DuckDB _mix_ctes replay (same
    constants; every product < P^2 < 2^63)."""
    h = np.mod(keys.astype(np.int64), _P)
    for a, b, s in _HLL_ROUNDS:
        h = np.mod(h * a + b, _P)
        h = h ^ (h >> s)
    return h


def _mix_col(key):
    from .bloom import _hll_mix

    return _hll_mix(F.pmod(key.cast("long"), F.lit(_P)))


def _collapse_segment(q, h, uid, w, parity: int):
    """One pair-absorb over a VALUE-SORTED segment: keep alternating
    rows (side chosen by level parity, odd tail keeps itself), each
    kept row absorbing its dropped pair-neighbor's weight. Returns the
    kept (q, h, uid, w) arrays; Σw is preserved exactly."""
    s = len(q)
    if s <= 1:
        return q, h, uid, w
    pw = np.add.reduceat(w, np.arange(0, s, 2))
    pos = np.arange(s)
    if parity == 0:
        keep = pos % 2 == 0
    else:
        keep = pos % 2 == 1
        if s % 2 == 1:
            keep[s - 1] = True  # lone tail pair keeps its only member
    return q[keep], h[keep], uid[keep], pw


def _tree_levels(q, h, uid, w, blk, start_level: int, n_levels: int,
                 k_guard: int):
    """Structural block-tree levels [start, start+n): pair blocks
    ``blk//2``; a lone block passes through unchanged (identity), a
    full pair sorted-merges and pair-absorbs ONLY when the combined
    size exceeds ``k_guard`` — otherwise it concatenates, the KLL
    buffer rule that keeps sketch size ~k (without it, n/B < k inputs
    over-compact to n/B rows and accuracy collapses at small scale).
    Level index drives the keep-side parity, so a resumed tree (stage
    2 continuing stage 1's levels) collapses identically to a
    single-pass build."""
    for lvl in range(start_level, start_level + n_levels):
        nb = blk >> 1
        order = np.lexsort((uid, h, q, nb))
        q, h, uid, w, blk, nb = (
            q[order], h[order], uid[order], w[order], blk[order], nb[order]
        )
        outs = []
        bounds = np.flatnonzero(np.diff(nb))
        starts = np.concatenate(([0], bounds + 1))
        ends = np.concatenate((bounds + 1, [len(nb)]))
        for a, b in zip(starts, ends):
            seg = slice(a, b)
            if blk[seg].min() == blk[seg].max() or b - a <= k_guard:
                # lone block, or merged size within budget: identity
                outs.append((q[seg], h[seg], uid[seg], w[seg]))
            else:
                outs.append(
                    _collapse_segment(
                        q[seg], h[seg], uid[seg], w[seg], lvl % 2
                    )
                )
        q = np.concatenate([o[0] for o in outs])
        h = np.concatenate([o[1] for o in outs])
        uid = np.concatenate([o[2] for o in outs])
        w = np.concatenate([o[3] for o in outs])
        blk = np.concatenate(
            [np.full(len(o[0]), nb[a], dtype=np.int64)
             for o, a in zip(outs, starts)]
        )
    return q, h, uid, w, blk


def _flat_rounds(q, h, uid, w, k: int, start_level: int):
    """Post-tree rounds: the whole (single-block) buffer halves by
    pair-absorb until ≤ k rows. Also the MERGE algebra for sketch
    sets: concatenate rows, then flat rounds. Parity continues the
    structural level index so oracle replays with a fixed-length
    guarded chain line up exactly."""
    lvl = start_level
    while len(q) > k:
        order = np.lexsort((uid, h, q))
        q, h, uid, w = _collapse_segment(
            q[order], h[order], uid[order], w[order], lvl % 2
        )
        lvl += 1
    return q, h, uid, w


def quantile_sketch(
    df: DataFrame,
    value: str,
    uid: str,
    group_by: Sequence[str] = (),
    k: int = 256,
    B: int = 1024,
    scale: int = 2,
) -> DataFrame:
    """Build the per-group sketch: rows ``(*group_by, q, h, uid, w)``
    with ~min(n_g, k..max(k, n_g/B)) rows per group and Σw = n_g
    exactly (pair merges within the k budget concatenate instead of
    compacting, so small groups keep full resolution). ``B`` (power of
    two) is the PARALLELISM knob — the cross-block stage sees
    ~n_g·min(64,B)/B rows; size it so that fits one Arrow batch
    (B=2^20 at petabyte scale). NULL values/uids are excluded."""
    if B < 2 or B & (B - 1):
        raise ValueError(f"B must be a power of two >= 2, got {B}")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    gb = list(group_by)
    L1 = B.bit_length() - 1
    S = min(64, B)
    t_local = (B // S).bit_length() - 1  # block levels local to a super
    m = F.lit(float(10**scale))
    base = df.filter(
        F.col(value).isNotNull() & F.col(uid).isNotNull()
    ).select(
        *gb,
        F.floor(F.col(value).cast("double") * m + F.lit(0.5))
        .cast("long")
        .alias("q"),
        _mix_col(F.col(uid)).alias("h"),
        F.col(uid).cast("long").alias("uid"),
    )
    # ship ONLY (gb, q, h, uid) + the grouping key through the stage-1
    # exchange: w is the constant 1 and blk = h mod B — both are
    # rebuilt inside the kernel from h (the mix output is non-negative,
    # so numpy mod == pmod), saving 16 bytes/row of shuffle at any
    # scale with bit-identical tree state
    base = base.withColumn(
        "sup",
        F.expr(f"pmod(h, {B}) DIV " + str(B // S)).cast("long"),
    )

    out_schema = ", ".join(
        [f"`{g}` {t}" for g, t in zip(gb, _gb_types(df, gb))]
        + ["q long", "h long", "uid long", "w long", "blk long"]
    )

    def local_stage(pdf: pd.DataFrame) -> pd.DataFrame:
        q = pdf["q"].to_numpy(np.int64)
        h = pdf["h"].to_numpy(np.int64)
        u = pdf["uid"].to_numpy(np.int64)
        w = np.ones(len(q), dtype=np.int64)
        blk = np.mod(h, B)
        q, h, u, w, blk = _tree_levels(q, h, u, w, blk, 0, t_local, k)
        out = pd.DataFrame({"q": q, "h": h, "uid": u, "w": w, "blk": blk})
        for g in gb:
            out[g] = pdf[g].iloc[0]
        return out[gb + ["q", "h", "uid", "w", "blk"]]

    stage1 = base.groupBy(*gb, "sup").applyInPandas(local_stage, out_schema)

    def final_stage(pdf: pd.DataFrame) -> pd.DataFrame:
        q = pdf["q"].to_numpy(np.int64)
        h = pdf["h"].to_numpy(np.int64)
        u = pdf["uid"].to_numpy(np.int64)
        w = pdf["w"].to_numpy(np.int64)
        blk = pdf["blk"].to_numpy(np.int64)
        q, h, u, w, blk = _tree_levels(
            q, h, u, w, blk, t_local, L1 - t_local, k
        )
        q, h, u, w = _flat_rounds(q, h, u, w, k, L1)
        out = pd.DataFrame(
            {"q": q, "h": h, "uid": u, "w": w,
             "blk": np.zeros(len(q), dtype=np.int64)}
        )
        for g in gb:
            out[g] = pdf[g].iloc[0]
        return out[gb + ["q", "h", "uid", "w", "blk"]]

    key2 = gb if gb else [F.lit(0).alias("__one__")]
    final = stage1.groupBy(*key2).applyInPandas(final_stage, out_schema)
    return final.select(*gb, "q", "h", "uid", "w")


def _gb_types(df: DataFrame, gb: list[str]) -> list[str]:
    types = dict(df.dtypes)
    return [types[g] for g in gb]


def merge_quantile_sketches(
    sketches: DataFrame,
    k: int,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Merge algebra: concatenated sketch rows (e.g. per-shard or
    per-day sketches unioned into one frame) collapse by flat
    pair-absorb rounds (parity from 0) until ≤ k rows per group. Σw —
    the represented row count — is preserved exactly."""
    gb = list(group_by)
    schema = ", ".join(
        [f"`{g}` {t}" for g, t in zip(gb, _gb_types(sketches, gb))]
        + ["q long", "h long", "uid long", "w long"]
    )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        q, h, u, w = _flat_rounds(
            pdf["q"].to_numpy(np.int64),
            pdf["h"].to_numpy(np.int64),
            pdf["uid"].to_numpy(np.int64),
            pdf["w"].to_numpy(np.int64),
            k,
            0,
        )
        out = pd.DataFrame({"q": q, "h": h, "uid": u, "w": w})
        for g in gb:
            out[g] = pdf[g].iloc[0]
        return out[gb + ["q", "h", "uid", "w"]]

    key = gb if gb else [F.lit(0).alias("__one__")]
    return sketches.groupBy(*key).applyInPandas(merge, schema)


def sketch_quantiles(
    sketch: DataFrame,
    probs: Sequence[tuple[str, int, int]],
    group_by: Sequence[str] = (),
    scale: int = 2,
) -> DataFrame:
    """Query the sketch: for each ``(label, num, den)`` probability
    (exact rationals — never a float p), the value at the first
    value-ordered sketch row whose cumulative weight reaches
    ``ceil(num·W/den)``. Returns ``(*group_by, p_label, n, est)``.
    All windows run over the BOUNDED sketch, never data."""
    from pyspark.sql import Window

    gb = list(group_by)
    wspec = (
        Window.partitionBy(*gb) if gb else Window.partitionBy()
    ).orderBy("q", "h", "uid")
    wall = (Window.partitionBy(*gb) if gb else Window.partitionBy())
    cum = sketch.select(
        *gb, "q",
        F.sum("w").over(
            wspec.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum"),
        F.sum("w").over(wall).alias("W"),
    )
    spark = sketch.sparkSession
    targets = spark.createDataFrame(
        [(lbl, int(num), int(den)) for lbl, num, den in probs],
        "p_label string, num long, den long",
    )
    # ceil(num*W/den) in pure int64: (num*W + den - 1) DIV den
    joined = cum.crossJoin(F.broadcast(targets)).withColumn(
        "r", F.expr("(num * W + den - 1) DIV den")
    )
    m = float(10**scale)
    return (
        joined.filter(F.col("cum") >= F.col("r"))
        .groupBy(*gb, "p_label")
        .agg(
            F.max("W").alias("n"),
            (F.min("q").cast("double") / F.lit(m)).alias("est"),
        )
    )
