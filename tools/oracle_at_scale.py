#!/usr/bin/env python
"""sf1 DuckDB-oracle HASH replay — correctness evidence ABOVE sf0.01.

The driver's correctness gate (and tests/test_oracle.py) hash-match
every registry query against its DuckDB oracle at sf0.01; the sf1/sf10
pins (tools/scale_study.py) check WALLS only. That leaves one evidence
gap: a scale-DEPENDENT answer bug — int64 overflow in a quantized sum,
sketch-width saturation, an approx threshold that drifts with n — would
pass both gates. This tool closes it: re-run the EXACT registry compare
(same dataframes_jl_spark.oracle.compare strictness — row count, column
names, dtype class, exact values) against the 10x replicated
`.scale_data/sf1` tables for the most expensive queries in the battery.

Names are chosen by round-10 battery cost (BENCH_LOCAL_r10.json) plus
the scale-sensitive sketch/dedup families the round-10 verdict called
out. Queries whose oracles replay hash mixes / quantized sums replay
them at sf1 identically — both engines read the same constants — so a
hash match here certifies the ARITHMETIC at 10x data, not just the
plan shape.

Usage:
  python tools/oracle_at_scale.py             # full list -> ORACLE_SF1.md
  python tools/oracle_at_scale.py --sf10      # 100x tier -> ORACLE_SF10.md
  python tools/oracle_at_scale.py q_zipf_fit  # subset, report to stdout
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale_data",
    "sf1",
)

# most expensive battery queries (r10 walls, sec at sf0.1) + the
# verdict-named scale-sensitive families; every name is oracle-gated.
#
# Historical note: q_fuzzy_match was absent through round 13 (its
# registered oracle is the brute-force all-pairs levenshtein — ~1e10
# single-threaded comparisons at sf1: the ORACLE is quadratic, not the
# engine). Round 14 seated it via SCALE_ORACLE_OVERRIDES below — an
# independent DuckDB replay of the FastSS blocked-exact algorithm.
# q_containment_pairs replays its registered inverted-index oracle
# directly (seated round 13).
NAMES = [
    "q_bootstrap_ci",      # 3.33 — 100x Poisson explode, quantized sums
    "q_char_lm_quality",   # 2.00 — char-LM log-prob quantization
    "q_npmi_pairs",        # 1.86 — pruned pair table + log quantization
    "q_kll_sketch",        # 1.66 — deterministic compaction tree depth
    "q_expectations",      # 1.63 — full-scan gate, rule counters
    "q_dedup_spans",       # 1.16 — rolling-hash span index
    "q21_waiting_supplier",  # 1.11 — heaviest TPC-H multi-join
    "q_attribution",       # 0.87 — per-user ordered credit splits
    "q_hll_groups",        # 0.78 — grouped HLL registers (saturation)
    "q_gopher_rules",      # 0.65 — rule-set text filters
    "q_kappa_agreement",   # 0.52 — chance-agreement quantization
    "q_kmv_overlap",       # 0.49 — KMV k-th minimum saturation
    "q_dedup_minhash_lsh", # banded LSH candidate generation
    "q_semdedup",          # k=ceil(sqrt(n)) scale-aware clustering
    "q_zipf_fit",          # ln-rank regression, rank from 10x vocab
    "q_hll_distinct",      # HLL at 10x distincts (register saturation)
    "q_cm_sketch",         # count-min width/depth saturation at 10x
    "q_bloom_prefilter",   # Bloom fill-ratio drift at 10x keys
    "q_kaplan_meier",      # prefix scans over 10x distinct times
    "q_calibration",       # integer ECE telescoping at 10x rows
    # every round-11 operator replays here too — new code earns its
    # scale-answer evidence the round it lands
    "q_curation_pipeline", # six-stage composition over 10x docs
    "q_calibration_drift", # carry-pair snapshot merge at 10x rows
    "q_log_rank",          # at-risk grid over 10x distinct times
    "q_bh_fdr",            # rank ladder + running min at 10x parts
    "q_rank_metrics",      # DCG ladder over 10x candidate corpus
    "q_kruskal",           # midrank prefix scan over 10x values
    "q_bootstrap_ratio",   # two weighted sums, 10x the explode
    "q_good_turing",       # fof table over the 10x vocabulary
    "q_cvm_drift",         # decimal(38,0) term sums at 10x counts
    "q_hill_tail",         # top-501 heap over the 10x fact table
    "q_effect_size",       # decimal Σq² moments at 10x rows
    "q_mcnemar",           # per-user windows over 10x event rows
    "q_wilson_ci",         # shared z/z2 literal folds at 10x rows
    "q_anova",             # Welch carry-sum folds at 10x group sizes
    "q_kendall_tau",       # int128 pair counts over the 10x grid mass
    "q_chao1_richness",    # f1/f2 folds over the 10x trigram space
    "q_isotonic",          # minimax interval means at 10x bin counts
    "q_mann_kendall",      # tie-corrected Var(S) decimals at 10x days
    "q_conformal",         # order-statistic k at 10x calibration n
    "q_perm_test",         # 64x Bernoulli explode, quantized sums
    "q_cronbach",          # decimal item/total moments at 10x users
    "q_theil_index",       # quantized-ln mass sums at 10x orders
    "q_audience_overlap",  # exact pair counts at 10x user sets
    "q_tfidf_topk",        # quantize-before-rank winners, 10x df table
    "q_readability",       # int64 score sums at 10x docs
    "q_stream_cusum_merge",# snapshot max-merge + integer CUSUM at 10x
    "q_ljung_box",         # exact lag-covariance decimals at 10x days
    "q_dispersion",        # (n, Σx, Σx²) day folds at 10x counts
    "q_cochran_armitage",  # integer trend folds at 10x orders
    "q_friedman",          # per-block array midranks at 10x users
    "q_embed_truncation",  # prefix-cosine quantized gaps at 10x pairs
    "q_rmst",              # KM-integral segment sums at 10x users
    "q_cuped",             # pooled theta decimals at 10x rows
    "q_weighted_kappa",    # 5x5 ordinal folds at 10x user pairs
    "q_multimodal_ppm",    # real P6 decode round trip at 10x ids
    # round-12 additions (pin + sf1 row land WITH the operator — the
    # round-11 ask #3 protocol)
    "q_multimodal_pgm",    # real P5 gradient decode at 10x ids
    "q_multimodal_pbm",    # real P4 padded-bitmap decode at 10x ids
    "q_rank_metrics32",    # the battery variant earns its own sf1 row
    "q_wasserstein_drift", # exact |gap|·width integral at 10x values
    "q_atkinson",          # quantized-ln mass folds at 10x orders
    "q_hhi",               # decimal share squares at 10x customers
    "q_term_burstiness",   # exact (n·Σc²−tf²) folds at 10x postings
    "q_brown_forsythe",    # grouped median prefix scan at 10x values
    "q_silhouette",        # exact centroid ratios at 10x vectors
    # round-12 extension (round-11 ask #2): the walls-only pinned
    # heavy families — iterative fits, prefix scans, saturating
    # sketches, interval carries — exactly the shapes where a
    # MinHash-class bug (right at sf0.01, wrong at scale) could hide
    "q_kmeans_clusters",   # Lloyd iterations at 10x points
    "q_dedup_embedding",   # banded cosine dup pairs at 10x vectors
    "q_dedup_exact_groups",# hash-group dup clusters at 10x docs
    "q_heavy_hitters",     # Misra-Gries merge at 10x stream mass
    "q_weighted_quantiles",# weighted rank scan at 10x rows
    "q_exact_quantiles",   # distributed order stats at 10x rows
    "q_merge_intervals",   # interval-chain carries at 10x spans
    "q_resample_linear",   # gap interpolation at 10x grid
    "q_resample_locf",     # last-obs carry at 10x grid
    "q_temperature_mix",   # softmax mixture weights at 10x sources
    "q_global_running_sum",# range-partitioned prefix scan at 10x rows
    "q_table_diff",        # full-outer diff at 10x keys
    "q_rolling_distinct",  # sliding distinct windows at 10x days
    "q_zorder_roundtrip",  # Z-order interleave + scan at 10x rows
    # round-13 additions (pin + sf1 row land WITH the operator)
    "q_multimodal_p3",     # ASCII P3 comment+maxval decode at 10x ids
    "q_multimodal_p2",     # ASCII P2 maxval-999 gradient at 10x ids
    "q_multimodal_p1",     # ASCII P1 packed-digit decode at 10x ids
    "q_energy_distance",   # straddling-pair decimal folds at 10x values
    "q_mood_median",       # pooled-median straddle counts at 10x rows
    "q_brier_decomposition",  # per-bin quantized-term folds at 10x rows
    "q_mojibake_audit",    # regexp-class counters at 10x docs
    "q_stratified_sample", # exact allocation checksums at 10x strata n
    "q_ams_f2",            # 4-wise sign sums at 10x stream mass
    # round-13 extension (round-12 ask #3): the remaining high-risk
    # pinned-without-sf1 names — iterative fits, interval carries,
    # join-heavy shapes (the MinHash-class risk profile)
    "q_triangle_count",    # oriented wedge join at 10x edges
    "q_pagerank",          # iterative mass passing at 10x graph
    "q_frequent_pairs",    # support-pruned pair join at 10x baskets
    "q_containment_pairs", # inverted-index containment at 10x docs
    "q_decontaminate",     # broadcast eval-shingle hit join at 10x docs
    "q_scd2_lookup",       # as-of interval lookup at 10x keys
    "q_nelson_aalen",      # hazard prefix scan at 10x distinct times
    "q_seasonal_residuals",# per-(dow) seasonal fit at 10x days
    "q_interpolate_linear",# neighbor-carry interpolation at 10x gaps
    "q_stream_expectations",  # rule-counter snapshot merge at 10x rows
    # round-14 additions (pin + sf1 row land WITH the operator)
    "q_spearman_footrule", # global-rank displacement sums at 10x parts
    "q_rbo_topk",          # integer prefix-overlap weights at 10x parts
    "q_hodges_lehmann",    # weighted pair-diff order stats at 10x events
    "q_containment_lsh",   # band-candidate containment at 10x docs
    "q_containment_subsets",  # prefix-filter recall-1 at 10x docs+quotes
    "q_multimodal_png",    # real zlib-inflate PNG decode at 10x ids
    "q_multimodal_bmp",    # real 24-bit BMP decode at 10x ids
    "q_dedup_weighted_minhash",  # weighted-Jaccard LSH at 10x docs
    "q_dsir_weights",      # quantized log-ratio folds at 10x tokens
    "q_fuzzy_match",       # FastSS blocked-exact replay (see override)
    "q_theils_u",          # quantized entropy/MI folds at 10x orders
    "q_krippendorff",      # per-unit disagreement folds at 10x events
    # round-14 extension (round-13 ask #5): the next highest-risk
    # pinned-without-sf1 names — the simhash band join, drift/outlier
    # per-value scans, the n-gram explode, skew/report aggregates,
    # rank-ladder AUCs and the remaining rank/lexical shapes
    "q_dedup_simhash_pairs",  # 16-bit band join + Hamming verify at 10x
    "q_skew_report",       # per-key mass + moments audit at 10x rows
    "q_ks_drift",          # per-value ECDF prefix scan at 10x values
    "q_mad_outliers",      # double-median selection at 10x rows
    "q_ngram_counts",      # trigram explode + count at 10x docs
    "q_mann_whitney",      # doubled-midrank folds at 10x values
    "q_cliffs_delta",      # U-identity effect size at 10x values
    "q_roc_auc",           # rank-sum AUC ladder at 10x scores
    "q_pr_auc",            # precision step integral at 10x scores
    "q_equidepth_histogram",  # exact boundary selection at 10x rows
    "q_vocab_oov",         # vocab anti-join coverage at 10x tokens
    "q_lexical_diversity", # TTR/Herdan folds at 10x docs
    "q_gini_revenue",      # grouped Lorenz ranks at 10x customers
    "q01_pricing_summary", # the TPC-H flagship aggregate at 10x rows
    "q03_nation_revenue",  # broadcast-dim join shape at 10x rows
]


# sf10 subset: a second evidence tier — "correct at 100x driver data".
# Restricted to ALL-TABLE-CHEAP queries (DuckDB must also chew 100x;
# the explode-heavy text/dedup shapes stay sf1-only) and biased toward
# saturation-sensitive sketches and quantized-sum folds, where a
# 100x-only bug would live.
NAMES_SF10 = [
    "q_anova",             # Σq² decimals at 6e8-row group sizes
    "q_wilson_ci",         # z-fold at 100x (n, n_pos)
    "q_theil_index",       # quantized-ln mass sums, 100x orders
    "q_dispersion",        # day folds at 100x counts
    "q_cochran_armitage",  # integer trend folds, 100x orders
    "q_mann_kendall",      # Var(S) decimals, 100x-count day table
    "q_cusum_shift",       # integer CUSUM path at 100x daily counts
    "q_hll_distinct",      # register saturation at 100x distincts
    "q_cm_sketch",         # count-min saturation at 100x keys
    "q_bloom_prefilter",   # Bloom fill ratio at 100x keys
    "q_cronbach",          # decimal moments at 100x users
    "q_ljung_box",         # lag-covariance decimals at 100x counts
    # round-12: the all-table-cheap additions whose failure mode is
    # arithmetic (int64 guards, decimal folds, quantized-ln mass) —
    # exactly what only a 100x answer replay can certify
    "q_wasserstein_drift", # |cum_a*n_b - cum_b*n_a| int64 guard at 100x
    "q_atkinson",          # quantized-ln mass folds at 100x orders
    "q_hhi",               # decimal share squares at 100x customers
    "q_brown_forsythe",    # 2x-median integers + decimal z² at 100x
    # round-13: the new quantized/decimal folds at 100x
    "q_energy_distance",   # three straddling-pair decimal folds at 100x
    "q_mood_median",       # int64 quotient-term folds at 100x rows
    "q_brier_decomposition",  # decimal bin sums + term folds at 100x
    "q_ams_f2",            # 4-wise sign sums + decimal squares at 100x
    # round-14: the new rank/shift folds at 100x (containment_lsh stays
    # sf1-only — its oracle is the quadratic exact baseline)
    "q_spearman_footrule", # decimal displacement sums at 100x parts
    "q_rbo_topk",          # integer weight folds at 100x parts
    "q_hodges_lehmann",    # HUGEINT pair-weight order stats at 100x
    "q_theils_u",          # quantized ln folds at 100x orders
    "q_krippendorff",      # HUGEINT unit folds at 100x events
]


# sf-tier ORACLE OVERRIDES: a name whose registered oracle is, by design,
# the brute-force exact baseline can still earn a scale ANSWER row when
# an INDEPENDENT DuckDB replay of the bounded algorithm exists. The
# sf0.01 driver gate keeps the brute-force oracle (the strongest
# check); the override here is a from-scratch SQL implementation of the
# same blocked-exact algorithm, so a hash match still cross-certifies
# the arithmetic between two engines at 10x data.
#
# q_fuzzy_match: the registered oracle is all-pairs levenshtein over
# customer names — ~1.1e10 comparisons at sf1 (names share one length,
# so the length prefilter blocks nothing): the ORACLE is quadratic, not
# the engine. The override replays FastSS deletion-neighborhood
# blocking (recall exactly 1 for max_dist=1 by the FastSS theorem) in
# pure DuckDB SQL: explode name + all single-char deletions, candidate
# pairs share a variant, verify levenshtein <= 1, distinct.
SCALE_ORACLE_OVERRIDES = {
    "q_fuzzy_match": r"""
    WITH c AS (SELECT c_custkey AS id, c_name AS nm FROM customer),
    vars AS (
      SELECT id, nm,
             unnest(list_append(
               [nm[1:i-1] || nm[i+1:] for i in range(1, length(nm) + 1)],
               nm)) AS v
      FROM c
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.nm AS na, b.nm AS nb
      FROM vars a JOIN vars b ON a.v = b.v AND a.id < b.id
    )
    SELECT id_a, id_b, CAST(levenshtein(na, nb) AS BIGINT) AS dist
    FROM cand WHERE levenshtein(na, nb) <= 1
    """,
}


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--sf10"]
    sf10 = "--sf10" in sys.argv[1:]
    data_dir = SF1.replace("sf1", "sf10") if sf10 else SF1
    names = argv or (NAMES_SF10 if sf10 else NAMES)
    from pyspark.sql import SparkSession

    from dataframes_jl_spark.oracle import compare, duckdb_run
    from dataframes_jl_spark.queries import ORACLES, QUERIES

    unknown = [n for n in names if n not in QUERIES or n not in ORACLES]
    if unknown:
        print(f"not oracle-gated registry names: {unknown}")
        return 2
    if not os.path.isdir(data_dir):
        print(f"missing {data_dir} — run tools/gen_scale_data.py first")
        return 2

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows, failed = [], []
    for name in names:
        t0 = time.perf_counter()
        try:
            osql = SCALE_ORACLE_OVERRIDES.get(name, ORACLES[name])
            problems = compare(
                QUERIES[name](spark, data_dir),
                duckdb_run(osql, data_dir),
            )
        except Exception as exc:  # surface, keep going: report all rows
            problems = [f"EXCEPTION: {type(exc).__name__}: {exc}"]
        dt = time.perf_counter() - t0
        status = "ok" if not problems else "FAIL"
        if problems:
            failed.append(name)
        rows.append((name, status, dt, problems[:2]))
        print(f"{status:4} {name:28} {dt:7.2f}s {problems[:2]}", flush=True)

    if not argv:
        _write_report(rows, failed, sf10)
    print(f"\n{len(rows) - len(failed)}/{len(rows)} ok; failed: {failed}")
    return 1 if failed else 0


def _write_report(rows, failed, sf10=False) -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tier = ("sf10", "100x") if sf10 else ("sf1", "10x")
    lines = [
        f"# ORACLE_{tier[0].upper()} — DuckDB-oracle hash replay at "
        f"{tier[0]} ({tier[1]} driver data)",
        "",
        "Same strict compare as the driver's sf0.01 gate (row count, column",
        "names, dtype class, exact values after column-name sort), run",
        f"against `.scale_data/{tier[0]}`. Generated by tools/oracle_at_scale.py.",
        "",
        f"Result: **{len(rows) - len(failed)}/{len(rows)} hash-green**"
        + (f"; FAILED: {failed}" if failed else "."),
        "",
        "| query | status | wall (s) | notes |",
        "|---|---|---|---|",
    ]
    for name, status, dt, probs in rows:
        note = "; ".join(str(p) for p in probs) if probs else ""
        lines.append(f"| {name} | {status} | {dt:.2f} | {note} |")
    lines.append("")
    fname = f"ORACLE_{tier[0].upper()}.md"
    with open(os.path.join(here, fname), "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {fname}")


if __name__ == "__main__":
    sys.exit(main())
