#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line with per-query wall seconds.

Execution is measured with the noop sink (full computation, no result
serialization to the driver), after a warm-up action to amortize JVM/
codegen startup into none of the measured numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: one per operator family (filter+agg, multi-join, window,
# dedup, reshape, text) — extend as operators land
HEADLINE = [
    "q01_pricing_summary",
    "q03_nation_revenue",
    "q06_forecast_revenue",
    "q_window_topk_per_group",
    "q_cumulative_user_value",
    "q_pivot_status",
    "q_join_left",
    "q_distinct",
    "q_dedup_minhash_lsh",
    "q_dedup_simhash_pairs",
    "q_text_stats",
    "q_quality_score",
    "q_ann_bruteforce",
    "q_multimodal_decode",
    "q_sessionize",
    "q05_local_supplier_volume",
    "q_asof_join",
    "q_range_join",
    "q_decontaminate",
    "q_kmeans_clusters",
    "q_mixture_weights",
    "q_bm25_search",
    "q_weighted_sample",
    "q_vocab_approx",
    "q_take_per_group",
    "q_dedup_spans",
    "q_rolling_stats",
    "q09_product_profit",
    "q21_waiting_supplier",
    "q_semdedup",
    "q_gopher_rules",
    "q_scd2_intervals",
    "q_grouped_ols",
    "q_bloom_prefilter",
    "q_cm_sketch",
    "q_psi_drift",
    "q_quality_deciles",
    # round 5
    "q_global_running_sum",
    "q_hll_distinct",
    # round 6
    "q_hll_groups",
    "q_kmv_overlap",
    "q_merge_intervals",
    "q_fuzzy_match",
    "q_table_diff",
    "q_heavy_hitters",
    "q_mad_outliers",
    "q_ngram_counts",
    "q_skew_report",
    "q_temperature_mix",
    "q_exact_quantiles",
    "q_weighted_quantiles",
    "q_resample_locf",
    "q_rolling_distinct",
    # round 8
    "q_gini_revenue",
    "q_cusum_shift",
    "q_survivorship",
    "q_benford_prices",
    "q_winsorized_balance",
    "q_containment_pairs",
    # round 9: the round-8 statistics battery (round-8 verdict #6) so
    # vs_prior tracking covers these families from birth...
    "q_theilsen_trend",
    "q_autocorrelation",
    "q_mann_whitney",
    "q_welch_ttest",
    "q_jsd_drift",
    "q_kappa_agreement",
    "q_cell_residuals",
    "q_null_matrix",
    "q_vocab_oov",
    "q_char_lm_lean",  # r15 lean seat (ask #8); full gate keeps oracle+pin+sf1
    # ...and the round-9 operators
    "q_kll_sketch",
    "q_gini_global",
    "q_roc_auc",
    "q_interpolate_linear",
    "q_attribution",
    "q_pr_auc",
    "q_expectations",
    "q_kaplan_meier",
    "q_target_encode",
    "q_npmi_pairs_lean",  # r15 lean seat (min_count 60)
    "q_log_odds",
    "q_lexical_diversity",
    "q_cv_auc",
    # round 10 operators
    "q_calibration",
    "q_stream_expectations",
    "q_nelson_aalen",
    "q_cliffs_delta",
    "q_zipf_fit",
    "q_bootstrap_ci25",  # r15 lean seat (B=25)
    # round 11 operators. TWO stay OUT of the battery under the keep-
    # it-lean rule, each covered by its oracle gate and scale pin:
    # q_curation_pipeline (six-stage integration gate, ~10x the median
    # headline wall) and q_bootstrap_ratio (the B=100 explode over
    # lineitem is ~26 s at sf0.1 — the bootstrap family's battery
    # representative remains q_bootstrap_ci)
    "q_calibration_drift",
    "q_log_rank",
    "q_bh_fdr",
    # q_rank_metrics rides the battery as its 32-probe variant (round-
    # 11 ask #6): the 64-probe gate was 5.4 s = 11.6% of the battery,
    # cost-by-design (exact-cosine baseline, linear in corpus at fixed
    # probes); the full shape keeps its oracle, scale pin, and sf1
    # answer row — same plan, half the probe broadcast here
    "q_rank_metrics16",  # r15: battery drops to 16 probes (ask #8); 32/64 keep oracle+pin+sf1
    "q_kruskal",
    "q_good_turing",
    "q_cvm_drift",
    "q_hill_tail",
    "q_effect_size",
    "q_mcnemar",
    "q_wilson_ci",
    # q_chao1_richness stays OUT of the battery under the keep-it-lean
    # rule (4.2 s at sf0.1 — the trigram explode IS the cost; covered
    # by its oracle gate and its sf10 pin at seg +0.79)
    "q_anova",
    "q_kendall_tau",
    "q_isotonic",
    "q_mann_kendall",
    "q_conformal",
    "q_perm_test",
    "q_cronbach",
    "q_theil_index",
    "q_audience_overlap",
    "q_tfidf_topk",
    "q_readability",
    "q_stream_cusum_merge",
    "q_ljung_box",
    "q_dispersion",
    "q_cochran_armitage",
    "q_friedman",
    "q_embed_truncation",
    "q_rmst",
    "q_cuped",
    "q_weighted_kappa",
    "q_multimodal_ppm",
    # round 12 operators
    "q_multimodal_pgm",
    "q_multimodal_pbm",
    "q_wasserstein_drift",
    "q_atkinson",
    "q_hhi",
    "q_term_burstiness",
    "q_brown_forsythe",
    "q_silhouette",
    # round 13 operators
    "q_multimodal_p3",
    "q_multimodal_p2",
    "q_multimodal_p1",
    "q_energy_distance",
    "q_mood_median_lean",  # r15 lean seat (1/3 orders)
    "q_brier_decomposition",
    "q_mojibake_audit",
    "q_stratified_sample",
    "q_ams_f2",
    # round 14 operators
    "q_spearman_footrule",
    "q_rbo_topk",
    "q_hodges_lehmann",
    "q_containment_lsh",
    "q_dsir_weights",
    "q_theils_u",
    "q_krippendorff",
    "q_multimodal_png",
    "q_multimodal_bmp",
    # q_dedup_weighted_minhash is EXCLUDED from the battery (keep-lean:
    # ~3.5 s warm at sf0.1 — the synthetic corpus's 50-word vocabulary
    # makes bigram-count profiles band-collide broadly even though only
    # 256 pairs verify; covered by oracle gate + pin + sf1 row)
    # round 15 operators: q_containment_subsets is EXCLUDED from the
    # battery (keep-lean rule: ~7.8 s at sf0.1 — a recall-1 subset-mining
    # certification lane, pinned + sf1/sf10-gated instead; see
    # tools/scale_pins.json and ORACLE_SF1.md)
]


def main() -> None:
    from dataframes_jl_spark.queries import QUERIES
    from dataframes_jl_spark.session import get_spark

    spark = get_spark(app_name="djs-bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in QUERIES]

    # Pre-fork a FULL complement of Python workers with numpy already
    # imported (one task per core, reuse=true returns them to the
    # pool). The ~1 s worker-fork + numpy-import cost otherwise binds
    # to whichever mapInPandas decode seat first needs a worker the
    # earlier queries didn't happen to spawn — a battery-order
    # artifact that masqueraded as a q_multimodal_* regression two
    # rounds running (SCALING.md; round-13 ask #7).
    def _prefork_python_workers():
        import pandas as pd  # noqa: F401

        cores = spark.sparkContext.defaultParallelism

        def _touch(it):
            import numpy as np  # the expensive per-worker import

            for batch in it:
                yield batch.assign(x=np.int64(0))

        (
            spark.range(cores * 4, numPartitions=cores)
            .mapInPandas(_touch, "id long, x long")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    _prefork_python_workers()

    # warm-up pass: JVM, codegen caches, parquet footers, python workers —
    # measured numbers are steady-state throughput, not cold-start
    for name in names:
        QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    # two timed passes, min per query: a heavy query's async shuffle/
    # broadcast cleanup bleeds into the NEXT query's wall time, so a
    # single pass can inflate whichever query follows a big one by 2-4x
    def _drain_cleanup():
        # shuffle files / broadcast blocks are reclaimed by the JVM
        # ContextCleaner only after the driver GCs the owning objects;
        # across ~25 headline queries that backlog grows enough to
        # inflate later heavy queries 2x. Nudge both GCs between
        # measurements so each query starts from a drained state.
        import gc

        # operators that persist internally for cross-job determinism
        # (with_running, global_row_number) would otherwise accumulate
        # cache blocks across 3x39 runs
        spark.catalog.clearCache()
        gc.collect()
        # System.gc() is ASYNC: fired immediately before t0 it bleeds
        # GC pause time INTO the measured window (round-6 verdict: an
        # unexplained ~8% bench-wide drift, 1.5-1.9x on sub-second
        # queries). Trigger it, then WAIT for the collection cycle to
        # register on the GC MXBeans before returning, plus a short
        # settle so concurrent phases finish outside the window.
        try:
            jvm = spark.sparkContext._jvm
            beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()

            def _gc_count():
                total = 0
                it = beans.iterator()
                while it.hasNext():
                    c = it.next().getCollectionCount()
                    if c > 0:
                        total += c
                return total

            before = _gc_count()
            jvm.System.gc()
            deadline = time.perf_counter() + 1.0
            while time.perf_counter() < deadline and _gc_count() <= before:
                time.sleep(0.02)
        except Exception:
            pass
        time.sleep(0.15)

    timings: dict[str, float] = {}
    for _ in range(3):
        for name in names:
            _drain_cleanup()
            df = QUERIES[name](spark, SF_DIR)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # r7 battery-vs-solo drift root cause (tools/bench_forensics.py):
        # the default 100-entry codegen class cache thrashed across 53
        # distinct queries, re-compiling Janino classes inside the timed
        # window. session.py now raises it to 10k (static conf).
        "notes": "codegen cache 10k (r8: fixes battery-vs-solo compile churn)",
    }
    # per-query delta vs the newest FULL local record (BENCH_LOCAL_r{N}
    # preferred — the driver's BENCH_r{N} copy clips past ~2000 chars,
    # so from round 9 on it is parsed:null and useless as a prior;
    # round-10 verdict: comparing against the last parseable driver
    # record silently skipped a whole round of walls)
    prior = _latest_local_bench() or _latest_recorded_bench()
    if prior:
        ref = prior.get("queries", {})
        out["vs_prior"] = {
            "prior_total": prior.get("value"),
            "ratio": round(total / prior["value"], 3) if prior.get("value") else None,
            "regressed": {
                n: {"now": t, "was": ref[n], "ratio": round(t / ref[n], 2)}
                for n, t in timings.items()
                if n in ref and ref[n] > 0 and t / ref[n] > 1.5
            },
        }
    # Truncation-proof in-repo record (round-9 lesson: the driver's
    # capture clipped BENCH_r09.json to the tail, losing the head of
    # the per-query map). Write the full sorted map to
    # BENCH_LOCAL_r{N}.json — N inferred as latest recorded round + 1.
    # NON-DESTRUCTIVE since r16 (r15 verdict #3: the driver's own run
    # overwrote the committed round record): when the name is taken,
    # fall to BENCH_LOCAL_r{N}_{k}.json for the first free k, so no
    # bench invocation ever erases an earlier record.
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        nxt = _latest_bench_round() + 1
        local = dict(out)
        local["queries"] = dict(sorted(timings.items()))
        path = os.path.join(here, f"BENCH_LOCAL_r{nxt:02d}.json")
        k = 0
        while os.path.exists(path):
            k += 1
            path = os.path.join(here, f"BENCH_LOCAL_r{nxt:02d}_{k}.json")
        with open(path, "w") as fh:
            json.dump(local, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError:
        pass
    print(json.dumps(_fit_for_capture(out), separators=(",", ":")))


# the driver keeps only the LAST ~2000 chars of stdout; a JSON line
# longer than that loses its head and records as parsed:null (rounds
# 9-10 did exactly this once the battery passed ~60 queries). Queries
# that track the round-1 baseline always survive the trim so the
# judge's bench_vs_baseline ratio stays computable from the driver
# record alone; the full map is in BENCH_LOCAL_r{N}.json either way.
_CAPTURE_BUDGET = 1900
_BASELINE_CORE = frozenset([
    "q01_pricing_summary", "q03_nation_revenue", "q05_local_supplier_volume",
    "q06_forecast_revenue", "q_ann_bruteforce", "q_asof_join",
    "q_cumulative_user_value", "q_dedup_minhash_lsh", "q_dedup_simhash",
    "q_distinct", "q_join_left", "q_multimodal_decode", "q_pivot_status",
    "q_quality_score", "q_range_join", "q_sessionize", "q_text_stats",
    "q_window_topk_per_group",
])


def _fit_for_capture(out: dict) -> dict:
    slim = {k: v for k, v in out.items() if k != "notes"}
    qs = dict(out["queries"])
    slim["nq_total"] = len(qs)
    slim["full_map"] = "BENCH_LOCAL (in-repo)"
    # Drop queries until the line fits the capture. Droppable order is
    # DETERMINISTIC ACROSS ROUNDS (r15 verdict #3/#4: by-cheapness alone
    # re-shuffled the printed set every round, shrinking the driver's
    # round-over-round comparison to the intersection): queries that
    # survived into the PREVIOUS round's printed record are dropped
    # last, so consecutive rounds print a superset-stable set; within
    # each tier, cheapest first (never a baseline-core query).
    prev_printed = frozenset(
        (_latest_recorded_bench() or {}).get("queries", {})
    )
    droppable = sorted(
        (n for n in qs if n not in _BASELINE_CORE),
        key=lambda n: (n in prev_printed, qs[n]),
    )
    while (
        len(json.dumps({**slim, "queries": qs}, separators=(",", ":")))
        > _CAPTURE_BUDGET
        and droppable
    ):
        qs.pop(droppable.pop(0))
    slim["queries"] = qs
    return slim


def _latest_local_bench() -> dict | None:
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    best, best_key = None, (-1, -1)
    for p in glob.glob(os.path.join(here, "BENCH_LOCAL_r*.json")):
        m = re.search(r"BENCH_LOCAL_r(\d+)(?:_(\d+))?\.json$", p)
        if not m:
            continue
        try:
            with open(p) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        key = (int(m.group(1)), int(m.group(2) or 0))
        if isinstance(data, dict) and "value" in data and key > best_key:
            best, best_key = data, key
    return best


def _latest_bench_round() -> int:
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    best = 0
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            best = max(best, int(m.group(1)))
    return best


def _latest_recorded_bench() -> dict | None:
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    best, best_n = None, -1
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if not m:
            continue
        try:
            with open(p) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        # the driver wraps the bench JSON line under "parsed"
        data = data.get("parsed", data)
        if not isinstance(data, dict) or "value" not in data:
            continue
        if int(m.group(1)) > best_n:
            best, best_n = data, int(m.group(1))
    return best


if __name__ == "__main__":
    sys.exit(main())
