#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans for the flagship
scale queries, with the property each plan is expected to exhibit.

Run from the repo root: ``python tools/gen_plans.py``. Keeping the
plans checked in makes plan regressions reviewable in diffs the same
way result regressions are reviewable in CORRECTNESS files.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHOWCASE = [
    (
        "q01_pricing_summary",
        "Filters/projections reach the parquet scan; two-phase "
        "(partial -> final) aggregation around one exchange.",
    ),
    (
        "q05_local_supplier_volume",
        "Join order: date-filtered lineitem x orders first (the two big "
        "facts co-shuffle once), dimensions broadcast, no cartesian.",
    ),
    (
        "q_dedup_minhash_lsh",
        "Signature stage behind hashpartitioning(id) exchanges "
        "(materialization barrier), band join ships only (id, band, "
        "bucket), no CartesianProduct anywhere.",
    ),
    (
        "q_decontaminate",
        "Eval shingle table broadcast; train corpus probed map-only; "
        "scan-stage Filters carry ONLY source predicates (no inferred "
        "size()>0 tokenizer re-run).",
    ),
    (
        "q_bm25_search",
        "Posting lists filtered to query terms before the join; corpus "
        "scalars ride a 1-row broadcast; per-doc sum over int64 "
        "quantized term scores.",
    ),
    (
        "q_asof_join",
        "Union-merge as-of: ONE shuffle keyed on user_id, running "
        "last() over the merged event-time sort; no range nested loop.",
    ),
    (
        "q_bucketed_join",
        "(See tests/test_plans.py: with broadcast disabled the join of "
        "the two bucketed tables is a SortMergeJoin with zero shuffle "
        "exchanges.)",
    ),
    (
        "q_dedup_spans",
        "Position n-grams in one map-side projection; doc-frequency cap "
        "aggregated once and joined before the gram self-join; diagonal "
        "runs via fine-grained (id_a, id_b, offset) windows — no "
        "cartesian, no SinglePartition.",
    ),
    (
        "q_rolling_stats",
        "Single hashpartitioning(user_id) exchange feeding one Window "
        "with sliding RANGE-frame aggregate state; quantized int64 "
        "sums inside whole-stage codegen.",
    ),
    (
        "q_semdedup",
        "Pair join keyed on the coalesced non-nullable cluster id (no "
        "inferred IsNotNull argmin re-run at the scan, no cartesian); "
        "per-row norms computed once pre-join so each pair pays one "
        "dot-product aggregate; probe side hash-repartitioned.",
    ),
    (
        "q21_waiting_supplier",
        "EXISTS/NOT EXISTS decorrelated into one per-order countDistinct "
        "aggregate reusing the same orderkey shuffle as the join-back; "
        "supplier/nation dims broadcast.",
    ),
    (
        "q_bloom_prefilter",
        "Bitmap built with one explode + one bit_or aggregate, broadcast "
        "to the probe side; membership is a distinct-key probe join, "
        "never a per-row key-set broadcast.",
    ),
    (
        "q_quality_deciles",
        "Global NTILE through rangepartitioning + per-partition offsets; "
        "no SinglePartition exchange anywhere in the rank path.",
    ),
    (
        "q_global_running_sum",
        "Whole-column cumsum/diff through rangepartitioning on the "
        "ordering + per-partition running windows keyed by __pid__ + "
        "literal broadcast carries; the SinglePartition global window "
        "is gone (round-5).",
    ),
    (
        "q_hll_distinct",
        "256-register sketch from ONE map-side-combining max aggregate "
        "over pure int64 ARX hash arithmetic in whole-stage codegen; "
        "estimate + exact sides join by 1-row broadcast.",
    ),
    (
        "q_rolling_distinct",
        "Per-day 256-register sketches from ONE map-side-combining "
        "aggregate; the sliding window is an explode of days x 7 "
        "anchors + a second max aggregate over (window, register) — "
        "row volume is days x 256 x 7 regardless of event count; the "
        "exact COUNT DISTINCT audit is the only event-volume branch.",
    ),
    (
        "q_resample_locf",
        "One (user_id, bucket) two-phase aggregate over the raw scan; "
        "the per-key grid explodes from the #keys-row bounds aggregate "
        "(guarded sequence); gaps join back on the same keys and the "
        "LOCF window is partitioned by user_id — no SinglePartition, "
        "no driver-side grid.",
    ),
    # round-8 (round-7 verdict #6): record plan evidence for the claimed
    # round-7 shapes — the degree-oriented wedge join, the Apriori-pruned
    # self-join, and the KS single prefix scan
    (
        "q_triangle_count",
        "Degree orientation before the wedge join: edges re-keyed by "
        "(degree, node) so every self-join key has O(sqrt(m)) fan-out; "
        "the closing edge is a LeftSemi join — two keyed SortMergeJoins "
        "+ one semi, no CartesianProduct, no SinglePartition.",
    ),
    (
        "q_frequent_pairs",
        "Downward-closure prune BEFORE the only quadratic step: the "
        "frequent-item semi-join shrinks baskets, the in-plan width "
        "assert rides the projection, and the pair self-join keys on "
        "basket id — the quadratic term is bounded by the pruned "
        "basket width, never raw basket size.",
    ),
    (
        "q_ks_drift",
        "Both ECDFs from ONE distributed prefix scan: per-value counts "
        "full-outer merged, then with_running's rangepartitioning + "
        "broadcast-carry machinery — no SinglePartition window; the "
        "sup-gap is a map-side-combining max over exact int64 "
        "cross-products.",
    ),
    (
        "q_gini_revenue",
        "Rank-form Gini: one hashpartitioning(segment) window for "
        "row_number over the cents sort, then a map-side-combining "
        "aggregate on the same key — the decimal(38,0) rank-weighted "
        "sum is the only non-long accumulator; no SinglePartition.",
    ),
    (
        "q_survivorship",
        "One keyed window (row_number over user history) feeding one "
        "max_by-FILTER aggregate on the SAME key — AQE reuses the "
        "window's exchange; no join, no second shuffle.",
    ),
    (
        "q_mann_whitney",
        "Rank-sum over per-VALUE counts: the groupBy collapses events "
        "to the bounded value table, with_running's rangepartitioning "
        "prefix scan assigns midranks — no SinglePartition window; tie "
        "correction accumulates in decimal(38,0).",
    ),
    (
        "q_gini_global",
        "UNGROUPED Gini: the global rank rides global_row_number — "
        "rangepartitioning exchange + per-pid offset window — never a "
        "bare ORDER BY window; the only SinglePartition exchange feeds "
        "the final 1-row aggregate.",
    ),
    (
        "q_kll_sketch",
        "Compaction-tree sketch: one projection computes (q, h, blk); "
        "the local tree runs in applyInPandas behind a "
        "hashpartitioning(event_type, sup) exchange; the cross-block "
        "tail sees n*S/B-bounded rows; quantile scan windows over the "
        "bounded sketch only.",
    ),
    (
        "q_attribution",
        "Lookback-bounded user join (conversions x touches carries the "
        "time-window predicate in the join condition), one "
        "hashpartitioning(cid) window pass for pinned touch order, "
        "then a single channel aggregate; (direct) fallback is a "
        "left_anti on distinct conversion ids — no CartesianProduct.",
    ),
    (
        "q_kaplan_meier",
        "Distinct-time table first (one map-side-combining aggregate), "
        "then BOTH cumulative scans (at-risk, log-survival) ride "
        "with_running's rangepartitioning prefix machinery — no "
        "SinglePartition window anywhere; survival is one exp over "
        "the bounded curve table.",
    ),
    (
        "q_calibration",
        "ONE map-side-combining aggregate to (group, bin) rows — bin "
        "index computed from the int64 score units in the same "
        "projection — then a bounded groups-row fold; ECE's numerator "
        "is an exact-integer sum, so no per-bin division survives "
        "into the wide stage.",
    ),
    (
        "q_stream_expectations",
        "Snapshot-merge shape: the cumulative emission simulation is "
        "per-(shard, day) aggregates + keyed windows; the consumer "
        "merge is max-struct per (rule_id, shard), a shard-sum "
        "aggregate, and one broadcast label join — output bounded by "
        "the rule count, no row-volume shuffle after the first "
        "aggregate.",
    ),
    (
        "q_zipf_fit",
        "Vocabulary rank via global_row_number: rangepartitioning "
        "exchange + per-partition row_number with a #partitions-row "
        "offsets job — never a SinglePartition window; the regression "
        "collapses in ONE aggregate over quantized ln products.",
    ),
    (
        "q_curation_pipeline",
        "Six curation stages fused into ONE lazy plan: the Gopher "
        "predicates run inside the scan stage (no shuffle before the "
        "first dedup aggregate); exact dedup is one hash aggregate + "
        "semi join; the LSH band join ships only (id, band, bucket); "
        "decontamination broadcasts the eval shingles; the only keyed "
        "windows ride (domain) partitions. No CartesianProduct, no "
        "SinglePartition exchange anywhere in the composition.",
    ),
    (
        "q_isotonic",
        "The row-volume job is ONE partial->final hash aggregate to "
        "(group, bin); every later stage (prefix window, interval "
        "self-join, minimax group-bys) rides broadcast exchanges of "
        "the n_bins-bounded table — no sort or shuffle ever sees the "
        "event rows again.",
    ),
    (
        "q_conformal",
        "Two scans of the same projection (calibration counts, "
        "evaluation fold), one range-partitioned prefix scan over the "
        "distinct-residual table, and the q_hat order statistic rides "
        "broadcast 1-row crossJoins into the final map-side fold — no "
        "SinglePartition window anywhere.",
    ),
    (
        "q_perm_test",
        "The 64-replicate fan-out is a generator explode INSIDE the "
        "scan stage (no pre-explode shuffle); the only exchange is the "
        "map-side-combining (replicate) aggregate, and the p-value "
        "folds a 64-row bounded table against a broadcast observed "
        "row.",
    ),
    (
        "q_wasserstein_drift",
        "Both sides collapse map-side to per-value counts; cums ride "
        "the range-partitioned prefix scan and the next-value gap is "
        "one co-partitioned rn+1 self-join over the distinct-value "
        "table — no SinglePartition window, no CartesianProduct "
        "(totals ride broadcast 1-row crossJoins).",
    ),
    (
        "q_brown_forsythe",
        "ONE partial->final (group, value) hash aggregate is the only "
        "row-volume job; the grouped prefix scan, the median pick, "
        "and the deviation fold all ride the bounded per-value table "
        "— the raw event rows are scanned exactly once.",
    ),
    (
        "q_silhouette",
        "Two row-volume jobs, both map-only shapes: the posexplode "
        "(label, dim) centroid aggregate, then a single projection "
        "computing all |labels| quantized distances per row against "
        "LITERAL centroids — no join, no window; the final exchange "
        "aggregates to |labels| rows.",
    ),
    (
        "q_atkinson",
        "ONE map-side-combining (group, value) count is the only "
        "row-volume job; ln runs once per DISTINCT value and the "
        "Σc·ln_q(u) / Σc·u folds are a bounded regroup — no window, "
        "no join, no second scan of the fact table.",
    ),
    (
        "q_hhi",
        "One (group, entity) partial->final aggregate over the row "
        "volume, then the share-square fold over the bounded entity "
        "table; group totals attach via broadcast — no "
        "SinglePartition, no CartesianProduct on row volume.",
    ),
    (
        "q_term_burstiness",
        "ONE (doc, term) map-side-combining count is the only "
        "row-volume job; tf/df and the zero-inclusive VMR fold from "
        "exact int64 sums over the bounded term table, and the top-k "
        "is TakeOrderedAndProject (per-partition heaps, no global "
        "sort).",
    ),
    (
        "q_rank_metrics32",
        "The probe set rides ONE broadcast onto the corpus scan; "
        "exact-cosine scores fold map-side and the per-probe DCG "
        "ladder aggregates the bounded (probe, rank) table — linear "
        "in the corpus at fixed probes, no CartesianProduct on row "
        "volume.",
    ),
    (
        "q_multimodal_pgm",
        "The full binary-decode round trip is two chained "
        "Arrow-batched mapInPandas stages over the id scan — "
        "synthesize then parse — with NO shuffle anywhere: the plan "
        "is a straight pipeline, so decode throughput scales with "
        "input splits alone.",
    ),
    (
        "q_multimodal_p2",
        "Same straight mapInPandas pipeline as the binary family — "
        "the ASCII parser changes the kernel, not the plan: no "
        "shuffle, no join; per-file splits are the only parallelism "
        "lever needed at 100 TB of payloads.",
    ),
    (
        "q_energy_distance",
        "Wasserstein's exact plan family: map-side per-value counts, "
        "ONE range-partitioned prefix scan for both cums, one "
        "co-partitioned rn+1 gap join — and all three straddling-"
        "pair expectations fold in a SINGLE aggregate over that "
        "joined table (no extra pass per expectation); the merged "
        "table is persisted against branch re-computation.",
    ),
    (
        "q_mood_median",
        "ONE (group, value) map-side-combining count feeds every "
        "branch from persisted cache: the pooled prefix scan, the "
        "1-row broadcast median, the per-group straddle counts, and "
        "the quantized quotient fold — the fact table is scanned "
        "exactly once.",
    ),
    (
        "q_brier_decomposition",
        "ONE binned map-side-combining aggregate over the row volume "
        "produces <= n_bins rows (persisted); totals and the REL/RES "
        "term folds are bounded-table work under broadcast attaches — "
        "no window, no second scan.",
    ),
    (
        "q_mojibake_audit",
        "A single map-side-combining aggregate whose inputs are "
        "JVM-side regexp_count projections — whole-stage codegen from "
        "scan to partial agg, one exchange keyed on the group, no "
        "UDF, no second pass.",
    ),
    (
        "q_stratified_sample",
        "Two-level rank, never one-task-per-stratum: the row volume "
        "shuffles ONCE keyed (stratum, hash-range-bucket) — "
        "|strata|·64-way parallel — and the stratum rank reassembles "
        "as local row_number + broadcast lower-bucket offsets over "
        "the bounded counts table (a naive per-stratum window "
        "serialized 3 strata into 3 tasks: 17 s at sf10 vs 3.7 s).",
    ),
    (
        "q_containment_pairs",
        "The inverted-index self-join is a SortMergeJoin (merge hint, "
        "round-14 fix): posting lists stream with a spillable match "
        "buffer — never a BroadcastHashJoin over the exploded "
        "row-volume side (the r13 sf10 BytesToBytesMap incident).",
    ),
    (
        "q_containment_lsh",
        "Band-bucket equi-join generates candidates (collision-"
        "bounded, never all-pairs); exact containment verifies via "
        "array_intersect on the candidates only; banded + verify "
        "tables branch off ONE hash-on-id exchange (ReusedExchange).",
    ),
    (
        "q_spearman_footrule",
        "Both global ranks are range-partitioned prefix-scan ranks "
        "(rangepartitioning + per-pid offsets) — no SinglePartition "
        "window anywhere; one hash join on the item id, one final "
        "1-row aggregate.",
    ),
    (
        "q_hodges_lehmann",
        "The pairwise-difference space is the |V_a| x |V_b| cross of "
        "BOUNDED per-value tables (broadcast small side), never a "
        "row-volume product; one prefix scan selects both weighted "
        "order statistics.",
    ),
    (
        "q_dsir_weights",
        "The V+1-row log-ratio table BROADCASTS into the raw token "
        "explode (BroadcastHashJoin); row volume shuffles only at the "
        "two token-count aggregates and the final per-doc groupBy.",
    ),
    (
        "q_ams_f2",
        "The sketch pass is ONE map-side-combining ungrouped "
        "aggregate carrying all 8 sign sums (mergeable counters — the "
        "streaming shape); the exact baseline is the documented "
        "second pass; the two 1-row results meet in a broadcast "
        "crossJoin.",
    ),
]


def main() -> None:
    from dataframes_jl_spark.queries import QUERIES
    from dataframes_jl_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="djs-plans")
    spark.sparkContext.setLogLevel("ERROR")

    out = [
        "# PLANS — physical plans of the flagship scale queries",
        "",
        f"Auto-generated by `tools/gen_plans.py` at sf_dir={sf_dir}.",
        "Regenerate after any operator change: `python tools/gen_plans.py`.",
        "",
    ]
    for name, prop in SHOWCASE:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            QUERIES[name](spark, sf_dir).explain("formatted")
        plan = buf.getvalue()
        # keep the tree + scan details, drop the long per-node I/O lists
        tree = plan.split("\n\n")[0]
        scans = [
            ln.strip()
            for ln in plan.splitlines()
            if ln.strip().startswith(("PushedFilters:", "ReadSchema:"))
        ]
        out += [
            f"## {name}",
            "",
            f"**Expected property:** {prop}",
            "",
            "```",
            tree.strip(),
            *(["", *scans] if scans else []),
            "```",
            "",
        ]
    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
