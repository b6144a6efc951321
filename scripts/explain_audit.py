"""Dump formatted physical plans for representative queries → PLANS.md.

Evidence artifact for plan-quality review: each entry shows
`.explain("formatted")` output at sf0.01 plus the scale-relevant
properties the test suite pins (broadcasts, pushed filters, partition
pruning, Arrow vs row-wise Python, exchange counts).

Usage: python scripts/explain_audit.py [out_md]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"

# query → what to look for (rendered as a checklist above the plan)
AUDIT = {
    "g1q1_top10_popularity": "TakeOrderedAndProject (distributed top-k), single Exchange",
    "tpch_q1_pricing": "PushedFilters on l_shipdate; ReadSchema pruned to used columns",
    "g2q1_top10_customers_per_segment": "BroadcastHashJoin on the customer dimension",
    "tpch_q5_local_supplier_revenue": "broadcast dims, single agg Exchange after joins",
    "ingest_csv_roundtrip": "PartitionFilters on Year over the canonical parquet",
    "dedup_minhash_neardup": "ArrowEvalPython signature kernel; broadcast anti-join hot-bucket guard",
    "text_winnowing_overlap": "ArrowEvalPython fingerprint kernel; posting self-join + partial-agg count",
    "similarity_bruteforce_topk": "BroadcastNestedLoopJoin with small probe side broadcast",
    "skew_salted_dim_join": "join key extended with __salt (8-way scatter of hot keys)",
    "events_batch_sessionization": "two window stages sharing one user_id Exchange",
    "warehouse_bucketed_join": "Bucketed: true scans; no Exchange below the join",
    "embeddings_gram_matrix": "MapInPandas BLAS partials; single tiny (i,j) Exchange",
    "docs_tfidf_cosine_pairs": "JVM-only inverted-index self-join; broadcast df-prune",
    "orders_priority_scd2": "all windows + run agg share one o_custkey Exchange",
    "events_variant_shred": "single parse_json into VARIANT; shred stays in codegen",
    "customers_hierarchy_closure": "UnionLoop recursion; per-iteration distributed join",
    "events_countmin_heavy_hitters": "explode x4 collapsed by partial agg before Exchange",
    "docs_bigram_lm_score": "token-key hash aggs; count-table joins broadcast at this sf; no Python",
    "corpus_bpe_pair_merge": "per-word windows; TakeOrderedAndProject top-n (never a global sort)",
    "similarity_pq_adc_topk": "codebook + ADC table broadcast; raw vectors never shuffle",
    "parts_copurchase_lift": "in-partition basket pair Generate; no membership self-join",
    "events_seasonal_anomaly_hours": "stats join reuses (type,hour) keys; exact-integer predicate",
    "docs_weighted_sample": "single scan + TakeOrderedAndProject weighted top-k",
    "dedup_minhash_incremental": "persisted-index probe; group-collapsed both sides",
    "corpus_pipeline_funnel": "staged funnel sharing the exact-dedup window exchange",
    # r3 additions
    "dedup_semantic_keeplist": "broadcast centroid assignment; in-cell hash join; left-anti keep flag",
    "docs_epoch_reshuffle_shards": "doc_id-only ReadSchema; per-shard positions via the two-pass prefix (r8: every window (__pid, shard)-keyed)",
    "corpus_token_budget_select": "BroadcastHashJoin on the quality-bucket dim; in-bucket running sum via the two-pass prefix (r8: (__pid, q_bp)-keyed windows, never one task per bucket)",
    # r3b curation wave
    "events_kmv_distinct_users": "r9: literal rn <= k prefilter -> WindowGroupLimit Partial BELOW the exchange (map-side per-type heap); n_exact groupBy broadcast back (the old non-literal least() readout + whole-key count window defeated the rewrite); ReadSchema pruned to 2 cols",
    "storage_compaction_bin_pack": "SinglePartition window over the MANIFEST aggregate only (post-agg ~80 rows), never over facts",
    "docs_dsir_importance_weights": "256-bucket ratio table BroadcastHashJoin onto doc-features; one tokenize/explode/hash pass into cached (doc,bucket) counts; distributions and weights all aggregate that frame (InMemoryTableScan)",
    "embeddings_mutual_knn_graph": "broadcast centroid assignment; in-cell join + src-keyed rank window; directed edges cached for the reciprocity self-join",
    "parts_copurchase_triangles": "cached canonical/oriented edge frames; wedge + closing joins are keyed equi-joins (no CartesianProduct anywhere)",
    "dedup_simhash_clusters": "two-level CC: collapsed rep graph under the size gate solves in ONE FlatMapGroupsInPandas union-find task (no per-round label-propagation jobs); member labels via broadcast-joinable rep map",
    "lineitem_bloom_prune_revenue": "bloom bitmap literal filters the lineitem scan (xxhash64 codegen, no Python) BELOW the semi-join exchange; exact join absorbs false positives",
    # r4 additions
    "dedup_containment_neardup": "one-sided prefix x full-posting equi-join (never all-pairs); broadcast anti-join hot-token cap; hashed-set verify joins keyed on rep ids",
    "events_kmv_type_overlap": "r9: both rank windows (sketch build, <=2k-per-pair merge) filter on literal k -> WindowGroupLimit Partial below their exchanges; 5x5 pair grid broadcast; membership tags collapse via partial agg",
    "lineitem_join_size_estimate": "ReadSchema = l_partkey only; Catalyst pushes the hash-slice filter BELOW the estimate branch's aggregate (1/64 of rows shuffle — the production path); the exact Σc² branch re-scans, deliberately: it is the report's own check and would not run at 100 TB",
    # r4b/r4c additions
    "orders_cdc_log_apply": "partial_max_by below ONE hashpartitioning Exchange (map-side-combinable last-writer-wins); no Window, no sort of the log",
    "parts_copurchase_bfs_hops": "frontier-expansion rounds join the checkpointed edge RDD scan (no lineitem self-join re-run per round); r7b: broadcast anti-join filters discoveries BEFORE the dedup shuffle, two-frontier block (undirected), visited = lazy union of checkpointed frontiers",
    "parts_copurchase_kcore": "r7b delta peeling: one full degree agg (r8: over BOTH endpoint columns, with an in==out degree guard rejecting unmirrored lists), then node-sized rounds (broadcast scan for edges into the newly-dropped set, subtract, re-threshold); edge frame checkpointed once, survivor filter applied once at the end",
    "corpus_vocab_coverage": "r8: orderBy+limit (TakeOrderedAndProject per-partition heaps) BEFORE ranking — the term-frequency frame never sorts in one task; rank + cumulative windows run on <= 100 post-limit rows",
    "orders_window_rank_profile": "r8: ntile/percent_rank/cume_dist/nth_value reproduced as closed forms of the distributed per-group (row_number, N) — no window rank primitives in the plan, all windows (__pid, priority)-keyed",
    "embeddings_cluster_curation_report": "r8: celled mutual-kNN edges (cached) -> two-level CC (local union-find under the gate) -> component-keyed report aggregates; integer ten-thousandth cosine sums",
    "events_weighted_median_udaf": "AggregateInPandas planned as a real aggregate: partial-less single exchange on (type, day); finite-measure filter pushed into the scan",
    "dedup_span_removal": "ArrowEvalPython k-gram hash kernel; ONE corpus-wide hash-keyed shuffle (duplicated-gram count); island-merge + stitch are doc-key windows; no CartesianProduct",
    # r5 additions
    "events_dpp_weekend_scan": "dynamicpruningexpression + static dayofweek predicate BOTH in the fact scan's PartitionFilters; calendar dim broadcast",
    "events_ddsketch_quantiles": "ONE map-side-combinable (key, log-bucket) Exchange; rank frame broadcast onto the cumulative walk; no Python",
    "similarity_ivf_recall": "both rankings reuse the pinned brute/IVF pipelines; left-semi hit join; per-probe counts partial-agg before Exchange",
    "events_incident_session_overlap": "bucketed explode both sides -> hash EQUI join on __b (no CartesianProduct/BNLJ); canonical-bucket guard in the join condition; incident side auto-broadcast",
    "docs_paragraph_dedup": "posexplode blocks; partial min(struct) below the block-key Exchange; join back on the same key; no Window over the corpus",
    "parts_value_skyline": "exactly two MapInPandas phases (local SFS, bounded refine via repartition(1) Exchange — not Coalesce(1), which would collapse the local phase); dominance inputs are order-independent aggregates",
    "events_cusum_changepoints": "tiny series frame: stats BroadcastHashJoin; running-sum + running-min windows share one k-partitioned Exchange; zero Python",
    "parts_copurchase_adamic_adar": "wedge equi-join on the center key with degree weight attached pre-expansion; one anti-join non-adjacency check; TakeOrderedAndProject top-20",
    "parts_copurchase_triple_itemsets": "r7b cost-based branch: sparse L2 -> candidate join + Apriori semi-join prune; dense L2 (sf0.01, statistic 27.3M) -> per-basket triangle counting; in-partition pair expansion from collect_set basket lists either way; exact integer supports; TakeOrderedAndProject",
    "events_xcorr_lead_lag": "one fact-sized hourly aggregate, then calendar-bounded series joins (broadcast lags); decimal(38,0) moment sums; no Python",
    "events_clamped_running_balance": "packed fold: one collect_list aggregate Exchange -> one ArrowEvalPython kernel -> posexplode; never FlatMapGroupsInPandas per group",
    "events_last_touch_attribution": "as-of tagged union + per-user window carry-forward; anti-join '(none)' bucket; exact-cents revenue",
    "lineitem_fifo_lot_allocation": "FIFO as cumulative-interval overlap: two windows on one (part, side) Exchange; per-part interval equi-join; zero Python, output linear in lots+sells",
    "events_theilsen_trend": "pairwise slopes over the calendar-bounded series self-join; exact-rank median pick per type; no Python",
    "events_value_woe_iv": "ntile_distributed equal-frequency binning (range sort + broadcast __pid/__off offsets); integer pos/neg counts; broadcast totals",
    "orders_mom_revenue_growth": "one fact aggregate to the month frame; lag window over ~tens of rows; exact-cents revenue",
    "events_linear_touch_attribution": "per-user lookback equi-join; exact floored basis-point shares (div) — no float boundary in the hash",
    "events_winsorized_stats": "r9: histogram cumulative walk via the two-pass prefix ((__pid, k)-keyed windows — the histogram scales with facts); per-type n groupBy broadcast; boundaries broadcast back for the clip",
    "docs_ngram_novelty": "distinct (doc, gram) explode -> min-per-gram partial agg -> gram-key join back; every stage hash-partitioned on the gram; exact basis points",
    "orders_repeat_kaplan_meier": "one custkey window picks (first, second) order dates; per-duration aggregate; suffix-sum risk set + prefix sum-of-logs on the calendar-bounded duration frame (single-task window is domain-bounded, <= span days)",
    "events_mann_whitney_weekend": "facts collapse to ONE value histogram Exchange; prefix counts via the two-pass range-partitioned pattern (r8 — the histogram scales with the data, so no global window); exact-rational tied ranks; single-row output",
    "orders_segment_revenue_gini": "custkey-join + per-customer aggregate (one fact shuffle); per-segment ranks via ordered_prefix_distributed (r8 — 5 segments must not mean 5 single-task sorts); decimal(38,0) rank-weighted sum, one rounded division",
    "nation_budget_largest_remainder": "fact aggregate -> <=|nations| frame; exact div/% quotas; remainder ranking window on the tiny frame; broadcast total",
    "supplier_pareto_coverage": "suppkey join + per-supplier aggregate (one fact shuffle); per-nation rank + running revenue via ordered_prefix_distributed, totals read off the prefix (r8); integer 5*cum >= 4*total crossing test",
    "parts_copurchase_npmi": "in-partition basket pair expansion (same as lift) -> one pair-key shuffle; two support joins; broadcast N; ln only in the final rounded score",
    "events_time_decay_attribution": "per-user lookback equi-join; milli-quantized dyadic weights; exact floored bp shares (div) — no float boundary in the hash",
    "orders_revenue_bridge_waterfall": "one (custkey, month) fact aggregate; full-outer self-join on the shifted composite key (both sides share the partitioning); month-key final aggregate",
}


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PLANS.md"
    from airline_dataset_hadoop_public_spark.session import get_spark
    import __spark_entry__ as e

    spark = get_spark("explain-audit", cpus=8, shuffle_partitions=8,
                      driver_memory="8g")
    qs = e.queries()
    lines = [
        "# Physical-plan audit (generated by scripts/explain_audit.py)",
        "",
        f"Plans below are `.explain(\"formatted\")` at {SF}, AQE enabled.",
        "Regenerate after operator changes: "
        "`python scripts/explain_audit.py`.",
        "",
    ]
    for name, expect in AUDIT.items():
        df = qs[name](spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        lines += [f"## {name}", "", f"**Expected shape:** {expect}", "",
                  "```", plan.rstrip(), "```", ""]
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_path} ({len(AUDIT)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
