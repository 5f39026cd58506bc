"""The driver's correctness gate audits the FIRST 50 registry entries; these
tests pin that window to the invariants VERDICT r6 item #1 required — 50
entries, every one oracle-backed — plus the CURRENT rotation state (rotation
history lives in the GATE_WINDOW comment in queries/__init__.py). A
registration-order change can never silently push an audited query out or pull
a rows-only row in again, and a rotation is only valid if every displaced row
stays registered and oracle-tested past the window."""

from __future__ import annotations

from parqueryd_spark import queries as Q


def test_gate_window_is_50_oracle_backed():
    head = list(Q.REGISTRY)[:50]
    assert head == Q.GATE_WINDOW
    missing = [n for n in head if Q.REGISTRY[n].oracle is None]
    assert not missing, f"gate-window rows without a DuckDB oracle: {missing}"


def test_every_registry_row_is_value_checked():
    # Round 11 value-checked the deterministic first-k IVF routes outright;
    # round 12 extended the replay technique to BOTH PQ serving routes via
    # deterministic spread codebooks (VERDICT r11 item #2), then to the
    # heavy-hitter row (two-pass Misra-Gries -> exact confirm with in-plan
    # completeness proof) and the KMV distinct/overlap estimates (md5_52
    # set-function sketches DuckDB replays bit-for-bit). Round 13 closed the
    # last asterisk (VERDICT r12 item #3): events_sketch_aggs — Spark-internal
    # HLL++/KLL state no SQL engine can replay — was reshaped to emit the
    # exact group count plus in-query estimate-within-envelope booleans, so
    # every registry row (158 as of r14 — derive from len(REGISTRY), never
    # hard-code) is oracle-backed. No row may ever regress to rows-only.
    no_oracle = [n for n, q in Q.REGISTRY.items() if q.oracle is None]
    assert no_oracle == [], f"rows-only registry rows reappeared: {no_oracle}"
    # every value-checked ANN route must KEEP its oracle
    for name in (
        "ann_ivf_topk", "ann_ivf_index_topk", "ann_ivfsq_index_topk",
        "ann_pq_topk", "ann_ivfpq_index_topk",
    ):
        assert Q.REGISTRY[name].oracle is not None, name


# family anchors that must stay INSIDE the window: at least one driver-gated
# row per operator family (parqueryd parity, TPC-H, dedup/near-dup, joins,
# events/windows, exact selection, ANN recall bounds + serving, sketch
# bounds, multimodal, pipeline curation, text, file skipping, history).
# Round 14 (VERDICT r13 item #1, the coverage closer): the final 28
# never-gated registry rows enter, plus the four rows born in r14
# (text_kn3_lm_score, text_kn_lm_incremental, events_kmv_served,
# text_hh_served). The 18 anchors prefer rows whose OPERATORS changed this
# round (events_sketch_aggs' rank-based envelope, pipeline_calibration_serve's
# id-type fix, text_kn_lm_score's order-n generalization) so the driver's
# own gate re-proves every behavioral change. Twin arguments for the 32
# displaced rows live in the GATE_WINDOW comment.
REQUIRED_IN_WINDOW = (
    # parqueryd parity (O1-O7) + the TPC-H anchor
    "q1_pricing_summary",
    "where_ops_raw_rows",
    "shard_schema_drift",
    "q9_product_type_profit",
    # sketch envelope (reshaped r14) + served-state rows (raw-scan-absent);
    # r15: the compacted-state serve replaces its uncompacted read-only twin
    "events_sketch_aggs",
    "events_kmv_compacted",
    "text_hh_served",
    # KN LM family (r15: n=5 enters — the one row with no gate evidence;
    # the merge machinery stays pinned by the trio + pytest)
    "text_kn_lm_score",
    "text_kn3_lm_score",
    "text_kn5_lm_score",
    # ANN: serving anchor + the never-gated recall/serving tail
    "ann_ivfpq_index_topk",
    "ann_ivf_topk",
    "ann_ivfpq_residual_recall_bound",
    "ann_ivfsq_recall_bound",
    "ann_margin_match",
    # dedup: exact substring + minhash lifecycle anchors + never-gated rows
    "dedup_substrings",
    "dedup_minhash_incremental",
    "dedup_ngram_capped",
    "text_normalize_dedup",
    "embedding_semantic_dedup",
    # embeddings / hybrid retrieval
    "embedding_label_centroids",
    "embedding_prototypes",
    "hybrid_search_rerank",
    # joins: as-of, skew-salted, fuzzy
    "asof_join_events",
    "skew_salted_join",
    "fuzzy_join_part_names",
    # events / windows / selection
    "events_exact_quantile_by_type",
    "events_funnel",
    "events_cohort_retention",
    "events_anomaly_zscore",
    "events_histogram_quantiles",
    "events_hll_rollup_bound",
    "events_countmin_freq",
    "part_price_quantiles",
    "topk_parts_by_revenue",
    # multimodal
    "multimodal_features",
    # pipeline curation + quality
    "pipeline_exact_sample",
    "pipeline_calibration_serve",
    "quality_checks",
    "table_stats_part",
    "table_diff_snapshots",
    # text: classifier anchor + never-gated text rows
    "text_nb_langid",
    "text_bigram_logprob",
    "text_unigram_logprob",
    "text_encode_ids",
    "text_bpe_pair_stats",
    "text_winnow_overlap",
    "text_source_divergence",
    # served count-min (born late r14; scd2_events_asof displaced — as-of
    # mechanics in-window via asof_join_events, history via
    # table_diff_snapshots)
    "events_countmin_served",
    # file skipping
    "scan_zonemap_pruned",
)

# displaced rows (every rotation so far): must stay registered AND
# oracle-backed past the window — displacement never drops coverage
REQUIRED_REGISTERED_PAST_WINDOW = (
    # r7 rotation (TPC-H rows with in-window shape twins)
    "q4_priority_exists",
    "q10_returned_items",
    "q14_promo_revenue",
    "q18_large_orders",
    "q6_forecast_revenue",
    # r8 rotation
    "ann_ivf_exhaustive_topk",
    "text_winnow_fingerprint",
    # r9 rotation
    "q3_shipping_priority",
    "dedup_simhash",
    "dedup_spans",
    "multimodal_metadata",
    "pivot_agg",
    "having_scalar_subquery",
    "range_join_price_bands",
    "text_edit_distance",
    # r10 rotation
    "events_windowed_aggs",
    "embedding_array_ops",
    "window_analytics",
    # r11 rotation (VERDICT r10 item #1; twins in the GATE_WINDOW comment)
    "pipeline_decontaminate",
    "ann_pq_recall_bound",
    "scan_zonemap_count",
    "events_kmv_overlap_bound",
    "band_join_error_click",
    "string_agg_ordered",
    # r12 rotation (VERDICT r11 item #1; twins in the GATE_WINDOW comment)
    "dedup_exact",
    "events_exact_quantile_cont",
    "events_exact_distinct_pcts",
    "text_token_lang_stats",
    "scan_bloom_lookup",
    # r12b rotation (late round 12; twins in the GATE_WINDOW comment)
    "heavy_hitter_bound",
    "ann_ivf_recall_bound",
    "ann_sq_recall_bound",
    "dedup_minhash_lsh",
    "pipeline_bloom_decontaminate",
    "text_hash_embeddings",
    # r13 rotation (VERDICT r12 item #2; twins in the GATE_WINDOW comment) —
    # every one verified in at least one prior gate, most in 3-5
    "groupby_agg_methods",
    "groupby_count_variants",
    "global_agg_no_keys",
    "q5_local_volume",
    "q19_disjunctive_filter",
    "events_kmv_distinct",
    "events_kmv_overlap",
    "text_heavy_hitter_tokens",
    "dedup_ngram_jaccard",
    "dedup_groups",
    "dedup_substrings_incremental",
    "scan_metadata_stats",
    "scan_hive_partition_pruned",
    "events_exact_quantile",
    "events_exact_quantile_cont_by_type",
    "events_gap_fill_rolling",
    "events_incremental_rollup",
    "events_anomaly_mad",
    "ann_bruteforce_topk",
    "pipeline_split_pack",
    "pipeline_k_anonymity",
    "pipeline_substring_decontaminate",
    "join_broadcast_dims",
    "join_fact_fact_revenue",
    "join_types_suite",
    "topk_orders",
    "set_ops_summary",
    "rollup_cube_agg",
    "salted_skew_groupby",
    "text_ngram_lm_score",
    "text_curation_funnel",
    "text_repeated_passages",
    # r13b rotation (new r13 families enter; twins in the GATE_WINDOW comment)
    "sketch_error_bounds",
    "text_bm25_search",
    "embedding_near_dup",
    "events_sessionization",
    # r14 rotation (VERDICT r13 item #1; twins in the GATE_WINDOW comment) —
    # every one gated in r13
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q11_important_stock",
    "q12_late_shipment_priority",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_parts_supplier_counts",
    "q17_small_quantity_revenue",
    "q20_promo_supplier_promotion",
    "q21_waiting_supplier",
    "q22_global_sales_opportunity",
    "ann_ivfpq_recall_bound",
    "ann_ivf_index_topk",
    "ann_pq_topk",
    "ann_ivfpq_residual_topk",
    "ann_ivfsq_index_topk",
    "events_kmv_incremental",
    "interval_join_user_windows",
    "pipeline_pii_redaction",
    "pipeline_chunk_documents",
    "pipeline_source_caps",
    "pipeline_weighted_sample",
    "pipeline_domain_mixture",
    "pipeline_leakage_safe_split",
    "pipeline_global_shuffle",
    "pipeline_data_card",
    "pipeline_quality_calibration",
    "text_nb_incremental",
    "text_heavy_hitters_by_lang",
    "text_bpe_train_encode",
    "events_heavy_spenders_by_type",
    "scd2_events_asof",
    # r15 rotation (VERDICT r14 items #2-#3; twins in the GATE_WINDOW
    # comment) — both gated green in r14
    "events_kmv_served",
    "text_kn_lm_incremental",
)


def test_required_family_anchors_are_inside_the_gate_window():
    missing = [n for n in REQUIRED_IN_WINDOW if n not in Q.GATE_WINDOW]
    assert not missing, f"family anchors fell out of the gate window: {missing}"


def test_displaced_rows_stay_registered_and_oracle_backed():
    for name in REQUIRED_REGISTERED_PAST_WINDOW:
        assert name in Q.REGISTRY, name
        assert name not in Q.GATE_WINDOW, name
        assert Q.REGISTRY[name].oracle is not None, name
