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


def test_estimate_rows_have_driver_checked_companions():
    # every REMAINING rows-only (oracle=None) row has an oracle-backed
    # error-bound companion somewhere in the registry. Round 11 value-checked
    # the deterministic first-k IVF routes outright; round 12 extended the
    # replay technique to BOTH PQ serving routes via deterministic spread
    # codebooks (VERDICT r11 item #2), then to the heavy-hitter row (two-pass
    # Misra-Gries -> exact confirm with in-plan completeness proof) and the
    # KMV distinct/overlap estimates (md5_52 set-function sketches DuckDB
    # replays bit-for-bit). The ONE left is genuinely engine-specific:
    # Spark-internal HLL++/KLL binary sketch state no SQL engine can replay.
    companions = {
        "events_sketch_aggs": ["events_exact_distinct_pcts", "sketch_error_bounds"],
    }
    no_oracle = [n for n, q in Q.REGISTRY.items() if q.oracle is None]
    assert set(no_oracle) == set(companions), no_oracle
    for est, comps in companions.items():
        for c in comps:
            assert c in Q.REGISTRY and Q.REGISTRY[c].oracle is not None, (est, c)
    # every value-checked ANN route must KEEP its oracle
    for name in (
        "ann_ivf_topk", "ann_ivf_index_topk", "ann_ivfsq_index_topk",
        "ann_pq_topk", "ann_ivfpq_index_topk",
    ):
        assert Q.REGISTRY[name].oracle is not None, name


# family anchors that must stay INSIDE the window: at least one driver-gated
# row per operator family (parqueryd parity, TPC-H, dedup/near-dup, joins,
# events/windows, exact selection, ANN recall bounds, sketch bounds,
# multimodal, pipeline curation, text, file skipping, history)
REQUIRED_IN_WINDOW = (
    # parqueryd parity (O1-O7)
    "q1_pricing_summary",
    "groupby_agg_methods",
    "groupby_count_variants",
    "where_ops_raw_rows",
    "global_agg_no_keys",
    "shard_schema_drift",
    # TPC-H anchors
    "q5_local_volume",
    "q19_disjunctive_filter",
    # estimate/recall bounds (VERDICT r7 item #2: approximation quality is
    # part of the hard driver gate) — r12b upgraded three bound rows to
    # VALUE-checked estimate rows: heavy_hitter_bound -> the exact-confirmed
    # text_heavy_hitter_tokens, ann_ivf/ann_sq recall bounds -> the md5_52
    # KMV rows (their serving routes are value-checked registry rows);
    # ann_ivfpq_recall_bound stays as the recall anchor for the hardest
    # compression tier
    "sketch_error_bounds",
    "ann_ivfpq_recall_bound",
    "events_kmv_distinct",
    "events_kmv_overlap",
    "text_heavy_hitter_tokens",
    # dedup family (r12: substring-grain exact dedup is the strictly more
    # general exact route; dedup_exact stays registered past the window;
    # r12b: the minhash slot is the incremental lifecycle row — same
    # signature/banding machinery plus the published-index increment)
    "dedup_substrings",
    "dedup_substrings_incremental",
    "dedup_ngram_jaccard",
    "dedup_minhash_incremental",
    "dedup_groups",
    "embedding_near_dup",
    # joins
    "interval_join_user_windows",
    "join_broadcast_dims",
    "join_fact_fact_revenue",
    "join_types_suite",
    "asof_join_events",
    "salted_skew_groupby",
    # events / windows / exact selection (r10-r11 rotations)
    "events_exact_quantile",
    "events_exact_quantile_by_type",
    "events_exact_quantile_cont_by_type",
    "events_gap_fill_rolling",
    "events_sessionization",
    "events_incremental_rollup",
    "events_anomaly_mad",
    # ANN serving
    "ann_bruteforce_topk",
    # file skipping / metadata serving (r8-r11 rotations)
    "scan_zonemap_pruned",
    "scan_hive_partition_pruned",
    "scan_metadata_stats",
    # multimodal / pipeline curation (r11: k-anonymity; r12b: decontamination
    # at substring grain against the substring index)
    "multimodal_features",
    "pipeline_split_pack",
    "pipeline_substring_decontaminate",
    "pipeline_k_anonymity",
    # relational breadth
    "topk_orders",
    "set_ops_summary",
    "rollup_cube_agg",
    # text / LM (r12: BPE train/encode + repeated-passages enter; the
    # pure-Column scalar-stats shape stays via text_curation_funnel; r12b:
    # the NB classifier row replaces text_hash_embeddings, whose md5
    # feature-hash mechanics it contains)
    "text_ngram_lm_score",
    "text_bpe_train_encode",
    "text_repeated_passages",
    "text_nb_langid",
    "text_curation_funnel",
    "text_bm25_search",
    # history
    "scd2_events_asof",
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
)


def test_required_family_anchors_are_inside_the_gate_window():
    missing = [n for n in REQUIRED_IN_WINDOW if n not in Q.GATE_WINDOW]
    assert not missing, f"family anchors fell out of the gate window: {missing}"


def test_displaced_rows_stay_registered_and_oracle_backed():
    for name in REQUIRED_REGISTERED_PAST_WINDOW:
        assert name in Q.REGISTRY, name
        assert name not in Q.GATE_WINDOW, name
        assert Q.REGISTRY[name].oracle is not None, name
