"""The driver's correctness gate audits the FIRST 50 registry entries; these
tests pin that window to the invariants VERDICT r6 item #1 required — 50
entries, every one oracle-backed — so a registration-order change can never
silently push an audited query out or pull a rows-only row in again."""

from __future__ import annotations

from parqueryd_spark import queries as Q


def test_gate_window_is_50_oracle_backed():
    head = list(Q.REGISTRY)[:50]
    assert head == Q.GATE_WINDOW
    missing = [n for n in head if Q.REGISTRY[n].oracle is None]
    assert not missing, f"gate-window rows without a DuckDB oracle: {missing}"


def test_estimate_bound_rows_are_inside_the_gate_window():
    """VERDICT r7 item #2: approximation quality is part of the hard driver
    gate — the oracle-backed bound rows must sit INSIDE the first 50."""
    for name in (
        "sketch_error_bounds",
        "ann_ivf_recall_bound",
        "ann_pq_recall_bound",
        "heavy_hitter_bound",
        "ann_ivfpq_recall_bound",
    ):
        assert name in Q.GATE_WINDOW, name
    # the five TPC-H rows they displaced must stay registered (oracle-tested
    # past the window), not silently dropped
    for name in ("q4_priority_exists", "q10_returned_items",
                 "q14_promo_revenue", "q18_large_orders",
                 "q6_forecast_revenue"):
        assert name in Q.REGISTRY and name not in Q.GATE_WINDOW, name
        assert Q.REGISTRY[name].oracle is not None, name


def test_estimate_rows_have_driver_checked_companions():
    # every rows-only (oracle=None) estimate row has an oracle-backed
    # error-bound or exact companion somewhere in the registry
    companions = {
        "events_sketch_aggs": ["events_exact_distinct_pcts", "sketch_error_bounds"],
        "ann_ivf_topk": ["ann_ivf_exhaustive_topk", "ann_ivf_recall_bound"],
        # the recall bound runs over the same published-index route, so it
        # companions the index row too
        "ann_ivf_index_topk": ["ann_ivf_exhaustive_topk", "ann_ivf_recall_bound"],
        "ann_pq_topk": ["ann_pq_recall_bound"],
        "ann_ivfpq_index_topk": ["ann_ivfpq_recall_bound"],
        "ann_ivfsq_index_topk": ["ann_ivfsq_recall_bound"],
        "text_heavy_hitter_tokens": ["heavy_hitter_bound"],
    }
    no_oracle = [n for n, q in Q.REGISTRY.items() if q.oracle is None]
    assert set(no_oracle) == set(companions), no_oracle
    for est, comps in companions.items():
        for c in comps:
            assert c in Q.REGISTRY and Q.REGISTRY[c].oracle is not None, (est, c)


def test_round8_family_rows_are_inside_the_gate_window():
    """Round 8's new operator families are under the hard gate: zone-map
    pruned scan (plan-time file skipping must equal a full scan exactly) and
    SCD2 as-of (version collapse + interval chaining vs an independent
    lag/lead oracle). The displaced rows — shapes redundantly covered by
    in-window kin (exhaustive-probe IVF ≡ brute force is subsumed by
    ann_bruteforce_topk + the recall bounds over the same served index;
    winnowing by the in-window fingerprint family) — stay registered and
    oracle-tested past the window."""
    for name in ("scan_zonemap_pruned", "scd2_events_asof"):
        assert name in Q.GATE_WINDOW, name
    for name in ("ann_ivf_exhaustive_topk", "text_winnow_fingerprint"):
        assert name in Q.REGISTRY and name not in Q.GATE_WINDOW, name
        assert Q.REGISTRY[name].oracle is not None, name


def test_round9_rotation_families_are_inside_the_gate_window():
    """VERDICT r8 items #1/#5: the six oracle-backed round-8 family rows the
    external gate had never executed, plus the shard-schema-drift row, are
    inside the first 50; the seven displaced rows (each with an in-window
    shape twin — see the GATE_WINDOW comment) stay registered and
    oracle-tested past the window."""
    rotated_in = (
        "interval_join_user_windows",
        "band_join_error_click",
        "scan_bloom_lookup",
        "scan_zonemap_count",
        "events_kmv_overlap_bound",
        "pipeline_bloom_decontaminate",
        "shard_schema_drift",
    )
    for name in rotated_in:
        assert name in Q.GATE_WINDOW, name
    displaced = (
        "q3_shipping_priority",
        "dedup_simhash",
        "dedup_spans",
        "multimodal_metadata",
        "events_exact_distinct_pcts",
        "pivot_agg",
        "having_scalar_subquery",
    )
    for name in displaced:
        assert name in Q.REGISTRY and name not in Q.GATE_WINDOW, name
        assert Q.REGISTRY[name].oracle is not None, name


def test_sq_recall_bound_is_inside_the_gate_window():
    """The scalar-quantization family's recall bound is driver-gated like
    the other ANN bounds; the displaced range_join_price_bands (arithmetic
    binning + broadcast equi-join, both mechanisms covered by in-window
    twins) stays registered and oracle-tested past the window."""
    assert "ann_sq_recall_bound" in Q.GATE_WINDOW
    name = "range_join_price_bands"
    assert name in Q.REGISTRY and name not in Q.GATE_WINDOW
    assert Q.REGISTRY[name].oracle is not None


def test_hash_embeddings_is_inside_the_gate_window():
    """The embedding-generation family (feature-hashing hash_embed, exactly
    value-checked) is driver-gated; the displaced text_edit_distance (one
    built-in scalar function; the pure-Column text-scalar shape stays
    in-window via text_token_lang_stats / text_curation_funnel) remains
    registered and oracle-tested past the window."""
    assert "text_hash_embeddings" in Q.GATE_WINDOW
    name = "text_edit_distance"
    assert name in Q.REGISTRY and name not in Q.GATE_WINDOW
    assert Q.REGISTRY[name].oracle is not None


def test_round10_families_are_inside_the_gate_window():
    """Round 10's new oracle-backed families are driver-gated: exact
    quantile selection (multi-pass histogram narrowing must reproduce
    quantile_disc bit-for-bit), MAD anomaly flagging (exact-median baselines
    + flag counts), and bigram-LM perplexity scoring (the CCNet curation
    signal, estimates value-checked). The displaced rows — each with
    in-window shape twins per the GATE_WINDOW comment — stay registered and
    oracle-tested past the window."""
    for name in ("events_exact_quantile", "events_anomaly_mad", "text_ngram_lm_score"):
        assert name in Q.GATE_WINDOW, name
    for name in ("events_windowed_aggs", "embedding_array_ops", "window_analytics"):
        assert name in Q.REGISTRY and name not in Q.GATE_WINDOW, name
        assert Q.REGISTRY[name].oracle is not None, name
