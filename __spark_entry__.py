"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` are the correctness gate — each Spark query is
compared against its DuckDB oracle at sf0.01 (row-count + schema +
order-insensitive value-hash).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# Pin Python workers to the driver's interpreter at import time, before any
# SparkSession exists: an inherited PYSPARK_PYTHON (e.g. `python` resolving to
# an unrelated conda install) fails every pandas-UDF/mapInPandas stage with
# [PYTHON_VERSION_MISMATCH]. bears_spark.session.get_session does the same for
# sessions it creates; this covers harnesses that build their own session
# after importing this module.
os.environ["PYSPARK_PYTHON"] = sys.executable
os.environ["PYSPARK_DRIVER_PYTHON"] = sys.executable

from pyspark.sql import DataFrame, SparkSession

from bears_spark.queries import events as ev
from bears_spark.queries import graphops as gr
from bears_spark.queries import pipelineops as po
from bears_spark.queries import qualityops as ql
from bears_spark.queries import relational as rel
from bears_spark.queries import sketchops as sk
from bears_spark.queries import textops as tx
from bears_spark.queries import tpch

_TPCH_QUERIES = {
    "q1_pricing_summary": tpch.q1_pricing_summary,
    "q3_shipping_priority": tpch.q3_shipping_priority,
    "q5_local_supplier_volume": tpch.q5_local_supplier_volume,
    "q6_revenue_change": tpch.q6_revenue_change,
    "q10_returned_items": tpch.q10_returned_items,
    "q4_order_priority": tpch.q4_order_priority,
    "q12_priority_class": tpch.q12_priority_class,
    "q14_promo_effect": tpch.q14_promo_effect,
    "q13_customer_distribution": tpch.q13_customer_distribution,
    "q7_nation_volume": tpch.q7_nation_volume,
    "q8_market_share": tpch.q8_market_share,
    "q9_product_profit": tpch.q9_product_profit,
    "q2_min_cost_supplier": tpch.q2_min_cost_supplier,
    "q15_top_supplier": tpch.q15_top_supplier,
    "q16_parts_supplier_cnt": tpch.q16_parts_supplier_cnt,
    "q17_small_quantity": tpch.q17_small_quantity,
    "q18_large_volume_customer": tpch.q18_large_volume_customer,
    "q19_discounted_revenue": tpch.q19_discounted_revenue,
    "q21_waiting_supplier": tpch.q21_waiting_supplier,
    "q22_sales_opportunity": tpch.q22_sales_opportunity,
    "q20_excess_stock": tpch.q20_excess_stock,
    "q11_important_stock": tpch.q11_important_stock,
}

_TPCH_ORACLES = {
    "q1_pricing_summary": tpch.Q1_SQL,
    "q3_shipping_priority": tpch.Q3_SQL,
    "q5_local_supplier_volume": tpch.Q5_SQL,
    "q6_revenue_change": tpch.Q6_SQL,
    "q10_returned_items": tpch.Q10_SQL,
    "q4_order_priority": tpch.Q4_SQL,
    "q12_priority_class": tpch.Q12_SQL,
    "q14_promo_effect": tpch.Q14_SQL,
    "q13_customer_distribution": tpch.Q13_SQL,
    "q7_nation_volume": tpch.Q7_SQL,
    "q8_market_share": tpch.Q8_SQL,
    "q9_product_profit": tpch.Q9_SQL,
    "q2_min_cost_supplier": tpch.Q2_SQL,
    "q15_top_supplier": tpch.Q15_SQL,
    "q16_parts_supplier_cnt": tpch.Q16_SQL,
    "q17_small_quantity": tpch.Q17_SQL,
    "q18_large_volume_customer": tpch.Q18_SQL,
    "q19_discounted_revenue": tpch.Q19_SQL,
    "q21_waiting_supplier": tpch.Q21_SQL,
    "q22_sales_opportunity": tpch.Q22_SQL,
    "q20_excess_stock": tpch.Q20_SQL,
    "q11_important_stock": tpch.Q11_SQL,
}


# --------------------------------------------------------------------------
# The driver grades the FIRST 50 queries() entries in iteration order, so
# order is a coverage budget. Round-12 rotation (VERDICT r11 "Next round"
# #4): this optimization round's window must grade the paths the optimizer
# REWROTE, so ground truth — not the builder's self-reported gate — covers
# every semantics-sensitive change:
#   * the same 8 regression anchors as rounds 8-11,
#   * the 6 rows of ROUND12_NEVER_GRADED (round-11 additions, never
#     driver-graded),
#   * the 7 paths round 11 rewrote that its window missed
#     (tfidf_cosine_pairs, part_item_recs, dedup_semantic_clusters,
#     orders_delta_dv_read, orders_global_cumsum, doc_pack_assignments,
#     doc_bm25_queryset) — part_item_recs and the prefix consumers are
#     rewritten AGAIN this round (freq de-skew, eager gram persists),
#   * the 2 headline paths round 12 restructures (ann_ivfpq_topk,
#     ev_cusum_alarm),
#   * 27 freshness re-anchors: the 13 rows last graded in round 3 plus the
#     14 alphabetically-first rows last graded in round 4.
# Oracle-less queries (doc_compression_quality) are EXCLUDED from every
# window: the driver can only record `err: no_oracle` for them, wasting a
# grading slot (VERDICT r7 "What's wrong" #1). Enforced by the assertion in
# queries() below and by pytest.
GRADED_WINDOW = [
    # --- regression anchors (8) ---
    "q1_pricing_summary",
    "q3_shipping_priority",
    "orders_delta_dv_roundtrip",
    "ev_sessionize",
    "streaming_hourly_counts",
    "streaming_running_totals",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    # --- never driver-graded: ROUND12_NEVER_GRADED (6, ledger order) ---
    "orders_rename_evolution",
    "orders_wap_publish",
    "orders_type_widening",
    "orders_constraints_gate",
    "orders_update_where",
    "orders_metadata_agg",
    # --- round-11 rewrites the r11 window missed (7) ---
    "tfidf_cosine_pairs",
    "part_item_recs",
    "dedup_semantic_clusters",
    "orders_delta_dv_read",
    "orders_global_cumsum",
    "doc_pack_assignments",
    "doc_bm25_queryset",
    # --- round-12 restructured paths (2) ---
    "ann_ivfpq_topk",
    "ev_cusum_alarm",
    # --- freshness re-anchors: all 13 rows last graded in round 3 ---
    "assembled_features",
    "cust_balance_quartiles",
    "customer_name_parse",
    "doc_balanced_sample",
    "ev_hopping_windows",
    "ev_lag_lead_delta",
    "ev_value_hist_quantiles",
    "lang_label_encode",
    "nations_set_ops",
    "part_melt",
    "pii_redact_contacts",
    "stream_shard_keys",
    "value_mean_imputation",
    # --- freshness re-anchors: 14 rows last graded in round 4 ---
    "ann_lsh_topk",
    "bloom_pruned_nation_volume",
    "corpus_mixture_by_source",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_simhash",
    "doc_bpe_tokens",
    "doc_budget_selection",
    "doc_concat_affix",
    "doc_fingerprint",
    "doc_hash_sample_rates",
    "doc_hashed_features",
    "doc_heavy_hitter_words",
    "doc_nfc_normalize",
]
assert len(GRADED_WINDOW) == 50, len(GRADED_WINDOW)

# ROUND-7 ROTATION LEDGER (mechanical: the 25 overflow rows from the round-6
# ledger — entries 43..67 in ledger order — plus every query added in round
# 6; none of these will have a driver CORRECTNESS row after round 6). All
# overflow rows passed the judge's full local oracle replica in r5; new
# round-6 queries are verified with tools/check_correctness.py this round.
# Round 7's GRADED_WINDOW takes ~42 (ledger order) plus anchors; the
# remainder rolls to round 8 exactly as rounds 5->6 rolled.
ROUND7_NEVER_GRADED = [
    # --- round-6 ledger overflow (25, ledger order) ---
    "orders_yoy_growth",
    "streaming_doc_quality",
    "lang_source_mutual_info",
    "doc_compression_quality",
    "orders_change_feed",
    "dedup_minhash_eval",
    "emb_pca2_projection",
    "dedup_minhash_calibration",
    "customer_abc_analysis",
    "part_iqr_outliers",
    "lineitem_cycle_time",
    "nation_market_concentration",
    "orders_survival_curve",
    "ev_markov_next_event",
    "customer_gini",
    "ev_user_entropy",
    "source_lang_jsd",
    "orders_bloom_point_lookup",
    "orders_arrow_roundtrip",
    "ev_user_features",
    "ev_ab_welch",
    "ev_ab_cuped",
    "ev_ab_quantiles",
    "pipeline_quality_gate",
    "ev_ab_conversion",
    # --- added in round 6 (appended as implemented) ---
    "ann_ivfpq_recall_report",
    "doc_pack_assignments",
    "emb_cluster_silhouette",
    "orders_incremental_rollup",
    "emb_hard_negatives",
    "orders_delta_roundtrip",
    "orders_iceberg_roundtrip",
    "ev_user_ltv_decile",
    "orders_optimize_skipping",
    "customer_priority_scd2",
    "dedup_edit_prefix_join",
    "cust_target_encoding",
    "cust_woe_urgency",
    "ev_hourly_acf",
    "ev_seasonal_decompose",
    "ev_value_ols2",
    "orders_layout_report",
    "orders_price_auc",
    "orders_urgency_calibration",
    "doc_rake_keyphrases",
    "ev_value_psi_drift",
    "streaming_psi_drift",
    "orders_urgency_isotonic",
    "ev_holt_trend",
    "ev_theilsen_trend",
    "ev_changepoint",
    "part_pareto_frontier",
    "part_association_rules",
    "orders_conformal_interval",
    "supplier_bfs_distance",
    "part_item_cosine",
    "ev_rolling_dau",
    "ev_rolling_dau_hll",
    "ev_value_ohlc",
    "ev_user_twap",
    "ev_value_ks_drift",
    "ev_ab_mannwhitney",
    "ev_ma_crossover",
    "part_item_recs",
    "part_decayed_popularity",
    "streaming_rolling_dau_hll",
    "ev_interarrival_ks",
    "doc_zipf_fit",
    "emb_matryoshka_recall",
    "customer_next_order_backtest",
    "part_return_rate_shrinkage",
    "ev_growth_accounting",
    "ev_user_stickiness",
    "ann_filtered_topk",
    "streaming_ohlc",
    "ev_ab_power_analysis",
    "ev_burst_detection",
    "orders_fd_violations",
    "ev_slo_bands",
    "moments_merge_proof",
    "streaming_burst_detection",
    "orders_naive_bayes_eval",
    "supplier_degree_assortativity",
    "source_oov_rate",
    "source_type_token_ratio",
    "corpus_heaps_law",
    "orders_value_percent_rank",
    "hll_error_report",
    "emb_knn_eval",
    "source_centroid_similarity",
    "supplier_kcore_peel",
    "orders_basket_dispersion",
    "supplier_wilson_ontime",
    "orders_cents_chisq",
    "events_hive_partition_pruning",
    "nation_share_shift",
    "part_single_source_risk",
    "orders_cycle_anova",
    "ev_weekend_effect",
    "emb_exact_dupes",
    "streaming_moments",
    "ev_p95_ci",
    "ev_tail_gpd_fit",
    "ev_markov_stationary",
    "emb_centroid_classifier",
    "hash_feature_collision_report",
    "ev_stickiness_hll",
    "streaming_cms_user_counts",
    "corpus_temperature_curve",
    "ev_user_activity_powerlaw",
    "customer_theil_index",
    "orders_orc_roundtrip",
    "doc_length_quality_corr",
    "ev_markov_entropy_rate",
]

# ROUND-8 ROTATION LEDGER: the 71 ROUND7 overflow rows (entries 43..113 in
# ledger order — round 7's window took the first 42) plus every query added
# in round 7 (appended as implemented). All overflow rows passed the judge's
# full 320-query local oracle replica in r6.
# Overflow is materialized as a slice (single source of truth); round-7
# additions are appended to _ROUND7_ADDED as they are implemented.
_ROUND7_ADDED: list[str] = [
    "orders_iceberg_v2_deletes",
    "orders_delta_dv_roundtrip",
    "ev_rolling_time_stats",
]
ROUND8_NEVER_GRADED = ROUND7_NEVER_GRADED[42:] + _ROUND7_ADDED

# ROUND-9 ROTATION LEDGER: the 33 ROUND8 overflow rows (entries 42..75 in
# ledger order — round 8's window took the first 42) minus
# orders_delta_dv_roundtrip (promoted to a permanent anchor in round 8, so
# it gets its driver row there), plus every query added in round 8.
_ROUND8_ADDED: list[str] = [
    "orders_delta_s3_read",
    "orders_iceberg_renamed_col",
    "orders_delta_dv_read",
    "orders_mor_delete",
]
ROUND9_NEVER_GRADED = [
    n for n in ROUND8_NEVER_GRADED[42:] if n != "orders_delta_dv_roundtrip"
] + _ROUND8_ADDED

# ROUND-10 ROTATION LEDGER: round 9's window carried the FULL 36-row backlog
# plus all six round-9 additions (driver coverage reaches 333/333), so no
# overflow rolls forward. Queries added in round 10 are appended here as
# implemented; round 10's window can re-anchor saturated rows with the free
# slots (VERDICT r8 "Next round" #8).
_ROUND9_ADDED: list[str] = [
    "streaming_gdpr_delete",
    "orders_mor_fileuri_roundtrip",
    "orders_iceberg_bucket_pruned",
    "orders_delta_export_cadence",
    "orders_iceberg_truncate_pruned",
    "doc_reservoir_sample_stats",
]
ROUND10_NEVER_GRADED: list[str] = [
    "doc_stratified_sample_stats",
    "orders_ivm_minmax",
    "orders_iceberg_export_snapshots",
    "orders_streaming_replicated",
]

# ROUND-11 ROTATION LEDGER: round 10's window carries all four
# ROUND10_NEVER_GRADED rows (driver coverage stays complete), so only the
# queries added in round 10 accrue here — appended as implemented, capped
# at the re-anchoring headroom round 11 will have (VERDICT r9 "Next
# round" #8 keeps additions <= rotation headroom).
ROUND11_NEVER_GRADED: list[str] = [
    "orders_iceberg_day_pruned",
    "orders_iceberg_ts_travel",
    "orders_snapshot_history_report",
    "orders_streaming_replicated_iceberg",
    "orders_retention_maintenance",
    "orders_delta_ts_travel",
]

# ROUND-12 ROTATION LEDGER: round 11's window carries all six
# ROUND11_NEVER_GRADED rows (driver coverage stays complete), so only the
# queries added in round 11 accrue here — appended as implemented, capped
# at the re-anchoring headroom round 12 will have (VERDICT r10 "Next
# round" #8 keeps additions <= rotation headroom).
ROUND12_NEVER_GRADED: list[str] = [
    "orders_rename_evolution",
    "orders_wap_publish",
    "orders_type_widening",
    "orders_constraints_gate",
    "orders_update_where",
    "orders_metadata_agg",
]

# ROUND-13 ROTATION LEDGER: round 12's window carries all six
# ROUND12_NEVER_GRADED rows, and round 12 is an optimization round (no new
# queries), so nothing accrues — driver coverage is complete and the
# round-13 window is free to re-anchor by staleness.
ROUND13_NEVER_GRADED: list[str] = []

# Historical: the round-6 rotation source (67 = 22 round-5 overflow + 45
# round-5 additions). Kept so the rotation provenance is auditable.
ROUND6_NEVER_GRADED = [
    "fk_integrity_report",
    "hist_merge_proof", "hll_merge_proof", "join_cardinality_prediction",
    "lang_source_chisq", "lineitem_skew_report", "lsh_recall_report",
    "orders_benford_digits", "orders_keyset_page", "orders_pit_priority",
    "orders_snapshot_diff", "orders_table_fingerprint", "part_copurchase_pairs",
    "source_characteristic_terms", "source_lang_kl", "streaming_dedup_events",
    "supplier_triangles", "supplier_two_hop_reach", "tfidf_cosine_pairs",
    "ev_attribution_touch", "doc_shared_passages", "orders_snapshot_timetravel",
    # --- added in round 5 (appended as implemented) ---
    "doc_bm25_queryset",
    "ann_ivfpq_topk",
    "retrieval_eval_report",
    "customer_k_anonymity",
    "dedup_lsh_index_ingest",
    "doc_dsir_selection",
    "streaming_attribution_full",
    "corpus_curation_e2e",
    "dedup_semantic_clusters",
    "doc_leakage_safe_split",
    "streaming_semantic_assign",
    "emb_cluster_coreset",
    "dedup_source_matrix",
    "corpus_dedup_funnel",
    "corpus_datacard",
    "ev_seasonal_naive_forecast",
    "customer_l_diversity",
    "streaming_seasonal_anomaly",
    "emb_principal_direction",
    "doc_bm25_rm3",
    "orders_yoy_growth",
    "streaming_doc_quality",
    "lang_source_mutual_info",
    "doc_compression_quality",
    "orders_change_feed",
    "dedup_minhash_eval",
    "emb_pca2_projection",
    "dedup_minhash_calibration",
    "customer_abc_analysis",
    "part_iqr_outliers",
    "lineitem_cycle_time",
    "nation_market_concentration",
    "orders_survival_curve",
    "ev_markov_next_event",
    "customer_gini",
    "ev_user_entropy",
    "source_lang_jsd",
    "orders_bloom_point_lookup",
    "orders_arrow_roundtrip",
    "ev_user_features",
    "ev_ab_welch",
    "ev_ab_cuped",
    "ev_ab_quantiles",
    "pipeline_quality_gate",
    "ev_ab_conversion",
]


# headline queries bench.py times at sf0.1 — one per operator family
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_change",
    "q10_returned_items",
    "orders_rollup",
    "top3_customers_per_nation",
    "ev_daily_activity",
    "ev_sessionize",
    "ev_running_sum",
    "text_stats",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "ann_cosine_topk",
    # round-4 additions: one per round-3 family (VERDICT r3 #6)
    "orders_global_cumsum",
    "doc_pack_sequences",
    "ev_funnel_conversion",
    "doc_decontaminate",
    # round-4 late additions: weighted all-pairs + window-scan families
    "tfidf_cosine_pairs",
    "ev_cusum_alarm",
    # round-4 closing: chunking + retrieval family representatives
    "doc_chunk_dedup",
    "doc_bm25_topk",
    # round-5 additions: batch retrieval + composed-ANN representatives
    "doc_bm25_queryset",
    "ann_ivfpq_topk",
    # round-5 closing: SemDeDup family representative (fit + assign + BLAS
    # gram pair stage) + the config-driven pipeline family
    "dedup_semantic_clusters",
    "pipeline_quality_gate",
    # round-6 addition: sequence packing (distributed prefix cumsum family)
    "doc_pack_assignments",
    # round-6 late additions: sliding-window sketch rollup + item-based CF
    "ev_rolling_dau_hll",
    "part_item_recs",
    # round-7 addition: lakehouse-maintenance representative (snapshot-table
    # commit + incremental refresh path), so maintenance regressions surface
    # in the bench (VERDICT r6 #6)
    "orders_incremental_rollup",
    # round-8 addition: merge-on-read read path in isolation — the DV table
    # is pre-built once per sf_dir, so the timing is log replay + DV decode
    # + anti-join + aggregate, not fixture construction (VERDICT r7 #6)
    "orders_delta_dv_read",
    # round-9 addition: exact-k deterministic sampling family
    # (TakeOrderedAndProject over a computed hash order)
    "doc_reservoir_sample_stats",
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    return tpch.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def _ordered(mapping: dict) -> dict:
    """GRADED_WINDOW first (the driver's 50-slot grading budget), then every
    remaining query in module order — nothing is dropped, only reordered."""
    out = {name: mapping[name] for name in GRADED_WINDOW if name in mapping}
    out.update({name: fn for name, fn in mapping.items() if name not in out})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    allq = {**_TPCH_QUERIES, **rel.QUERIES, **ev.QUERIES, **tx.QUERIES, **po.QUERIES, **ql.QUERIES, **sk.QUERIES, **gr.QUERIES}
    missing = [n for n in GRADED_WINDOW if n not in allq]
    assert not missing, f"GRADED_WINDOW names unknown queries: {missing}"
    # Every windowed query must carry a real DuckDB oracle — an oracle-less
    # row can only ever grade `err: no_oracle`, wasting one of the driver's
    # 50 slots (VERDICT r7 "What's wrong" #1).
    alloracles = {**_TPCH_ORACLES, **rel.ORACLES, **ev.ORACLES, **tx.ORACLES, **po.ORACLES, **ql.ORACLES, **sk.ORACLES, **gr.ORACLES}
    unoracled = [
        n for n in GRADED_WINDOW
        if not isinstance(alloracles.get(n), str) or not alloracles[n].strip()
    ]
    assert not unoracled, f"GRADED_WINDOW contains oracle-less queries: {unoracled}"
    return _ordered(allq)


def oracle_sql() -> dict[str, str]:
    return _ordered(
        {**_TPCH_ORACLES, **rel.ORACLES, **ev.ORACLES, **tx.ORACLES, **po.ORACLES, **ql.ORACLES, **sk.ORACLES, **gr.ORACLES}
    )
