"""Plan audit: dump formatted physical plans for the headline queries and
check the scale-critical properties — broadcast joins on dimension sides,
parquet filter pushdown, whole-stage codegen, no cartesian products.

Usage: python tools/explain_audit.py [query ...]
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"

CHECKS = {
    "q3_shipping_priority": ["BroadcastHashJoin", "PushedFilters"],
    "q5_local_supplier_volume": ["BroadcastHashJoin", "PushedFilters"],
    "q10_returned_items": ["BroadcastHashJoin", "PushedFilters"],
    "q18_big_orders": ["BroadcastHashJoin"],
    "q1_pricing_summary": ["HashAggregate", "PushedFilters"],  # codegen not shown in unexecuted AQE plans
    "q6_revenue_change": ["PushedFilters"],
    "top3_customers_per_nation": ["BroadcastHashJoin", "WindowGroupLimit"],
    "ev_top3_per_type": ["WindowGroupLimit"],
    "ann_cosine_topk": ["TakeOrderedAndProject"],
    "dedup_minhash_lsh": ["HashAggregate"],
    # round-2 queries: nation lookups broadcast; part/brand filters pushed
    "q7_nation_volume": ["BroadcastHashJoin", "PushedFilters"],
    "q8_market_share": ["BroadcastHashJoin", "PushedFilters"],
    "q9_product_profit": ["BroadcastHashJoin", "PushedFilters"],
    "q19_discounted_revenue": ["PushedFilters"],
    # EXISTS/NOT-EXISTS must compile to hash semi/anti joins, never BNLJ
    "q21_waiting_supplier": ["LeftSemi", "LeftAnti"],
    "q22_sales_opportunity": ["LeftAnti"],
    # top-3 events: ranking limit pushed into sort
    "ev_rolling_stats": ["Window"],
    # as-of is the union+window plan: exactly one Window, a Union, and NO join
    "ev_asof_purchase": ["Window", "Union"],
    # sketches: partial-agg shuffles; CMS lookup broadcasts the tiny sketch
    "hll_distinct_orderkeys": ["HashAggregate"],
    "cms_user_counts": ["BroadcastHashJoin"],
    # funnel is the one-shuffle array state machine: no join, no window
    "ev_funnel_conversion": ["ObjectHashAggregate"],
    "ev_hopping_windows": ["HashAggregate"],
    "orders_incremental_rollup": ["HashAggregate"],
    # round-4 queries
    "kmv_partkey_overlap": ["TakeOrderedAndProject", "PushedFilters"],
    "doc_heavy_hitter_words": ["BroadcastHashJoin", "LeftSemi"],  # recount only candidates
    "doc_weighted_sample": ["TakeOrderedAndProject"],
    "doc_unigram_logprob": ["BroadcastHashJoin"],  # LM table broadcast onto tokens
    "cust_priority_scd2": ["Window"],
    "orders_value_ntile": ["Window"],
    "ev_salted_type_stats": ["HashAggregate"],
    "orders_merge_upsert": ["FullOuter"],
    "orders_snapshot_diff": ["FullOuter"],
    "ev_concurrency_timeline": ["Window", "HashAggregate"],
    # round-4 late additions
    "ev_cusum_alarm": ["Window"],  # two prefix windows, one shuffle
    "dedup_sorted_neighbors": ["Window"],  # block-partitioned leads
    "corpus_pmi_bigrams": ["TakeOrderedAndProject"],  # global top-k, no sort
    "ev_seasonal_profile": ["BroadcastHashJoin", "TakeOrderedAndProject"],
    "supplier_two_hop_reach": ["TakeOrderedAndProject", "HashAggregate"],
    "doc_quality_balanced_corpus": ["WindowGroupLimit"],  # per-stratum top-k
    "fk_integrity_report": ["LeftAnti"],  # every FK check is an anti join
    "ev_attribution_touch": ["Window", "FullOuter"],
    "doc_shared_passages": ["HashAggregate"],
    # round-5 queries
    "doc_bm25_queryset": ["WindowGroupLimit", "BroadcastHashJoin"],  # dfreq broadcast; query fan-out is a literal map explode, no semi join
    "ann_ivfpq_topk": ["TakeOrderedAndProject"],  # literal quantizers, zero joins
    "retrieval_eval_report": ["WindowGroupLimit", "BroadcastHashJoin"],
    "customer_k_anonymity": ["HashAggregate"],
    "doc_dsir_selection": ["TakeOrderedAndProject"],  # literal log-ratio table
    "corpus_curation_e2e": ["LeftSemi", "Window", "HashAggregate"],
    # round-5 closing queries
    "emb_cluster_coreset": ["WindowGroupLimit"],  # per-cluster top-m, partial before shuffle
    "dedup_semantic_clusters": ["FlatMapGroupsInPandas"],  # BLAS gram per cluster
    "emb_principal_direction": ["TakeOrderedAndProject"],  # literal direction, zero joins
    "ev_seasonal_naive_forecast": ["Window", "HashAggregate"],
    "customer_l_diversity": ["Window", "HashAggregate"],
    "doc_leakage_safe_split": ["HashAggregate"],
    "dedup_source_matrix": ["HashAggregate"],
    "corpus_datacard": ["HashAggregate"],  # ONE partial-aggregated scan
    "doc_bm25_rm3": ["TakeOrderedAndProject", "BroadcastHashJoin"],  # dfreq broadcast, two literal-fit passes
    "emb_pca2_projection": ["TakeOrderedAndProject"],  # both directions are literals
    "dedup_minhash_eval": ["HashAggregate", "FullOuter"],
    "orders_yoy_growth": ["Window", "HashAggregate"],
    "orders_survival_curve": ["Window", "HashAggregate"],
    # global rank/cumsum via functions/prefix.py (range shuffle + offset
    # table + mapInPandas assignment) — no WindowExec at all
    "customer_abc_analysis": ["MapInPandas", "HashAggregate"],
    "customer_gini": ["MapInPandas", "HashAggregate"],
    "nation_market_concentration": ["BroadcastHashJoin", "Window"],
    "lineitem_cycle_time": ["ObjectHashAggregate"],  # percentile agg after the orderkey join
    "part_iqr_outliers": ["BroadcastHashJoin"],  # quartile table broadcast back
    "ev_markov_next_event": ["Window", "HashAggregate"],
    "ev_user_entropy": ["Window", "ObjectHashAggregate"],
    "ev_user_features": ["HashAggregate"],
    # ev_ab_welch/cuped/quantiles return driver-assembled 1-row frames; their
    # aggregations run in earlier jobs, so the returned plan is a LocalTableScan
    "source_lang_jsd": ["Window", "HashAggregate"],
    "corpus_dedup_funnel": ["LeftSemi", "HashAggregate"],
    # round-9 queries: exact-k sampling families
    "doc_reservoir_sample_stats": ["TakeOrderedAndProject"],  # bottom-k heap, no full sort
    "doc_stratified_sample_stats": ["WindowGroupLimit"],  # per-stratum k-heap below the shuffle
    # round-11: plan-shape regression guards for the heavy five (VERDICT r10
    # #6) — candidate generation must stay a hashed equi-join with its
    # df-cap/blocking intact, never an unblocked pair join
    "dedup_ngram_jaccard": ["xxhash64", "LeftAnti"],  # hashed gram keys + df-cap anti-join
    "part_item_recs": ["TakeOrderedAndProject"],  # basket-blocked cooc, global top-k
    "doc_decontaminate": ["xxhash64"],  # shared-gram equi-join on hashed keys
}

# Exchange-count ceilings for the heavy five: a lost broadcast or an
# accidentally unblocked stage shows up as extra shuffles long before it
# shows up as wrong answers. Measured counts at sf0.01 (2026-08, Spark
# 4.1) with ~50% headroom for layout/AQE drift — a breach means the plan
# changed shape, not that the constant drifted.
MAX_EXCHANGES = {
    "dedup_ngram_jaccard": 65,      # measured 46 (30 + the lossless
                                    # prune_unique_grams df-agg + semi-join)
    "part_item_recs": 90,           # measured 61
    "tfidf_cosine_pairs": 66,       # measured 44
    "doc_decontaminate": 16,        # measured 8
    "dedup_semantic_clusters": 8,   # measured 4
}

FORBIDDEN = ["CartesianProduct", "BroadcastNestedLoopJoin"]
# embedding pairs use a blocked equi-join; IVF assignment is a deliberate
# broadcast cross join against the tiny centroid set (rows x ~10 centroids) —
# only flag cartesian/NLJ where unexpected
FORBIDDEN_EXEMPT = {
    "dedup_embedding_cosine",
    "ann_ivf_label_topk",
    # deliberate 1-row scalar crossJoins (KMV theta, LM token total, exact
    # side-channels, predicted-vs-actual cardinality): a BNLJ whose build
    # side is a single aggregate row
    "kmv_partkey_overlap",
    "doc_unigram_logprob",
    "join_cardinality_prediction",
    # same 1-row scalar pattern: bigram-LM / PMI totals, TF-IDF doc count,
    # LSH recall summary (three 1-row aggregates combined)
    "doc_bigram_logprob",
    "corpus_pmi_bigrams",
    "tfidf_cosine_pairs",
    "lsh_recall_report",
    "ann_ivfpq_recall_report",
    # reuses doc_unigram_logprob (and its 1-row token-total crossJoin)
    "doc_quality_balanced_corpus",
    # SF-linear grains (supplier / part) whose HAVING/max scalar is a
    # broadcast 1-row cross join instead of a one-task unpartitioned window
    "q15_top_supplier",
    "q11_important_stock",
    # 1-row scalar crossJoins: baseline [min,max] range + baseline bin-count
    # row broadcast onto the per-day conditional aggregation
    "ev_value_psi_drift",
    # 1-row scalar crossJoins: the fitted OLS model row and the residual-
    # quantile row broadcast onto the calibration/test folds; the basket-
    # rule n_orders total
    "orders_conformal_interval",
    "part_association_rules",
    # bounded-fanout broadcast non-equi join: 20 hash-sampled query vectors
    # broadcast against the corpus (self-match excluded by vec_id != qid)
    "emb_knn_eval",
}


# Unpartitioned Window/WindowGroupLimit nodes execute in ONE task — a
# scale-killer whenever the window's input grows with SF (VERDICT r5 #1).
# Queries listed here are the audited exceptions: their window input is
# DOMAIN-BOUNDED (brand/month/duration/QI domains, top-k lists, transition
# matrices — thousands of rows at any SF), so one task is fine. Everything
# else must use partitioned windows or functions/prefix.py machinery.
WINDOW_UNPARTITIONED_ALLOW: dict[str, str] = {
    "orders_yoy_growth": "month grain — bounded calendar domain at any SF",
    "orders_survival_curve": "distinct order-gap durations in days — bounded domain",
    "doc_hybrid_retrieval": "windows run AFTER .limit(20) — 20-row frames",
    "doc_vocabulary_topk": "zipf_rank window runs AFTER .limit(50) — 50-row frame",
    "corpus_temperature_mixture": "language domain (tens of rows)",
    "lang_source_mutual_info": "lang / source / lang x source domains — bounded",
    "cust_target_encoding": "window over the (mktsegment x fold) aggregate — bounded category domain",
    "cust_woe_urgency": "window over the mktsegment aggregate — bounded category domain",
    "ev_ma_crossover": "moving averages over the day-grain aggregate — bounded calendar domain",
    "ev_burst_detection": "trailing baseline over the hour-grain aggregate — bounded calendar domain",
    "streaming_burst_detection": "trailing baseline over the streamed hour-grain state — bounded calendar domain",
}


def unpartitioned_windows(df) -> list[str]:
    """Names of Window/WindowGroupLimit nodes in the optimized logical plan
    whose partitionSpec is empty (one-task execution)."""
    hits: list[str] = []

    def walk(node):
        name = node.getClass().getSimpleName()
        if name in ("Window", "WindowGroupLimit") and node.partitionSpec().isEmpty():
            hits.append(name)
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return hits


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    import __spark_entry__ as entrymod
    from bears_spark.session import get_session

    spark = get_session("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    only = set(sys.argv[1:])
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        df = fn(spark, SF_DIR)
        txt = plan_text(df)
        missing = [c for c in CHECKS.get(name, []) if c not in txt]
        bad = [c for c in FORBIDDEN if c in txt and name not in FORBIDDEN_EXEMPT]
        upw = [] if name in WINDOW_UNPARTITIONED_ALLOW else unpartitioned_windows(df)
        xover = (
            [f"exchanges={txt.count('Exchange')}>{MAX_EXCHANGES[name]}"]
            if name in MAX_EXCHANGES and txt.count("Exchange") > MAX_EXCHANGES[name]
            else []
        )
        status = (
            "OK" if not missing and not bad and not upw and not xover
            else f"MISSING={missing} FORBIDDEN={bad} ONE_TASK_WINDOW={upw} XCHG={xover}"
        )
        print(f"  {name}: {status}")
        if missing or bad or upw or xover:
            failures.append(name)
            print(txt[:3000])
    if not only or "bucketed_join" in only:
        ok = audit_bucketed_join(spark)
        print(f"  bucketed_join(q3-shape, exchange-free): {'OK' if ok else 'FAIL'}")
        if not ok:
            failures.append("bucketed_join")
    print("AUDIT", "PASS" if not failures else f"FAIL {failures}")
    return 1 if failures else 0


def audit_bucketed_join(spark) -> bool:
    """SCALE.md claims bucketBy removes the q3-shape lineitem join orderkey
    shuffle. Prove it on the physical plan: write lineitem and orders bucketed
    by orderkey, join on it, and assert the joint plan contains a
    SortMergeJoin but NO shuffle Exchange (both scans are pre-bucketed)."""
    from pyspark.sql import functions as F

    from bears_spark.bucketing import is_exchange_free_join, write_bucketed
    from bears_spark.queries.tables import load_table

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    # disable auto-broadcast so the join genuinely exercises the
    # bucketed SMJ path (at 100 TB neither fact side broadcasts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
        od = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
        write_bucketed(li, "audit_li_b", "l_orderkey", 8, sort_cols="l_orderkey")
        write_bucketed(od.withColumnRenamed("o_orderkey", "l_orderkey"), "audit_od_b", "l_orderkey", 8, sort_cols="l_orderkey")
        joined = (
            spark.table("audit_li_b")
            .join(spark.table("audit_od_b"), "l_orderkey")
            # grouping on the bucket key: HashPartitioning(l_orderkey)
            # satisfies the agg's ClusteredDistribution too, so the whole
            # join+agg pipeline is exchange-free
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        )
        return is_exchange_free_join(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS audit_li_b")
        spark.sql("DROP TABLE IF EXISTS audit_od_b")


if __name__ == "__main__":
    raise SystemExit(main())
