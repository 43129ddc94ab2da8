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
}

FORBIDDEN = ["CartesianProduct", "BroadcastNestedLoopJoin"]
# embedding pairs use a blocked equi-join; IVF assignment is a deliberate
# broadcast cross join against the tiny centroid set (rows x ~10 centroids) —
# only flag cartesian/NLJ where unexpected
FORBIDDEN_EXEMPT = {"dedup_embedding_cosine", "ann_ivf_label_topk"}


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
        txt = plan_text(fn(spark, SF_DIR))
        missing = [c for c in CHECKS.get(name, []) if c not in txt]
        bad = [c for c in FORBIDDEN if c in txt and name not in FORBIDDEN_EXEMPT]
        status = "OK" if not missing and not bad else f"MISSING={missing} FORBIDDEN={bad}"
        print(f"  {name}: {status}")
        if missing or bad:
            failures.append(name)
            print(txt[:3000])
    print("AUDIT", "PASS" if not failures else f"FAIL {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
