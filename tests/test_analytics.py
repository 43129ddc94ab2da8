"""Funnel / cohort-retention operator tests (functions/analytics.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from bears_spark.functions.analytics import cohort_retention, window_funnel


def _ev(spark, rows):
    # rows: (user, seconds_offset, type)
    base = dt.datetime(2024, 1, 1)
    data = [(u, base + dt.timedelta(seconds=s), y) for u, s, y in rows]
    return spark.createDataFrame(data, "user_id: bigint, ts: timestamp, event_type: string")


STEPS = ["view", "click", "purchase"]


def test_funnel_full_chain(spark):
    df = _ev(spark, [(1, 0, "view"), (1, 10, "click"), (1, 20, "purchase")])
    got = window_funnel(df, "user_id", "ts", "event_type", STEPS).first()
    assert got["funnel_step"] == 3


def test_funnel_order_matters(spark):
    # purchase BEFORE the click chain completes doesn't count
    df = _ev(spark, [(1, 0, "view"), (1, 5, "purchase"), (1, 10, "click")])
    got = window_funnel(df, "user_id", "ts", "event_type", STEPS).first()
    assert got["funnel_step"] == 2


def test_funnel_min_chain_uses_earliest_entry(spark):
    # min-chain anchors at the FIRST view; a click before it doesn't count,
    # a later click does
    df = _ev(spark, [(1, 0, "click"), (1, 5, "view"), (1, 9, "click")])
    got = window_funnel(df, "user_id", "ts", "event_type", STEPS).first()
    assert got["funnel_step"] == 2


def test_funnel_window_cutoff(spark):
    df = _ev(
        spark,
        [
            (1, 0, "view"), (1, 10, "click"), (1, 50, "purchase"),  # inside 60 s window
            (2, 0, "view"), (2, 10, "click"), (2, 100, "purchase"),  # purchase outside
            (3, 0, "view"), (3, 100, "click"), (3, 110, "purchase"),  # click outside
        ],
    )
    got = {
        r["user_id"]: r["funnel_step"]
        for r in window_funnel(
            df, "user_id", "ts", "event_type", STEPS, window_micros=60 * 1_000_000
        ).collect()
    }
    assert got == {1: 3, 2: 2, 3: 1}


def test_funnel_no_entry_step_zero(spark):
    df = _ev(spark, [(1, 0, "click"), (1, 5, "purchase"), (2, 0, "error")])
    got = {r["user_id"]: r["funnel_step"] for r in window_funnel(df, "user_id", "ts", "event_type", STEPS).collect()}
    assert got == {1: 0, 2: 0}


def test_cohort_retention_matrix(spark):
    df = _ev(
        spark,
        [
            (1, 0, "view"),                      # u1 cohort day 0
            (1, 86400, "view"),                  # u1 active day 1
            (2, 0, "view"),                      # u2 cohort day 0
            (3, 86400, "view"),                  # u3 cohort day 1
            (3, 3 * 86400, "view"),              # u3 active day 2 later
        ],
    )
    got = {
        (r["cohort_day"], r["day_offset"]): r["n_active"]
        for r in cohort_retention(df, "user_id", "ts").collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,  # u1, u2
        ("2024-01-01", 1): 1,  # u1
        ("2024-01-02", 0): 1,  # u3
        ("2024-01-02", 2): 1,  # u3
    }


def test_funnel_single_shuffle_plan(spark):
    # the scale contract: no join, no window — one aggregation over entity
    df = _ev(spark, [(1, 0, "view")])
    plan = window_funnel(df, "user_id", "ts", "event_type", STEPS)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" not in plan


# ----------------------------------------------------------------------------
# cusum_scores: closed-form scan must equal the textbook sequential recursion.
def test_cusum_matches_sequential_recursion(spark):
    import math

    from bears_spark.functions.analytics import cusum_scores

    vals = [10.0, 11.0, 9.0, 10.5, 30.0, 31.0, 29.5, 30.2, 10.0, 9.8]
    df = spark.createDataFrame(
        [(i, "a", v) for i, v in enumerate(vals)], "seq: bigint, grp: string, value: double"
    )
    got = {
        r["seq"]: (r["cusum"], r["cusum_sigma"])
        for r in cusum_scores(df, "value", ["seq"], ["grp"], k=0.25).collect()
    }
    n = len(vals)
    mu = sum(vals) / n
    sd = math.sqrt(sum((v - mu) ** 2 for v in vals) / (n - 1))
    s = 0.0
    for i, v in enumerate(vals):
        s = max(0.0, s + (v - mu - 0.25 * sd))
        assert got[i][0] == pytest.approx(s, abs=1e-9)
        assert got[i][1] == pytest.approx(sd, abs=1e-9)


def test_cusum_resets_after_downward_drift(spark):
    from bears_spark.functions.analytics import cusum_scores

    # long low run then a level shift: score must be ~0 during the low run
    # (max(0, .) clamps) and climb after the shift
    vals = [0.0] * 20 + [10.0] * 5
    df = spark.createDataFrame(
        [(i, "a", v) for i, v in enumerate(vals)], "seq: bigint, grp: string, value: double"
    )
    rows = {r["seq"]: r["cusum"] for r in cusum_scores(df, "value", ["seq"], ["grp"]).collect()}
    assert rows[19] == pytest.approx(0.0, abs=1e-9)  # clamped at zero pre-shift
    assert rows[24] > rows[21] > 0  # monotone climb after the shift


# ----------------------------------------------------------------------------
# sorted_neighborhood_pairs: candidate volume is linear (<= window per row),
# near-identical neighbors are found, and far-apart keys are never compared.
def test_sorted_neighborhood_finds_adjacent_near_dups(spark):
    from bears_spark.functions.dedup import sorted_neighborhood_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta zeta"),     # near-dup of 1, same prefix
            (3, "alpha beta gamma delta epsilon"),  # exact dup of 1
            (4, "zz totally unrelated words here"), # different block
        ],
        "doc_id: bigint, text: string",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(docs, "doc_id", "text", window=2, threshold=0.6).collect()
    }
    assert (1, 3) in pairs and ((1, 2) in pairs or (2, 3) in pairs)
    assert all(4 not in p for p in pairs)  # other block never compared


def test_sorted_neighborhood_candidates_linear(spark):
    from bears_spark.functions.dedup import sorted_neighborhood_pairs

    # 50 identical docs: all-pairs would be 1225; SNM emits <= window per doc
    docs = spark.createDataFrame(
        [(i, "same words every time") for i in range(50)], "doc_id: bigint, text: string"
    )
    n = sorted_neighborhood_pairs(docs, "doc_id", "text", window=3, threshold=0.9).count()
    assert n <= 50 * 3
    assert n == 49 * 3 - 3  # forward-only leads: (n-1)+(n-2)+(n-3) pairs... per window arithmetic


def test_sorted_neighborhood_empty_docs_no_error(spark):
    from bears_spark.functions.dedup import sorted_neighborhood_pairs

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "real words here"), (4, "real words here")],
        "doc_id: bigint, text: string",
    )
    pairs = {(r["id_a"], r["id_b"]) for r in
             sorted_neighborhood_pairs(docs, "doc_id", "text", window=3, threshold=0.5).collect()}
    assert (3, 4) in pairs
    assert all(1 not in p and 2 not in p for p in pairs)  # empty docs: no defined similarity
