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
