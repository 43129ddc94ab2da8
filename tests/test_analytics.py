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


# --- isotonic (PAVA) calibration -------------------------------------------


def test_isotonic_fit_pools_violators(spark):
    import pandas as pd

    from bears_spark.functions.analytics import isotonic_fit

    pdf = pd.DataFrame({"g": ["a"] * 3, "x": [1.0, 2.0, 3.0], "y": [1.0, 3.0, 2.0]})
    out = isotonic_fit(spark.createDataFrame(pdf), "g", "x", "y").orderBy("x_from").collect()
    # y = [1, 3, 2] -> blocks [1], [3,2] pooled to 2.5
    assert [(r["x_from"], r["x_to"], r["yhat"]) for r in out] == [
        (1.0, 1.0, 1.0),
        (2.0, 3.0, 2.5),
    ]


def test_isotonic_fit_monotone_and_weighted(spark):
    import pandas as pd

    from bears_spark.functions.analytics import isotonic_fit

    # duplicate x rows become weights: x=2 has two rows (y 5 and 1, mean 3)
    pdf = pd.DataFrame(
        {
            "g": ["a"] * 5 + ["b"] * 2,
            "x": [1.0, 2.0, 2.0, 3.0, 4.0, 1.0, 2.0],
            "y": [4.0, 5.0, 1.0, 2.0, 6.0, 1.0, 2.0],
        }
    )
    rows = isotonic_fit(spark.createDataFrame(pdf), "g", "x", "y").collect()
    a = sorted([r for r in rows if r["g"] == "a"], key=lambda r: r["x_from"])
    # a: x-means [4, 3, 2, 6] w [1,2,1,1] -> PAVA pools [4,3,2] -> (4+6+2)/4=3
    assert [round(r["yhat"], 6) for r in a] == [3.0, 6.0]
    assert a[0]["n"] == 4 and a[1]["n"] == 1
    b = sorted([r for r in rows if r["g"] == "b"], key=lambda r: r["x_from"])
    assert [r["yhat"] for r in b] == [1.0, 2.0]
    for grp in (a, b):
        ys = [r["yhat"] for r in grp]
        assert ys == sorted(ys)  # monotone invariant


def test_isotonic_fit_matches_minimax_bruteforce(spark):
    import itertools
    import random

    import pandas as pd

    from bears_spark.functions.analytics import isotonic_fit

    rng = random.Random(7)
    xs = list(range(12))
    ys = [rng.randint(0, 5) for _ in xs]
    pdf = pd.DataFrame({"g": ["g"] * 12, "x": [float(x) for x in xs], "y": [float(y) for y in ys]})
    seg = isotonic_fit(spark.createDataFrame(pdf), "g", "x", "y").collect()
    # expand segments to per-x fitted values
    fit = {}
    for r in seg:
        for x in xs:
            if r["x_from"] <= x <= r["x_to"]:
                fit[x] = r["yhat"]
    # brute-force max-min characterization: fit(i) = max_{j<=i} min_{k>=i} mean(y[j..k])
    for i in xs:
        want = max(
            min(sum(ys[j : k + 1]) / (k - j + 1) for k in range(i, len(xs)))
            for j in range(i + 1)
        )
        assert abs(fit[i] - want) < 1e-12, (i, fit[i], want)


# --- Holt linear-trend smoothing --------------------------------------------


def test_holt_smooth_recurrence(spark):
    import pandas as pd

    from bears_spark.functions.analytics import holt_smooth

    pdf = pd.DataFrame(
        {"g": ["a"] * 4, "o": [1, 2, 3, 4], "y": [10.0, 12.0, 14.0, 16.0]}
    )
    out = holt_smooth(
        spark.createDataFrame(pdf), "g", "o", "y", alpha=0.5, beta=0.25
    ).orderBy("o").collect()
    # hand recurrence: l1=10 b1=0; l2=.5*12+.5*10=11, b2=.25*1=0.25; ...
    l, b = 10.0, 0.0
    expect = [(10.0, 0.0)]
    for y in [12.0, 14.0, 16.0]:
        ln = 0.5 * y + 0.5 * (l + b)
        b = 0.25 * (ln - l) + 0.75 * b
        l = ln
        expect.append((l, b))
    assert [(r["level"], r["trend"]) for r in out] == expect


def test_holt_smooth_groups_independent(spark):
    import pandas as pd

    from bears_spark.functions.analytics import holt_smooth

    pdf = pd.DataFrame(
        {
            "g": ["a", "b", "a", "b"],
            "o": [1, 1, 2, 2],
            "y": [1.0, 100.0, 2.0, 200.0],
        }
    )
    rows = holt_smooth(spark.createDataFrame(pdf), "g", "o", "y").collect()
    byg = {(r["g"], r["o"]): r for r in rows}
    assert byg[("a", 1)]["level"] == 1.0 and byg[("b", 1)]["level"] == 100.0
    assert byg[("a", 2)]["level"] == 0.5 * 2.0 + 0.5 * 1.0
    assert byg[("b", 2)]["level"] == 0.5 * 200.0 + 0.5 * 100.0
