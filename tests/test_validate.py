"""Declarative constraint-checking operator tests (functions/validate.py)."""

from pyspark.sql import functions as F

from bears_spark.functions.validate import (
    check_constraints,
    in_range,
    isin_set,
    matches,
    not_null,
    unique,
)


def _report(df, cons):
    return {r["constraint"]: (r["n_violations"], r["passed"]) for r in check_constraints(df, cons).collect()}


def test_constraints_pass_and_fail(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 50.0), (2, None, -1.0), (3, "zz", None)],
        "id: bigint, s: string, v: double",
    )
    got = _report(
        df,
        [
            not_null("id"),
            not_null("s"),
            unique("id"),
            in_range("v", 0, 10),
            isin_set("s", ["a", "b"]),
            matches("s", "^[ab]$"),
        ],
    )
    assert got["not_null(id)"] == (0, True)
    assert got["not_null(s)"] == (1, False)
    assert got["unique(id)"] == (1, False)  # id=2 twice -> one extra row
    assert got["in_range(v,0,10)"] == (2, False)  # 50.0 and -1.0; null skipped
    assert got["isin(s)"] == (1, False)  # 'zz'; null skipped
    assert got["matches(s)"] == (1, False)


def test_constraints_single_scan_plan(spark):
    df = spark.createDataFrame([(1, "a")], "id: bigint, s: string")
    rep = check_constraints(df, [not_null("id"), unique("id"), isin_set("s", ["a"])])
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # one scan feeding one aggregate: no joins, no unions of scans
    assert plan.count("Scan ExistingRDD") <= 1
    assert "Join" not in plan


def test_constraint_report_rowcount(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "id: bigint")
    rep = check_constraints(df, [not_null("id"), unique("id")]).collect()
    assert len(rep) == 2
    assert all(r["n_rows"] == 100 for r in rep)
