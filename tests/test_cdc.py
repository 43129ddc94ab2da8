"""MERGE INTO clause algebra + snapshot diff tests."""

from pyspark.sql import functions as F

from bears_spark.functions.cdc import merge_into, snapshot_diff


def _t(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k: bigint, s: string, v: double"
    )


def _s(spark):
    return spark.createDataFrame(
        [(2, "B", 200.0), (3, "C", 300.0), (4, "d", 40.0)], "k: bigint, s: string, v: double"
    )


def _rows(df):
    return sorted((r["k"], r["s"], r["v"]) for r in df.collect())


def test_merge_update_insert(spark):
    out = merge_into(_t(spark), _s(spark), on="k")
    assert _rows(out) == [(1, "a", 10.0), (2, "B", 200.0), (3, "C", 300.0), (4, "d", 40.0)]


def test_merge_matched_delete(spark):
    out = merge_into(_t(spark), _s(spark), on="k", when_matched="delete", when_not_matched="ignore")
    assert _rows(out) == [(1, "a", 10.0)]


def test_merge_matched_condition(spark):
    # update only where source value > 250 -> k=2 keeps target version
    out = merge_into(_t(spark), _s(spark), on="k", matched_condition=F.col("s.v") > 250)
    assert _rows(out) == [(1, "a", 10.0), (2, "b", 20.0), (3, "C", 300.0), (4, "d", 40.0)]


def test_merge_delete_by_source(spark):
    # full sync: target-only rows dropped (classic snapshot replace)
    out = merge_into(_t(spark), _s(spark), on="k", when_not_matched_by_source="delete")
    assert _rows(out) == [(2, "B", 200.0), (3, "C", 300.0), (4, "d", 40.0)]


def test_merge_column_missing_on_one_side(spark):
    t = spark.createDataFrame([(1, "a")], "k: bigint, s: string")
    s = spark.createDataFrame([(2, 5.0)], "k: bigint, extra: double")
    out = merge_into(t, s, on="k")
    got = {r["k"]: (r["s"], r["extra"]) for r in out.collect()}
    assert got == {1: ("a", None), 2: (None, 5.0)}


def test_snapshot_diff_null_safe(spark):
    old = spark.createDataFrame([(1, None), (2, "x"), (3, "y")], "k: bigint, s: string")
    new = spark.createDataFrame([(1, None), (2, "X"), (4, "z")], "k: bigint, s: string")
    got = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, on="k").collect()}
    # k=1: NULL == NULL -> unchanged (absent); 2 changed, 3 removed, 4 added
    assert got == {2: "changed", 3: "removed", 4: "added"}


def test_incremental_join_apply_equals_recompute(spark):
    from bears_spark.functions.cdc import incremental_join_apply

    fact = spark.createDataFrame(
        [(1, 10, 100.0), (2, 10, 200.0), (3, 20, 300.0), (4, 30, 400.0)],
        "pk: bigint, k: bigint, v: double",
    )
    dim = spark.createDataFrame([(10, "x"), (20, "y"), (30, "z")], "k: bigint, attr: string")
    old_view = fact.join(dim, "k").select("pk", "k", "v", "attr")
    # delta replaces pk 2 and 4
    delta = spark.createDataFrame([(2, 20, 999.0), (4, 30, 888.0)], "pk: bigint, k: bigint, v: double")
    new_view = incremental_join_apply(old_view, delta, dim, pk="pk", join_key="k")
    # full recompute of the post-delta fact
    merged_fact = fact.where(~F.col("pk").isin(2, 4)).unionByName(delta)
    want = merged_fact.join(dim, "k").select("pk", "k", "v", "attr")
    got = sorted(tuple(r) for r in new_view.collect())
    exp = sorted(tuple(r) for r in want.collect())
    assert got == exp
    # pk 2 moved dimension (10 -> 20): attr must update too
    row2 = dict((r["pk"], r["attr"]) for r in new_view.collect())[2]
    assert row2 == "y"
