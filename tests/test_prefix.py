"""Distributed global prefix aggregates (functions/prefix.py)."""

import pyspark.sql.functions as F
import pytest


def test_partitioned_cumsum_matches_global_window(spark):
    from pyspark.sql import Window

    from bears_spark.functions.prefix import partitioned_cumsum

    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 97).alias("v"), (F.col("id") % 7).cast("double").alias("d")
    )
    out = partitioned_cumsum(df, ["id"], ["v", "d"], num_partitions=8)
    # multiple partitions genuinely participated
    assert out.rdd.getNumPartitions() == 8
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    expected = df.select("id", F.sum("v").over(w).alias("ev"), F.sum("d").over(w).alias("ed"))
    joined = out.join(expected, "id")
    bad = joined.filter((F.col("v_cumsum") != F.col("ev")) | (F.abs(F.col("d_cumsum") - F.col("ed")) > 1e-6))
    assert bad.count() == 0


def test_partitioned_cumsum_empty_and_single_row(spark):
    from bears_spark.functions.prefix import partitioned_cumsum

    empty = spark.range(0).select(F.col("id"), F.lit(1).alias("v"))
    assert partitioned_cumsum(empty, ["id"], ["v"], num_partitions=4).count() == 0
    one = spark.range(1).select(F.col("id"), F.lit(42).alias("v"))
    row = partitioned_cumsum(one, ["id"], ["v"], num_partitions=4).collect()[0]
    assert row["v_cumsum"] == 42


def test_select_until_budget_exact_cut(spark):
    from bears_spark.functions.prefix import select_until_budget

    df = spark.range(100).select(F.col("id"), F.lit(10).alias("cost"))
    out = select_until_budget(df, ["id"], "cost", budget=255, num_partitions=4)
    rows = sorted(r["id"] for r in out.collect())
    # 25 * 10 = 250 <= 255; the 26th would cross
    assert rows == list(range(25))


def test_distributed_row_number_matches_window(spark):
    from pyspark.sql import Window

    from bears_spark.functions.prefix import distributed_row_number

    df = spark.range(5_000).select((F.col("id") * 37 % 4999).alias("k"), F.col("id"))
    out = distributed_row_number(df, ["k", "id"], num_partitions=8)
    w = Window.orderBy("k", "id")
    exp = df.select("k", "id", (F.row_number().over(w) - 1).alias("p"))
    assert out.join(exp, ["k", "id"]).filter(F.col("__pos__") != F.col("p")).count() == 0


def test_iloc_range_distributed(spark):
    from bears_spark.frame import SparkFrame

    sf = SparkFrame(spark.range(1000).select(F.col("id")))
    rows = sorted(r["id"] for r in sf.iloc_range(100, 110, "id").df.collect())
    assert rows == list(range(100, 110))


def test_partitioned_scan_all_fns(spark):
    from pyspark.sql import Window

    from bears_spark.functions.prefix import partitioned_scan

    df = spark.range(3_000).select(
        F.col("id"), ((F.col("id") * 31 + 7) % 100 - 50).alias("v")
    )
    out = partitioned_scan(df, ["id"], {"v": ["sum", "max", "min", "count"]}, num_partitions=6)
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    exp = df.select(
        "id",
        F.sum("v").over(w).alias("es"),
        F.max("v").over(w).alias("ex"),
        F.min("v").over(w).alias("en"),
        F.count("v").over(w).alias("ec"),
    )
    j = out.join(exp, "id")
    bad = j.filter(
        (F.col("v_cumsum") != F.col("es"))
        | (F.col("v_cummax") != F.col("ex"))
        | (F.col("v_cummin") != F.col("en"))
        | (F.col("v_cumcount") != F.col("ec"))
    )
    assert bad.count() == 0


def test_partitioned_cumsum_null_carry(spark):
    """A null at a partition/batch tail must not poison the carry: Spark
    window-sum semantics ignore nulls, so rows AFTER a null keep accumulating
    (ADVICE r3: the carry used to become NaN and nullify the rest)."""
    from pyspark.sql import Window

    from bears_spark.functions.prefix import partitioned_cumsum

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50")
    try:
        df = spark.range(2_000).select(
            F.col("id"),
            F.when(F.col("id") % 50 == 49, F.lit(None)).otherwise(F.col("id") % 13).alias("v"),
        )
        out = partitioned_cumsum(df, ["id"], ["v"], num_partitions=4)
        w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
        exp = df.select("id", "v", F.sum("v").over(w).alias("ev"))
        j = out.join(exp.drop("v"), "id")
        # null input rows keep pandas-cumsum NaN output; every NON-null row
        # must equal the null-ignoring window sum
        bad = j.filter(F.col("v").isNotNull() & (F.col("v_cumsum") != F.col("ev")))
        assert bad.count() == 0
        all_null_after = j.filter((F.col("id") > 49) & F.col("v").isNotNull() & F.col("v_cumsum").isNull())
        assert all_null_after.count() == 0
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_partitioned_scan_null_carry(spark):
    from pyspark.sql import Window

    from bears_spark.functions.prefix import partitioned_scan

    df = spark.range(1_000).select(
        F.col("id"),
        F.when(F.col("id") % 7 == 6, F.lit(None)).otherwise((F.col("id") * 31) % 100 - 50).alias("v"),
    )
    out = partitioned_scan(df, ["id"], {"v": ["sum", "max", "count"]}, num_partitions=5)
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    exp = df.select(
        "id", "v",
        F.sum("v").over(w).alias("es"),
        F.max("v").over(w).alias("ex"),
        F.count("v").over(w).alias("ec"),
    )
    j = out.join(exp.drop("v"), "id").filter(F.col("v").isNotNull())
    bad = j.filter(
        (F.col("v_cumsum") != F.col("es"))
        | (F.col("v_cummax") != F.col("ex"))
        | (F.col("v_cumcount") != F.col("ec"))
    )
    assert bad.count() == 0


def test_scan_cache_bounded(spark):
    """Only the most recent scan's range cache is retained (ADVICE r3:
    repeated calls used to accumulate persisted partitions)."""
    from bears_spark.functions import prefix

    df = spark.range(100).select(F.col("id"), F.lit(1).alias("v"))
    for _ in range(3):
        prefix.partitioned_cumsum(df, ["id"], ["v"], num_partitions=2).count()
    assert len(prefix._SCAN_CACHE) == 1
    prefix.release_scan_caches()
    assert len(prefix._SCAN_CACHE) == 0
