# tests/test_layout.py
import os

import pandas as pd
import pytest

from bears_spark.io.layout import clustering_report, row_group_stats


def _write(spark, df, path, sort_col=None, shuffle_col=None, rows_per_file=250):
    w = df
    if sort_col:
        w = w.coalesce(1).sortWithinPartitions(sort_col)
    if shuffle_col:
        w = w.repartition(4, shuffle_col)
    (
        w.write.mode("overwrite")
        .option("maxRecordsPerFile", rows_per_file)
        .parquet(path)
    )


def test_row_group_stats_footer_fields(spark, tmp_path):
    df = spark.range(1000).selectExpr("id AS k", "cast(id % 7 AS string) AS s")
    p = str(tmp_path / "t")
    _write(spark, df, p, sort_col="k")
    stats = row_group_stats(spark, p, ["k", "s"]).toPandas()
    assert set(stats["column"]) == {"k", "s"}
    ks = stats[stats["column"] == "k"]
    assert ks["n_rows"].sum() == 1000
    assert ks["stat_min"].astype(int).min() == 0
    assert ks["stat_max"].astype(int).max() == 999

def test_clustering_report_sorted_vs_shuffled(spark, tmp_path):
    df = spark.range(2000).selectExpr("id AS k", "cast(hash(id) AS long) AS r")
    sorted_p, shuf_p = str(tmp_path / "sorted"), str(tmp_path / "shuffled")
    _write(spark, df, sorted_p, sort_col="k")
    _write(spark, df.orderBy("r"), shuf_p, rows_per_file=250)
    srt = clustering_report(spark, sorted_p, "k").collect()[0]
    shf = clustering_report(spark, shuf_p, "k").collect()[0]
    assert srt["overlapping_rgs"] == 0
    assert srt["total_rows"] == 2000 and shf["total_rows"] == 2000
    assert shf["overlapping_rgs"] > 0  # every randomized file spans the range
    assert shf["overlapping_rgs"] == shf["n_row_groups"] - 1

def test_row_group_stats_missing_column_skipped(spark, tmp_path):
    df = spark.range(100).selectExpr("id AS k")
    p = str(tmp_path / "t2")
    _write(spark, df, p)
    stats = row_group_stats(spark, p, ["k", "nope"]).toPandas()
    assert set(stats["column"]) == {"k"}
