"""Loaders for the driver's synthetic TPC-H-ish tables (TESTDATA.md).

Parquet scans go through ``spark.read.parquet`` so Catalyst gets column
pruning + predicate pushdown for free; callers select/filter on the returned
DataFrame and the optimizer pushes to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Tables small enough (at any SF — they scale sub-linearly or are capped) to
# broadcast in joins. customer/part scale linearly but stay far under typical
# executor memory through sf100; at true 100TB runs the auto-broadcast
# threshold decides instead of this hint.
DIM_TABLES = frozenset({"region", "nation", "supplier"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as int64 via nanosAsLong (see session.py);
        # integer-divide to µs (never float: ns epochs exceed double precision).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
