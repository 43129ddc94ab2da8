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

# Tables with a constant (SF-independent) row count — always safe to
# broadcast in joins. customer/part/supplier scale linearly with SF, so the
# AQE auto-broadcast threshold decides for them at runtime instead of a
# forced hint that would OOM at 100x scale.
DIM_TABLES = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS), which vanilla Spark 4
        # rejects (PARQUET_TYPE_ILLEGAL). The conf is runtime-settable, and
        # callers (e.g. the correctness driver) may hand us a session that
        # wasn't built by bears_spark.session — set it here, not only there.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as int64 via nanosAsLong (see session.py);
        # integer-divide to µs (never float: ns epochs exceed double precision).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
