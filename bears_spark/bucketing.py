"""Bucketed-table helpers: co-located joins without shuffles.

The 100 TB strategy for repeated fact-fact joins (SCALE.md): write both
tables bucketed by the join key once; every subsequent equi-join on that key
runs exchange-free (SortMergeJoin over pre-bucketed scans). These helpers
wrap the saveAsTable plumbing Spark requires for bucketing metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    num_buckets: int,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
    file_format: str = "parquet",
) -> None:
    """Persist as a bucketed (optionally sorted) managed table.

    num_buckets sizing: target ~100-200 MB per bucket file at the expected
    table size; too few buckets re-introduces stragglers, too many makes
    small files."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.mode(mode).format(file_format).bucketBy(num_buckets, *cols)
    if sort_cols:
        sc = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*sc)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def is_exchange_free_join(joined: DataFrame) -> bool:
    """True iff the physical plan contains a join but no shuffle Exchange —
    the signature of a co-located bucketed join."""
    import io
    import re
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    has_join = "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # formatted plans print the node as "(N) Exchange" with hashpartitioning
    # on the Arguments line — match the node, not a single concatenated string
    has_shuffle = bool(re.search(r"\(\d+\) Exchange", plan)) and "hashpartitioning" in plan
    return has_join and not has_shuffle
