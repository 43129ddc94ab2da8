"""Incremental aggregate maintenance: mergeable per-key rollup states.

The continuous-aggregate pattern for 100 TB pipelines: keep a compact
per-key state table (count / exact decimal sum / min / max), fold new data
in by merging states — never rescan history. Merge is associative and
commutative, so per-partition, per-day, or per-cluster partials combine in
any order; the decimal sum makes ``merge(rollup(A), rollup(B)) ==
rollup(A ∪ B)`` EXACTLY (a float sum would drift with merge order, turning
incremental maintenance into approximate maintenance).

Beyond-reference capability: bears has no incremental aggregation (its
aggregations are one-shot delegations — SURVEY.md §2.4).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SUM_TYPE = "decimal(30,6)"


def rollup_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Per-key mergeable partial aggregate of ``value_col``."""
    return df.groupBy(*keys).agg(
        F.count(value_col).alias("n"),
        F.sum(F.col(value_col).cast(_SUM_TYPE)).alias("sum_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def merge_rollup_states(*states: DataFrame) -> DataFrame:
    """Fold any number of state tables into one (associative merge)."""
    if not states:
        raise ValueError("need at least one state")
    unioned = reduce(lambda a, b: a.unionByName(b), states)
    keys = [c for c in unioned.columns if c not in ("n", "sum_v", "min_v", "max_v")]
    return unioned.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def rollup_result(state: DataFrame) -> DataFrame:
    """Render a state table as final aggregates (sum/avg as double)."""
    keys = [c for c in state.columns if c not in ("n", "sum_v", "min_v", "max_v")]
    return state.select(
        *keys,
        "n",
        F.col("sum_v").cast("double").alias("total"),
        F.round(F.col("sum_v").cast("double") / F.col("n"), 6).alias("avg"),
        "min_v",
        "max_v",
    )
