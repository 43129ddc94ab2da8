"""Event-sequence analytics operators: funnel analysis and cohort retention.

Beyond-reference capability (the reference has no temporal operators at all —
SURVEY.md §2.11, src/bears/core/frame/ScalableSeries.py:405-417 raises on
every temporal method); semantics follow the widely-published product-
analytics definitions (ClickHouse ``windowFunnel``'s min-chain subsequence
matching; standard first-seen-day cohort retention).

Scale design: ``window_funnel`` is ONE shuffle on the entity key — events
collapse to a per-entity sorted array and a single ``aggregate`` lambda runs
the funnel state machine JVM-side (no Python, no join chain, no window). The
per-entity array is bounded by events-per-entity, not table size; the
min-chain join formulation (step-k table joined k times) that an engine
without array HOFs would need is O(k) shuffles instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def window_funnel(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    window_micros: int | None = None,
    out_col: str = "funnel_step",
) -> DataFrame:
    """Per-entity deepest funnel step reached, min-chain semantics:
    t1 = first ``steps[0]`` event; t_{i+1} = first ``steps[i+1]`` event with
    t > t_i (and t <= t1 + window when a window is given). Returns one row
    per entity: (entity_col, out_col) with out_col in [0, len(steps)].

    Conditions are pure timestamp comparisons (never array position), so the
    result is insensitive to how equal-timestamp events tie-break — and an
    independent engine computing the min-chain by joins gets the identical
    answer.
    """
    k = len(steps)
    evs = F.sort_array(
        F.collect_list(F.struct(F.unix_micros(F.col(ts_col)).alias("t"), F.col(type_col).alias("y")))
    )
    init = F.array_repeat(F.lit(-1).cast("bigint"), k)

    def advance(acc: Column, e: Column) -> Column:
        slots = []
        for i, step in enumerate(steps):
            cur = F.element_at(acc, i + 1)
            cond = (cur == -1) & (e["y"] == step)
            if i > 0:
                prev = F.element_at(acc, i)
                cond = cond & (prev != -1) & (e["t"] > prev)
                if window_micros is not None:
                    cond = cond & (e["t"] <= F.element_at(acc, 1) + F.lit(window_micros).cast("bigint"))
            slots.append(F.when(cond, e["t"]).otherwise(cur))
        return F.array(*slots)

    state = F.aggregate(evs, init, advance)
    # chain property: set slots form a prefix, so depth = count of set slots
    depth = F.size(F.filter(state, lambda x: x != -1))
    return df.groupBy(entity_col).agg(depth.cast("bigint").alias(out_col))


def cusum_scores(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    partition_cols: list[str],
    k: float = 0.25,
    out_col: str = "cusum",
) -> DataFrame:
    """One-sided (upward-shift) CUSUM changepoint score per partition, exactly,
    without the sequential recursion.

    The textbook form S_i = max(0, S_{i-1} + (x_i - mu - k*sigma)) looks
    iterative, but it has a closed scan form:

        y_i = x_i - mu - k*sigma;   C_i = sum_{j<=i} y_j
        S_i = C_i - min(0, min_{j<=i} C_j)

    so a running sum plus a running min — two ordered-window prefixes over the
    SAME (partition, order) — compute it in one shuffle, no loop, no Python.
    mu/sigma are whole-partition aggregates (an unordered window on the same
    key, so Catalyst reuses the exchange). Returns ``df`` plus ``out_col``
    (the S_i score) and ``{out_col}_sigma`` (the partition sigma, for the
    caller's `S > h*sigma` alarm rule).
    """
    pw = Window.partitionBy(*partition_cols)
    ow = Window.partitionBy(*partition_cols).orderBy(*order_cols).rowsBetween(Window.unboundedPreceding, 0)
    staged = df.withColumn("__mu__", F.avg(value_col).over(pw)).withColumn("__sd__", F.stddev_samp(value_col).over(pw))
    staged = staged.withColumn("__c__", F.sum(F.col(value_col) - F.col("__mu__") - F.lit(k) * F.col("__sd__")).over(ow))
    staged = staged.withColumn(out_col, F.col("__c__") - F.least(F.lit(0.0), F.min("__c__").over(ow)))
    return staged.drop("__mu__", "__c__").withColumnRenamed("__sd__", f"{out_col}_sigma")


def cohort_retention(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
) -> DataFrame:
    """Classic cohort-retention matrix: cohort = an entity's first active
    day; for each (cohort_day, day_offset) the count of distinct entities
    active that day. Two shuffles (first-seen agg + retention agg); the
    cohort map joins back on the entity key and Spark/AQE picks broadcast
    when the entity dimension fits.
    """
    day = F.date_trunc("day", F.col(ts_col))
    first = df.groupBy(entity_col).agg(F.min(day).alias("__cohort__"))
    return (
        df.join(first, entity_col)
        .groupBy(
            F.date_format("__cohort__", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(day, F.col("__cohort__")).cast("bigint").alias("day_offset"),
        )
        .agg(F.countDistinct(entity_col).alias("n_active"))
    )
