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


def isotonic_fit(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group isotonic regression (non-decreasing) by pool-adjacent-
    violators — the standard score-calibration fit (classifier score ->
    empirical outcome rate). Beyond-reference (the reference has no model-
    calibration operators); semantics are the classical PAVA step function,
    identical to the max-min formula fit(i) = max_{j<=i} min_{k>=i}
    weightedMean(y, [j..k]).

    Scale shape: rows reduce FIRST to the per-(group, distinct x) grain in
    Spark (sum y + count — a partial-aggregated groupBy), so the sequential
    PAVA pass inside applyInPandas sees one row per distinct x. The contract
    is the usual grouped-fit one: a group's DISTINCT-X frame must fit one
    worker (score bins / quantiles — thousands of points), while raw row
    counts stay unbounded. PAVA itself is O(distinct_x) amortized with the
    stack-based merge. Block means are ratios of the accumulated raw sums
    (never re-derived from prior means), so integer-valued inputs stay exact
    in the double accumulator.

    Returns step-function segments per group:
    ``(group, x_from, x_to, yhat, n)`` — apply with a bounded range join or
    a last-segment-at-or-below lookup.
    """
    import pandas as pd
    from pyspark.sql import types as T

    reduced = df.groupBy(F.col(group_col).alias("g"), F.col(x_col).alias("x")).agg(
        F.sum(y_col).alias("ysum"), F.count(y_col).alias("w")
    )
    gtype = df.schema[group_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("g", gtype),
            T.StructField("x_from", T.DoubleType()),
            T.StructField("x_to", T.DoubleType()),
            T.StructField("yhat", T.DoubleType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def _pava(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("x").reset_index(drop=True)
        # stack of blocks: [x_from, x_to, y_sum, weight]
        blocks: list[list[float]] = []
        for x, ysum, w in zip(pdf["x"], pdf["ysum"], pdf["w"]):
            blocks.append([float(x), float(x), float(ysum), float(w)])
            while len(blocks) >= 2 and (
                blocks[-2][2] / blocks[-2][3] > blocks[-1][2] / blocks[-1][3]
            ):
                b = blocks.pop()
                blocks[-1][1] = b[1]
                blocks[-1][2] += b[2]
                blocks[-1][3] += b[3]
        g = pdf["g"].iloc[0]
        return pd.DataFrame(
            {
                "g": [g] * len(blocks),
                "x_from": [b[0] for b in blocks],
                "x_to": [b[1] for b in blocks],
                "yhat": [b[2] / b[3] for b in blocks],
                "n": [int(b[3]) for b in blocks],
            }
        )

    return reduced.groupBy("g").applyInPandas(_pava, out_schema)


def holt_smooth(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
) -> DataFrame:
    """Per-group Holt linear-trend exponential smoothing — the classical
    sequential recurrence l_t = a*y_t + (1-a)*(l_{t-1}+b_{t-1}),
    b_t = B*(l_t - l_{t-1}) + (1-B)*b_{t-1}, initialized l_1 = y_1, b_1 = 0.
    Beyond-reference (no smoothing operators exist there); this is the
    genuinely-sequential class of operator — each step depends on the
    previous — so it runs as ONE applyInPandas pass per group over the
    already-REDUCED series (the caller aggregates raw rows to the series
    grain first; a time-bucketed series is time-domain-bounded, not
    SF-linear, so a group's series always fits one worker while raw row
    counts stay unbounded).

    The arithmetic is written to be reproducible by any engine evaluating
    the same IEEE-double expression tree (e.g. a SQL recursive CTE):
    ``a*y + (1-a)*(l+b)`` then ``B*(l_new-l) + (1-B)*b``, no fused or
    reassociated forms.

    Returns ``(group, order, y, level, trend)`` at the series grain.
    """
    import pandas as pd
    from pyspark.sql import types as T

    gtype = df.schema[group_col].dataType
    otype = df.schema[order_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("g", gtype),
            T.StructField("o", otype),
            T.StructField("y", T.DoubleType()),
            T.StructField("level", T.DoubleType()),
            T.StructField("trend", T.DoubleType()),
        ]
    )
    src = df.select(
        F.col(group_col).alias("g"),
        F.col(order_col).alias("o"),
        F.col(value_col).cast("double").alias("y"),
    )
    a, b_ = float(alpha), float(beta)

    def _holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("o").reset_index(drop=True)
        levels: list[float] = []
        trends: list[float] = []
        l = 0.0
        b = 0.0
        for i, y in enumerate(pdf["y"]):
            y = float(y)
            if i == 0:
                l, b = y, 0.0
            else:
                l_new = a * y + (1 - a) * (l + b)
                b = b_ * (l_new - l) + (1 - b_) * b
                l = l_new
            levels.append(l)
            trends.append(b)
        return pd.DataFrame(
            {"g": pdf["g"], "o": pdf["o"], "y": pdf["y"], "level": levels, "trend": trends}
        )

    return src.groupBy("g").applyInPandas(_holt, out_schema)
