"""Temporal join operators Spark lacks natively: as-of join and range join.

The reference has neither (its merge is pandas delegation only,
src/bears/core/frame/ScalableDataFrame.py:1820-1836, and pandas merge_asof is
not exposed) — these are the capability-gain operators a time-series /
event-log engine needs, built as compositions of existing DataFrame ops:

- ``asof_join``: for each left row, the latest right row with
  right.on <= left.on (per key). Implemented WITHOUT a join: union both
  sides with a side tag, then ONE window per key ordered by (on, side)
  carries the most recent right payload forward onto left rows. One shuffle
  on the key — the cost of a co-partitioned join with no join explosion and
  no per-row probing; this is the scale-correct as-of shape.
- ``range_join``: left.point ∈ [right.start, right.end) by key. Implemented
  as a bucketed equi-join: intervals explode into the fixed-width buckets
  they cover, points map to their bucket, the join runs on (key, bucket)
  with the exact range predicate as a residual filter. This turns an O(n·m)
  theta join (BroadcastNestedLoop at best) into a shuffle hash join whose
  fan-out is ~interval_width/bucket_width rows per interval — the standard
  trick for scaling interval joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Backward as-of join (pandas merge_asof direction='backward',
    allow_exact_matches=True; DuckDB `ASOF JOIN ... ON l.on >= r.on`).

    For every left row, attach the most recent right row whose ``on`` value
    (timestamp) is <= the left's, matching on the optional ``by`` key. Right
    payload columns come back as ``{col}{suffix}``; left rows with no prior
    right row get nulls. ``tolerance_us`` nulls matches older than the given
    microsecond horizon.

    The right payload is carried as ONE struct through
    ``last(..., ignorenulls=True)``, so the match is row-atomic even when
    payload columns contain nulls.

    Caveat: if the right side has DUPLICATE (by, on) rows, which of them
    wins is unspecified (the window has no further tiebreak) — pandas
    merge_asof has the same ambiguity resolved by input order, which a
    distributed engine doesn't have. Deduplicate the right side first if it
    matters.
    """
    rcols = right_cols if right_cols is not None else [c for c in right.columns if c not in (on, by)]
    rdtypes = dict(right.dtypes)
    ldtypes = dict(left.dtypes)

    lhs = left.withColumn("__side__", F.lit(1))
    for c in rcols:
        lhs = lhs.withColumn(c + suffix, F.lit(None).cast(rdtypes[c]))
    rhs = right.select(
        *([F.col(by)] if by else []),
        F.col(on),
        F.lit(0).alias("__side__"),
        *[F.col(c).alias(c + suffix) for c in rcols],
    )
    for c in left.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(ldtypes[c]))
    both = lhs.unionByName(rhs.select(*lhs.columns))

    # right rows sort before left rows at equal `on` (side 0 < 1) -> exact
    # timestamps match; the struct is non-null exactly on right rows
    w = (
        (Window.partitionBy(by) if by else Window.partitionBy())
        .orderBy(on, "__side__")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    payload = F.when(
        F.col("__side__") == 0,
        F.struct(F.col(on).alias("__on__"), *[F.col(c + suffix).alias(c + suffix) for c in rcols]),
    )
    carried = F.last(payload, ignorenulls=True).over(w).alias("__match__")
    out = both.select(*[F.col(c) for c in left.columns], F.col("__side__"), carried).filter(
        F.col("__side__") == 1
    )
    match_ok = F.col("__match__").isNotNull()
    if tolerance_us is not None:
        match_ok = match_ok & (
            (F.unix_micros(F.col(on)) - F.unix_micros(F.col("__match__.__on__"))) <= F.lit(tolerance_us)
        )
    return out.select(
        *[F.col(c) for c in left.columns],
        *[F.when(match_ok, F.col(f"__match__.{c}{suffix}")).alias(c + suffix) for c in rcols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by: str | None = None,
    bucket_width_us: int = 3_600_000_000,
    how: str = "inner",
) -> DataFrame:
    """Join points into half-open intervals [start, end) via bucketing.

    Timestamps are compared in microseconds; ``bucket_width_us`` defaults to
    1 hour — set it near the typical interval width so each interval covers
    only a few buckets. The equi-join on (by, bucket) + residual range
    filter replaces the nested-loop theta join Spark would otherwise pick.
    """
    p_us = F.unix_micros(F.col(point_col))
    s_us = F.unix_micros(F.col(start_col))
    e_us = F.unix_micros(F.col(end_col))
    bw = F.lit(bucket_width_us).cast("bigint")

    pts = points.withColumn("__bucket__", F.floor(p_us / bw))
    # sequence over the buckets [start, end-1] covers every bucket the
    # half-open interval touches
    ivs = intervals.withColumn("__bucket__", F.explode(F.sequence(F.floor(s_us / bw), F.floor((e_us - 1) / bw))))
    on = ["__bucket__"] + ([by] if by else [])
    joined = pts.join(ivs, on=on, how=how).filter(
        (F.unix_micros(F.col(point_col)) >= F.unix_micros(F.col(start_col)))
        & (F.unix_micros(F.col(point_col)) < F.unix_micros(F.col(end_col)))
    )
    return joined.drop("__bucket__")
