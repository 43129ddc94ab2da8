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
    direction: str = "backward",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """As-of join, full pandas merge_asof parity: ``direction`` backward /
    forward / nearest, ``allow_exact_matches``; DuckDB `ASOF JOIN` ==
    (backward, exact).

    backward attaches the most recent right row with on <= left.on (strict <
    when exact matches are off); forward the earliest with on >= left.on;
    nearest whichever side is closer (tie -> backward, as pandas). Matching
    is per optional ``by`` key; right payload columns come back as
    ``{col}{suffix}``; unmatched left rows get nulls. ``tolerance_us`` nulls
    matches further than the horizon (µs for timestamps, column units for
    numeric ``on``).

    Implemented WITHOUT a join: union both sides with a side tag, then ONE
    window per key ordered by (on, tag) carries the nearest right payload
    onto left rows — one shuffle, no join explosion, scale-correct. The
    payload travels as a single struct through last/first(ignorenulls), so
    the match is row-atomic even when payload columns contain nulls.

    Caveat: duplicate right (by, on) rows have an unspecified winner (pandas
    resolves by input order, which a distributed engine doesn't have).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
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

    # Tiebreak ordinal at equal `on`: left rows always 1; right rows sort
    # BEFORE left (0) when they should be visible to the backward frame /
    # hidden from the forward frame, AFTER (2) in the opposite cases.
    #   backward exact: right=0   backward no-exact: right=2
    #   forward  exact: right=2   forward  no-exact: right=0
    # nearest needs BOTH frames with exact-match semantics on both sides,
    # which 0 (backward-visible) + a separate forward carry over ord-agnostic
    # frames can't express with one ordinal — so nearest uses exact ordinals
    # per side frame below.
    def _carry(back: bool, exact: bool):
        right_ord = (0 if exact else 2) if back else (2 if exact else 0)
        ordc = F.when(F.col("__side__") == 0, F.lit(right_ord)).otherwise(F.lit(1))
        base = Window.partitionBy(by) if by else Window.partitionBy()
        payload = F.when(
            F.col("__side__") == 0,
            F.struct(F.col(on).alias("__on__"), *[F.col(c + suffix).alias(c + suffix) for c in rcols]),
        )
        if back:
            w = base.orderBy(F.col(on), ordc).rowsBetween(Window.unboundedPreceding, 0)
            return F.last(payload, ignorenulls=True).over(w)
        w = base.orderBy(F.col(on), ordc).rowsBetween(0, Window.unboundedFollowing)
        return F.first(payload, ignorenulls=True).over(w)

    if direction == "nearest":
        carried = [
            _carry(True, allow_exact_matches).alias("__mb__"),
            _carry(False, allow_exact_matches).alias("__mf__"),
        ]
    else:
        carried = [_carry(direction == "backward", allow_exact_matches).alias("__match__")]
    out = both.select(*[F.col(c) for c in left.columns], F.col("__side__"), *carried).filter(
        F.col("__side__") == 1
    )
    if direction == "nearest":
        gb = _abs_gap(on, ldtypes[on], "__mb__")
        gf = _abs_gap(on, ldtypes[on], "__mf__")
        pick_f = F.col("__mb__").isNull() | (F.col("__mf__").isNotNull() & (gf < gb))
        out = out.withColumn("__match__", F.when(pick_f, F.col("__mf__")).otherwise(F.col("__mb__")))
    match_ok = F.col("__match__").isNotNull()
    if tolerance_us is not None:
        match_ok = match_ok & (_abs_gap(on, ldtypes[on], "__match__") <= F.lit(tolerance_us))
    return out.select(
        *[F.col(c) for c in left.columns],
        *[F.when(match_ok, F.col(f"__match__.{c}{suffix}")).alias(c + suffix) for c in rcols],
    )


def _abs_gap(on: str, dtype: str, match_name: str) -> F.Column:
    """|left.on - match.on| in µs (timestamps, NTZ tz-safe) or column units."""
    if dtype == "timestamp":
        return F.abs(F.unix_micros(F.col(on)) - F.unix_micros(F.col(f"{match_name}.__on__")))
    if dtype == "timestamp_ntz":
        e = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', {})"
        return F.abs(F.expr(e.format(on)) - F.expr(e.format(f"{match_name}.__on__")))
    return F.abs(F.col(on).cast("double") - F.col(f"{match_name}.__on__").cast("double"))


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
