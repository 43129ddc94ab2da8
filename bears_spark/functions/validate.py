"""Single-pass declarative data-validation (constraint checking) operator.

The data-quality gate a 100 TB ingest pipeline runs before publishing a
table: completeness, uniqueness, ranges, set membership — ALL constraints
folded into ONE aggregation pass over the data (conditional aggregates),
never one scan per rule. Output is one row per constraint with the violation
count, so the report is constraint-sized, not data-sized.

Extends the reference's per-element ``valid()`` check
(src/bears/core/frame/ScalableDataFrame.py:298-334 — boolean validator over
rows, optionally sampled) into a declarative multi-constraint aggregate.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    """name + a per-row violation predicate (True == row violates)."""

    name: str
    violated: Column


def not_null(col: str) -> Constraint:
    return Constraint(f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Constraint:
    c = F.col(col)
    return Constraint(f"in_range({col},{lo},{hi})", c.isNotNull() & ~c.between(lo, hi))


def isin_set(col: str, values: list) -> Constraint:
    c = F.col(col)
    return Constraint(f"isin({col})", c.isNotNull() & ~c.isin(values))


def matches(col: str, pattern: str) -> Constraint:
    c = F.col(col)
    return Constraint(f"matches({col})", c.isNotNull() & ~c.rlike(pattern))


def unique(col: str) -> Constraint:
    """Uniqueness can't be a per-row predicate; handled specially in
    check_constraints via count - countDistinct (same single pass)."""
    return Constraint(f"unique({col})", F.lit(None))


def check_constraints(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """One row per constraint: (constraint, n_rows, n_violations, passed).

    Compiles to a single aggregate over one scan — each per-row rule is a
    conditional count, uniqueness rules are count(col) - countDistinct(col)
    (duplicate rows beyond the first per value). No shuffle beyond the final
    single-row aggregate; report size = #constraints.
    """
    aggs = [F.count("*").alias("__n__")]
    for i, c in enumerate(constraints):
        if c.name.startswith("unique("):
            col = c.name[len("unique(") : -1]
            aggs.append((F.count(col) - F.countDistinct(col)).alias(f"__v{i}__"))
        else:
            aggs.append(F.count(F.when(c.violated, F.lit(1))).alias(f"__v{i}__"))
    row = df.agg(*aggs)
    reports = [
        F.struct(
            F.lit(c.name).alias("constraint"),
            F.col("__n__").alias("n_rows"),
            F.col(f"__v{i}__").alias("n_violations"),
            (F.col(f"__v{i}__") == 0).alias("passed"),
        )
        for i, c in enumerate(constraints)
    ]
    return (
        row.select(F.explode(F.array(*reports)).alias("r"))
        .select("r.constraint", "r.n_rows", "r.n_violations", "r.passed")
    )
