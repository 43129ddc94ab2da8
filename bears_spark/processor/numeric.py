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
