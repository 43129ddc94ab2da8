"""DataProcessor framework: registry + fit/transform as expression compilers.

Reference parity: src/bears/processor/_DataProcessor.py:11-128 (registry by
name/aliases, fit/transform/fit_transform, MissingColumnBehavior),
_SingleColumnProcessor.py (1:1), _Nto1ColumnProcessor.py:19-61 (N:1).

Spark-first redesign: a processor is a **Column-expression compiler**.
- ``fit(df, cols)`` runs at most ONE small aggregation action and stores the
  result as plain-Python state on the processor (the reference pattern:
  aggregate → collect tiny state → broadcast into transform, cf. SURVEY §2.9).
- ``transform_expr(*cols) -> Column`` emits a pure expression — every 1:1 and
  N:1 processor stays inside whole-stage codegen; a pipeline of K steps
  collapses into a single projection.
No pydantic dependency: plain dataclass-style kwargs with __init__ validation.
"""

from __future__ import annotations

from enum import Enum
from typing import Dict, Type

from pyspark.sql import Column, DataFrame


class MissingColumnBehavior(str, Enum):
    ERROR = "error"
    SKIP = "skip"
    EXECUTE = "execute"


class MLTypeTag(str, Enum):
    TEXT = "TEXT"
    CATEGORICAL = "CATEGORICAL"
    INT = "INT"
    FLOAT = "FLOAT"
    BOOL = "BOOL"
    VECTOR = "VECTOR"


_REGISTRY: Dict[str, Type["DataProcessor"]] = {}


def register_processor(cls: Type["DataProcessor"]) -> Type["DataProcessor"]:
    names = {cls.__name__, *getattr(cls, "aliases", ())}
    for n in names:
        key = n.replace("-", "").replace("_", "").lower()
        _REGISTRY[key] = cls
    return cls


def get_processor(name: str, **params) -> "DataProcessor":
    key = name.replace("-", "").replace("_", "").lower()
    if key not in _REGISTRY:
        raise KeyError(f"unknown processor {name!r}; known: {sorted(set(_REGISTRY))}")
    return _REGISTRY[key](**params)


class DataProcessor:
    """Base: fit computes driver-side state; transform emits expressions."""

    aliases: tuple[str, ...] = ()
    input_mltypes: tuple[str, ...] = ()
    output_mltype: str = "TEXT"

    def __init__(self, **params):
        self.params = params
        self._fitted = False

    # -- lifecycle ------------------------------------------------------
    def fit(self, df: DataFrame, cols: list[str]) -> "DataProcessor":
        self._fit(df, cols)
        self._fitted = True
        return self

    def _fit(self, df: DataFrame, cols: list[str]) -> None:  # default: stateless
        pass

    @property
    def is_fitted(self) -> bool:
        return self._fitted

    def __repr__(self) -> str:
        return f"{type(self).__name__}({self.params})"


class SingleColumnProcessor(DataProcessor):
    """1:1 column processor (_SingleColumnProcessor.py parity): compile one
    input column to one output expression."""

    def transform_expr(self, col: Column) -> Column:
        raise NotImplementedError

    def apply(self, df: DataFrame, in_col: str, out_col: str) -> DataFrame:
        """Default: one withColumn. Processors whose expression references an
        expensive intermediate multiple times override this with staged
        projections (CollapseProject keeps multiply-referenced non-cheap
        expressions in their own project, so they evaluate once)."""
        from pyspark.sql import functions as F

        return df.withColumn(out_col, self.transform_expr(F.col(in_col)))

    def fit_transform_expr(self, df: DataFrame, col_name: str) -> Column:
        from pyspark.sql import functions as F

        if not self._fitted:
            self.fit(df, [col_name])
        return self.transform_expr(F.col(col_name))

    def inverse_transform_expr(self, col: Column) -> Column:
        raise NotImplementedError(f"{type(self).__name__} has no inverse")


class Nto1ColumnProcessor(DataProcessor):
    """N:1 column processor (_Nto1ColumnProcessor.py:19-61 parity)."""

    def transform_expr(self, cols: list[Column], col_names: list[str]) -> Column:
        raise NotImplementedError
