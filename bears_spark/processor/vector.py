"""Vector processors (_vector/_VectorAssembler.py:25-90, _VectorDensifier.py:13-36).

Vectors are ``array<double>`` columns engine-wide (SURVEY §1.3); pyspark.ml
VectorUDT appears only at ML-pipeline boundaries via
pyspark.ml.functions.array_to_vector / vector_to_array.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bears_spark.processor.base import Nto1ColumnProcessor, SingleColumnProcessor, register_processor


@register_processor
class VectorAssembler(Nto1ColumnProcessor):
    """Concat INT/FLOAT/VECTOR columns (sorted by name — reference sorts at
    :44) into one array<double>; invalid_behavior ERROR (null -> fail at
    runtime via assert) or KEEP (nulls pass through as null elements)."""

    aliases = ("vectorassembler", "assemblevector")
    output_mltype = "VECTOR"

    def __init__(self, invalid_behavior: str = "keep", **params):
        super().__init__(invalid_behavior=invalid_behavior, **params)
        if invalid_behavior not in ("error", "keep"):
            raise ValueError(f"bad invalid_behavior {invalid_behavior!r}")
        self.invalid_behavior = invalid_behavior

    def transform_expr(self, cols: list[Column], col_names: list[str]) -> Column:
        raise NotImplementedError("VectorAssembler needs input dtypes — use apply()")

    def apply(self, df: DataFrame, in_cols: list[str], out_col: str) -> DataFrame:
        dtypes = dict(df.dtypes)
        arrays: list[Column] = []
        for name in sorted(in_cols):
            c = F.col(name)
            if dtypes[name].startswith("array"):
                arr = F.transform(c, lambda v: v.cast("double"))
            else:
                arr = F.array(c.cast("double"))
            if self.invalid_behavior == "error":
                arr = F.when(c.isNull(), F.raise_error(F.lit(f"null in {name} (invalid_behavior=error)"))).otherwise(arr)
            else:
                arr = F.coalesce(arr, F.array(F.lit(None).cast("double")))
            arrays.append(arr)
        return df.withColumn(out_col, F.concat(*arrays) if len(arrays) > 1 else arrays[0])


@register_processor
class VectorDensifier(SingleColumnProcessor):
    """Sparse vector -> dense array<double> (_VectorDensifier.py:13-36).
    Accepts pyspark.ml VectorUDT or (indices, values, size) structs."""

    aliases = ("vectordensifier", "densify")
    output_mltype = "VECTOR"

    def transform_expr(self, col: Column) -> Column:
        # VectorUDT path handled in apply(); struct path is expression-only
        return col

    def apply(self, df: DataFrame, in_col: str, out_col: str) -> DataFrame:
        dtype = dict(df.dtypes)[in_col]
        if dtype == "vector":  # pyspark.ml VectorUDT
            from pyspark.ml.functions import vector_to_array

            return df.withColumn(out_col, vector_to_array(F.col(in_col)))
        if dtype.startswith("array"):
            return df.withColumn(out_col, F.transform(F.col(in_col), lambda v: v.cast("double")))
        if dtype.startswith("struct"):
            # struct<size:int, indices:array<int>, values:array<double>>
            c = F.col(in_col)
            return df.withColumn(
                out_col,
                F.transform(
                    F.sequence(F.lit(0), c["size"] - 1),
                    # array_position returns 0 for "not found" and element_at
                    # rejects index 0 even via try_ — guard with when()
                    lambda i: F.when(
                        F.array_position(c["indices"], i) > 0,
                        F.element_at(c["values"], F.array_position(c["indices"], i).cast("int")),
                    ).otherwise(F.lit(0.0)),
                ),
            )
        raise ValueError(f"cannot densify column of type {dtype}")
