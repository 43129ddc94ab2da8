"""bears_spark — a PySpark-native analytics engine with the capabilities of
amazon-science/bears (layout-polymorphic ML-data-processing DataFrame library),
re-expressed Spark-first.

Design (see SURVEY.md):
- One engine: everything is a lazy ``pyspark.sql.DataFrame`` plan optimized by
  Catalyst; bears' layout polymorphism (LIST_OF_DICT/DICT/PANDAS/DASK, cf.
  reference src/bears/core/frame/ScalableDataFrame.py:84) collapses into the
  single Spark layout, with pandas/dict/list-of-dict accepted at the API edges.
- Expressions over UDFs: every processor / function compiles to built-in
  ``pyspark.sql.functions`` column expressions so whole-stage codegen applies;
  Arrow-batched pandas UDFs only where built-ins can't express the semantics.
- MLType logical types ride on ``StructField.metadata``.
"""

from bears_spark.session import get_session, stop_session
from bears_spark.types import MLType, MLTypeSchema, mltype_schema_to_struct, struct_to_mltype_schema
from bears_spark.frame import SparkFrame

__version__ = "0.1.0"
_LIBRARY_NAME = "bears_spark"

__all__ = [
    "get_session",
    "stop_session",
    "MLType",
    "MLTypeSchema",
    "mltype_schema_to_struct",
    "struct_to_mltype_schema",
    "SparkFrame",
]
