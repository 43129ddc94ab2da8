"""MLType logical type system mapped onto Spark's StructType.

Reference semantics: src/bears/constants/_MLTypeConstants.py:6-90 defines the
MLType enum (data types BOOL/TEXT/CATEGORICAL/INT/FLOAT/VECTOR/SPARSE_VECTOR/
TIMESTAMP/TENSOR/OBJECT, asset types IMAGE/AUDIO/VIDEO/PDF, schema-role types
INDEX/GROUND_TRUTH/PREDICTED_*) and ``MLTypeSchema = Dict[str, MLType]``.

Spark mapping (SURVEY.md §1.3): physical type is the StructField dataType;
the MLType rides in ``StructField.metadata['mltype']`` so role/semantic info
survives plan transformations that don't rewrite the field.
"""

from __future__ import annotations

from enum import Enum
from typing import Dict

from pyspark.sql import types as T


class MLType(str, Enum):
    # data types
    BOOL = "BOOL"
    TEXT = "TEXT"
    CATEGORICAL = "CATEGORICAL"
    INT = "INT"
    FLOAT = "FLOAT"
    VECTOR = "VECTOR"
    SPARSE_VECTOR = "SPARSE_VECTOR"
    TIMESTAMP = "TIMESTAMP"
    TENSOR = "TENSOR"
    OBJECT = "OBJECT"
    # asset types (payload = binary column + path column)
    IMAGE = "IMAGE"
    AUDIO = "AUDIO"
    VIDEO = "VIDEO"
    DOCUMENT_PDF = "DOCUMENT_PDF"
    # schema-role types
    INDEX = "INDEX"
    GROUND_TRUTH = "GROUND_TRUTH"
    PREDICTED_LABEL = "PREDICTED_LABEL"
    PREDICTED_PROBABILITY = "PREDICTED_PROBABILITY"
    PREDICTED = "PREDICTED"

    @classmethod
    def from_str(cls, s: "str | MLType") -> "MLType":
        if isinstance(s, MLType):
            return s
        return cls[s.strip().upper()]


DATA_ML_TYPES = frozenset(
    {
        MLType.BOOL,
        MLType.TEXT,
        MLType.CATEGORICAL,
        MLType.INT,
        MLType.FLOAT,
        MLType.VECTOR,
        MLType.SPARSE_VECTOR,
        MLType.TIMESTAMP,
        MLType.TENSOR,
        MLType.OBJECT,
    }
)

ASSET_ML_TYPES = frozenset({MLType.IMAGE, MLType.AUDIO, MLType.VIDEO, MLType.DOCUMENT_PDF})

PREDICTION_ML_TYPES = frozenset({MLType.PREDICTED_LABEL, MLType.PREDICTED_PROBABILITY, MLType.PREDICTED})

MLTypeSchema = Dict[str, MLType]

# MLType -> Spark physical type. Role types default to their usual payloads.
_MLTYPE_TO_SPARK: dict[MLType, T.DataType] = {
    MLType.BOOL: T.BooleanType(),
    MLType.TEXT: T.StringType(),
    MLType.CATEGORICAL: T.StringType(),
    MLType.INT: T.LongType(),
    MLType.FLOAT: T.DoubleType(),
    MLType.VECTOR: T.ArrayType(T.DoubleType()),
    MLType.SPARSE_VECTOR: T.ArrayType(T.DoubleType()),  # densified at edges
    MLType.TIMESTAMP: T.TimestampType(),
    MLType.TENSOR: T.ArrayType(T.DoubleType(), containsNull=False),
    MLType.OBJECT: T.BinaryType(),
    MLType.IMAGE: T.BinaryType(),
    MLType.AUDIO: T.BinaryType(),
    MLType.VIDEO: T.BinaryType(),
    MLType.DOCUMENT_PDF: T.BinaryType(),
    MLType.INDEX: T.LongType(),
    MLType.GROUND_TRUTH: T.StringType(),
    MLType.PREDICTED_LABEL: T.StringType(),
    MLType.PREDICTED_PROBABILITY: T.DoubleType(),
    MLType.PREDICTED: T.StringType(),
}


def mltype_to_spark(mltype: MLType | str) -> T.DataType:
    return _MLTYPE_TO_SPARK[MLType.from_str(mltype)]


def spark_to_mltype(dt: T.DataType) -> MLType:
    """Best-effort physical->logical inference (used when metadata is absent)."""
    if isinstance(dt, T.BooleanType):
        return MLType.BOOL
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return MLType.INT
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return MLType.FLOAT
    if isinstance(dt, T.StringType):
        return MLType.TEXT
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return MLType.TIMESTAMP
    if isinstance(dt, T.ArrayType):
        return MLType.VECTOR
    if isinstance(dt, T.BinaryType):
        return MLType.OBJECT
    return MLType.OBJECT


def mltype_schema_to_struct(schema: MLTypeSchema) -> T.StructType:
    """MLTypeSchema -> StructType with the MLType recorded in field metadata."""
    return T.StructType(
        [
            T.StructField(col, mltype_to_spark(mt), nullable=True, metadata={"mltype": MLType.from_str(mt).value})
            for col, mt in schema.items()
        ]
    )


def struct_to_mltype_schema(struct: T.StructType) -> MLTypeSchema:
    """StructType -> MLTypeSchema; field metadata wins, else physical inference."""
    out: MLTypeSchema = {}
    for f in struct.fields:
        meta = f.metadata or {}
        out[f.name] = MLType.from_str(meta["mltype"]) if "mltype" in meta else spark_to_mltype(f.dataType)
    return out
