"""MLType <-> StructType mapping tests."""

from pyspark.sql import types as T

from bears_spark.types import (
    MLType,
    mltype_schema_to_struct,
    mltype_to_spark,
    spark_to_mltype,
    struct_to_mltype_schema,
)


def test_roundtrip():
    schema = {"name": MLType.TEXT, "age": MLType.INT, "vec": MLType.VECTOR, "ts": MLType.TIMESTAMP}
    struct = mltype_schema_to_struct(schema)
    assert struct["age"].dataType == T.LongType()
    assert struct["vec"].dataType == T.ArrayType(T.DoubleType())
    back = struct_to_mltype_schema(struct)
    assert back == schema  # metadata wins


def test_inference_without_metadata():
    struct = T.StructType(
        [
            T.StructField("s", T.StringType()),
            T.StructField("i", T.IntegerType()),
            T.StructField("d", T.DoubleType()),
            T.StructField("b", T.BinaryType()),
            T.StructField("arr", T.ArrayType(T.FloatType())),
        ]
    )
    schema = struct_to_mltype_schema(struct)
    assert schema["s"] == MLType.TEXT
    assert schema["i"] == MLType.INT
    assert schema["d"] == MLType.FLOAT
    assert schema["b"] == MLType.OBJECT
    assert schema["arr"] == MLType.VECTOR


def test_from_str():
    assert MLType.from_str("text") == MLType.TEXT
    assert MLType.from_str(MLType.INT) == MLType.INT
    assert mltype_to_spark("FLOAT") == T.DoubleType()
    assert spark_to_mltype(T.DateType()) == MLType.TIMESTAMP
