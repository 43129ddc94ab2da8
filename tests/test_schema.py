"""Schema / ColTemplate / SchemaTemplate + compress tests."""

import pandas as pd
import pytest

from bears_spark.frame import SparkFrame
from bears_spark.schema import ColTemplate, Schema, SchemaTemplate
from bears_spark.compress import compress, decompress
from bears_spark.types import MLType


def test_schema_columns_and_keep_remove():
    s = Schema(
        index_col="id",
        features_schema={"f1": MLType.FLOAT, "f2": MLType.TEXT},
        ground_truths_schema={"label": MLType.CATEGORICAL},
    )
    assert s.columns == ["id", "f1", "f2", "label"]
    kept = s.keep_columns(["id", "f1"])
    assert kept.columns == ["id", "f1"]
    removed = s.remove_columns(["f2"])
    assert "f2" not in removed.columns
    assert s.flattened["id"] == MLType.INDEX


def test_schema_filter_df(spark):
    s = Schema(index_col="id", features_schema={"b_feat": MLType.FLOAT, "a_feat": MLType.FLOAT})
    df = spark.createDataFrame(pd.DataFrame({"id": [1], "a_feat": [0.1], "b_feat": [0.2], "extra": ["x"]}))
    out = s.filter_df(df)
    assert out.columns == ["a_feat", "b_feat", "id"]  # sorted
    with pytest.raises(ValueError):
        Schema(index_col="missing").filter_df(df)
    assert Schema(index_col="missing").filter_df(df, allow_missing=True).columns == []


def test_col_template():
    t = ColTemplate("{col_name}_TFIDF", MLType.VECTOR)
    assert t.matches("title_TFIDF")
    assert t.matches("title_tfidf")  # case-insensitive (reference parity)
    assert not t.matches("title")
    assert t.extract("body_TFIDF") == {"col_name": "body"}
    assert t.render(col_name="x") == "x_TFIDF"


def test_schema_template_inference():
    tpl = SchemaTemplate(
        index_template=ColTemplate("id"),
        ground_truth_templates=[ColTemplate("{n}_label", MLType.CATEGORICAL)],
        prediction_templates=[ColTemplate("{n}_pred", MLType.PREDICTED_LABEL)],
        feature_templates=[ColTemplate("{n}", MLType.TEXT)],
    )
    schema = tpl.infer_from_columns(["id", "title", "spam_label", "spam_pred"])
    assert schema.index_col == "id"
    assert schema.ground_truths_schema == {"spam_label": MLType.CATEGORICAL}
    assert schema.predictions_schema == {"spam_pred": MLType.PREDICTED_LABEL}
    assert schema.features_schema == {"title": MLType.TEXT}


def test_compress_roundtrip(spark):
    sf = SparkFrame.of(pd.DataFrame({"a": [1, 2], "s": ["x", "y"]}), spark)
    blob = compress(sf)
    assert isinstance(blob, bytes)
    back = decompress(blob, spark).to_pandas().sort_values("a").reset_index(drop=True)
    assert back["a"].tolist() == [1, 2] and back["s"].tolist() == ["x", "y"]
    b64 = compress(sf, base64=True)
    assert isinstance(b64, str)
    assert decompress(b64, spark).shape == (2, 2)
