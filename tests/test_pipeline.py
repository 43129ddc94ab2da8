"""DataPipeline resolution + execution tests (_DataPipeline.py parity)."""

import pandas as pd
import pytest

from bears_spark.pipeline import DataPipeline, PipelineStepConfig, filter_schema_by_input_patterns
from bears_spark.types import MLType


def test_filter_schema_patterns():
    schema = {"name2": MLType.TEXT, "name10": MLType.TEXT, "age": MLType.INT, "bio": MLType.TEXT}
    # numeric-aware ordering: name2 before name10
    assert filter_schema_by_input_patterns(schema, "name.*") == ["name2", "name10"]
    # MLType selection
    assert filter_schema_by_input_patterns(schema, "INT") == ["age"]
    # case-insensitive regex
    assert filter_schema_by_input_patterns(schema, "BIO") == ["bio"]


def test_pipeline_fit_transform(spark):
    pdf = pd.DataFrame(
        {
            "title": ["<b>Hello</b> World", "FOO bar", None],
            "category": ["b", "a", "b"],
            "price": [1.0, None, 3.0],
        }
    )
    df = spark.createDataFrame(pdf)
    pipe = DataPipeline(
        [
            PipelineStepConfig(input="title", transformer="striphtml", output="{col_name}_clean"),
            PipelineStepConfig(input="title_clean", transformer="case", output="{col_name}_lower", params={"case": "lower"}),
            PipelineStepConfig(input="category", transformer="labelencoding", output="{col_name}_enc"),
            PipelineStepConfig(input="price", transformer="numimpute", output="{col_name}_filled", params={"strategy": "mean"}),
        ]
    )
    out = pipe.fit_transform(df).toPandas()
    assert out["title_clean"].tolist()[0] == "Hello World"
    assert out["title_clean_lower"].tolist()[0] == "hello world"
    assert out["category_enc"].tolist() == [2, 1, 2]
    assert out["price_filled"].tolist()[1] == 2.0
    assert len(pipe.perf) == 4

    # transform mode reuses fitted state
    df2 = spark.createDataFrame(pd.DataFrame({"title": ["X"], "category": ["zzz"], "price": [None]}, dtype=object).assign(price=lambda d: d["price"].astype(float)))
    out2 = pipe.transform(df2).toPandas()
    assert out2["category_enc"].tolist() == [0]  # unknown sentinel
    assert out2["price_filled"].tolist() == [2.0]  # train-time mean


def test_pipeline_regex_fanout(spark):
    df = spark.createDataFrame(pd.DataFrame({"f1": ["A"], "f2": ["B"], "other": [1]}))
    pipe = DataPipeline([PipelineStepConfig(input="f[0-9]", transformer="case", output="{col_name}_l", params={"case": "lower"})])
    out = pipe.fit_transform(df).toPandas()
    assert out["f1_l"].tolist() == ["a"] and out["f2_l"].tolist() == ["b"]


def test_pipeline_nto1(spark):
    df = spark.createDataFrame(pd.DataFrame({"t1": ["a"], "t2": ["b"]}))
    pipe = DataPipeline([PipelineStepConfig(input="t[0-9]", transformer="textconcat", output="joined", params={"sep": " "})])
    out = pipe.fit_transform(df).toPandas()
    assert out["joined"].tolist() == ["a b"]


def test_missing_column_behavior(spark):
    df = spark.createDataFrame(pd.DataFrame({"x": [1]}))
    err = DataPipeline([PipelineStepConfig(input="nope", transformer="case")])
    with pytest.raises(ValueError):
        err.fit_transform(df)
    skip = DataPipeline([PipelineStepConfig(input="nope", transformer="case")], missing_column_behavior="skip")
    assert skip.fit_transform(df).columns == ["x"]


def test_from_config(spark, tmp_path):
    import json

    cfg = {
        "pipeline": [
            {"input": "t", "transformer": "case", "output": "{col_name}_u", "params": {"case": "upper"}},
        ],
        "missing_column_behavior": "skip",
    }
    p = tmp_path / "pipe.json"
    p.write_text(json.dumps(cfg))
    pipe = DataPipeline.from_config(str(p))
    df = spark.createDataFrame(pd.DataFrame({"t": ["x"]}))
    assert pipe.fit_transform(df).toPandas()["t_u"].tolist() == ["X"]


def test_mltype_input_selection(spark):
    df = spark.createDataFrame(pd.DataFrame({"s": ["a"], "n": [1.5]}))
    pipe = DataPipeline([PipelineStepConfig(input="FLOAT", transformer="numimpute", output="{col_name}_f")])
    out = pipe.fit_transform(df)
    assert "n_f" in out.columns


def test_round5_quality_processors_in_pipeline(spark):
    """The round-5 corpus signals as config-driven pipeline stages: token
    count, language id, Gopher flag, zlib ratio — one DataPipeline pass."""
    from bears_spark.pipeline import DataPipeline

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and runs far away today"),
            (2, "spam " * 60),
            (3, "der schnelle braune fuchs springt und die hunde laufen mit ihnen heute"),
        ],
        "doc_id long, text string",
    )
    pipe = DataPipeline.from_config(
        {
            "pipeline": [
                {"input": "text", "transformer": "token_count", "output": "n_tok"},
                {"input": "text", "transformer": "lang_id", "output": "lang"},
                {"input": "text", "transformer": "gopher_quality", "output": "keep"},
                {"input": "text", "transformer": "zlib_ratio", "output": "zr"},
            ]
        }
    )
    out = {r["doc_id"]: r for r in pipe.fit_transform(df).collect()}
    assert out[1]["n_tok"] == 14 and out[1]["lang"] == "en" and out[1]["keep"]
    assert out[3]["lang"] == "de"
    assert not out[2]["keep"]  # repetition fails the distinct-word rule
    assert out[2]["zr"] < 0.15 < out[1]["zr"]  # boilerplate compresses away
