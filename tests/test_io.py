"""IO round-trip tests per format (SURVEY.md §5 plan item c)."""

import glob
import os

import numpy as np
import pandas as pd
import pytest

from bears_spark.frame import SparkFrame
from bears_spark.io import FileFormat, FileMetadata, read, write
from bears_spark.io.metadata import detect_format, detect_storage, Storage


def test_format_detection():
    assert detect_format("a/b.parquet") == FileFormat.PARQUET
    assert detect_format("a/b.csv") == FileFormat.CSV
    assert detect_format("a/b.csv.gz") == FileFormat.CSV
    assert detect_format("b.jsonl") == FileFormat.JSONLINES
    assert detect_format("b.tsv") == FileFormat.TSV
    assert detect_format("b.npz") == FileFormat.NPZ
    assert detect_format("b.unknown") is None


def test_storage_detection():
    assert detect_storage("s3://bucket/k") == Storage.S3
    assert detect_storage("/tmp/x") == Storage.LOCAL
    assert detect_storage("https://x/y") == Storage.URL
    assert FileMetadata("s3://b/k.parquet").spark_path == "s3a://b/k.parquet"


@pytest.fixture()
def sample(spark):
    return SparkFrame.of(
        pd.DataFrame({"i": [1, 2, 3], "f": [1.5, 2.5, None], "s": ["a", "b", "c"]}), spark
    )


def _roundtrip(sample, path, fmt, **kw):
    write(sample, path, file_format=fmt, **kw)
    back = read(path, file_format=fmt).to_pandas().sort_values("i").reset_index(drop=True)
    orig = sample.to_pandas().sort_values("i").reset_index(drop=True)
    return orig, back


def test_parquet_roundtrip(sample, tmp_path):
    orig, back = _roundtrip(sample, str(tmp_path / "t.parquet"), "parquet")
    pd.testing.assert_frame_equal(orig, back[orig.columns])


def test_csv_roundtrip(sample, tmp_path):
    orig, back = _roundtrip(sample, str(tmp_path / "t.csv"), "csv")
    assert back["i"].tolist() == [1, 2, 3]
    assert back["s"].tolist() == ["a", "b", "c"]


def test_tsv_roundtrip(sample, tmp_path):
    orig, back = _roundtrip(sample, str(tmp_path / "t.tsv"), "tsv")
    assert back["i"].tolist() == [1, 2, 3]


def test_jsonlines_roundtrip(sample, tmp_path):
    orig, back = _roundtrip(sample, str(tmp_path / "t.jsonl"), "jsonlines")
    assert sorted(back["s"]) == ["a", "b", "c"]


def test_single_file_write(sample, tmp_path):
    p = str(tmp_path / "single.csv")
    write(sample, p, file_format="csv", single_file=True)
    assert os.path.isfile(p)  # a real file, not a directory
    back = read(p, file_format="csv").to_pandas()
    assert len(back) == 3


def test_chunked_write(sample, tmp_path):
    p = str(tmp_path / "chunks.parquet")
    write(sample, p, file_format="parquet", num_chunks=3)
    parts = [f for f in glob.glob(p + "/part-*") if not f.endswith(".crc")]
    assert len(parts) == 3


def test_num_rows_write(spark, tmp_path):
    big = SparkFrame.of(pd.DataFrame({"i": range(10)}), spark)
    p = str(tmp_path / "rows.parquet")
    write(big, p, file_format="parquet", num_rows=4)
    parts = [f for f in glob.glob(p + "/part-*") if not f.endswith(".crc")]
    assert len(parts) == 3  # ceil(10/4)


def test_npz_roundtrip(spark, tmp_path):
    pdf = pd.DataFrame({"x": np.arange(5), "y": np.linspace(0, 1, 5)})
    sf = SparkFrame.of(pdf, spark)
    p = str(tmp_path / "t.npz")
    write(sf, p, file_format="npz")
    back = read(p, file_format="npz").to_pandas().sort_values("x").reset_index(drop=True)
    assert back["x"].tolist() == list(range(5))
    assert back["y"].tolist() == pytest.approx(np.linspace(0, 1, 5).tolist())


def test_schema_pruned_read(sample, tmp_path):
    from bears_spark.types import MLType

    p = str(tmp_path / "pruned.parquet")
    write(sample, p, file_format="parquet")
    back = read(p, file_format="parquet", data_schema={"i": MLType.INT, "missing_col": MLType.TEXT})
    assert back.columns == ["i"]  # missing-column tolerance


def test_testdata_parquet_read(spark, sf_dir):
    sf = read(f"{sf_dir}/lineitem.parquet")
    assert sf.shape[0] == 6000


def test_config_roundtrip(tmp_path):
    from bears_spark.io.config import read_config, write_config, read_pickle, write_pickle

    cfg = {"pipeline": [{"input": "a", "transformer": "case"}], "n": 3}
    j = str(tmp_path / "c.json")
    write_config(cfg, j)
    assert read_config(j) == cfg
    try:
        import yaml  # noqa: F401

        y = str(tmp_path / "c.yaml")
        write_config(cfg, y)
        assert read_config(y) == cfg
    except ImportError:
        pass
    p = str(tmp_path / "o.pkl")
    write_pickle({"x": [1, 2]}, p)
    assert read_pickle(p) == {"x": [1, 2]}
