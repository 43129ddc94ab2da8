"""Multimodal plumbing tests: binaryFile source -> mapInPandas feature
extraction with the deterministic fake decoder."""

import pytest
from pyspark.sql import functions as F

from bears_spark.functions.multimodal import (
    decode_image_batch,
    detect_format,
    extract_image_features,
    load_assets,
    sample_frames,
)

_FAKE_PNG = b"\x89PNG\r\n\x1a\n" + b"fakepixeldata" * 10
_FAKE_JPG = b"\xff\xd8\xff\xe0" + b"jpegbytes" * 10


@pytest.fixture(scope="module")
def asset_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("assets")
    (d / "a.png").write_bytes(_FAKE_PNG)
    (d / "b.jpg").write_bytes(_FAKE_JPG)
    return str(d)


def test_load_assets(spark, asset_dir):
    df = load_assets(spark, asset_dir)
    assert df.count() == 2
    assert {"path", "content", "length"} <= set(df.columns)


def test_detect_format(spark, asset_dir):
    df = load_assets(spark, asset_dir).select("path", detect_format("content").alias("fmt"))
    fmts = {r["path"].rsplit("/", 1)[-1]: r["fmt"] for r in df.collect()}
    assert fmts["a.png"] == "png"
    assert fmts["b.jpg"] == "jpeg"


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image_batch(b"xx", fake=False)


def test_decode_fake_deterministic():
    a = decode_image_batch(_FAKE_PNG, fake=True)
    b = decode_image_batch(_FAKE_PNG, fake=True)
    assert a.shape == (8, 8, 3) and (a == b).all()


def test_extract_image_features(spark, asset_dir):
    feats = extract_image_features(load_assets(spark, asset_dir), fake=True)
    rows = {r["fmt"]: r for r in feats.collect()}
    assert set(rows) == {"png", "jpeg"}
    for r in rows.values():
        assert 0 <= r["mean_r"] <= 255 and r["h"] == 8 and r["w"] == 8
    # deterministic across runs
    again = {r["fmt"]: r for r in extract_image_features(load_assets(spark, asset_dir), fake=True).collect()}
    assert again["png"]["mean_r"] == rows["png"]["mean_r"]


def test_sample_frames(spark, asset_dir):
    frames = sample_frames(load_assets(spark, asset_dir), every_n=10, fake=True)
    pdf = frames.toPandas()
    assert len(pdf) > 2  # multiple frames per asset
    assert (pdf.groupby("path")["frame_idx"].min() == 0).all()
