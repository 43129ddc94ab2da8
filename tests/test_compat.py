"""Reference-spelling compat surface on SparkFrame (aliases, tail, corr/cov
matrices, update, loc, conversions)."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from bears_spark.frame import SparkFrame


@pytest.fixture()
def frame(spark):
    return SparkFrame(
        spark.createDataFrame(
            [(1, 10.0, "a"), (2, None, "b"), (3, 30.0, "a"), (4, 25.0, "c")],
            "id long, v double, tag string",
        )
    )


def test_tail_explicit_order(frame):
    rows = frame.tail(2, order_by="id").df.collect()
    assert [r["id"] for r in rows] == [3, 4]


def test_corr_cov_matrix_one_pass(spark):
    import pandas as pd

    pdf = pd.DataFrame({"x": [1.0, 2.0, 3.0, 4.0], "y": [2.0, 4.1, 5.9, 8.2], "z": [4.0, 3.0, 2.0, 1.0]})
    sf = SparkFrame(spark.createDataFrame(pdf))
    got = sf.corr_matrix()
    exp = pdf.corr()
    assert np.allclose(got.to_numpy(), exp.to_numpy(), atol=1e-9)
    gotc = sf.cov_matrix()
    assert np.allclose(gotc.to_numpy(), pdf.cov().to_numpy(), atol=1e-9)


def test_update_overwrites_nonnull(spark, frame):
    other = SparkFrame(spark.createDataFrame([(2, 99.0), (3, None)], "id long, v double"))
    out = {r["id"]: r["v"] for r in frame.update(other, on="id").df.collect()}
    assert out[2] == 99.0       # null filled from other
    assert out[3] == 30.0       # other's null does NOT erase ours
    assert out[1] == 10.0 and out[4] == 25.0


def test_loc_mask_and_cols(frame):
    out = frame.loc[frame["v"] > 20, ["id", "v"]].df.collect()
    assert sorted((r["id"], r["v"]) for r in out) == [(3, 30.0), (4, 25.0)]
    out2 = frame.loc[frame["tag"] == "a"]
    assert out2.df.count() == 2


def test_aliases_and_conversions(frame):
    assert frame.aggregate({"v": "max"}).df.first()[0] == 30.0
    assert frame.isnull().df.columns == frame.df.columns
    assert not frame.empty and frame.ndim == 2
    assert frame.copy().df is frame.df
    assert dict(frame.items())["v"].max() == 30.0
    assert frame.to_set("tag") == {"a", "b", "c"}
    arr = frame.to_numpy("id")
    assert arr.shape == (4, 1)
    t = frame.to_tensor("numpy", "id", "v")
    assert set(t) == {"id", "v"} and t["id"].shape == (4,)
    assert frame["id"].tolist() == [1, 2, 3, 4]
    blob = frame.compress()
    assert isinstance(blob, bytes) and len(blob) > 0


def test_empty_frame_and_single_partition(spark):
    sf = SparkFrame(spark.createDataFrame([], "id long, v double"))
    assert sf.empty
    assert sf.tail(3, order_by="id").df.count() == 0


def test_merge_asof_frame_method(spark):
    left = SparkFrame(spark.createDataFrame([(1, 10), (1, 20), (2, 15)], "k long, t long"))
    right = SparkFrame(spark.createDataFrame([(1, 9, 1.0), (1, 18, 2.0), (2, 16, 3.0)], "k long, t long, v double"))
    out = {(r["k"], r["t"]): r["v_asof"] for r in left.merge_asof(right, on="t", by="k").df.collect()}
    assert out[(1, 10)] == 1.0 and out[(1, 20)] == 2.0 and out[(2, 15)] is None
    fwd = {(r["k"], r["t"]): r["v_asof"] for r in
           left.merge_asof(right, on="t", by="k", direction="forward").df.collect()}
    assert fwd[(2, 15)] == 3.0


def test_profile_single_pass(spark, frame):
    prof = frame.profile().set_index("column")
    assert prof.loc["v", "nulls"] == 1 and prof.loc["v", "count"] == 3
    assert prof.loc["id", "approx_distinct"] == 4
    assert prof.loc["v", "min"] == 10.0 and prof.loc["v", "max"] == 30.0
    assert prof.loc["tag", "mean"] is None or str(prof.loc["tag", "mean"]) == "nan"
    # column subset
    sub = frame.profile("id")
    assert list(sub["column"]) == ["id"]


def test_corr_matrix_constant_column_nan(spark):
    """Constant column makes corr() null — must surface as NaN like pandas,
    not TypeError (ADVICE r3)."""
    import pandas as pd

    pdf = pd.DataFrame({"x": [1.0, 2.0, 3.0], "c": [5.0, 5.0, 5.0]})
    sf = SparkFrame(spark.createDataFrame(pdf))
    got = sf.corr_matrix()
    assert np.isnan(got.loc["c", "x"]) and np.isnan(got.loc["x", "c"]) and np.isnan(got.loc["c", "c"])
    assert got.loc["x", "x"] == 1.0
    # fully-empty frame: every entry NaN, no crash
    empty = SparkFrame(spark.createDataFrame([], "x double, y double"))
    assert np.isnan(empty.corr_matrix().to_numpy()).all()
