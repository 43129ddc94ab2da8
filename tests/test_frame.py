"""SparkFrame / SparkColumn API tests (parity semantics from SURVEY.md §2)."""

import numpy as np
import pandas as pd
import pytest

from bears_spark.frame import SparkFrame


@pytest.fixture()
def sf(spark):
    pdf = pd.DataFrame(
        {
            "a": [1, 2, 3, 4, 5],
            "b": [1.0, np.nan, 3.0, 4.0, 5.0],
            "k": ["x", "y", "x", "z", "x"],
        }
    )
    return SparkFrame.of(pdf, spark)


def test_of_layouts(spark):
    # pandas / dict-of-arrays / list-of-dicts (detect_layout parity)
    assert SparkFrame.of(pd.DataFrame({"a": [1]}), spark).shape == (1, 1)
    assert SparkFrame.of({"a": [1, 2], "b": ["u", "v"]}, spark).shape == (2, 2)
    sparse = SparkFrame.of([{"a": 1}, {"a": 2, "b": "w"}], spark)  # sparse columns -> null
    assert sparse.shape == (2, 2)
    assert sparse[sparse["b"].isna()].shape[0] == 1


def test_multiindex_rejected(spark):
    pdf = pd.DataFrame({"a": [1]}, index=pd.MultiIndex.from_tuples([(1, 2)]))
    with pytest.raises(ValueError):
        SparkFrame.of(pdf, spark)


def test_nan_normalized_to_null(sf):
    assert sf[sf["b"].isna()].shape[0] == 1
    assert sf["b"].hasnans() is True


def test_getitem_select_filter(sf):
    assert sf["a"].sum() == 15
    assert sf[["a", "k"]].columns == ["a", "k"]
    assert sf[sf["a"] > 3].shape[0] == 2
    assert sf[(sf["a"] > 1) & (sf["k"] == "x")].shape[0] == 2


def test_setitem(sf):
    sf["c"] = sf["a"] * 2
    assert sf["c"].sum() == 30


def test_column_ops(sf):
    assert sf["a"].between(2, 4).to_pandas().sum() == 3
    assert sf["a"].isin([1, 5]).to_pandas().sum() == 2
    assert sf["a"].clip(2, 4).to_pandas().tolist() == [2, 2, 3, 4, 4]
    assert (-sf["a"]).to_pandas().tolist() == [-1, -2, -3, -4, -5]
    assert sf["a"].astype("float").to_pandas().dtype == np.float64


def test_reductions(sf):
    a = sf["a"]
    assert a.mean() == 3.0
    assert a.min() == 1 and a.max() == 5
    assert a.median() == 3.0
    assert a.count() == 5
    assert a.nunique() == 5
    assert sf["k"].nunique() == 3
    assert a.std() == pytest.approx(pd.Series([1, 2, 3, 4, 5]).std())
    assert sf["k"].mode() == "x"
    assert a.quantile(0.5) == 3.0
    assert sorted(sf["k"].unique()) == ["x", "y", "z"]
    assert a.is_unique() and not sf["k"].is_unique()
    assert a.nlargest(2) == [5, 4]
    assert a.nsmallest(2) == [1, 2]


def test_frame_reductions_raise(sf):
    with pytest.raises(NotImplementedError):
        sf.sum()


def test_value_counts(sf):
    vc = sf["k"].value_counts()
    assert vc.iloc[0]["value"] == "x" and vc.iloc[0]["count"] == 3


def test_groupby(sf):
    # agg dict produces {col}_{fn} names; k group column remains
    out = sf.groupby("k").agg({"a": ["sum", "mean"]}).to_pandas()
    row = out[out["k"] == "x"].iloc[0]
    assert row["a_sum"] == 9 and row["a_mean"] == 3.0
    assert sf.groupby("k").size().shape == (3, 2)


def test_combine_first(spark):
    base = SparkFrame.of(pd.DataFrame({"k": [1, 2, 3], "v": [10.0, None, 30.0], "o": ["a", "b", "c"]}), spark)
    upd = SparkFrame.of(pd.DataFrame({"k": [2, 4], "v": [200.0, 400.0], "extra": ["x", "y"]}), spark)
    out = base.combine_first(upd, on="k").to_pandas().sort_values("k").reset_index(drop=True)
    assert list(out.columns) == ["k", "v", "o", "extra"]  # self cols then other's extras
    assert out["k"].tolist() == [1, 2, 3, 4]  # key-union row set
    assert out["v"].tolist() == [10.0, 200.0, 30.0, 400.0]  # hole patched, self wins elsewhere
    assert out["o"].tolist() == ["a", "b", "c", None]  # passthrough col null for update-only row
    assert out["extra"].tolist() == [None, "x", None, "y"]


def test_groupby_transform(sf):
    # pandas groupby().transform parity: aggregate broadcast back to rows
    out = sf.groupby("k").transform({"a": ["sum", "count"], "b": "max"}).to_pandas()
    assert len(out) == 5  # row count preserved
    x_rows = out[out["k"] == "x"]
    assert set(x_rows["a_sum"]) == {9} and set(x_rows["a_count"]) == {3}
    assert set(x_rows["b_max"]) == {5.0}
    with pytest.raises(ValueError):
        sf.groupby("k").transform({"a": "cumsum"})


def test_merge_suffixes_indicator(spark):
    left = SparkFrame.of(pd.DataFrame({"k": ["a", "b", "c"], "v": [1, 2, 3]}), spark)
    right = SparkFrame.of(pd.DataFrame({"k": ["b", "c", "d"], "v": [20, 30, 40]}), spark)
    m = left.merge(right, on="k", how="inner")
    assert sorted(m.columns) == ["k", "v_x", "v_y"]
    assert m.shape[0] == 2
    outer = left.merge(right, on="k", how="outer", indicator=True).to_pandas().set_index("k")
    assert outer.loc["a", "_merge"] == "left_only"
    assert outer.loc["b", "_merge"] == "both"
    assert outer.loc["d", "_merge"] == "right_only"
    lr = left.merge(right.rename({"k": "kk"}), left_on="k", right_on="kk")
    assert lr.shape[0] == 2


def test_merge_validate(spark):
    from bears_spark.frame import MergeError

    uniq = SparkFrame.of(pd.DataFrame({"k": ["a", "b"], "v": [1, 2]}), spark)
    dup = SparkFrame.of(pd.DataFrame({"k": ["a", "a", "b"], "w": [1, 2, 3]}), spark)
    # passing modes
    assert uniq.merge(dup, on="k", validate="1:m").shape[0] == 3
    assert dup.merge(uniq, on="k", validate="m:1").shape[0] == 3
    assert uniq.merge(uniq.rename({"v": "v2"}), on="k", validate="one_to_one").shape[0] == 2
    assert dup.merge(dup.rename({"w": "w2"}), on="k", validate="m:m").shape[0] == 5
    # raising paths
    with pytest.raises(MergeError, match="left"):
        dup.merge(uniq, on="k", validate="1:m")
    with pytest.raises(MergeError, match="right"):
        uniq.merge(dup, on="k", validate="1:1")
    with pytest.raises(ValueError, match="validate"):
        uniq.merge(dup, on="k", validate="bogus")


def test_join_raises(sf):
    with pytest.raises(NotImplementedError):
        sf.join(sf)


def test_concat_missing_cols(spark):
    a = SparkFrame.of(pd.DataFrame({"x": [1], "y": ["u"]}), spark)
    b = SparkFrame.of(pd.DataFrame({"x": [2], "z": [9.0]}), spark)
    c = SparkFrame.concat([a, b])
    assert sorted(c.columns) == ["x", "y", "z"]
    assert c.shape == (2, 3)
    assert c[c["z"].isna()].shape[0] == 1


def test_dedup_and_duplicated(spark):
    sf = SparkFrame.of(pd.DataFrame({"k": ["a", "a", "b"], "v": [1, 1, 2]}), spark)
    assert sf.drop_duplicates().shape[0] == 2
    dup = sf.duplicated(subset=["k"]).to_pandas()
    assert dup["duplicated"].sum() == 2


def test_set_ops_and_equals(spark):
    a = SparkFrame.of(pd.DataFrame({"x": [1, 2, 3]}), spark)
    b = SparkFrame.of(pd.DataFrame({"x": [2, 3, 4]}), spark)
    assert a.intersect(b).shape[0] == 2
    assert a.except_all(b).shape[0] == 1
    assert a.equals(SparkFrame.of(pd.DataFrame({"x": [3, 1, 2]}), spark))
    assert not a.equals(b)


def test_missing_data(sf):
    assert sf.dropna().shape[0] == 4
    assert sf.fillna({"b": 0.0})[sf["b"].isna()].shape[0] == 0  # noqa: PD003
    filled = sf.fillna({"b": -1.0}).to_pandas()
    assert (filled["b"] == -1.0).sum() == 1


def test_ffill(spark):
    sf = SparkFrame.of(pd.DataFrame({"t": [1, 2, 3, 4], "v": [1.0, None, None, 4.0]}), spark)
    out = sf.ffill("t", ["v"]).sort_values("t").to_pandas()
    assert out["v"].tolist() == [1.0, 1.0, 1.0, 4.0]


def test_sort_sample_shuffle(sf):
    assert sf.sort_values("a", ascending=False).to_pandas()["a"].tolist() == [5, 4, 3, 2, 1]
    assert sf.sample(n=3, random_state=42).shape[0] == 3
    s1 = sf.shuffle(seed=1).to_pandas()["a"].tolist()
    s2 = sf.shuffle(seed=1).to_pandas()["a"].tolist()
    assert s1 == s2  # seeded-deterministic


def test_apply_and_applymap(spark):
    sf = SparkFrame.of(pd.DataFrame({"a": [1, 2], "b": [3, 4]}), spark)
    doubled = sf.apply(lambda pdf: pdf * 2)
    assert doubled.to_pandas()["a"].tolist() == [2, 4]


def test_elementwise_apply_is_arrow_vectorized(spark):
    sf = SparkFrame.of(pd.DataFrame({"a": [1, 2, None], "b": ["x", "y", "z"]}), spark)
    s = sf["a"].apply(lambda v: -1 if v is None else v * 10, returnType="long")
    vals = sorted(s.to_pandas().tolist())
    assert vals == [-1, 10, 20]
    mm = sf.applymap(lambda v: str(v).upper())
    assert sorted(mm.to_pandas()["b"].tolist()) == ["X", "Y", "Z"]
    # the escape hatch must compile to the Arrow path, not row-at-a-time
    plan = sf.df.select(s.spark)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_is_monotonic(spark):
    inc = SparkFrame.of(pd.DataFrame({"o": [1, 2, 3, 4], "v": [1.0, 1.0, 2.0, 9.0]}), spark)
    assert inc["v"].is_monotonic_increasing(order_col="o")
    assert not inc["v"].is_monotonic_decreasing(order_col="o")
    dec = SparkFrame.of(pd.DataFrame({"o": [1, 2, 3], "v": [3, 2, 2]}), spark)
    assert dec["v"].is_monotonic_decreasing(order_col="o")
    assert not dec["v"].is_monotonic_increasing(order_col="o")
    wiggle = SparkFrame.of(pd.DataFrame({"o": [1, 2, 3], "v": [1, 3, 2]}), spark)
    assert not wiggle["v"].is_monotonic_increasing(order_col="o")
    assert not wiggle["v"].is_monotonic_decreasing(order_col="o")
    withnull = SparkFrame.of(pd.DataFrame({"o": [1, 2], "v": [1.0, None]}), spark)
    assert not withnull["v"].is_monotonic_increasing(order_col="o")
    single = SparkFrame.of(pd.DataFrame({"o": [1], "v": [5]}), spark)
    assert single["v"].is_monotonic_increasing(order_col="o")
    # multi-bucket: 2000 rows spread across all 64 range buckets, with the
    # lone violation landing ON a bucket boundary path
    big = pd.DataFrame({"o": range(2000), "v": list(range(2000))})
    bf = SparkFrame.of(big, spark)
    assert bf["v"].is_monotonic_increasing(order_col="o")
    big2 = big.copy()
    big2.loc[1000, "v"] = 0  # dip in the middle
    bf2 = SparkFrame.of(big2, spark)
    assert not bf2["v"].is_monotonic_increasing(order_col="o")


def test_series_map(sf):
    mapped = sf["k"].map({"x": "X", "y": "Y"}).to_pandas()
    assert set(mapped.dropna()) == {"X", "Y"}


def test_valid(sf):
    assert sf.valid(lambda pdf: pdf["a"] > 0)
    assert not sf.valid(lambda pdf: pdf["a"] > 1)


def test_conversions(sf):
    assert isinstance(sf.to_pandas(), pd.DataFrame)
    lod = sf.to_list_of_dict()
    assert len(lod) == 5 and isinstance(lod[0], dict)
    d = sf.to_dict()
    assert set(d) == {"a", "b", "k"}


def test_repartition(sf):
    assert sf.repartition(2).npartitions == 2
    assert sf.repartition(nrows=2).npartitions == 3  # ceil(5/2)


def test_describe(sf):
    d = sf.describe()
    assert "a" in d.columns and "summary" in d.columns
    assert "mean" in d["summary"].tolist()


def test_pivot_melt_roundtripish(spark):
    sf = SparkFrame.of(
        pd.DataFrame({"k": ["a", "a", "b"], "t": ["x", "y", "x"], "v": [1.0, 2.0, 3.0]}), spark
    )
    p = sf.pivot("k", "t", "v", pivot_values=["x", "y"]).to_pandas().set_index("k").sort_index()
    assert p.loc["a", "x"] == 1.0 and p.loc["a", "y"] == 2.0 and p.loc["b", "x"] == 3.0
    m = sf.melt(["k"], ["v"], "var", "val")
    assert m.shape == (3, 3)
    assert set(m.to_pandas()["var"]) == {"v"}


def test_iloc_range(spark):
    sf = SparkFrame.of(pd.DataFrame({"x": [30, 10, 20, 50, 40]}), spark)
    out = sf.iloc_range(1, 3, "x").to_pandas()["x"].tolist()
    assert out == [20, 30]  # positions 1..2 under ascending x order


def test_bfill(spark):
    sf = SparkFrame.of(pd.DataFrame({"t": [1, 2, 3, 4], "v": [1.0, None, None, 4.0]}), spark)
    out = sf.bfill("t", ["v"]).sort_values("t").to_pandas()
    assert out["v"].tolist() == [1.0, 4.0, 4.0, 4.0]


def test_mad_sem(sf):
    import numpy as np
    a = pd.Series([1, 2, 3, 4, 5], dtype=float)
    assert sf["a"].mad() == pytest.approx((a - a.mean()).abs().mean())
    assert sf["a"].sem() == pytest.approx(a.sem())


def test_rolling_shift_resample(spark):
    pdf = pd.DataFrame({"t": range(1, 9), "g": ["a"] * 4 + ["b"] * 4, "v": [1.0, 2.0, 3.0, 4.0, 10.0, 20.0, 30.0, 40.0]})
    sf = SparkFrame.of(pdf, spark)
    # rolling matches pandas groupby-rolling
    out = sf.rolling_agg("t", 3, {"v": ["mean", "sum"]}, partition_by=["g"]).sort_values("t").to_pandas()
    expected_mean = pdf.groupby("g")["v"].rolling(3, min_periods=1).mean().reset_index(level=0, drop=True)
    assert out["v_rolling_mean"].tolist() == pytest.approx(expected_mean.sort_index().tolist())
    assert out.loc[out["t"] == 4, "v_rolling_sum"].iloc[0] == 9.0  # 2+3+4
    # min_periods nulls short windows
    mp = sf.rolling_agg("t", 3, {"v": "mean"}, partition_by=["g"], min_periods=3).sort_values("t").to_pandas()
    assert mp["v_rolling_mean"].isna().sum() == 4  # first two rows of each group
    # shift lag and lead
    sh = sf.shift("t", ["v"], periods=1, partition_by=["g"]).sort_values("t").to_pandas()
    assert pd.isna(sh.loc[sh["t"] == 1, "v_shift"].iloc[0]) and sh.loc[sh["t"] == 2, "v_shift"].iloc[0] == 1.0
    ld = sf.shift("t", ["v"], periods=-1, partition_by=["g"]).sort_values("t").to_pandas()
    assert ld.loc[ld["t"] == 1, "v_shift"].iloc[0] == 2.0 and pd.isna(ld.loc[ld["t"] == 4, "v_shift"].iloc[0])
    # resample over timestamps
    ts = pd.DataFrame({"ts": pd.date_range("2024-01-01", periods=6, freq="30min"), "v": [1.0] * 6})
    rs = SparkFrame.of(ts, spark).resample("ts", "hour", {"v": ["sum", "count"]}).sort_values("ts").to_pandas()
    assert rs["v_sum"].tolist() == [2.0, 2.0, 2.0] and rs["v_count"].tolist() == [2, 2, 2]


def test_cumagg_diff_pct_rank_ewm(spark):
    pdf = pd.DataFrame({"t": [1, 2, 3, 4], "v": [1.0, 3.0, 2.0, 4.0]})
    sf = SparkFrame.of(pdf, spark)
    cum = sf.cumagg("t", {"v": ["sum", "max", "prod"]}).sort_values("t").to_pandas()
    assert cum["v_cumsum"].tolist() == [1.0, 4.0, 6.0, 10.0]
    assert cum["v_cummax"].tolist() == [1.0, 3.0, 3.0, 4.0]
    assert cum["v_cumprod"].tolist() == [1.0, 3.0, 6.0, 24.0]
    d = sf.diff("t", ["v"]).sort_values("t").to_pandas()
    assert pd.isna(d["v_diff"].iloc[0]) and d["v_diff"].tolist()[1:] == [2.0, -1.0, 2.0]
    p = sf.pct_change("t", ["v"]).sort_values("t").to_pandas()
    assert p["v_pct_change"].tolist()[1:] == pytest.approx([2.0, -1 / 3, 1.0])
    rk = sf.rank("v", method="min").sort_values("t").to_pandas()
    assert rk["rank"].tolist() == [1, 3, 2, 4]
    # ewm matches pandas exactly (computed BY pandas inside applyInPandas)
    ew = sf.ewm_mean("t", ["v"], alpha=0.5).sort_values("t").to_pandas()
    expected = pdf.sort_values("t")["v"].ewm(alpha=0.5).mean()
    assert ew["v_ewm"].tolist() == pytest.approx(expected.tolist())
    # partitioned ewm
    pdf2 = pd.DataFrame({"g": ["a", "a", "b", "b"], "t": [1, 2, 1, 2], "v": [1.0, 2.0, 10.0, 20.0]})
    ew2 = SparkFrame.of(pdf2, spark).ewm_mean("t", ["v"], alpha=0.3, partition_by=["g"]).sort_values(["g", "t"]).to_pandas()
    exp2 = pdf2.groupby("g")["v"].apply(lambda s: s.ewm(alpha=0.3).mean()).reset_index(drop=True)
    assert ew2["v_ewm"].tolist() == pytest.approx(exp2.tolist())


def test_dot_and_divmod(spark):
    sf = SparkFrame.of(pd.DataFrame({"a": [1.0, 2.0, 3.0], "b": [4.0, 5.0, 6.0]}), spark)
    assert sf["a"].dot(sf["b"]) == 32.0  # 4 + 10 + 18
    q, r = divmod(sf["a"] * 10, 7)
    assert q.to_pandas().tolist() == [1.0, 2.0, 4.0]
    assert r.to_pandas().tolist() == [3.0, 6.0, 2.0]


def test_str_accessor(spark):
    sf = SparkFrame.of(pd.DataFrame({"s": ["  Hello World  ", "abc-123", "xyz"]}), spark)
    s = sf["s"]
    assert s.str.strip().str.lower().to_pandas().tolist()[0] == "hello world"
    assert s.str.len().to_pandas().tolist() == [15, 7, 3]
    assert s.str.contains("123").to_pandas().tolist() == [False, True, False]
    assert s.str.contains(r"\d+", regex=True).to_pandas().tolist() == [False, True, False]
    assert s.str.replace("-", "_", regex=False).to_pandas().tolist()[1] == "abc_123"
    assert s.str.extract(r"([a-z]+)-(\d+)", 2).to_pandas().tolist()[1] == "123"
    assert s.str.slice(0, 3).to_pandas().tolist()[2] == "xyz"
    assert s.str.zfill(5).to_pandas().tolist()[2] == "00xyz"
    # matches pandas on the same inputs
    pds = pd.Series(["  Hello World  ", "abc-123", "xyz"])
    assert s.str.strip().to_pandas().tolist() == pds.str.strip().tolist()


def test_dt_accessor(spark):
    ts = pd.to_datetime(["2024-03-15 14:30:45", "2023-12-31 23:59:59"])
    sf = SparkFrame.of(pd.DataFrame({"t": ts}), spark)
    t = sf["t"]
    assert t.dt.year.to_pandas().tolist() == ts.year.tolist()
    assert t.dt.month.to_pandas().tolist() == ts.month.tolist()
    assert t.dt.day.to_pandas().tolist() == ts.day.tolist()
    assert t.dt.hour.to_pandas().tolist() == ts.hour.tolist()
    assert t.dt.dayofweek.to_pandas().tolist() == ts.dayofweek.tolist()  # pandas Monday=0
    assert t.dt.quarter.to_pandas().tolist() == ts.quarter.tolist()
    assert t.dt.strftime("yyyy-MM").to_pandas().tolist() == ["2024-03", "2023-12"]
    assert str(t.dt.date.to_pandas().tolist()[0]) == "2024-03-15"


def test_quantile_approx(spark):
    sf = SparkFrame.of(pd.DataFrame({"v": list(range(1, 1001))}), spark)
    exact = sf["v"].quantile(0.9)
    approx = sf["v"].quantile(0.9, approx=True)
    assert exact == pytest.approx(900.1, abs=1)
    assert abs(approx - exact) <= 2  # GK sketch within accuracy bound


def test_scoped_persist_registry_drains(spark):
    from bears_spark.caching import release_scoped_caches, scoped_persist

    df = scoped_persist(spark.range(10))
    assert df.count() == 10
    assert df.storageLevel.useMemory
    assert release_scoped_caches() >= 1
    assert not df.storageLevel.useMemory  # actually unpersisted
    assert release_scoped_caches() == 0  # registry drained


def test_rolling_time_agg_closed_interval_semantics(spark):
    """Trailing event-time window: closed [t - d, t] (both boundary rows
    included), per-partition, with the min_periods gate; duration parsing
    accepts unit suffixes; partition-less use is refused (unbounded carry)."""
    import datetime

    import pandas as pd
    import pytest as _pytest

    from bears_spark.frame import SparkFrame

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # user a: ts offsets 0s, 30s, 60s, 200s
        ("a", base, 1.0),
        ("a", base + datetime.timedelta(seconds=30), 2.0),
        ("a", base + datetime.timedelta(seconds=60), 4.0),
        ("a", base + datetime.timedelta(seconds=200), 8.0),
        # user b: single event
        ("b", base + datetime.timedelta(seconds=10), 100.0),
    ]
    sf = SparkFrame.of(pd.DataFrame(rows, columns=["u", "ts", "v"]), spark)
    out = (
        sf.rolling_time_agg("ts", "1m", {"v": ["sum", "count"]}, partition_by=["u"])
        .sort_values(["u", "ts"])
        .to_pandas()
    )
    # 60s window is CLOSED on both ends: at t=60s the t=0s row is included
    assert list(out["v_rolling_sum"]) == [1.0, 3.0, 7.0, 8.0, 100.0]
    assert list(out["v_rolling_count"]) == [1, 2, 3, 1, 1]
    # min_periods nulls windows that hold fewer non-null rows
    gated = (
        sf.rolling_time_agg("ts", "1m", {"v": "mean"}, partition_by=["u"], min_periods=2)
        .sort_values(["u", "ts"])
        .to_pandas()
    )
    assert pd.isna(gated["v_rolling_mean"].iloc[0]) and pd.isna(gated["v_rolling_mean"].iloc[3])
    assert gated["v_rolling_mean"].iloc[1] == _pytest.approx(1.5)
    # duration parsing
    assert SparkFrame._parse_duration("90s") == 90
    assert SparkFrame._parse_duration("2h") == 7200
    assert SparkFrame._parse_duration("1w") == 604800
    with _pytest.raises(ValueError, match="duration"):
        SparkFrame._parse_duration("5x")
    with _pytest.raises(ValueError, match="partition_by"):
        sf.rolling_time_agg("ts", "1m", {"v": "sum"}, partition_by=[])
