"""Metadata-only aggregates on the snapshot table — Iceberg/Delta's
"answer from the manifest" optimization: COUNT(*) and MIN/MAX served from
per-file stats without scanning data, falling back to a scan of ONLY the
files whose stats cannot be trusted (DV-bearing: a deleted row may have held
the extreme; truncated string stats; files missing the column's stats).
At 100 TB this turns a full-corpus aggregate into O(manifest) + O(churn).
Reference parity: bears computes these with a full scan (ScalableDataFrame
min/max); the table layer makes them metadata reads.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from bears_spark.io.snapshot_table import STAT_STRING_PREFIX, SnapshotTable


def _mk(spark, tmp_path, name="t"):
    t = SnapshotTable(spark, str(tmp_path / name))
    t.overwrite(
        spark.createDataFrame(
            [(1, 10, "a"), (2, 20, "b")], "id int, v int, s string"
        ).coalesce(1)
    )
    t.append(
        spark.createDataFrame(
            [(100, 1000, "y"), (200, 2000, "z")], "id int, v int, s string"
        ).coalesce(1)
    )
    return t


def test_count_rows_exact_including_dvs(spark, tmp_path):
    t = _mk(spark, tmp_path)
    assert t.count_rows() == 4
    t.delete_where("id", "=", 100, mode="mor")  # DV, not a rewrite
    assert t.count_rows() == 3
    t.delete_where("id", "=", 1, mode="cow")
    assert t.count_rows() == 2


def test_minmax_metadata_only_when_stats_trusted(spark, tmp_path):
    t = _mk(spark, tmp_path)
    mn, mx = t.stats_minmax("v")
    assert (mn, mx) == (10, 2000)
    # no file has a DV / truncated stat: the answer came from the manifest —
    # prove it by asserting the scan set the method reports is empty
    assert t.stats_minmax("v", return_scanned=True)[2] == 0


def test_minmax_dv_file_falls_back_to_scan(spark, tmp_path):
    t = _mk(spark, tmp_path)
    # tombstone the row holding the global max: its file's stats now
    # OVERSTATE the max, so that file must be scanned
    t.delete_where("v", "=", 2000, mode="mor")
    mn, mx, scanned = t.stats_minmax("v", return_scanned=True)
    assert (mn, mx) == (10, 1000)
    assert scanned == 1  # only the DV-bearing file; the clean file stayed metadata


def test_minmax_truncated_string_stats_scan(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    long = "z" * (STAT_STRING_PREFIX + 8)  # beyond the stat prefix
    t.overwrite(
        spark.createDataFrame([(1, "aa"), (2, long)], "id int, s string").coalesce(1)
    )
    mn, mx = t.stats_minmax("s")
    assert (mn, mx) == ("aa", long)  # exact despite the truncated stat


def test_minmax_dates_decode_from_tagged_stats(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.overwrite(
        spark.createDataFrame(
            [(1, datetime.date(1995, 3, 15)), (2, datetime.date(1998, 8, 2))],
            "id int, d date",
        ).coalesce(1)
    )
    mn, mx, scanned = t.stats_minmax("d", return_scanned=True)
    assert (mn, mx) == (datetime.date(1995, 3, 15), datetime.date(1998, 8, 2))
    assert scanned == 0  # tagged epoch-micros stats decoded, no data read


def test_minmax_all_null_and_empty(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.overwrite(
        spark.createDataFrame([(1, None), (2, None)], "id int, v int").coalesce(1)
    )
    assert t.stats_minmax("v") == (None, None)  # SQL MIN/MAX over all-null


def test_minmax_follows_rename(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("v", "amount")
    assert t.stats_minmax("amount") == (10, 2000)
    with pytest.raises(ValueError, match="unknown column"):
        t.stats_minmax("v")


def test_minmax_matches_scan_over_mixed_history(spark, tmp_path):
    import random

    rng = random.Random(11)
    t = SnapshotTable(spark, str(tmp_path / "t"))
    rows = [(i, rng.randint(-500, 500)) for i in range(60)]
    t.overwrite(spark.createDataFrame(rows, "id int, v int").repartition(4))
    for _ in range(4):
        cut = rng.randint(-500, 500)
        t.delete_where("v", rng.choice([">=", "<="]), cut,
                       mode=rng.choice(["cow", "mor"]))
        if t.count_rows() == 0:
            # a fully-emptied snapshot has no files; read() refuses by
            # contract, and MIN/MAX over nothing is (None, None)
            assert t.stats_minmax("v") == (None, None)
            break
        r = t.read().agg(F.min("v"), F.max("v"), F.count("*")).first()
        assert t.stats_minmax("v") == (r[0], r[1])
        assert t.count_rows() == r[2]


def test_minmax_time_travels_with_versions_and_tags(spark, tmp_path):
    """stats_minmax(version=) answers from THAT snapshot's manifest (and
    mapping: a later rename doesn't confuse the old name), like count_rows."""
    t = _mk(spark, tmp_path)
    v0 = t.current_version()
    t.create_tag("baseline")
    t.update_where("v", "=", 2000, set={"v": 5})
    t.rename_column("v", "amount")
    assert t.stats_minmax("amount") == (5, 1000)
    assert t.stats_minmax("v", version=v0) == (10, 2000)
    assert t.stats_minmax("v", version="baseline") == (10, 2000)
    assert t.count_rows(v0) == 4
