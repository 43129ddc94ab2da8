"""Snapshot-versioned table format: commits, time travel, data skipping,
copy-on-write delete (bears_spark/io/snapshot_table.py)."""

import pytest
from pyspark.sql import functions as F

from bears_spark.io.snapshot_table import SnapshotTable


@pytest.fixture()
def table(spark, tmp_path):
    return SnapshotTable(spark, str(tmp_path / "tbl"))


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") % 7).alias("bucket"), (F.col("id") * 2).alias("v")
    )


def test_overwrite_append_and_time_travel(spark, table):
    v1 = table.overwrite(_df(spark, 0, 100))
    v2 = table.append(_df(spark, 100, 150))
    assert (v1, v2) == (1, 2)
    assert table.read(version=1).count() == 100
    assert table.read(version=2).count() == 150
    assert table.read().count() == 150  # latest
    hist = table.snapshots()
    assert [h["operation"] for h in hist] == ["overwrite", "append"]
    assert [h["n_rows"] for h in hist] == [100, 150]


def test_append_is_o_delta(spark, table):
    table.overwrite(_df(spark, 0, 100))
    files_v1 = {e.path for e in table.files(version=1)}
    table.append(_df(spark, 100, 120))
    files_v2 = {e.path for e in table.files(version=2)}
    # v1's files carried by reference, not rewritten
    assert files_v1 <= files_v2
    assert len(files_v2) > len(files_v1)


def test_stats_pruning_skips_files(spark, table):
    # write three disjoint id ranges as separate commits -> separate files
    table.overwrite(_df(spark, 0, 100).coalesce(1))
    table.append(_df(spark, 100, 200).coalesce(1))
    table.append(_df(spark, 200, 300).coalesce(1))
    all_files = table.files()
    pruned = table.files(where=("id", ">=", 250))
    assert len(pruned) < len(all_files)  # manifest stats skipped whole files
    got = table.read(where=("id", ">=", 250))
    assert got.count() == 50
    assert got.agg(F.min("id")).first()[0] == 250


def test_pruning_is_semantically_invisible(spark, table):
    table.overwrite(_df(spark, 0, 100).coalesce(1))
    table.append(_df(spark, 100, 200).coalesce(1))
    for where in [("id", "<", 50), ("id", "=", 150), ("id", ">", 199), ("bucket", "<=", 2)]:
        col, op, val = where
        expect = {"<": "id < 50", "=": "id = 150", ">": "id > 199", "<=": "bucket <= 2"}[op]
        assert table.read(where=where).count() == table.read().filter(expect).count()


def test_delete_where_copy_on_write(spark, table):
    table.overwrite(_df(spark, 0, 100).coalesce(1))
    table.append(_df(spark, 100, 200).coalesce(1))
    files_before = {e.path for e in table.files()}
    table.delete_where("id", ">=", 150)
    after = table.files()
    # the [0,100) file is untouched (provably outside the predicate)...
    untouched = {e.path for e in after} & files_before
    assert untouched
    # ...and the data is correct, with history intact
    assert table.read().count() == 150
    assert table.read().agg(F.max("id")).first()[0] == 149
    assert table.read(version=2).count() == 200  # pre-delete snapshot preserved


def test_read_empty_snapshot_raises(spark, table):
    with pytest.raises(ValueError):
        table.read()


def test_compact_bounds_file_count_preserving_data(spark, table):
    for i in range(5):
        fn = table.overwrite if i == 0 else table.append
        fn(_df(spark, i * 20, (i + 1) * 20).coalesce(1))
    assert len(table.files()) == 5
    v = table.compact(target_rows_per_file=100)
    assert v == 6
    assert len(table.files()) < 5
    assert table.read().count() == 100
    assert {r["id"] for r in table.read().collect()} == set(range(100))
    # pre-compaction snapshot still readable from its original files
    assert table.read(version=5).count() == 100


def test_streaming_append_exactly_once(spark, table, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(pa.table({"id": list(range(50)), "v": [i * 2 for i in range(50)]}),
                   str(src / "a.parquet"))
    stream = (
        spark.readStream.schema("id long, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/")
    )
    ckpt = str(tmp_path / "ckpt")
    q = table.streaming_append(stream, ckpt)
    q.awaitTermination(120)
    assert table.read().count() == 50
    assert table.committed_batch_ids() == {0}
    # a second availableNow run on the SAME checkpoint sees no new source
    # files -> no new batches -> no commits (and any replayed epoch would be
    # skipped by the batch-id stamp: the commit is the idempotency point)
    before = table.current_version()
    q2 = table.streaming_append(stream, ckpt)
    q2.awaitTermination(120)
    assert table.current_version() == before
    assert table.read().count() == 50
    # new source file -> exactly one more committed batch
    pq.write_table(pa.table({"id": [100, 101], "v": [1, 2]}), str(src / "b.parquet"))
    q3 = table.streaming_append(stream, ckpt)
    q3.awaitTermination(120)
    assert table.read().count() == 52


def test_clustered_overwrite_enables_multidim_skipping(spark, table, tmp_path):
    from bears_spark.io.snapshot_table import SnapshotTable

    # 2-D grid in shuffled order: an unclustered layout gives every file the
    # full [0,32) range on both axes, so stats prune nothing
    grid = (
        spark.range(0, 1024)
        .select((F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y"))
        .orderBy(F.xxhash64("id"))  # destroy natural order
    )
    plain = SnapshotTable(spark, str(tmp_path / "plain"))
    plain.overwrite(grid.repartition(8))
    assert len(plain.files(where=("x", "<", 4))) == len(plain.files())

    table.overwrite_clustered(grid, ["x", "y"], bits=5, num_files=8)
    n_all = len(table.files())
    assert n_all >= 4
    # Z-order clustering makes stats selective on BOTH dimensions
    assert len(table.files(where=("x", "<", 4))) < n_all
    assert len(table.files(where=("y", "<", 4))) < n_all
    # and pruning never changes results
    assert table.read(where=("x", "<", 4)).count() == 4 * 32
    assert table.read(where=("y", "<", 4)).count() == 32 * 4


def test_merge_upsert_copy_on_write(spark, table):
    table.overwrite(_df(spark, 0, 100).coalesce(1))
    table.append(_df(spark, 100, 200).coalesce(1))
    files_before = {e.path for e in table.files()}
    # CDC batch: update ids 150/160, insert id 500 — all outside [0,100)
    src = spark.createDataFrame(
        [(150, 150 % 7, -1), (160, 160 % 7, -2), (500, 500 % 7, -3)],
        "id: bigint, bucket: bigint, v: bigint",
    )
    table.merge(src, key="id")
    # the [0,100) file provably contains no source key: carried by reference
    assert {e.path for e in table.files()} & files_before
    got = {r["id"]: r["v"] for r in table.read().collect()}
    assert len(got) == 201  # 200 originals + 1 insert, no duplicates
    assert got[150] == -1 and got[160] == -2 and got[500] == -3
    assert got[151] == 302  # neighbors untouched
    assert got[0] == 0
    # pre-merge snapshot intact
    assert table.read(version=2).count() == 200


def test_expire_and_vacuum_reclaims_only_dead_files(spark, table):
    table.overwrite(_df(spark, 0, 100).coalesce(1))
    table.overwrite(_df(spark, 0, 50).coalesce(1))   # v2 orphans v1's file
    table.append(_df(spark, 50, 60).coalesce(1))     # v3
    live_files = {e.path for e in table.files()}
    assert table.expire_snapshots(keep_last=2) == [1]
    removed = table.vacuum()
    assert removed == 1  # exactly v1's now-unreferenced file
    # live version (and the retained v2) fully intact
    assert {e.path for e in table.files()} == live_files
    assert table.read().count() == 60
    assert table.read(version=2).count() == 50
    assert [h["version"] for h in table.snapshots()] == [2, 3]


def test_schema_evolution_on_append(spark, table):
    table.overwrite(_df(spark, 0, 10).coalesce(1))
    evolved = _df(spark, 10, 20).withColumn("extra", F.lit("new")).coalesce(1)
    table.append(evolved)
    latest = table.read()
    assert "extra" in latest.columns
    assert latest.count() == 20
    assert latest.filter(F.col("extra").isNull()).count() == 10  # old files -> null
    # time travel sees the pre-evolution schema
    assert "extra" not in table.read(version=1).columns


def test_roundtrip_preserves_values_and_nulls(spark, tmp_path):
    # nulls, negatives, empty strings, unicode — commit protocol must be
    # value-transparent
    rows = [
        (1, None, "a"), (2, -5, ""), (3, 0, None), (4, 2**40, "日本語"), (5, None, None),
    ]
    df = spark.createDataFrame(rows, "id: bigint, v: bigint, s: string")
    t = SnapshotTable(spark, str(tmp_path / "rt"))
    t.overwrite(df.filter(F.col("id") <= 3))
    t.append(df.filter(F.col("id") > 3))
    got = sorted(tuple(r) for r in t.read().collect())
    assert got == sorted(rows)
