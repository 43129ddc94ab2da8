"""Merge-on-read deletes for SnapshotTable (io/dv.py + delete_where
mode="mor"): deletion vectors instead of file rewrites — O(delete set) cost,
read-side (file, pos) anti-join, materialization by maintenance, exact
incremental views, and native Delta DV export."""

import os

import pytest
from pyspark.sql import functions as F

from bears_spark.io.snapshot_table import FileEntry, SnapshotTable


def _mk(spark, tmp_path, name="t", n=100, files=2):
    t = SnapshotTable(spark, str(tmp_path / name))
    df = spark.range(0, n).select(
        F.col("id"),
        (F.col("id") % 10).alias("bucket"),
        (F.col("id") * 2.0).alias("v"),
    )
    t.overwrite(df.repartition(files))
    return t


def test_mor_delete_matches_cow_and_time_travel(spark, tmp_path):
    t_mor = _mk(spark, tmp_path, "mor")
    t_cow = _mk(spark, tmp_path, "cow")
    v0 = t_mor.current_version()
    t_mor.delete_where("id", "<", 30, mode="mor")
    t_cow.delete_where("id", "<", 30, mode="cow")
    got = sorted(x["id"] for x in t_mor.read().collect())
    assert got == sorted(x["id"] for x in t_cow.read().collect()) == list(range(30, 100))
    # MoR left every data file in place, only attached DVs
    entries = t_mor.files()
    assert any(e.dv for e in entries)
    assert all(e.rows > e.live_rows for e in entries if e.dv)
    # time travel: the pre-delete snapshot still reads all rows
    assert t_mor.read(version=v0).count() == 100
    # snapshots() reports LIVE rows
    assert t_mor.snapshots()[-1]["n_rows"] == 70


def test_mor_delete_merges_existing_dv(spark, tmp_path):
    t = _mk(spark, tmp_path, "merge2")
    t.delete_where("id", "<", 10, mode="mor")
    first_dvs = {e.path: e.dv["path"] for e in t.files() if e.dv}
    t.delete_where("id", ">=", 90, mode="mor")
    got = sorted(x["id"] for x in t.read().collect())
    assert got == list(range(10, 90))
    # second delete wrote FRESH DV files (immutable), merged positions
    second_dvs = {e.path: e.dv["path"] for e in t.files() if e.dv}
    for p, dvp in second_dvs.items():
        if p in first_dvs:
            assert dvp != first_dvs[p]
    total_card = sum(e.dv["cardinality"] for e in t.files() if e.dv)
    assert total_card == 20
    # and the intermediate version still time-travels through its OWN DV
    assert t.read(version=2).count() == 90


def test_mor_delete_drops_fully_deleted_files(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "full"))
    a = spark.range(0, 10).select(F.col("id"), (F.col("id") * 1.0).alias("v"))
    b = spark.range(100, 110).select(F.col("id"), (F.col("id") * 1.0).alias("v"))
    t.overwrite(a.coalesce(1))
    t.append(b.coalesce(1))
    t.delete_where("id", ">=", 100, mode="mor")
    entries = t.files()
    assert len(entries) == 1  # the all-deleted file left the manifest
    assert entries[0].dv is None
    assert sorted(x["id"] for x in t.read().collect()) == list(range(10))


def test_mor_delete_null_keys_survive(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "nulls"))
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 50.0)], "id bigint, v double"
    )
    t.overwrite(df.coalesce(1))
    t.delete_where("v", "<", 100.0, mode="mor")
    got = sorted(x["id"] for x in t.read().collect())
    assert got == [2]  # null v rows survive, like SQL DELETE


def test_mor_delete_where_read_pruning_parity(spark, tmp_path):
    t = _mk(spark, tmp_path, "prune", n=200, files=4)
    t.delete_where("bucket", "=", 3, mode="mor")
    # pruned read == plain filter over the DV-applied table
    for probe in (("id", ">=", 150), ("bucket", "=", 3), ("bucket", "=", 5)):
        col, op, val = probe
        full = t.read().filter(f"{col} {'=' if op in ('=','==') else op} {val}").count()
        assert t.read(where=probe).count() == full


def test_mor_then_compact_materializes(spark, tmp_path):
    t = _mk(spark, tmp_path, "mat", n=100, files=3)
    t.delete_where("id", "<", 25, mode="mor")
    assert any(e.dv for e in t.files())
    t.compact(target_rows_per_file=1000)
    entries = t.files()
    assert all(e.dv is None for e in entries)  # DVs materialized away
    assert sorted(x["id"] for x in t.read().collect()) == list(range(25, 100))
    # physical rows now equal live rows
    assert sum(e.rows for e in entries) == 75


def test_mor_then_cow_delete_and_merge_apply_dvs(spark, tmp_path):
    t = _mk(spark, tmp_path, "mix", n=100, files=2)
    t.delete_where("id", "<", 20, mode="mor")
    # CoW delete on a DV-bearing file must not resurrect MoR-deleted rows
    t.delete_where("id", ">=", 80, mode="cow")
    assert sorted(x["id"] for x in t.read().collect()) == list(range(20, 80))
    # MERGE reads through DVs too
    src = spark.createDataFrame([(25, 5, -1.0), (500, 0, -2.0)], "id bigint, bucket bigint, v double")
    t.merge(src, key="id")
    rows = {x["id"]: x["v"] for x in t.read().collect()}
    assert rows[25] == -1.0 and rows[500] == -2.0
    assert 10 not in rows and len(rows) == 61


def test_mor_vacuum_keeps_referenced_dvs(spark, tmp_path):
    t = _mk(spark, tmp_path, "vac", n=50, files=1)
    t.delete_where("id", "<", 10, mode="mor")
    t.delete_where("id", "<", 20, mode="mor")  # supersedes the first DV

    def _bins():
        out = []
        for sub in os.listdir(os.path.join(str(tmp_path / "vac"), "data")):
            d = os.path.join(str(tmp_path / "vac"), "data", sub)
            out += [os.path.join(d, n) for n in os.listdir(d) if n.endswith(".bin")]
        return set(out)

    assert len(_bins()) == 2
    # both snapshots still live: vacuum reclaims nothing
    assert t.vacuum() == 0
    live_dv = {e.dv["path"] for e in t.files() if e.dv}
    # expire history: the superseded DV (referenced only by v2) is reclaimed,
    # the live one survives
    t.expire_snapshots(keep_last=1)
    removed = t.vacuum()
    assert removed >= 1
    assert _bins() == live_dv
    assert sorted(x["id"] for x in t.read().collect()) == list(range(20, 50))


def test_mor_incremental_view_exact(spark, tmp_path):
    from bears_spark.io.incremental_view import IncrementalAggView

    t = _mk(spark, tmp_path, "ivm", n=100, files=2)
    view = IncrementalAggView(
        spark, t, str(tmp_path / "ivm_view"), group_cols=["bucket"], sum_cols=["v"]
    )
    view.refresh()
    t.delete_where("id", "<", 37, mode="mor")
    view.refresh()
    got = {
        r["bucket"]: (r["n_rows"], float(r["v_sum"]))
        for r in view.read().collect()
    }
    want = {
        r["bucket"]: (r["n_rows"], float(r["v_sum"]))
        for r in t.read()
        .groupBy("bucket")
        .agg(F.count("*").alias("n_rows"), F.sum(F.col("v").cast("decimal(38,6)")).alias("v_sum"))
        .collect()
    }
    assert got == want
    # a second MoR delete on the SAME files (dv -> dv') stays exact
    t.delete_where("id", ">=", 80, mode="mor")
    view.refresh()
    got2 = {r["bucket"]: r["n_rows"] for r in view.read().collect()}
    want2 = {
        r["bucket"]: r["cnt"]
        for r in t.read().groupBy("bucket").agg(F.count("*").alias("cnt")).collect()
    }
    assert got2 == want2


def test_mor_changes_since_applies_new_file_dvs(spark, tmp_path):
    t = _mk(spark, tmp_path, "feed", n=50, files=1)
    v1 = t.current_version()
    t.append(
        spark.range(100, 150)
        .select(F.col("id"), (F.col("id") % 10).alias("bucket"), (F.col("id") * 2.0).alias("v"))
        .coalesce(1)
    )
    t.delete_where("id", ">=", 140, mode="mor")
    got = sorted(x["id"] for x in t.changes_since(v1).collect())
    assert got == list(range(100, 140))  # the new file, minus its DV


def test_mor_export_delta_roundtrip(spark, tmp_path):
    """A MoR table exports NATIVE Delta deletion vectors: the reader (and any
    spec-compliant Delta reader) sees only live rows; an incremental
    re-export after another MoR delete re-adds the same parquet path with
    the new descriptor."""
    from bears_spark.io.delta_log import DeltaTableReader, export_delta_log

    t = _mk(spark, tmp_path, "exp", n=100, files=2)
    t.delete_where("id", "<", 15, mode="mor")
    out = str(tmp_path / "exp_delta")
    export_delta_log(t, out, checkpoint=True)
    r = DeltaTableReader(spark, out)
    assert sorted(x["id"] for x in r.read().collect()) == list(range(15, 100))
    assert any(f.startswith("deletion_vector_") for f in os.listdir(out))

    parquets_before = {n for n in os.listdir(out) if n.endswith(".parquet")}
    t.delete_where("id", ">=", 90, mode="mor")
    export_delta_log(t, out, checkpoint=True)
    parquets_after = {n for n in os.listdir(out) if n.endswith(".parquet")}
    assert parquets_before == parquets_after  # dv change re-links NO parquet
    r2 = DeltaTableReader(spark, out)
    assert sorted(x["id"] for x in r2.read().collect()) == list(range(15, 90))
    # exported history time-travels too
    assert r2.read(version=0).count() == 85


def test_mor_no_match_commits_noop_version(spark, tmp_path):
    t = _mk(spark, tmp_path, "noop", n=10, files=1)
    v = t.current_version()
    t.delete_where("id", ">", 10_000, mode="mor")
    assert t.current_version() == v + 1
    assert t.read().count() == 10
    assert all(e.dv is None for e in t.files())


def test_mor_unknown_mode_rejected(spark, tmp_path):
    t = _mk(spark, tmp_path, "badmode", n=10, files=1)
    with pytest.raises(ValueError, match="delete mode"):
        t.delete_where("id", "<", 5, mode="wat")


def test_mor_delete_keys_gdpr_path(spark, tmp_path):
    """delete_keys(mode="mor"): forget-list tombstoned as DVs — only
    key-containing files get vectors, results match the CoW path, nulls
    survive, and Bloom pruning still bounds the touched set."""
    t = SnapshotTable(spark, str(tmp_path / "gdpr"), bloom_cols=["id"])
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)] + [(None, -1.0)], "id bigint, v double"
    )
    t.overwrite(df.repartition(4))
    forget = [3, 41, 77, 3, 10_000]  # dupes + an absent key
    t.delete_keys("id", forget, mode="mor")
    got = sorted(x["v"] for x in t.read().collect())
    assert got == sorted([-1.0] + [float(i) for i in range(100) if i not in {3, 41, 77}])
    assert any(e.dv for e in t.files())
    # parity with CoW
    t2 = SnapshotTable(spark, str(tmp_path / "gdpr_cow"), bloom_cols=["id"])
    t2.overwrite(df.repartition(4))
    t2.delete_keys("id", forget, mode="cow")
    assert sorted(x["v"] for x in t2.read().collect()) == got


def test_mor_export_iceberg_roundtrip(spark, tmp_path):
    """A MoR table exports its deletion vectors as Iceberg v2 POSITIONAL
    DELETE files — readers of the export never see a deleted row (the
    review-found resurrection bug)."""
    from bears_spark.io.iceberg_log import IcebergTableReader, export_iceberg_metadata

    t = _mk(spark, tmp_path, "iexp", n=100, files=2)
    t.delete_where("id", "<", 30, mode="mor")
    out = str(tmp_path / "iexp_ice")
    export_iceberg_metadata(t, out)
    r = IcebergTableReader(spark, out)
    assert sorted(x["id"] for x in r.read().collect()) == list(range(30, 100))
    assert len(r.delete_files()) == 1


def test_mor_delete_table_root_with_space(spark, tmp_path):
    """_metadata.file_path percent-encodes special characters; the DV joins
    must speak the same encoding or a table root with a space makes MoR
    deletes silently no-op (review finding, verified live)."""
    root = tmp_path / "has space" / "tbl %x"
    t = SnapshotTable(spark, str(root))
    t.overwrite(
        spark.range(0, 40).select(F.col("id"), (F.col("id") * 1.0).alias("v")).repartition(2)
    )
    t.delete_where("id", "<", 15, mode="mor")
    assert any(e.dv and e.dv["cardinality"] > 0 for e in t.files()), (
        "delete produced no tombstones — the match join found nothing"
    )
    assert sorted(x["id"] for x in t.read().collect()) == list(range(15, 40))
    # CoW on top still correct (reads through the DVs)
    t.delete_where("id", ">=", 35, mode="cow")
    assert sorted(x["id"] for x in t.read().collect()) == list(range(15, 35))


def test_delta_dv_table_root_with_space(spark, tmp_path):
    """Delta DV reads under a percent-encodable root apply the vectors."""
    import json as _json

    from bears_spark.io.delta_log import DeltaTableReader
    from bears_spark.io.roaring import serialize_rba, z85_encode

    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path / "delta root with space"
    (root / "_delta_log").mkdir(parents=True)
    pq.write_table(pa.table({"id": pa.array([1, 2, 3], pa.int64())}),
                   str(root / "f0.parquet"))
    data = serialize_rba([1])
    pad = (-len(data)) % 4
    actions = [
        {"protocol": {"minReaderVersion": 3, "readerFeatures": ["deletionVectors"]}},
        {"metaData": {"id": "sp", "format": {"provider": "parquet", "options": {}},
                      "schemaString": _json.dumps({"type": "struct", "fields": [
                          {"name": "id", "type": "long", "nullable": True, "metadata": {}}]}),
                      "partitionColumns": [], "configuration": {}}},
        {"add": {"path": "f0.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "deletionVector": {"storageType": "i",
                                    "pathOrInlineDv": z85_encode(data + b"\x00" * pad),
                                    "sizeInBytes": len(data), "cardinality": 1}}},
    ]
    with open(root / "_delta_log" / f"{0:020d}.json", "w") as f:
        for a in actions:
            f.write(_json.dumps(a) + "\n")
    got = sorted(x["id"] for x in DeltaTableReader(spark, str(root)).read().collect())
    assert got == [1, 3]


def test_streaming_delete_keys_exactly_once(spark, tmp_path):
    """A stream of forget-lists deletes exactly once: DVs land per epoch, a
    replayed availableNow run commits nothing, and an empty-matching batch
    still stamps its epoch (so ITS replay is skipped too)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "forget"
    src.mkdir()
    t = SnapshotTable(spark, str(tmp_path / "sdt"))
    t.overwrite(
        spark.range(0, 50).select(F.col("id"), (F.col("id") * 1.0).alias("v")).repartition(2)
    )
    pq.write_table(pa.table({"id": pa.array([3, 7, 11], pa.int64())}), str(src / "b0.parquet"))
    stream = (
        spark.readStream.schema("id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/")
    )
    ckpt = str(tmp_path / "sdckpt")
    t.streaming_delete_keys(stream, ckpt, col="id").awaitTermination(120)
    assert sorted(x["id"] for x in t.read().collect()) == [
        i for i in range(50) if i not in {3, 7, 11}
    ]
    assert any(e.dv for e in t.files())  # mor default
    # replay: same checkpoint, no new files -> no commits
    before = t.current_version()
    t.streaming_delete_keys(stream, ckpt, col="id").awaitTermination(120)
    assert t.current_version() == before
    # epoch 1: keys that match nothing — still commits exactly one stamped
    # no-op version, and replaying it commits nothing further
    pq.write_table(pa.table({"id": pa.array([900, 901], pa.int64())}), str(src / "b1.parquet"))
    t.streaming_delete_keys(stream, ckpt, col="id").awaitTermination(120)
    after_noop = t.current_version()
    assert after_noop == before + 1
    t.streaming_delete_keys(stream, ckpt, col="id").awaitTermination(120)
    assert t.current_version() == after_noop
    # epoch 2: a second real forget-list merges into the existing DVs
    pq.write_table(pa.table({"id": pa.array([0, 49], pa.int64())}), str(src / "b2.parquet"))
    t.streaming_delete_keys(stream, ckpt, col="id").awaitTermination(120)
    assert sorted(x["id"] for x in t.read().collect()) == [
        i for i in range(1, 49) if i not in {3, 7, 11}
    ]


def test_mor_scan_plan_shape(spark, tmp_path):
    """The DV-applied scan must be an equi-keyed anti-join (hashable keys:
    file path + position) — never a cartesian/broadcast-nested-loop — and
    DV-free tables must keep the plain scan (no join operator at all)."""
    t = _mk(spark, tmp_path, "plan", n=100, files=2)
    plain = t.read()._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plain
    t.delete_where("id", "<", 10, mode="mor")
    plan = t.read()._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan


def test_mor_export_iceberg_delete_file_field_ids(spark, tmp_path):
    """The exported positional delete parquet carries Iceberg's RESERVED
    field ids (file_path=2147483546, pos=2147483545) in its footer, so
    spec-strict external readers resolve the delete columns BY ID (ADVICE
    r8 #3); and each delete-manifest entry's record_count equals ITS file's
    actual row count, not the aggregate across all DVs (ADVICE r8 #4)."""
    import pyarrow.parquet as pq

    from bears_spark.io.avro_generic import read_container
    from bears_spark.io.iceberg_log import IcebergTableReader, export_iceberg_metadata

    t = _mk(spark, tmp_path, "iexp_ids", n=100, files=2)
    t.delete_where("id", "<", 30, mode="mor")
    out = str(tmp_path / "iexp_ids_ice")
    export_iceberg_metadata(t, out)
    r = IcebergTableReader(spark, out)
    dels = r.delete_files()
    assert dels
    for p in dels:
        schema = pq.read_schema(p)
        ids = {f.name: int((f.metadata or {})[b"PARQUET:field_id"]) for f in schema}
        assert ids == {"file_path": 2147483546, "pos": 2147483545}
    # resolve the delete manifest (content=1) through the manifest list —
    # the continuous exporter names manifests by uuid, not position
    import json as _json

    meta = _json.load(open(os.path.join(out, "metadata", "v1.metadata.json")))
    ml = meta["snapshots"][-1]["manifest-list"]
    with open(ml, "rb") as f:
        _, mrecs = read_container(f.read())
    (del_manifest,) = [m["manifest_path"] for m in mrecs if m["content"] == 1]
    with open(del_manifest, "rb") as f:
        _, entries = read_container(f.read())
    assert entries
    for e in entries:
        df = e["data_file"]
        assert df["record_count"] == pq.read_metadata(df["file_path"]).num_rows
    assert sum(e["data_file"]["record_count"] for e in entries) == 30
    # and the export still round-trips
    assert sorted(x["id"] for x in r.read().collect()) == list(range(30, 100))
