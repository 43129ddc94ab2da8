"""Native SnapshotTable schema evolution (rename_column / drop_column) and
its round-trip through BOTH lakehouse exporters (VERDICT r10 "Next round" #3).

Reference parity: bears has no snapshot/lakehouse layer at all (SURVEY.md
§1.2); this mirrors Delta's columnMapping and Iceberg's field-id evolution —
renames/drops are metadata-only commits, data files are never rewritten, and
time travel serves every snapshot under its own column names.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from bears_spark.io.delta_log import DeltaTableReader, export_delta_log
from bears_spark.io.iceberg_log import IcebergTableReader, export_iceberg_metadata
from bears_spark.io.snapshot_table import SnapshotTable


def _mk(spark, tmp_path, name="t"):
    t = SnapshotTable(spark, str(tmp_path / name))
    t.overwrite(spark.range(0, 10).selectExpr("id", "id * 2 AS v"))
    return t


def test_rename_is_metadata_only_and_time_travels(spark, tmp_path):
    t = _mk(spark, tmp_path)
    files_before = sorted(e.path for e in t.files())
    v1 = t.current_version()
    t.rename_column("v", "value")
    assert sorted(e.path for e in t.files()) == files_before  # no data churn
    assert t.read().columns == ["id", "value"]
    assert t.read(version=v1).columns == ["id", "v"]  # old snapshot, old name
    assert t.column_mapping() == [
        {"id": 1, "name": "id", "physical": "id"},
        {"id": 2, "name": "value", "physical": "v"},
    ]
    # appends under the new name land in the SAME physical column
    t.append(spark.range(10, 15).selectExpr("id", "id * 2 AS value"))
    got = {r["id"]: r["value"] for r in t.read().collect()}
    assert got[0] == 0 and got[14] == 28 and len(got) == 15
    # predicate pushdown and file pruning translate logical -> physical
    assert t.read(where=("value", ">=", 20)).count() == 5
    assert len(t.files(where=("value", ">=", 20))) < len(t.files())


def test_rename_refusals(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("v", "value")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("id", "value")
    with pytest.raises(ValueError, match="unknown column"):
        t.rename_column("v", "w")  # old name is gone
    with pytest.raises(ValueError, match="physical name"):
        t.rename_column("id", "v")  # shadows value's physical column
    # a NEW column reusing the renamed-away physical name would silently
    # alias the old column's data — refused at write time
    with pytest.raises(ValueError, match="collides with the physical name"):
        t.append(spark.range(0, 1).selectExpr("id", "id AS value", "id AS v"))
    empty = SnapshotTable(spark, str(tmp_path / "empty"))
    with pytest.raises(Exception, match="empty table|no schema source"):
        empty.rename_column("a", "b")


def test_drop_column_and_restore(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("v", "value")
    pre_drop = t.current_version()
    t.drop_column("value")
    assert t.read().columns == ["id"]
    assert t.read(version=pre_drop).columns == ["id", "value"]
    with pytest.raises(ValueError, match="last column"):
        t.drop_column("id")
    with pytest.raises(ValueError, match="unknown column"):
        t.drop_column("value")
    # RESTORE rolls the mapping back with the file list
    t.restore(pre_drop)
    assert t.read().columns == ["id", "value"]
    assert [c["name"] for c in t.column_mapping()] == ["id", "value"]


def test_mutations_under_mapping(spark, tmp_path):
    """merge / delete_where(mor+cow) / delete_keys / compact all accept
    LOGICAL names after a rename and preserve the mapping."""
    t = _mk(spark, tmp_path)
    t.rename_column("v", "value")
    t.merge(spark.range(3, 6).selectExpr("id", "id * 100 AS value"), key="id")
    got = {r["id"]: r["value"] for r in t.read().collect()}
    assert got[3] == 300 and got[9] == 18
    t.delete_where("value", ">=", 500, mode="mor")
    assert t.read().count() == 9  # id 5 (500) tombstoned
    t.delete_keys("value", [300], mode="cow")
    assert t.read().count() == 8
    t.compact(target_rows_per_file=100)
    assert t.read().columns == ["id", "value"]
    assert t.read().count() == 8
    assert [c["name"] for c in t.column_mapping()] == ["id", "value"]


def test_delta_export_roundtrip_after_rename(spark, tmp_path):
    """rename -> append -> export: the Delta log carries columnMapping
    metadata (mode=name, per-field physicalName), the protocol upgrades
    in place, and DeltaTableReader serves logical names — time travel to
    the pre-rename version serves the OLD name (VERDICT r10 #3)."""
    t = _mk(spark, tmp_path)
    out = str(tmp_path / "delta")
    export_delta_log(t, out)  # pre-rename export: plain 1/2 protocol
    t.rename_column("v", "value")
    t.append(spark.range(10, 15).selectExpr("id", "id * 2 AS value"))
    export_delta_log(t, out)
    r = DeltaTableReader(spark, out)
    assert r.read().columns == ["id", "value"]
    got = {x["id"]: x["value"] for x in r.read().collect()}
    assert got[0] == 0 and got[14] == 28 and len(got) == 15
    # stats-skip under the mapping still prunes and still answers right
    assert r.read(where=("value", ">=", 20)).count() == 5
    # version 0 replays version-0 metaData: old schema, old name
    assert r.read(version=0).columns == ["id", "v"]
    # the upgrade commit carries the legacy columnMapping protocol + config
    log_dir = os.path.join(out, "_delta_log")
    acts = []
    for n in sorted(x for x in os.listdir(log_dir) if x.endswith(".json")):
        with open(os.path.join(log_dir, n)) as f:
            acts += [json.loads(line) for line in f if line.strip()]
    protos = [a["protocol"] for a in acts if "protocol" in a]
    assert protos[-1] == {"minReaderVersion": 2, "minWriterVersion": 5}
    metas = [a["metaData"] for a in acts if "metaData" in a]
    assert metas[-1]["configuration"]["delta.columnMapping.mode"] == "name"
    fields = json.loads(metas[-1]["schemaString"])["fields"]
    by_name = {f["name"]: f["metadata"] for f in fields}
    assert by_name["value"]["delta.columnMapping.physicalName"] == "v"
    assert by_name["value"]["delta.columnMapping.id"] == 2


def test_delta_export_mapping_with_dvs_uses_feature_protocol(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("v", "value")
    t.overwrite(
        spark.range(0, 10).selectExpr("id", "id * 2 AS value").coalesce(1)
    )
    t.delete_where("value", "=", 4, mode="mor")  # partial-file DV survives
    out = str(tmp_path / "delta_dv")
    export_delta_log(t, out)
    r = DeltaTableReader(spark, out)
    assert sorted(x["value"] for x in r.read().collect()) == [
        0, 2, 6, 8, 10, 12, 14, 16, 18
    ]
    with open(os.path.join(out, "_delta_log", "00000000000000000000.json")) as f:
        acts = [json.loads(line) for line in f if line.strip()]
    proto = next(a["protocol"] for a in acts if "protocol" in a)
    assert set(proto["readerFeatures"]) == {"columnMapping", "deletionVectors"}


def test_iceberg_export_roundtrip_after_rename_and_drop(spark, tmp_path):
    """rename -> append -> drop -> export: field ids stay stable across the
    rename (id-based evolution), snapshots stamp their schema-id so time
    travel serves each snapshot's own names, and the cumulative default
    name-mapping keeps unstamped (hard-linked) files projectable by id."""
    t = _mk(spark, tmp_path)
    out = str(tmp_path / "ice")
    export_iceberg_metadata(t, out)
    t.rename_column("v", "value")
    t.append(spark.range(10, 15).selectExpr("id", "id * 2 AS value"))
    export_iceberg_metadata(t, out)
    t.drop_column("value")
    export_iceberg_metadata(t, out)  # zero file churn, schema-only snapshot
    r = IcebergTableReader(spark, out)
    assert r.read().columns == ["id"] and r.read().count() == 15
    assert r.read(snapshot_id=2).columns == ["id", "value"]
    assert r.read(snapshot_id=1).columns == ["id", "v"]
    d2 = {x["id"]: x["value"] for x in r.read(snapshot_id=2).collect()}
    assert d2[0] == 0 and d2[14] == 28 and len(d2) == 15
    assert {x["id"]: x["v"] for x in r.read(snapshot_id=1).collect()}[9] == 18
    meta_dir = os.path.join(out, "metadata")
    vfile = max(
        (n for n in os.listdir(meta_dir) if n.endswith(".metadata.json")),
        key=lambda n: int(n[1:].split(".")[0]),
    )
    meta = json.load(open(os.path.join(meta_dir, vfile)))
    # same field id across the rename; retired id never reused
    schemas = {s["schema-id"]: {f["name"]: f["id"] for f in s["fields"]} for s in meta["schemas"]}
    assert schemas[0]["v"] == 2 and schemas[1]["value"] == 2
    assert "value" not in schemas[2] and "v" not in schemas[2]
    # snapshots carry their schema-id
    assert [(s["snapshot-id"], s["schema-id"]) for s in meta["snapshots"]] == [
        (1, 0), (2, 1), (3, 2)
    ]
    # cumulative name-mapping still maps the dropped physical column
    nm = {m["names"][0]: m["field-id"]
          for m in json.loads(meta["properties"]["schema.name-mapping.default"])}
    assert nm == {"id": 1, "v": 2}
    # a zero-churn re-export under the unchanged schema writes NOTHING
    before = sorted(os.listdir(meta_dir))
    export_iceberg_metadata(t, out)
    assert sorted(os.listdir(meta_dir)) == before


def test_iceberg_export_stats_skip_under_mapping(spark, tmp_path):
    """Manifest bounds are keyed by field id resolved through the PHYSICAL
    stats key, so files(where=) still prunes after a rename."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(0, 10).selectExpr("id", "id * 2 AS v").coalesce(1))
    t.append(spark.range(10, 20).selectExpr("id", "id * 2 AS v").coalesce(1))
    t.rename_column("v", "value")
    out = str(tmp_path / "ice")
    export_iceberg_metadata(t, out)
    r = IcebergTableReader(spark, out)
    kept = r.files(where=("value", ">=", 30))
    assert len(kept) == 1 and len(r.files()) == 2
    assert r.read(where=("value", ">=", 30)).count() == 5


def test_dropped_column_tombstone_semantics(spark, tmp_path):
    """A dropped column stays in the mapping as a tombstone: its field id is
    retired, its physical name reserved (re-adding refuses — name-keyed
    files could not distinguish the generations), and a drop that happens
    BEFORE the first export still lands in the Iceberg name-mapping so old
    snapshots keep projecting it."""
    t = _mk(spark, tmp_path)
    t.append(spark.range(0, 5).selectExpr("id", "id * 2 AS v", "id AS extra"))
    t.drop_column("extra")
    tomb = [c for c in t.column_mapping() if c.get("dropped")]
    assert [c["name"] for c in tomb] == ["extra"]
    # retired physical name refused on re-add (append AND overwrite)
    with pytest.raises(ValueError, match="collides with the physical name"):
        t.append(spark.range(0, 1).selectExpr("id", "id AS v", "id AS extra"))
    # a fresh column gets a NEVER-REUSED id (tombstone ids stay taken)
    t.append(spark.range(0, 1).selectExpr("id", "id AS v", "id AS extra2"))
    ids = {c["name"]: c["id"] for c in t.column_mapping()}
    assert ids["extra2"] == 4 and ids["extra"] == 3
    # drop BEFORE any export: the first export's name-mapping still covers
    # the dropped physical column, so its pre-drop snapshot projects it
    out = str(tmp_path / "ice")
    export_iceberg_metadata(t, out)
    meta_dir = os.path.join(out, "metadata")
    meta = json.load(open(os.path.join(meta_dir, "v1.metadata.json")))
    nm = {m["names"][0]: m["field-id"]
          for m in json.loads(meta["properties"]["schema.name-mapping.default"])}
    assert nm["extra"] == 3
    r = IcebergTableReader(spark, out)
    assert "extra" not in r.read().columns
    assert r.read().count() == 16


def test_bloom_pruning_under_rename(spark, tmp_path):
    """bloom_cols are LOGICAL names: after a rename, point-lookup pruning
    keeps working — blooms fitted on the physical column pre- and
    post-rename both answer probes on the new logical name."""
    t = SnapshotTable(spark, str(tmp_path / "bl"), bloom_cols=["v"])
    t.overwrite(spark.range(0, 50).selectExpr("id", "id * 2 AS v").coalesce(1))
    t.rename_column("v", "value")
    # post-rename appends fit blooms on the physical column under the hood
    t2 = SnapshotTable(spark, str(tmp_path / "bl"), bloom_cols=["value"])
    t2.append(spark.range(50, 100).selectExpr("id", "id * 2 AS value").coalesce(1))
    assert all(e.blooms for e in t2.files())  # every file carries a bloom
    # a point probe on the LOGICAL name prunes to the one matching file
    hit = t2.files(where=("value", "=", 20))
    assert len(hit) == 1 and len(t2.files()) == 2
    assert [r["id"] for r in t2.read(where=("value", "=", 20)).collect()] == [10]
    # absent value: bloom proves absence in both files
    assert t2.files(where=("value", "=", 21)) == []


def test_add_column_typed_null_roundtrip(spark, tmp_path):
    """add_column completes the DDL verb set: metadata-only, reads as a
    typed NULL until data arrives, round-trips both exporters even BEFORE
    any data file carries the column, and refuses bad types, live names and
    retired physical names."""
    t = _mk(spark, tmp_path)
    pre_add = t.current_version()
    t.add_column("note", "string")
    df = t.read()
    assert df.columns == ["id", "v", "note"]
    assert df.schema["note"].dataType.simpleString() == "string"
    assert df.filter(F.col("note").isNull()).count() == 10
    assert t.read(version=pre_add).columns == ["id", "v"]  # time travel
    with pytest.raises(Exception):
        t.add_column("bad", "not_a_type")
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("note", "string")
    t.rename_column("v", "value")
    with pytest.raises(ValueError, match="retired"):
        t.add_column("v", "double")  # physical name of the renamed column
    # exports BEFORE any data for the added column: both replicas null-fill
    d_out, i_out = str(tmp_path / "d"), str(tmp_path / "i")
    export_delta_log(t, d_out)
    export_iceberg_metadata(t, i_out)
    d = DeltaTableReader(spark, d_out).read()
    i = IcebergTableReader(spark, i_out).read()
    assert d.columns == ["id", "value", "note"] and i.columns == d.columns
    assert d.filter(F.col("note").isNull()).count() == 10
    assert i.filter(F.col("note").isNull()).count() == 10
    # data arrives under the added name; all three surfaces serve it
    t.append(
        spark.range(10, 13).selectExpr(
            "id", "id * 2 AS value", "concat('n', id) AS note"
        )
    )
    export_delta_log(t, d_out)
    export_iceberg_metadata(t, i_out)
    for surf in (
        t.read(),
        DeltaTableReader(spark, d_out).read(),
        IcebergTableReader(spark, i_out).read(),
    ):
        assert surf.filter(F.col("note").isNotNull()).count() == 3
        assert surf.count() == 13


def test_ivm_view_on_evolved_base(spark, tmp_path):
    """An incremental view created AFTER a base-table rename resolves its
    logical columns through the mapping; a rename of a view column AFTER
    creation fails the refresh with a named diagnosis, never an unresolved-
    column crash."""
    from bears_spark.io.incremental_view import IncrementalAggView

    base = _mk(spark, tmp_path, "ivm_base")
    base.rename_column("v", "value")
    view = IncrementalAggView(
        spark, base, str(tmp_path / "ivm_view"),
        group_cols=["id"], sum_cols=["value"],
    )
    view.refresh()
    got = {r["id"]: float(r["value_sum"]) for r in view.read().collect()}
    assert got[3] == 6.0 and len(got) == 10
    base.append(spark.range(10, 12).selectExpr("id", "id * 2 AS value"))
    view.refresh()
    assert view.read().count() == 12
    # the base renames a view column away: refresh diagnoses, not crashes
    base.rename_column("value", "amount")
    base.append(spark.range(12, 13).selectExpr("id", "id * 2 AS amount"))
    with pytest.raises(ValueError, match="renamed or dropped"):
        view.refresh()


def test_streaming_append_extends_mapping(spark, tmp_path):
    """A streaming micro-batch with a NEW column joins the mapping (additive
    evolution), matching batch append semantics."""
    t = _mk(spark, tmp_path)
    t.rename_column("v", "value")
    df = spark.range(20, 23).selectExpr("id", "id * 2 AS value", "id AS extra")
    new = t._write_files(df)
    from bears_spark.io.snapshot_table import FileEntry

    t._commit(
        "stream-append",
        lambda m: [FileEntry(**e) for e in m["files"]] + new,
        txn=("app", 0),
        build_columns=lambda m: t._extend_mapping(m["columns"], list(df.columns)),
    )
    assert t.read().columns == ["id", "value", "extra"]
    assert [c["id"] for c in t.column_mapping()] == [1, 2, 3]


def test_change_feed_aligns_by_field_identity_across_rename(spark, tmp_path):
    """CDC across a rename compares values by FIELD identity, served under
    the to-version's names: a rename alone marks nothing changed, a real
    value change under the renamed column is still detected, and a renamed
    KEY column still joins (was an UNRESOLVED_COLUMN crash)."""
    t = _mk(spark, tmp_path)  # v1: id, v = id*2
    t.rename_column("v", "val")  # v2: metadata only
    assert {r["id"] for r in t.change_feed("id", 1, 2).collect()} == set()
    t.merge(
        spark.createDataFrame([(3, 999), (100, 1)], "id long, val long"), key="id"
    )  # v3: one changed, one added
    feed = {r["id"]: r["change_type"] for r in t.change_feed("id", 1, 3).collect()}
    assert feed == {3: "changed", 100: "added"}

    t.rename_column("id", "ident")  # v4: the KEY itself renamed
    feed = {r["ident"]: r["change_type"] for r in t.change_feed("ident", 1, 4).collect()}
    assert feed == {3: "changed", 100: "added"}


def test_change_feed_ddl_is_not_a_row_change(spark, tmp_path):
    """Columns added or dropped between the versions are excluded from the
    value comparison (Delta CDF's behavior across schema change), and a key
    that did not exist at from_version is refused with a clear error."""
    t = SnapshotTable(spark, str(tmp_path / "ddl"))
    t.overwrite(spark.range(0, 5).selectExpr("id", "id AS a", "id AS b"))
    t.drop_column("b")
    t.add_column("c", "long")
    assert t.change_feed("id", 1).count() == 0
    with pytest.raises(ValueError, match="did not exist at version 1"):
        t.change_feed("c", 1)
