"""Type widening on the snapshot table (Iceberg type promotion / Delta type
widening — reference parity: bears has no table layer, SURVEY.md §1.2).

Semantics under test: alter_column_type is METADATA-ONLY (no file rewritten;
at 100 TB a rewrite-based type change is a full-corpus job); scans read every
file through an explicit widened schema (Spark 4's parquet readers upcast
int32->int64 etc. natively — mergeSchema cannot reconcile mixed widths);
every write path keeps working on the mixed-width file set; time travel
serves each snapshot's own types; the Iceberg export evolves by field-id
promotion (legal in the spec) while the Delta export refuses until a full
rewrite (most external Delta readers lack the typeWidening feature).
"""

import pytest
from pyspark.sql import functions as F

from bears_spark.io.delta_log import DeltaLogError, DeltaTableReader, export_delta_log
from bears_spark.io.iceberg_log import IcebergTableReader, export_iceberg_metadata
from bears_spark.io.snapshot_table import ConstraintViolationError, SnapshotTable


def _mk(spark, tmp_path, name="t"):
    t = SnapshotTable(spark, str(tmp_path / name))
    t.overwrite(
        spark.createDataFrame([(1, 10), (2, 20)], "id int, v int").coalesce(1)
    )
    return t


def test_widen_is_metadata_only_and_time_travels(spark, tmp_path):
    t = _mk(spark, tmp_path)
    files_before = sorted(e.path for e in t.files())
    v1 = t.current_version()
    t.alter_column_type("v", "bigint")
    assert sorted(e.path for e in t.files()) == files_before  # zero bytes moved
    assert t.read().schema["v"].dataType.simpleString() == "bigint"
    assert t.read(v1).schema["v"].dataType.simpleString() == "int"  # old snapshot, old type
    # values beyond int32 now fit
    t.append(spark.createDataFrame([(3, 2**40)], "id int, v long").coalesce(1))
    assert sorted((r["id"], r["v"]) for r in t.read().collect()) == [
        (1, 10), (2, 20), (3, 2**40),
    ]


def test_widen_refusals(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="widening"):
        t.alter_column_type("v", "string")
    t.alter_column_type("v", "bigint")
    with pytest.raises(ValueError, match="widening"):
        t.alter_column_type("v", "int")  # narrowing
    with pytest.raises(ValueError, match="unknown column"):
        t.alter_column_type("nope", "bigint")
    empty = SnapshotTable(spark, str(tmp_path / "empty"))
    with pytest.raises(ValueError):
        empty.alter_column_type("v", "bigint")
    # decimal: precision may grow, scale may not change
    td = SnapshotTable(spark, str(tmp_path / "dec"))
    td.overwrite(
        spark.sql("SELECT CAST(1.50 AS DECIMAL(10,2)) AS d").coalesce(1)
    )
    td.alter_column_type("d", "decimal(20,2)")
    assert td.read().schema["d"].dataType.simpleString() == "decimal(20,2)"
    with pytest.raises(ValueError, match="widening"):
        td.alter_column_type("d", "decimal(25,4)")


def test_every_write_path_survives_mixed_widths(spark, tmp_path):
    """merge / MoR delete / CoW delete / compact all scan through the
    explicit widened schema — none can hit mergeSchema's mixed-width error,
    and compact MATERIALIZES the widen into the rewritten files."""
    t = _mk(spark, tmp_path)
    t.alter_column_type("v", "bigint")
    t.merge(
        spark.createDataFrame([(2, 2**41), (4, 40)], "id int, v long").coalesce(1),
        key="id",
    )
    t.delete_keys("id", [1], mode="mor")
    t.delete_where("v", "<", 0, mode="cow")
    t.compact()
    assert sorted((r["id"], r["v"]) for r in t.read().collect()) == [
        (2, 2**41), (4, 40),
    ]
    # post-compact every live file physically carries the widened type
    assert all(e.types.get("v") == "bigint" for e in t.files())


def test_widen_composes_with_rename_and_add(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("v", "val")
    t.alter_column_type("val", "bigint")  # physical name 'v', widened
    t.append(spark.createDataFrame([(3, 2**40)], "id int, val long").coalesce(1))
    # a NEW column after the widen records its type (explicit-schema reads
    # need the full projection typed)
    t.append(
        spark.createDataFrame([(4, 1, "x")], "id int, val long, tag string").coalesce(1)
    )
    df = t.read()
    assert df.schema.simpleString() == "struct<id:int,val:bigint,tag:string>"
    assert df.count() == 4
    # float chain on the same table
    t.add_column("f", "float")
    t.alter_column_type("f", "double")
    assert t.read().schema["f"].dataType.simpleString() == "double"


def test_constraints_enforced_through_widened_reads(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.add_check_constraint("v_nonneg", "v >= 0")
    t.alter_column_type("v", "bigint")
    with pytest.raises(ConstraintViolationError):
        t.append(spark.createDataFrame([(9, -(2**40))], "id int, v long").coalesce(1))
    assert t.read().count() == 2


def test_iceberg_export_promotes_by_field_id(spark, tmp_path):
    t = _mk(spark, tmp_path)
    out = str(tmp_path / "ice")
    export_iceberg_metadata(t, out)
    pre_schema = IcebergTableReader(spark, out).meta["schemas"]
    pre_ids = {
        f["name"]: f["id"] for s in pre_schema for f in s["fields"]
    }
    t.alter_column_type("v", "bigint")
    t.append(spark.createDataFrame([(3, 2**40)], "id int, v long").coalesce(1))
    export_iceberg_metadata(t, out)
    r = IcebergTableReader(spark, out)
    df = r.read()
    assert df.schema["v"].dataType.simpleString() == "bigint"
    assert sorted((x["id"], x["v"]) for x in df.collect()) == [
        (1, 10), (2, 20), (3, 2**40),
    ]
    # promotion, not drop+add: the field id is stable across the widen
    cur = max(r.meta["schemas"], key=lambda s: s["schema-id"])
    by_name = {f["name"]: f for f in cur["fields"]}
    assert by_name["v"]["id"] == pre_ids["v"]
    assert by_name["v"]["type"] == "long"
    # snapshot time travel serves the narrow pre-widen schema
    old = r.read(snapshot_id=1)
    assert old.schema["v"].dataType.simpleString() == "int"
    assert old.count() == 2


def test_delta_export_refuses_until_rewritten(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.alter_column_type("v", "bigint")
    t.append(spark.createDataFrame([(3, 2**40)], "id int, v long").coalesce(1))
    out = str(tmp_path / "delta")
    with pytest.raises(DeltaLogError, match="widened"):
        export_delta_log(t, out)
    t.overwrite(t.read())  # full rewrite materializes the widened type
    export_delta_log(t, out)
    df = DeltaTableReader(spark, out).read()
    assert df.schema["v"].dataType.simpleString() == "bigint"
    assert sorted((x["id"], x["v"]) for x in df.collect()) == [
        (1, 10), (2, 20), (3, 2**40),
    ]


def test_pruning_stats_stay_correct_across_widen(spark, tmp_path):
    """File-skipping on the widened column keeps working: old files' int
    stats compare correctly against long probe values."""
    t = _mk(spark, tmp_path)
    t.alter_column_type("v", "bigint")
    t.append(spark.createDataFrame([(3, 2**40)], "id int, v long").coalesce(1))
    wide = t.files(where=("v", ">", 2**35))
    assert len(wide) == 1  # only the wide file survives pruning
    got = t.read(where=("v", ">", 2**35))
    assert [r["id"] for r in got.collect()] == [3]
    narrow = t.read(where=("v", "<=", 20))
    assert sorted(r["id"] for r in narrow.collect()) == [1, 2]


def test_bloom_point_lookup_sound_across_widen(spark, tmp_path):
    """Per-file Blooms hash the CAST-TO-STRING rendering, so int 41 and
    bigint 41 light the same positions — a widen can never make a bloom
    falsely prune a pre-widen file, and pruning still bites."""
    t = SnapshotTable(spark, str(tmp_path / "t"), bloom_cols=["v"])
    t.overwrite(spark.createDataFrame([(1, 41), (2, 52)], "id int, v int").coalesce(1))
    t.alter_column_type("v", "bigint")
    t.append(spark.createDataFrame([(3, 2**40)], "id int, v long").coalesce(1))
    # pre-widen file still matches its own value through the bloom...
    assert [r["id"] for r in t.read(where=("v", "=", 41)).collect()] == [1]
    # ...and a miss-everywhere probe prunes every file
    assert t.files(where=("v", "=", 43)) == []
    assert [r["id"] for r in t.read(where=("v", "=", 2**40)).collect()] == [3]


def test_incremental_view_refreshes_over_widened_base(spark, tmp_path):
    """IVM legs scan base files directly — a widened base's mixed-width file
    set must read through the explicit schema, and the refreshed rollup must
    carry the beyond-int32 values exactly."""
    from bears_spark.io.incremental_view import IncrementalAggView

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.overwrite(
        spark.createDataFrame(
            [(1, 10), (1, 20), (2, 30)], "g int, v int"
        ).coalesce(1)
    )
    view = IncrementalAggView(
        spark, t, str(tmp_path / "view"), group_cols=["g"], sum_cols=["v"]
    )
    view.refresh()
    t.alter_column_type("v", "bigint")
    t.append(spark.createDataFrame([(2, 2**40)], "g int, v long").coalesce(1))
    view.refresh()
    got = {r["g"]: r["v_sum"] for r in view.read().collect()}
    assert got == {1: 30, 2: 30 + 2**40}, got
