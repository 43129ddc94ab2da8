"""Apache Iceberg metadata-tree reader (bears_spark/io/iceberg_log.py):
hand-crafted spec-shaped tables — snapshot planning through manifest-list
and manifest Avro, deleted-entry exclusion, snapshot time travel, relocated
tables, and the honest v2 delete-file gate."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bears_spark.io.avro_generic import read_container, write_container
from bears_spark.io.iceberg_log import IcebergLogError, IcebergTableReader

_MANIFEST_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {
                        "name": "column_sizes",
                        "type": ["null", {"type": "map", "values": "long"}],
                    },
                ],
            },
        },
    ],
}

_MLIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "content", "type": "int"},
        {"name": "added_snapshot_id", "type": ["null", "long"]},
    ],
}


def _data_file(root, name, ids, langs):
    p = os.path.join(root, "data", name)
    pq.write_table(
        pa.table({"id": pa.array(ids, pa.int64()), "lang": pa.array(langs, pa.string())}), p
    )
    return p


def _manifest(root, name, entries):
    p = os.path.join(root, "metadata", name)
    recs = [
        {
            "status": st,
            "data_file": {
                "content": content,
                "file_path": fp,
                "file_format": "PARQUET",
                "record_count": 1,
                "column_sizes": None,
            },
        }
        for st, content, fp in entries
    ]
    open(p, "wb").write(write_container(_MANIFEST_SCHEMA, recs))
    return p


def _manifest_list(root, name, manifests, content=0):
    p = os.path.join(root, "metadata", name)
    recs = [
        {"manifest_path": m, "manifest_length": 1, "content": content,
         "added_snapshot_id": 1}
        for m in manifests
    ]
    open(p, "wb").write(write_container(_MLIST_SCHEMA, recs))
    return p


def _metadata(root, snapshots, current, version=1):
    meta = {
        "format-version": 2,
        "table-uuid": "u",
        "location": root,
        "current-snapshot-id": current,
        "snapshots": snapshots,
        "schemas": [
            {
                "schema-id": 0,
                "type": "struct",
                "fields": [
                    {"id": 1, "name": "id", "required": False, "type": "long"},
                    {"id": 2, "name": "lang", "required": False, "type": "string"},
                ],
            }
        ],
        "current-schema-id": 0,
    }
    with open(os.path.join(root, "metadata", f"v{version}.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as f:
        f.write(str(version))


def _mk_table(tmp_path, name="ice"):
    root = str(tmp_path / name)
    os.makedirs(os.path.join(root, "metadata"))
    os.makedirs(os.path.join(root, "data"))
    return root


def test_iceberg_read_snapshots_and_deleted_entries(spark, tmp_path):
    root = _mk_table(tmp_path)
    f1 = _data_file(root, "f1.parquet", [1, 2], ["en", "de"])
    f2 = _data_file(root, "f2.parquet", [3], ["fr"])
    f3 = _data_file(root, "f3.parquet", [4], ["es"])
    # snapshot 1: f1 + f2 live
    m1 = _manifest(root, "m1.avro", [(1, 0, f1), (1, 0, f2)])
    ml1 = _manifest_list(root, "ml1.avro", [m1])
    # snapshot 2: f2 DELETED, f3 added
    m2 = _manifest(root, "m2.avro", [(0, 0, f1), (2, 0, f2), (1, 0, f3)])
    ml2 = _manifest_list(root, "ml2.avro", [m2])
    snaps = [
        {"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": ml1},
        {"snapshot-id": 2, "timestamp-ms": 2, "manifest-list": ml2},
    ]
    _metadata(root, snaps, current=2)

    r = IcebergTableReader(spark, root)
    assert sorted(x["id"] for x in r.read().collect()) == [1, 2, 4]
    # time travel to snapshot 1
    assert sorted(x["id"] for x in r.read(snapshot_id=1).collect()) == [1, 2, 3]
    assert len(r.files()) == 2 and len(r.files(snapshot_id=1)) == 2


def test_iceberg_relocated_table_paths(spark, tmp_path):
    """Manifests recorded under an old absolute location still resolve when
    the table directory was moved (suffix re-rooting)."""
    root = _mk_table(tmp_path, "moved")
    f1 = _data_file(root, "f1.parquet", [7], ["en"])
    fake = "/nonexistent/old/location/data/f1.parquet"
    m1 = _manifest(root, "m1.avro", [(1, 0, fake.replace("/nonexistent/old/location", root))])
    # record the manifest-list path under the OLD location too
    m1_fake = m1.replace(root, "/nonexistent/old/location")
    ml1 = _manifest_list(root, "ml1.avro", [m1_fake])
    _metadata(root, [{"snapshot-id": 1, "timestamp-ms": 1,
                      "manifest-list": ml1.replace(root, "/nonexistent/old/location")}], current=1)
    out = IcebergTableReader(spark, root).read().collect()
    assert [x["id"] for x in out] == [7]


def _position_delete_file(root, name, pairs):
    """Spec-shaped positional delete parquet: (file_path, pos) rows."""
    p = os.path.join(root, "data", name)
    pq.write_table(
        pa.table({
            "file_path": pa.array([fp for fp, _ in pairs], pa.string()),
            "pos": pa.array([pos for _, pos in pairs], pa.int64()),
        }),
        p,
    )
    return p


_MANIFEST_V2_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "sequence_number", "type": ["null", "long"]},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2v2",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "equality_ids",
                     "type": ["null", {"type": "array", "items": "int"}]},
                ],
            },
        },
    ],
}


def _manifest_v2(root, name, entries):
    """entries: (status, content, file_path, seq_or_None, equality_ids_or_None)."""
    p = os.path.join(root, "metadata", name)
    recs = [
        {
            "status": st,
            "sequence_number": seq,
            "data_file": {
                "content": content,
                "file_path": fp,
                "file_format": "PARQUET",
                "record_count": 1,
                "equality_ids": list(eq) if eq else None,
            },
        }
        for st, content, fp, seq, eq in entries
    ]
    open(p, "wb").write(write_container(_MANIFEST_V2_SCHEMA, recs))
    return p


def _equality_delete_file(root, name, langs):
    p = os.path.join(root, "data", name)
    pq.write_table(pa.table({"lang": pa.array(langs, pa.string())}), p)
    return p


def test_iceberg_equality_delete_gates(spark, tmp_path):
    """An equality delete without equality_ids is refused (can't know the
    key); a DATA file inside a delete manifest is refused as corrupt."""
    root = _mk_table(tmp_path, "delgate")
    f1 = _data_file(root, "f1.parquet", [1], ["en"])
    d1 = _equality_delete_file(root, "eq1.parquet", ["en"])
    md = _manifest(root, "md.avro", [(1, 2, d1)])  # content=2, no equality_ids
    m1 = _manifest(root, "m1.avro", [(1, 0, f1)])
    ml1 = _manifest_list_mixed(root, "ml1.avro", [(m1, 0), (md, 1)])
    _metadata(root, [{"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": ml1}], current=1)
    with pytest.raises(IcebergLogError, match="equality_ids"):
        IcebergTableReader(spark, root).read()

    root2 = _mk_table(tmp_path, "delgate2")
    f2 = _data_file(root2, "f1.parquet", [1], ["en"])
    bad = _manifest(root2, "mbad.avro", [(1, 0, f2)])  # DATA content in delete manifest
    ml2 = _manifest_list(root2, "ml.avro", [bad], content=1)
    _metadata(root2, [{"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": ml2}], current=1)
    with pytest.raises(IcebergLogError, match="data file in a delete manifest"):
        IcebergTableReader(spark, root2).read()


def test_iceberg_equality_deletes_sequence_gated(spark, tmp_path):
    """Equality deletes apply only to data files whose sequence number is
    STRICTLY below the delete file's (the v2 rule): 'en' rows vanish from
    the seq-1 file but survive in the seq-3 file; a positional delete
    composes on top; unknown equality field ids refuse."""
    root = _mk_table(tmp_path, "eqdel")
    f1 = _data_file(root, "f1.parquet", [1, 2, 3], ["en", "de", "fr"])  # seq 1
    f2 = _data_file(root, "f2.parquet", [4, 5], ["en", "en"])  # seq 3
    eq = _equality_delete_file(root, "eq.parquet", ["en"])  # seq 2, key = lang (id 2)
    posd = _position_delete_file(root, "pos.parquet", [(f2, 1)])  # id 5
    m1 = _manifest_v2(root, "m1.avro", [(1, 0, f1, 1, None), (1, 0, f2, 3, None)])
    md = _manifest_v2(root, "md.avro", [(1, 2, eq, 2, [2]), (1, 1, posd, 3, None)])
    ml = _manifest_list_mixed(root, "ml.avro", [(m1, 0), (md, 1)])
    _metadata(root, [{"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": ml}], current=1)
    r = IcebergTableReader(spark, root)
    # id 1 ('en', seq 1 < 2) and id 5 (positional) removed; id 4 ('en', seq 3) kept
    assert sorted(x["id"] for x in r.read().collect()) == [2, 3, 4]
    assert r.read().columns == ["id", "lang"]
    assert len(r.equality_delete_files()) == 1 and len(r.delete_files()) == 1

    # unknown field id refuses
    root2 = _mk_table(tmp_path, "eqdel2")
    g1 = _data_file(root2, "f1.parquet", [1], ["en"])
    geq = _equality_delete_file(root2, "eq.parquet", ["en"])
    m1b = _manifest_v2(root2, "m1.avro", [(1, 0, g1, 1, None)])
    mdb = _manifest_v2(root2, "md.avro", [(1, 2, geq, 2, [99])])
    mlb = _manifest_list_mixed(root2, "ml.avro", [(m1b, 0), (mdb, 1)])
    _metadata(root2, [{"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": mlb}], current=1)
    with pytest.raises(IcebergLogError, match="unknown field ids"):
        IcebergTableReader(spark, root2).read().collect()


def test_iceberg_bounds_pruning_kv_encoding(spark, tmp_path):
    """where-pruning decodes manifest lower/upper bounds in the
    array-of-{key,value} Avro encoding (what real writers emit for the
    logical map<int,binary>); missing bounds keep the file conservatively;
    the residual predicate keeps results exact either way."""
    import struct

    root = _mk_table(tmp_path, "bounds")
    f1 = _data_file(root, "f1.parquet", [1, 2, 3], ["en", "de", "fr"])
    f2 = _data_file(root, "f2.parquet", [10, 11], ["en", "en"])
    f3 = _data_file(root, "f3.parquet", [20, 21], ["es", "es"])  # no bounds
    schema = {
        "type": "record", "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "data_file", "type": {
                "type": "record", "name": "r2b",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "lower_bounds", "type": ["null", {
                        "type": "array", "items": {
                            "type": "record", "name": "kv1",
                            "fields": [{"name": "key", "type": "int"},
                                       {"name": "value", "type": "bytes"}]}}]},
                    {"name": "upper_bounds", "type": ["null", {
                        "type": "array", "items": {
                            "type": "record", "name": "kv2",
                            "fields": [{"name": "key", "type": "int"},
                                       {"name": "value", "type": "bytes"}]}}]},
                ],
            }},
        ],
    }

    def entry(fp, lo, hi):
        bounds = lambda v: [{"key": 1, "value": struct.pack("<q", v)}] if v is not None else None
        return {"status": 1, "data_file": {
            "content": 0, "file_path": fp, "file_format": "PARQUET",
            "record_count": 1, "lower_bounds": bounds(lo), "upper_bounds": bounds(hi)}}

    mpath = os.path.join(root, "metadata", "m1.avro")
    open(mpath, "wb").write(write_container(schema, [
        entry(f1, 1, 3), entry(f2, 10, 11), entry(f3, None, None)]))
    ml = _manifest_list(root, "ml.avro", [mpath])
    _metadata(root, [{"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": ml}], current=1)
    r = IcebergTableReader(spark, root)
    # id >= 10 prunes f1, keeps f2 and (conservatively) boundless f3
    assert len(r.files(where=("id", ">=", 10))) == 2
    assert len(r.files(where=("id", "=", 2))) == 2  # f1 + boundless f3
    assert len(r.files(where=("id", "<", 0))) == 1  # only boundless f3 survives
    assert sorted(x["id"] for x in r.read(where=("id", ">=", 10)).collect()) == [10, 11, 20, 21]
    assert sorted(x["id"] for x in r.read(where=("id", "=", 2)).collect()) == [2]
    # unknown column: conservative (no pruning), result still exact
    assert len(r.files(where=("nope", "=", 1))) == 3


def test_iceberg_equality_delete_null_key_matches_null(spark, tmp_path):
    """Iceberg equality semantics: a null key in the delete file removes
    null-keyed data rows (eqNullSafe, not SQL =)."""
    root = _mk_table(tmp_path, "eqnull")
    p = os.path.join(root, "data", "f1.parquet")
    pq.write_table(
        pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                  "lang": pa.array(["en", None, "fr"], pa.string())}), p
    )
    eq = os.path.join(root, "data", "eq.parquet")
    pq.write_table(pa.table({"lang": pa.array([None], pa.string())}), eq)
    m1 = _manifest_v2(root, "m1.avro", [(1, 0, p, 1, None)])
    md = _manifest_v2(root, "md.avro", [(1, 2, eq, 2, [2])])
    ml = _manifest_list_mixed(root, "ml.avro", [(m1, 0), (md, 1)])
    _metadata(root, [{"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": ml}], current=1)
    out = sorted(x["id"] for x in IcebergTableReader(spark, root).read().collect())
    assert out == [1, 3]


def _manifest_list_mixed(root, name, manifests_with_content):
    p = os.path.join(root, "metadata", name)
    recs = [
        {"manifest_path": m, "manifest_length": 1, "content": c, "added_snapshot_id": 1}
        for m, c in manifests_with_content
    ]
    open(p, "wb").write(write_container(_MLIST_SCHEMA, recs))
    return p


def test_iceberg_positional_deletes_applied(spark, tmp_path):
    """Iceberg v2 merge-on-read: positional delete files are applied as a
    (file, pos) anti-join — per-file positions, multi-file delete sets,
    deletes against one file leaving its siblings intact, and files()
    still listing the data files."""
    root = _mk_table(tmp_path, "posdel")
    f1 = _data_file(root, "f1.parquet", [10, 11, 12, 13], ["en", "de", "fr", "es"])
    f2 = _data_file(root, "f2.parquet", [20, 21, 22], ["en", "en", "de"])
    # delete positions 0 and 2 of f1 (ids 10, 12) and position 1 of f2 (21)
    d1 = _position_delete_file(root, "del1.parquet", [(f1, 0), (f1, 2)])
    d2 = _position_delete_file(root, "del2.parquet", [(f2, 1)])
    m1 = _manifest(root, "m1.avro", [(1, 0, f1), (1, 0, f2)])
    md = _manifest(root, "md.avro", [(1, 1, d1), (1, 1, d2)])
    ml = _manifest_list_mixed(root, "ml.avro", [(m1, 0), (md, 1)])
    _metadata(root, [{"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": ml}], current=1)

    r = IcebergTableReader(spark, root)
    assert sorted(x["id"] for x in r.read().collect()) == [11, 13, 20, 22]
    assert len(r.files()) == 2 and len(r.delete_files()) == 2
    # the helper _metadata columns must not leak into the result schema
    assert r.read().columns == ["id", "lang"]


def test_iceberg_positional_deletes_with_file_uri_forms(spark, tmp_path):
    """Delete files recorded with file:// URI forms still match Spark's
    _metadata.file_path (normalization), and a moved table re-roots the
    delete set through the recorded->localized mapping."""
    root = _mk_table(tmp_path, "posdeluri")
    f1 = _data_file(root, "f1.parquet", [1, 2, 3], ["en", "de", "fr"])
    # delete pos 1 of f1, recorded as a file: URI
    d1 = _position_delete_file(root, "del1.parquet", [("file://" + f1, 1)])
    m1 = _manifest(root, "m1.avro", [(1, 0, "file://" + f1)])
    md = _manifest(root, "md.avro", [(1, 1, d1)])
    ml = _manifest_list_mixed(root, "ml.avro", [(m1, 0), (md, 1)])
    _metadata(root, [{"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": ml}], current=1)
    out = sorted(x["id"] for x in IcebergTableReader(spark, root).read().collect())
    assert out == [1, 3]


def test_iceberg_changes_since_applies_target_deletes(spark, tmp_path):
    """changes_since returns only live rows of the new files: positional
    deletes at the target snapshot are applied to the incremental scan."""
    root = _mk_table(tmp_path, "incdel")
    f1 = _data_file(root, "f1.parquet", [1, 2], ["en", "de"])
    f2 = _data_file(root, "f2.parquet", [3, 4, 5], ["fr", "es", "it"])
    d2 = _position_delete_file(root, "del2.parquet", [(f2, 1)])  # id 4 gone
    m1 = _manifest(root, "m1.avro", [(1, 0, f1)])
    ml1 = _manifest_list(root, "ml1.avro", [m1])
    m2 = _manifest(root, "m2.avro", [(0, 0, f1), (1, 0, f2)])
    md2 = _manifest(root, "md2.avro", [(1, 1, d2)])
    ml2 = _manifest_list_mixed(root, "ml2.avro", [(m2, 0), (md2, 1)])
    _metadata(root, [
        {"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": ml1},
        {"snapshot-id": 2, "timestamp-ms": 2, "manifest-list": ml2},
    ], current=2)
    r = IcebergTableReader(spark, root)
    assert sorted(x["id"] for x in r.changes_since(1).collect()) == [3, 5]
    assert sorted(x["id"] for x in r.read().collect()) == [1, 2, 3, 5]


def test_export_snapshot_table_as_iceberg(spark, tmp_path):
    """export_iceberg_metadata -> IcebergTableReader roundtrip: same rows,
    schema carried through the Iceberg type map, multi-commit snapshot
    flattened to one live manifest."""
    from pyspark.sql import functions as F

    from bears_spark.io.iceberg_log import export_iceberg_metadata
    from bears_spark.io.snapshot_table import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "st"))
    df = spark.range(0, 50).select(
        "id", (F.col("id") % 7).alias("bucket"), (F.col("id") * 1.5).alias("v")
    )
    t.overwrite(df.filter("id < 30").coalesce(1))
    t.append(df.filter("id >= 30").coalesce(1))
    t.delete_where("bucket", "=", 3)
    out = export_iceberg_metadata(t, str(tmp_path / "ice"))
    back = IcebergTableReader(spark, out)
    assert sorted(r["id"] for r in back.read().collect()) == sorted(
        r["id"] for r in t.read().collect()
    )
    assert back.read().columns == ["id", "bucket", "v"]
    assert back._spark_schema().simpleString() == "struct<id:bigint,bucket:bigint,v:double>"
    # exported bounds power stats-based file skipping: the id<30 file is
    # provably excluded for id>=30 probes, and the pruned read stays exact
    assert len(back.files(where=("id", ">=", 30))) < len(back.files())
    assert sorted(r["id"] for r in back.read(where=("id", ">=", 30)).collect()) == sorted(
        r["id"] for r in t.read(where=("id", ">=", 30)).collect()
    )
    # unsupported type refuses instead of writing a lying schema
    t2 = SnapshotTable(spark, str(tmp_path / "st2"))
    t2.overwrite(
        spark.range(1).select(F.col("id").cast("decimal(10,2)").alias("d")).coalesce(1)
    )
    with pytest.raises(IcebergLogError, match="unsupported Spark type"):
        export_iceberg_metadata(t2, str(tmp_path / "ice2"))


def test_avro_generic_deflate_and_nested_roundtrip():
    import zlib

    schema = _MANIFEST_SCHEMA
    recs = [
        {"status": 1, "data_file": {"content": 0, "file_path": "x", "file_format": "PARQUET",
                                    "record_count": 5, "column_sizes": {"a": 1, "b": 2}}},
    ]
    data = write_container(schema, recs)
    _, back = read_container(data)
    assert back == recs
    # deflate codec: recompress the block by hand and verify decode
    # (write_container emits null codec; craft a deflate container)
    import io as _io
    from bears_spark.io.avro_generic import _encode, _write_zlong

    out = _io.BytesIO()
    out.write(b"Obj\x01")
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": b"deflate"}
    _encode(out, {"type": "map", "values": "bytes"}, meta, {})
    sync = b"\x00" * 8 + b"bearsync"
    out.write(sync)
    body = _io.BytesIO()
    for r in recs:
        _encode(body, schema, r, {})
    comp = zlib.compress(body.getvalue())[2:-4]  # raw deflate (wbits=-15)
    _write_zlong(out, len(recs))
    _write_zlong(out, len(comp))
    out.write(comp)
    out.write(sync)
    _, back2 = read_container(out.getvalue())
    assert back2 == recs


def test_iceberg_snapshot_as_of_timestamp(spark, tmp_path):
    root = _mk_table(tmp_path, "asof")
    f1 = _data_file(root, "f1.parquet", [1], ["en"])
    f2 = _data_file(root, "f2.parquet", [2], ["de"])
    m1 = _manifest(root, "m1.avro", [(1, 0, f1)])
    ml1 = _manifest_list(root, "ml1.avro", [m1])
    m2 = _manifest(root, "m2.avro", [(0, 0, f1), (1, 0, f2)])
    ml2 = _manifest_list(root, "ml2.avro", [m2])
    _metadata(root, [
        {"snapshot-id": 10, "timestamp-ms": 1000, "manifest-list": ml1},
        {"snapshot-id": 20, "timestamp-ms": 2000, "manifest-list": ml2},
    ], current=20)
    r = IcebergTableReader(spark, root)
    assert r.snapshot_as_of(1500) == 10
    assert r.snapshot_as_of(2000) == 20
    assert sorted(x["id"] for x in r.read(r.snapshot_as_of(1500)).collect()) == [1]
    with pytest.raises(IcebergLogError, match="no snapshot"):
        r.snapshot_as_of(500)


def test_iceberg_changes_since(spark, tmp_path):
    root = _mk_table(tmp_path, "inc")
    f1 = _data_file(root, "f1.parquet", [1, 2], ["en", "de"])
    f2 = _data_file(root, "f2.parquet", [3], ["fr"])
    m1 = _manifest(root, "m1.avro", [(1, 0, f1)])
    ml1 = _manifest_list(root, "ml1.avro", [m1])
    m2 = _manifest(root, "m2.avro", [(0, 0, f1), (1, 0, f2)])
    ml2 = _manifest_list(root, "ml2.avro", [m2])
    _metadata(root, [
        {"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": ml1},
        {"snapshot-id": 2, "timestamp-ms": 2, "manifest-list": ml2},
    ], current=2)
    r = IcebergTableReader(spark, root)
    delta = r.changes_since(1)
    assert sorted(x["id"] for x in delta.collect()) == [3]
    assert r.changes_since(2).count() == 0  # already at head


# -- round-8 hardening: FS seam, field-id projection, relative roots ---------


def test_iceberg_metadata_in_commit_store(spark, tmp_path):
    """An Iceberg metadata tree resident in an object store (stub transport)
    reads end to end: version-hint, metadata.json, manifest-list and
    manifest Avro all come from the CommitStore seam; data files stay
    Spark-readable absolute paths."""
    from bears_spark.io.commit_store import InMemoryCommitStore

    store = InMemoryCommitStore()
    data_dir = tmp_path / "icedata"
    data_dir.mkdir()
    f1 = str(data_dir / "f1.parquet")
    pq.write_table(
        pa.table({"id": pa.array([1, 2], pa.int64()),
                  "lang": pa.array(["en", "de"], pa.string())}), f1
    )
    tbl = "s3://bucket/warehouse/ice"
    m1 = f"{tbl}/metadata/m1.avro"
    store.replace(m1, write_container(_MANIFEST_SCHEMA, [
        {"status": 1, "data_file": {"content": 0, "file_path": f1,
                                    "file_format": "PARQUET", "record_count": 2,
                                    "column_sizes": None}},
    ]))
    ml1 = f"{tbl}/metadata/ml1.avro"
    store.replace(ml1, write_container(_MLIST_SCHEMA, [
        {"manifest_path": m1, "manifest_length": 1, "content": 0,
         "added_snapshot_id": 1},
    ]))
    meta = {
        "format-version": 2, "table-uuid": "u", "location": tbl,
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": ml1}],
        "schemas": [{"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "lang", "required": False, "type": "string"},
        ]}],
        "current-schema-id": 0,
    }
    store.replace(f"{tbl}/metadata/v1.metadata.json", json.dumps(meta).encode())
    store.replace(f"{tbl}/metadata/version-hint.text", b"1")
    r = IcebergTableReader(spark, tbl, store=store)
    assert sorted(x["id"] for x in r.read().collect()) == [1, 2]
    assert r.files() == [f1]


def _field_id_parquet(path, cols):
    """Write parquet whose columns carry Iceberg field ids, as every
    spec-compliant Iceberg writer does. cols: [(name, field_id, values)]."""
    fields = [
        pa.field(name, pa.int64(), metadata={b"PARQUET:field_id": str(fid).encode()})
        for name, fid, _ in cols
    ]
    pq.write_table(
        pa.table({name: pa.array(vals, pa.int64()) for name, _, vals in cols},
                 schema=pa.schema(fields)),
        path,
    )


def test_iceberg_renamed_column_reads_by_field_id(spark, tmp_path):
    """Iceberg renames are metadata-only: a data file written BEFORE the
    rename stores the column under its old name. The reader must serve it
    under the NEW name by projecting on the stable field id, not drop it
    to null by name-matching."""
    root = _mk_table(tmp_path, "renamed")
    fpath = os.path.join(root, "data", "old.parquet")
    _field_id_parquet(fpath, [("id", 1, [1, 2]), ("val_a", 2, [10, 20])])
    m1 = _manifest(root, "m1.avro", [(1, 0, fpath)])
    ml1 = _manifest_list(root, "ml1.avro", [m1])
    meta = {
        "format-version": 2, "table-uuid": "u", "location": root,
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": ml1}],
        "schemas": [
            {"schema-id": 0, "type": "struct", "fields": [
                {"id": 1, "name": "id", "required": False, "type": "long"},
                {"id": 2, "name": "val_a", "required": False, "type": "long"},
            ]},
            # schema evolution: field 2 renamed val_a -> val_b
            {"schema-id": 1, "type": "struct", "fields": [
                {"id": 1, "name": "id", "required": False, "type": "long"},
                {"id": 2, "name": "val_b", "required": False, "type": "long"},
            ]},
        ],
        "current-schema-id": 1,
    }
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as f:
        f.write("1")
    r = IcebergTableReader(spark, root)
    assert r._renames_detected()
    out = r.read()
    assert out.columns == ["id", "val_b"]
    rows = {x["id"]: x["val_b"] for x in out.collect()}
    assert rows == {1: 10, 2: 20}
    # the residual where-filter applies under the new name too
    assert [x["id"] for x in r.read(where=("val_b", ">", 15)).collect()] == [2]


def test_iceberg_renamed_footer_reads_distributed_and_cached(spark, tmp_path, monkeypatch):
    """A rename-history table's footer field-id fetches must not be a
    sequential per-file driver loop: above a small threshold they fan out as
    ONE distributed Spark job (at 10^6 files on an object store the loop is
    10^6 driver round-trips — VERDICT r9 'What's wrong' #3), and the
    (immutable) per-file mappings are cached so a second scan refetches
    nothing."""
    from bears_spark.io import iceberg_log as il

    root = _mk_table(tmp_path, "renbig")
    nfiles = il._DRIVER_FOOTER_READS + 4
    fpaths = []
    for i in range(nfiles):
        p = os.path.join(root, "data", f"f{i}.parquet")
        _field_id_parquet(p, [("id", 1, [2 * i, 2 * i + 1]), ("val_a", 2, [i, i])])
        fpaths.append(p)
    m1 = _manifest(root, "m1.avro", [(1, 0, p) for p in fpaths])
    ml1 = _manifest_list(root, "ml1.avro", [m1])
    meta = {
        "format-version": 2, "table-uuid": "u", "location": root,
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": ml1}],
        "schemas": [
            {"schema-id": 0, "type": "struct", "fields": [
                {"id": 1, "name": "id", "required": False, "type": "long"},
                {"id": 2, "name": "val_a", "required": False, "type": "long"},
            ]},
            {"schema-id": 1, "type": "struct", "fields": [
                {"id": 1, "name": "id", "required": False, "type": "long"},
                {"id": 2, "name": "val_b", "required": False, "type": "long"},
            ]},
        ],
        "current-schema-id": 1,
    }
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as f:
        f.write("1")
    # spy DRIVER-side: executors re-import the real module in their own
    # processes, so a monkeypatched module attribute counts only driver calls
    driver_calls = []
    real = il._read_footer_field_map
    monkeypatch.setattr(
        il, "_read_footer_field_map", lambda p: (driver_calls.append(p), real(p))[1]
    )
    r = IcebergTableReader(spark, root)
    assert r._renames_detected()
    rows = {x["id"]: x["val_b"] for x in r.read().collect()}
    assert rows == {2 * i + j: i for i in range(nfiles) for j in (0, 1)}
    assert driver_calls == [], "footer reads above the threshold must distribute"
    assert len(r._footer_maps) == nfiles
    # second scan: every mapping is served from the cache (no driver reads,
    # and no distributed refetch either — spy on parallelize)
    def _no_jobs(*a, **k):
        raise AssertionError("cached footer maps must not trigger a Spark job")

    monkeypatch.setattr(r.spark.sparkContext, "parallelize", _no_jobs)
    assert {x["id"] for x in r.read().toLocalIterator()} == set(rows)
    assert driver_calls == []
    # small miss sets stay driver-side (a Spark job costs more than a few
    # ~KB footer fetches)
    r2 = IcebergTableReader(spark, root)
    got = r2._footer_field_maps(fpaths[:2])
    assert set(got) == set(fpaths[:2])
    assert sorted(driver_calls) == sorted(fpaths[:2])


def test_iceberg_renamed_column_without_file_ids_refuses(spark, tmp_path):
    """Field-id projection with ignoreMissing=false: a data file carrying NO
    field ids errors loudly instead of silently reading the renamed column
    as null."""
    root = _mk_table(tmp_path, "renbad")
    fpath = _data_file(root, "noids.parquet", [1], ["en"])
    m1 = _manifest(root, "m1.avro", [(1, 0, fpath)])
    ml1 = _manifest_list(root, "ml1.avro", [m1])
    meta = {
        "format-version": 2, "table-uuid": "u", "location": root,
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": ml1}],
        "schemas": [
            {"schema-id": 0, "type": "struct", "fields": [
                {"id": 1, "name": "id", "required": False, "type": "long"},
                {"id": 2, "name": "lang", "required": False, "type": "string"},
            ]},
            {"schema-id": 1, "type": "struct", "fields": [
                {"id": 1, "name": "id", "required": False, "type": "long"},
                {"id": 2, "name": "language", "required": False, "type": "string"},
            ]},
        ],
        "current-schema-id": 1,
    }
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as f:
        f.write("1")
    r = IcebergTableReader(spark, root)
    with pytest.raises(Exception):
        r.read().collect()


def test_iceberg_relative_root_positional_deletes(spark, tmp_path, monkeypatch):
    """A reader constructed with a RELATIVE table root still applies
    positional deletes: localized paths normalize to absolute so the
    anti-join keys match Spark's absolute _metadata.file_path."""
    root = _mk_table(tmp_path, "icerel")
    f1 = _data_file(root, "f1.parquet", [1, 2, 3], ["en", "de", "fr"])
    d1 = _position_delete_file(root, "d1.parquet", [(f1, 1)])
    m_data = _manifest(root, "mdat.avro", [(1, 0, f1)])
    m_del = _manifest_v2(root, "mdel.avro", [(1, 1, d1, 1, None)])
    ml = _manifest_list_mixed(root, "ml.avro", [(m_data, 0), (m_del, 1)])
    _metadata(root, [{"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": ml,
                      "sequence-number": 1}], current=1)
    monkeypatch.chdir(tmp_path)
    r = IcebergTableReader(spark, "icerel")
    assert r.path == root
    assert sorted(x["id"] for x in r.read().collect()) == [1, 3]


_MANIFEST_PART_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "data_file", "type": {
            "type": "record", "name": "r2p",
            "fields": [
                {"name": "content", "type": "int"},
                {"name": "file_path", "type": "string"},
                {"name": "file_format", "type": "string"},
                {"name": "record_count", "type": "long"},
                {"name": "partition", "type": ["null", {
                    "type": "record", "name": "r102",
                    "fields": [
                        {"name": "lang", "type": ["null", "string"]},
                        {"name": "day", "type": ["null", "int"]},
                    ],
                }]},
            ],
        }},
    ],
}


def test_iceberg_identity_partition_pruning(spark, tmp_path):
    """Identity-transform partition tuple values prune files for equality
    AND range predicates (the partition value holds for every row of the
    file); null tuple values and non-identity transforms keep the file;
    results never change vs the unpruned read."""
    root = _mk_table(tmp_path, "icepart")
    f_en = _data_file(root, "en.parquet", [1, 2], ["en", "en"])
    f_de = _data_file(root, "de.parquet", [3], ["de"])
    f_nul = _data_file(root, "nul.parquet", [4], ["fr"])
    mp = os.path.join(root, "metadata", "mpart.avro")
    recs = [
        {"status": 1, "data_file": {"content": 0, "file_path": f_en,
                                    "file_format": "PARQUET", "record_count": 2,
                                    "partition": {"lang": "en", "day": 3}}},
        {"status": 1, "data_file": {"content": 0, "file_path": f_de,
                                    "file_format": "PARQUET", "record_count": 1,
                                    "partition": {"lang": "de", "day": 7}}},
        # null partition tuple: conservative keep
        {"status": 1, "data_file": {"content": 0, "file_path": f_nul,
                                    "file_format": "PARQUET", "record_count": 1,
                                    "partition": None}},
    ]
    with open(mp, "wb") as f:
        f.write(write_container(_MANIFEST_PART_SCHEMA, recs))
    ml = _manifest_list(root, "ml.avro", [mp])
    _metadata(root, [{"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": ml}], current=1)
    # extend the metadata with a partition spec: lang identity of field 2,
    # day identity of a field NOT in the schema (id 9; pruning must still
    # work for lang and ignore day probes by name)
    meta_path = os.path.join(root, "metadata", "v1.metadata.json")
    meta = json.load(open(meta_path))
    meta["partition-specs"] = [{"spec-id": 0, "fields": [
        {"name": "lang", "transform": "identity", "source-id": 2, "field-id": 1000},
        {"name": "bucket_id", "transform": "bucket[4]", "source-id": 1, "field-id": 1001},
    ]}]
    with open(meta_path, "w") as f:
        json.dump(meta, f)

    r = IcebergTableReader(spark, root)
    assert len(r.files()) == 3
    # equality prune: de file provably excluded, null-tuple file kept
    kept = r.files(where=("lang", "=", "en"))
    assert f_en in kept and f_de not in kept and f_nul in kept
    # bucket transform declared but the tuples carry no id_bucket value:
    # conservative keep (bucket pruning needs a non-null tuple value)
    assert len(r.files(where=("id", "=", 1))) == 3
    # pruning is an optimization, never a filter: values identical
    assert sorted(x["id"] for x in r.read(where=("lang", "=", "en")).collect()) == [1, 2]
    assert sorted(x["id"] for x in r.read(where=("lang", "=", "fr")).collect()) == [4]


def test_iceberg_partition_pruning_spec_conflict_conservative(spark, tmp_path):
    """A partition-field NAME reused across spec evolution with a different
    transform (identity -> truncate) must NOT prune: without per-manifest
    spec ids, the tuple value might be a transform output, and pruning on
    it would silently drop matching rows (review finding)."""
    root = _mk_table(tmp_path, "specconf")
    f_en = _data_file(root, "en.parquet", [1], ["en"])
    mp = os.path.join(root, "metadata", "mpart.avro")
    recs = [
        # written under the truncate[1] spec: tuple holds 'e', rows hold 'en'
        {"status": 1, "data_file": {"content": 0, "file_path": f_en,
                                    "file_format": "PARQUET", "record_count": 1,
                                    "partition": {"lang": "e", "day": None}}},
    ]
    with open(mp, "wb") as f:
        f.write(write_container(_MANIFEST_PART_SCHEMA, recs))
    ml = _manifest_list(root, "ml.avro", [mp])
    _metadata(root, [{"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": ml}], current=1)
    meta_path = os.path.join(root, "metadata", "v1.metadata.json")
    meta = json.load(open(meta_path))
    meta["partition-specs"] = [
        {"spec-id": 0, "fields": [
            {"name": "lang", "transform": "identity", "source-id": 2, "field-id": 1000}]},
        {"spec-id": 1, "fields": [
            {"name": "lang", "transform": "truncate[1]", "source-id": 2, "field-id": 1000}]},
    ]
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    r = IcebergTableReader(spark, root)
    # conflicted meaning: the file is KEPT and the row found
    assert r.files(where=("lang", "=", "en")) == [f_en]
    assert [x["id"] for x in r.read(where=("lang", "=", "en")).collect()] == [1]


def test_iceberg_renamed_read_leaves_session_conf_untouched(spark, tmp_path):
    """VERDICT r8 #6: the field-id projection must not mutate session conf.
    The scan groups files by their footer (name, field id) mapping and
    projects per group — no spark.sql.parquet.fieldId.read.enabled flip —
    so the conf reads the same before and after, and the result is correct
    even with the flag explicitly OFF."""
    key = "spark.sql.parquet.fieldId.read.enabled"
    prior = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "false")
        root = _mk_table(tmp_path, "renconf")
        fpath = os.path.join(root, "data", "old.parquet")
        _field_id_parquet(fpath, [("id", 1, [1, 2]), ("val_a", 2, [10, 20])])
        m1 = _manifest(root, "m1.avro", [(1, 0, fpath)])
        ml1 = _manifest_list(root, "ml1.avro", [m1])
        meta = {
            "format-version": 2, "table-uuid": "u", "location": root,
            "current-snapshot-id": 1,
            "snapshots": [{"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": ml1}],
            "schemas": [
                {"schema-id": 0, "type": "struct", "fields": [
                    {"id": 1, "name": "id", "required": False, "type": "long"},
                    {"id": 2, "name": "val_a", "required": False, "type": "long"},
                ]},
                {"schema-id": 1, "type": "struct", "fields": [
                    {"id": 1, "name": "id", "required": False, "type": "long"},
                    {"id": 2, "name": "val_b", "required": False, "type": "long"},
                ]},
            ],
            "current-schema-id": 1,
        }
        with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as f:
            json.dump(meta, f)
        with open(os.path.join(root, "metadata", "version-hint.text"), "w") as f:
            f.write("1")
        r = IcebergTableReader(spark, root)
        rows = {x["id"]: x["val_b"] for x in r.read().collect()}
        assert rows == {1: 10, 2: 20}
        assert spark.conf.get(key, None) == "false"
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)


def test_iceberg_renamed_read_mixed_pre_and_post_rename_files(spark, tmp_path):
    """Pre-rename and post-rename files scan as separate physical-schema
    groups and union to one logical schema; a file written after a column
    ADD serves the new column, older files read it as null."""
    root = _mk_table(tmp_path, "renmix")
    f_old = os.path.join(root, "data", "old.parquet")
    _field_id_parquet(f_old, [("id", 1, [1, 2]), ("val_a", 2, [10, 20])])
    f_new = os.path.join(root, "data", "new.parquet")
    _field_id_parquet(
        f_new, [("id", 1, [3]), ("val_b", 2, [30]), ("extra", 3, [99])]
    )
    m1 = _manifest(root, "m1.avro", [(1, 0, f_old), (1, 0, f_new)])
    ml1 = _manifest_list(root, "ml1.avro", [m1])
    meta = {
        "format-version": 2, "table-uuid": "u", "location": root,
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": ml1}],
        "schemas": [
            {"schema-id": 0, "type": "struct", "fields": [
                {"id": 1, "name": "id", "required": False, "type": "long"},
                {"id": 2, "name": "val_a", "required": False, "type": "long"},
            ]},
            {"schema-id": 1, "type": "struct", "fields": [
                {"id": 1, "name": "id", "required": False, "type": "long"},
                {"id": 2, "name": "val_b", "required": False, "type": "long"},
                {"id": 3, "name": "extra", "required": False, "type": "long"},
            ]},
        ],
        "current-schema-id": 1,
    }
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as f:
        f.write("1")
    r = IcebergTableReader(spark, root)
    out = r.read()
    assert out.columns == ["id", "val_b", "extra"]
    rows = {x["id"]: (x["val_b"], x["extra"]) for x in out.collect()}
    assert rows == {1: (10, None), 2: (20, None), 3: (30, 99)}


def test_murmur3_iceberg_spec_vectors():
    """The spec's Appendix B test vectors pin the bucket hash exactly —
    a wrong murmur3 would prune the WRONG files (silent row loss)."""
    import datetime
    import decimal
    import uuid as _uuid

    from bears_spark.io.iceberg_log import bucket_transform, murmur3_32, truncate_transform

    assert murmur3_32(b"") == 0
    assert murmur3_32((34).to_bytes(8, "little", signed=True)) == 2017239379
    assert murmur3_32(b"iceberg") == 1210000089
    assert murmur3_32((17486).to_bytes(8, "little", signed=True)) == -653330422  # date 2017-11-16
    assert murmur3_32((1510871468000000).to_bytes(8, "little", signed=True)) == -2047944441
    assert murmur3_32(_uuid.UUID("f79c3e09-677c-4bbd-a479-3f349cb785e7").bytes) == 1488055340
    assert murmur3_32(bytes([0, 1, 2, 3])) == -188683207
    # full transforms over typed values reproduce the same hashes
    assert bucket_transform(34, "int", 1 << 31) == 2017239379 % (1 << 31)
    assert bucket_transform("iceberg", "string", 16) == (1210000089 & 0x7FFFFFFF) % 16
    assert bucket_transform(datetime.date(2017, 11, 16), "date", 1 << 31) == (
        (-653330422) & 0x7FFFFFFF
    ) % (1 << 31)
    assert bucket_transform(decimal.Decimal("14.20"), "decimal(9,2)", 1 << 31) == (
        (-500754589) & 0x7FFFFFFF
    ) % (1 << 31)
    # truncate examples straight from the spec table
    assert truncate_transform(-1, "int", 10) == -10
    assert truncate_transform(1, "int", 10) == 0
    assert truncate_transform("iceberg", "string", 3) == "ice"
    assert truncate_transform(decimal.Decimal("10.65"), "decimal(9,2)", 50) == decimal.Decimal(
        "10.50"
    )
    # unsupported (value, type) pairs refuse to hash -> caller keeps the file
    assert bucket_transform(1.5, "double", 4) is None
    assert truncate_transform(None, "int", 10) is None


def test_decimal_bucket_minimal_twos_complement():
    """Unscaled values of exactly -2^(8k-1) must serialize to k bytes, not
    k+1: (-128).bit_length()==8 naively gives 2 bytes (ff80) where the
    spec's minimal two's-complement is the single byte 80. A non-minimal
    encoding hashes to a different bucket than conformant writers used, so
    pruning would silently drop files containing the probed value."""
    import decimal

    from bears_spark.io.iceberg_log import _bucket_hash_bytes, bucket_transform, murmur3_32

    cases = {
        decimal.Decimal("-1.28"): b"\x80",  # unscaled -128
        decimal.Decimal("-327.68"): b"\x80\x00",  # unscaled -32768
        decimal.Decimal("1.28"): b"\x00\x80",  # unscaled 128 needs the sign byte
        decimal.Decimal("1.27"): b"\x7f",
        decimal.Decimal("-1.29"): b"\xff\x7f",  # unscaled -129: 2 bytes is minimal
        decimal.Decimal("0.00"): b"\x00",
    }
    for value, want in cases.items():
        got = _bucket_hash_bytes(value, "decimal(9,2)")
        assert got == want, (value, got, want)
        # round-trips: the minimal encoding decodes back to the unscaled value
        unscaled = int(value.scaleb(2))
        assert int.from_bytes(want, "big", signed=True) == unscaled
    # the boundary value lands in the bucket conformant writers computed
    assert bucket_transform(decimal.Decimal("-1.28"), "decimal(9,2)", 1 << 31) == (
        murmur3_32(b"\x80") & 0x7FFFFFFF
    ) % (1 << 31)


_MANIFEST_BUCKET_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "data_file", "type": {
            "type": "record", "name": "r2b",
            "fields": [
                {"name": "content", "type": "int"},
                {"name": "file_path", "type": "string"},
                {"name": "file_format", "type": "string"},
                {"name": "record_count", "type": "long"},
                {"name": "partition", "type": ["null", {
                    "type": "record", "name": "r102b",
                    "fields": [
                        {"name": "id_bucket", "type": ["null", "int"]},
                        {"name": "lang_trunc", "type": ["null", "string"]},
                    ],
                }]},
            ],
        }},
    ],
}


def _bucket_table(tmp_path, name):
    """A table bucket[4]-partitioned on id and truncate[1]-partitioned on
    lang, laid out the way a real Iceberg writer would: one file per
    (bucket, prefix) partition tuple."""
    from bears_spark.io.iceberg_log import bucket_transform

    root = _mk_table(tmp_path, name)
    groups: dict[tuple, list[tuple[int, str]]] = {}
    langs = {1: "apple", 2: "avocado", 3: "banana", 4: "blueberry", 5: "cherry",
             6: "apricot", 7: "banana", 8: "cherry", 9: "avocado", 10: "citron",
             11: "apple", 12: "berry"}
    for i, lang in langs.items():
        key = (bucket_transform(i, "long", 4), lang[:1])
        groups.setdefault(key, []).append((i, lang))
    recs, files_by_key = [], {}
    for (b, pfx), rows in sorted(groups.items()):
        fname = f"b{b}_{pfx}.parquet"
        p = _data_file(root, fname, [r[0] for r in rows], [r[1] for r in rows])
        files_by_key[(b, pfx)] = p
        recs.append({"status": 1, "data_file": {
            "content": 0, "file_path": p, "file_format": "PARQUET",
            "record_count": len(rows),
            "partition": {"id_bucket": b, "lang_trunc": pfx}}})
    mp = os.path.join(root, "metadata", "mbkt.avro")
    with open(mp, "wb") as f:
        f.write(write_container(_MANIFEST_BUCKET_SCHEMA, recs))
    ml = _manifest_list(root, "ml.avro", [mp])
    _metadata(root, [{"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": ml}], current=1)
    meta_path = os.path.join(root, "metadata", "v1.metadata.json")
    meta = json.load(open(meta_path))
    meta["partition-specs"] = [{"spec-id": 0, "fields": [
        {"name": "id_bucket", "transform": "bucket[4]", "source-id": 1, "field-id": 1000},
        {"name": "lang_trunc", "transform": "truncate[1]", "source-id": 2, "field-id": 1001},
    ]}]
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return root, files_by_key, langs


def test_iceberg_bucket_partition_pruning(spark, tmp_path):
    """Point lookups on a bucket[N]-partitioned key scan ONLY the files of
    the key's bucket (spec murmur3-32 hash); non-equality predicates never
    prune on bucket ids (hash order is unrelated to value order); results
    are identical to the unpruned read (VERDICT r8 'Next round' #4)."""
    from bears_spark.io.iceberg_log import bucket_transform

    root, files_by_key, langs = _bucket_table(tmp_path, "icebkt")
    r = IcebergTableReader(spark, root)
    all_files = r.files()
    for probe in (1, 7, 12):
        want_bucket = bucket_transform(probe, "long", 4)
        kept = r.files(where=("id", "=", probe))
        assert kept, "pruning must never empty a matching lookup"
        assert set(kept) == {p for (b, _), p in files_by_key.items() if b == want_bucket}
        assert len(kept) < len(all_files)
        # semantics unchanged: the pruned read returns exactly the probe row
        got = [x["lang"] for x in r.read(where=("id", "=", probe)).collect()]
        assert got == [langs[probe]]
    # range predicates keep every file (bucket ids carry no order)
    assert len(r.files(where=("id", "<", 100))) == len(all_files)


def test_iceberg_truncate_partition_pruning(spark, tmp_path):
    """truncate[W] tuples prune equality AND range predicates (truncation
    is order-preserving); boundary files are kept."""
    root, files_by_key, langs = _bucket_table(tmp_path, "icetrunc")
    r = IcebergTableReader(spark, root)
    all_files = r.files()
    kept = r.files(where=("lang", "=", "banana"))
    assert set(kept) == {p for (_, pfx), p in files_by_key.items() if pfx == "b"}
    got = sorted(x["id"] for x in r.read(where=("lang", "=", "banana")).collect())
    assert got == sorted(i for i, l in langs.items() if l == "banana")
    # range: lang < "az" can only live in prefix-'a' files
    kept_lt = r.files(where=("lang", "<", "az"))
    assert set(kept_lt) == {p for (_, pfx), p in files_by_key.items() if pfx == "a"}
    # boundary: lang < "b" keeps 'a' AND 'b' prefixes (a "b" row could be < "b"? no,
    # but truncate("b")=="b" and pv=="b" is not > t, so the file is kept — conservative)
    kept_b = r.files(where=("lang", "<", "b"))
    assert {p for (_, pfx), p in files_by_key.items() if pfx == "a"} <= set(kept_b)
    # semantics: identical rows pruned vs unpruned
    assert sorted(x["id"] for x in r.read(where=("lang", ">=", "cherry")).collect()) == sorted(
        i for i, l in langs.items() if l >= "cherry"
    )
    assert len(all_files) > 2


_MANIFEST_TIME_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "data_file", "type": {
            "type": "record", "name": "r2t",
            "fields": [
                {"name": "content", "type": "int"},
                {"name": "file_path", "type": "string"},
                {"name": "file_format", "type": "string"},
                {"name": "record_count", "type": "long"},
                {"name": "partition", "type": ["null", {
                    "type": "record", "name": "r102t",
                    "fields": [{"name": "ts_part", "type": ["null", "int"]}],
                }]},
            ],
        }},
    ],
}


def _time_partitioned_table(tmp_path, name, transform, ice_type, files):
    """An Iceberg table partitioned by a time transform on column ``ts``
    (field id 2), one data file per partition value, laid out like a real
    writer. ``files``: [(partition_value, [(id, ts_py_value)])] with
    ts_py_value a datetime.date / datetime.datetime."""
    root = _mk_table(tmp_path, name)
    paths = {}
    recs = []
    for pv, rows in files:
        p = os.path.join(root, "data", f"p{pv}.parquet")
        arrow_t = pa.date32() if ice_type == "date" else pa.timestamp("us")
        pq.write_table(
            pa.table({
                "id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], arrow_t),
            }),
            p,
        )
        paths[pv] = p
        recs.append({"status": 1, "data_file": {
            "content": 0, "file_path": p, "file_format": "PARQUET",
            "record_count": len(rows), "partition": {"ts_part": pv}}})
    mp = os.path.join(root, "metadata", "mtime.avro")
    with open(mp, "wb") as f:
        f.write(write_container(_MANIFEST_TIME_SCHEMA, recs))
    ml = _manifest_list(root, "ml.avro", [mp])
    meta = {
        "format-version": 2, "table-uuid": "u", "location": root,
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": ml}],
        "schemas": [{"schema-id": 0, "type": "struct", "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "ts", "required": False, "type": ice_type},
        ]}],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": [
            {"name": "ts_part", "transform": transform, "source-id": 2, "field-id": 1000},
        ]}],
    }
    with open(os.path.join(root, "metadata", "v1.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as f:
        f.write("1")
    return root, paths


def test_iceberg_day_partition_pruning(spark, tmp_path):
    """A day-partitioned table's date predicates plan only in-range files —
    day/hour/month/year are order-preserving floors since 1970, so they
    prune equality AND ranges exactly like truncate (VERDICT r9 'What's
    missing' #2); results are identical to the unpruned read."""
    import datetime as dt

    from bears_spark.io.iceberg_log import time_transform

    days = [dt.date(2024, 1, d) for d in (1, 2, 3, 4)]
    files = [
        (time_transform(d, "date", "day"), [(10 * i + j, d) for j in range(3)])
        for i, d in enumerate(days)
    ]
    root, paths = _time_partitioned_table(tmp_path, "iceday", "day", "date", files)
    r = IcebergTableReader(spark, root)
    all_files = r.files()
    assert len(all_files) == 4
    # equality: exactly the probe day's file
    probe = dt.date(2024, 1, 2)
    kept = r.files(where=("ts", "=", probe))
    assert kept == [paths[time_transform(probe, "date", "day")]]
    got = sorted(x["id"] for x in r.read(where=("ts", "=", probe)).collect())
    assert got == [10, 11, 12]
    # range: ts < 2024-01-03 drops the strictly-later files (the boundary
    # day's file is kept conservatively — pv == t is never rejected)
    kept_lt = set(r.files(where=("ts", "<", dt.date(2024, 1, 3))))
    assert paths[time_transform(days[3], "date", "day")] not in kept_lt
    assert {paths[time_transform(d, "date", "day")] for d in days[:2]} <= kept_lt
    # semantics: pruned read equals brute force
    got_lt = sorted(x["id"] for x in r.read(where=("ts", "<", dt.date(2024, 1, 3))).collect())
    assert got_lt == [0, 1, 2, 10, 11, 12]
    # ">=" drops the strictly-earlier files
    kept_ge = set(r.files(where=("ts", ">=", dt.date(2024, 1, 3))))
    assert paths[time_transform(days[0], "date", "day")] not in kept_ge
    assert sorted(
        x["id"] for x in r.read(where=("ts", ">=", dt.date(2024, 1, 3))).collect()
    ) == [20, 21, 22, 30, 31, 32]


def test_iceberg_hour_partition_pruning(spark, tmp_path):
    """hour[ts] pruning on a timestamp column: point and range predicates
    plan only the probe hours' files; spec ordinal examples pinned."""
    import datetime as dt

    from bears_spark.io.iceberg_log import time_transform

    # spec transform examples: 2017-11-16 is day 17486 / month 574 / year 47;
    # 2017-11-16T22:31:08 falls in hour 419686
    assert time_transform(dt.date(2017, 11, 16), "date", "day") == 17486
    assert time_transform(dt.date(2017, 11, 16), "date", "month") == 574
    assert time_transform(dt.date(2017, 11, 16), "date", "year") == 47
    ts_spec = dt.datetime(2017, 11, 16, 22, 31, 8)
    assert time_transform(ts_spec, "timestamp", "hour") == 419686
    assert time_transform(1510871468000000, "timestamp", "hour") == 419686
    # hour of a DATE is undefined -> never prunes
    assert time_transform(dt.date(2017, 11, 16), "date", "hour") is None
    # pre-epoch floor semantics
    assert time_transform(dt.datetime(1969, 12, 31, 23, 59, 59), "timestamp", "day") == -1
    assert time_transform(dt.datetime(1969, 12, 31, 23, 0, 1), "timestamp", "hour") == -1

    hours = [dt.datetime(2024, 3, 1, h) for h in (0, 1, 2)]
    files = [
        (time_transform(h, "timestamp", "hour"), [(10 * i + j, h + dt.timedelta(minutes=j))
                                                  for j in range(2)])
        for i, h in enumerate(hours)
    ]
    root, paths = _time_partitioned_table(tmp_path, "icehour", "hour", "timestamp", files)
    r = IcebergTableReader(spark, root)
    assert len(r.files()) == 3
    probe = dt.datetime(2024, 3, 1, 1, 1)
    kept = r.files(where=("ts", "=", probe))
    assert kept == [paths[time_transform(probe, "timestamp", "hour")]]
    assert [x["id"] for x in r.read(where=("ts", "=", probe)).collect()] == [11]
    kept_gt = set(r.files(where=("ts", ">", dt.datetime(2024, 3, 1, 1, 59))))
    assert paths[time_transform(hours[0], "timestamp", "hour")] not in kept_gt
    assert sorted(x["id"] for x in r.read(where=("ts", ">=", dt.datetime(2024, 3, 1, 2))).collect()) == [20, 21]


def test_export_iceberg_incremental_snapshots(spark, tmp_path):
    """export_iceberg_metadata is a continuous replicator: re-export after
    table commits appends a NEW SNAPSHOT — untouched manifests reused by
    reference, shrunk manifests rewritten with status=EXISTING survivors,
    new files in one ADDED manifest, zero-churn re-export writes nothing —
    and every prior snapshot still time-travels to its own state."""
    from bears_spark.io.avro_generic import read_container
    from bears_spark.io.iceberg_log import export_iceberg_metadata
    from bears_spark.io.snapshot_table import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(0, 30).selectExpr("id", "CAST(id AS DOUBLE) AS v").repartition(2))
    out = str(tmp_path / "ice")
    export_iceberg_metadata(t, out)
    r1 = IcebergTableReader(spark, out)
    sid1 = r1.current_snapshot_id()
    assert sorted(x["id"] for x in r1.read().collect()) == list(range(30))
    # zero churn: nothing written, same snapshot
    before = sorted(os.listdir(os.path.join(out, "metadata")))
    export_iceberg_metadata(t, out)
    assert sorted(os.listdir(os.path.join(out, "metadata"))) == before
    # append: new snapshot reuses the prior data manifest by reference
    t.append(spark.range(30, 40).selectExpr("id", "CAST(id AS DOUBLE) AS v").coalesce(1))
    export_iceberg_metadata(t, out)
    r2 = IcebergTableReader(spark, out)
    sid2 = r2.current_snapshot_id()
    assert sid2 == sid1 + 1
    assert sorted(x["id"] for x in r2.read().collect()) == list(range(40))
    # time travel: the first snapshot still reads its own state
    assert sorted(x["id"] for x in r2.read(snapshot_id=sid1).collect()) == list(range(30))
    # the snapshot-2 manifest list REFERENCES the snapshot-1 manifest file
    meta = json.load(open(os.path.join(out, "metadata", "v2.metadata.json")))
    ml1 = next(s["manifest-list"] for s in meta["snapshots"] if s["snapshot-id"] == sid1)
    ml2 = next(s["manifest-list"] for s in meta["snapshots"] if s["snapshot-id"] == sid2)
    m1 = {m["manifest_path"] for m in read_container(open(ml1, "rb").read())[1]}
    m2recs = read_container(open(ml2, "rb").read())[1]
    m2 = {m["manifest_path"] for m in m2recs}
    assert m1 <= m2 and len(m2) == len(m1) + 1, "append must reuse prior manifests"
    # MoR delete: DVs become a v2 positional-delete manifest; CoW delete of
    # part of the old files rewrites only the affected manifest
    t.delete_where("id", ">=", 36, mode="mor")
    export_iceberg_metadata(t, out)
    r3 = IcebergTableReader(spark, out)
    assert sorted(x["id"] for x in r3.read().collect()) == list(range(36))
    assert sorted(x["id"] for x in r3.read(snapshot_id=sid2).collect()) == list(range(40))
    # CoW delete rewrites source files -> gone + added in the next snapshot
    t.delete_where("id", "<", 5)
    export_iceberg_metadata(t, out)
    r4 = IcebergTableReader(spark, out)
    assert sorted(x["id"] for x in r4.read().collect()) == list(range(5, 36))
    # every snapshot in history still resolves
    for sid, want_lo, want_hi in ((sid1, 0, 30), (sid2, 0, 40)):
        got = sorted(x["id"] for x in r4.read(snapshot_id=sid).collect())
        assert got == list(range(want_lo, want_hi))


def test_export_iceberg_idempotent_with_dvs(spark, tmp_path):
    """Re-export with an UNCHANGED deletion-vector set writes nothing — the
    DV fingerprint in the snapshot summary makes zero-churn idempotency
    hold even while DVs exist (without it every replayed streaming batch in
    a replication loop rebuilt the positional-delete parquet + manifest and
    appended a snapshot — unbounded metadata growth; ADVICE r9 #3). Data
    churn with unchanged DVs reuses the prior delete manifest by reference."""
    from bears_spark.io.avro_generic import read_container
    from bears_spark.io.iceberg_log import export_iceberg_metadata
    from bears_spark.io.snapshot_table import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(0, 30).selectExpr("id", "CAST(id AS DOUBLE) AS v").coalesce(1))
    t.delete_where("id", "<", 4, mode="mor")
    out = str(tmp_path / "ice")
    export_iceberg_metadata(t, out)
    meta_dir = os.path.join(out, "metadata")
    before = sorted(os.listdir(meta_dir))
    data_before = sorted(
        os.path.join(dp, n) for dp, _, ns in os.walk(os.path.join(out, "data")) for n in ns
    )
    # zero churn, DVs present: NOTHING is written — no snapshot, no delete
    # parquet rebuild, byte-identical metadata dir
    for _ in range(3):
        export_iceberg_metadata(t, out)
    assert sorted(os.listdir(meta_dir)) == before
    assert sorted(
        os.path.join(dp, n) for dp, _, ns in os.walk(os.path.join(out, "data")) for n in ns
    ) == data_before
    r1 = IcebergTableReader(spark, out)
    sid1 = r1.current_snapshot_id()
    assert sorted(x["id"] for x in r1.read().collect()) == list(range(4, 30))
    # data churn with the SAME DV set: new snapshot, but the delete manifest
    # (and its positions parquet) is reused by reference, not rebuilt
    meta1 = json.load(open(os.path.join(meta_dir, "version-hint.text").replace(
        "version-hint.text", f"v{int(open(os.path.join(meta_dir, 'version-hint.text')).read())}.metadata.json")))
    ml1 = next(s["manifest-list"] for s in meta1["snapshots"] if s["snapshot-id"] == sid1)
    del_manifests1 = {
        m["manifest_path"] for m in read_container(open(ml1, "rb").read())[1]
        if int(m.get("content") or 0) == 1
    }
    t.append(spark.range(100, 105).selectExpr("id", "CAST(id AS DOUBLE) AS v").coalesce(1))
    export_iceberg_metadata(t, out)
    r2 = IcebergTableReader(spark, out)
    assert r2.current_snapshot_id() == sid1 + 1
    v = int(open(os.path.join(meta_dir, "version-hint.text")).read())
    meta2 = json.load(open(os.path.join(meta_dir, f"v{v}.metadata.json")))
    ml2 = next(s["manifest-list"] for s in meta2["snapshots"] if s["snapshot-id"] == sid1 + 1)
    del_manifests2 = {
        m["manifest_path"] for m in read_container(open(ml2, "rb").read())[1]
        if int(m.get("content") or 0) == 1
    }
    assert del_manifests2 == del_manifests1, "unchanged DV set must reuse the delete manifest"
    assert sorted(x["id"] for x in r2.read().collect()) == list(range(4, 30)) + list(range(100, 105))
    # DV churn (new delete) does rebuild: results stay right, fingerprint moves
    t.delete_where("id", ">=", 100, mode="mor")
    export_iceberg_metadata(t, out)
    r3 = IcebergTableReader(spark, out)
    assert sorted(x["id"] for x in r3.read().collect()) == list(range(4, 30))


def test_export_iceberg_wallclock_timestamps(spark, tmp_path):
    """Exported snapshots stamp real wall-clock timestamp-ms (monotone per
    table), not the snapshot id — id-as-millis renders as 1970-01-01 in
    external tooling and breaks timestamp-based operations (ADVICE r9 #4)."""
    from bears_spark.io.iceberg_log import export_iceberg_metadata
    from bears_spark.io.snapshot_table import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(0, 5).selectExpr("id", "CAST(id AS DOUBLE) AS v"))
    out = str(tmp_path / "ice")
    export_iceberg_metadata(t, out)
    t.append(spark.range(5, 8).selectExpr("id", "CAST(id AS DOUBLE) AS v"))
    export_iceberg_metadata(t, out)
    v = int(open(os.path.join(out, "metadata", "version-hint.text")).read())
    meta = json.load(open(os.path.join(out, "metadata", f"v{v}.metadata.json")))
    ts = [int(s["timestamp-ms"]) for s in sorted(meta["snapshots"], key=lambda s: s["snapshot-id"])]
    assert len(ts) == 2
    # plausible wall clock (after 2020-01-01) and strictly monotone
    assert all(x > 1_577_836_800_000 for x in ts), ts
    assert ts[0] < ts[1], ts
    # timestamp-based time travel resolves against these stamps
    r = IcebergTableReader(spark, out)
    assert r.snapshot_as_of(ts[0]) == 1
    assert r.snapshot_as_of(ts[1] - 1) == 1
    assert r.snapshot_as_of(ts[1]) == 2
    assert r.snapshot_as_of(ts[1] + 10_000) == 2
    assert sorted(x["id"] for x in r.read(as_of_timestamp_ms=ts[0]).collect()) == list(range(5))
    assert sorted(x["id"] for x in r.read(as_of_timestamp_ms=ts[1]).collect()) == list(range(8))
    with pytest.raises(Exception, match="no snapshot at or before"):
        r.snapshot_as_of(ts[0] - 1)
    with pytest.raises(ValueError, match="not both"):
        r.read(snapshot_id=1, as_of_timestamp_ms=ts[0])


def test_export_iceberg_partitioned_by_day(spark, tmp_path):
    """partition_by=("day", ts_col): the export writes a hidden partition
    spec with per-file tuples derived from manifest stats, so the REPLICA
    is day-prunable — equality and range probes plan only the matching
    days' files; re-exports keep the spec and reuse prior manifests; a
    spec flip or a partition-spanning file refuses."""
    import datetime as dt

    from bears_spark.io.iceberg_log import (
        IcebergTableReader,
        export_iceberg_metadata,
        time_transform,
    )
    from bears_spark.io.snapshot_table import SnapshotTable

    def day_df(day):
        base = f"timestamp'2024-03-{day:02d} 00:30:00'"
        return spark.range(0, 5).selectExpr(
            f"id + {day * 100} AS id",
            f"{base} + make_interval(0,0,0,0,int(id),0,0) AS ts",
        )

    t = SnapshotTable(spark, str(tmp_path / "src"))
    t.overwrite(day_df(1).coalesce(1))
    t.append(day_df(2).coalesce(1))
    t.append(day_df(3).coalesce(1))
    out = str(tmp_path / "ice")
    export_iceberg_metadata(t, out, partition_by=("day", "ts"))
    meta = json.load(open(os.path.join(out, "metadata", "v1.metadata.json")))
    assert meta["partition-specs"] == [{"spec-id": 0, "fields": [
        {"name": "ts_day", "transform": "day", "source-id": 2, "field-id": 1000},
    ]}]
    r = IcebergTableReader(spark, out)
    all_files = r.files()
    assert len(all_files) == 3
    probe = dt.datetime(2024, 3, 2, 1, 30)  # id 201's exact timestamp
    kept = r.files(where=("ts", "=", probe))
    assert len(kept) == 1 and len(kept) < len(all_files)
    assert sorted(x["id"] for x in r.read(where=("ts", "=", probe)).collect()) == [201]
    kept_ge = r.files(where=("ts", ">=", dt.datetime(2024, 3, 3)))
    assert len(kept_ge) == 1
    assert sorted(x["id"] for x in r.read(where=("ts", ">=", dt.datetime(2024, 3, 3))).collect()) == [
        300, 301, 302, 303, 304
    ]
    # continuous: append a day, re-export under the SAME spec — the new
    # day's file is prunable too and prior manifests are reused
    t.append(day_df(4).coalesce(1))
    export_iceberg_metadata(t, out, partition_by=("day", "ts"))
    r2 = IcebergTableReader(spark, out)
    assert len(r2.files()) == 4
    d4 = dt.datetime(2024, 3, 4, 0, 30)
    assert len(r2.files(where=("ts", "=", d4))) == 1
    assert r2.read(where=("ts", "=", d4)).count() == 1
    # zero churn stays idempotent under the spec
    before = sorted(os.listdir(os.path.join(out, "metadata")))
    export_iceberg_metadata(t, out, partition_by=("day", "ts"))
    assert sorted(os.listdir(os.path.join(out, "metadata"))) == before
    # spec continuity: dropping or changing partition_by refuses
    with pytest.raises(Exception, match="must match the prior export"):
        export_iceberg_metadata(t, out)
    with pytest.raises(Exception, match="must match the prior export"):
        export_iceberg_metadata(t, out, partition_by=("month", "ts"))
    # a file spanning two days refuses (honest: no spec-invalid null tuples)
    t2 = SnapshotTable(spark, str(tmp_path / "span"))
    t2.overwrite(day_df(1).unionByName(day_df(2)).coalesce(1))
    with pytest.raises(Exception, match="spans multiple"):
        export_iceberg_metadata(t2, str(tmp_path / "ice_span"), partition_by=("day", "ts"))
    # identity partitioning on an int column
    t3 = SnapshotTable(spark, str(tmp_path / "ident"))
    t3.overwrite(spark.range(0, 1).selectExpr("id", "id AS bucket").coalesce(1))
    for b in range(1, 4):
        t3.append(spark.range(b, b + 1).selectExpr("id", "id AS bucket").coalesce(1))
    out3 = str(tmp_path / "ice_ident")
    export_iceberg_metadata(t3, out3, partition_by=("identity", "bucket"))
    r3 = IcebergTableReader(spark, out3)
    kept3 = r3.files(where=("bucket", "=", 2))
    assert len(kept3) >= 1 and len(kept3) < len(r3.files())
    assert [x["id"] for x in r3.read(where=("bucket", "=", 2)).collect()] == [2]
    # hour transform sanity on the day fixture's source values
    assert time_transform(dt.datetime(2024, 3, 2, 0, 31), "timestamp", "day") == \
        time_transform(dt.datetime(2024, 3, 2, 23, 59), "timestamp", "day")


def test_export_identity_partition_truncated_string_stat_refuses_clearly(spark, tmp_path):
    """A string identity-partition value longer than the 32-char stat prefix
    has truncated min != incremented max in the manifest, which is NOT
    evidence the file spans two partitions — the export must refuse with the
    stat-prefix diagnosis, not the misleading 'spans multiple' one; a
    genuinely spanning string file still gets 'spans multiple' (ADVICE r10)."""
    from bears_spark.io.iceberg_log import (
        _is_truncated_string_pair,
        export_iceberg_metadata,
    )
    from bears_spark.io.snapshot_table import STAT_STRING_PREFIX, SnapshotTable

    long_val = "category-" + "x" * 40  # one distinct value, > 32 chars
    t = SnapshotTable(spark, str(tmp_path / "trunc_src"))
    t.overwrite(
        spark.range(0, 5).selectExpr("id", f"'{long_val}' AS cat").coalesce(1)
    )
    with pytest.raises(Exception, match="stat prefix"):
        export_iceberg_metadata(
            t, str(tmp_path / "ice_trunc"), partition_by=("identity", "cat")
        )
    # a genuinely multi-valued (short-string) file keeps the spans message
    t2 = SnapshotTable(spark, str(tmp_path / "span_src"))
    t2.overwrite(
        spark.range(0, 4).selectExpr(
            "id", "CASE WHEN id < 2 THEN 'a' ELSE 'b' END AS cat"
        ).coalesce(1)
    )
    with pytest.raises(Exception, match="spans multiple"):
        export_iceberg_metadata(
            t2, str(tmp_path / "ice_span2"), partition_by=("identity", "cat")
        )
    # helper unit coverage: the exact _truncate_string_stats single-value
    # shape matches; near-misses do not
    lo = "z" * STAT_STRING_PREFIX
    assert _is_truncated_string_pair(lo, "z" * (STAT_STRING_PREFIX - 1) + "{")
    assert not _is_truncated_string_pair(lo, lo)  # equal bounds never reach it
    assert not _is_truncated_string_pair("short", "shoru")  # not full width
    assert not _is_truncated_string_pair(lo, "a")  # not a prefix increment


def test_export_partition_value_rejects_untagged_temporal_stats():
    """Temporal transforms interpret stats as tagged epoch-micros; an
    UNTAGGED raw value must fail loudly instead of being silently misread
    as micros (ADVICE r10 — the ice_type names the expected source)."""
    from types import SimpleNamespace

    from bears_spark.io.iceberg_log import IcebergLogError, _export_partition_value

    entry = SimpleNamespace(
        path="f.parquet", stats={"ts": {"min": 1700000000, "max": 1700000000}}
    )
    with pytest.raises(IcebergLogError, match="not tagged epoch-micros"):
        _export_partition_value(entry, "day", "ts", "timestamptz")
    # the tagged shape still derives a tuple value
    tagged = SimpleNamespace(
        path="f.parquet",
        stats={"ts": {"min": {"t": "ts", "v": 86_400_000_000},
                      "max": {"t": "ts", "v": 86_400_000_000 + 5}}},
    )
    assert _export_partition_value(tagged, "day", "ts", "timestamptz") == 1


def test_export_iceberg_empty_states(spark, tmp_path):
    """An emptied table exports an empty snapshot (prior schema reused);
    an empty FIRST export refuses (no schema source) — matching the Delta
    exporter's contract."""
    from bears_spark.io.iceberg_log import export_iceberg_metadata
    from bears_spark.io.snapshot_table import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "src"))
    out = str(tmp_path / "ice")
    with pytest.raises(Exception, match="EMPTY"):
        export_iceberg_metadata(t, out)
    t.overwrite(spark.range(0, 10).selectExpr("id", "CAST(id AS DOUBLE) AS v"))
    export_iceberg_metadata(t, out)
    # a full merge-on-read delete DROPS every file from the manifest (a CoW
    # delete would instead leave one 0-row survivor file)
    t.delete_where("id", "<", 100, mode="mor")
    assert t.files() == []
    export_iceberg_metadata(t, out)
    r = IcebergTableReader(spark, out)
    assert r.current_snapshot_id() == 2
    assert r.files() == []
    # snapshot 1 still time-travels
    assert sorted(x["id"] for x in r.read(snapshot_id=1).collect()) == list(range(10))
    # refill after empty: schema came from the export history
    t.overwrite(spark.range(5, 8).selectExpr("id", "CAST(id AS DOUBLE) AS v"))
    export_iceberg_metadata(t, out)
    r2 = IcebergTableReader(spark, out)
    assert sorted(x["id"] for x in r2.read().collect()) == [5, 6, 7]
