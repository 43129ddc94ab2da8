"""SQL UPDATE on the snapshot table (Delta's UPDATE verb — reference parity:
bears has no mutable table layer, SURVEY.md §1.2; this is the one DML verb
the engine's delete/merge/restore set was missing).

Semantics under test: ``update_where(col, op, value, set=...)`` applies the
assignments only to matching rows; NULL predicate keys never match (SQL);
assignments cast to the column's current type; stats-pruned files are carried
by reference (CoW cost is O(overlap), never O(table)); ``mode="mor"`` is the
deletion-vector update — ONE commit tombstoning matched positions and
appending the updated rows, O(matched rows) at 100 TB; logical names work
across rename/widen schema evolution; CHECK constraints gate updated rows.
"""

import pytest
from pyspark.sql import functions as F

from bears_spark.io.snapshot_table import ConstraintViolationError, SnapshotTable


def _rows(t, version=None):
    return sorted((r["id"], r["v"]) for r in t.read(version).collect())


def _mk(spark, tmp_path, name="t"):
    t = SnapshotTable(spark, str(tmp_path / name))
    # two files with disjoint id ranges so stats pruning is observable
    lo = spark.createDataFrame([(1, 10), (2, 20)], "id int, v int").coalesce(1)
    hi = spark.createDataFrame([(100, 1000), (200, 2000)], "id int, v int").coalesce(1)
    t.overwrite(lo)
    t.append(hi)
    return t


def test_cow_update_basic_and_pruning(spark, tmp_path):
    t = _mk(spark, tmp_path)
    untouched = {e.path for e in t.files() if not e.may_match("id", "<=", 2)}
    t.update_where("id", "<=", 2, set={"v": F.col("v") + 1})
    assert _rows(t) == [(1, 11), (2, 21), (100, 1000), (200, 2000)]
    # the non-overlapping file was carried by reference, not rewritten
    assert untouched <= {e.path for e in t.files()}
    # history intact: the pre-update snapshot still reads the old values
    assert _rows(t, t.current_version() - 1) == [(1, 10), (2, 20), (100, 1000), (200, 2000)]


def test_update_literal_casts_to_column_type(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.update_where("id", "=", 1, set={"v": 99.7})  # double literal -> int column
    assert t.read().schema["v"].dataType.simpleString() == "int"
    assert dict(_rows(t))[1] == 99


def test_null_predicate_keys_never_match(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.overwrite(
        spark.createDataFrame([(1, 10), (None, 20)], "id int, v int").coalesce(1)
    )
    t.update_where("id", ">=", 0, set={"v": 0})
    got = sorted(
        ((r["id"], r["v"]) for r in t.read().collect()),
        key=lambda p: (p[0] is None, p[0]),
    )
    assert got == [(1, 0), (None, 20)]


def test_update_unknown_set_column_refuses(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="unknown column"):
        t.update_where("id", "=", 1, set={"nope": 5})
    with pytest.raises(ValueError, match="at least one SET"):
        t.update_where("id", "=", 1, set={})


def test_mor_update_is_dv_plus_append_one_commit(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v0 = t.current_version()
    paths0 = {e.path for e in t.files()}
    t.update_where("id", "=", 1, set={"v": F.col("v") * 10}, mode="mor")
    assert t.current_version() == v0 + 1  # single commit
    assert _rows(t) == [(1, 100), (2, 20), (100, 1000), (200, 2000)]
    ent = {e.path: e for e in t.files()}
    # the affected file is still referenced, now carrying a DV tombstone
    dv_bearing = [e for p, e in ent.items() if p in paths0 and e.dv]
    assert len(dv_bearing) == 1 and dv_bearing[0].dv["cardinality"] == 1
    # and exactly one appended file holds the updated row
    added = [e for p, e in ent.items() if p not in paths0]
    assert len(added) == 1 and added[0].rows == 1


def test_mor_update_does_not_resurrect_deleted_rows(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete_where("id", "=", 1, mode="mor")
    # the matching file's raw bytes still hold id=1; the update must not
    # revive it as an updated row
    t.update_where("id", "<=", 2, set={"v": -1}, mode="mor")
    assert _rows(t) == [(2, -1), (100, 1000), (200, 2000)]


def test_update_across_rename_and_widen(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("v", "amount")
    t.alter_column_type("amount", "bigint")
    t.update_where("id", "=", 2, set={"amount": F.col("amount") + 2**40})
    got = {r["id"]: r["amount"] for r in t.read().collect()}
    assert got == {1: 10, 2: 20 + 2**40, 100: 1000, 200: 2000}
    # and the MoR shape on the evolved schema
    t.update_where("id", "=", 100, set={"amount": 7}, mode="mor")
    got = {r["id"]: r["amount"] for r in t.read().collect()}
    assert got == {1: 10, 2: 20 + 2**40, 100: 7, 200: 2000}


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_update_violating_check_constraint_aborts(spark, tmp_path, mode):
    t = _mk(spark, tmp_path)
    t.add_check_constraint("v_pos", "v > 0")
    v = t.current_version()
    with pytest.raises(ConstraintViolationError):
        t.update_where("id", "=", 1, set={"v": -5}, mode=mode)
    assert t.current_version() == v  # aborted: table unchanged
    assert _rows(t) == [(1, 10), (2, 20), (100, 1000), (200, 2000)]


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_update_no_match_is_noop_version(spark, tmp_path, mode):
    t = _mk(spark, tmp_path)
    v = t.current_version()
    t.update_where("id", "=", 777, set={"v": 0}, mode=mode)
    assert t.current_version() == v + 1
    assert _rows(t) == [(1, 10), (2, 20), (100, 1000), (200, 2000)]


def test_update_matches_rebuild_reference(spark, tmp_path):
    """Differential check vs a plain-DataFrame recomputation over a random
    mixed history."""
    import random

    rng = random.Random(7)
    t = SnapshotTable(spark, str(tmp_path / "t"))
    rows = [(i, rng.randint(0, 50)) for i in range(40)]
    t.overwrite(spark.createDataFrame(rows, "id int, v int").repartition(3))
    model = dict(rows)
    for step in range(6):
        cut = rng.randint(0, 50)
        mode = rng.choice(["cow", "mor"])
        if step % 2:
            t.update_where("v", "<", cut, set={"v": F.col("v") + 100}, mode=mode)
            model = {k: (v + 100 if v < cut else v) for k, v in model.items()}
        else:
            t.delete_where("v", ">=", cut + 40, mode=mode)
            model = {k: v for k, v in model.items() if v < cut + 40}
    assert sorted((r["id"], r["v"]) for r in t.read().collect()) == sorted(model.items())


def test_incremental_view_refreshes_across_updates(spark, tmp_path):
    """update_where (both modes) is expressible as the file-identity swap the
    IVM refresh consumes — SUM/COUNT and MIN/MAX views must match a rebuild
    after CoW and MoR updates, including a displaced group extreme."""
    from bears_spark.io.incremental_view import IncrementalAggView

    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.overwrite(
        spark.createDataFrame(
            [(1, 10), (1, 20), (2, 30), (2, 40)], "g int, v int"
        ).repartition(2)
    )
    view = IncrementalAggView(
        spark, t, str(tmp_path / "view"), group_cols=["g"],
        sum_cols=["v"], minmax_cols=["v"],
    )
    view.refresh()
    # CoW: displaces group 2's max (40 -> 4)
    t.update_where("v", "=", 40, set={"v": 4})
    view.refresh()
    got = {r["g"]: (int(r["v_sum"]), r["v_min"], r["v_max"]) for r in view.read().collect()}
    assert got == {1: (30, 10, 20), 2: (34, 4, 30)}, got
    # MoR: DV + appended updated row, one commit
    t.update_where("v", "=", 10, set={"v": 100}, mode="mor")
    view.refresh()
    got = {r["g"]: (int(r["v_sum"]), r["v_min"], r["v_max"]) for r in view.read().collect()}
    assert got == {1: (120, 20, 100), 2: (34, 4, 30)}, got


def test_mor_update_exports_to_delta_and_iceberg(spark, tmp_path):
    """An update-mor commit is DV + appended files — both exporters already
    speak that vocabulary; the replicas must serve the updated state."""
    from bears_spark.io.delta_log import DeltaTableReader, export_delta_log
    from bears_spark.io.iceberg_log import IcebergTableReader, export_iceberg_metadata

    t = _mk(spark, tmp_path)
    t.update_where("id", "=", 1, set={"v": 77}, mode="mor")
    expected = [(1, 77), (2, 20), (100, 1000), (200, 2000)]
    d_out, i_out = str(tmp_path / "delta"), str(tmp_path / "ice")
    export_delta_log(t, d_out)
    export_iceberg_metadata(t, i_out)
    got_d = sorted((r["id"], r["v"]) for r in DeltaTableReader(spark, d_out).read().collect())
    got_i = sorted((r["id"], r["v"]) for r in IcebergTableReader(spark, i_out).read().collect())
    assert got_d == expected and got_i == expected


def test_update_on_branch_then_publish(spark, tmp_path):
    """UPDATE participates in write-audit-publish like every other verb:
    staged on the branch, invisible on main, fast-forwarded by publish."""
    t = _mk(spark, tmp_path)
    before = _rows(t)
    b = t.create_branch("audit")
    b.update_where("id", "=", 1, set={"v": 111}, mode="mor")
    assert _rows(t) == before  # main untouched while the audit runs
    assert sorted((r["id"], r["v"]) for r in b.read().collect())[0] == (1, 111)
    t.publish_branch("audit")
    assert dict(_rows(t))[1] == 111


def test_change_feed_sees_update_as_changed(spark, tmp_path):
    """Row-level CDC classifies an UPDATE as 'changed' under the key —
    neither added nor removed — in both modes."""
    t = _mk(spark, tmp_path)
    v0 = t.current_version()
    t.update_where("id", "=", 2, set={"v": 21})
    t.update_where("id", "=", 100, set={"v": 1001}, mode="mor")
    feed = {r["id"]: r["change_type"]
            for r in t.change_feed("id", from_version=v0).collect()}
    assert feed == {2: "changed", 100: "changed"}, feed


def test_vacuum_reclaims_aborted_update_mor_outputs(spark, tmp_path):
    """A _Stale update-mor attempt strands its updated-row files (and DV) —
    written but never referenced by any manifest. vacuum() must reclaim
    them, and the rebuilt update must reflect the interloper's merge."""
    import os as _os

    from tests.test_snapshot_table import _RacingStore

    holder = [None]
    store = _RacingStore(holder)
    path = str(tmp_path / "updv")
    t1 = SnapshotTable(spark, path, store=store)
    t2 = SnapshotTable(spark, path, store=store)
    t1.overwrite(
        spark.createDataFrame([(i, i * 10) for i in range(8)], "id long, v long").coalesce(1)
    )
    # interloper rewrites the file containing id=3 right before t1's CAS
    holder[0] = lambda: t2.merge(
        spark.createDataFrame([(3, 999)], "id long, v long").coalesce(1), key="id"
    )
    t1.update_where("id", "=", 3, set={"v": F.col("v") + 1}, mode="mor")
    # serial order interloper-then-victim: 999 + 1, not 30 + 1
    assert {r["id"]: r["v"] for r in t1.read().collect()}[3] == 1000
    data_root = _os.path.join(path, "data")
    on_disk = {
        _os.path.join(data_root, sub, n)
        for sub in _os.listdir(data_root)
        for n in _os.listdir(_os.path.join(data_root, sub))
        if n.endswith(".parquet")
    }
    historically_live = set()
    for ver in range(1, t1.current_version() + 1):
        historically_live |= {e.path for e in t1.files(version=ver)}
    orphans = on_disk - historically_live
    assert orphans  # the aborted attempt really did strand updated-row files
    t1.expire_snapshots(keep_last=1)
    removed = t1.vacuum()
    assert removed >= len(orphans)
    assert {r["id"]: r["v"] for r in t1.read().collect()}[3] == 1000  # unharmed


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_update_set_reads_old_row_values(spark, tmp_path, mode):
    """SQL UPDATE evaluates every SET RHS against the OLD row: SET v = w,
    w = v swaps — it must not chain through the first assignment."""
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.overwrite(
        spark.createDataFrame([(1, 10, 20), (2, 30, 40)], "id int, v int, w int").coalesce(1)
    )
    t.update_where("id", "=", 1, set={"v": F.col("w"), "w": F.col("v")}, mode=mode)
    got = sorted((r["id"], r["v"], r["w"]) for r in t.read().collect())
    assert got == [(1, 20, 10), (2, 30, 40)], got


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_update_keys_rectification(spark, tmp_path, mode):
    """Bulk keyed UPDATE (right-to-rectification): only listed keys change,
    null keys and unlisted keys survive untouched, dup keys dedup."""
    t = _mk(spark, tmp_path)
    t.update_keys("id", [1, 200, 200, None], set={"v": F.lit(0)}, mode=mode)
    assert _rows(t) == [(1, 0), (2, 20), (100, 1000), (200, 0)]


def test_update_keys_prunes_with_blooms_or_stats(spark, tmp_path):
    """Files that can't contain any listed key are carried by reference."""
    t = _mk(spark, tmp_path)
    untouched = {e.path for e in t.files()
                 if not any(e.may_match("id", "=", k) for k in (1, 2))}
    assert untouched  # the hi-range file provably holds neither key
    t.update_keys("id", [1, 2], set={"v": F.col("v") + 1})
    assert untouched <= {e.path for e in t.files()}
    assert _rows(t) == [(1, 11), (2, 21), (100, 1000), (200, 2000)]


def test_update_keys_empty_and_df_input(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v = t.current_version()
    assert t.update_keys("id", [], set={"v": 0}) == v  # nothing to rectify
    keys_df = spark.createDataFrame([(100,), (100,)], "id int")
    t.update_keys("id", keys_df, set={"v": -1}, mode="mor")
    assert _rows(t) == [(1, 10), (2, 20), (100, -1), (200, 2000)]
