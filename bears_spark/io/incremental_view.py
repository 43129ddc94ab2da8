"""Incrementally-maintained materialized aggregate views over snapshot
tables — the lakehouse pattern that keeps a rollup fresh at O(changed data)
instead of O(table) per refresh (Delta/Materialize-style incremental view
maintenance; the reference has no table format at all, so this is a gain on
top of io/snapshot_table.py).

Mechanism: between the view's last-synced base version and the current one,
the manifest diff yields ADDED and REMOVED data files (every table operation
— append, MERGE, delete, compaction, clustered overwrite — is expressible as
exactly this file swap, because data files are immutable). SUM and COUNT are
self-inverse under signed union, so the refresh is:

    delta  = partial_agg(added rows, weight +1)  UNION ALL
             partial_agg(removed rows, weight -1)
    view'  = groupBy(keys) of (stored view UNION ALL delta), drop n_rows == 0

Cost: the base-side scan reads ONLY the churned files (a compaction nets to
zero and costs two small scans); the view rewrite is O(aggregate domain),
which is bounded for any rollup worth materializing. Exact under ANY
operation mix — unlike append-only `changes_since` consumers — because the
file diff sees rewrites from both sides.

Maintainable aggregates are SUM / COUNT / AVG (= sum/count): they form an
abelian group under row insertion/deletion. MIN / MAX (``minmax_cols``) are
semigroup-only — inserts merge (min of mins), but deleting a group's
current extreme needs the runner-up, which no amount of stored state can
provide. The refresh therefore splits groups: UNDISPLACED groups (no
removed row tied the stored extreme) merge incrementally like sums;
DISPLACED groups are recomputed from the current base snapshot, restricted
to exactly those groups via a broadcast semi-join (and to the files whose
stats overlap them, through the base scan's normal pruning). This is the
standard IVM treatment (Materialize/DBSP call it a "recompute repair"):
the common case — appends, compactions, deletes that don't touch a group
extreme — stays O(churn); the repair cost is proportional to the displaced
groups' row share, never the table.

Exactly-once: each refresh commits the view stamped with
(``incr-view:<base path>``, base_version) through the snapshot table's txn
mechanism, so a replayed or racing refresh of the same (or an older) base
version is detected at the CAS and skipped.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bears_spark.io.snapshot_table import SnapshotTable


class IncrementalAggView:
    """Materialized ``groupBy(group_cols).agg(sum(c), count(*))`` over a base
    :class:`SnapshotTable`, refreshed O(changed files) from the manifest
    file-level delta. The stored schema is ``(*group_cols, {c}_sum ...,
    n_rows)``; ``read()`` adds derived ``{c}_avg`` columns.

    Sums are kept as decimal(38,6): refresh SUBTRACTS removed rows, and a
    float representation would accumulate cancellation error across
    refreshes — decimals keep the view bit-equal to a from-scratch rebuild
    forever."""

    def __init__(
        self,
        spark: SparkSession,
        base: SnapshotTable,
        path: str,
        group_cols: list[str],
        sum_cols: list[str],
        store=None,
        minmax_cols: list[str] | None = None,
    ) -> None:
        self.spark = spark
        self.base = base
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols)
        self.minmax_cols = list(minmax_cols or [])
        self.view = SnapshotTable(spark, path, store=store)
        self.app_id = f"incr-view:{os.path.abspath(base.path)}"

    # -- state ---------------------------------------------------------------
    def synced_version(self) -> int:
        """Base version the view currently reflects (0 = never refreshed)."""
        return self.view.committed_txns().get(self.app_id, 0)

    def read(self) -> DataFrame:
        df = self.view.read()
        for c in self.sum_cols:
            df = df.withColumn(f"{c}_avg", F.col(f"{c}_sum") / F.col("n_rows"))
        return df

    # -- refresh ---------------------------------------------------------------
    def _scan(self, entries: list) -> DataFrame:
        # DV-aware scan: a merge-on-read delete changes a file's LIVE row set
        # without changing its path, so the legs must read through the
        # deletion vectors (io/dv.py) for the signed delta to be exact
        from bears_spark.io.dv import scan_with_dvs

        # schema-evolved base (rename/drop/add): files store PHYSICAL names;
        # the view's group/agg columns are LOGICAL — project through the
        # base's CURRENT mapping (physical names are immutable, so this is
        # correct for files of every base version), and fail with a named
        # diagnosis when a view column no longer exists (renamed/dropped
        # after the view was created). A type-WIDENED base additionally
        # needs the explicit read schema — its file set mixes physical
        # widths, which mergeSchema cannot reconcile.
        mapping = (
            self.base.column_mapping() if hasattr(self.base, "column_mapping") else None
        )
        rs = (
            self.base._read_schema_from_mapping(mapping)
            if hasattr(self.base, "_read_schema_from_mapping") else None
        )
        df = scan_with_dvs(self.spark, entries, merge_schema=True, read_schema=rs)
        if mapping is not None:
            df = self.base._project_mapping(df, mapping)
            want = set(self.group_cols) | set(self.sum_cols) | set(self.minmax_cols)
            gone = sorted(want - set(df.columns))
            if gone:
                raise ValueError(
                    f"view columns {gone} no longer exist on the base table "
                    f"(renamed or dropped since the view was created); "
                    f"recreate the view against the current schema"
                )
        return df

    def _partial(self, entries: list, weight: int) -> DataFrame:
        src = self._scan(entries)
        aggs = [
            F.sum(F.col(c).cast("decimal(38,6)") * weight).alias(f"{c}_sum")
            for c in self.sum_cols
        ] + [F.sum(F.lit(weight)).cast("long").alias("n_rows")]
        return src.groupBy(*self.group_cols).agg(*aggs)

    def _minmax_agg(self, src: DataFrame) -> DataFrame:
        # min/max are exact row selections, never accumulations, so the
        # column keeps its NATURAL type (numeric, string, date alike) —
        # there is no float-cancellation concern like the sums have
        aggs = []
        for c in self.minmax_cols:
            aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
        return src.groupBy(*self.group_cols).agg(*aggs)

    def _refresh_minmax(self, added: list, removed: list, v_sync: int, v_target: int):
        """(*group_cols, {c}_min, {c}_max ...) reflecting base@v_target.

        Semigroup merge for the undisplaced majority (min of stored+added
        mins), targeted recompute for groups where a removed row TIED a
        stored extreme — only those can have lost their extreme, and only
        the current base can name the runner-up."""
        mm_cols = [f"{c}_{s}" for c in self.minmax_cols for s in ("min", "max")]
        legs = []
        stored_mm = None
        if v_sync:
            stored_mm = self.view.read().select(*self.group_cols, *mm_cols)
            legs.append(stored_mm)
        if added:
            legs.append(self._minmax_agg(self._scan(added)))
        cand = legs[0]
        for leg in legs[1:]:
            cand = cand.unionByName(leg)
        cand = cand.groupBy(*self.group_cols).agg(
            *[
                f
                for c in self.minmax_cols
                for f in (
                    F.min(f"{c}_min").alias(f"{c}_min"),
                    F.max(f"{c}_max").alias(f"{c}_max"),
                )
            ]
        )
        if not (removed and stored_mm is not None):
            return cand  # pure inserts: the semigroup merge is exact
        removed_mm = self._minmax_agg(self._scan(removed)).select(
            *self.group_cols,
            *[
                F.col(f"{c}_{s}").alias(f"__r_{c}_{s}")
                for c in self.minmax_cols
                for s in ("min", "max")
            ],
        )
        # displaced: some removed row reached the stored extreme (<=/>= —
        # ties displace, because duplicates of the extreme may all be gone).
        # Null removed extremes (all-null removals) never displace: the
        # comparison is null, and filter() drops it.
        disp_pred = None
        for c in self.minmax_cols:
            p = (F.col(f"__r_{c}_min") <= F.col(f"{c}_min")) | (
                F.col(f"__r_{c}_max") >= F.col(f"{c}_max")
            )
            disp_pred = p if disp_pred is None else (disp_pred | p)
        displaced_keys = (
            stored_mm.join(removed_mm, self.group_cols)
            .filter(disp_pred)
            .select(*self.group_cols)
        )
        # repair: recompute ONLY the displaced groups from the current base
        # snapshot — the displaced set is view-domain-sized, so it broadcasts
        # and the base scan's rows are filtered before the aggregate.
        # An EMPTY target snapshot (e.g. a full merge-on-read delete dropped
        # every file) has no rows to repair from: every displaced group lost
        # all survivors, so its stale cand extremes are dropped by the final
        # n_rows>0 inner join anyway — skip the read, which by contract
        # raises on a file-less snapshot.
        if not self.base.files(version=v_target):
            return cand
        repair = self._minmax_agg(
            self.base.read(version=v_target).join(
                F.broadcast(displaced_keys), self.group_cols, "left_semi"
            )
        ).select(
            *self.group_cols,
            *[
                F.col(f"{c}_{s}").alias(f"__f_{c}_{s}")
                for c in self.minmax_cols
                for s in ("min", "max")
            ],
        )
        # a displaced group with no surviving rows has no repair row AND no
        # n_rows>0 row in the sums merge, so the stale cand value it keeps
        # here is dropped by the final inner join
        out = cand.join(F.broadcast(repair), self.group_cols, "left")
        return out.select(
            *self.group_cols,
            *[
                F.coalesce(F.col(f"__f_{c}_{s}"), F.col(f"{c}_{s}")).alias(f"{c}_{s}")
                for c in self.minmax_cols
                for s in ("min", "max")
            ],
        )

    def refresh(self) -> int:
        """Bring the view up to the base's current version; returns the base
        version now reflected. No-op when already synced. Safe against
        replays and racing refreshers via the (app, base_version) txn stamp.

        File identity is (path, deletion-vector path) — both immutable — so
        a merge-on-read delete shows up as removed-old-identity (subtract
        the file's previous live rows) + added-new-identity (add its
        remaining live rows): the net is exactly minus the deleted rows."""
        v_target = self.base.current_version()
        v_sync = self.synced_version()
        if v_target <= v_sync:
            return v_sync
        old = {e.identity(): e for e in self.base.files(version=v_sync)} if v_sync else {}
        new = {e.identity(): e for e in self.base.files(version=v_target)}
        added = [new[i] for i in sorted(set(new) - set(old), key=str)]
        removed = [old[i] for i in sorted(set(old) - set(new), key=str)]

        legs = []
        if added:
            legs.append(self._partial(added, +1))
        if removed:
            legs.append(self._partial(removed, -1))
        if v_sync:
            stored = self.view.read().select(
                *self.group_cols,
                *[F.col(f"{c}_sum") for c in self.sum_cols],
                F.col("n_rows"),
            )
            legs.append(stored)
        if not legs:
            # Empty base, first refresh: committing a placeholder would have
            # to guess the group-column types (the base has no data files to
            # derive them from), and a wrong guess poisons every later union.
            # Skip the commit instead — synced_version stays 0 and the next
            # refresh with data does the full (still O(churned files)) build
            # with the real types.
            return v_sync
        union = legs[0]
        for leg in legs[1:]:
            union = union.unionByName(leg)
        merged = (
            union.groupBy(*self.group_cols)
            .agg(
                *[F.sum(f"{c}_sum").cast("decimal(38,6)").alias(f"{c}_sum") for c in self.sum_cols],
                F.sum("n_rows").alias("n_rows"),
            )
            # a group whose every row was deleted vanishes from the view,
            # exactly as a from-scratch groupBy would never emit it
            .filter(F.col("n_rows") > 0)
        )
        if self.minmax_cols:
            mm = self._refresh_minmax(added, removed, v_sync, v_target)
            # inner: every surviving group (n_rows > 0) is in stored ∪ added,
            # which is exactly cand's key set; vanished groups drop from both
            merged = merged.join(mm, self.group_cols)
        self.view.overwrite(merged, txn=(self.app_id, v_target))
        return v_target
