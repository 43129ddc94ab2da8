"""Snapshot-versioned parquet tables: atomic commits, time travel, and
manifest-driven data skipping — the lakehouse table-format layer the reference
leaves to raw directories (src/bears/writer/dataframe/DataFrameWriter.py:30
writes files; nothing versions them or indexes their contents).

Layout on disk (this implementation targets a shared/local filesystem — the
manifest/pointer protocol is store-agnostic, and the object-store port swaps
``open``/``os.replace``/``os.listdir`` for put-if-absent + list calls)::

    <table>/
      _manifests/v00000001.json    one immutable manifest per committed version
      _current                     tiny pointer file naming the live version
      data/<uuid>/part-*.parquet   immutable data files, never rewritten

A manifest lists the table's data files with per-file, per-column min/max
stats harvested from the parquet footers. Commits are O(delta): an append
writes only the new files and a manifest that references the parent's file
list; the pointer swap (os.replace) is atomic, so readers always see a
complete version. Single-writer semantics (documented, not enforced) — the
multi-writer story at cluster scale is a compare-and-swap on the pointer,
which object stores provide natively (put-if-absent of v<N+1>).

Data skipping: ``read(where=...)`` prunes whole files whose [min, max] range
cannot satisfy the predicate BEFORE Spark plans the scan — on a 100 TB table
sorted or clustered by the predicate column (see functions/sketch.py Z-order
/ Hilbert layouts) this is the difference between scanning everything and
scanning a handful of files. Row-group-level pruning inside surviving files
still happens via Spark's normal parquet filter pushdown.

``delete_where`` is copy-on-write: files provably outside the predicate are
carried over untouched; only overlapping files are rewritten filtered. Cost
is proportional to the data that actually changes, never the table size.
"""

from __future__ import annotations

import json
import operator
import os
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

_OPS = {
    "=": operator.eq, "==": operator.eq, "<": operator.lt, "<=": operator.le,
    ">": operator.gt, ">=": operator.ge,
}


@dataclass
class FileEntry:
    path: str
    rows: int
    stats: dict = field(default_factory=dict)  # col -> {"min": v, "max": v}

    def may_match(self, col: str, op: str, value) -> bool:
        """False only when NO row in this file can satisfy ``col op value``.
        Missing stats (absent column, all-null chunk) conservatively match."""
        s = self.stats.get(col)
        if not s or s.get("min") is None or s.get("max") is None:
            return True
        lo, hi = s["min"], s["max"]
        if isinstance(value, (int, float)) != isinstance(lo, (int, float)):
            return True  # stat/value type mismatch: conservatively match
        if op in ("=", "=="):
            return lo <= value <= hi
        if op == "<":
            return lo < value
        if op == "<=":
            return lo <= value
        if op == ">":
            return hi > value
        if op == ">=":
            return hi >= value
        raise ValueError(f"unsupported operator {op!r}")


class SnapshotTable:
    """Handle to a snapshot-versioned parquet table rooted at ``path``."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- commit protocol ----------------------------------------------------
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.path, "_manifests", f"v{version:08d}.json")

    def current_version(self) -> int:
        try:
            with open(os.path.join(self.path, "_current")) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def _load_manifest(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        if v == 0:
            return {"version": 0, "operation": "empty", "files": []}
        with open(self._manifest_path(v)) as f:
            return json.load(f)

    def _write_files(self, df: DataFrame) -> list[FileEntry]:
        """Write df as immutable parquet files under data/<uuid>/ and harvest
        per-file row counts + column min/max from the footers (driver-side
        metadata reads — bytes proportional to file count, not data size)."""
        import pyarrow.parquet as pq

        subdir = os.path.join(self.path, "data", uuid.uuid4().hex)
        df.write.mode("overwrite").parquet(subdir)
        entries = []
        for name in sorted(os.listdir(subdir)):
            if not name.endswith(".parquet"):
                continue
            fpath = os.path.join(subdir, name)
            md = pq.ParquetFile(fpath).metadata
            stats: dict = {}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    if c.statistics is None or not c.statistics.has_min_max:
                        continue
                    col = c.path_in_schema
                    mn, mx = c.statistics.min, c.statistics.max
                    # manifests are JSON: keep only JSON-native stat types
                    # (int/float/str/bool). date/timestamp/decimal/binary
                    # stats are dropped — those columns conservatively match
                    # every predicate instead of mis-serializing.
                    if type(mn) not in (int, float, str, bool):
                        continue
                    cur = stats.setdefault(col, {"min": mn, "max": mx})
                    cur["min"] = min(cur["min"], mn)
                    cur["max"] = max(cur["max"], mx)
            entries.append(FileEntry(path=fpath, rows=md.num_rows, stats=stats))
        return entries

    def _commit(self, operation: str, files: list[FileEntry], batch_id: int | None = None) -> int:
        parent = self.current_version()
        version = parent + 1
        os.makedirs(os.path.join(self.path, "_manifests"), exist_ok=True)
        manifest = {
            "version": version,
            "parent": parent,
            "operation": operation,
            "files": [vars(e) for e in files],
        }
        if batch_id is not None:
            manifest["batch_id"] = batch_id
        mp = self._manifest_path(version)
        tmp = mp + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mp)  # manifest becomes visible whole
        ptr_tmp = os.path.join(self.path, "_current.tmp")
        with open(ptr_tmp, "w") as f:
            f.write(str(version))
        os.replace(ptr_tmp, os.path.join(self.path, "_current"))  # atomic swap
        return version

    # -- write operations ---------------------------------------------------
    def overwrite(self, df: DataFrame) -> int:
        return self._commit("overwrite", self._write_files(df))

    def append(self, df: DataFrame) -> int:
        prior = [FileEntry(**e) for e in self._load_manifest()["files"]]
        return self._commit("append", prior + self._write_files(df))

    def delete_where(self, col: str, op: str, value) -> int:
        """Copy-on-write delete of rows matching ``col op value``: files whose
        stats prove no match are carried over by reference; overlapping files
        are rewritten with the matching rows filtered out."""
        from pyspark.sql import functions as F

        prior = [FileEntry(**e) for e in self._load_manifest()["files"]]
        keep = [e for e in prior if not e.may_match(col, op, value)]
        rewrite = [e for e in prior if e.may_match(col, op, value)]
        new = []
        if rewrite:
            survivors = self.spark.read.parquet(*[e.path for e in rewrite]).filter(
                ~_OPS[op](F.col(col), F.lit(value))
            )
            new = self._write_files(survivors)
        return self._commit("delete", keep + new)

    def overwrite_clustered(self, df: DataFrame, cluster_cols: list[str], bits: int = 8, num_files: int | None = None) -> int:
        """Z-order-clustered overwrite: quantize the cluster columns from
        their global min/max, lay rows out along the Morton curve
        (functions/sketch.py zorder_layout — one output file per range
        partition), and commit. The payoff is at read time: per-file min/max
        stats become tight on EVERY cluster column, so ``read(where=...)``
        prunes files on any of them — multi-dimensional data skipping, where
        a plain sort only skips on its leading column."""
        from pyspark.sql import functions as F

        from bears_spark.functions.sketch import zorder_layout, zorder_quantize

        bounds = df.agg(
            *[f for c in cluster_cols for f in (F.min(c).alias(f"{c}__min"), F.max(c).alias(f"{c}__max"))]
        ).first()
        qcols = [
            zorder_quantize(F.col(c), int(bounds[f"{c}__min"]), int(bounds[f"{c}__max"]), bits)
            for c in cluster_cols
        ]
        laid = zorder_layout(df, qcols, bits=bits, num_partitions=num_files)
        return self._commit("overwrite-clustered", self._write_files(laid))

    def merge(self, source: DataFrame, key: str) -> int:
        """MERGE INTO this table (upsert): source rows update matching target
        rows and insert new ones — SQL MERGE semantics via
        functions/cdc.py merge_into, made copy-on-write by the manifest.

        Files whose ``key`` stats provably cannot contain any source key are
        carried by reference; only the overlapping files join the source.
        With source keys clustered (a CDC batch usually is) and the table
        written clustered/compacted on the key, the rewrite set is a sliver
        of the table — the Delta/Iceberg MERGE cost model, reproduced with a
        manifest and a full-outer join."""
        from pyspark.sql import functions as F

        from bears_spark.functions.cdc import merge_into

        b = source.agg(F.min(key).alias("lo"), F.max(key).alias("hi")).first()
        prior = [FileEntry(**e) for e in self._load_manifest()["files"]]
        if b["lo"] is None:  # empty source: MERGE is a no-op version
            return self._commit("merge", prior)

        def overlaps(e: FileEntry) -> bool:
            return e.may_match(key, ">=", b["lo"]) and e.may_match(key, "<=", b["hi"])

        keep = [e for e in prior if not overlaps(e)]
        hit = [e for e in prior if overlaps(e)]
        if hit:
            target = self.spark.read.parquet(*[e.path for e in hit])
            merged = merge_into(target, source, on=key)
        else:
            merged = source
        return self._commit("merge", keep + self._write_files(merged))

    def compact(self, target_rows_per_file: int = 1_000_000) -> int:
        """Small-file maintenance: bin-pack files below the target into
        ~target-sized replacements, carrying already-large files by
        reference. Commits a new version; every prior snapshot still reads
        its original files (data files are immutable). On a streaming-fed
        100 TB table this is the job that keeps file counts — and therefore
        planning time and open-file overhead — bounded."""
        import math

        entries = [FileEntry(**e) for e in self._load_manifest()["files"]]
        small = [e for e in entries if e.rows < target_rows_per_file]
        if len(small) <= 1:
            return self.current_version()  # nothing to gain
        big = [e for e in entries if e.rows >= target_rows_per_file]
        merged = self.spark.read.parquet(*[e.path for e in small])
        n_out = max(1, math.ceil(sum(e.rows for e in small) / target_rows_per_file))
        new = self._write_files(merged.repartition(n_out))
        return self._commit("compact", big + new)

    # -- streaming ingest ---------------------------------------------------
    def committed_batch_ids(self) -> set[int]:
        ids = set()
        for v in range(1, self.current_version() + 1):
            try:
                m = self._load_manifest(v)
            except FileNotFoundError:
                continue  # expired snapshot
            if "batch_id" in m:
                ids.add(m["batch_id"])
        return ids

    def streaming_append(self, stream_df: DataFrame, checkpoint_dir: str, available_now: bool = True):
        """Exactly-once streaming ingest via foreachBatch: each micro-batch
        commits an append manifest stamped with its epoch id, and a replayed
        batch (checkpoint recovery re-delivers the last epoch) is detected by
        that stamp and skipped — the commit, not the write, is the
        idempotency point. Returns the StreamingQuery (await it, or it runs
        to completion under available_now)."""

        def _sink(batch_df: DataFrame, batch_id: int) -> None:
            if batch_id in self.committed_batch_ids():
                return  # replay after checkpoint recovery: already committed
            prior = [FileEntry(**e) for e in self._load_manifest()["files"]]
            self._commit("stream-append", prior + self._write_files(batch_df), batch_id=batch_id)

        w = stream_df.writeStream.foreachBatch(_sink).option("checkpointLocation", checkpoint_dir)
        if available_now:
            w = w.trigger(availableNow=True)
        return w.start()

    # -- read operations ----------------------------------------------------
    def read(self, version: int | None = None, where: tuple | None = None) -> DataFrame:
        """Read a snapshot (latest by default). ``where=(col, op, value)``
        prunes files by manifest stats AND applies the predicate (pruning is
        an optimization, never a semantic change)."""
        from pyspark.sql import functions as F

        all_entries = [FileEntry(**e) for e in self._load_manifest(version)["files"]]
        if not all_entries:
            raise ValueError("snapshot has no data files")
        entries = all_entries
        if where is not None:
            entries = [e for e in entries if e.may_match(*where)]
            if not entries:
                # every file provably excluded: empty result, correct schema
                return self.spark.read.parquet(all_entries[0].path).limit(0)
        # mergeSchema: appends may evolve the schema (new nullable columns);
        # older files surface nulls for columns they predate, and a
        # time-travel read of an old version sees that version's schema.
        df = self.spark.read.option("mergeSchema", "true").parquet(*[e.path for e in entries])
        if where is not None:
            col, op, value = where
            df = df.filter(_OPS[op](F.col(col), F.lit(value)))
        return df

    def files(self, version: int | None = None, where: tuple | None = None) -> list[FileEntry]:
        entries = [FileEntry(**e) for e in self._load_manifest(version)["files"]]
        if where is not None:
            entries = [e for e in entries if e.may_match(*where)]
        return entries

    def expire_snapshots(self, keep_last: int = 1) -> list[int]:
        """Drop the manifests of all but the newest ``keep_last`` versions
        (time travel to expired versions stops working; the live version is
        untouched). Returns the expired version numbers. Run vacuum() after
        to reclaim the data files only the expired versions referenced."""
        cur = self.current_version()
        expired = [v for v in range(1, max(cur - keep_last, 0) + 1)]
        for v in expired:
            try:
                os.remove(self._manifest_path(v))
            except FileNotFoundError:
                pass  # already expired
        return expired

    def vacuum(self) -> int:
        """Delete data files referenced by NO remaining manifest (files only
        expired snapshots pointed at — immutable data files are otherwise
        never removed). Returns the number of files deleted. The
        expire-then-vacuum split is the standard two-phase safety protocol:
        readers of still-live versions never lose a file underneath them."""
        live: set[str] = set()
        for v in range(1, self.current_version() + 1):
            try:
                live |= {e["path"] for e in self._load_manifest(v)["files"]}
            except FileNotFoundError:
                continue  # expired manifest
        removed = 0
        data_root = os.path.join(self.path, "data")
        for sub in os.listdir(data_root) if os.path.isdir(data_root) else []:
            subdir = os.path.join(data_root, sub)
            for name in os.listdir(subdir):
                fpath = os.path.join(subdir, name)
                if name.endswith(".parquet") and fpath not in live:
                    os.remove(fpath)
                    removed += 1
            if not any(n.endswith(".parquet") for n in os.listdir(subdir)):
                import shutil

                shutil.rmtree(subdir, ignore_errors=True)
        return removed

    def snapshots(self) -> list[dict]:
        """Version history: (version, operation, file count, row count)."""
        out = []
        for v in range(1, self.current_version() + 1):
            try:
                m = self._load_manifest(v)
            except FileNotFoundError:
                continue  # expired snapshot
            out.append(
                {
                    "version": v,
                    "operation": m["operation"],
                    "n_files": len(m["files"]),
                    "n_rows": sum(e["rows"] for e in m["files"]),
                }
            )
        return out
