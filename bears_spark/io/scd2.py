"""SCD Type-2 dimension maintenance over a snapshot table — the warehouse
pattern every CDC pipeline materializes: one row per (key, version) with
``valid_from`` / ``valid_to`` (NULL = current), closed versions immutable,
point-in-time lookups by timestamp.

Incremental apply cost model: a change batch touches only its AFFECTED keys
— the open versions of those keys plus the batch's events rebuild that
key's version tail with :func:`~bears_spark.functions.cdc.scd2_history`
(windows partitioned by key, fully parallel), and the result lands via the
snapshot table's copy-on-write MERGE on a surrogate version id, so only
files holding affected keys rewrite. Closed history is never read or
written. At 100 TB this is O(batch + affected-files), the Delta
`MERGE ... whenMatched` SCD2 recipe with the bookkeeping built in.

Constraint (the standard streaming-SCD2 contract): events in an apply()
batch must not predate the affected key's OPEN version (late data older
than the open version would need closed-history surgery — re-run build()
for those keys instead). apply() enforces this with a fail-fast check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bears_spark.functions.cdc import scd2_history
from bears_spark.io.snapshot_table import SnapshotTable


class Scd2Dimension:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str,
        ts_col: str,
        attr_cols: list[str],
        tiebreak: str | None = None,
        store=None,
    ) -> None:
        self.spark = spark
        self.key = key
        self.ts_col = ts_col
        self.attr_cols = list(attr_cols)
        self.tiebreak = tiebreak
        self.table = SnapshotTable(spark, path, store=store)

    # surrogate version id: one MERGE key per (key, valid_from, tiebreak)
    def _with_id(self, df: DataFrame) -> DataFrame:
        parts = [F.col(self.key).cast("string"), F.col("valid_from").cast("string")]
        if self.tiebreak:
            parts.append(F.col(self.tiebreak).cast("string"))
        return df.withColumn("__scd_id__", F.concat_ws("@", *parts))

    def _events_cols(self) -> list[str]:
        return [self.key, *self.attr_cols, self.ts_col] + (
            [self.tiebreak] if self.tiebreak else []
        )

    def build(self, events: DataFrame, txn: tuple[str, int] | None = None) -> int:
        """Full (re)build of the dimension from a change-event history."""
        hist = scd2_history(
            events.select(*self._events_cols()),
            self.key,
            self.ts_col,
            self.attr_cols,
            tiebreak=self.tiebreak,
        )
        return self.table.overwrite(self._with_id(hist), txn=txn)

    def apply(self, events: DataFrame) -> int:
        """Incremental apply of a change batch: rebuild only the affected
        keys' version tails (open version + new events), MERGE by surrogate
        id — closing updates the open row in place, new versions insert."""
        return self._apply_impl(events, txn=None)

    def _apply_impl(self, events: DataFrame, txn) -> int:
        events = events.select(*self._events_cols())
        if self.table.current_version() == 0:
            # never-built dimension: bootstrap from this batch, matching
            # streaming_apply's first-batch behavior, instead of surfacing
            # SnapshotTable.read()'s unrelated "snapshot has no data files"
            return self.build(events, txn=txn)
        hist = self.table.read()
        affected = events.select(self.key).distinct()
        open_rows = hist.filter(F.col("valid_to").isNull()).join(
            affected, self.key, "left_semi"
        )
        # fail fast on late data older than an open version (closed-history
        # surgery is build()'s job, not apply()'s)
        late = (
            events.join(
                open_rows.select(self.key, F.col("valid_from").alias("__open_from__")),
                self.key,
            )
            .filter(F.col(self.ts_col) < F.col("__open_from__"))
            .limit(1)
            .count()
        )
        if late:
            raise ValueError(
                "apply() received events older than an affected key's open "
                "version; re-run build() for those keys (SCD2 late-data contract)"
            )
        pseudo = open_rows.select(
            self.key,
            *self.attr_cols,
            F.col("valid_from").alias(self.ts_col),
            *([self.tiebreak] if self.tiebreak else []),
        )
        rebuilt = scd2_history(
            pseudo.unionByName(events),
            self.key,
            self.ts_col,
            self.attr_cols,
            tiebreak=self.tiebreak,
        )
        return self.table.merge(self._with_id(rebuilt), key="__scd_id__", txn=txn)

    def streaming_apply(self, stream_df: DataFrame, checkpoint_dir: str,
                        available_now: bool = True, app_id: str | None = None):
        """Exactly-once streaming SCD2 maintenance: each micro-batch of
        change events goes through :meth:`apply` under the snapshot table's
        (app, epoch) transaction stamps — a replayed batch after checkpoint
        recovery is skipped at the commit, so a version is never opened or
        closed twice. Events within a batch order by (ts, tiebreak); ACROSS
        batches the late-data contract applies per batch."""
        import os

        app = app_id or os.path.abspath(checkpoint_dir) + "#scd2"

        def _sink(batch_df: DataFrame, batch_id: int) -> None:
            if self.table.committed_txns().get(app, -1) >= batch_id:
                return  # replay after checkpoint recovery
            if self.table.current_version() == 0:
                # first batch bootstraps the dimension, stamped so its
                # replay after checkpoint recovery is skipped too
                self.build(batch_df, txn=(app, batch_id))
                return
            self._apply_with_txn(batch_df, txn=(app, batch_id))

        w = stream_df.writeStream.foreachBatch(_sink).option("checkpointLocation", checkpoint_dir)
        if available_now:
            w = w.trigger(availableNow=True)
        return w.start()

    def _apply_with_txn(self, events: DataFrame, txn) -> int:
        return self._apply_impl(events, txn)

    # -- reads ----------------------------------------------------------------
    def read(self) -> DataFrame:
        return self.table.read()

    def current(self) -> DataFrame:
        """The live dimension: exactly one row per key."""
        return self.table.read().filter(F.col("valid_to").isNull())

    def as_of(self, ts) -> DataFrame:
        """Point-in-time view at ``ts`` — half-open [valid_from, valid_to)
        version intervals, the SQL:2011 temporal-table convention."""
        t = F.lit(ts)
        return self.table.read().filter(
            (F.col("valid_from") <= t)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
        )
