"""MinHash-LSH near-dup index persisted as a snapshot table: incremental
deduplication at ingest time, without rescanning the corpus.

The batch dedup ladder (functions/dedup.py) answers "which documents in THIS
corpus are near-duplicates" with one self-join. A training-data pipeline's
real question arrives continuously: "is this NEW batch a near-duplicate of
anything we already kept?" Answering it by re-running the self-join over
history is O(corpus) per batch. This index stores the banded-MinHash table
(id, band, band_sig — the same rows minhash_lsh_candidates self-joins) in a
snapshot table, so each ingest delta:

* encodes only its own documents (map-only signature stage),
* equi-joins its bands against the STORED bands (shuffle ~ |delta| + the
  matching buckets; at cluster scale bucket the stored table on band_sig to
  make the probe side shuffle-free),
* appends its bands in an O(delta) commit — history is never rewritten.

Snapshot isolation comes from the table format: candidates are computed
against the version read at call time; the subsequent append creates a new
version whose files are disjoint, so a concurrent reader never sees the
delta matched against itself. Time travel answers "what did the index know
when batch N landed" — the audit story for tracing why a duplicate slipped
through.

Index parameters (num_hashes/bands/ngram_n) are frozen at build time in a
JSON sidecar behind the CommitStore seam — band signatures from different
parameter sets never mix (same rule as PQ codebooks in vector_index.py).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bears_spark.io.commit_store import CommitStore, LocalCommitStore
from bears_spark.io.snapshot_table import SnapshotTable


class LSHIndexTable:
    def __init__(self, spark: SparkSession, path: str, store: CommitStore | None = None):
        self.spark = spark
        self.path = path
        self.store = store or LocalCommitStore()
        self.table = SnapshotTable(spark, path, store=self.store)

    @property
    def _params_key(self) -> str:
        import os

        return os.path.join(self.path, "_lsh_params.json")

    def params(self) -> dict:
        return json.loads(self.store.read(self._params_key))

    def _bands(self, df: DataFrame, id_col: str, text_col: str) -> DataFrame:
        from bears_spark.functions.dedup import minhash_band_table

        p = self.params()
        bands = minhash_band_table(
            df, id_col, text_col, p["num_hashes"], p["bands"], p["ngram_n"]
        )
        return bands.select(F.col(id_col).alias("doc_id"), "band", "band_sig")

    # -- write path ---------------------------------------------------------
    def build(
        self,
        df: DataFrame,
        id_col: str,
        text_col: str,
        num_hashes: int = 16,
        bands: int = 4,
        ngram_n: int = 3,
    ) -> int:
        """Freeze the LSH parameters and commit the corpus's band table as
        version 1. Returns the committed version."""
        self.store.replace(
            self._params_key,
            json.dumps({"num_hashes": num_hashes, "bands": bands, "ngram_n": ngram_n}).encode(),
        )
        return self.table.overwrite(self._bands(df, id_col, text_col))

    def append(self, df: DataFrame, id_col: str, text_col: str) -> int:
        """Index a new batch: O(delta) band encode + append commit."""
        return self.table.append(self._bands(df, id_col, text_col))

    # -- query path ---------------------------------------------------------
    def candidates_for(self, df: DataFrame, id_col: str, text_col: str,
                       version: int | None = None) -> DataFrame:
        """Near-dup candidate pairs (new_id, index_id) between the given
        batch and the INDEXED corpus (optionally a past version): the batch's
        bands equi-join the stored bands; distinct pairs out. Self-matches
        (same id on both sides) are excluded, so calling this BEFORE
        append() of the same batch — the ingest-dedup order — needs no
        version gymnastics, and calling after still works."""
        new = self._bands(df, id_col, text_col).withColumnRenamed("doc_id", "new_id")
        stored = self.table.read(version=version).withColumnRenamed("doc_id", "index_id")
        return (
            new.join(stored, ["band", "band_sig"])
            .filter(F.col("new_id") != F.col("index_id"))
            .select("new_id", "index_id")
            .distinct()
        )

    def dedup_batch(self, df: DataFrame, id_col: str, text_col: str) -> DataFrame:
        """The ingest-time filter: return the batch rows that near-duplicate
        NOTHING already indexed (left_anti against the candidate new_ids),
        then index the survivors. The non-survivors never enter the corpus —
        first-seen-wins across the whole ingest history at O(delta) cost."""
        dupes = self.candidates_for(df, id_col, text_col).select(
            F.col("new_id").alias(id_col)
        ).distinct()
        survivors = df.join(dupes, id_col, "left_anti")
        self.append(survivors, id_col, text_col)
        return survivors
