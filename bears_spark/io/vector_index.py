"""PQ vector index persisted as a snapshot table: the serving-side store for
ANN at corpus scale, composing three already-tested pieces —
product-quantization codes (functions/similarity.py), the snapshot table's
atomic commits / time travel / exactly-once ingest (io/snapshot_table.py),
and ADC search (pq_topk).

Design for 100 TB:

* The index stores (id, codes) only — m bytes per vector instead of
  4*dim (64-dim float32 at m=8 is a 32x working-set cut), so the scan side
  of a search reads a sliver of the raw corpus bytes.
* ``build`` encodes once at write time; ``append`` encodes only the delta
  (O(delta) commit — the manifest carries prior files by reference); a
  streaming source lands through the snapshot table's (app, batch)
  exactly-once stamps. Search never re-encodes anything.
* Codebooks are a few KB of fit state, stored in the table directory as a
  JSON sidecar through the same CommitStore seam as the manifests — the
  index directory is self-contained and portable.
* Searches are ``pq_topk`` over the stored codes: ADC lookup-table
  expressions + TakeOrderedAndProject, no joins, no Python in the scan.
* Time travel works for free: ``search(..., version=N)`` answers "what
  would this query have returned before yesterday's ingest" — the audit
  story a production retrieval system needs.

The reference has no vector-index surface at all (its frames store raw
columns only); this is beyond-reference capability built Spark-first.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from bears_spark.io.commit_store import CommitStore, LocalCommitStore
from bears_spark.io.snapshot_table import SnapshotTable


class PQIndexTable:
    def __init__(self, spark: SparkSession, path: str, store: CommitStore | None = None):
        self.spark = spark
        self.path = path
        self.store = store or LocalCommitStore()
        self.table = SnapshotTable(spark, path, store=self.store)

    # -- codebook sidecar ---------------------------------------------------
    @property
    def _codebook_key(self) -> str:
        import os

        return os.path.join(self.path, "_codebooks.json")

    def _save_codebooks(self, codebooks: list[list[list[float]]]) -> None:
        self.store.replace(self._codebook_key, json.dumps(codebooks).encode())

    def codebooks(self) -> list[list[list[float]]]:
        return json.loads(self.store.read(self._codebook_key))

    # -- write path ---------------------------------------------------------
    def build(
        self,
        df: DataFrame,
        id_col: str,
        vec_col: str,
        m: int = 8,
        nbits: int = 4,
        seed: int = 42,
        sample_fraction: float | None = None,
    ) -> int:
        """Fit codebooks (seeded KMeans per subspace, optionally on a
        sample), encode every vector, and commit the codes as version 1 of
        the index table. Returns the committed version."""
        from bears_spark.functions.similarity import pq_encode, pq_train

        books = pq_train(df, vec_col, m=m, nbits=nbits, seed=seed, sample_fraction=sample_fraction)
        self._save_codebooks(books)
        codes = pq_encode(df, id_col, vec_col, books)
        return self.table.overwrite(codes)

    def append(self, df: DataFrame, id_col: str, vec_col: str) -> int:
        """Encode only the new vectors with the STORED codebooks and commit
        an O(delta) append. Codebooks are frozen at build time — the PQ
        space must stay fixed or old codes become unreadable; refresh by
        rebuilding (same rule as FAISS)."""
        from bears_spark.functions.similarity import pq_encode

        codes = pq_encode(df, id_col, vec_col, self.codebooks())
        return self.table.append(codes)

    def streaming_append(self, stream_df: DataFrame, id_col: str, vec_col: str,
                         checkpoint_dir: str, available_now: bool = True):
        """Exactly-once streaming ingest of vectors: encode each micro-batch
        with the stored codebooks, land through the snapshot table's
        (app, batch)-stamped commit. Encoding is a map-only Arrow stage, so
        it is stream-transparent."""
        from bears_spark.functions.similarity import pq_encode

        books = self.codebooks()
        encoded = pq_encode(stream_df, id_col, vec_col, books)
        return self.table.streaming_append(encoded, checkpoint_dir, available_now=available_now)

    # -- read path ----------------------------------------------------------
    def search(self, query_vec, k: int = 10, id_col: str = "vec_id",
               version: int | None = None) -> DataFrame:
        """ADC top-k over the stored codes (optionally of a past version).
        Plan: parquet scan of (id, codes) + codegen lookup expression +
        TakeOrderedAndProject."""
        from bears_spark.functions.similarity import pq_topk

        codes = self.table.read(version=version)
        return pq_topk(codes, self.codebooks(), query_vec, k=k, id_col=id_col)

    def compact(self, target_rows_per_file: int = 8_000_000) -> int:
        """Codes rows are tiny — bin-pack aggressively so a streaming-fed
        index keeps planning-time file counts bounded."""
        return self.table.compact(target_rows_per_file)
