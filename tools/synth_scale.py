"""Synthesize a larger corpus with the SAME shape as a driver testdata dir,
for scale-curve measurement above the bench point (VERDICT r10 "Next round"
#2 — turn the 100-TB claims into measurement past sf0.1).

    python tools/synth_scale.py [src_sf_dir] [out_dir] [factor]

Defaults: /root/testdata/sf0.1 -> .scale/sf1 at factor 10 (sf1-shaped:
~6M lineitem, 1.5M orders, 1M events/replica-shifted users, 50k documents,
20k embeddings). Deterministic (seed 42).

Shape preservation, table by table:
- region/nation: fixed dimensions, copied as-is.
- customer/supplier/part/orders/lineitem/events: replicated ``factor`` times
  with per-replica KEY SHIFTS (new_key = key + rep * (max_key + 1)) applied
  consistently across FK columns, so every join keeps its exact selectivity
  and per-key fan-out while key cardinality scales linearly — the TPC-H
  scaling model itself. Value columns are untouched (same skew, same
  categorical distributions); dates/timestamps keep their window, so
  per-day/hour densities scale with the data, as a real corpus would.
- documents: REGENERATED, not replicated — replication would give every doc
  ``factor`` near-identical copies and quadratically inflate dedup candidate
  pairs, changing the workload, not just the size. New docs sample the
  source's empirical word-frequency and document-length distributions
  (lang/source frequencies preserved); a measured fraction are near-copies
  of earlier generated docs (10% of words mutated) so MinHash/Jaccard
  queries keep a realistic duplicate rate.
- embeddings: regenerated from per-label mean/std (cluster structure
  preserved), so ANN/SemDeDup geometry scales instead of collapsing into
  ``factor``-way exact duplicates.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = 42


def _replicate(spark, src: str, out: str, name: str, factor: int,
               shift_cols: dict[str, int]) -> None:
    """Union ``factor`` key-shifted copies and write one parquet dir."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(os.path.join(src, f"{name}.parquet"))
    parts = []
    for rep in range(factor):
        d = df
        for col, base in shift_cols.items():
            d = d.withColumn(col, (F.col(col) + F.lit(rep * base)).cast("long"))
        parts.append(d)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))


def _copy(spark, src: str, out: str, name: str) -> None:
    spark.read.parquet(os.path.join(src, f"{name}.parquet")).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, f"{name}.parquet"))


def _gen_documents(src: str, out: str, factor: int) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(SEED)
    t = pq.read_table(os.path.join(src, "documents.parquet"))
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    sources = t.column("source").to_pylist()
    vocab: dict[str, int] = {}
    lengths = []
    for s in texts:
        words = s.split()
        lengths.append(len(words))
        for w in words:
            vocab[w] = vocab.get(w, 0) + 1
    words_arr = np.array(list(vocab.keys()))
    freqs = np.array(list(vocab.values()), dtype=float)
    freqs /= freqs.sum()
    lengths = np.array(lengths)
    lang_vals, lang_counts = np.unique(np.array(langs), return_counts=True)
    src_vals, src_counts = np.unique(np.array(sources), return_counts=True)
    n = len(texts) * factor
    near_dup_rate = 0.05  # matches the source corpus's observed pair rate
    out_texts: list[str] = []
    for i in range(n):
        if out_texts and rng.random() < near_dup_rate:
            base = out_texts[int(rng.integers(0, len(out_texts)))].split()
            mutate = rng.random(len(base)) < 0.10
            words = [
                str(words_arr[int(rng.integers(0, len(words_arr)))]) if m else w
                for w, m in zip(base, mutate)
            ]
        else:
            k = int(lengths[int(rng.integers(0, len(lengths)))])
            words = list(rng.choice(words_arr, size=max(k, 1), p=freqs))
        out_texts.append(" ".join(words))
    out_langs = rng.choice(lang_vals, size=n, p=lang_counts / lang_counts.sum())
    out_srcs = rng.choice(src_vals, size=n, p=src_counts / src_counts.sum())
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(out_texts, pa.string()),
            "lang": pa.array([str(x) for x in out_langs], pa.string()),
            "source": pa.array([str(x) for x in out_srcs], pa.string()),
            "n_chars": pa.array([len(s) for s in out_texts], pa.int64()),
        }
    )
    dst = os.path.join(out, "documents.parquet")
    os.makedirs(dst, exist_ok=True)
    pq.write_table(tbl, os.path.join(dst, "part-0.parquet"))


def _gen_embeddings(src: str, out: str, factor: int) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(SEED + 1)
    t = pq.read_table(os.path.join(src, "embeddings.parquet"))
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    labels = np.array(t.column("label").to_pylist())
    n = len(vecs) * factor
    out_vecs = np.empty((n, vecs.shape[1]), dtype=np.float32)
    out_labels = np.empty(n, dtype=labels.dtype)
    uniq, counts = np.unique(labels, return_counts=True)
    probs = counts / counts.sum()
    chosen = rng.choice(uniq, size=n, p=probs)
    for lab in uniq:
        sel = labels == lab
        mu, sd = vecs[sel].mean(axis=0), vecs[sel].std(axis=0) + 1e-6
        mask = chosen == lab
        out_vecs[mask] = rng.normal(
            mu, sd, size=(int(mask.sum()), vecs.shape[1])
        ).astype(np.float32)
        out_labels[mask] = lab
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in out_vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(out_labels.tolist(), pa.int32()),
        }
    )
    dst = os.path.join(out, "embeddings.parquet")
    os.makedirs(dst, exist_ok=True)
    pq.write_table(tbl, os.path.join(dst, "part-0.parquet"))


def main() -> int:
    import pyarrow.parquet as pq

    from bears_spark.session import get_session

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1"
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    spark = get_session("synth-scale")
    spark.sparkContext.setLogLevel("ERROR")

    def _max(name: str, col: str) -> int:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"), columns=[col])
        return int(max(t.column(col).to_pylist())) + 1

    maxc = _max("customer", "c_custkey")
    maxs = _max("supplier", "s_suppkey")
    maxp = _max("part", "p_partkey")
    maxo = _max("orders", "o_orderkey")
    maxe = _max("events", "event_id")
    maxu = _max("events", "user_id")
    _copy(spark, src, out, "region")
    _copy(spark, src, out, "nation")
    _replicate(spark, src, out, "customer", factor, {"c_custkey": maxc})
    _replicate(spark, src, out, "supplier", factor, {"s_suppkey": maxs})
    _replicate(spark, src, out, "part", factor, {"p_partkey": maxp})
    _replicate(spark, src, out, "orders", factor,
               {"o_orderkey": maxo, "o_custkey": maxc})
    _replicate(spark, src, out, "lineitem", factor,
               {"l_orderkey": maxo, "l_partkey": maxp, "l_suppkey": maxs})
    _replicate(spark, src, out, "events", factor,
               {"event_id": maxe, "user_id": maxu})
    _gen_documents(src, out, factor)
    _gen_embeddings(src, out, factor)
    for name in ["lineitem", "orders", "events", "documents", "embeddings"]:
        n = pq.ParquetDataset(os.path.join(out, f"{name}.parquet")).read(
            columns=[]
        ).num_rows
        print(f"{name}: {n} rows")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
