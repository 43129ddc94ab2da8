"""Smoke tests for every declared query at sf0.001 (full oracle comparison is
tools/check_correctness.py / the driver's t2 gate at sf0.01)."""

import pytest

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 6
    assert rows[0]["count_order"] > 0


def test_queries_and_oracles_aligned():
    q, o = set(entrymod.queries()), set(entrymod.oracle_sql())
    assert o <= q
    # deliberately oracle-less (non-SQL-expressible): the driver records the
    # weaker rows-only check; values are pinned by pytest instead
    assert q - o == {"doc_compression_quality"}
    assert set(entrymod.HEADLINE) <= q


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    n = df.count()
    assert n >= 0
    # schema must be stable (no unresolved columns)
    assert df.columns


def test_load_table_normalizes_all_ts_encodings(spark, tmp_path):
    """load_table must yield identical TIMESTAMP instants for nanos, naive-µs,
    and tz-aware parquet encodings of the same wall times."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bears_spark.queries.tables import events_ts_encoding, load_table

    wall_us = [1704067200_000_000, 1704070800_500_000]  # 2024-01-01 00:00 / 01:00.5 UTC
    base = {
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([1, 1], pa.int64()),
        "event_type": pa.array(["a", "b"]),
        "value": pa.array([1.0, 2.0]),
        "props": pa.array(["{}", "{}"]),
    }
    cases = {
        "ns": pa.array([u * 1000 for u in wall_us], pa.timestamp("ns")),
        "ntz": pa.array(wall_us, pa.timestamp("us")),
        "tz": pa.array(wall_us, pa.timestamp("us", tz="UTC")),
    }
    got = {}
    for name, ts_arr in cases.items():
        d = tmp_path / name
        d.mkdir()
        tbl = pa.table({"event_id": base["event_id"], "ts": ts_arr, "user_id": base["user_id"],
                        "event_type": base["event_type"], "value": base["value"], "props": base["props"]})
        pq.write_table(tbl, str(d / "events.parquet"))
        assert events_ts_encoding(str(d / "events.parquet")) == name
        df = load_table(spark, str(d), "events")
        assert dict(df.dtypes)["ts"] == "timestamp"
        from pyspark.sql import functions as F

        got[name] = [r[0] for r in df.select(F.unix_micros("ts")).orderBy("event_id").collect()]
    assert got["ns"] == got["ntz"] == got["tz"] == wall_us


def test_register_tables_sql_passthrough(spark, sf_dir):
    from bears_spark.queries.tables import register_tables

    register_tables(spark, sf_dir)
    n = spark.sql("SELECT count(*) AS n FROM orders JOIN customer ON o_custkey = c_custkey").first()["n"]
    assert n > 0
    # ts arrives normalized for SQL users too
    t = spark.sql("SELECT min(unix_micros(ts)) AS m FROM events").first()["m"]
    assert t > 1_600_000_000_000_000


def test_ann_ivfpq_recall_threshold(spark):
    """VERDICT r5 #9: the composed IVF-PQ rung publishes recall vs exact
    brute force. The floors are the deterministic measured values on the
    UNIFORM synthetic embeddings (no cluster structure: candidate recall
    sits near nprobe/kc = 3/8 by construction; the clustered high-recall
    regime is asserted in test_ivfpq_composed_recall_vs_brute_force)."""
    from bears_spark.queries.textops import ann_ivfpq_recall_report

    row = ann_ivfpq_recall_report(spark, "/root/testdata/sf0.001").first()
    assert row["n_true"] == 10
    # end-to-end never exceeds the bucket-probe stage's recall
    assert row["n_hit"] <= row["n_in_probe"]
    assert row["candidate_recall"] >= 0.3, row.asDict()
    assert row["recall_at_10"] >= 0.1, row.asDict()


def test_doc_pack_assignments_invariants(spark):
    """GPT-style concat-and-chunk packing: every pack holds exactly the
    budget except the final remainder, each doc's spans partition its
    tokens, and spans within a pack are contiguous in doc_id order."""
    from pyspark.sql import functions as F

    from bears_spark.queries.qualityops import _PACK_BUDGET, doc_pack_assignments
    from bears_spark.queries.tables import load_table
    from bears_spark.functions.text import token_count

    sf = "/root/testdata/sf0.001"
    out = doc_pack_assignments(spark, sf)
    per_pack = out.groupBy("pack_id").agg(F.sum("n_tok_in_pack").alias("n")).collect()
    last = max(r["pack_id"] for r in per_pack)
    for r in per_pack:
        if r["pack_id"] == last:
            assert 0 < r["n"] <= _PACK_BUDGET
        else:
            assert r["n"] == _PACK_BUDGET, r
    # spans partition each doc's tokens
    docs = load_table(spark, sf, "documents").select(
        "doc_id", token_count("text").alias("n_tok")
    ).filter(F.col("n_tok") > 0)
    per_doc = out.groupBy("doc_id").agg(F.sum("n_tok_in_pack").alias("got"))
    bad = per_doc.join(docs, "doc_id").filter(F.col("got") != F.col("n_tok"))
    assert bad.count() == 0
    assert per_doc.count() == docs.count()


def test_emb_cluster_silhouette_bounds(spark):
    """Simplified silhouette is in [-1, 1] per cluster, every corpus vector
    is reported exactly once, and the k=1 degenerate case is defined 0."""
    from pyspark.sql import functions as F

    from bears_spark.functions.similarity import simplified_silhouette_expr
    from bears_spark.queries.tables import load_table
    from bears_spark.queries.textops import emb_cluster_silhouette

    sf = "/root/testdata/sf0.001"
    rows = emb_cluster_silhouette(spark, sf).collect()
    emb = load_table(spark, sf, "embeddings")
    assert sum(r["n_members"] for r in rows) == emb.count()
    assert all(-1.0 <= r["avg_silhouette"] <= 1.0 for r in rows)
    # k == 1: silhouette defined 0
    one = emb.select(
        simplified_silhouette_expr("embedding", [(0, [1.0] * 64)]).alias("cs")
    ).select("cs.sil").distinct().collect()
    assert [r["sil"] for r in one] == [0.0]
