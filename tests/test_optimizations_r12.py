"""Round-12 optimization internals: the once-per-plan eager-persist guard,
the nanosAsLong re-set on load_table memo hits, the part_item_recs freq
de-skew (groupBy + join instead of a per-part count window), and the
bm25_topk single-tokenize staging."""

import pytest
from pyspark.sql import functions as F

import bears_spark.queries.tables as T
from bears_spark.caching import _MATERIALIZED, release_scoped_caches, scoped_persist

SF = "/root/testdata/sf0.001"


def test_eager_persist_counts_once_per_plan(spark):
    """eager=True must materialize a plan's blocks exactly once per drain
    scope: a repeat persist of the SAME semantic plan (what bench.py's
    warm runs do) skips the count job, so the warm minimum measures the
    lazy path; the drain clears the guard so the next query starts cold."""
    release_scoped_caches()
    df1 = T.load_table(spark, SF, "nation").select("n_nationkey")
    out1 = scoped_persist(df1, eager=True)
    assert out1.storageLevel.useMemory
    assert len(_MATERIALIZED) == 1
    # same logical plan, new DataFrame object (a repeat run of the query)
    df2 = T.load_table(spark, SF, "nation").select("n_nationkey")
    out2 = scoped_persist(df2, eager=True)
    assert len(_MATERIALIZED) == 1  # guard hit: no second materialization
    assert out2.count() == out1.count()
    # the drain resets the guard along with the caches
    release_scoped_caches()
    assert len(_MATERIALIZED) == 0


def test_eager_persist_still_materializes_distinct_plans(spark):
    release_scoped_caches()
    a = scoped_persist(T.load_table(spark, SF, "nation").select("n_nationkey"), eager=True)
    b = scoped_persist(T.load_table(spark, SF, "region").select("r_regionkey"), eager=True)
    assert len(_MATERIALIZED) == 2
    assert a.count() > 0 and b.count() > 0
    release_scoped_caches()


def test_load_table_memo_reasserts_nanos_conf(spark):
    """VERDICT r11 "What's wrong" #5: a memo HIT for an ns-encoded events
    table must re-set spark.sql.legacy.parquet.nanosAsLong — if anything
    in-session resets the conf, executing the memoized plan would fail."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    enc = T.events_ts_encoding(f"{SF}/events.parquet")
    if enc != "ns":
        pytest.skip(f"testdata events are {enc}-encoded; nanos conf not in play")
    ev1 = T.load_table(spark, SF, "events")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    ev2 = T.load_table(spark, SF, "events")  # memo hit must re-assert
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    assert ev2.count() == ev1.count()  # the memoized plan still executes


def test_part_item_recs_freq_has_partial_aggregation(spark):
    """VERDICT r11 "What's wrong" #4: the per-part frequency must come from
    a groupBy (map-side partial aggregation; the join back is AQE-skew-
    protected) — NOT a count window partitioned by l_partkey, which ships
    every row of a hot part to one window task with no combine."""
    from bears_spark.queries.relational import part_item_recs

    df = part_item_recs(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    release_scoped_caches()
    assert "windowspecdefinition(l_partkey" not in plan.lower().replace("#", "").replace(" ", ""), (
        "freq went back to a per-part count window"
    )
    assert "partial_count" in plan, "partial (map-side) aggregation missing from the freq build"


def test_bm25_topk_single_tokenize_staging(spark):
    """bm25_topk stages tokenize once (scoped persist) and carries dl along
    the exploded tokens — no corpus-sized dl join, values unchanged."""
    from bears_spark.functions.text import bm25_topk

    docs = T.load_table(spark, SF, "documents")
    out = bm25_topk(docs, "doc_id", "text", ["table", "scan", "merge"], k=10)
    rows = out.collect()
    release_scoped_caches()
    assert len(rows) == 10
    # reference: the pre-staging shape, computed inline
    from bears_spark.functions.text import token_count, tokenize

    dl = docs.select("doc_id", token_count("text").alias("dl"))
    srow = dl.agg(F.count("*").alias("n"), F.sum("dl").alias("s")).first()
    n_docs, avgdl = srow["n"], float(srow["s"]) / srow["n"]
    toks = docs.select(
        "doc_id", F.explode(tokenize(F.lower(F.col("text")))).alias("term")
    ).filter(F.col("term").isin(["table", "scan", "merge"]))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5))
    ref = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .select(
            "doc_id",
            (idf * (F.col("tf") * 2.2) / (F.col("tf") + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / F.lit(avgdl)))).alias("s"),
        )
        .groupBy("doc_id")
        .agg(F.sum("s").alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(10)
        .collect()
    )
    assert [(r["doc_id"], round(r["score"], 9)) for r in rows] == [
        (r["doc_id"], round(r["score"], 9)) for r in ref
    ]


def test_double_lit_bit_exact_and_single_call(spark):
    """double_lit must reproduce F.lit's values BIT-exactly (repr round-trips
    through Java's correctly-rounded parseDouble) for scalars, nested
    matrices, subnormals, -0.0, and fall back to F.lit for non-finite."""
    import math
    import random
    import struct

    from bears_spark.functions.litutil import double_lit

    random.seed(7)
    tricky = [0.1, -0.0, 6.416238216462445e-05, 1e300, 5e-324, 1.7976931348623157e308]
    rnd = [struct.unpack("<d", struct.pack("<q", random.getrandbits(63)))[0] for _ in range(64)]
    vec = tricky + [x for x in rnd if math.isfinite(x)]
    a = spark.range(1).select(double_lit(vec).alias("v")).collect()[0]["v"]
    b = spark.range(1).select(F.lit([float(x) for x in vec]).alias("v")).collect()[0]["v"]
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x == y and math.copysign(1, x) == math.copysign(1, y), (x, y)
    m = [vec[:5], vec[5:10]]
    assert (
        spark.range(1).select(double_lit(m).alias("v")).collect()
        == spark.range(1).select(F.lit(m).alias("v")).collect()
    )
    nf = [1.0, float("inf"), float("nan")]
    got = spark.range(1).select(double_lit(nf).alias("v")).collect()[0]["v"]
    assert got[0] == 1.0 and got[1] == float("inf") and math.isnan(got[2])
