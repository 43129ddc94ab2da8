"""Scale-strategy tests: bucketed co-located joins, broadcast behavior,
partition controls — the SCALE.md claims, asserted on real plans."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from bears_spark.bucketing import is_exchange_free_join, read_table, write_bucketed


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_quantity", "l_extendedprice")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(li, "li_bucketed", "l_orderkey", 8, sort_cols="l_orderkey")
    write_bucketed(orders, "orders_bucketed", "o_custkey", 8)  # different key on purpose
    write_bucketed(orders.withColumnRenamed("o_orderkey", "o_orderkey"), "orders_by_okey", "o_orderkey", 8, sort_cols="o_orderkey")
    yield
    for t in ("li_bucketed", "orders_bucketed", "orders_by_okey"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_is_exchange_free(spark, bucketed_tables):
    li = read_table(spark, "li_bucketed")
    orders = read_table(spark, "orders_by_okey")
    joined = li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
    assert is_exchange_free_join(joined), _plan(joined)[:2000]
    # and it actually runs correctly
    n = joined.count()
    plain = (
        spark.table("li_bucketed")
        .join(spark.table("orders_by_okey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert n == plain


def test_mismatched_bucket_keys_shuffle(spark, bucketed_tables):
    li = read_table(spark, "li_bucketed")
    orders = read_table(spark, "orders_bucketed")  # bucketed by custkey, not orderkey
    joined = li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
    assert not is_exchange_free_join(joined)  # at least one side must shuffle


def test_broadcast_join_no_shuffle_of_big_side(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    joined = li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey).join(
        F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey
    )
    import re

    plan = _plan(joined)
    assert "BroadcastHashJoin" in plan
    # fact side never shuffles: no hash-partitioned Exchange node anywhere
    assert not (re.search(r"\(\d+\) Exchange", plan) and "hashpartitioning" in plan), plan[:1500]


def test_repartition_by_key(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    parted = li.repartition(8, "l_orderkey")
    assert parted.rdd.getNumPartitions() == 8


def test_salted_agg_matches_plain(spark, sf_dir):
    from bears_spark.skew import salted_agg

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    salted = salted_agg(li, ["l_returnflag"], {"l_quantity": "sum", "l_extendedprice": "avg", "l_orderkey": "count"}, num_salts=8)
    plain = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("l_quantity_sum"),
        F.avg("l_extendedprice").alias("l_extendedprice_avg"),
        F.count("l_orderkey").alias("l_orderkey_count"),
    )
    s = {r["l_returnflag"]: r for r in salted.collect()}
    p = {r["l_returnflag"]: r for r in plain.collect()}
    assert set(s) == set(p)
    for k in s:
        assert s[k]["l_quantity_sum"] == pytest.approx(p[k]["l_quantity_sum"])
        assert s[k]["l_extendedprice_avg"] == pytest.approx(p[k]["l_extendedprice_avg"])
        assert s[k]["l_orderkey_count"] == p[k]["l_orderkey_count"]


def test_salted_join_matches_plain(spark, sf_dir):
    from bears_spark.skew import salted_join

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(F.col("o_custkey").alias("k"), "o_totalprice")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(F.col("c_custkey").alias("k"), "c_name")
    n_salted = salted_join(orders, cust, on="k", num_salts=4).count()
    n_plain = orders.join(cust, on="k").count()
    assert n_salted == n_plain


def test_salted_join_rejects_right_outer(spark, sf_dir):
    import pytest

    from bears_spark.skew import salted_join

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(F.col("o_custkey").alias("k"))
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(F.col("c_custkey").alias("k"))
    for how in ("right", "outer", "full"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(orders, cust, on="k", how=how)


def test_lsh_band_store_bucketed_probe_shuffles_only_delta(spark, sf_dir):
    """SCALE.md claim substantiated: with the stored LSH band table BUCKETED
    on its join keys, an ingest-delta probe shuffles only the delta — the
    corpus-sized stored side is scanned in place (no Exchange above its
    scan)."""
    import re

    from bears_spark.bucketing import write_bucketed
    from bears_spark.functions.dedup import minhash_band_table

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus_bands = minhash_band_table(
        docs.filter(F.col("doc_id") % 2 == 0), "doc_id", "text", 16, 4, 3
    )
    write_bucketed(corpus_bands, "lsh_bands_bucketed", ["band", "band_sig"], 8)
    try:
        stored = spark.table("lsh_bands_bucketed").withColumnRenamed("doc_id", "index_id")
        delta = minhash_band_table(
            docs.filter(F.col("doc_id") % 2 == 1), "doc_id", "text", 16, 4, 3
        ).withColumnRenamed("doc_id", "new_id")
        joined = delta.join(stored.hint("merge"), ["band", "band_sig"])

        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        # exactly ONE hash-partitioned Exchange: the delta side. The bucketed
        # store contributes none.
        n_exchanges = len(
            [m for m in re.finditer(r"\(\d+\) Exchange", plan)]
        )
        assert "hashpartitioning" in plan
        assert n_exchanges == 1, plan[:2000]
        # and the answer matches the unbucketed path
        plain = delta.join(
            corpus_bands.withColumnRenamed("doc_id", "index_id"), ["band", "band_sig"]
        )
        assert joined.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS lsh_bands_bucketed")
