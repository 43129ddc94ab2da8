"""Sketch + layout operator tests: HLL, CMS, Bloom pruning, Z-order."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bears_spark.functions.sketch import (
    bloom_build,
    bloom_prune,
    cms_build,
    cms_lookup,
    hll_estimate,
    hll_registers,
    zorder_key,
    zorder_layout,
    zorder_quantize,
)


@pytest.fixture(scope="module")
def keyed(spark):
    # 5000 rows over 1000 distinct keys, skewed: key k appears (k % 10) + 1 times
    rows = [(k,) for k in range(1000) for _ in range((k % 10) + 1)]
    return spark.createDataFrame(rows, "key: bigint")


def test_hll_registers_shape(spark, keyed):
    regs = hll_registers(keyed, "key", p=6).toPandas()
    assert len(regs) <= 64
    assert (regs["rho"] >= 1).all() and (regs["rho"] <= 55).all()


def test_hll_estimate_accuracy(spark):
    # raw HLL is accurate only for n >> 2.5*m (below that the published
    # algorithm switches to linear counting, which we deliberately omit to
    # stay deterministic) — so test in its regime: n=20000 vs m=1024.
    df = spark.range(20000).select(F.col("id").alias("key"))
    row = hll_estimate(df, "key", p=10).first()
    rel_err = abs(row["hll_estimate"] - 20000) / 20000
    assert rel_err < 0.10  # expected sigma = 1.04/sqrt(1024) ~ 3.3%
    assert row["n_buckets_hit"] <= 1024


def test_hll_deterministic(spark, keyed):
    a = hll_estimate(keyed, "key", p=8).first()["hll_estimate"]
    b = hll_estimate(keyed.repartition(7), "key", p=8).first()["hll_estimate"]
    assert a == b  # partitioning/merge order cannot perturb the integer sum


def test_cms_overestimates_never_under(spark, keyed):
    exact = {r["key"]: r["cnt"] for r in keyed.groupBy("key").agg(F.count("*").alias("cnt")).collect()}
    sketch = cms_build(keyed, "key", depth=4, width=256)
    probes = spark.createDataFrame([(k,) for k in range(0, 1000, 97)], "key: bigint")
    est = {r["key"]: r["cms_cnt"] for r in cms_lookup(sketch, probes, "key", depth=4, width=256).collect()}
    assert set(est) == {k for k in range(0, 1000, 97)}
    for k, e in est.items():
        assert e >= exact[k]  # CMS error is one-sided
        assert e <= exact[k] + 5000 * 4 / 256  # ~n*e/w bound, loose


def test_cms_sketch_size_fixed(spark, keyed):
    sketch = cms_build(keyed, "key", depth=4, width=64)
    assert sketch.count() <= 4 * 64


def test_bloom_prune_no_false_negatives(spark, keyed):
    small = keyed.filter(F.col("key") % 100 == 3).select(F.col("key").alias("k")).distinct()
    positions = bloom_build(small, "k", m_bits=1024, k=3)
    assert 0 < len(positions) <= min(1024, 3 * 10)
    pruned = bloom_prune(keyed, "key", positions, m_bits=1024, k=3)
    joined_pruned = pruned.join(small, pruned["key"] == small["k"]).groupBy("key").count()
    joined_plain = keyed.join(small, keyed["key"] == small["k"]).groupBy("key").count()
    a = {(r["key"], r["count"]) for r in joined_pruned.collect()}
    b = {(r["key"], r["count"]) for r in joined_plain.collect()}
    assert a == b


def test_bloom_prune_selectivity(spark, keyed):
    small = keyed.filter(F.col("key") < 10).select(F.col("key").alias("k")).distinct()
    positions = bloom_build(small, "k", m_bits=4096, k=3)
    kept = bloom_prune(keyed, "key", positions, m_bits=4096, k=3).count()
    # 10 true keys -> 55 matching rows; false-positive rate at 30/4096 bits
    # set is ~4e-8, so the pruned count should be (nearly) exactly the match
    assert kept <= 100


def test_zorder_quantize_exact_bounds(spark):
    df = spark.createDataFrame([(v,) for v in range(0, 1001)], "v: bigint")
    q = df.select(zorder_quantize(F.col("v"), 0, 1000, 8).alias("q")).toPandas()["q"]
    assert q.min() == 0 and q.max() == 255
    assert (q == (pd.Series(range(0, 1001)) * 255 // 1000)).all()


def test_zorder_key_interleaves(spark):
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 3), (255, 255)], "a: bigint, b: bigint")
    z = df.select("a", "b", zorder_key([F.col("a"), F.col("b")], bits=8).alias("z")).collect()
    got = {(r["a"], r["b"]): r["z"] for r in z}
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1  # bit 0 of col a -> z bit 0
    assert got[(0, 1)] == 2  # bit 0 of col b -> z bit 1
    assert got[(3, 3)] == 15
    assert got[(255, 255)] == 65535


def test_zorder_layout_partitions_disjoint(spark):
    df = spark.createDataFrame([(i % 317, (i * 7) % 253) for i in range(3000)], "x: bigint, y: bigint")
    qx = zorder_quantize(F.col("x"), 0, 316, 8)
    qy = zorder_quantize(F.col("y"), 0, 252, 8)
    out = zorder_layout(df, [qx, qy], bits=8, num_partitions=4)
    assert out.columns == ["x", "y"]  # layout key dropped
    # partitions hold disjoint z-ranges: recompute z per partition, compare bounds
    z = out.withColumn("z", zorder_key([qx, qy], bits=8)).withColumn("pid", F.spark_partition_id())
    bounds = z.groupBy("pid").agg(F.min("z").alias("lo"), F.max("z").alias("hi")).orderBy("lo").collect()
    assert len(bounds) > 1
    for prev, cur in zip(bounds, bounds[1:]):
        assert prev["hi"] <= cur["lo"]


def test_rollup_merge_equals_direct(spark):
    from bears_spark.functions.rollup import merge_rollup_states, rollup_result, rollup_state

    df = spark.createDataFrame(
        [(i % 3, float(i) * 1.1) for i in range(1000)], "k: bigint, v: double"
    )
    parts = [df.filter(F.col("v") < 300), df.filter((F.col("v") >= 300) & (F.col("v") < 700)), df.filter(F.col("v") >= 700)]
    merged = rollup_result(merge_rollup_states(*[rollup_state(p, ["k"], "v") for p in parts]))
    direct = rollup_result(rollup_state(df, ["k"], "v"))
    a = {tuple(r) for r in merged.collect()}
    b = {tuple(r) for r in direct.collect()}
    assert a == b  # decimal sums: merge is EXACT, not approximately equal


def test_rollup_merge_associative(spark):
    from bears_spark.functions.rollup import merge_rollup_states, rollup_result, rollup_state

    df = spark.createDataFrame([(1, float(i)) for i in range(100)], "k: bigint, v: double")
    s1 = rollup_state(df.limit(30), ["k"], "v")
    # (s1 + s1) + s1 == s1 + (s1 + s1)
    left = rollup_result(merge_rollup_states(merge_rollup_states(s1, s1), s1)).collect()
    right = rollup_result(merge_rollup_states(s1, merge_rollup_states(s1, s1))).collect()
    assert left == right


def test_histogram_fixed_state_and_quantiles(spark):
    from bears_spark.functions.sketch import equiwidth_histogram, histogram_quantiles

    df = spark.createDataFrame([(float(i),) for i in range(10000)], "v: double")
    hist = equiwidth_histogram(df, "v", 100, 0.0, 9999.0)
    rows = [(int(r["bin"]), int(r["cnt"])) for r in hist.collect()]
    assert len(rows) <= 100
    assert sum(c for _, c in rows) == 10000
    got = dict(histogram_quantiles(rows, [0.5, 0.9], 100, 0.0, 9999.0))
    # uniform data: interpolated quantiles land within one bin width of truth
    assert abs(got[0.5] - 4999.5) < 100
    assert abs(got[0.9] - 8999.1) < 100


def test_histogram_null_and_clamp(spark):
    from bears_spark.functions.sketch import equiwidth_histogram

    df = spark.createDataFrame([(0.0,), (5.0,), (10.0,), (None,)], "v: double")
    rows = {r["bin"]: r["cnt"] for r in equiwidth_histogram(df, "v", 10, 0.0, 10.0).collect()}
    assert sum(rows.values()) == 3  # null dropped
    assert rows.get(9) == 1  # max value clamps into the last bin


def test_hilbert_key_matches_reference(spark):
    import pyspark.sql.functions as F

    from bears_spark.functions.sketch import hilbert_key_2d

    def xy2d(n_bits, x, y):  # classic scalar reference
        d, s = 0, 1 << (n_bits - 1)
        while s > 0:
            rx = 1 if x & s else 0
            ry = 1 if y & s else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s >>= 1
        return d

    pts = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {(r["x"], r["y"]): r["h"] for r in df.select("x", "y", hilbert_key_2d(F.col("x"), F.col("y"), 3).alias("h")).collect()}
    for x, y in pts:
        assert got[(x, y)] == xy2d(3, x, y), (x, y)
    # the curve visits every cell exactly once
    assert sorted(got.values()) == list(range(64))


def test_hilbert_layout_locality(spark):
    import pyspark.sql.functions as F

    from bears_spark.functions.sketch import hilbert_layout

    df = spark.range(4096).select(
        (F.col("id") % 64).alias("a"), (F.col("id") / 64).cast("long").alias("b"), F.col("id")
    )
    out = hilbert_layout(df, "a", "b", bits=6, num_partitions=8)
    assert out.count() == 4096 and set(out.columns) == {"a", "b", "id"}
    # locality: within each partition, the bounding box of (a,b) is far
    # smaller than the full 64x64 domain for at least most partitions
    stats = (
        out.withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .agg((F.max("a") - F.min("a")).alias("da"), (F.max("b") - F.min("b")).alias("db"))
        .collect()
    )
    tight = sum(1 for r in stats if r["da"] * r["db"] <= 64 * 64 / 4)
    assert tight >= len(stats) * 0.75


# --------------------------------------------------------------------------
# KMV theta sketch + Misra-Gries heavy hitters


def test_kmv_exact_mode_small_set(spark):
    from bears_spark.functions.sketch import kmv_estimate, kmv_sketch

    df = spark.createDataFrame([(k % 50,) for k in range(500)], "key: bigint")
    sk = kmv_sketch(df, "key", k=256)
    est = kmv_estimate(sk, 256).first()
    # fewer distinct values than k -> sketch is exhaustive, estimate is EXACT
    assert est["n"] == 50
    assert est["kmv_estimate"] == 50.0


def test_kmv_estimate_accuracy(spark, keyed):
    from bears_spark.functions.sketch import kmv_estimate, kmv_sketch

    est = kmv_estimate(kmv_sketch(keyed, "key", k=256), 256).first()["kmv_estimate"]
    # KMV relative error ~ 1/sqrt(k-1) ~ 6%; allow 3 sigma
    assert abs(est - 1000) / 1000 < 0.2, est


def test_kmv_prefilter_matches_unfiltered(spark, keyed):
    from bears_spark.functions.sketch import kmv_sketch

    plain = [r["hv"] for r in kmv_sketch(keyed, "key", k=64).collect()]
    pre = [r["hv"] for r in kmv_sketch(keyed, "key", k=64, prefilter_min_distinct=900).collect()]
    assert plain == pre


def test_kmv_set_algebra_union_intersect(spark):
    from bears_spark.functions.sketch import kmv_set_algebra, kmv_sketch

    a = spark.createDataFrame([(k,) for k in range(800)], "key: bigint")
    b = spark.createDataFrame([(k,) for k in range(400, 1200)], "key: bigint")
    out = kmv_set_algebra(kmv_sketch(a, "key", k=256), kmv_sketch(b, "key", k=256), k=256).first()
    assert abs(out["union_est"] - 1200) / 1200 < 0.25, out
    assert abs(out["intersect_est"] - 400) / 400 < 0.4, out
    assert 0.15 < out["jaccard_est"] < 0.55, out


def test_kmv_sketch_merge_associative(spark):
    # union-of-sketches == sketch-of-union (k smallest distinct commute)
    from bears_spark.functions.sketch import kmv_sketch

    a = spark.createDataFrame([(k,) for k in range(600)], "key: bigint")
    b = spark.createDataFrame([(k,) for k in range(300, 900)], "key: bigint")
    merged_direct = [r["hv"] for r in kmv_sketch(a.unionByName(b), "key", k=64).collect()]
    sk_union = (
        kmv_sketch(a, "key", k=64).unionByName(kmv_sketch(b, "key", k=64))
        .distinct().orderBy("hv").limit(64)
    )
    assert merged_direct == [r["hv"] for r in sk_union.collect()]


def test_misra_gries_superset_guarantee(spark):
    from bears_spark.functions.sketch import misra_gries_candidates

    # adversarial: 3 heavy values drowned in 10k distinct light ones, spread
    # over many partitions; capacity 16 << distinct count
    rows = [("heavy%d" % (i % 3),) for i in range(6000)] + [("light%d" % i,) for i in range(10000)]
    df = spark.createDataFrame(rows, "word: string").repartition(16)
    cand = {r["word"] for r in misra_gries_candidates(df, "word", capacity=16).collect()}
    # N/capacity = 1000; each heavy value has freq 2000 > N/capacity
    assert {"heavy0", "heavy1", "heavy2"} <= cand
    # and the sweep kept bounded state: far fewer candidates than distinct values
    assert len(cand) <= 16 * 16  # capacity * n_partitions


def test_heavy_hitters_exact_topk(spark):
    from bears_spark.functions.sketch import heavy_hitters_exact_topk

    rows = [("w%03d" % (i % 40),) for i in range(4000) for _ in range((i % 40 < 5) * 4 + 1)]
    df = spark.createDataFrame(rows, "word: string").repartition(8)
    got = [(r["word"], r["cnt"]) for r in heavy_hitters_exact_topk(df, "word", k=7, capacity=64).collect()]
    exact = (
        df.groupBy("word").agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "word").limit(7).collect()
    )
    assert got == [(r["word"], r["cnt"]) for r in exact]
