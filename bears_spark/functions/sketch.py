"""Sketch-based approximate aggregation + data-layout operators.

Fixed-size-state summaries are the scale path for 100 TB interactive
analytics: a HyperLogLog register table is 2^p rows no matter how many
input rows it summarizes, a count-min sketch is depth*width counters, a
Bloom filter is m bits. Each operator here is a *deterministic* sketch
built from the shared md5 hash family (``functions/hashing.md5_hash64``),
so an independent engine (the DuckDB oracle) reproduces the sketch — and
its estimates — bit-for-bit. Spark's own ``approx_count_distinct`` /
``count_min_sketch`` builtins are faster but engine-opaque; these exist to
make the *algorithm* a first-class, verifiable operator.

The reference has no sketches (beyond-scope capability per SURVEY.md §2 —
its nearest surface is ``ScalableSeries.nunique`` which is exact-only,
src/bears/core/frame/ScalableSeries.py:968); these follow the published
algorithms: HLL (Flajolet et al. 2007), CMS (Cormode & Muthukrishnan
2005), Bloom (1970), Z-order (Morton 1966).

Cross-engine exactness strategy: every sketch register is computed in
signed-int64 arithmetic (md5 → 60-bit int, mod/shift/mask); the only
floating-point step is the final HLL estimate, a single
literal/int64 IEEE division that is bit-identical everywhere. No float
summation anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bears_spark.functions.hashing import md5_hash64

# --------------------------------------------------------------------------
# HyperLogLog

HLL_HASH_BITS = 60  # md5_hash64 yields values in [0, 2^60)


def hll_alpha(m: int) -> float:
    """Standard HLL bias-correction constant (Flajolet et al. 2007 Fig. 3)."""
    if m >= 128:
        return 0.7213 / (1 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def hll_registers(
    df: DataFrame,
    col: str,
    p: int = 10,
    out_bucket: str = "bucket",
    out_rho: str = "rho",
    with_exact: bool = False,
    by: tuple[str, ...] = (),
) -> DataFrame:
    """HLL register table: 2^p rows of (bucket, max leading-zero rank).

    bucket = low p bits of the 60-bit hash; rho = 1 + leading zeros of the
    remaining (60-p)-bit word. Bit length is computed as
    ``length(bin(w))`` — exact integer arithmetic, no log2 float round-off
    (DuckDB mirrors with ``length(bin(w))``).

    One shuffle on a uniform 2^p-ary key with map-side partial max — the
    classic mergeable-sketch shape; at 100 TB the reduce state is still
    2^p rows.
    """
    m = 1 << p
    h = md5_hash64(F.col(col))
    # h div 2^p via shiftright — h is a 60-bit value, so going through the
    # Column `/` operator (double division) would lose bits past 2^53.
    w = F.shiftright(h, p)
    wbits = HLL_HASH_BITS - p
    rho = F.when(w == 0, F.lit(wbits + 1)).otherwise(F.lit(wbits + 1) - F.length(F.bin(w)))
    aggs = [F.max(out_rho).alias(out_rho)]
    if with_exact:
        # every key lands in exactly one bucket (bucket = f(hash(key))), so
        # per-bucket distinct counts sum to the global exact distinct —
        # lets callers get sketch + ground truth from ONE scan, no join
        aggs.append(F.countDistinct(col).alias("nd"))
    return (
        df.select(*by, F.col(col), (h % m).alias(out_bucket), rho.cast("int").alias(out_rho))
        .groupBy(*by, out_bucket)
        .agg(*aggs)
    )


def hll_estimate(
    df: DataFrame, col: str, p: int = 10, with_exact: bool = False, by: tuple[str, ...] = ()
) -> DataFrame:
    """One-row DataFrame: deterministic raw-HLL distinct estimate of ``col``.

    Columns: ``n_buckets_hit`` (registers with data), ``sum_scaled``
    (integer-exact sum of 2^(S-rho), S = 61-p, empty registers contribute
    2^S), ``hll_estimate`` (alpha * m^2 / sum 2^-rho).

    The scaled sum keeps all 2^-rho mass in int64 (max m * 2^S = 2^61), so
    register-merge order can't perturb the result; the estimate is then a
    single literal/int64 division — IEEE-identical across engines. Raw
    estimator only (no small-range linear-counting branch): deterministic
    for any input, accurate for n >> 2.5*m.

    When ``by`` is given, one estimate row per group — the registers shuffle
    on (group, bucket) with map-side partial max, i.e. the sketch is
    mergeable per group (the same shape a 1000-executor rollup of
    pre-aggregated per-partition sketches takes).
    """
    m = 1 << p
    s = HLL_HASH_BITS + 1 - p  # max rho, so 2^(S-rho) >= 1 stays integral
    regs = hll_registers(df, col, p, with_exact=with_exact, by=by)
    numer = hll_alpha(m) * m * m * (1 << s)  # exact double literal, same in SQL
    aggs = [
        F.count("*").alias("n_buckets_hit"),
        (
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {s} - rho)"))
            + (F.lit(m) - F.count("*")) * F.lit(1 << s).cast("bigint")
        ).alias("sum_scaled"),
    ]
    out = [*by, "n_buckets_hit", "sum_scaled", (F.lit(numer) / F.col("sum_scaled")).alias("hll_estimate")]
    if with_exact:
        aggs.append(F.sum("nd").alias("exact_distinct"))
        out.append("exact_distinct")
    return regs.groupBy(*by).agg(*aggs).select(*out)


# --------------------------------------------------------------------------
# Count-min sketch


def cms_build(df: DataFrame, col: str, depth: int = 4, width: int = 512) -> DataFrame:
    """Count-min sketch of ``col`` frequencies: (row, bucket, cnt) counters.

    Row i uses hash h_i(x) = md5('i:'||x) % width. One explode (depth rows
    per input) + one shuffle on (row, bucket) with map-side partial count;
    reduce state is depth*width counters regardless of input size. Counters
    are exact int64 — the sketch is deterministic, only lookups are
    approximate (over-counting from collisions).
    """
    hashes = F.array(
        *[
            F.struct(F.lit(i).alias("row"), (md5_hash64(F.col(col), salt=i) % width).alias("bucket"))
            for i in range(depth)
        ]
    )
    cell = F.explode(hashes).alias("cell")
    return (
        df.select(cell)
        .select(F.col("cell.row").alias("row"), F.col("cell.bucket").alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_lookup(sketch: DataFrame, probes: DataFrame, col: str, depth: int = 4, width: int = 512) -> DataFrame:
    """Point-estimate frequencies for ``probes[col]`` from a cms_build sketch.

    est(x) = min over rows i of sketch[i, h_i(x)] — the classic CMS lookup;
    guaranteed >= true count, over by at most ~n/width w.h.p. The sketch is
    tiny (depth*width rows) so Spark broadcast-joins it to the probes.
    """
    hashes = F.array(
        *[
            F.struct(F.lit(i).alias("row"), (md5_hash64(F.col(col), salt=i) % width).alias("bucket"))
            for i in range(depth)
        ]
    )
    probed = probes.select(F.col(col), F.explode(hashes).alias("cell")).select(
        col, F.col("cell.row").alias("row"), F.col("cell.bucket").alias("bucket")
    )
    return (
        probed.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce("cnt", F.lit(0).cast("bigint"))).alias("cms_cnt"))
    )


# --------------------------------------------------------------------------
# Bloom-filter join pruning


def bloom_positions(key: Column, m_bits: int, k: int) -> Column:
    """array<bigint> of the k Bloom bit positions for a key."""
    return F.array(*[md5_hash64(key, salt=i) % m_bits for i in range(k)])


def bloom_build(small: DataFrame, key: str, m_bits: int = 4096, k: int = 3) -> set[int]:
    """Fit phase: the set of Bloom bit positions lit by the build side.

    Driver-side state is bounded by m_bits (<= m_bits/8 bytes as a bitmap)
    regardless of build-side row count — the standard fit→broadcast pattern
    (same shape as LabelEncoding/TFIDF fit). The distinct() runs
    distributed; only <= m_bits ints are collected.
    """
    rows = (
        small.select(F.explode(bloom_positions(F.col(key), m_bits, k)).alias("pos")).distinct().collect()
    )
    return {r["pos"] for r in rows}


def bloom_prune(big: DataFrame, key: str, positions: set[int], m_bits: int = 4096, k: int = 3) -> DataFrame:
    """Filter ``big`` to rows whose key passes the Bloom membership test.

    The bitmap becomes a literal array<boolean> of m_bits entries; each row
    costs k (hash, mod, element_at) integer ops — pure codegen'd
    expressions, no Python, no join. False positives pass (removed by the
    real join that follows); false negatives are impossible, so
    ``bloom_prune(big) JOIN small == big JOIN small`` exactly.

    At scale this cuts the shuffle *before* it happens: a selective build
    side (e.g. one nation's suppliers) prunes the fact-table shuffle by the
    filter's selectivity — the same job AQE's runtime bloom filter does,
    but usable explicitly, with a tunable m/k, and above any expression
    (AQE's requires a join the optimizer can already see).
    """
    bitmap = F.lit([i in positions for i in range(m_bits)])
    cond = None
    for i in range(k):
        probe = F.element_at(bitmap, (md5_hash64(F.col(key), salt=i) % m_bits).cast("int") + 1)
        cond = probe if cond is None else (cond & probe)
    return big.filter(cond)


# --------------------------------------------------------------------------
# Z-order (Morton) clustering


def zorder_quantize(col: Column, vmin: Column | int, vmax: Column | int, bits: int) -> Column:
    """Scale an integer column into [0, 2^bits): ((v-min)*(2^bits-1)) div (max-min).

    All-integer arithmetic — no float division that could round differently
    across engines. Degenerate max==min maps to 0.
    """
    vmin_c = F.lit(vmin) if isinstance(vmin, int) else vmin
    vmax_c = F.lit(vmax) if isinstance(vmax, int) else vmax
    span = (vmax_c - vmin_c).cast("bigint")
    scaled = (col.cast("bigint") - vmin_c.cast("bigint")) * F.lit((1 << bits) - 1).cast("bigint")
    # Exact integer floor-division without `div` (Column `/` is double
    # division, which can round a just-below-integer quotient up): subtract
    # the remainder first so the quotient is an exact multiple — IEEE
    # division of exactly-divisible <2^53 values is then exact.
    exact_q = ((scaled - F.pmod(scaled, span)) / span).cast("bigint")
    return F.when(span == 0, F.lit(0).cast("bigint")).otherwise(exact_q)


def zorder_key(cols: list[Column], bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of each (already-quantized) column
    into one Morton key: bit j of column c lands at position j*n_cols + c.

    Built as a sum of (bit << target) terms — integer-exact, reproducible in
    any engine with div/mod.
    """
    n = len(cols)
    terms = []
    for ci, c in enumerate(cols):
        cb = c.cast("bigint")
        for j in range(bits):
            terms.append(
                F.when(cb.bitwiseAND(F.lit(1 << j).cast("bigint")) != 0, F.lit(1 << (j * n + ci)).cast("bigint")).otherwise(
                    F.lit(0).cast("bigint")
                )
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_layout(df: DataFrame, quantized_cols: list[Column], bits: int = 8, num_partitions: int | None = None) -> DataFrame:
    """Cluster ``df`` by the Morton key of the given quantized columns:
    range-partition + sort-within-partition on the z-value.

    The write-side payoff: parquet row-group min/max on EVERY interleaved
    dimension becomes selective, so point/range predicates on any of the
    dimensions prune row groups (multi-dimensional data skipping), where a
    plain sort only skips on its leading column. ``repartitionByRange``
    samples the key distribution, so partition bounds adapt to skew.
    """
    z = zorder_key(quantized_cols, bits).alias("__zorder__")
    with_z = df.withColumn("__zorder__", z)
    n = num_partitions or with_z.rdd.getNumPartitions()
    return with_z.repartitionByRange(n, "__zorder__").sortWithinPartitions("__zorder__").drop("__zorder__")


# --------------------------------------------------------------------------
# Deterministic equi-width histogram + interpolated quantiles


def equiwidth_histogram(df: DataFrame, col: str, bins: int, vmin: float, vmax: float) -> DataFrame:
    """Fixed-state distribution sketch: (bin, cnt) with
    bin = clamp(floor((v - vmin) / (vmax - vmin) * bins), 0, bins-1).

    ``bins`` rows of state regardless of input size, one partial-agg
    shuffle — the scale path for percentile dashboards where
    ``percentile_approx``'s engine-internal sketch can't be reproduced by
    an independent checker. Every arithmetic step is a fixed IEEE op
    sequence, so any engine rebuilding it gets identical buckets.
    """
    span = vmax - vmin  # python-float subtraction == SQL double subtraction
    pos = F.floor((F.col(col) - F.lit(vmin)) / F.lit(span) * F.lit(bins))
    b = F.least(F.greatest(pos, F.lit(0).cast("bigint")), F.lit(bins - 1).cast("bigint"))
    return (
        df.filter(F.col(col).isNotNull())
        .select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("cnt"))
    )


def histogram_quantiles(
    hist: list[tuple[int, int]], qs: list[float], bins: int, vmin: float, vmax: float
) -> list[tuple[float, float]]:
    """Interpolated quantiles from a collected equi-width histogram
    (driver-side fit-state math over <= ``bins`` rows).

    For each q: find the first bin whose cumulative count reaches q*n, then
    interpolate uniformly inside it:
    value = vmin + (bin + (q*n - cum_before)/cnt) * (vmax - vmin)/bins.
    The op sequence is documented because independent engines must replay
    it exactly (see queries/sketchops.py oracle).
    """
    rows = sorted(hist)
    n = sum(c for _, c in rows)
    width = (vmax - vmin) / bins
    out = []
    for q in qs:
        target = q * n
        cum_before = 0
        for b, cnt in rows:
            if cum_before + cnt >= target:
                frac = (target - cum_before) / cnt
                out.append((q, vmin + (b + frac) * width))
                break
            cum_before += cnt
        else:
            out.append((q, vmax))
    return out


def hilbert_key_2d(x_col: Column, y_col: Column, bits: int = 16) -> Column:
    """Hilbert-curve key for two pre-quantized integer columns (each in
    [0, 2^bits)) — better multi-dimensional locality than the Morton/Z key
    (no quadrant jumps), so parquet min/max row-group stats prune tighter on
    range predicates over BOTH dimensions.

    The per-level rotate/reflect recurrence isn't expressible as Catalyst
    expressions without exponential tree growth (each level references the
    rotated coordinates twice), so this is a vectorized Arrow pandas_udf —
    numpy bit ops over the whole batch, no per-row Python."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no type hints: `from __future__ import annotations` stringifies them
    # and pandas_udf's hint resolver can't see the local pd import
    @pandas_udf("bigint")
    def _hilbert(xs, ys):
        x = xs.to_numpy(dtype=np.int64, na_value=0).copy()
        y = ys.to_numpy(dtype=np.int64, na_value=0).copy()
        d = np.zeros_like(x)
        s = np.int64(1) << (bits - 1)
        while s > 0:
            rx = ((x & s) > 0).astype(np.int64)
            ry = ((y & s) > 0).astype(np.int64)
            d += s * s * ((3 * rx) ^ ry)
            # rotate quadrant: where ry==0 (and reflect where rx==1)
            rot = ry == 0
            refl = rot & (rx == 1)
            x_r = np.where(refl, s - 1 - x, x)
            y_r = np.where(refl, s - 1 - y, y)
            x, y = np.where(rot, y_r, x_r), np.where(rot, x_r, y_r)
            s >>= 1
        return pd.Series(d)

    return _hilbert(x_col, y_col)


def hilbert_layout(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Rewrite a table in 2-D Hilbert order (quantize both columns from
    their global min/max, key, range-partition + sort) — drop-in alternative
    to the Z-order layout with strictly better curve locality."""
    bounds = df.agg(
        F.min(col_a).alias("a_min"), F.max(col_a).alias("a_max"),
        F.min(col_b).alias("b_min"), F.max(col_b).alias("b_max"),
    ).first()
    qa = zorder_quantize(F.col(col_a), int(bounds["a_min"]), int(bounds["a_max"]), bits)
    qb = zorder_quantize(F.col(col_b), int(bounds["b_min"]), int(bounds["b_max"]), bits)
    keyed = df.withColumn("__hkey__", hilbert_key_2d(qa, qb, bits))
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return keyed.repartitionByRange(n, "__hkey__").sortWithinPartitions("__hkey__").drop("__hkey__")


# --------------------------------------------------------------------------
# KMV theta sketch (k-minimum values) + set algebra


KMV_RANGE = 1 << HLL_HASH_BITS  # hash values are uniform in [0, 2^60)


def kmv_sketch(df: DataFrame, col: str, k: int = 256, prefilter_min_distinct: int | None = None) -> DataFrame:
    """K-minimum-values sketch: the k smallest distinct 60-bit hashes of
    ``col`` (Bar-Yossef et al. 2002 / the Theta sketch of Dasgupta et al.).

    Plan shape: hash -> map-side-dedup HashAggregate -> TakeOrderedAndProject
    (partial per-partition top-k, then a k-row merge on the driver side of
    the exchange) — never a global sort. The distinct shuffle carries only
    per-partition-distinct hashes; when the caller can lower-bound the
    distinct count, ``prefilter_min_distinct`` cuts that to ~8k rows total by
    discarding hashes that cannot be among the k global minima
    (P[h < 8k/n_min * 2^60 for a uniform hash] covers the k minima with
    overwhelming margin; the safety factor 8 makes the miss probability
    < e^-k by Chernoff — at k=256 that is ~1e-111, i.e. never).
    """
    h = md5_hash64(F.col(col))
    out = df.select(h.alias("hv")).where(F.col("hv").isNotNull())
    if prefilter_min_distinct and prefilter_min_distinct > 8 * k:
        cap = (8 * k * KMV_RANGE) // prefilter_min_distinct
        out = out.where(F.col("hv") < F.lit(cap))
    return out.distinct().orderBy("hv").limit(k)


def kmv_estimate(sketch: DataFrame, k: int) -> DataFrame:
    """One-row distinct-count estimate from a KMV sketch: (k-1) / U(h_k)
    where U normalizes the k-th smallest hash to (0,1]. If the sketch holds
    fewer than k hashes the set was smaller than k and the count is EXACT.
    Single float division at the end — deterministic cross-engine."""
    agg = sketch.agg(F.count("*").alias("n"), F.max("hv").alias("theta"))
    return agg.select(
        F.when(F.col("n") < k, F.col("n").cast("double"))
        .otherwise(F.lit(float(k - 1)) * F.lit(float(KMV_RANGE)) / F.col("theta"))
        .alias("kmv_estimate"),
        "n",
        "theta",
    )


def kmv_set_algebra(sketch_a: DataFrame, sketch_b: DataFrame, k: int = 256) -> DataFrame:
    """Theta-sketch union / intersection / Jaccard estimates from two KMV
    sketches built with the same k and hash family.

    theta = min(theta_a, theta_b) (the stricter of the two sampling
    thresholds; a sketch with fewer than k values is exhaustive, its theta
    is the full hash range). Below theta every distinct hash of either set
    is retained, so the retained region is a uniform sample of the union:
      union_est     = |A' U B'| / U(theta)
      intersect_est = |A' ∩ B'| / U(theta)
      jaccard_est   = |A' ∩ B'| / |A' U B'|
    All counting is exact int64 over <= 2k rows (broadcast-joined); the two
    trailing divisions are single IEEE ops. Sketches merge associatively, so
    a 1000-executor rollup unions per-partition sketches first and pays one
    k-row reduce."""
    a = sketch_a.select(F.col("hv").alias("hv"))
    b = sketch_b.select(F.col("hv").alias("hv"))

    def _theta(s: DataFrame) -> DataFrame:
        return s.agg(
            F.when(F.count("*") < k, F.lit(KMV_RANGE).cast("bigint")).otherwise(F.max("hv")).alias("theta")
        )

    theta = (
        _theta(a).crossJoin(_theta(b).withColumnRenamed("theta", "theta_b"))
        .select(F.least("theta", "theta_b").alias("theta"))
    )
    merged = a.unionByName(b).distinct()
    both = a.join(b, "hv", "left_semi")
    # theta is one row — broadcast it under both counts (2k-row frames)
    kept = merged.crossJoin(F.broadcast(theta)).where(F.col("hv") < F.col("theta"))
    kept_both = both.crossJoin(F.broadcast(theta)).where(F.col("hv") < F.col("theta"))
    cu = kept.agg(F.count("*").alias("n_union"), F.max(F.col("theta")).alias("theta"))
    ci = kept_both.agg(F.count("*").alias("n_intersect"))
    return cu.crossJoin(ci).select(
        "n_union",
        "n_intersect",
        "theta",
        (F.col("n_union") * F.lit(float(KMV_RANGE)) / F.col("theta")).alias("union_est"),
        (F.col("n_intersect") * F.lit(float(KMV_RANGE)) / F.col("theta")).alias("intersect_est"),
        (F.col("n_intersect").cast("double") / F.col("n_union")).alias("jaccard_est"),
    )


# --------------------------------------------------------------------------
# Heavy hitters: Misra-Gries candidates + exact recount (two-pass exact top-k
# in bounded memory)


def misra_gries_candidates(df: DataFrame, col: str, capacity: int = 64) -> DataFrame:
    """Per-partition Misra-Gries summaries, merged into a global candidate
    set with frequency lower/upper bounds.

    Guarantee (Misra & Gries 1982): any value with partition frequency
    > n_p/capacity survives that partition's summary; by pigeonhole, any
    value with GLOBAL frequency > N/capacity survives in >= 1 partition — so
    the union of per-partition candidates is a superset of every global
    heavy hitter. State is ``capacity`` counters per partition, emitted rows
    <= capacity * n_partitions. Output: value, count_lb (sum of surviving MG
    counters: a lower bound), decrement_ub (sum of per-partition decrement
    bounds: count <= count_lb + decrement_ub).
    """
    import pandas as pd

    def _mg(batches):
        counters: dict = {}
        decremented = 0
        for pdf in batches:
            for v in pdf[col].dropna():
                if v in counters:
                    counters[v] += 1
                elif len(counters) < capacity:
                    counters[v] = 1
                else:
                    decremented += 1
                    dead = []
                    for kk in counters:
                        counters[kk] -= 1
                        if counters[kk] == 0:
                            dead.append(kk)
                    for kk in dead:
                        del counters[kk]
        if counters:
            yield pd.DataFrame(
                {col: list(counters), "count_lb": list(counters.values()), "decrement_ub": decremented}
            )

    field = df.schema[col]
    out_schema = f"`{col}` {field.dataType.simpleString()}, count_lb long, decrement_ub long"
    per_part = df.select(col).mapInPandas(_mg, schema=out_schema)
    return per_part.groupBy(col).agg(
        F.sum("count_lb").alias("count_lb"), F.sum("decrement_ub").alias("decrement_ub")
    )


def heavy_hitters_exact_topk(df: DataFrame, col: str, k: int = 10, capacity: int = 64) -> DataFrame:
    """Exact global top-k frequencies in two bounded-memory passes:
    (1) Misra-Gries candidate sweep (capacity counters/partition), (2) exact
    recount of ONLY the candidates via a broadcast semi-join, then top-k.

    Exactness condition: the true k-th frequency must exceed N/capacity
    (candidates are guaranteed to include every such value). With Zipf-like
    data and capacity >= ~8k this always holds; the caller can verify from
    the output since count_k and N are both known. At 100 TB the recount
    shuffles only rows matching <= capacity * n_partitions candidate values.
    Ties at the k boundary break deterministically by value."""
    cand = misra_gries_candidates(df, col, capacity).select(col)
    exact = (
        df.join(F.broadcast(cand), col, "left_semi")
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
    )
    return exact.orderBy(F.col("cnt").desc(), F.col(col)).limit(k)
