"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — a single scan + distributed
  TakeOrderedAndProject; the right baseline and often the right answer even at
  scale when k is small (no index build, perfect recall).
- ``lsh_topk``: random-hyperplane LSH bucket search — probes only rows whose
  sign-bucket matches the query's, trading recall for a >10x candidate cut.
  Hyperplanes are seeded-deterministic (md5 of (plane, dim)), so results are
  reproducible across runs and engines.
- ``ivf_topk``: IVF-style two-stage search against precomputed centroids.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bears_spark.localframe import local_df

from bears_spark.functions.vectors import cosine_similarity, dot, l2_norm


def _query_lit(query_vec: Sequence[float]):
    from bears_spark.functions.litutil import double_lit

    return double_lit([float(v) for v in query_vec])  # ONE py4j call, not dim lit() calls


def cosine_topk(df: DataFrame, id_col: str, vec_col: str, query_vec: Sequence[float], k: int = 10) -> DataFrame:
    """Exact top-k by cosine similarity to ``query_vec``.

    orderBy+limit compiles to TakeOrderedAndProject: each partition keeps its
    local top-k, driver merges — no global sort, no shuffle of the data.
    """
    q = _query_lit(query_vec)
    return (
        df.select(
            F.col(id_col),
            cosine_similarity(F.col(vec_col), q).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def rp_signs(dim: int, out_dim: int, salt: int = 0) -> list[list[int]]:
    """Deterministic ±1 (Achlioptas-style) random-projection matrix: sign of
    component (i, j) from the low bit of md5. Pure Python at plan-build
    time — baked into the plan as literals, reproducible on any engine."""
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"rp{salt}:{i}:{j}".encode()).hexdigest()[:15], 16) & 1 else -1
            for j in range(dim)
        ]
        for i in range(out_dim)
    ]


def random_projection(
    df: DataFrame, id_col: str, vec_col: str, dim: int, out_dim: int = 8, salt: int = 0, scale: int = 1_000_000
) -> DataFrame:
    """Signed ±1 random projection — the cheap Johnson-Lindenstrauss
    dimensionality reduction used to shrink embeddings before clustering or
    coarse ANN. Components come out as exact integers in 1/``scale`` units:
    vectors are quantized with floor(v*scale) (floor of an identical IEEE
    double is bit-deterministic on every engine, unlike round()'s
    tie-breaking) and each output is a ±sum of quantized components —
    integer arithmetic end to end, so an independent engine reproduces it
    exactly.

    Plan shape: one staged quantization projection (the token-array rule:
    stage once, read out_dim times — no CSE across projection elements),
    then out_dim zip_with/aggregate passes over the staged array. Map-only;
    no shuffle; O(dim*out_dim) per row."""
    signs = rp_signs(dim, out_dim, salt)
    staged = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: F.floor(x * F.lit(float(scale))).cast("long")).alias("__q__"),
    )
    outs = []
    for i, row in enumerate(signs):
        srow = F.lit(list(row))
        comp = F.aggregate(
            F.zip_with(F.col("__q__"), srow, lambda a, b: a * b),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        outs.append(comp.alias(f"p{i}"))
    return staged.select(id_col, *outs)


def _hyperplane(plane_idx: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component j = centered value
    from md5(plane_idx:j). Matches nothing engine-specific — pure Python at
    plan-build time, baked into the plan as literals."""
    import hashlib

    comps = []
    for j in range(dim):
        h = int(hashlib.md5(f"{plane_idx}:{j}".encode()).hexdigest()[:15], 16)
        comps.append((h / float(1 << 60)) - 0.5)
    return comps


def signature_bits(vec_col, planes: list[list[float]]):
    """Sign-bucket of a vector vs a set of hyperplanes -> int bucket id."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        d = dot(vec_col, F.lit(list(plane)))
        bucket = bucket + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: Sequence[float],
    k: int = 10,
    num_planes: int = 4,
) -> DataFrame:
    """Approximate top-k: search only the query's random-hyperplane bucket.

    At scale the bucket column is precomputed & the table bucketed/partitioned
    by it, turning every query into a partition-pruned scan of ~n/2^planes
    rows. Here the bucket is computed on the fly from the same plan.
    """
    dim = len(query_vec)
    planes = [_hyperplane(i, dim) for i in range(num_planes)]
    q_bucket = 0
    for i, plane in enumerate(planes):
        if sum(p * float(v) for p, v in zip(plane, query_vec)) > 0:
            q_bucket |= 1 << i
    q = _query_lit(query_vec)
    return (
        df.withColumn("__bucket__", signature_bits(F.col(vec_col), planes))
        .filter(F.col("__bucket__") == q_bucket)
        .select(F.col(id_col), cosine_similarity(F.col(vec_col), q).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def kmeans_centroids(
    df: DataFrame,
    vec_col: str,
    k: int = 16,
    seed: int = 42,
    max_iter: int = 20,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Coarse quantizer for IVF: seeded pyspark.ml KMeans over the embedding
    column -> DataFrame(centroid_id int, centroid array<double>).

    At corpus scale, fit on a sample (``sample_fraction``) — centroid quality
    saturates long before the full data is seen, and the assignment step in
    ivf_topk touches every row anyway. Deterministic per (seed, Spark
    version); build once per corpus and persist the (tiny) result.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    src = df.sample(fraction=sample_fraction, seed=seed) if sample_fraction else df
    feats = src.select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(feats)
    spark = df.sparkSession
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    cents = local_df(spark, rows, "centroid_id int, centroid array<double>")
    cents._bears_local_rows = rows  # see _centroid_sim_structs
    return cents


def assign_centroids(df: DataFrame, id_col: str, vec_col: str, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment by cosine: broadcast the (tiny) centroid
    set onto every row and keep the best match per ``id_col``.

    Deterministic: ties on cosine break by ascending centroid_id, so the
    assignment is reproducible across runs AND engines (the DuckDB oracle
    uses the identical row_number ordering). Adds ``centroid_id``; all other
    input columns pass through. One broadcast nested-loop over k centroids
    per row — no shuffle; the row_number window partitions by ``id_col``
    (high-cardinality, uniform), which AQE handles at any scale.
    """
    from pyspark.sql import Window

    return (
        df.crossJoin(F.broadcast(centroids))
        .withColumn("__csim", cosine_similarity(F.col(vec_col), F.col("centroid")))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(F.desc("__csim"), F.asc("centroid_id"))
            ),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__csim", "centroid")
    )


def assign_centroids_expr(vec_col, centroids) -> "F.Column":
    """Expression-only nearest-centroid id — no join, no window, so it is
    STREAM-TRANSPARENT (usable in an append-mode readStream projection) and
    keeps batch scans join-free.

    The centroid set is baked into the plan as ONE nested-array literal
    (per-element lit() calls were the dominant plan-build cost — see
    ivfpq_topk); per row it computes the exact cosine to each centroid and
    arg-maxes via a lexicographic struct max over (cos, -position).
    Positions follow ascending centroid_id, so ties break to the lowest id —
    the identical ordering assign_centroids' row_number uses, which keeps
    batch, streaming, and the DuckDB oracle assignment-for-assignment equal.

    ``centroids``: DataFrame(centroid_id, centroid) or pre-collected rows.
    """
    cids, sims = _centroid_sim_structs(vec_col, centroids)
    best_pos = -F.array_max(sims)["negid"]
    # positions -> centroid ids (ids can be non-contiguous when a Lloyd
    # update empties a cluster)
    return F.element_at(F.lit(cids), (best_pos + F.lit(1)).cast("int"))


def _centroid_sim_structs(vec_col, centroids):
    """(sorted centroid ids, array<struct(cos, negid)> column): exact cosine
    of the row vector to every centroid, positions ascending by centroid_id.
    Lexicographic max/sort over (cos, -position) breaks cosine ties to the
    LOWEST centroid id — the shared tie rule of every assignment path.

    nullif + coalesce(-2): a zero-norm vector would hit ANSI
    divide-by-zero; instead its cosines all collapse to -2 (below any real
    cosine) and the tie-break deterministically assigns the lowest cid.

    Centroid DataFrames built from driver-local rows (seeded_lloyd_centroids)
    carry them as ``_bears_local_rows``: collect() on a createDataFrame
    result launches one Python-worker task per default-parallelism slice
    (measured 7.8 s of executor time for EIGHT rows on local[32] — almost
    all worker fork, zero compute), so the local rows are reused instead."""
    rows = getattr(centroids, "_bears_local_rows", None)
    if rows is None:
        rows = centroids.collect() if isinstance(centroids, DataFrame) else centroids
    cent = sorted(
        (int(r["centroid_id"]), [float(x) for x in r["centroid"]])
        if not isinstance(r, tuple)
        else (int(r[0]), [float(x) for x in r[1]])
        for r in rows
    )
    cids = [cid for cid, _ in cent]
    from bears_spark.functions.litutil import double_lit

    cmat_lit = double_lit([c for _, c in cent])
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    vnorm = F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double"))
    )
    sims = F.transform(
        cmat_lit,
        lambda c, i: F.struct(
            F.coalesce(
                F.aggregate(
                    F.zip_with(v, c, lambda x, y: x.cast("double") * y),
                    F.lit(0.0),
                    lambda a, t: a + t,
                )
                / F.nullif(
                    vnorm * F.sqrt(F.aggregate(c, F.lit(0.0), lambda a, y: a + y * y)),
                    F.lit(0.0),
                ),
                F.lit(-2.0),
            ).alias("cos"),
            (-i).alias("negid"),
        ),
    )
    return cids, sims


def simplified_silhouette_expr(vec_col, centroids) -> "F.Column":
    """Per-row struct(cid, sil): the assigned (nearest-cosine) centroid id
    and the SIMPLIFIED silhouette (Hruschka et al. 2004 — centroid distances
    in place of all-pairs distances, the standard O(n*k) large-scale
    variant; sklearn's silhouette is O(n^2) and unusable at corpus scale):
    a = cosine distance to the own centroid, b = to the second-nearest,
    s = (b - a) / max(a, b), defined 0 when max(a, b) == 0 or k == 1.

    Expression-only (centroids baked as one literal, sort_array for the
    top-2) — map-only over the scan, stream-transparent, no join/window."""
    cids, sims = _centroid_sim_structs(vec_col, centroids)
    ordered = F.sort_array(sims, asc=False)  # best (cos, lowest-id-tie) first
    best = ordered[0]
    cid = F.element_at(F.lit(cids), (-best["negid"] + F.lit(1)).cast("int"))
    if len(cids) == 1:
        return F.struct(cid.alias("cid"), F.lit(0.0).alias("sil"))
    second = ordered[1]
    a = F.lit(1.0) - best["cos"]
    b = F.lit(1.0) - second["cos"]
    sil = F.when(F.greatest(a, b) > 0, (b - a) / F.greatest(a, b)).otherwise(F.lit(0.0))
    return F.struct(cid.alias("cid"), sil.alias("sil"))


def seeded_lloyd_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    salt: str = "semseed",
    iters: int = 1,
    mean_round: int = 9,
) -> DataFrame:
    """Cross-engine-reproducible k-means: seeded-row init + ``iters`` Lloyd
    mean updates, each mean ROUNDED to ``mean_round`` decimals.

    Plain KMeans fits are not value-gradeable across engines (float summation
    order drifts and compounds per iteration — see the ivfpq seeded-row
    note). This variant stays gradeable: the init rows are the ``k`` corpus
    rows with the smallest salted md5 of ``id_col`` (exact in any engine),
    and rounding each updated mean to 9 decimals absorbs the ~1e-16 ulp
    difference between Spark's and DuckDB's summation orders, so both
    engines reassign against bit-identical centroids.

    Scale: each iteration is one broadcast assignment plus one
    posexplode + groupBy((centroid, dim)) average — k*dim cells of state,
    partial-aggregated map-side; the only collect is k*dim doubles.
    """
    from bears_spark.functions.hashing import md5_hash64

    spark = df.sparkSession
    seeds = (
        df.select(id_col, vec_col, md5_hash64(id_col, salt=salt).alias("__h"))
        .orderBy("__h", id_col)
        .limit(k)
        .collect()
    )
    cent_rows = [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(seeds)]
    for _ in range(iters):
        # expression-only assignment: map-only, no join/window in the fit scan
        cid = assign_centroids_expr(vec_col, cent_rows)
        # the assignment must be staged in its OWN projection: putting a
        # generator (posexplode) in the same select re-analyzes sibling
        # expressions and drops the struct field names inside the argmax
        # lambda (FIELD_NOT_FOUND on `negid`)
        assigned = df.select(cid.alias("__cid"), F.col(vec_col).cast("array<double>").alias("__v"))
        # (r11 A/B, kept explode: replacing posexplode+groupBy(cid, i) with
        # k*dim per-dimension column aggregates — avg(__v[0..dim)) — measured
        # ~10% SLOWER at sf0.1 (2.18-2.46 s vs 2.02-2.17 s on
        # dedup_semantic_clusters, interleaved blocks): 64 getItem+avg
        # buffers per row lose to the explode's codegen'd generator even
        # counting the (rows*dim) shuffle it avoids.)
        rows = (
            assigned.select("__cid", F.posexplode("__v").alias("__i", "__x"))
            .groupBy("__cid", "__i")
            .agg(F.round(F.avg("__x"), mean_round).alias("__mu"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cid.setdefault(r["__cid"], {})[r["__i"]] = r["__mu"]
        cent_rows = [
            (cid_, [dims[i] for i in sorted(dims)]) for cid_, dims in sorted(by_cid.items())
        ]
    out = local_df(spark, cent_rows, "centroid_id int, centroid array<double>")
    # expression builders (_centroid_sim_structs) read the driver-local rows
    # straight off the DataFrame instead of re-collecting them through a
    # Python-worker job per slice
    out._bears_local_rows = cent_rows
    return out


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: Sequence[float],
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """IVF search: assign rows to nearest centroid (broadcast join — centroid
    set is tiny), then scan only the ``nprobe`` centroids nearest the query.

    ``centroids``: DataFrame(centroid_id int, centroid array<double>) — from
    KMeans or any coarse quantizer, precomputed once per corpus.
    """
    q = _query_lit(query_vec)
    cent = centroids.select(
        F.col("centroid_id"), F.col("centroid"), cosine_similarity(F.col("centroid"), q).alias("qsim")
    )
    probe_ids = [r["centroid_id"] for r in cent.orderBy(F.desc("qsim"), F.asc("centroid_id")).limit(nprobe).collect()]

    from pyspark.sql import Window

    assigned = (
        df.crossJoin(F.broadcast(centroids))
        .withColumn("csim", cosine_similarity(F.col(vec_col), F.col("centroid")))
        .withColumn(
            "rn",
            F.row_number().over(
                # centroid_id tie-break keeps assignment deterministic (and
                # oracle-reproducible) when two centroids are equidistant
                Window.partitionBy(id_col).orderBy(F.desc("csim"), F.asc("centroid_id"))
            ),
        )
        .filter(F.col("rn") == 1)
    )
    return (
        assigned.filter(F.col("centroid_id").isin(probe_ids))
        .select(F.col(id_col), cosine_similarity(F.col(vec_col), q).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


# --------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011) — the ANN ladder's compression
# rung: split each vector into m subvectors, vector-quantize each subspace
# with its own 2^nbits-centroid codebook, store m small codes per vector
# (64-dim float32 -> m=8 bytes is a 32x cut). Search uses asymmetric
# distance (ADC): per query, an m x 2^nbits lookup table of exact
# query-subvector-to-centroid distances; a database vector's distance is m
# table lookups + adds — pure Spark expressions over the codes column, no
# Python in the scan path.


def pq_train(
    df: DataFrame,
    vec_col: str,
    m: int = 8,
    nbits: int = 4,
    seed: int = 42,
    max_iter: int = 20,
    sample_fraction: float | None = None,
) -> list[list[list[float]]]:
    """Train m per-subspace codebooks (2^nbits centroids each) with the same
    seeded KMeans as the IVF coarse quantizer. Returns
    codebooks[m][2^nbits][dim/m] — a few KB, broadcast by value. Fit on a
    sample at corpus scale; codebook quality saturates early."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    first = df.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = int(first["d"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    k = 1 << nbits
    src = df.sample(fraction=sample_fraction, seed=seed) if sample_fraction else df
    src = src.select(F.col(vec_col).cast("array<double>").alias("v")).persist()
    books: list[list[list[float]]] = []
    for s in range(m):
        sub = src.select(array_to_vector(F.slice("v", s * dsub + 1, dsub)).alias("features"))
        model = KMeans(k=k, seed=seed + s, maxIter=max_iter).fit(sub)
        books.append([[float(x) for x in c] for c in model.clusterCenters()])
    src.unpersist()
    return books


def pq_encode(df: DataFrame, id_col: str, vec_col: str, codebooks: list[list[list[float]]]) -> DataFrame:
    """Encode vectors -> (id, codes array<int>): per subspace, index of the
    nearest codebook centroid (L2, ties to the lowest index). Vectorized
    numpy over Arrow batches — one pass, map-only."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    m = len(codebooks)
    dsub = len(codebooks[0][0])
    cents = np.asarray(codebooks)  # [m, k, dsub]

    @pandas_udf("array<int>")
    def _enc(vecs):
        out = []
        for v in vecs:
            x = np.asarray(v, dtype=np.float64).reshape(m, dsub)
            # [m, k] squared distances; argmin takes the first (lowest) index
            d = ((cents - x[:, None, :]) ** 2).sum(axis=2)
            out.append(d.argmin(axis=1).astype("int32").tolist())
        return pd.Series(out)

    return df.select(F.col(id_col), _enc(F.col(vec_col).cast("array<double>")).alias("codes"))


def pq_topk(
    codes_df: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC search over PQ codes: build the query's m x 2^nbits distance
    table driver-side (exact float math, tiny), embed it as a literal
    nested array, and score each row with m element_at lookups + adds —
    whole-stage-codegen expressions, then TakeOrderedAndProject."""
    import numpy as np

    m = len(codebooks)
    dsub = len(codebooks[0][0])
    q = np.asarray(list(query_vec), dtype=np.float64).reshape(m, dsub)
    cents = np.asarray(codebooks)  # [m, k, dsub]
    table = ((cents - q[:, None, :]) ** 2).sum(axis=2)  # [m, k]
    from bears_spark.functions.litutil import double_lit

    tbl_lit = double_lit([[float(d) for d in row] for row in table])  # ONE py4j call, not m*k
    dist = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, i: acc
        + F.element_at(F.element_at(tbl_lit, i + F.lit(1)), F.element_at(F.col("codes"), i + F.lit(1)) + F.lit(1)),
    )
    return (
        codes_df.select(F.col(id_col), dist.alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(k)
    )


def ivfpq_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: Sequence[float],
    centroids,
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 2,
    score_round: int | None = None,
) -> DataFrame:
    """Composed IVF + PQ search (r4 VERDICT #6): probe the ``nprobe``
    coarse-centroid buckets nearest the query, ADC-rank the bucket members
    by their product-quantization codes.

    This is the standard billion-scale ANN recipe (FAISS IVFPQ without
    residual encoding — raw-vector codebooks keep the math
    oracle-reproducible; the cost model is identical). Both quantizers are
    tiny fit states baked into the plan as nested-array LITERALS (one
    F.lit per matrix — hundreds of per-element lit() calls were the
    dominant plan-build cost), so the scan has ZERO joins: filter ->
    (Arrow encode) -> TakeOrderedAndProject.

    Coarse assignment exploits |v| cancelling in the argmax:
    argmax_j cos(v, c_j) == argmax_j dot(v, c_j / |c_j|), so centroids are
    L2-normalized driver-side and the per-row work is one transform over
    the centroid matrix computing plain dots — no divisions, no norms.
    Cosines/dots sum left-to-right in every engine (F.aggregate, DuckDB
    list_sum, the Python probe loop below), keeping ties engine-identical.

    ``centroids``: DataFrame(centroid_id, centroid) or a pre-collected
    [(centroid_id, vector)] list (skips a collect job).
    ``score_round`` rounds the ADC distance before the rank cut so an
    oracle that rounds can't disagree on boundary ties.
    Returns (id_col, adc_dist) — ascending distance, id tiebreak.
    """
    import numpy as np

    rows = centroids.collect() if isinstance(centroids, DataFrame) else centroids
    cent_rows = sorted(
        (int(r["centroid_id"]), [float(x) for x in r["centroid"]])
        if not isinstance(r, tuple) else (int(r[0]), [float(x) for x in r[1]])
        for r in rows
    )
    qv = [float(x) for x in query_vec]

    def _seq_cosine(a: list[float], b: list[float]) -> float:
        dot = na = nb = 0.0
        for x, y in zip(a, b):  # left-to-right, matching F.aggregate/list_sum
            dot += x * y
            na += x * x
            nb += y * y
        return dot / (math.sqrt(na) * math.sqrt(nb))

    probe_ids = [
        cid
        for _, cid in sorted(
            ((-_seq_cosine(c, qv), cid) for cid, c in cent_rows)
        )[:nprobe]
    ]
    # L2-normalized centroid matrix as ONE nested-array literal
    cmat = []
    for _, c in cent_rows:
        nrm = math.sqrt(sum(x * x for x in c))
        cmat.append([x / nrm for x in c])
    from bears_spark.functions.litutil import double_lit

    cmat_lit = double_lit(cmat)
    v = F.col(vec_col)
    # per-centroid dot via a positional transform; arg-max with lowest-id
    # tiebreak via lexicographic struct max over (dot, -index)
    sims = F.transform(
        cmat_lit,
        lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(v, c, lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ).alias("s"),
            (-i).alias("negid"),
        ),
    )
    # array_max yields the POSITION in the sorted centroid list; map it back
    # to the real centroid_id before comparing against probe_ids — ids need
    # not be contiguous (seeded_lloyd_centroids can empty a cluster)
    cids = [cid for cid, _ in cent_rows]
    best_pos = (-F.array_max(sims)["negid"]).cast("int")
    best_cid = F.element_at(F.lit(cids), best_pos + F.lit(1))
    cands = df.filter(best_cid.isin(probe_ids)).select(id_col, vec_col)
    codes = pq_encode(cands, id_col, vec_col, codebooks)
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    qarr = np.asarray(qv, dtype=np.float64).reshape(m, dsub)
    cents = np.asarray(codebooks)  # [m, k, dsub]
    table = ((cents - qarr[:, None, :]) ** 2).sum(axis=2)  # [m, k] exact ADC table
    tbl_lit = double_lit([[float(d) for d in row] for row in table])
    dist = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, i: acc
        + F.element_at(F.element_at(tbl_lit, i + F.lit(1)), F.element_at(F.col("codes"), i + F.lit(1)) + F.lit(1)),
    )
    if score_round is not None:
        dist = F.round(dist, score_round)
    return (
        codes.select(F.col(id_col), dist.alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(k)
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngram_n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = 100,
) -> DataFrame:
    """All-pairs sparse TF-IDF cosine similarity over word n-gram terms
    (Bayardo et al.'s all-pairs problem, solved with the same blocking
    discipline as ``dedup.ngram_jaccard_pairs``): weighted overlap instead of
    set Jaccard, so heavily-repeated shared phrases count more than
    incidental ones.

    Plan shape: per-doc term frequencies (one explode + groupBy), an idf dim
    joined back (ln(N/df)), a document-frequency cap dropping terms in more
    than ``max_doc_freq`` docs (the hot-join-key guard that keeps the term
    self-join linear at web scale), then a self equi-join on the term key
    accumulating dot products — never a cross product. Norms are computed
    over the SAME capped term space, so cosine stays in [0, 1] and an
    independent engine reproduces it term-for-term. The output filter
    compares on round(cosine, 6), making the borderline decision identical
    in any engine that agrees to 6 decimals.

    Terms travel as ``xxhash64`` 8-byte keys, not strings — a word 3-gram
    averages ~25-30 B, so hashing cuts the bytes through the two groupBy
    shuffles and the self-join ~3x (same trade as ``ngram_jaccard_pairs``:
    a 64-bit collision could merge two terms, at ~N^2/2^65 odds —
    vanishing for any real vocabulary, and an engine reproducing the
    math on raw strings gets identical cosines).
    """
    from bears_spark.functions.text import word_ngrams

    terms = df.select(F.col(id_col), F.explode(word_ngrams(text_col, ngram_n)).alias("t")).select(
        id_col, F.xxhash64("t").alias("term")
    )
    from bears_spark.caching import scoped_persist

    # tf appears TWICE in wgt's plan (join left side + docfreq build), and
    # Spark has no common-subtree reuse across a DataFrame plan — without
    # this persist the tokenize+explode pass ran twice per wgt
    # materialization (profiled: three 4-6 s explode stages per run).
    # eager, with scoped_persist's once-per-plan guard: a COLD run's
    # concurrent AQE stage jobs race to rebuild unlocked tf blocks (the r11
    # unconditional-eager A/B that measured eager worse — lazy 1.41/1.82/
    # 1.83 s vs eager 1.77/1.92/2.02 s — paid a count() job on EVERY run,
    # warm included; the guard skips the count when the blocks already
    # exist, so the warm min keeps the lazy number while cold run 1 builds
    # once instead of racing). No widen_input for the same reason as
    # ngram_jaccard_pairs (persisted fan-out; cache reuse across runs
    # amortizes the single-split explode).
    tf = scoped_persist(terms.groupBy(id_col, "term").agg(F.count("*").alias("tf")), eager=True)
    docfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.select(F.count("*").alias("n"))
    wgt = (
        tf.join(docfreq.filter(F.col("df") <= max_doc_freq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(id_col, "term", "df", (F.col("tf") * F.log(F.col("n") / F.col("df"))).alias("wt"))
    )
    # Carry each doc's norm ON its term rows (full-partition window by id)
    # so cosine computes inside the pair aggregation via first(na)/first(nb)
    # — the same trick ngram_jaccard_pairs uses for set sizes. This removes
    # TWO joins of the (potentially huge) pair table against a norms table
    # plus the per-run norms aggregation job: the window runs ONCE, inside
    # the cached plan (one extra exchange at cache build), while the joins
    # it replaces ran over the pair table every materialization (guide
    # §2.3/§2.4 — the pair table is the heavy side; decide with small rows).
    from pyspark.sql import Window

    wgt = wgt.withColumn("nrm", F.sqrt(F.sum(F.col("wt") * F.col("wt")).over(Window.partitionBy(id_col))))
    # wgt stays LAZY: with tf's blocks eagerly built above, a racing rebuild
    # of a wgt block is join+window over the CACHED tf — cheap — while an
    # eager wgt count serializes that build ahead of every consumer
    # (measured at sf1, interleaved first-cold: eager tf+wgt 171/109 s vs
    # lazy-both 78/66 s; eager-tf-only below)
    wgt = scoped_persist(wgt)
    # a term in exactly one document can never match in the self-join, and
    # on a real web corpus most n-grams are df=1 — dropping them shrinks the
    # join input several-fold for free (df is already on the row). Norms are
    # computed ABOVE this filter, over the full capped term space, so the
    # cosine value is unchanged.
    shared = wgt.filter(F.col("df") >= 2)
    a, b = shared.alias("a"), shared.alias("b")
    return (
        a.join(b, (F.col("a.term") == F.col("b.term")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(
            F.sum(F.col("a.wt") * F.col("b.wt")).alias("dot"),
            F.first("a.nrm").alias("na"),  # constant within the group
            F.first("b.nrm").alias("nb"),
        )
        # a doc whose every term is corpus-ubiquitous has idf 0 everywhere ->
        # a zero vector with no defined angle; exclude it rather than divide
        # by 0 (the old norms inner join dropped exactly these pairs)
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
        .withColumn("cosine", F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def ivfpq_residual_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: Sequence[float],
    centroids,
    k: int = 10,
    nprobe: int = 2,
    m: int = 8,
    nbits: int = 4,
    seed: int = 42,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Classical RESIDUAL-encoded IVF-PQ (Jégou et al. 2011 / FAISS
    IndexIVFPQ): vectors are assigned to their nearest coarse centroid and
    the PQ codebooks quantize the RESIDUAL v - c(v), which has far smaller
    variance than v itself — the same bit budget spends on fine structure,
    so ADC distances track true distances much more tightly than raw-vector
    PQ (asserted by the recall test).

    Search: per probed centroid c, the ADC table is built from the QUERY's
    residual q - c (nprobe tables, each m x 2^nbits — still KB-scale plan
    literals); a candidate's distance is m lookups in ITS centroid's table,
    selected by a slot array indexed by centroid id. Everything after the
    Arrow encode stage is codegen expressions + TakeOrderedAndProject.

    Train-on-the-fly here for API simplicity (one seeded KMeans per
    subspace over residuals); at corpus scale train once on a sample and
    persist codes + codebooks (io/vector_index.py pattern).
    Returns (id_col, centroid_id, adc_dist) ascending."""
    import numpy as np

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    rows = centroids.collect() if isinstance(centroids, DataFrame) else centroids
    cent_rows = sorted(
        (int(r["centroid_id"]), [float(x) for x in r["centroid"]])
        if not isinstance(r, tuple) else (int(r[0]), [float(x) for x in r[1]])
        for r in rows
    )
    qv = [float(x) for x in query_vec]
    cmat = np.asarray([c for _, c in cent_rows])
    dim = cmat.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m

    # assignment expression: arg-max dot with L2-normalized centroids
    # (|v| cancels; lowest-id tiebreak via (dot, -idx) struct max)
    norm_rows = cmat / np.sqrt((cmat**2).sum(axis=1, keepdims=True))
    from bears_spark.functions.litutil import double_lit

    cmat_lit = double_lit([[float(x) for x in row] for row in norm_rows])
    v = F.col(vec_col)
    sims = F.transform(
        cmat_lit,
        lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(v, c, lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ).alias("s"),
            (-i).alias("negid"),
        ),
    )
    # array_max yields the POSITION in the sorted centroid list; the raw
    # centroid lookup (residual) is position-indexed, but the published
    # centroid_id column must carry the REAL id — ids need not be contiguous
    # (seeded_lloyd_centroids can empty a cluster)
    best_pos = (-F.array_max(sims)["negid"]).cast("int")
    cid_list = [cid for cid, _ in cent_rows]
    best_cid = F.element_at(F.lit(cid_list), best_pos + F.lit(1))
    raw_cmat_lit = double_lit([[float(x) for x in c] for _, c in cent_rows])
    residual = F.zip_with(
        v, F.element_at(raw_cmat_lit, best_pos + F.lit(1)), lambda x, y: x.cast("double") - y
    )
    assigned = df.select(
        F.col(id_col), best_cid.alias("centroid_id"), residual.alias("__res__")
    )

    # train per-subspace codebooks on residuals (seeded, sample-friendly)
    src = assigned.sample(fraction=sample_fraction, seed=seed) if sample_fraction else assigned
    from bears_spark.caching import scoped_persist

    src = scoped_persist(src.select("__res__"))
    books: list[list[list[float]]] = []
    for s in range(m):
        sub = src.select(array_to_vector(F.slice("__res__", s * dsub + 1, dsub)).alias("features"))
        model = KMeans(k=1 << nbits, seed=seed + s, maxIter=10).fit(sub)
        books.append([[float(x) for x in c] for c in model.clusterCenters()])

    # probe selection on true cosine (driver-side, sequential sums)
    def _seq_cosine(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
            na += x * x
            nb += y * y
        return dot / (math.sqrt(na) * math.sqrt(nb))

    probe_ids = [
        cid for _, cid in sorted(((-_seq_cosine(list(c), qv), cid) for cid, c in cent_rows))[:nprobe]
    ]
    cands = assigned.filter(F.col("centroid_id").isin(probe_ids))
    codes = pq_encode(cands, id_col, "__res__", books).join(
        cands.select(id_col, "centroid_id"), id_col
    )

    # per-probed-centroid ADC tables from the query's residuals; the slot
    # array maps a REAL centroid id to its table index, sized to the max id
    # (ids need not be contiguous — indexing by id would misread or go out
    # of range otherwise)
    qarr = np.asarray(qv)
    cents_np = np.asarray(books)  # [m, k, dsub]
    id2vec = {cid: np.asarray(c) for cid, c in cent_rows}
    slot = [-1] * (max(id2vec) + 1)
    tables = []
    for j, cid in enumerate(probe_ids):
        slot[cid] = j
        qres = (qarr - id2vec[cid]).reshape(m, dsub)
        tables.append(((cents_np - qres[:, None, :]) ** 2).sum(axis=2))  # [m, k]
    slot_lit = F.lit(slot)
    tbl_lit = double_lit([[[float(d) for d in row] for row in t] for t in tables])
    my_tbl = F.element_at(tbl_lit, F.element_at(slot_lit, F.col("centroid_id") + F.lit(1)) + F.lit(1))
    dist = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, i: acc
        + F.element_at(
            F.element_at(my_tbl, i + F.lit(1)), F.element_at(F.col("codes"), i + F.lit(1)) + F.lit(1)
        ),
    )
    return (
        codes.select(F.col(id_col), F.col("centroid_id"), dist.alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(k)
    )
