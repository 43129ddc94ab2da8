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

from bears_spark.functions.vectors import cosine_similarity, dot, l2_norm


def _query_lit(query_vec: Sequence[float]):
    return F.array(*[F.lit(float(v)) for v in query_vec])


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
        srow = F.array(*[F.lit(s) for s in row])
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
        d = dot(vec_col, F.array(*[F.lit(c) for c in plane]))
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
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "centroid_id int, centroid array<double>",
    )
    return cents


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
