"""Vector math over array<float|double> columns — expression-only.

Used by similarity search and embedding dedup. ``F.aggregate``/``F.zip_with``
keep the arithmetic in the JVM; all accumulation in double for cross-engine
reproducibility (parquet stores float32; we cast up before multiplying,
matching DuckDB's list_* double semantics).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(_c(a), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    # nullif: zero-norm vectors yield null, not an ANSI divide-by-zero error
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))


# ---------------------------------------------------------------------------
# Scalar (int8-style) quantization: the memory-side complement to product
# quantization (similarity.py PQ). Per-dimension min/max fit over the corpus,
# then code_i = round((x_i - min_i) * (levels-1)/(max_i - min_i)) clamped to
# [0, levels-1]. 64 float32 dims (256 B) compress to 64 int8 codes + a
# shared 2*ndim-double codebook — a 4x memory cut for ANN working sets.
#
# Scale: the fit is ONE posexplode + groupBy(dim) aggregation — partial
# aggregation reduces each partition to ndim rows before the shuffle, and
# the collected state is 2*ndim doubles regardless of corpus size. The
# transform is a pure higher-order-function expression (no UDF, no shuffle).
# Cross-engine: min/max select exact float32 values, the scale/step doubles
# are computed once from them, and every downstream op (subtract, multiply,
# round-half-up on non-negatives) is IEEE-identical in any engine that
# follows the same expression shape — codes are integer-exact.


def fit_scalar_quantization(df, vec_col: str) -> tuple[list[float], list[float]]:
    """Per-dimension (min, max) over an array column. Returns two ndim lists."""
    stats = (
        df.select(F.posexplode(_c(vec_col)).alias("i", "x"))
        .groupBy("i")
        .agg(F.min(F.col("x").cast("double")).alias("lo"), F.max(F.col("x").cast("double")).alias("hi"))
        .orderBy("i")
        .collect()
    )
    return [r["lo"] for r in stats], [r["hi"] for r in stats]


def scalar_quantize_expr(vec_col: Column | str, mins: list[float], maxs: list[float], levels: int = 256) -> Column:
    """array<int> codes in [0, levels-1]; constant dimensions code to 0."""
    top = levels - 1
    lo = F.lit([float(v) for v in mins])
    scale = F.lit([float(top) / (hi - lo_) if hi > lo_ else 0.0 for lo_, hi in zip(mins, maxs)])
    return F.transform(
        _c(vec_col),
        lambda x, i: F.least(
            F.lit(top),
            F.greatest(
                F.lit(0),
                F.round(
                    (x.cast("double") - F.element_at(lo, i + 1)) * F.element_at(scale, i + 1), 0
                ).cast("int"),
            ),
        ),
    )


def scalar_dequantize_expr(code_col: Column | str, mins: list[float], maxs: list[float], levels: int = 256) -> Column:
    """array<double> reconstruction: min_i + code_i * (max_i - min_i)/(levels-1)."""
    top = levels - 1
    lo = F.lit([float(v) for v in mins])
    step = F.lit([(hi - lo_) / float(top) if hi > lo_ else 0.0 for lo_, hi in zip(mins, maxs)])
    return F.transform(
        _c(code_col),
        lambda c, i: F.element_at(lo, i + 1) + c.cast("double") * F.element_at(step, i + 1),
    )


def power_iteration_top_vector(
    df,
    vec_col: str,
    dim: int,
    iters: int = 2,
    w_round: int = 6,
    v_round: int = 9,
) -> list[float]:
    """Top right-singular direction of the (uncentered) embedding matrix via
    deterministic distributed power iteration.

    Each step is two DISTRIBUTED passes expressed as plain aggregations:
    u_i = <x_i, v> per row (map-only), then w_j = sum_i u_i * x_ij via
    posexplode + groupBy(dim) — k*dim cells of partial-aggregated state, the
    exact shape of the scalar-quantization fit. Only dim doubles are ever
    collected per iteration.

    Cross-engine reproducibility uses the seeded-Lloyd rounding rule: the
    start vector is the constant 1/sqrt(dim); each iteration rounds the raw
    per-dim sums to ``w_round`` decimals (absorbing engine summation-order
    ulps) BEFORE normalizing, then rounds the unit vector to ``v_round``.
    A DuckDB oracle replaying the same unrolled steps reproduces the vector
    bit-for-bit (see EMB_PRINCIPAL_SQL).

    Sign is deterministic (positive start vector). Returns the fitted unit
    vector as plain floats for baking into downstream plans as a literal.
    """
    import math

    v = [1.0 / math.sqrt(dim)] * dim
    for _ in range(iters):
        vlit = F.lit(v)
        u = dot(vec_col, vlit)
        staged = df.select(u.alias("__u"), _c(vec_col).cast("array<double>").alias("__v"))
        rows = (
            staged.select("__u", F.posexplode("__v").alias("__i", "__x"))
            .groupBy("__i")
            .agg(F.round(F.sum(F.col("__u") * F.col("__x")), w_round).alias("__w"))
            .collect()
        )
        w = [0.0] * dim
        for r in rows:
            w[r["__i"]] = r["__w"]
        nrm = math.sqrt(sum(x * x for x in w))
        v = [round(x / nrm, v_round) for x in w]
    return v


def power_iteration_top2(
    df,
    vec_col: str,
    dim: int,
    iters: int = 2,
    w_round: int = 6,
    v_round: int = 9,
) -> tuple[list[float], list[float]]:
    """Top TWO singular directions by deflation: fit v1 with
    power_iteration_top_vector, then subtract each row's v1 component
    (x' = x - <x, v1> * v1 — a MAP-ONLY projection, no materialized residual
    table) and power-iterate the residual for v2. Same rounding discipline,
    so both directions replay exactly in the oracle; v2 is orthogonal to v1
    up to the rounding tolerance."""
    v1 = power_iteration_top_vector(df, vec_col, dim, iters, w_round, v_round)
    v1lit = F.lit(v1)
    u1 = dot(vec_col, v1lit)
    resid = F.zip_with(
        _c(vec_col), v1lit, lambda x, c: x.cast("double") - u1 * c
    )
    staged = df.select(resid.alias("__resid"))
    v2 = power_iteration_top_vector(staged, "__resid", dim, iters, w_round, v_round)
    return v1, v2
