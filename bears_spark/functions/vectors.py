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
