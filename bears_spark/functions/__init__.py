"""Column-expression function library (JVM-side, codegen-friendly).

Everything here compiles to built-in ``pyspark.sql.functions`` expressions —
no Python UDFs in hot paths — so whole-stage codegen and pushdown apply
unchanged at 100 TB.
"""

from bears_spark.functions.text import (
    tokenize,
    token_count,
    avg_token_len,
    punct_ratio,
    stopword_ratio,
    quality_score,
    lang_id,
    fingerprint64,
    word_ngrams,
    char_shingles,
)
from bears_spark.functions.hashing import md5_hash64, minhash_signature, simhash64
from bears_spark.functions.vectors import cosine_similarity, dot, l2_norm
from bears_spark.functions.quality import (
    gopher_quality,
    gopher_keep,
    word_quality_stats,
    top_ngram_repetition,
    hash_sample,
    stratified_hash_sample,
    ngram_contamination,
    vocabulary,
)

__all__ = [
    "tokenize",
    "token_count",
    "avg_token_len",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "lang_id",
    "fingerprint64",
    "word_ngrams",
    "char_shingles",
    "md5_hash64",
    "minhash_signature",
    "simhash64",
    "cosine_similarity",
    "dot",
    "l2_norm",
    "gopher_quality",
    "gopher_keep",
    "word_quality_stats",
    "top_ngram_repetition",
    "hash_sample",
    "stratified_hash_sample",
    "ngram_contamination",
    "vocabulary",
]
