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
from bears_spark.functions.sketch import (
    hll_estimate,
    hll_registers,
    cms_build,
    cms_lookup,
    bloom_build,
    bloom_prune,
    zorder_key,
    zorder_layout,
    zorder_quantize,
    equiwidth_histogram,
    histogram_quantiles,
)
from bears_spark.functions.analytics import window_funnel, cohort_retention
from bears_spark.functions.rollup import merge_rollup_states, rollup_result, rollup_state
from bears_spark.functions.validate import (
    check_constraints,
    not_null,
    unique,
    in_range,
    isin_set,
    matches,
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
    "hll_estimate",
    "hll_registers",
    "cms_build",
    "cms_lookup",
    "bloom_build",
    "bloom_prune",
    "zorder_key",
    "zorder_layout",
    "zorder_quantize",
    "equiwidth_histogram",
    "histogram_quantiles",
    "window_funnel",
    "cohort_retention",
    "merge_rollup_states",
    "rollup_result",
    "rollup_state",
    "check_constraints",
    "not_null",
    "unique",
    "in_range",
    "isin_set",
    "matches",
]
