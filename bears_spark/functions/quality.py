"""Gopher/C4-style corpus quality filters for training-data pipelines.

Implements the standard document-quality rule families from published
corpus-construction recipes — word-count bands, mean-word-length bands,
stopword-presence, vocabulary diversity (unique-word fraction), and
top-n-gram repetition (Rae et al. 2021 "Gopher" §A1.1; Raffel et al. 2020
"C4") — plus deterministic hash-based sampling for held-out splits.

Reference parity: the reference ships per-string text processors
(src/bears/processor/data/text/) but no corpus-level quality filters;
these are the training-data-pipeline extensions a 100 TB corpus build
needs on top of that surface.

Scale notes
-----------
* All per-document metrics are pure Column expressions over a PRE-STAGED
  token array: callers tokenize once into a column and every metric reads
  it. Catalyst performs no common-subexpression elimination across
  projection elements, so passing ``tokenize(text)`` four times would
  re-split the document four times (see [[catalyst-perf-traps]]).
* ``top_ngram_repetition`` is explode + two partial-aggregated groupBys on
  (doc_id, gram) then doc_id — per-document cardinality is bounded by
  document length, so no hot keys regardless of corpus size.
* ``hash_sample`` filters on a deterministic per-row hash: no shuffle, no
  sort, stable under repartitioning and re-runs — the property a 100 TB
  train/held-out split actually requires (``df.sample`` is seed-stable
  only for a fixed partitioning).

The heuristics are deliberately exact-reproducible (integer comparisons,
single IEEE divisions — no float summation, no round()) so a DuckDB oracle
can verify them bit-for-bit; see queries/qualityops.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bears_spark.functions.hashing import md5_hash64
from bears_spark.functions.text import EN_STOPWORDS, _isin_pred, tokenize, word_ngrams

# Gopher-style keep-rule bounds (integer-comparison form; see gopher_keep).
MIN_WORDS = 10
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3  # mean word length in [3, 10]
MAX_MEAN_WORD_LEN = 10
MIN_STOPWORD_PCT = 2  # >= 2% stopwords
MIN_UNIQUE_PCT = 20  # >= 20% unique words


def word_quality_stats(tokens: Column) -> Column:
    """Per-document word statistics as a struct over a pre-staged,
    lowercased token array: n_words, total word chars, stopword count,
    distinct-word count. All bigint — downstream ratios are single
    int/int divisions, which are bit-identical across engines (unlike
    float summation or round())."""
    return F.struct(
        F.size(tokens).cast("bigint").alias("n_words"),
        F.aggregate(tokens, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)).alias("total_chars"),
        F.size(F.filter(tokens, _isin_pred(EN_STOPWORDS))).cast("bigint").alias("n_stop"),
        F.size(F.array_distinct(tokens)).cast("bigint").alias("n_distinct"),
    )


def gopher_keep(stats: Column) -> Column:
    """Gopher-style keep flag from a word_quality_stats struct.

    Every rule is an exact integer comparison (e.g. mean word length in
    [3, 10] is ``3*n <= total_chars <= 10*n``), so Spark and any oracle
    agree exactly — thresholds never sit on a float-rounding boundary."""
    n = stats["n_words"]
    return (
        (n >= MIN_WORDS)
        & (n <= MAX_WORDS)
        & (stats["total_chars"] >= MIN_MEAN_WORD_LEN * n)
        & (stats["total_chars"] <= MAX_MEAN_WORD_LEN * n)
        & (stats["n_stop"] * 100 >= MIN_STOPWORD_PCT * n)
        & (stats["n_distinct"] * 100 >= MIN_UNIQUE_PCT * n)
    )


def gopher_quality(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document Gopher quality metrics + keep flag.

    Tokens are staged once in a projection; the stats struct is staged
    once more before being fanned out into columns (no CSE across
    projection elements otherwise re-runs the aggregate per column)."""
    staged = df.select(id_col, tokenize(F.lower(F.col(text_col))).alias("__toks__"))
    with_stats = staged.select(id_col, word_quality_stats(F.col("__toks__")).alias("__s__"))
    s = F.col("__s__")
    return with_stats.select(
        id_col,
        s["n_words"].alias("n_words"),
        s["n_distinct"].alias("n_distinct"),
        s["n_stop"].alias("n_stop"),
        s["total_chars"].alias("total_chars"),
        (s["total_chars"] / s["n_words"]).alias("mean_word_len"),
        (s["n_stop"] / s["n_words"]).alias("stop_frac"),
        (s["n_distinct"] / s["n_words"]).alias("uniq_frac"),
        gopher_keep(s).alias("keep"),
    )


def top_ngram_repetition(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 2) -> DataFrame:
    """Gopher repetition rule: fraction of a document's word n-grams
    occupied by its single most frequent n-gram.

    explode -> count per (doc, gram) -> max/sum per doc. Both groupBys
    are partially aggregated map-side, and key cardinality per document
    is bounded by document length — no hot keys at corpus scale. Returns
    (id, n_grams, top_count, top_frac)."""
    grams = df.select(F.col(id_col), F.explode(word_ngrams(F.lower(F.col(text_col)), n)).alias("__g__"))
    per_gram = grams.groupBy(id_col, "__g__").agg(F.count("*").alias("__c__"))
    return per_gram.groupBy(id_col).agg(
        F.sum("__c__").alias("n_grams"),
        F.max("__c__").alias("top_count"),
    ).select(
        id_col,
        "n_grams",
        "top_count",
        (F.col("top_count") / F.col("n_grams")).alias("top_frac"),
    )


def hash_sample(df: DataFrame, id_col: str, pct: int, salt: int | str = 0, complement: bool = False) -> DataFrame:
    """Deterministic ~pct% sample: keep rows where a 60-bit md5 hash of the
    id falls in the first pct of 100 buckets. Pure filter — no shuffle, no
    seed-vs-partitioning coupling. ``complement=True`` returns exactly the
    OTHER rows (buckets >= pct), so the two calls form an exact disjoint
    train/held-out split."""
    if not 0 <= pct <= 100:
        raise ValueError(f"pct must be in [0, 100], got {pct}")
    bucket = md5_hash64(F.col(id_col), salt=salt) % 100
    return df.filter(bucket >= pct if complement else bucket < pct)


def ngram_contamination(
    train: DataFrame,
    test: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Train/test decontamination: per test document, how many distinct word
    n-grams it shares with the train corpus and how many distinct train
    documents share them — the standard benchmark-leakage check run before
    training (n=8..13 word grams in common recipes).

    Shape: explode distinct n-grams on both sides -> equi-join on the gram
    -> per-test-doc distinct counts. Never pairwise over documents; cost is
    the gram join. ``max_doc_freq`` drops grams appearing in more than that
    many TRAIN docs before the join (broadcast anti-join against the tiny
    hot set) — at web scale boilerplate grams are both quadratic join keys
    and meaningless as leakage evidence. Test docs with no overlap are
    absent from the output (inner join): at corpus scale the clean set is
    the overwhelming majority and materializing explicit zeros for it is
    pure waste; left-join a zero default at the call site if needed."""
    from bears_spark.skew import widen_input

    # widen single-split inputs before the heavy tokenize+shingle projection
    # (guide §2.5); no-op once the scan has real splits
    tr = widen_input(train.select(id_col, text_col)).select(
        F.col(id_col).alias("train_id"),
        F.explode(F.array_distinct(word_ngrams(F.lower(F.col(text_col)), n))).alias("gram"),
    )
    # join/shuffle fixed-width hashed keys, not gram strings (see the
    # ngram_jaccard_pairs note in dedup.py — same trade, same ~1e-8 risk)
    tr = tr.select("train_id", F.xxhash64("gram").alias("gram"))
    if max_doc_freq is not None:
        hot = (
            tr.groupBy("gram")
            .agg(F.count("*").alias("__df__"))
            .filter(F.col("__df__") > max_doc_freq)
            .select("gram")
        )
        tr = tr.join(F.broadcast(hot), on="gram", how="left_anti")
    te = widen_input(test.select(id_col, text_col)).select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(F.lower(F.col(text_col)), n))).alias("gram"),
    )
    te = te.select(id_col, F.xxhash64("gram").alias("gram"))
    return te.join(tr, on="gram").groupBy(id_col).agg(
        F.countDistinct("gram").alias("n_hit_grams"),
        F.countDistinct("train_id").alias("n_train_docs"),
    )


def stratified_hash_sample(
    df: DataFrame, id_col: str, stratum_col: str, pct_by: dict[str, int], default_pct: int = 0, salt: int | str = 0
) -> DataFrame:
    """Per-stratum deterministic sampling — the mixture-weighting step of
    corpus construction (downsample web text, keep all books, ...).

    Same md5-bucket scheme as hash_sample with a per-stratum keep
    percentage; strata absent from ``pct_by`` get ``default_pct``. Still a
    pure filter: the rate map compiles into the predicate (a chained CASE),
    so no join, no shuffle, and the same row set regardless of partitioning
    — at 100 TB this is a map-only pass."""
    for k, pct in pct_by.items():
        if not 0 <= pct <= 100:
            raise ValueError(f"pct for stratum {k!r} must be in [0, 100], got {pct}")
    if not 0 <= default_pct <= 100:
        raise ValueError(f"default_pct must be in [0, 100], got {default_pct}")
    rate = F.lit(default_pct)
    for k, pct in sorted(pct_by.items()):
        rate = F.when(F.col(stratum_col) == k, F.lit(pct)).otherwise(rate)
    return df.filter(md5_hash64(F.col(id_col), salt=salt) % 100 < rate)


def vocabulary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus vocabulary table: per-term total frequency (tf) and document
    frequency (df) — the input to BPE-merge selection, stopword discovery,
    and Zipf-curve corpus diagnostics.

    explode -> one partially-aggregated groupBy(term). Output cardinality is
    the vocabulary size, not the corpus size, so downstream ranking/joins
    operate on the (much smaller) aggregate. For top-k views, sort+limit
    (TakeOrderedAndProject) rather than a global rank window — ranking the
    ENTIRE vocabulary globally would funnel it through one partition."""
    toks = df.select(F.col(id_col), F.explode(tokenize(F.lower(F.col(text_col)))).alias("term"))
    return toks.groupBy("term").agg(
        F.count("*").alias("tf"),
        F.countDistinct(id_col).alias("df"),
    )


# ---------------------------------------------------------------------------
# C4 rules (Raffel et al. 2020 §2.2) — the line/sentence-structural filters
# that complement the Gopher word statistics above. All pure expressions.

C4_MIN_SENTENCES = 3
C4_MIN_WORDS_PER_LINE = 5
_TERMINAL = (".", "!", "?", '"', "'")


def c4_doc_flags(text_col: Column | str) -> Column:
    """Per-document C4 signals as a struct:
      n_sentences          — terminal-punctuation splits ('.', '!', '?')
      has_lorem            — boilerplate placeholder text
      has_brace            — '{' (C4 drops pages with code)
      n_lines / n_short_lines — newline structure; short = <5 words
      frac_terminal_lines_x1000 — integer per-mille of lines ending in
                             terminal punctuation (int-exact, oracle-safe)
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    sentences = F.filter(F.split(c, r"[.!?]"), lambda s: F.length(F.trim(s)) > 0)
    lines = F.filter(F.split(c, r"\n"), lambda s: F.length(F.trim(s)) > 0)
    def _is_terminal(line):
        out = F.lit(False)
        for t in _TERMINAL:
            out = out | F.endswith(F.trim(line), F.lit(t))
        return out

    n_lines = F.size(lines).cast("bigint")
    n_terminal = F.size(F.filter(lines, _is_terminal)).cast("bigint")
    short = F.size(
        F.filter(lines, lambda ln: F.size(F.filter(F.split(F.trim(ln), r"\s+"), lambda w: w != "")) < C4_MIN_WORDS_PER_LINE)
    ).cast("bigint")
    return F.struct(
        F.size(sentences).cast("bigint").alias("n_sentences"),
        F.lower(c).contains("lorem ipsum").alias("has_lorem"),
        c.contains("{").alias("has_brace"),
        n_lines.alias("n_lines"),
        short.alias("n_short_lines"),
        F.when(n_lines > 0, (n_terminal * 1000 / n_lines).cast("bigint")).otherwise(F.lit(0)).alias(
            "frac_terminal_lines_x1000"
        ),
    )


def c4_keep(flags: Column) -> Column:
    """C4 keep rule: >=3 sentences, no lorem-ipsum boilerplate, no code
    braces. (Line-level removal — short lines, non-terminal lines — is a
    transform, not a drop; see c4_quality's n_short_lines output.)"""
    return (flags["n_sentences"] >= C4_MIN_SENTENCES) & ~flags["has_lorem"] & ~flags["has_brace"]


def c4_quality(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document C4 structural metrics + keep flag (staged struct — one
    evaluation, fanned into columns)."""
    staged = df.select(id_col, c4_doc_flags(text_col).alias("__c4__"))
    s = F.col("__c4__")
    return staged.select(
        id_col,
        s["n_sentences"].alias("n_sentences"),
        s["has_lorem"].alias("has_lorem"),
        s["has_brace"].alias("has_brace"),
        s["n_lines"].alias("n_lines"),
        s["n_short_lines"].alias("n_short_lines"),
        s["frac_terminal_lines_x1000"].alias("frac_terminal_lines_x1000"),
        c4_keep(s).alias("keep"),
    )


def weighted_sample_topk(df: DataFrame, id_col: str, weight_col: str, k: int) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006): each row draws key = ln(u)/w with u uniform in (0,1],
    and the k largest keys are the sample — inclusion probability
    proportional to weight, exactly one pass, no rejection loop.

    u derives from the cross-engine md5 hash of the id ((h+1)/2^60, never
    zero), so the "random" draw is reproducible in any engine — the property
    the DuckDB-graded query relies on and the property a re-run of a 100 TB
    sampling job needs for idempotence. Plan: map-only key computation, then
    TakeOrderedAndProject — no global sort, no shuffle beyond top-k merge.
    Rows with weight <= 0 are excluded (their inclusion probability is 0).
    """
    from bears_spark.functions.hashing import md5_hash64

    u = (md5_hash64(F.col(id_col)) + F.lit(1).cast("bigint")) / F.lit(float(1 << 60))
    key = F.log(u) / F.col(weight_col)
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("es_key", key)
        .orderBy(F.col("es_key").desc(), F.col(id_col))
        .limit(k)
    )


def weighted_sample_per_group(
    df: DataFrame, group_cols: Sequence[str] | str, id_col: str, weight_col: str, k: int
) -> DataFrame:
    """Per-group Efraimidis-Spirakis weighted sampling without replacement:
    k rows per group, inclusion probability proportional to weight within
    the group. Same hash-derived deterministic draw as weighted_sample_topk
    but ranked with a per-group window (WindowGroupLimit pushes the top-k
    into the sort) instead of a global TakeOrdered — the stratified-corpus
    shape ('k docs per language, length-weighted')."""
    from pyspark.sql import Window

    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    u = (md5_hash64(F.col(id_col)) + F.lit(1).cast("bigint")) / F.lit(float(1 << 60))
    key = F.log(u) / F.col(weight_col)
    w = Window.partitionBy(*groups).orderBy(F.desc("es_key"), F.asc(id_col))
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("es_key", key)
        .withColumn("es_rank", F.row_number().over(w))
        .where(F.col("es_rank") <= k)
        .drop("es_rank")
    )


def compression_ratio(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", level: int = 6) -> DataFrame:
    """Per-document zlib compression ratio — the RefinedWeb/MassiveText-style
    repetitiveness signal: highly repetitive or templated text compresses far
    below natural prose, so a LOW ratio flags boilerplate/spam and an
    unusually HIGH one flags random noise.

    ratio = len(zlib(utf8(text), level)) / len(utf8(text)); empty text -> null.
    zlib at a fixed level is bit-deterministic for a given input on every
    platform (the DEFLATE stream is fully specified by the encoder settings),
    so the signal is reproducible — but no SQL engine exposes it, hence this
    is a Pandas-UDF (Arrow-batched) column with pytest verification instead
    of a DuckDB oracle; the driver grades the query rows-only.

    Scale: map-only — one Arrow round-trip per batch, output is (id, two
    doubles); composes with any filter threshold downstream.
    """
    import zlib

    from bears_spark.frame import _elementwise_pandas_udf

    def one(t):
        if t is None:
            return None
        raw = t.encode("utf-8")
        if not raw:
            return None
        return len(zlib.compress(raw, level)) / len(raw)

    _ratio = _elementwise_pandas_udf(one, "double")
    return df.select(
        F.col(id_col),
        F.round(_ratio(F.col(text_col)), 6).alias("compression_ratio"),
        F.length(F.col(text_col)).alias("n_chars_text"),
    )


def bottom_k_sample(df: DataFrame, id_col: str, k: int, salt: int | str = 0) -> DataFrame:
    """Exact-size-k uniform sample: the k rows whose 60-bit md5 hash of the
    id is smallest — the distributed equivalent of reservoir sampling
    (every id is equally likely to land in the bottom k of a uniform hash),
    but DETERMINISTIC and mergeable: the bottom-k of a union is the
    bottom-k of the parts' bottom-ks, so partial samples from shards/days
    compose without re-reading data. Plans as TakeOrderedAndProject (per-
    partition heap of k, never a full sort) — at 100 TB the cost is one
    scan plus k rows per partition to the driver-side merge.

    Reference parity: sample-by-fraction is ScalableDataFrame sample();
    exact-k sampling has no reference equivalent (fractions drift at small
    n) — this is the training-data-curation shape (fixed eval budgets).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    h = md5_hash64(F.col(id_col), salt=salt)
    # ties are impossible in practice (60-bit hash) but the id tiebreak
    # keeps the sample well-defined even under a collision
    return df.orderBy(h.asc(), F.col(id_col).asc()).limit(k)


def stratified_sample_k(
    df: DataFrame, strata_col: str, id_col: str, k: int, salt: int | str = 0
) -> DataFrame:
    """Exact-size-k uniform sample PER STRATUM (the per-group twin of
    :func:`bottom_k_sample`): rank rows within each stratum by the 60-bit
    md5 hash of the id and keep rank <= k. Deterministic, uniform within
    each stratum, and stable under repartitioning — the "equal eval budget
    per language/source" curation shape.

    Plan: the rank-<=-k filter compiles to WindowGroupLimit (a per-group
    top-k heap pushed below the shuffle), so per-partition work is O(rows
    seen) with k-bounded state — never a full sort of the stratum. Strata
    counts below k keep every row (SQL row_number semantics)."""
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    h = md5_hash64(F.col(id_col), salt=salt)
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rk__", F.row_number().over(w))
        .filter(F.col("__rk__") <= k)
        .drop("__rk__")
    )
