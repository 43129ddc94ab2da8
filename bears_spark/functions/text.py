"""Text-analysis expressions for large-scale training-data pipelines:
tokenization, quality scoring, language ID, fingerprinting, shingling.

All pure Column expressions (JVM-side). The heuristics are deliberately
simple/deterministic so a DuckDB oracle can reproduce them bit-for-bit;
swap in fastText/KenLM-style scorers via pandas UDFs when quality matters
more than verifiability.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword sets for the n-gram/stopword language heuristic.
# Deliberately short so the oracle SQL stays writable.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "ist", "das"),
    "fr": ("le", "la", "et", "est", "les"),
    "es": ("el", "la", "que", "es", "los"),
}

EN_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as")

_PUNCT_RE = r"[^\p{L}\p{N}\s]"  # spark regex; oracle uses an ASCII-equivalent
PUNCT_CHARS = r"""!"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~"""


def tokenize(col: Column | str) -> Column:
    """Whitespace tokenization -> array<string>; empty strings removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokenize(col))


# GPT-2-style pre-tokenizer shape: contraction suffixes, letter runs, digit
# runs, punctuation runs (each optionally space-prefixed), whitespace runs.
# \p{L}/\p{N} are identical in Java regex (Spark) and RE2 (DuckDB), so the
# count is oracle-reproducible. A real BPE then splits these further against
# a merges table; this pre-token count is the standard cheap proxy for
# "LLM token count" in corpus accounting.
BPE_PRETOKEN_RE = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(col: Column | str) -> Column:
    """Count of GPT-style pre-tokens (excluding pure-whitespace matches)."""
    c = F.col(col) if isinstance(col, str) else col
    matches = F.regexp_extract_all(c, F.lit(BPE_PRETOKEN_RE), 0)
    return F.size(F.filter(matches, lambda m: F.trim(m) != ""))


def avg_token_len(col: Column | str) -> Column:
    toks = tokenize(col)
    return F.when(
        F.size(toks) > 0,
        F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)).cast("double") / F.size(toks),
    ).otherwise(F.lit(0.0))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are ASCII punctuation."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    stripped = F.length(F.regexp_replace(c, f"[{PUNCT_CHARS}]", ""))
    return F.when(n > 0, (n - stripped).cast("double") / n).otherwise(F.lit(0.0))


def _isin_pred(words: tuple[str, ...]):
    """Single-arg lambda factory: pyspark binds EVERY lambda parameter as a
    lambda variable (a 2-arg filter lambda receives (element, index)), so
    default-arg closures like ``lambda t, sw=sw`` silently get the index
    Column — close over values with a factory instead."""
    return lambda t: t.isin(*words)


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    toks = tokenize(F.lower(F.col(col) if isinstance(col, str) else col))
    n = F.size(toks)
    sw = F.size(F.filter(toks, _isin_pred(stopwords)))
    return F.when(n > 0, sw.cast("double") / n).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence +
    low punctuation + token-length sanity. A C4/Gopher-style filter skeleton."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c).cast("double")
    length_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(0.25)).otherwise(F.lit(0.0))
    sw_ok = F.when(stopword_ratio(c) >= 0.05, F.lit(0.25)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(c) <= 0.2, F.lit(0.25)).otherwise(F.lit(0.0))
    tl = avg_token_len(c)
    tl_ok = F.when((tl >= 2.0) & (tl <= 12.0), F.lit(0.25)).otherwise(F.lit(0.0))
    return length_ok + sw_ok + punct_ok + tl_ok


def lang_id_staged(lowered: Column, toks: Column) -> Column:
    """lang_id over PRE-STAGED lowered text + token array. Catalyst does no
    CSE across expression references, so calling lang_id on a raw text
    column inlines the tokenize regex into all four stopword scores (5x the
    split cost per row); stage ``lower(text)`` and ``tokenize(...)`` as
    their own projection columns and pass them here to pay it once."""
    scores = {lang: F.size(F.filter(toks, _isin_pred(sw))) for lang, sw in LANG_STOPWORDS.items()}
    cjk = F.length(F.regexp_replace(lowered, r"[^一-鿿]", ""))
    best = F.lit("unk")
    best_score = F.lit(0)
    for lang in ("es", "fr", "de", "en"):  # reverse priority; later wins ties via >=
        s = scores[lang]
        cond = s >= F.greatest(best_score, F.lit(1))
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.greatest(best_score, s)
    return F.when(cjk > 0, F.lit("zh")).otherwise(best)


def lang_id(col: Column | str) -> Column:
    """Stopword-vote language ID over LANG_STOPWORDS + CJK-codepoint check.

    Returns the language with the most stopword hits ('zh' if CJK chars
    dominate, 'unk' when no signal). Ties break by fixed language order
    en > de > fr > es. NOTE: as a single expression this inlines tokenize
    into every score — hot paths should stage and call lang_id_staged.
    """
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    return lang_id_staged(c, tokenize(c))


def fingerprint64(col: Column | str) -> Column:
    """Document fingerprint: 60-bit hash of whitespace-normalized lowercase
    text. Normalization makes trivially-reformatted duplicates collide."""
    from bears_spark.functions.hashing import md5_hash64

    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return md5_hash64(normalized)


def hashing_vectorize(df, text_col: str, out_col: str = "features", dim: int = 64, lowercase: bool = True):
    """Feature hashing (HashingVectorizer): token counts folded into a
    fixed-``dim`` array<double> by ``hash(token) % dim`` — NO vocabulary fit
    pass, which is what makes it the 100 TB alternative to TFIDF: one
    map-only projection, no job-wide vocab state, new tokens never
    invalidate the space. The md5-based bucket hash is reproducible in
    DuckDB, so the operator is oracle-gradeable bit-for-bit.

    The bucket array is STAGED as its own projection (one md5 per token);
    inlining it into the per-dimension count lambda would recompute the
    hashes dim times — no CSE inside higher-order-function lambdas
    (SURVEY.md §7 known-hard; same pattern as TFIDF's staging)."""
    from bears_spark.functions.hashing import md5_hash64

    c = F.col(text_col)
    toks = tokenize(F.lower(c) if lowercase else c)
    bcol = f"__{out_col}_buckets__"
    staged = df.withColumn(bcol, F.transform(toks, lambda t: F.pmod(md5_hash64(t), F.lit(dim)).cast("int")))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.size(F.filter(F.col(bcol), lambda b: b == i)).cast("double"),
    )
    return staged.withColumn(out_col, vec).drop(bcol)


def winnow_fingerprints(df, text_col: str, id_col: str, k: int = 5, window: int = 4):
    """Winnowing document fingerprints (Schleimer et al. 2003, the MOSS
    algorithm): hash every character k-shingle, take the minimum hash in
    each sliding window of ``window`` consecutive shingles, and keep the
    distinct minima. Guarantees a shared fingerprint for any match of
    length >= k + window - 1 while storing ~2/(window+1) of the shingles —
    the standard local fingerprinting scheme for overlap/plagiarism
    detection at corpus scale (index the exploded (fingerprint, doc) pairs
    and candidate pairs come from an equi-join, like the dedup ladder).

    Frame-level on purpose: the shingle-hash array is STAGED in its own
    projection, because the windowed-min chain references it window+1
    times and Catalyst does no CSE across those references (a pure-Column
    version would recompute shingles+md5 per reference). Minima are a
    zip_with chain of least over shifted slices. Returns (id, fingerprints
    array<bigint>); docs shorter than one window fall back to their
    distinct shingle hashes. All md5-based integer hashing — exactly
    reproducible cross-engine."""
    from bears_spark.functions.hashing import md5_hash64

    staged = df.select(
        F.col(id_col),
        F.transform(char_shingles(text_col, k), lambda s: md5_hash64(s)).alias("__h__"),
    )
    h = F.col("__h__")
    m = F.size(h) - (window - 1)
    mins = F.slice(h, 1, m)
    for j in range(1, window):
        mins = F.zip_with(mins, F.slice(h, j + 1, m), lambda a, b: F.least(a, b))
    fp = F.when(F.size(h) >= window, F.array_distinct(mins)).otherwise(F.array_distinct(h))
    return staged.select(id_col, fp.alias("fingerprints"))


def word_ngrams(col: Column | str, n: int = 3) -> Column:
    """Word n-grams as array<string> (space-joined).

    Built as a zip_with chain over n shifted slices — NOT transform over a
    position sequence: a positional lambda would inline (and re-evaluate) the
    whole tokenize expression per index, turning this O(tokens) op into
    O(tokens²) per row (Catalyst does not CSE inside lambdas)."""
    toks = tokenize(col)
    cnt = F.size(toks)
    m = cnt - (n - 1)
    out = F.slice(toks, 1, m)
    for k in range(1, n):
        out = F.zip_with(out, F.slice(toks, k + 1, m), lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(cnt >= n, out).otherwise(F.array().cast("array<string>"))


def char_shingles(col: Column | str, k: int = 5) -> Column:
    """Character k-shingles of normalized text -> array<string>.

    Same zip_with-chain construction as word_ngrams (a positional lambda
    would re-normalize the whole string per position — O(chars²))."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    chars = F.split(normalized, "")
    n = F.length(normalized)
    m = n - (k - 1)
    out = F.slice(chars, 1, m)
    for j in range(1, k):
        out = F.zip_with(out, F.slice(chars, j + 1, m), lambda a, b: F.concat(a, b))
    return F.when(n >= k, out).otherwise(F.array().cast("array<string>"))


def unicode_normalize(col: Column | str, form: str = "NFC") -> Column:
    """Unicode normalization (NFC/NFD/NFKC/NFKD) of a string column.

    Spark SQL has no built-in Unicode normalizer, so this is the canonical
    pandas-UDF escape hatch: Arrow-batched ``unicodedata.normalize`` — never
    a row-at-a-time Python UDF. Essential corpus hygiene before any
    fingerprint/dedup pass: visually-identical strings with composed vs
    decomposed accents (e.g. ``é`` vs ``e``+U+0301) hash differently until
    normalized. DuckDB's ``nfc_normalize`` reproduces the NFC form exactly
    (same Unicode tables), so the op is oracle-gradeable cross-engine.
    """
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    @F.pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(lambda x: unicodedata.normalize(form, x) if x is not None else None)

    return _norm(F.col(col) if isinstance(col, str) else col)


# ---------------------------------------------------------------------------
# mojibake repair (ftfy-lite): reverse the classic UTF-8-bytes-read-as-
# cp1252/latin-1 corruption (e.g. an e-acute becoming "\u00c3\u00a9").
# Heuristic + deterministic: only strings carrying the telltale lead bytes
# are touched, and a candidate repair is kept only if it round-trips cleanly
# and strictly reduces the mojibake marker count. Python-side (mapInPandas):
# the encode/decode pair is not expressible as Catalyst expressions.

_MOJIBAKE_MARKERS = ("\u00c3", "\u00c2", "\u00e2", "\u00ef\u00bf\u00bd")


def _marker_count(s: str) -> int:
    return sum(s.count(m) for m in _MOJIBAKE_MARKERS)


def fix_mojibake(s: str, max_rounds: int = 2) -> str:
    """Repair one string; returns the input unchanged when no telltale
    sequences exist or no decoding strictly improves it. ``max_rounds``
    handles doubly-encoded text."""
    if s is None:
        return s
    for _ in range(max_rounds):
        before = _marker_count(s)
        if before == 0:
            break
        repaired = None
        for codec in ("cp1252", "latin-1"):
            try:
                candidate = s.encode(codec).decode("utf-8")
            except (UnicodeEncodeError, UnicodeDecodeError):
                continue
            if _marker_count(candidate) < before:
                repaired = candidate
                break
        if repaired is None:
            break
        s = repaired
    return s


def repair_text(df, text_col: str, out_col: str | None = None):
    """Column-level mojibake repair over Arrow batches (mapInPandas keeps
    every executor's batch local - no shuffle, no driver involvement)."""
    from pyspark.sql import types as T

    out_col = out_col or text_col
    fields = list(df.schema.fields)
    if out_col not in df.columns:
        fields = fields + [T.StructField(out_col, T.StringType())]
    schema = T.StructType(fields)

    def _fix(batches):
        for pdf in batches:
            pdf[out_col] = pdf[text_col].map(lambda v: fix_mojibake(v) if isinstance(v, str) else v)
            yield pdf

    return df.mapInPandas(_fix, schema)


def chunk_documents(
    df,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 32,
    overlap: int = 8,
):
    """Overlapping fixed-size token chunks — the RAG/embedding-pipeline
    splitter: chunk k covers tokens [k*step, k*step + chunk_tokens) with
    step = chunk_tokens - overlap. A trailing start is emitted only when it
    contributes more than the overlap (start + overlap < n), so no chunk is
    a suffix-subset of its predecessor; empty documents emit nothing.

    Map-only: tokenization is staged ONCE as a column before the
    higher-order functions (Catalyst does not CSE inside lambdas — a lambda
    referencing the tokenize expression would re-run it per chunk), then
    starts -> posexplode -> slice/join. No shuffle, no UDF; output order is
    given by (id, chunk_id) with chunk_id = start / step.
    """
    if overlap >= chunk_tokens:
        raise ValueError(f"overlap {overlap} must be < chunk_tokens {chunk_tokens}")
    step = chunk_tokens - overlap
    staged = df.select(
        F.col(id_col), tokenize(text_col).alias("__toks__")
    ).withColumn("__n__", F.size("__toks__"))
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(F.col("__n__") - 1, F.lit(0)), F.lit(step)),
        lambda s: (s == 0) | (s + overlap < F.col("__n__")),
    )
    return (
        staged.filter(F.col("__n__") > 0)
        .select(id_col, "__toks__", "__n__", F.explode(starts).alias("__start__"))
        .select(
            id_col,
            (F.col("__start__") / step).cast("int").alias("chunk_id"),
            F.col("__start__").alias("chunk_start"),
            F.least(F.lit(chunk_tokens), F.col("__n__") - F.col("__start__")).alias("n_tokens"),
            F.array_join(F.slice("__toks__", F.col("__start__") + 1, chunk_tokens), " ").alias("chunk_text"),
        )
    )


def bm25_topk(
    df,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int | None = 10,
    k1: float = 1.2,
    b: float = 0.75,
):
    """Okapi BM25 document scoring for a term query (Lucene-style idf:
    ln(1 + (N - df + 0.5)/(df + 0.5))) — the lexical retrieval standard
    complementing the dense/hashed cosine paths. ``k=None`` returns every
    matching document unranked-cut (callers that re-rank on a rounded score
    need the full list so their cut and this one can't disagree on ties).

    Plan: tokenize ONCE into a scoped-persisted staging frame shared by the
    corpus-stats pass and the survivor explode (the regex split dominates
    per-doc cost; the previous shape re-derived it THREE times per run —
    stats pass, explode pass, and a corpus-sized dl join), the term filter
    lands BEFORE any aggregation (the exploded token stream keeps only
    query terms — a ~|query|/|vocab| reduction at the source), document
    length rides ALONG the exploded tokens (max(dl) per (doc, term) group —
    dl is constant per doc) so scoring needs NO join back to a corpus-sized
    length table, per-term document frequencies are a |query|-row aggregate
    joined back via broadcast, and the two corpus scalars (N, avg doc
    length) ride in as a broadcast 1-row cross join — NOT a per-run
    .first() collect: the driver round-trip cost one blocking job per
    invocation (~0.1 s at bench scale) while the broadcast build overlaps
    the main job. The values are identical: sum(bigint)/count in Spark and
    float(s)/n in Python are the same correctly-rounded double division.
    Top-k resolves as TakeOrderedAndProject with (score, id) total order.
    (Same staging discipline as bm25_topk_queries; size(__toks) ==
    token_count(text) because token_count IS size(tokenize(text)) and
    lower() can't change whitespace boundaries.)
    """
    from bears_spark.caching import scoped_persist

    # eager (once-per-plan): the stats broadcast and the survivor explode
    # both read the staged cache; building it before either removes the
    # lazy-race rebuild, and warm runs skip the count via the guard
    staged = scoped_persist(
        df.select(F.col(id_col), tokenize(F.lower(F.col(text_col))).alias("__toks")),
        eager=True,
    )
    # the two corpus scalars as a broadcast 1-row dim; an empty corpus
    # yields zero token rows downstream, so no explicit n==0 early return
    # is needed (the n/avgdl columns are simply never consumed)
    stats = staged.agg(
        F.count("*").cast("double").alias("__n__"),
        (F.sum(F.size("__toks")) / F.count("*")).alias("__avgdl__"),
    )
    toks = staged.select(
        F.col(id_col),
        F.size("__toks").alias("dl"),
        F.explode("__toks").alias("term"),
    ).filter(F.col("term").isin([t.lower() for t in query_terms]))
    # dl is constant per document: max() re-derives it after the groupBy,
    # avoiding a join against a corpus-sized length table
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    idf = F.log(F.lit(1.0) + (F.col("__n__") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            (
                idf
                * (F.col("tf") * (k1 + 1.0))
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("__avgdl__")))
            ).alias("s"),
        )
        .groupBy(id_col)
        .agg(F.sum("s").alias("score"))
    )
    if k is None:
        return scored
    return scored.orderBy(F.desc("score"), id_col).limit(k)


def bm25_topk_queries(
    df,
    id_col: str,
    text_col: str,
    queries_df,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    score_round: int | None = None,
):
    """Okapi BM25 for a query SET: score every (query, document) pair and
    keep each query's top-k — the retrieval-eval shape at scale (one job
    scores thousands of eval queries, not one literal query per job).

    ``queries_df`` has columns (query_id, terms array<string>); an eval set
    is tiny BY CONTRACT, so it is collected once and baked into the plan as
    fit state (the corpus scalars ride in as a broadcast 1-row cross join):

    * the corpus token stream filters with an isin() over the union of all
      query terms — pushed into the scan, ~|vocab ∩ terms| survivors,
    * document length rides ALONG the exploded tokens (max(dl) per
      (doc, term) group — dl is constant per doc), so scoring needs NO join
      back to a corpus-sized length table,
    * per-term document frequencies aggregate from the survivors and
      broadcast back (the one data-dependent join),
    * query membership fans out via a literal term->query_ids map explode —
      no join,
    * per-query top-k is rank()<=k over (score desc, id) — planned as
      WindowGroupLimit, partial top-k before the shuffle.

    Shuffles: the (doc, term) partial-aggregated groupBy and the final
    per-query window — both on bounded survivor rows, never the corpus.

    Ties at rank k: deterministic (the order key includes id);
    ``score_round`` rounds scores before ranking so an oracle that rounds
    can't disagree on boundary ties. Returns (query_id, id_col, score,
    rank)."""
    qrows = queries_df.collect() if not isinstance(queries_df, list) else queries_df
    term_to_qids: dict[str, list[int]] = {}
    for r in qrows:
        qid = int(r["query_id"]) if not isinstance(r, tuple) else int(r[0])
        terms = r["terms"] if not isinstance(r, tuple) else r[1]
        for t in {str(t).lower() for t in terms}:
            term_to_qids.setdefault(t, []).append(qid)
    all_terms = sorted(term_to_qids)

    # tokenize ONCE: the corpus-stats pass and the survivor explode both read
    # the staged token arrays (tokenize's regex split is the dominant per-doc
    # cost — re-deriving it in each pass doubled this function's wall time).
    # size(__toks) == token_count(text): token_count IS size(tokenize(text)),
    # and lower() can't change whitespace boundaries. scoped_persist: the
    # runner drains it; at 100 TB this is a deliberate cache-vs-recompute
    # trade (MEMORY_AND_DISK of one corpus-sized token column for one pass).
    from bears_spark.caching import scoped_persist

    # eager (once-per-plan guard): the stats broadcast and the survivor
    # explode both read the staged cache; building it before either removes
    # the lazy-race rebuild, and warm runs skip the count
    staged = scoped_persist(
        df.select(F.col(id_col), tokenize(F.lower(F.col(text_col))).alias("__toks")),
        eager=True,
    )
    if not all_terms:
        return (
            df.select(
                F.lit(0).alias("query_id"),
                F.col(id_col),
                F.lit(0.0).alias("score"),
                F.lit(0).alias("rank"),
            ).limit(0)
        )
    # corpus scalars ride in as a broadcast 1-row cross join instead of a
    # per-run .first() collect (one blocking driver job per invocation,
    # ~0.1 s at bench scale, for two scalars); sum(bigint)/count is the
    # same correctly-rounded double division float(s)/n was. An empty
    # corpus yields zero token rows, so no n==0 early return is needed.
    stats = staged.agg(
        F.count("*").cast("double").alias("__n__"),
        (F.sum(F.size("__toks")) / F.count("*")).alias("__avgdl__"),
    )

    toks = staged.select(
        F.col(id_col),
        F.size("__toks").alias("dl"),
        F.explode("__toks").alias("term"),
    ).filter(F.col("term").isin(all_terms))
    # dl is constant per document: max() re-derives it after the groupBy,
    # avoiding a join against a corpus-sized length table
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    idf = F.log(F.lit(1.0) + (F.col("__n__") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5))
    qmap = F.create_map(
        *[c for t in all_terms for c in (F.lit(t), F.lit(term_to_qids[t]))]
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.explode(F.element_at(qmap, F.col("term"))).alias("query_id"),
            (
                idf
                * (F.col("tf") * (k1 + 1.0))
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("__avgdl__")))
            ).alias("s"),
        )
        .groupBy("query_id", id_col)
        .agg(F.sum("s").alias("score"))
    )
    from pyspark.sql import Window

    # score_round ranks on the ROUNDED score (with id tiebreak) so an oracle
    # that rounds before ranking can't disagree on last-ulp ties at rank k
    if score_round is not None:
        scored = scored.withColumn("score", F.round("score", score_round))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "score", "rank")
    )


def rake_phrases(
    df,
    id_col: str,
    text_col: str,
    stopwords: tuple[str, ...] = EN_STOPWORDS,
    max_len: int = 4,
):
    """RAKE candidate phrases (Rose et al. 2010): maximal token runs between
    stopword boundaries, scored by the summed word metric
    ``degree(w)/freq(w)`` where ``freq`` counts a word's occurrences across
    all kept phrases and ``degree`` sums the lengths of the phrases each
    occurrence sits in (multiplicity counted — a word twice in one phrase
    contributes twice, identically on both engines).

    Spark-first shape: phrase segmentation is a running count of stopwords
    per document (window at DOCUMENT grain — embarrassingly parallel), word
    stats are one groupBy over exploded phrase tokens, and the phrase score
    re-join runs at phrase-text grain. No driver state, no UDFs.

    Returns one row per distinct phrase text:
    (phrase, plen, n_occurrences, score).
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("__id__"),
        F.posexplode(tokenize(text_col)).alias("pos", "tok"),
    ).withColumn("is_stop", F.col("tok").isin(*stopwords))
    w = Window.partitionBy("__id__").orderBy("pos")
    seg = toks.withColumn("phrase_id", F.sum(F.col("is_stop").cast("int")).over(w)).where(
        ~F.col("is_stop")
    )
    phrases = (
        seg.groupBy("__id__", "phrase_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))), lambda s: s["tok"]
                ),
                " ",
            ).alias("phrase"),
            F.count("*").alias("plen"),
        )
        .where(F.col("plen") <= max_len)
    )
    by_text = phrases.groupBy("phrase", "plen").agg(F.count("*").alias("n_occurrences"))
    words = phrases.select("plen", F.explode(F.split("phrase", " ")).alias("word"))
    word_scores = words.groupBy("word").agg(
        (F.sum("plen").cast("double") / F.count("*")).alias("wscore")
    )
    scored = (
        by_text.select("phrase", "plen", "n_occurrences", F.explode(F.split("phrase", " ")).alias("word"))
        .join(word_scores, "word")
        .groupBy("phrase", "plen", "n_occurrences")
        .agg(F.sum("wscore").alias("score"))
    )
    return scored


def line_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_docs: int = 2,
    min_chars: int = 1,
) -> DataFrame:
    """Corpus-level repeated-line removal — the FineWeb/RefinedWeb curation
    step: a line whose trimmed form appears in >= ``min_docs`` DISTINCT
    documents is boilerplate (nav bars, cookie banners, licence footers) and
    is dropped from EVERY document; line order is otherwise preserved.
    Lines shorter than ``min_chars`` after trim are never counted or
    dropped (blank separators stay).

    Scale shape: posexplode -> one groupBy on the trimmed line (hash
    shuffle, partial-agg counts), broadcast-able hot-line set applied as a
    LEFT ANTI join, then one groupBy(id) rebuilding the text with an
    order-preserving sort_array over (pos, line) structs. No Python in the
    hot path; per-document line counts bound the rebuilt array, not corpus
    size.

    Returns ``(id_col, text, n_kept, n_dropped)`` — documents whose every
    line is dropped come back with empty text, not missing rows.
    """
    pos, line = "__pos__", "__line__"
    lines = df.select(
        F.col(id_col), F.posexplode(F.split(F.col(text_col), "\n")).alias(pos, line)
    ).withColumn("__t__", F.trim(F.col(line)))
    eligible = F.length("__t__") >= min_chars
    hot = (
        lines.where(eligible)
        .groupBy("__t__")
        .agg(F.countDistinct(id_col).alias("__nd__"))
        .where(F.col("__nd__") >= min_docs)
        .select("__t__")
    )
    marked = lines.join(
        hot.withColumn("__drop__", F.lit(True)), "__t__", "left"
    ).withColumn("__drop__", F.coalesce("__drop__", F.lit(False)) & eligible)
    rebuilt = marked.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~F.col("__drop__"), F.struct(F.col(pos), F.col(line)))
                    )
                ),
                lambda s: s[line],
            ),
            "\n",
        ).alias(text_col),
        F.sum((~F.col("__drop__")).cast("long")).alias("n_kept"),
        F.sum(F.col("__drop__").cast("long")).alias("n_dropped"),
    )
    return rebuilt
