"""Deduplication strategies for web-scale corpora, Spark-first.

The reference offers only exact ``drop_duplicates`` (delegated;
src/bears/core/frame/ScalableDataFrame.py:1732-1738). For 100 TB training-data
work we add the standard near-dup ladder:

- exact:   hash-groupBy on a normalized fingerprint — one shuffle on a 60-bit
           key; at scale this is the cheapest possible dedup.
- minhash+LSH: shingle -> minhash signature -> band -> bucket-join. Candidate
           generation is an equi-join on (band_idx, band_hash) — a shuffle on
           a well-distributed key, never an O(n²) cross product.
- simhash: 60-bit sketch; near-dups = small hamming distance. Candidates via
           band-equality of bit ranges keeps it join-based.
- n-gram Jaccard: exact similarity on candidate pairs (verification step after
           LSH, or standalone for small corpora via shared-ngram blocking).
- embedding cosine: semantic dedup over array<float>; blocked by coarse key
           (e.g. a cluster/label) to avoid the n² explosion.

Every function returns a DataFrame plan — no driver-side materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bears_spark.functions.hashing import minhash_signature, simhash64, hamming64
from bears_spark.functions.text import char_shingles, fingerprint64, tokenize, word_ngrams
from bears_spark.functions.vectors import cosine_similarity


def exact_dedup(df: DataFrame, text_col: str, keep_col: str) -> DataFrame:
    """Keep one row per normalized-text fingerprint (the min of ``keep_col``).

    groupBy on the fingerprint (uniform 60-bit key → no skew), min_by for the
    survivor: single shuffle, map-side partial agg.
    """
    fp = fingerprint64(text_col).alias("__fp__")
    return (
        df.select(F.col(keep_col), fp)
        .groupBy("__fp__")
        .agg(F.min(keep_col).alias(keep_col))
        .select(keep_col)
    )


def incremental_dedup(
    batch: DataFrame,
    store: DataFrame | None,
    text_col: str,
    id_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Streaming-ingest dedup: filter an incoming batch against a historical
    fingerprint store, then against itself.

    Returns ``(survivors, new_store)``: survivors are batch rows whose
    normalized fingerprint is neither in the store nor claimed by an earlier
    (min ``id_col``) row of the same batch; new_store is the store with this
    batch's fingerprints folded in — write it back each ingest cycle and the
    pipeline never rescans history. The store is one slim (fingerprint)
    column: 8 bytes/doc forever vs re-fingerprinting the corpus per batch.

    Plan shape: within-batch groupBy (uniform 60-bit key) + left_anti join
    against the store on the fingerprint — both shuffle only fingerprints,
    and at cluster scale the store side can be bucketed on __fp__ to kill
    the shuffle entirely.
    """
    fps = batch.select(F.col(id_col), fingerprint64(text_col).alias("__fp__"))
    first_per_fp = fps.groupBy("__fp__").agg(F.min(id_col).alias(id_col))
    if store is not None:
        first_per_fp = first_per_fp.join(store.select("__fp__"), on="__fp__", how="left_anti")
    survivors = batch.join(first_per_fp.select(id_col), on=id_col, how="left_semi")
    batch_fps = first_per_fp.select("__fp__")
    new_store = batch_fps if store is None else store.select("__fp__").union(batch_fps).distinct()
    return survivors, new_store


def minhash_band_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    ngram_n: int = 3,
) -> DataFrame:
    """(id, band, band_sig) banded-MinHash table — the storable form of an
    LSH index: two docs are near-dup candidates iff they share a row key
    (band, band_sig). minhash_lsh_candidates self-joins this table;
    io/lsh_index.py persists it and joins ingest deltas against it."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    grams = F.array_distinct(word_ngrams(text_col, ngram_n))
    # docs too short for any n-gram are excluded (an empty token set would
    # otherwise bucket all short docs together via the null signature)
    with_sig = (
        df.select(F.col(id_col), grams.alias("__grams__"))
        .filter(F.size("__grams__") > 0)
        .select(id_col, minhash_signature(F.col("__grams__"), num_hashes).alias("__sig__"))
    )
    return with_sig.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.array_join(
                        F.transform(
                            F.slice("__sig__", b * rows_per_band + 1, rows_per_band),
                            lambda v: v.cast("string"),
                        ),
                        "_",
                    ).alias("sig"),
                ),
            )
        ).alias("bs"),
    ).select(id_col, F.col("bs.band").alias("band"), F.col("bs.sig").alias("band_sig"))


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    ngram_n: int = 3,
    materialize: bool = True,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) from banded MinHash over word
    n-grams.

    rows_per_band = num_hashes / bands; two docs become candidates iff some
    band of their signatures matches exactly (P = 1-(1-j^rpb)^bands). Word
    n-grams (not char shingles) keep the token space discriminative on
    low-vocabulary corpora; rows_per_band >= 4 keeps bucket sizes near 1 for
    non-duplicates, so the self-equi-join on (band_idx, band_sig) stays
    linear.

    ``max_bucket_size`` caps the one skew risk: a giant (band, band_sig)
    bucket is a real duplicate cluster, and its all-pairs output is quadratic
    (10^6 boilerplate near-identical docs sharing a band signature emit
    ~10^12 pairs — AQE splits the shuffle, not the output). Buckets above the
    cap switch from all-pairs to a STAR: every member pairs with the bucket's
    min id. That keeps the output linear in bucket size while leaving the
    downstream connected-components clustering IDENTICAL (the star spans the
    bucket), at the cost of some non-representative pairs for pairwise
    verification — the standard web-dedup trade. Oversized buckets are few by
    definition, so the routing join is a broadcast. Set it at 100 TB; the
    default None keeps exact all-pairs semantics for modest corpora.
    """
    banded = minhash_band_table(df, id_col, text_col, num_hashes, bands, ngram_n)

    if materialize:
        # the self-join consumes this subtree twice; persist so signatures
        # compute once (at cluster scale: write the signature table once and
        # join it with itself — same principle). Registered with the scoped
        # registry so runners drain it after the query's actions.
        from bears_spark.caching import scoped_persist

        banded = scoped_persist(banded)

    if max_bucket_size is not None:
        big_keys = (
            banded.groupBy("band", "band_sig")
            .agg(F.count("*").alias("__bsz__"))
            .filter(F.col("__bsz__") > max_bucket_size)
            .select("band", "band_sig")
        )
        small = banded.join(F.broadcast(big_keys), on=["band", "band_sig"], how="left_anti")
        big = banded.join(F.broadcast(big_keys), on=["band", "band_sig"], how="left_semi")
        reps = big.groupBy("band", "band_sig").agg(F.min(id_col).alias("__rep__"))
        star = (
            big.join(F.broadcast(reps), on=["band", "band_sig"])
            .filter(F.col(id_col) > F.col("__rep__"))
            .select(F.col("__rep__").alias("id_a"), F.col(id_col).alias("id_b"))
        )
    else:
        small, star = banded, None

    a = small.alias("a")
    b = small.alias("b")
    pairs = (
        a.join(b, on=["band", "band_sig"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
    )
    if star is not None:
        pairs = pairs.unionByName(star)
    return pairs.distinct()


def simhash_sketch(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """Attach a SimHash sketch column ``simhash`` (token-level)."""
    return df.select(F.col(id_col), simhash64(tokenize(text_col), bits).alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bits: int = 32,
    bands: int = 4,
    materialize: bool = True,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, candidates via band
    bit-range equality (Charikar-style): any pair within hamming<=bands-1 must
    agree on at least one of ``bands`` disjoint bit bands — an equi-join, not n².
    """
    band_bits = bits // bands
    sk = simhash_sketch(df, id_col, text_col, bits)
    bands_df = sk.select(
        id_col,
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftright(F.col("simhash"), i * band_bits).bitwiseAND(F.lit((1 << band_bits) - 1)).alias("chunk"),
                )
                for i in range(bands)
            ])
        ).alias("bc"),
    ).select(id_col, "simhash", F.col("bc.band").alias("band"), F.col("bc.chunk").alias("chunk"))
    if materialize:
        from bears_spark.caching import scoped_persist

        bands_df = scoped_persist(bands_df)
    a, b = bands_df.alias("a"), bands_df.alias("b")
    return (
        a.join(b, on=["band", "chunk"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    materialize: bool = True,
    max_doc_freq: int | None = None,
    prefix_filter: bool = False,
    prune_unique_grams: bool = False,
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity for pairs sharing >=1 n-gram.

    Blocking on shared n-grams turns the n² similarity into: explode n-grams →
    self-join on the n-gram → count shared per pair → Jaccard from set sizes.

    The n-gram key is long-tailed; a stop-phrase gram appearing in X docs
    yields X² join rows, which is quadratic in the hottest key at web scale.
    ``max_doc_freq`` drops grams appearing in more than that many documents
    from BOTH the intersection and the set sizes, so ``jaccard`` remains an
    exact Jaccard over the capped gram space (a well-defined, deterministic
    similarity that also improves precision — boilerplate phrases stop
    counting as overlap). The hot-gram set is tiny by construction, so the
    exclusion is a broadcast anti-join — no extra shuffle of the gram table.

    ``prefix_filter`` enables the LOSSLESS set-similarity-join prefix
    optimization (PPJoin family): a pair with Jaccard >= t must share a gram
    within the first ``|A| - ceil(t*|A|) + 1`` grams of each side under a
    global rarest-first order, so only those prefixes enter the self-join;
    exact intersections are then computed for the (few) candidates via
    array_intersect. Results are IDENTICAL to the unfiltered join — this
    changes the plan, not the semantics.

    Crossover (measured at sf0.1, 5k docs): the prefix machinery (df rank +
    candidate verification) costs MORE than it saves on small/low-overlap
    corpora — naive 3.0s vs prefix 8.9s. Enable it when co-occurrence pairs
    dominate: web-scale corpora with heavy boilerplate overlap, where the
    naive join's pair count explodes but prefix candidates stay near the
    true-positive count.

    ``prune_unique_grams`` drops df=1 grams from the self-join input only
    (sizes still count them, so results are identical). Most shingles on a
    real web corpus are unique, making this the main input reducer at scale;
    at small SF the extra aggregation+semi-join is a wash, hence opt-in.
    """
    # widen the gram build to 4 partitions whenever the scan has fewer: a
    # 1-2-split scan makes the tokenize+shingle explode (the dominant build
    # cost) near-serial. Round 11 gated this on trigger_below=2 (1-split
    # only) because widening the 2-split sf1 input destabilized LAZY cache
    # builds (racing consumers); with the gram persist now EAGER (below)
    # the build happens exactly once before any consumer, so the race is
    # gone and the widen is pure build parallelism — r12 interleaved A/B at
    # sf1: first-cold 83-118 s (lazy, unwidened) -> ~19 s (eager, widen-4),
    # sf0.1 warm unchanged (1.7-1.8 s both arms). widen-8 was tried and
    # rejected: sf1 cold 12-14 s but the 8-partition cache costs every
    # consumer stage a task of fixed overhead (sf0.1 warm 1.9-2.4 s).
    # Production many-split inputs: no-op (guide §2.5, scale-adaptive).
    from bears_spark.skew import widen_input

    grams = widen_input(df.select(id_col, text_col), 4).select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(text_col, n))).alias("gram"),
    )
    # Join/shuffle on xxhash64(gram) instead of the gram string: 8-byte
    # fixed-width keys shuffle and compare ~20% faster at sf0.1 and far
    # better at scale (shuffle bytes drop ~3x). The gram value never leaves
    # this function, so hashing is invisible; a 64-bit collision (P ~ G^2 /
    # 2^65, ~1e-8 at 10^5 distinct grams) could only nudge one pair's
    # intersection count by 1.
    grams = grams.select(id_col, F.xxhash64("gram").alias("gram"))
    if materialize:
        # consumed three times (self-join both sides + sizes). eager: the
        # consumers materialize as ~11 CONCURRENT AQE stage jobs on a cold
        # cache, each rebuilding blocks it cannot lock (VERDICT r11 "Next
        # round" #2); one eager build runs the explode ONCE and the racers
        # then only read — r12 interleaved first-cold at sf1: 83-118 s
        # (lazy) -> 15-50 s (eager alone) -> ~19 s with the widen above.
        # The once-per-plan guard in scoped_persist keeps warm runs on the
        # lazy path (no per-run count job), so the bench's warm min is
        # unaffected (sf0.1 warm 1.59-1.70 s both arms, interleaved).
        from bears_spark.caching import scoped_persist

        grams = scoped_persist(grams, eager=True)
    # grams are distinct per doc, so count(*) per gram == document
    # frequency. ONE per-gram df aggregation serves BOTH consumers — the
    # >cap hot set (broadcast anti-join; survivors are few by construction)
    # and the df>=2 shared set for prune_unique_grams below. Previously the
    # shared set re-aggregated the whole gram table a second time; deriving
    # both from the same gram_df lets Spark reuse the aggregation exchange
    # (one pass over the gram table instead of two — guide §2.4).
    gram_df = None
    if max_doc_freq is not None or prune_unique_grams:
        gram_df = grams.groupBy("gram").agg(F.count("*").alias("__df__"))
    if max_doc_freq is not None:
        # The filtered view is NOT persisted: each consumer applies the
        # cheap broadcast anti-join over the already-persisted gram table,
        # which beats materializing a second near-copy of it.
        hot = gram_df.filter(F.col("__df__") > max_doc_freq).select("gram")
        grams = grams.join(F.broadcast(hot), on="gram", how="left_anti")
    sizes = grams.groupBy(id_col).agg(F.count("*").alias("n_grams"))

    if prefix_filter:
        return _ngram_jaccard_prefix(grams, sizes, id_col, threshold)

    # Carry each doc's gram-set size ON its gram rows (one small equi-join
    # BEFORE the self-join) so jaccard computes inside the pair aggregation
    # via first(na)/first(nb) — this removes TWO shuffled joins of the
    # (potentially huge) pair table against the sizes table. The size also
    # enables the LOSSLESS length-ratio filter in the join condition:
    # jaccard >= t requires min(|A|,|B|)/max(|A|,|B|) >= t, so size-
    # incompatible pairs are dropped before they reach the aggregation.
    gs = grams.join(sizes, id_col)
    if prune_unique_grams:
        # a gram in exactly one doc can never match in the self-join; on web
        # corpora most shingles are df=1, so dropping them cuts the join
        # input several-fold. Results are IDENTICAL (sizes keep counting
        # them; they contribute zero intersections). The shared set filters
        # the SAME gram_df as the hot set above (df over raw grams equals df
        # over capped grams for every surviving gram — dropping a hot gram
        # removes its whole group, never another gram's count), so the cap
        # condition re-applies here rather than re-aggregating post-cap.
        shared = gram_df.filter(F.col("__df__") >= 2)
        if max_doc_freq is not None:
            shared = shared.filter(F.col("__df__") <= max_doc_freq)
        gs = gs.join(shared.select("gram"), "gram", "left_semi")
    a, b = gs.alias("a"), gs.alias("b")
    cond = (
        (F.col("a.gram") == F.col("b.gram"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        & (F.col("b.n_grams") >= F.lit(threshold) * F.col("a.n_grams"))
        & (F.col("b.n_grams") <= F.col("a.n_grams") / F.lit(threshold))
    )
    return (
        a.join(b, cond)
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(
            F.count("*").alias("inter"),
            F.first("a.n_grams").alias("na"),  # constant within the group
            F.first("b.n_grams").alias("nb"),
        )
        .withColumn("jaccard", F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _ngram_jaccard_prefix(grams: DataFrame, sizes: DataFrame, id_col: str, threshold: float) -> DataFrame:
    """Prefix-filtered exact Jaccard join (see ngram_jaccard_pairs).

    Global gram order = (document frequency asc, gram) — rarest first, so
    prefixes hit the least-shared keys. Candidate generation joins only
    prefix grams; verification joins candidates back to full gram ARRAYS and
    takes size(array_intersect): exact, and proportional to candidates, not
    to co-occurrence pairs.
    """
    gram_df = grams.groupBy("gram").agg(F.count("*").alias("__df__"))
    ranked = (
        grams.join(gram_df, "gram")
        .withColumn(
            "__rn__",
            F.row_number().over(Window.partitionBy(id_col).orderBy("__df__", "gram")),
        )
        .join(sizes, id_col)
        # prefix length |A| - ceil(t*|A|) + 1: any pair with overlap >=
        # ceil(t*|A|) must collide inside it (pigeonhole under global order)
        .filter(F.col("__rn__") <= F.col("n_grams") - F.ceil(F.lit(threshold) * F.col("n_grams")) + 1)
        .select(id_col, "gram")
    )
    a, b = ranked.alias("a"), ranked.alias("b")
    cands = (
        a.join(b, on="gram")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    gram_arrays = grams.groupBy(id_col).agg(F.collect_list("gram").alias("__gs__"))
    ga = gram_arrays.select(F.col(id_col).alias("id_a"), F.col("__gs__").alias("ga"))
    gb = gram_arrays.select(F.col(id_col).alias("id_b"), F.col("__gs__").alias("gb"))
    return (
        cands.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("inter", F.size(F.array_intersect("ga", "gb")))
        .withColumn(
            "jaccard",
            F.col("inter").cast("double") / (F.size("ga") + F.size("gb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str | None = None,
    threshold: float = 0.95,
    max_unblocked_rows: int = 100_000,
) -> DataFrame:
    """Semantic near-dup pairs by embedding cosine >= threshold.

    ``block_col`` (a cluster id / coarse LSH bucket / label) bounds the join:
    with blocking this is an equi-join per block; without it a cross join.
    The unblocked path HARD-FAILS above ``max_unblocked_rows`` (probed with a
    limit-bounded count, not a full scan): an accidental 10M-row cross join
    is 10^14 pairs. At 100 TB: pre-cluster (KMeans or random-hyperplane
    bucket) then block.
    """
    if block_col is None:
        probe = df.limit(max_unblocked_rows + 1).count()
        if probe > max_unblocked_rows:
            raise ValueError(
                f"embedding_cosine_pairs without block_col is a cross join; input exceeds "
                f"{max_unblocked_rows} rows — pass block_col (coarse cluster / LSH bucket) "
                "or raise max_unblocked_rows explicitly"
            )
    cols = [F.col(id_col), F.col(vec_col)] + ([F.col(block_col)] if block_col else [])
    base = df.select(*cols)
    a, b = base.alias("a"), base.alias("b")
    if block_col:
        joined = a.join(b, on=[block_col])
    else:
        joined = a.crossJoin(b)
    return (
        joined.filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cosine_similarity(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def semantic_cluster_stats(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cluster_col: str,
    threshold: float = 0.95,
    gram_block_elems: int = 16_000_000,
) -> DataFrame:
    """Per-cluster semantic-dedup statistics via a BLAS gram matrix: for each
    cluster, members / cosine-pairs >= threshold / distinct dropped ids under
    keep-lowest-id survivorship.

    The pair stage is where SemDeDup spends its flops (m^2*d per cluster);
    a per-pair JVM expression evaluates them scalar-at-a-time, while one
    ``X @ X.T`` per cluster hits vectorized BLAS — measured 3x faster at
    sf0.1 and the gap widens with cluster size. Arrow-batched via
    applyInPandas (the sanctioned Python path: batch-vectorized, never
    per-row). Counts are engine-exact in practice: BLAS reduction order
    differs from left-to-right only at ~1e-16, so a >= threshold flip would
    need a cosine within float ulp of the threshold (measured identical to
    the JVM expression path; see test_semantic_cluster_stats_matches_jvm).

    At 100 TB: parallelism = number of clusters (choose k accordingly). A
    cluster too big for one gram matrix is processed in chunked ROW BLOCKS
    of ``X[i:i+B] @ X.T`` — peak extra memory is bounded by
    ``gram_block_elems`` doubles (default 16M = 128 MB) regardless of
    cluster size, so a skewed hot cluster of m members costs m*d for X plus
    one bounded block, never m^2 (VERDICT r5 #2). Each gram element is the
    same row-pair dot product either way, so blockwise counts equal the
    single-shot gram's exactly (test_semantic_cluster_stats_blockwise).
    """
    import numpy as np
    import pandas as pd

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        cid = pdf[cluster_col].iloc[0]
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        X = np.asarray([np.asarray(x, dtype=np.float64) for x in pdf[vec_col].iloc[order]])
        nrm = np.sqrt((X * X).sum(axis=1))
        nrm[nrm == 0.0] = np.nan  # zero vectors: cosine undefined -> no pairs
        m = len(ids)
        block = max(1, gram_block_elems // max(m, 1))
        n_pairs = 0
        dropped: set[int] = set()  # global row index of each pair's LARGER id
        for i0 in range(0, m, block):
            i1 = min(i0 + block, m)
            Gb = (X[i0:i1] @ X.T) / np.outer(nrm[i0:i1], nrm)
            rows, cols = np.nonzero(np.nan_to_num(Gb, nan=-2.0) >= threshold)
            upper = cols > (rows + i0)  # upper triangle: pair (i, j), j > i
            n_pairs += int(upper.sum())
            dropped.update(cols[upper].tolist())
        return pd.DataFrame(
            {
                "cid": [cid],
                "n_members": [m],
                "n_dup_pairs": [n_pairs],
                "n_dropped": [len(dropped)],
            }
        )

    out_schema = "cid int, n_members long, n_dup_pairs long, n_dropped long"
    return df.groupBy(cluster_col).applyInPandas(stats, out_schema)


def duplicate_clusters(pairs: DataFrame, survivors_only: bool = False) -> DataFrame:
    """Union near-dup pairs into clusters via min-id label propagation
    (single pass — exact when clusters are star-shaped, which LSH output
    mostly is; see connected_components for the fixpoint version)."""
    labels = pairs.select(F.col("id_a").alias("id"), F.least("id_a", "id_b").alias("root")).unionByName(
        pairs.select(F.col("id_b").alias("id"), F.least("id_a", "id_b").alias("root"))
    )
    return labels.groupBy("id").agg(F.min("root").alias("cluster_root"))


def connected_components(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Exact connected components over the pair graph: iterate min-label
    propagation to fixpoint (id, component).

    Each round: every node adopts the min label in its neighborhood
    (including its own). Converges in O(graph diameter) rounds — dup-pair
    graphs are shallow (chains of a few hops), so typically 2-4 rounds.
    Labels are checkpointed per round to cut the growing lineage — at
    cluster scale use localCheckpoint(eager=True) exactly as here.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .persist()
    )
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn("comp", F.col("id")).localCheckpoint()

    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))).alias("comp"),
            )
            .localCheckpoint()
        )
        changed = new_labels.alias("n").join(
            labels.alias("o"), on="id"
        ).filter(F.col("n.comp") != F.col("o.comp")).limit(1).count()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels.select("id", F.col("comp").alias("component"))


def levenshtein_verify(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Exact edit-distance VERIFY stage for the dedup ladder: given candidate
    pairs (from MinHash/SimHash/Jaccard blocking), attach the true
    Levenshtein distance and keep pairs within ``max_distance``.

    Levenshtein is O(len_a * len_b) per pair — never run it corpus-pairwise
    (measured: blocking the raw corpus on (lang, token_count) at sf0.1 cost
    65 s for 4 survivors); run it on the candidate set, which sketch-based
    blocking has already cut to near the true-duplicate count. Two
    broadcast-sized hash joins fetch the texts; the distance itself is a
    JVM built-in (F.levenshtein), identical integer semantics in DuckDB.
    """
    texts_a = docs.select(F.col(id_col).alias(id_a), F.col(text_col).alias("__ta__"))
    texts_b = docs.select(F.col(id_col).alias(id_b), F.col(text_col).alias("__tb__"))
    return (
        pairs.join(texts_a, id_a)
        .join(texts_b, id_b)
        .withColumn("edit_dist", F.levenshtein(F.col("__ta__"), F.col("__tb__")))
        .filter(F.col("edit_dist") <= max_distance)
        .select(id_a, id_b, "edit_dist")
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    materialize: bool = True,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Asymmetric near-dup detection by n-gram CONTAINMENT (Broder 1997):
    c(A→B) = |A∩B| / |A|. Catches what Jaccard misses — a short document
    wholly quoted inside a much longer one scores c≈1 while its Jaccard is
    tiny. Emits pairs where either direction reaches ``threshold``, with
    both directional scores.

    Same blocking discipline as ngram_jaccard_pairs (hashed gram equi-join,
    optional df-cap broadcast anti-join); deliberately NO length-ratio
    prune — the asymmetric size gap is exactly the signal. At web scale the
    df-cap is the mandatory guard here, since boilerplate grams pair every
    wrapper page with every wrapped one."""
    # no widen_input: persisted-fan-out shape, same reasoning as
    # ngram_jaccard_pairs above
    grams = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(text_col, n))).alias("gram"),
    ).select(id_col, F.xxhash64("gram").alias("gram"))
    if materialize:
        from bears_spark.caching import scoped_persist

        grams = scoped_persist(grams)
    if max_doc_freq is not None:
        hot = (
            grams.groupBy("gram")
            .agg(F.count("*").alias("__df__"))
            .filter(F.col("__df__") > max_doc_freq)
            .select("gram")
        )
        grams = grams.join(F.broadcast(hot), on="gram", how="left_anti")
    sizes = grams.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    gs = grams.join(sizes, id_col)
    a, b = gs.alias("a"), gs.alias("b")
    cond = (F.col("a.gram") == F.col("b.gram")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    return (
        a.join(b, cond)
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(
            F.count("*").alias("inter"),
            F.first("a.n_grams").alias("na"),
            F.first("b.n_grams").alias("nb"),
        )
        .withColumn("containment_ab", F.col("inter").cast("double") / F.col("na"))
        .withColumn("containment_ba", F.col("inter").cast("double") / F.col("nb"))
        .filter(F.greatest("containment_ab", "containment_ba") >= threshold)
        .select("id_a", "id_b", "containment_ab", "containment_ba")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 4,
    threshold: float = 0.5,
    block_chars: int = 2,
    key_chars: int = 40,
) -> DataFrame:
    """Sorted-neighborhood dedup blocking (Hernandez-Stolfo merge/purge):
    sort records by a normalized key and compare each record only to its next
    ``window`` neighbors, verified by token-set Jaccard.

    Scale shape: the sort runs WITHIN blocks (the first ``block_chars`` chars
    of the normalized key partition the window), never globally — one shuffle
    on the block key, forward-only ``lead()`` per block, then a pure-expression
    Jaccard over the exploded neighbor list. Candidate volume is linear
    (``window`` per record) vs the quadratic all-pairs a naive merge/purge
    implies. The trade: near-dups whose keys diverge inside the first
    ``block_chars`` chars are missed by construction — standard SNM practice
    is a second pass with a rotated key for recall.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    base = df.select(
        F.col(id_col),
        F.substring(norm, 1, block_chars).alias("__blk__"),
        F.substring(norm, 1, key_chars).alias("__key__"),
        F.array_distinct(tokenize(text_col)).alias("__toks__"),
    )
    w = Window.partitionBy("__blk__").orderBy("__key__", id_col)
    neigh = F.array_compact(
        F.array(
            *[
                F.lead(F.struct(F.col(id_col).alias("nid"), F.col("__toks__").alias("ntoks")), i).over(w)
                for i in range(1, window + 1)
            ]
        )
    )
    pairs = base.withColumn("__n__", neigh).select(id_col, "__toks__", F.explode("__n__").alias("nb"))
    inter = F.size(F.array_intersect("__toks__", F.col("nb.ntoks")))
    union = F.size("__toks__") + F.size(F.col("nb.ntoks")) - inter
    # two empty-token docs give union 0: no defined similarity (and ANSI
    # mode would error on the division) -> null, dropped by the filter
    return (
        pairs.withColumn("__j__", F.when(union > 0, inter.cast("double") / union))
        .filter(F.col("__j__") >= threshold)
        .select(
            F.least(F.col(id_col), F.col("nb.nid")).alias("id_a"),
            F.greatest(F.col(id_col), F.col("nb.nid")).alias("id_b"),
            F.col("__j__").alias("jaccard"),
        )
    )


def chunk_exact_dedup(
    df,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 32,
    overlap: int = 8,
):
    """Corpus-wide exact dedup at CHUNK granularity (the passage-level
    boilerplate removal of RefinedWeb-style pipelines): chunk every document
    (functions/text.py chunk_documents), then keep each distinct chunk text
    only at its FIRST occurrence — ordered by (id, chunk_id), so the
    earliest document owns the shared passage and later repeats drop.

    Returns the chunk frame with an ``is_first`` flag (composable: filter,
    or aggregate per document for survival stats). One shuffle, keyed on
    xxhash64(chunk_text) — 8-byte keys instead of ~hundreds-byte passages;
    the window's row_number carries no text either. A 64-bit collision
    merges two distinct passages at ~N²/2^65 odds (same accepted trade as
    the other dedup stages).
    """
    from pyspark.sql import Window

    from bears_spark.functions.text import chunk_documents

    chunks = chunk_documents(df, id_col, text_col, chunk_tokens=chunk_tokens, overlap=overlap)
    w = Window.partitionBy(F.xxhash64("chunk_text")).orderBy(id_col, "chunk_id")
    return chunks.withColumn("is_first", F.row_number().over(w) == 1)


def edit_distance_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int,
) -> DataFrame:
    """Exact edit-distance self-join: all pairs with
    ``levenshtein(a, b) <= max_distance``, without the O(n²) cross product.
    Beyond-reference dedup-family member — the reference has no
    string-similarity join at all.

    Candidate generation is the PassJoin partition signature (Li, Deng,
    Feng — ICDE'11 / TODS'13), LOSSLESS by pigeonhole:

    - Each string is split into d+1 contiguous segments (d = max_distance;
      even split, the first ``len mod (d+1)`` segments one char longer). An
      edit script of <= d operations touches at most d segments, so one
      segment survives VERBATIM in any partner within distance d, shifted
      by at most d positions.
    - Segment side: every string of length L >= d+1 emits its d+1 segments
      keyed (L, slot, content).
    - Probe side: every string emits, for each partner length
      l in [L-d, L+d] (l >= d+1) and each slot, the substrings of itself at
      the slot's expected position +-d, keyed (l, slot, content). Fan-out is
      bounded by (2d+1)(d+1)(2d+1) rows per string INDEPENDENT of string
      length (~45 at d=2, pre-deduplicated with array_distinct), and keys
      are exact substrings of length ~L/(d+1) — far more selective than any
      q-gram scheme, with no global frequency pass at all.
    - Candidates = equi-join segments-to-probes on the triple key; the
      surviving-segment lemma guarantees every true pair collides. A hot
      key means many strings genuinely share a ~L/(d+1)-char run at the
      same slot — i.e. a real near-dup cluster whose pairs the join must
      output anyway.
    - Strings shorter than d+1 chars (no nonempty split exists) pair only
      with strings of length <= 2d; that bounded micro-string pool is
      brute-forced through a length-banded equi-join.

    Verification is the JVM-side ``F.levenshtein`` on candidates only
    (reusing levenshtein_verify), so the O(len²) DP runs proportional to
    candidates, never to co-occurrence pairs. Result: (id_a, id_b,
    edit_dist) with id_a < id_b — equals the brute-force ANSI-SQL
    double-self-join oracle row-for-row.
    """
    d = max_distance
    k = d + 1  # number of segments
    strings = df.select(F.col(id_col).alias("__id__"), F.col(text_col).alias("__s__")).where(
        F.col(text_col).isNotNull()
    )
    lens = strings.withColumn("__len__", F.length("__s__"))

    # segment boundaries for partner length l, slot i (0-based, 1-indexed
    # positions): slen = l div k + (i < l mod k), start = 1 + i*(l div k)
    #             + least(i, l mod k)
    def _slen(l: str, i: str) -> str:
        return f"(({l}) div {k} + if(({i}) < ({l}) % {k}, 1, 0))"

    def _start(l: str, i: str) -> str:
        return f"(1 + ({i}) * (({l}) div {k}) + least(({i}), ({l}) % {k}))"

    seg_side = (
        lens.filter(F.col("__len__") >= k)
        .select(
            "__id__",
            F.col("__len__").alias("key_len"),
            F.explode(
                F.expr(
                    "transform(sequence(0, {d}), i -> struct(i AS slot, "
                    "substring(__s__, {start}, {slen}) AS content))".format(
                        d=d, start=_start("__len__", "i"), slen=_slen("__len__", "i")
                    )
                )
            ).alias("seg"),
        )
        .select("__id__", "key_len", F.col("seg.slot").alias("slot"), F.col("seg.content").alias("content"))
    )

    # probe rows: for each partner length l and slot i, substrings at the
    # slot's expected start +-d (clamped to the string); empty windows and
    # duplicate probes pruned inside the array expression before explode
    probe_expr = """
    array_distinct(flatten(transform(
      sequence(greatest(__len__ - {d}, {k}), __len__ + {d}), l ->
        flatten(transform(sequence(0, {d}), i ->
          if(greatest(1, {start} - {d}) <= least(__len__ - {slen} + 1, {start} + {d}),
             transform(
               sequence(greatest(1, {start} - {d}), least(__len__ - {slen} + 1, {start} + {d})),
               p -> struct(l AS key_len, i AS slot, substring(__s__, p, {slen}) AS content)),
             array())
        ))
    )))
    """.format(d=d, k=k, start=_start("l", "i"), slen=_slen("l", "i"))
    probe_side = (
        lens.filter(F.col("__len__") + d >= k)
        .select("__id__", F.explode(F.expr(probe_expr)).alias("pr"))
        .select(
            "__id__",
            F.col("pr.key_len").alias("key_len"),
            F.col("pr.slot").alias("slot"),
            F.col("pr.content").alias("content"),
        )
    )

    seg_a, probe_b = seg_side.alias("a"), probe_side.alias("b")
    main_cands = (
        seg_a.join(probe_b, ["key_len", "slot", "content"])
        .filter(F.col("a.__id__") != F.col("b.__id__"))
        .select(
            F.least(F.col("a.__id__"), F.col("b.__id__")).alias("id_a"),
            F.greatest(F.col("a.__id__"), F.col("b.__id__")).alias("id_b"),
        )
    )

    # micro-string pool: both sides shorter than d+1 can never meet the
    # segment join (no segment side); partners are <= 2d chars, a bounded
    # slice joined on an exploded length band (equi-join, never a product)
    short_pool = lens.filter(F.col("__len__") < k).select("__id__", "__len__")
    sa = short_pool.alias("a")
    sb = short_pool.withColumn(
        "__band__", F.explode(F.sequence(F.col("__len__") - d, F.col("__len__") + d))
    ).alias("b")
    short_cands = (
        sa.join(sb, F.col("a.__len__") == F.col("b.__band__"))
        .filter(F.col("a.__id__") < F.col("b.__id__"))
        .select(F.col("a.__id__").alias("id_a"), F.col("b.__id__").alias("id_b"))
    )

    cands = main_cands.unionByName(short_cands).distinct()
    docs = strings.select(F.col("__id__").alias(id_col), F.col("__s__").alias(text_col))
    return levenshtein_verify(cands, docs, id_col, text_col, d)
