"""Byte-pair-encoding tokenizer: distributed count, driver-side merge loop,
distributed apply (Sennrich et al. 2016; the GPT-2 merge-rank application).

Training follows the standard two-tier shape every production BPE trainer
uses: the CORPUS is reduced to a word-type frequency table with one
distributed count (the only pass over the data), then the merge loop runs
over that bounded table driver-side — pair statistics are maintained
incrementally, so each merge costs O(types containing the pair), not a
corpus rescan. Application is a broadcast of the merge ranks + an
Arrow-batched pandas function with per-word memoization — the hot path the
token-counting stage of a 100 TB pipeline runs.

A cardinality guard (same style as LabelEncoding) refuses to collect an
unbounded type table: real corpora cap types (lowercase/NFC upstream) or
sample for training — both standard practice.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"
MAX_WORD_TYPES = 2_000_000  # driver guard: ~100 MB of type table


def word_type_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace word-type frequency table — the single distributed pass
    BPE training needs."""
    return (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )


def bpe_train(df: DataFrame, text_col: str = "text", num_merges: int = 100) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Deterministic:
    ties on pair frequency break lexicographically, so the same corpus
    always yields the same merge list regardless of partitioning."""
    counts_df = word_type_counts(df, text_col)
    n_types = counts_df.count()
    if n_types > MAX_WORD_TYPES:
        raise ValueError(
            f"bpe_train: {n_types} word types exceeds MAX_WORD_TYPES={MAX_WORD_TYPES}; "
            "normalize/lowercase upstream or train on a hash_sample of the corpus"
        )
    types: list[tuple[list[str], int]] = [
        ([*r["w"], END_OF_WORD], int(r["c"])) for r in counts_df.collect()
    ]
    # incremental pair statistics: pair -> total count, and pair -> type ids
    pair_counts: Counter = Counter()
    pair_types: dict[tuple[str, str], set[int]] = {}
    for ti, (syms, c) in enumerate(types):
        for p in zip(syms, syms[1:]):
            pair_counts[p] += c
            pair_types.setdefault(p, set()).add(ti)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        # deterministic: max count, then lexicographically smallest pair
        best_count = max(pair_counts.values())
        if best_count <= 0:
            break
        best_pair = min(p for p, c in pair_counts.items() if c == best_count)
        merges.append(best_pair)
        new_sym = best_pair[0] + best_pair[1]
        for ti in list(pair_types.get(best_pair, ())):
            syms, c = types[ti]
            # remove old pair contributions of this type
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                s = pair_types.get(p)
                if s is not None:
                    s.discard(ti)
                    if not s:
                        del pair_types[p]
            # apply the merge within the word
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == best_pair[0] and syms[i + 1] == best_pair[1]:
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            types[ti] = (out, c)
            for p in zip(out, out[1:]):
                pair_counts[p] += c
                pair_types.setdefault(p, set()).add(ti)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word by repeatedly merging the lowest-rank pair
    (the GPT-2 application order — equivalent to replaying training order)."""
    syms = [*word, END_OF_WORD]
    while len(syms) > 1:
        pairs = list(zip(syms, syms[1:]))
        ranked = [(ranks[p], i) for i, p in enumerate(pairs) if p in ranks]
        if not ranked:
            break
        _, i = min(ranked)
        syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2 :]
    return syms


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize each document -> (id, n_words, n_tokens, tokens string).
    Merge ranks broadcast via closure; per-word memo cache amortizes the
    merge loop over repeated words (Zipf makes the hit rate ~99% on text)."""
    import pandas as pd

    ranks = {p: i for i, p in enumerate(merges)}

    def _tok(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                toks: list[str] = []
                words = str(r[text_col]).split()
                for w in words:
                    got = cache.get(w)
                    if got is None:
                        got = encode_word(w, ranks)
                        cache[w] = got
                    toks.extend(got)
                rows.append(
                    {
                        id_col: r[id_col],
                        "n_words": len(words),
                        "n_tokens": len(toks),
                        "tokens": " ".join(toks),
                    }
                )
            yield pd.DataFrame(rows, columns=[id_col, "n_words", "n_tokens", "tokens"])

    return df.select(id_col, text_col).mapInPandas(
        _tok, schema=f"{id_col} long, n_words long, n_tokens long, tokens string"
    )
