"""BPE tokenizer tests: hand-checked merge order, application round-trip,
partition invariance, and the type-table guard."""

import pytest
from pyspark.sql import functions as F

from bears_spark.functions.bpe import END_OF_WORD, bpe_apply, bpe_train, encode_word


def test_train_hand_checked_merges(spark):
    # corpus: "low" x5, "lower" x2 -> classic Sennrich example shape.
    df = spark.createDataFrame([("low low low low low lower lower",)], "text: string")
    merges = bpe_train(df, num_merges=4)
    # pair counts: (l,o)=7, (o,w)=7, (w,</w>)=5, (w,e)=2, (e,r)=2, (r,</w>)=2
    # tie 7/7 -> lexicographic: (l,o) first, then (lo,w)
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")
    assert merges[2] == ("low", END_OF_WORD)  # count 5 beats 2s
    assert merges[3] in (("e", "r"), ("low", "e"))  # 2-count tie, lexicographic
    assert merges[3] == min(("e", "r"), ("low", "e"))


def test_encode_word_round_trip():
    merges = [("l", "o"), ("lo", "w"), ("low", END_OF_WORD)]
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("low", ranks) == ["low</w>"]
    toks = encode_word("lowest", ranks)
    assert "".join(toks) == "lowest" + END_OF_WORD  # lossless
    assert toks[0] == "low"  # learned prefix reused


def test_apply_counts_and_round_trip(spark):
    docs = spark.createDataFrame(
        [(1, "low low lower"), (2, "newer lower"), (3, "")], "doc_id: bigint, text: string"
    )
    merges = bpe_train(docs, num_merges=6)
    out = {r["doc_id"]: r for r in bpe_apply(docs, merges).collect()}
    assert out[1]["n_words"] == 3
    assert out[3]["n_tokens"] == 0
    # token stream reassembles the text (END_OF_WORD marks word ends)
    rebuilt = out[2]["tokens"].replace(" ", "").replace(END_OF_WORD, " ").strip()
    assert rebuilt == "newer lower"
    # more merges -> fewer tokens, never fewer than word count
    assert out[1]["n_tokens"] >= out[1]["n_words"]


def test_train_partition_invariant(spark):
    rows = [(i, "alpha beta gamma alpha beta alpha") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id: bigint, text: string")
    m1 = bpe_train(df.repartition(1), num_merges=10)
    m2 = bpe_train(df.repartition(13), num_merges=10)
    assert m1 == m2


def test_type_table_guard(spark, monkeypatch):
    import bears_spark.functions.bpe as bpe_mod

    monkeypatch.setattr(bpe_mod, "MAX_WORD_TYPES", 2)
    df = spark.createDataFrame([("a b c d e",)], "text: string")
    with pytest.raises(ValueError, match="word types exceeds"):
        bpe_train(df, num_merges=2)
