"""BPE tokenizer-training tests (operators/tokenizer.py)."""

import pytest
from pyspark.sql import Row

from aleph2_contrib_spark.operators import tokenizer as tok


def _hist_df(spark, hist):
    return spark.createDataFrame([Row(word=w, n=n) for w, n in hist.items()])


def test_bpe_learn_classic_example(spark):
    # Sennrich et al. (2016) worked example. Initial pair counts:
    #   (e,s) = (s,t) = (t,</w>) = 9 (newest 6 + widest 3)
    #   (l,o) = (o,w) = 7          (low 5 + lower 2)
    # Deterministic tie-break is lexicographic, so the merge order is
    # exactly: (e,s) -> (es,t) -> (est,</w>) -> (l,o).
    hist = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = tok.bpe_learn(_hist_df(spark, hist), num_merges=4)
    assert merges == [("e", "s"), ("es", "t"), ("est", tok.EOW), ("l", "o")]


def test_segment_word_applies_ranked_merges():
    merges = [("e", "s"), ("es", "t"), ("est", tok.EOW), ("l", "o")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert tok.segment_word("lowest", ranks) == ["lo", "w", "est" + tok.EOW]
    # A word sharing no learned pair stays fully character-split.
    assert tok.segment_word("zq", ranks) == ["z", "q", tok.EOW]


def test_bpe_learn_stops_when_no_pair_reaches_floor(spark):
    hist = {"ab": 1, "cd": 1}
    merges = tok.bpe_learn(_hist_df(spark, hist), num_merges=10, min_pair_count=2)
    assert merges == []


def test_bpe_learn_vocab_cap_fails_fast(spark):
    hist = {"aa": 1, "bb": 1, "cc": 1}
    with pytest.raises(ValueError, match="min_count"):
        tok.bpe_learn(_hist_df(spark, hist), num_merges=1, max_vocab_rows=2)


def test_word_histogram_counts_and_floor(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="The cat, the CAT!"), Row(doc_id=2, text="a cat")]
    )
    rows = {r["word"]: r["n"] for r in tok.word_histogram(df).collect()}
    assert rows == {"the": 2, "cat": 3, "a": 1}
    floored = {r["word"] for r in tok.word_histogram(df, min_count=2).collect()}
    assert floored == {"the", "cat"}


def test_bpe_tokenize_piece_counts_shrink_with_merges(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="newest newest widest"),
            Row(doc_id=2, text="low lower"),
        ]
    )
    hist = tok.word_histogram(df)
    # Zero merges: every word splits to characters + EOW.
    none = {r["doc_id"]: r for r in tok.bpe_tokenize(df, []).collect()}
    assert none[1]["n_words"] == 3
    assert none[1]["n_pieces"] == (6 + 1) * 3
    assert none[2]["n_pieces"] == (3 + 1) + (5 + 1)
    merges = tok.bpe_learn(hist, num_merges=6, min_pair_count=1)
    some = {r["doc_id"]: r for r in tok.bpe_tokenize(df, merges).collect()}
    assert some[1]["n_pieces"] < none[1]["n_pieces"]
    assert some[2]["n_pieces"] < none[2]["n_pieces"]
    assert some[1]["n_words"] == none[1]["n_words"]


def test_bpe_tokenize_broadcasts_dictionary(spark):
    df = spark.createDataFrame([Row(doc_id=i, text="alpha beta gamma") for i in range(10)])
    plan = tok.bpe_tokenize(df, [("a", "l")])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bpe_end_to_end_partition_invariant(spark):
    rows = [
        Row(doc_id=i, text=" ".join("w%d" % ((i + j) % 7) for j in range(12)))
        for i in range(30)
    ]
    df1 = spark.createDataFrame(rows).repartition(1)
    df2 = spark.createDataFrame(rows).repartition(16)
    m1 = tok.bpe_learn(tok.word_histogram(df1), num_merges=8, min_pair_count=1)
    m2 = tok.bpe_learn(tok.word_histogram(df2), num_merges=8, min_pair_count=1)
    assert m1 == m2
    a = sorted(map(tuple, tok.bpe_tokenize(df1, m1).collect()))
    b = sorted(map(tuple, tok.bpe_tokenize(df2, m2).collect()))
    assert a == b


def test_bpe_vocab_table_shape(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="newest widest newest")])
    out = tok.bpe_vocab_table(spark, df, num_merges=3, min_pair_count=1)
    rows = out.orderBy("rank").collect()
    assert [r["rank"] for r in rows] == [0, 1, 2]
    assert all(r["merged"] == r["left"] + r["right"] for r in rows)
