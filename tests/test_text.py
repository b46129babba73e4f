

# -- readability_stats --------------------------------------------------------


def test_readability_stats_hand_worked(spark):
    from aleph2_contrib_spark.operators.text import readability_stats

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"), (2, "no punctuation here"), (3, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in readability_stats(df).collect()}
    # doc 1: 6 words, 2 sentences, vowel groups: e,a,a,e,o,a -> 6
    assert got[1]["n_words"] == 6 and got[1]["n_sentences"] == 2
    assert got[1]["n_syllable_groups"] == 6
    assert got[1]["flesch_m3"] == 206835 - (1015 * 6) // 2 - (84600 * 6) // 6
    # doc 2: 3 words, 0 sentences (guarded div), groups: o,u,ua,io,e,e -> 6
    assert got[2]["n_sentences"] == 0
    assert got[2]["flesch_m3"] == 206835 - (1015 * 3) // 1 - (84600 * 6) // 3
    # empty doc: all zero, score 206835
    assert got[3]["flesch_m3"] == 206835


def test_readability_oracle_matches(spark, tmp_path):
    import duckdb

    from aleph2_contrib_spark.operators.text import (
        readability_stats,
        readability_stats_oracle_sql,
    )

    rows = [
        (i, t)
        for i, t in enumerate(
            ["Hello world. How are you?", "x! y? z.", "aaa eee iii", "", "Rhythm myth."]
        )
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    p = str(tmp_path / "d.parquet")
    df.coalesce(1).write.parquet(p)
    got = {tuple(x) for x in readability_stats(df).collect()}
    want = {
        tuple(x)
        for x in duckdb.sql(
            readability_stats_oracle_sql(f"'{p}/*.parquet'")
        ).fetchall()
    }
    assert got == want


# -- source_similarity_minhash ------------------------------------------------


def test_source_similarity_identical_and_disjoint(spark):
    import pytest

    from aleph2_contrib_spark.operators.text import source_similarity_minhash

    rows = [
        ("s1", "alpha beta gamma"),
        ("s2", "alpha beta gamma"),       # identical token set to s1
        ("s3", "zeta eta theta iota"),    # disjoint
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        (r["group_a"], r["group_b"]): (r["n_matches"], r["jaccard_est_ppm"])
        for r in source_similarity_minhash(df, k=16).collect()
    }
    assert got[("s1", "s2")] == (16, 1000000)   # identical sets match all registers
    assert got[("s1", "s3")][0] == 0            # disjoint sets: md5 minima differ
    assert got[("s2", "s3")][0] == 0
    with pytest.raises(ValueError, match="k must be"):
        source_similarity_minhash(df, k=0)


def test_source_similarity_oracle_matches(spark, tmp_path):
    import random

    import duckdb

    from aleph2_contrib_spark.operators.text import (
        source_similarity_minhash,
        source_similarity_minhash_oracle_sql,
    )

    rnd = random.Random(7)
    vocab = [f"w{j}" for j in range(60)]
    rows = [
        (f"s{g}", " ".join(rnd.choice(vocab) for _ in range(30)))
        for g in range(4)
        for _ in range(10)
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    p = str(tmp_path / "d.parquet")
    df.coalesce(1).write.parquet(p)
    got = {tuple(x) for x in source_similarity_minhash(df, k=24, seed="t").collect()}
    want = {
        tuple(x)
        for x in duckdb.sql(
            source_similarity_minhash_oracle_sql(
                f"'{p}/*.parquet'", "source", "text", k=24, seed="t"
            )
        ).fetchall()
    }
    assert got == want and len(got) == 6


# -- code_detect --------------------------------------------------------------


def test_code_detect_routes_code_vs_prose(spark):
    from aleph2_contrib_spark.operators.text import code_detect

    rows = [
        (1, "def f(x):\n    return x + 1\n\nclass A:\n    pass"),
        (2, "The quick brown fox jumps over the lazy dog again and again."),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in code_detect(df).collect()}
    assert got[1]["is_code"] is True and got[1]["n_keywords"] >= 3
    assert got[2]["is_code"] is False and got[2]["symbol_ppm"] == 0
    assert got[3]["is_code"] is False and got[3]["symbol_ppm"] == 0


def test_code_detect_oracle_matches(spark, tmp_path):
    import duckdb

    from aleph2_contrib_spark.operators.text import (
        code_detect,
        code_detect_oracle_sql,
    )

    rows = [
        (1, "def f(x): return [x]"),
        (2, "plain words only here"),
        (3, "if (a < b) { c = d; } else { e = f; }"),
        (4, "for the record, while nice, this is prose"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    p = str(tmp_path / "d.parquet")
    df.coalesce(1).write.parquet(p)
    got = {tuple(x) for x in code_detect(df).collect()}
    want = {tuple(x) for x in duckdb.sql(code_detect_oracle_sql(f"'{p}/*.parquet'")).fetchall()}
    assert got == want


def test_kneser_ney_stats_hand_counts(spark):
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.text import kneser_ney_stats

    docs = spark.createDataFrame(
        [Row(text="the cat sat"), Row(text="the cat ran"), Row(text="a cat")]
    )
    out = {r.word: r for r in kneser_ney_stats(docs, "text").collect()}
    assert out["cat"].c_unigram == 3
    assert out["the"].c_unigram == 2
    # continuation counts: cat follows {the, a} -> 2 distinct lefts
    assert out["cat"].n_left_types == 2
    assert out["sat"].n_left_types == 1 and out["ran"].n_left_types == 1
    # doc-initial-only words have zero continuation mass
    assert out["the"].n_left_types == 0 and out["a"].n_left_types == 0
    # right expansions: cat -> {sat, ran}
    assert out["cat"].n_right_types == 2
    assert out["the"].n_right_types == 1 and out["a"].n_right_types == 1
    assert out["sat"].n_right_types == 0
    # bigram type count identity: sum of continuation counts
    assert sum(r.n_left_types for r in out.values()) == 4


def test_kneser_ney_san_francisco_property(spark):
    """A word can be frequent yet have minimal continuation count when it
    only ever follows one context — exactly what KN discounts."""
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.text import kneser_ney_stats

    docs = spark.createDataFrame(
        [Row(text="san francisco")] * 5 + [Row(text="new york"), Row(text="old york")]
    )
    out = {r.word: r for r in kneser_ney_stats(docs, "text").collect()}
    assert out["francisco"].c_unigram == 5
    assert out["francisco"].n_left_types == 1  # only ever after "san"
    assert out["york"].n_left_types == 2  # {new, old}


def test_kneser_ney_tokenization_edges(spark):
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.text import kneser_ney_stats

    docs = spark.createDataFrame(
        [Row(text="  The   CAT  "), Row(text=""), Row(text=None), Row(text="x")],
        "text string",
    )
    out = {r.word: r for r in kneser_ney_stats(docs, "text").collect()}
    assert set(out) == {"the", "cat", "x"}
    assert out["the"].c_unigram == 1 and out["cat"].n_left_types == 1
    assert out["x"].n_left_types == 0 and out["x"].n_right_types == 0


def test_kneser_ney_property_vs_python_reference(spark):
    """Hypothesis: random tiny corpora — unigram, continuation, and
    right-expansion counts must equal an independent Python reference."""
    from collections import Counter

    from hypothesis import given, settings, strategies as st
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.text import kneser_ney_stats

    corpora = st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), max_size=6),
        min_size=1,
        max_size=5,
    )

    @settings(max_examples=15, deadline=None)
    @given(corpora)
    def run(docs):
        uni = Counter()
        pairs = set()
        for d in docs:
            uni.update(d)
            pairs.update(zip(d, d[1:]))
        left = Counter(w for _, w in pairs)
        right = Counter(p for p, _ in pairs)
        rows = [Row(text=" ".join(d)) for d in docs]
        out = {r.word: r for r in kneser_ney_stats(
            spark.createDataFrame(rows, "text string"), "text").collect()}
        assert set(out) == set(uni)
        for w in uni:
            assert out[w].c_unigram == uni[w]
            assert out[w].n_left_types == left.get(w, 0)
            assert out[w].n_right_types == right.get(w, 0)

    run()


def test_encoding_anomaly_census_counts(spark):
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.text import encoding_anomaly_census

    rows = [
        Row(source="a", text="clean text"),
        Row(source="a", text="bad �� here"),
        Row(source="a", text="ctrl \x07 and nbsp  "),
        Row(source="b", text="zw​sp"),
        Row(source="b", text=None),
        # tab/newline are NOT control anomalies
        Row(source="b", text="ok\tstill\nok"),
    ]
    out = {
        r.source: (
            r.n_docs, r.n_docs_bad, r.repl_chars, r.ctrl_chars,
            r.nbsp_chars, r.zwsp_chars, r.bad_ppm,
        )
        for r in encoding_anomaly_census(
            spark.createDataFrame(rows), "text", "source"
        ).collect()
    }
    assert out["a"] == (3, 2, 2, 1, 1, 0, 666_666)
    assert out["b"] == (3, 1, 0, 0, 0, 1, 333_333)
