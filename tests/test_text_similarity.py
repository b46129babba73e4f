"""Text analysis + similarity search operator tests."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aleph2_contrib_spark.operators import similarity as sim
from aleph2_contrib_spark.operators import text as txt


def test_token_count(spark):
    df = spark.createDataFrame([Row(t="a b  c"), Row(t="  x "), Row(t="")])
    out = [r["n"] for r in df.select(txt.token_count(F.col("t")).alias("n")).collect()]
    assert out == [3, 1, 0]


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([Row(t="hello, world!"), Row(t="a.b")])
    out = [r["n"] for r in df.select(txt.bpe_ish_token_count(F.col("t")).alias("n")).collect()]
    assert out == [4, 3]  # hello , world !  |  a . b


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            Row(t="the cat sat of the mat and it is a hat"),
            Row(t="der hund ist nicht mit der katze und das haus"),
            Row(t="le chat est dans la maison et il est pour les"),
            Row(t="xyzzy qwerty plugh"),
        ]
    )
    out = [r["l"] for r in df.select(txt.lang_id(F.col("t")).alias("l")).collect()]
    assert out == ["en", "de", "fr", "und"]


def test_quality_features(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="the the cat")])
    r = txt.quality_features(df).head()
    assert r["n_tokens"] == 3 and r["n_chars"] == 11
    assert r["distinct_ratio_f6"] == math.floor(2 / 3 * 1e6)
    assert r["stopword_ratio_f6"] == math.floor(2 / 3 * 1e6)


def test_rolling_hash_fingerprints(spark):
    df = spark.createDataFrame([Row(t="one two three four five six seven eight nine ten")])
    fps = df.select(txt.rolling_hash_fingerprints(F.col("t"), window=8).alias("f")).head()["f"]
    assert len(fps) == 3  # 10 tokens, window 8 → 3 shingles


@pytest.fixture(scope="module")
def emb(spark):
    rows = [
        Row(vec_id=1, embedding=[1.0, 0.0, 0.0]),
        Row(vec_id=2, embedding=[0.9, 0.1, 0.0]),
        Row(vec_id=3, embedding=[0.0, 1.0, 0.0]),
        Row(vec_id=4, embedding=[0.0, 0.0, 1.0]),
        Row(vec_id=5, embedding=[-1.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows)


def test_brute_force_topk(spark, emb):
    out = sim.brute_force_topk(emb, [1.0, 0.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in out] == [1, 2, 3]
    assert abs(out[0]["score"] - 1.0) < 1e-12
    expect2 = 0.9 / math.sqrt(0.81 + 0.01)
    assert abs(out[1]["score"] - expect2) < 1e-12


def test_cosine_expression(spark, emb):
    r = emb.filter(F.col("vec_id") == 5).select(
        sim.cosine(F.col("embedding"), F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0))).alias("c")
    ).head()
    assert abs(r["c"] - (-1.0)) < 1e-12


def test_lsh_topk_matches_brute_force_for_close_vectors(spark, emb):
    # query identical to vec 1: bucket contains vec 1 (same signs), result top-1 correct
    out = sim.lsh_topk(emb, [1.0, 0.0, 0.0], k=2, n_planes=4)
    rows = out.collect()
    assert rows[0]["vec_id"] == 1


def test_all_pairs_above(spark, emb):
    pairs = sim.all_pairs_above(emb, threshold=0.95, n_planes=2)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got
    assert all(not ({a, b} == {1, 5}) for a, b in got)


def test_bigram_rarity_scores_gibberish_high(spark):
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.text import bigram_rarity

    common = "the quick brown fox jumps"
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=common) for i in range(5)]
        + [Row(doc_id=99, text="zxqv wplk njud qefa hgyt")]  # gibberish
        + [Row(doc_id=100, text="solo")]  # <2 tokens → dropped
    )
    out = {r.doc_id: r for r in bigram_rarity(docs, "doc_id", "text", rare_threshold=2).collect()}
    assert 100 not in out
    # common doc's bigrams occur 5x > threshold → rarity 0
    assert out[0].n_bigrams == 4 and out[0].n_rare == 0 and out[0].rare_ratio_f6 == 0
    # gibberish bigrams occur once each → all rare
    assert out[99].n_rare == out[99].n_bigrams == 4
    assert out[99].rare_ratio_f6 == 1_000_000


def test_relevance_topk_ranking_properties(spark):
    """BM25-shaped ranking sanity: more query-term hits rank higher, rare
    terms outweigh common ones, longer docs are length-normalized down,
    and the plan compiles to TakeOrderedAndProject over a broadcast."""
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.text import relevance_topk

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="spark spark spark merge filler filler filler filler"),
            Row(doc_id=1, text="spark filler filler filler filler filler filler filler"),
            Row(doc_id=2, text="filler filler filler filler filler filler filler filler"),
            # 3: same tf as 1 but doubled length -> normalized below 1
            Row(doc_id=3, text="spark " + "filler " * 15),
            # 4: rare term; 'rare' appears only here, 'spark' in many docs
            Row(doc_id=4, text="rare filler filler filler filler filler filler filler"),
        ]
    )
    out = relevance_topk(docs, ["spark", "merge", "rare"], k=5)
    rows = out.collect()
    order = [r.doc_id for r in rows]
    scores = {r.doc_id: r.score_f6 for r in rows}
    assert order[0] == 0                       # most hits wins
    assert scores[1] > scores[3]               # length normalization
    assert scores[4] > scores[1]               # rare term idf > common term idf
    assert scores[2] == 0                      # no hits -> zero
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan   # the intended 1-row stats join


def test_label_centroids_exact_fixed_point(spark):
    """Hand-computed centroids; negative components floor correctly; a
    label with one vector returns the vector itself (floored)."""
    rows = [
        Row(label=1, embedding=[1.0, 2.0]),
        Row(label=1, embedding=[2.0, 3.5]),
        Row(label=2, embedding=[-0.5, 0.25]),
    ]
    out = {
        r["label"]: r.asDict()
        for r in sim.label_centroids(
            spark.createDataFrame(rows), "label"
        ).collect()
    }
    # label 1: sums (3e6, 5.5e6) over 2 -> (1.5e6, 2.75e6)
    assert out[1]["n_vectors"] == 2
    assert out[1]["centroid_f6"] == [1500000, 2750000]
    assert out[2]["n_vectors"] == 1
    assert out[2]["centroid_f6"] == [-500000, 250000]
    # plan: the explode is narrow; aggregation is the only exchange chain
    plan = (
        sim.label_centroids(spark.createDataFrame(rows), "label")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


# ------------------------------------------------- inverted postings


def test_inverted_postings_caps_and_dedups(spark):
    """Per-doc repeated terms count once; postings capped at max_postings
    ascending; min_df filters."""
    import aleph2_contrib_spark.operators.text as t

    rows = [Row(doc_id=i, text="alpha alpha beta" if i < 5 else "beta") for i in range(8)]
    out = {
        r.term: r
        for r in t.inverted_postings(
            spark.createDataFrame(rows), "doc_id", "text", min_df=2, max_postings=3
        ).collect()
    }
    assert out["alpha"].doc_freq == 5
    assert out["alpha"].postings_csv == "0,1,2"      # capped at 3
    assert out["beta"].doc_freq == 8
    assert out["beta"].postings_csv == "0,1,2"
    assert set(out) == {"alpha", "beta"}             # min_df drops nothing else here


def test_inverted_postings_single_exchange(spark):
    """Window rank and groupBy share one exchange on term."""
    import aleph2_contrib_spark.operators.text as t

    rows = [Row(doc_id=i, text=f"w{i % 3} common") for i in range(12)]
    plan = (
        t.inverted_postings(spark.createDataFrame(rows), "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") <= 1, plan


# ------------------------------------------------- char pair counts (BPE)


def test_char_pair_counts_hand_case(spark):
    import aleph2_contrib_spark.operators.text as t

    df = spark.createDataFrame([Row(text="aba ab! AB-cd")], "text string")
    # words: aba, ab, ab, cd -> pairs: ab,ba | ab | ab | cd
    out = {r.pair: r.cnt for r in t.char_pair_counts(df, "text", top_n=10).collect()}
    assert out == {"ab": 3, "ba": 1, "cd": 1}


def test_char_pair_counts_deterministic_cut(spark):
    """Ties at the top_n boundary break by pair asc."""
    import aleph2_contrib_spark.operators.text as t

    df = spark.createDataFrame([Row(text="xy za zb zc")], "text string")
    out = [r.pair for r in t.char_pair_counts(df, "text", top_n=2).collect()]
    assert out == ["xy", "za"]


# ------------------------------------------------- hard negative mining


def test_hard_negative_mining_excludes_same_label(spark):
    from aleph2_contrib_spark.operators import similarity as s

    anchors = spark.createDataFrame(
        [Row(vec_id=0, embedding=[1.0, 0.0], label=1)]
    )
    cands = spark.createDataFrame(
        [
            Row(vec_id=10, embedding=[1.0, 0.0], label=1),   # same label: excluded
            Row(vec_id=11, embedding=[0.9, 0.1], label=2),
            Row(vec_id=12, embedding=[0.0, 1.0], label=2),
            Row(vec_id=13, embedding=[0.5, 0.5], label=3),
        ]
    )
    out = s.hard_negative_mining(cands, anchors, k=2).collect()
    assert [r.vec_id for r in out] == [11, 13]
    assert all(r.anchor_id == 0 for r in out)


def test_hard_negative_mining_matches_single_partition(spark):
    """Per-partition local top-k + merge equals the one-partition result."""
    import random

    from aleph2_contrib_spark.operators import similarity as s

    rng = random.Random(7)
    cands = spark.createDataFrame(
        [
            Row(vec_id=i, embedding=[rng.gauss(0, 1) for _ in range(8)], label=i % 3)
            for i in range(60)
        ]
    )
    anchors = spark.createDataFrame(
        [Row(vec_id=100 + j, embedding=[rng.gauss(0, 1) for _ in range(8)], label=j % 3)
         for j in range(4)]
    )
    a = s.hard_negative_mining(cands.repartition(8), anchors, k=5).collect()
    b = s.hard_negative_mining(cands.coalesce(1), anchors, k=5).collect()
    key = lambda r: (r.anchor_id, r.vec_id)
    assert sorted(map(key, a)) == sorted(map(key, b))
    bad = [r for r in a if (r.anchor_id - 100) % 3 == r.vec_id % 3]
    assert not bad  # no same-label pair survives


# ------------------------------------------------- TF-IDF keywords


def test_top_terms_tfidf_hand_case(spark):
    import aleph2_contrib_spark.operators.text as t

    rows = [
        Row(doc_id=1, text="apple apple banana common"),
        Row(doc_id=2, text="banana cherry common"),
        Row(doc_id=3, text="common common cherry"),
    ]
    out = t.top_terms_tfidf(spark.createDataFrame(rows), k=2, min_df=1).collect()
    by = {(r.doc_id, r.rank): r for r in out}
    # doc 1: apple tf=2 df=1 → score 2*3/1=6e6; banana tf=1 df=2 → 1.5e6
    assert by[(1, 1)].term == "apple" and by[(1, 1)].score_f6 == 6_000_000
    assert by[(1, 2)].term == "banana" and by[(1, 2)].score_f6 == 1_500_000
    # doc 3: common tf=2 df=3 → 2e6; cherry tf=1 df=2 → 1.5e6
    assert by[(3, 1)].term == "common" and by[(3, 1)].score_f6 == 2_000_000
    assert by[(3, 2)].term == "cherry"


def test_top_terms_tfidf_min_df_filters(spark):
    import aleph2_contrib_spark.operators.text as t

    rows = [Row(doc_id=1, text="unique shared"), Row(doc_id=2, text="shared")]
    out = t.top_terms_tfidf(spark.createDataFrame(rows), k=5, min_df=2).collect()
    assert {r.term for r in out} == {"shared"}


def test_quality_classifier_hand_properties(spark):
    """Exact-integer scoring: identical texts score identically regardless
    of whitespace/case; feature count = unigrams + bigrams; keep matches
    the threshold; a hand-computed single-token doc matches Python md5."""
    import hashlib

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="Hello  World"),
            Row(doc_id=2, text="hello world"),
            Row(doc_id=3, text="hello"),
        ]
    )
    out = {r.id: r for r in txt.quality_classifier_score(df).collect()}
    # normalization: case + whitespace collapse → same features, same score
    assert out[1].score_fx == out[2].score_fx
    assert out[1].n_features == out[2].n_features == 3  # 2 unigrams + 1 bigram
    assert out[3].n_features == 1
    # hand-compute the single-feature score the way the docstring says
    b = int(hashlib.md5(b"hello").hexdigest()[:8], 16) % 1024
    w = int(hashlib.md5(f"w:{b}".encode()).hexdigest()[:8], 16) % 2001 - 1000
    assert out[3].score_fx == w
    assert out[3].keep == (w >= 0)


def test_quality_classifier_threshold_and_plan(spark):
    """Threshold shifts the keep flag; the plan is a single narrow
    project over the scan — no exchange (shuffle) anywhere."""
    df = spark.createDataFrame([Row(doc_id=1, text="alpha beta gamma")])
    base = txt.quality_classifier_score(df).collect()[0]
    flipped = txt.quality_classifier_score(
        df, threshold_fx=base.score_fx + 1
    ).collect()[0]
    assert base.keep is True or base.keep is False
    assert flipped.keep is False  # threshold just above own score
    plan = txt.quality_classifier_score(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_quality_classifier_partition_invariant(spark):
    """Scores are per-row pure functions — partitioning cannot change them."""
    df = spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha beta w{i} gamma {i%7}") for i in range(50)]
    )
    a = sorted(map(tuple, txt.quality_classifier_score(df).collect()))
    b = sorted(map(tuple, txt.quality_classifier_score(df.repartition(9)).collect()))
    assert a == b and len(a) == 50


def test_ngram_lm_surprisal_hand_case(spark):
    # Corpus: "a b a b" and "a b c". Vocab V = {a,b,c} = 3.
    # Context counts (left word of a bigram): ctx(a)=3, ctx(b)=2.
    # Bigram counts: c(a b)=3, c(b a)=1, c(b c)=1.
    # bits(bg) = bit_length((ctx+V) div (c+1)) - 1:
    #   "a b": (3+3) div (3+1) = 1 -> 0 bits
    #   "b a": (2+3) div (1+1) = 2 -> 1 bit
    #   "b c": (2+3) div (1+1) = 2 -> 1 bit
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a b a b"), Row(doc_id=2, text="a b c")]
    )
    rows = {r["doc_id"]: r for r in txt.ngram_lm_surprisal(df).collect()}
    assert rows[1]["n_bigrams"] == 3  # a b, b a, a b
    assert rows[1]["total_bits"] == 0 + 1 + 0
    assert rows[1]["mean_bits_f6"] == 1000000 // 3
    assert rows[2]["n_bigrams"] == 2  # a b, b c
    assert rows[2]["total_bits"] == 0 + 1
    assert rows[2]["mean_bits_f6"] == 500000


def test_ngram_lm_surprisal_flags_gibberish(spark):
    # Natural-ish prose reusing common transitions scores fewer bits per
    # bigram than one-off token soup (every bigram unseen elsewhere).
    common = [Row(doc_id=i, text="the cat sat on the mat") for i in range(10)]
    rare = [Row(doc_id=99, text="zq xv qp wm kj zz")]
    df = spark.createDataFrame(common + rare)
    rows = {r["doc_id"]: r["mean_bits_f6"] for r in txt.ngram_lm_surprisal(df).collect()}
    assert rows[99] > rows[0]


def test_ngram_lm_surprisal_drops_short_docs(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="solo"), Row(doc_id=2, text="a b")])
    ids = [r["doc_id"] for r in txt.ngram_lm_surprisal(df).collect()]
    assert ids == [2]


def test_ngram_lm_surprisal_partition_invariant(spark):
    rows = [
        Row(doc_id=i, text=" ".join(["tok%d" % ((i * 7 + j) % 13) for j in range(20)]))
        for i in range(40)
    ]
    df1 = spark.createDataFrame(rows).repartition(1)
    df2 = spark.createDataFrame(rows).repartition(16)
    a = sorted(map(tuple, txt.ngram_lm_surprisal(df1).collect()))
    b = sorted(map(tuple, txt.ngram_lm_surprisal(df2).collect()))
    assert a == b


def test_winnowing_shared_run_shares_fingerprint(spark):
    # Winnowing guarantee: any shared token run of length >= window+k-1
    # (= 4+5-1 = 8) yields at least one common fingerprint.
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="x1 x2 x3 " + shared + " y1 y2"),
            Row(doc_id=2, text="z9 " + shared + " w4 w5 w6 w7"),
            Row(doc_id=3, text="completely different words entirely here now"),
        ]
    )
    out = txt.winnowing_fingerprints(df)
    fps = {i: {r["fp"] for r in out.filter(F.col("doc_id") == i).collect()} for i in (1, 2, 3)}
    assert fps[1] & fps[2]
    assert not (fps[1] & fps[3])


def test_winnowing_short_doc_single_shingle(spark):
    # Fewer than k tokens: the whole token run is one shingle -> one fp.
    df = spark.createDataFrame([Row(doc_id=1, text="just three tokens")])
    out = txt.winnowing_fingerprints(df).collect()
    assert len(out) == 1


def test_winnowing_compresses_vs_all_shingles(spark):
    # Selected fingerprints must be a strict subset of all shingle hashes
    # for a long document (density ~ 2/(w+1)).
    text = " ".join("tok%d" % (i % 50) for i in range(400))
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    n_fp = txt.winnowing_fingerprints(df).count()
    n_shingles = 400 - 5 + 1
    assert 0 < n_fp < n_shingles / 2


def test_mmr_topk_diversifies(spark):
    # q = [1, 0]; 1 and 2 are near-duplicates slightly more relevant than
    # the diverse 3 (note q must differ from every candidate: if q == a
    # then rel(x) == sim(x, a) and the second pick degenerates to
    # (2·lam − 1)·rel). Pure top-2 = {1, 2}; MMR at lam=0.5 picks 1 then
    # 3 — 2's redundancy with 1 outweighs its relevance edge.
    emb = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[0.9, 0.3]),
            Row(vec_id=2, embedding=[0.9, 0.305]),
            Row(vec_id=3, embedding=[0.88, -0.3]),
        ]
    )
    brute = [r["vec_id"] for r in sim.brute_force_topk(emb, [1.0, 0.0], k=2).collect()]
    assert brute == [1, 2]
    out = sim.mmr_topk(emb, [1.0, 0.0], k=2, lam=0.5, pool_size=3).collect()
    assert [(r["rank"], r["vec_id"]) for r in out] == [(1, 1), (2, 3)]


def test_mmr_topk_lam_one_is_pure_relevance(spark):
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[1.0, float(i) / 10.0]) for i in range(1, 8)]
    )
    q = [1.0, 0.05]
    brute = [r["vec_id"] for r in sim.brute_force_topk(emb, q, k=4).collect()]
    mmr = [r["vec_id"] for r in sim.mmr_topk(emb, q, k=4, lam=1.0, pool_size=7).collect()]
    assert mmr == brute


def test_mmr_topk_k_exceeding_pool_returns_pool(spark):
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i), 1.0]) for i in range(1, 4)]
    )
    out = sim.mmr_topk(emb, [1.0, 0.0], k=10, pool_size=3).collect()
    assert len(out) == 3
    assert [r["rank"] for r in out] == [1, 2, 3]


def test_mmr_topk_partition_invariant(spark):
    import random as _r

    rng = _r.Random(11)
    rows = [
        Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(8)])
        for i in range(60)
    ]
    q = rows[0]["embedding"]
    a = [tuple(r) for r in sim.mmr_topk(spark.createDataFrame(rows).repartition(1), q, k=5).collect()]
    b = [tuple(r) for r in sim.mmr_topk(spark.createDataFrame(rows).repartition(16), q, k=5).collect()]
    assert a == b


def test_hashed_embedding_dense_unit_norm_and_zero_text(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta gamma alpha"), Row(doc_id=2, text="")]
    )
    rows = {r["doc_id"]: r["embedding"] for r in txt.hashed_embedding(df, dim=16).collect()}
    assert abs(sum(x * x for x in rows[1]) - 1.0) < 1e-12
    assert rows[2] == [0.0] * 16


def test_hashed_embedding_sparse_matches_dense_direction(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a b c a a b")])
    sparse = {
        (r["bucket"]): r["weight"]
        for r in txt.hashed_embedding(df, dim=32, as_rows=True).collect()
    }
    dense = txt.hashed_embedding(df, dim=32).collect()[0]["embedding"]
    norm = sum(w * w for w in sparse.values()) ** 0.5
    for b in range(32):
        assert abs(dense[b] - sparse.get(b, 0) / norm) < 1e-12


def test_hashed_embedding_feeds_ann_pipeline(spark):
    # identical docs → cosine 1 → brute-force top-1 finds the duplicate;
    # the embedding column slots straight into the similarity operators
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=2, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=3, text="completely unrelated sentence about spark plans"),
        ]
    )
    emb = txt.hashed_embedding(df, dim=64).withColumnRenamed("doc_id", "vec_id")
    q = emb.filter(F.col("vec_id") == 1).head()["embedding"]
    top = sim.brute_force_topk(emb, q, k=2).collect()
    assert [r["vec_id"] for r in top] == [1, 2]
    assert abs(top[1]["score"] - 1.0) < 1e-9


def test_hashed_embedding_partition_invariant(spark):
    rows = [Row(doc_id=i, text=" ".join("w%d" % ((i * 3 + j) % 40) for j in range(25))) for i in range(50)]
    a = sorted((r["doc_id"], tuple(r["embedding"])) for r in txt.hashed_embedding(spark.createDataFrame(rows).repartition(1), dim=32).collect())
    b = sorted((r["doc_id"], tuple(r["embedding"])) for r in txt.hashed_embedding(spark.createDataFrame(rows).repartition(16), dim=32).collect())
    assert a == b


def test_collocations_hand_case(spark):
    # "new york" always adjacent; "the cat"/"the dog" dilute "the"'s
    # association. min_count=2 keeps both phrases; lift ranks the
    # exclusive pair first.
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="new york is where the cat and the dog live") for i in range(3)]
    )
    out = txt.collocations(docs, min_count=2, top_k=9).collect()
    by_pair = {(r["w1"], r["w2"]): r["lift_f6"] for r in out}
    # exclusive pair: lift = 3*27/(3*3) = 9 exactly
    assert by_pair[("new", "york")] == 9_000_000
    # "the" is w1 of two pairs (the cat / the dog): lift halves to 4.5
    assert by_pair[("the", "cat")] == 4_500_000
    assert by_pair[("new", "york")] > by_pair[("the", "cat")]
    # ties resolve by (w1, w2) asc: first row is the lexicographically
    # smallest of the max-lift pairs, and the cut is deterministic
    max_lift = max(by_pair.values())
    assert out[0]["lift_f6"] == max_lift
    assert (out[0]["w1"], out[0]["w2"]) == min(
        p for p, l in by_pair.items() if l == max_lift
    )


def test_collocations_min_count_floor(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta"), Row(doc_id=2, text="gamma delta gamma delta")]
    )
    out = txt.collocations(docs, min_count=2, top_k=10).collect()
    assert {(r["w1"], r["w2"]) for r in out} == {("gamma", "delta")}


def test_collocations_deterministic_cut(spark):
    docs1 = spark.createDataFrame(
        [Row(doc_id=i, text="a b c d a b") for i in range(10)]
    ).repartition(1)
    docs2 = spark.createDataFrame(
        [Row(doc_id=i, text="a b c d a b") for i in range(10)]
    ).repartition(8)
    a = [tuple(r) for r in txt.collocations(docs1, min_count=2, top_k=3).collect()]
    b = [tuple(r) for r in txt.collocations(docs2, min_count=2, top_k=3).collect()]
    assert a == b


# -- ngram_overlap_scores (BLEU-n precision / ROUGE-n recall) -------------------


def test_ngram_overlap_hand_worked(spark):
    from aleph2_contrib_spark.operators.text import ngram_overlap_scores

    rows = [
        # cand bigrams: [the cat, cat sat] ; ref bigrams: [the cat, cat sat,
        # sat down] -> clipped = 2, precision 2/2, recall 2/3
        (1, "the cat sat", "the cat sat down"),
        # repetition clipping (the BLEU "the the the" case): cand bigram
        # [the the] x3, ref has 1 -> clipped = 1, precision 1/3
        (2, "the the the the", "the the cat"),
        # no overlap
        (3, "alpha beta", "gamma delta"),
        # too short for bigrams -> 0 grams, NULL precision
        (4, "one", "two words here"),
        (5, None, "two words here"),
    ]
    df = spark.createDataFrame(rows, "id long, cand string, ref string")
    got = {
        r["id"]: r.asDict()
        for r in ngram_overlap_scores(df, "id", "cand", "ref", n=2).collect()
    }
    assert got[1]["clipped_matches"] == 2
    assert got[1]["precision_f6"] == 1_000_000
    assert got[1]["recall_f6"] == 666_666
    assert got[2]["n_cand_grams"] == 3 and got[2]["clipped_matches"] == 1
    assert got[2]["precision_f6"] == 333_333
    assert got[3]["clipped_matches"] == 0 and got[3]["precision_f6"] == 0
    assert got[4]["n_cand_grams"] == 0 and got[4]["precision_f6"] is None
    assert got[4]["recall_f6"] == 0
    assert got[5]["n_cand_grams"] == 0 and got[5]["precision_f6"] is None


def test_ngram_overlap_oracle_matches(spark, tmp_path):
    import random

    import duckdb

    from aleph2_contrib_spark.operators.text import (
        ngram_overlap_scores,
        ngram_overlap_scores_oracle_sql,
    )

    rnd = random.Random(31)
    words = ["the", "cat", "sat", "on", "mat", "a"]
    rows = []
    for i in range(200):
        cand = " ".join(rnd.choice(words) for _ in range(rnd.randint(0, 12)))
        ref = " ".join(rnd.choice(words) for _ in range(rnd.randint(0, 12)))
        rows.append((i, cand, ref))
    df = spark.createDataFrame(rows, "id long, cand string, ref string")
    p = str(tmp_path / "pairs.parquet")
    df.coalesce(1).write.parquet(p)
    for n in (1, 2, 3):
        got = {
            tuple(r)
            for r in ngram_overlap_scores(df, "id", "cand", "ref", n=n).collect()
        }
        want = {
            tuple(r)
            for r in duckdb.sql(
                ngram_overlap_scores_oracle_sql(
                    f"SELECT id, cand, ref FROM '{p}/*.parquet'", "id", n=n
                )
            ).fetchall()
        }
        assert got == want and len(got) == 200, f"n={n}"


# -- script_mix -----------------------------------------------------------------


def test_script_mix_hand_worked_and_oracle(spark, tmp_path):
    import duckdb

    from aleph2_contrib_spark.operators.text import (
        script_mix,
        script_mix_oracle_sql,
    )

    rows = [
        (1, "hello world 123"),
        (2, "привет мир"),                 # pure cyrillic
        (3, "hello мир привет"),           # latin + cyrillic >= 3 chars each
        (4, "你好世界 hello"),               # cjk + latin
        (5, ""),                            # empty: ratios NULL
        (6, "a б 中"),                      # 1 char each: NOT mixed (< min 3)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in script_mix(df, "doc_id", "text").collect()}
    assert got[1]["n_latin"] == 10 and got[1]["n_digit"] == 3
    assert got[1]["is_mixed_script"] is False
    assert got[2]["n_cyrillic"] == 9 and got[2]["n_latin"] == 0
    assert got[3]["is_mixed_script"] is True
    assert got[4]["is_mixed_script"] is True and got[4]["n_cjk"] == 4
    assert got[5]["n_chars"] == 0 and got[5]["latin_ratio_f6"] is None
    assert got[6]["is_mixed_script"] is False
    # differential vs DuckDB on the same rows
    p = str(tmp_path / "sm.parquet")
    df.coalesce(1).write.parquet(p)
    want = {
        tuple(r)
        for r in duckdb.sql(
            script_mix_oracle_sql(
                f"SELECT doc_id, text FROM '{p}/*.parquet'", "doc_id"
            )
        ).fetchall()
    }
    assert {tuple(r) for r in script_mix(df, "doc_id", "text").collect()} == want


# -- vocab_drift_terms ----------------------------------------------------------


def test_vocab_drift_hand_worked(spark):
    from aleph2_contrib_spark.operators.text import vocab_drift_terms

    a = spark.createDataFrame(
        [("new new new shared shared",), ("new shared",)], "text string"
    )
    b = spark.createDataFrame(
        [("old old shared shared",), ("old shared",)], "text string"
    )
    out = vocab_drift_terms(a, b, "text", top_k=2, min_count=1).collect()
    by_dir = {}
    for r in out:
        by_dir.setdefault(r["direction"], []).append(r)
    # 'new' (4 vs 0) tops the a-side; 'old' (0 vs 3) tops the b-side
    assert by_dir["a"][0]["word"] == "new" and by_dir["a"][0]["count_b"] == 0
    assert by_dir["b"][0]["word"] == "old" and by_dir["b"][0]["count_a"] == 0
    # totals: ta=7, tb=6, v=3 -> rr('new') = 5*(6+3)*1e6 // (1*(7+3)) = 4.5e6
    assert by_dir["a"][0]["rr_f6"] == 4_500_000
    # shared appears in both directions' candidate set but not at rank 1
    assert all(len(v) == 2 for v in by_dir.values())


def test_vocab_drift_oracle_matches(spark, tmp_path):
    import random

    import duckdb

    from aleph2_contrib_spark.operators.text import (
        vocab_drift_terms,
        vocab_drift_terms_oracle_sql,
    )

    rnd = random.Random(47)
    words_a = ["alpha", "beta", "gamma", "delta", "shared", "common"]
    words_b = ["omega", "beta", "gamma", "epsilon", "shared", "common"]
    rows_a = [
        (" ".join(rnd.choice(words_a) for _ in range(rnd.randint(1, 20))),)
        for _ in range(80)
    ]
    rows_b = [
        (" ".join(rnd.choice(words_b) for _ in range(rnd.randint(1, 20))),)
        for _ in range(80)
    ]
    da = spark.createDataFrame(rows_a, "text string")
    db = spark.createDataFrame(rows_b, "text string")
    pa, pb = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    da.coalesce(1).write.parquet(pa)
    db.coalesce(1).write.parquet(pb)
    got = {
        tuple(r)
        for r in vocab_drift_terms(da, db, "text", top_k=5, min_count=2).collect()
    }
    want = {
        tuple(r)
        for r in duckdb.sql(
            vocab_drift_terms_oracle_sql(
                f"SELECT text FROM '{pa}/*.parquet'",
                f"SELECT text FROM '{pb}/*.parquet'",
                top_k=5,
                min_count=2,
            )
        ).fetchall()
    }
    assert got == want and len(got) == 10


def test_rouge_l_hand_cases(spark):
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.text import rouge_l_scores

    rows = [
        Row(id=1, cand="the cat sat on the mat", ref="the cat on mat"),
        Row(id=2, cand="a b c", ref="c b a"),     # LCS = 1 (any single)
        Row(id=3, cand="x y z", ref="x y z"),     # exact
        Row(id=4, cand="p q", ref="r s"),         # disjoint
    ]
    out = {r.id: r for r in rouge_l_scores(
        spark.createDataFrame(rows), "id", "cand", "ref").collect()}
    assert out[1].lcs_len == 4  # the cat on mat
    assert out[2].lcs_len == 1
    assert out[3].lcs_len == 3 and out[3].rouge_l_precision_f6 == 1_000_000
    assert out[4].lcs_len == 0 and out[4].rouge_l_recall_f6 == 0
    assert out[1].rouge_l_recall_f6 == 1_000_000  # ref fully covered
    assert out[1].rouge_l_precision_f6 == 4_000_000 // 6


def test_rouge_l_property_vs_dp(spark):
    """Hypothesis: the bit-parallel LCS must equal the O(nm) DP on
    random token streams, including repeats and empties."""
    from hypothesis import given, settings, strategies as st
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.text import rouge_l_scores

    def dp(a, b):
        n, m = len(a), len(b)
        t = [[0] * (m + 1) for _ in range(n + 1)]
        for i in range(n):
            for j in range(m):
                t[i + 1][j + 1] = (
                    t[i][j] + 1 if a[i] == b[j] else max(t[i][j + 1], t[i + 1][j])
                )
        return t[n][m]

    streams = st.lists(
        st.tuples(
            st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), max_size=8),
            st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), max_size=8),
        ),
        min_size=1,
        max_size=6,
    )

    @settings(max_examples=15, deadline=None)
    @given(streams)
    def run(pairs):
        rows = [
            Row(id=i, cand=" ".join(a), ref=" ".join(b))
            for i, (a, b) in enumerate(pairs)
        ]
        out = {r.id: r.lcs_len for r in rouge_l_scores(
            spark.createDataFrame(rows, "id long, cand string, ref string"),
            "id", "cand", "ref").collect()}
        for i, (a, b) in enumerate(pairs):
            # empty lists tokenize to one '' token on both sides; ''
            # matches '' — replicate the tokenizer's view in the reference
            ta = a if a else [""]
            tb = b if b else [""]
            assert out[i] == dp(ta, tb), (a, b)

    run()
