"""Corpus-preparation operator tests: deterministic sampling/mixing,
contamination detection, sequence packing, repetition scoring, PII
redaction (operators/corpus.py)."""

import pytest
from pyspark.sql import Row, functions as F

from aleph2_contrib_spark.operators import corpus as cp


# ---------------------------------------------------------------- sampling


def test_hash_sample_deterministic_and_proportional(spark):
    df = spark.range(0, 10000).withColumnRenamed("id", "doc_id")
    a = cp.hash_sample(df, "doc_id", 0.3, seed="s1")
    b = cp.hash_sample(df, "doc_id", 0.3, seed="s1")
    ids_a = sorted(r.doc_id for r in a.collect())
    ids_b = sorted(r.doc_id for r in b.collect())
    assert ids_a == ids_b, "same seed must reproduce the exact sample"
    assert 0.25 < len(ids_a) / 10000 < 0.35, "rate should be approximately honored"


def test_hash_sample_seed_changes_sample(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id for r in cp.hash_sample(df, "doc_id", 0.5, seed="s1").collect()}
    b = {r.doc_id for r in cp.hash_sample(df, "doc_id", 0.5, seed="s2").collect()}
    assert a != b


def test_hash_sample_rate_monotone(spark):
    """A row kept at rate r is kept at every rate r' > r (nested samples —
    the property that lets pipelines scale a mixture up without churn)."""
    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    small = {r.doc_id for r in cp.hash_sample(df, "doc_id", 0.2, seed="s").collect()}
    big = {r.doc_id for r in cp.hash_sample(df, "doc_id", 0.6, seed="s").collect()}
    assert small <= big


def test_mix_sources_rates_and_default(spark):
    rows = [Row(doc_id=i, source="keep" if i % 2 else "drop") for i in range(2000)]
    df = spark.createDataFrame(rows)
    out = cp.mix_sources(df, "source", {"keep": 1.0, "drop": 0.0}, "doc_id", seed="m")
    got = {r.source for r in out.select("source").distinct().collect()}
    assert got == {"keep"}
    # default_rate keeps unlisted sources at the given rate
    out2 = cp.mix_sources(df, "source", {}, "doc_id", seed="m", default_rate=1.0)
    assert out2.count() == 2000


# ------------------------------------------------------------- contamination


def test_contamination_detects_shared_ngrams(spark):
    corpus = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog today"),
            Row(doc_id=2, text="completely different words appear in this document here"),
        ]
    )
    bench = spark.createDataFrame(
        [Row(text="we ask whether the quick brown fox jumps over fences")]
    )
    out = cp.contamination_check(corpus, bench, n=5)
    rows = {r.doc_id: r for r in out.collect()}
    assert 1 in rows and 2 not in rows
    # "the quick brown fox jumps" and "quick brown fox jumps over" overlap
    assert rows[1].n_hit_grams == 2
    assert rows[1].n_doc_grams == 6


def test_contamination_short_docs_no_grams(spark):
    corpus = spark.createDataFrame([Row(doc_id=1, text="too short")])
    bench = spark.createDataFrame([Row(text="too short")])
    assert cp.contamination_check(corpus, bench, n=5).count() == 0


# ------------------------------------------------------------------ packing


def test_pack_sequences_concat_chop(spark):
    rows = [Row(doc_id=i, tok_len=100) for i in range(10)]
    out = cp.pack_sequences(
        spark.createDataFrame(rows), "doc_id", "tok_len", max_len=256
    ).orderBy("id")
    got = [(r.id, r.cum_before, r.first_pack, r.last_pack, r.pack_offset) for r in out.collect()]
    # doc k starts at 100k; pack = 100k//256; doc 2 spans packs 0->1 (200..299)
    assert got[0] == (0, 0, 0, 0, 0)
    assert got[2] == (2, 200, 0, 1, 200)
    assert got[9] == (9, 900, 3, 3, 132)


def test_pack_sequences_partition_boundary_independent(spark):
    rows = [Row(doc_id=i, tok_len=7 + (i * 13) % 50) for i in range(500)]
    df = spark.createDataFrame(rows)
    one = cp.pack_sequences(df, "doc_id", "tok_len", 512, num_partitions=1).collect()
    many = cp.pack_sequences(df, "doc_id", "tok_len", 512, num_partitions=17).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))


def test_pack_sequences_invariants(spark):
    """Structural invariants on irregular lengths: exclusive cumsum is
    consistent (cum[i+1] = cum[i] + len[i] in id order), offsets stay
    inside the pack, and span boundaries agree with the arithmetic."""
    from pyspark.sql import Row

    rows = [Row(doc_id=i, tok_len=1 + (i * 37) % 97) for i in range(400)]
    L = 128
    out = sorted(
        cp.pack_sequences(spark.createDataFrame(rows), "doc_id", "tok_len", L).collect(),
        key=lambda r: r.id,
    )
    cum = 0
    for r in out:
        assert r.cum_before == cum
        assert 0 <= r.pack_offset < L and r.pack_offset == cum % L
        assert r.first_pack == cum // L
        assert r.last_pack == (cum + r.tok_len - 1) // L
        cum += r.tok_len


def test_pack_sequences_drops_empty(spark):
    rows = [Row(doc_id=1, tok_len=0), Row(doc_id=2, tok_len=5)]
    out = cp.pack_sequences(spark.createDataFrame(rows), "doc_id", "tok_len", 16)
    assert [r.id for r in out.collect()] == [2]


# --------------------------------------------------------------- repetition


def test_repetition_score_bounds(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b a b a b a b"),  # loops: high repetition
            Row(doc_id=2, text="one two three four five six"),  # all distinct
            Row(doc_id=3, text="single"),  # no bigrams at all
        ]
    )
    out = {r.doc_id: r for r in cp.repetition_score(df, n=2).collect()}
    # 7 bigrams, 2 distinct ("a b","b a") -> 5/7 repeated
    assert out[1].n_grams == 7 and out[1].n_distinct == 2
    assert out[1].rep_ratio_f6 == int((5 / 7) * 1e6)
    assert out[2].rep_ratio_f6 == 0
    assert out[3].n_grams == 0 and out[3].rep_ratio_f6 == 0


# ---------------------------------------------------------------------- PII


def test_pii_redact_patterns(spark):
    df = spark.createDataFrame(
        [
            Row(
                doc_id=1,
                text="mail a@b.com and c.d+x@e.org, ssn 123-45-6789, "
                "call 555-123-4567, host 192.168.0.1 done",
            )
        ]
    )
    r = cp.pii_redact(df, "text").collect()[0]
    assert r.n_email == 2 and r.n_ssn == 1 and r.n_phone == 1 and r.n_ipv4 == 1
    assert "<EMAIL>" in r.redacted and "<SSN>" in r.redacted
    assert "<PHONE>" in r.redacted and "<IPV4>" in r.redacted
    assert "a@b.com" not in r.redacted and "123-45-6789" not in r.redacted


def test_pii_redact_clean_text_untouched(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="nothing sensitive here")])
    r = cp.pii_redact(df, "text").collect()[0]
    assert r.redacted == "nothing sensitive here"
    assert r.n_email == r.n_ssn == r.n_phone == r.n_ipv4 == 0


# ------------------------------------------- shuffle / stratified sampling


def test_deterministic_shuffle_is_permutation(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    out = cp.deterministic_shuffle(df, "doc_id", seed="e1", num_shards=4)
    rows = out.collect()
    assert sorted(r.idx for r in rows) == list(range(1000))
    assert {r.shard for r in rows} == {0, 1, 2, 3}
    # reproducible; different seed -> different permutation
    again = {r.doc_id: r.idx for r in cp.deterministic_shuffle(df, "doc_id", seed="e1").collect()}
    other = {r.doc_id: r.idx for r in cp.deterministic_shuffle(df, "doc_id", seed="e2").collect()}
    assert {r.doc_id: r.idx for r in rows} == again
    assert again != other


def test_global_order_index_partition_independent(spark):
    df = spark.range(0, 777).withColumnRenamed("id", "k")
    one = {r.k: r.idx for r in cp.global_order_index(df, "k", num_partitions=1).collect()}
    many = {r.k: r.idx for r in cp.global_order_index(df, "k", num_partitions=13).collect()}
    assert one == many == {i: i for i in range(777)}


def test_stratified_sample_exact_per_stratum(spark):
    from pyspark.sql import Row
    rows = [Row(doc_id=i, lang="en" if i % 3 else "de") for i in range(300)]
    out = cp.stratified_sample(spark.createDataFrame(rows), "lang", "doc_id", 25, seed="s")
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"en": 25, "de": 25}
    # small stratum: returns the whole stratum
    tiny = [Row(doc_id=i, lang="zh") for i in range(5)]
    out2 = cp.stratified_sample(spark.createDataFrame(tiny), "lang", "doc_id", 25)
    assert out2.count() == 5


# ------------------------------------------------------------- plan quality


def test_narrow_ops_have_no_shuffle(spark):
    """Sampling, repetition, and redaction must stay narrow (no Exchange):
    they run as pure filter/project passes over the scan."""
    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"), F.lit("some text here").alias("text")
    )
    for op in (
        cp.hash_sample(df, "doc_id", 0.5),
        cp.repetition_score(df),
        cp.pii_redact(df, "text"),
    ):
        plan = op._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


def test_contamination_broadcasts_benchmark(spark, sf_dir):
    from aleph2_contrib_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = cp.contamination_check(
        docs.filter(F.col("doc_id") % 97 != 0),
        docs.filter(F.col("doc_id") % 97 == 0),
        n=5,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_word_ngrams_property_vs_reference(spark):
    """Property check: the Catalyst word_ngrams expression matches a plain
    Python reference implementation on assorted edge-case strings."""
    from pyspark.sql import Row
    import re as _re

    cases = [
        "", " ", "one", "one two", "one two three", "a  b   c", "  lead trail  ",
        "UPPER lower MiXeD", "a b a b a", "x " * 50, "tab\tsep words here",
        "word", "1 2 3 4 5 6 7", "self self self self",
    ]

    def ref_ngrams(s, n):
        toks = _re.split(r"\s+", s.strip().lower()) if s.strip() else []
        return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)] if len(toks) >= n else []

    df = spark.createDataFrame([Row(i=i, text=s) for i, s in enumerate(cases)])
    for n in (1, 2, 3, 5):
        got = {r.i: list(r.g) for r in df.select("i", cp.word_ngrams(F.col("text"), n).alias("g")).collect()}
        want = {i: ref_ngrams(s, n) for i, s in enumerate(cases)}
        assert got == want, (n, {k: (got[k], want[k]) for k in got if got[k] != want[k]})


def test_gopher_quality_rules(spark):
    """Rule battery on constructed edge cases: a good doc, an empty doc,
    a bullet-list doc, an ellipsis-heavy doc, a symbol-heavy doc, and a
    no-alpha doc each trip exactly the expected flags."""
    from pyspark.sql import Row

    good = ("the quick brown fox jumps over a lazy dog and then runs off "
            "to the hills with great speed that nobody can match ") * 3
    docs = [
        Row(doc_id=0, text=good),                                  # passes all
        Row(doc_id=1, text=""),                                    # empty: all dependent rules fail
        Row(doc_id=2, text="\n".join(["- item " + good] * 10)),    # 100% bullet lines
        Row(doc_id=3, text="\n".join([good + "..."] * 10)),        # 100% ellipsis lines
        Row(doc_id=4, text=("# " * 60) + good),                    # symbol ratio high
        Row(doc_id=5, text="1 2 3 4 5 " * 12),                     # no alpha words
    ]
    out = {
        r.doc_id: r.asDict()
        for r in cp.gopher_quality(
            spark.createDataFrame(docs), min_words=20
        ).collect()
    }
    assert out[0]["pass_gopher"] is True
    assert out[1]["n_words"] == 0 and out[1]["pass_gopher"] is False
    assert out[1]["mean_word_len_f6"] is None  # NULL features, False flags
    assert out[2]["r_bullet_lines"] is False and out[2]["r_word_count"] is True
    assert out[3]["r_ellipsis_lines"] is False
    assert out[4]["r_symbol_ratio"] is False
    assert out[5]["r_alpha_words"] is False and out[5]["r_stopwords"] is False
    # single narrow projection: no shuffle in the plan
    plan = (
        cp.gopher_quality(spark.createDataFrame(docs))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_c4_line_filter(spark):
    """Line rules: terminal punctuation, min words, javascript; doc rules:
    lorem ipsum, curly brace, min surviving lines."""
    from pyspark.sql import Row

    docs = [
        Row(doc_id=0, text='Good sentence stays here.\nbad\nAnother keeper, truly!'),
        Row(doc_id=1, text='This mentions javascript sadly.\nOnly line.'),
        Row(doc_id=2, text='lorem ipsum dolor sit amet.\nFine sentence otherwise here.'),
        Row(doc_id=3, text='Template {placeholder} text here.\nGood line nonetheless.'),
        Row(doc_id=4, text='no punctuation on this line\nnor on this one'),
        Row(doc_id=5, text='Ends with quote he said."'),
    ]
    out = {r.doc_id: r.asDict() for r in cp.c4_line_filter(spark.createDataFrame(docs)).collect()}
    assert out[0]["n_lines_kept"] == 2 and out[0]["n_lines_dropped"] == 1
    assert out[0]["keep_doc"] is True
    assert out[0]["cleaned"] == "Good sentence stays here.\nAnother keeper, truly!"
    # the js line is dropped; 'Only line.' has 2 words -> dropped; nothing survives
    assert out[1]["n_lines_kept"] == 0 and out[1]["keep_doc"] is False
    assert out[2]["keep_doc"] is False  # lorem ipsum kills the doc
    assert out[3]["keep_doc"] is False  # curly brace kills the doc
    assert out[4]["n_lines_kept"] == 0 and out[4]["keep_doc"] is False
    assert out[5]["n_lines_kept"] == 1 and out[5]["keep_doc"] is True
    plan = (
        cp.c4_line_filter(spark.createDataFrame(docs))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_chunk_tokens_tiling_and_overlap(spark):
    from pyspark.sql import Row

    toks = [f"w{i}" for i in range(10)]
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=" ".join(toks)),          # 10 tokens
            Row(doc_id=2, text="a b c"),                 # shorter than chunk
            Row(doc_id=3, text="  x   Y  "),             # messy whitespace
        ]
    )
    out = {
        (r["doc_id"], r["chunk_idx"]): (r["n_chunk_tokens"], r["chunk_text"])
        for r in cp.chunk_tokens(df, "doc_id", "text", chunk_size=4, stride=2).collect()
    }
    # doc 1: ceil((10-4)/2)+1 = 4 chunks, 50% overlap, last is full
    assert out[(1, 0)] == (4, "w0 w1 w2 w3")
    assert out[(1, 1)] == (4, "w2 w3 w4 w5")
    assert out[(1, 2)] == (4, "w4 w5 w6 w7")
    assert out[(1, 3)] == (4, "w6 w7 w8 w9")
    assert (1, 4) not in out
    # doc 2: one short chunk
    assert out[(2, 0)] == (3, "a b c")
    # doc 3: normalization collapses whitespace and lowercases
    assert out[(3, 0)] == (2, "x y")
    # exact tiling when stride == chunk_size
    tiled = cp.chunk_tokens(df, "doc_id", "text", chunk_size=5, stride=5)
    d1 = sorted(
        (r["chunk_idx"], r["chunk_text"])
        for r in tiled.filter(F.col("doc_id") == 1).collect()
    )
    assert d1 == [(0, "w0 w1 w2 w3 w4"), (1, "w5 w6 w7 w8 w9")]
    plan = (
        cp.chunk_tokens(df, "doc_id", "text", 4, 2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_chunk_tokens_validates_params(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(doc_id=1, text="a b")])
    import pytest as _pt

    with _pt.raises(ValueError):
        cp.chunk_tokens(df, "doc_id", "text", chunk_size=0, stride=1)
    with _pt.raises(ValueError):
        cp.chunk_tokens(df, "doc_id", "text", chunk_size=4, stride=0)


def test_domain_rollup_decisions(spark):
    from pyspark.sql import Row

    rows = (
        [Row(source="spam.example", n_chars=1000)] * 2
        + [Row(source="tiny.example", n_chars=10)] * 4
        + [Row(source="good.example", n_chars=500)] * 4
    )
    out = {
        r["source"]: r.asDict()
        for r in cp.domain_rollup(
            spark.createDataFrame(rows), "source", "n_chars",
            blocklist=["spam.example"], min_mean_chars=100,
        ).collect()
    }
    assert out["spam.example"]["decision"] == "drop_blocklist"  # beats quality
    assert out["tiny.example"]["decision"] == "drop_low_quality"
    assert out["good.example"]["decision"] == "keep"
    assert out["good.example"]["n_docs"] == 4
    assert out["good.example"]["share_ppm"] == 400000
    assert out["good.example"]["mean_chars_f2"] == 50000
    assert sum(v["n_docs"] for v in out.values()) == 10


from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab cX\t", min_size=0, max_size=60), min_size=1, max_size=6
    ),
    chunk=st.integers(min_value=1, max_value=8),
    stride=st.integers(min_value=1, max_value=8),
)
def test_chunk_tokens_fuzz_matches_reference(spark, texts, chunk, stride):
    """Property fuzz: the Spark chunker equals a direct Python reference
    (same normalization, coverage, overlap) for arbitrary text/params."""
    import math
    import re

    from pyspark.sql import Row

    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["n_chunk_tokens"], r["chunk_text"])
        for r in cp.chunk_tokens(df, "doc_id", "text", chunk, stride).collect()
    }
    expect = {}
    for i, t in enumerate(texts):
        toks = re.sub(r"\s+", " ", t.lower()).strip().split(" ")
        n = len(toks)
        n_chunks = max(1, math.ceil((n - chunk) / stride) + 1)
        for c in range(n_chunks):
            piece = toks[c * stride : c * stride + chunk]
            expect[(i, c)] = (len(piece), " ".join(piece))
    assert got == expect


def test_temperature_mix_flattens_distribution(spark):
    """T=2: kept counts ∝ sqrt(n_s) — the big source is downsampled, the
    biggest keeps everything (cap_rate=1), determinism across reruns."""
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.corpus import temperature_mix

    rows = [Row(doc_id=i, source="big" if i < 3600 else "small") for i in range(4000)]
    df = spark.createDataFrame(rows)
    kept = temperature_mix(df, "source", "doc_id", temperature=2.0)
    by = {r.source: r.n for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by["big"] == 3600                      # largest source: rate 1.0
    # small: rate = sqrt(400)/sqrt(3600) = 1/3 → ~133 of 400 kept
    assert 90 <= by["small"] <= 180
    again = temperature_mix(df.repartition(9), "source", "doc_id", temperature=2.0)
    assert sorted(r.doc_id for r in kept.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_leakage_safe_split_never_splits_duplicates(spark):
    from aleph2_contrib_spark.operators.corpus import leakage_safe_split

    rows = [Row(doc_id=i, text="unique text %d" % i) for i in range(40)]
    # duplicate family: same normalized text under ids 100-104 (case and
    # whitespace noise must not separate them)
    dups = [
        Row(doc_id=100, text="The  Shared   Document"),
        Row(doc_id=101, text="the shared document"),
        Row(doc_id=102, text="THE SHARED DOCUMENT"),
        Row(doc_id=103, text=" the shared  document "),
        Row(doc_id=104, text="the shared document"),
    ]
    df = spark.createDataFrame(rows + dups)
    out = leakage_safe_split(df, eval_permille=300).collect()
    by_id = {r["doc_id"]: r for r in out}
    fam = [by_id[i] for i in range(100, 105)]
    assert len({r["split"] for r in fam}) == 1
    assert {r["group_rep"] for r in fam} == {100}
    # both sides populated at this rate on 41 groups
    assert {r["split"] for r in out} == {"train", "eval"}


def test_leakage_safe_split_stable_under_corpus_growth(spark):
    from aleph2_contrib_spark.operators.corpus import leakage_safe_split

    old = spark.createDataFrame([Row(doc_id=i, text="doc %d" % i) for i in range(30)])
    grown = spark.createDataFrame(
        [Row(doc_id=i, text="doc %d" % i) for i in range(60)]
    )
    a = {r["doc_id"]: r["split"] for r in leakage_safe_split(old).collect()}
    b = {r["doc_id"]: r["split"] for r in leakage_safe_split(grown).collect()}
    assert all(b[i] == a[i] for i in a)


def test_quality_budget_filter_exact_cut_and_ties(spark):
    from aleph2_contrib_spark.operators.corpus import quality_budget_filter

    # 10 rows, keep 300 permille -> exactly 3; scores tie so the id
    # tiebreak decides the boundary deterministically
    rows = [Row(id=i, s=100 if i < 5 else 50) for i in range(10)]
    out = quality_budget_filter(spark.createDataFrame(rows), "s", "id", 300).collect()
    got = sorted((r["id"], r["rank"]) for r in out)
    assert got == [(0, 1), (1, 2), (2, 3)]


def test_quality_budget_filter_partition_invariant(spark):
    from aleph2_contrib_spark.operators.corpus import quality_budget_filter

    rows = [Row(id=i, s=(i * 37) % 101) for i in range(200)]
    a = sorted(map(tuple, quality_budget_filter(spark.createDataFrame(rows).repartition(1), "s", "id", 250).collect()))
    b = sorted(map(tuple, quality_budget_filter(spark.createDataFrame(rows).repartition(16), "s", "id", 250, num_partitions=7).collect()))
    assert a == b and len(a) == 50


def test_quality_budget_filter_zero_keep(spark):
    from aleph2_contrib_spark.operators.corpus import quality_budget_filter

    rows = [Row(id=i, s=i) for i in range(3)]
    assert quality_budget_filter(spark.createDataFrame(rows), "s", "id", 1).count() == 0


# ------------------------------------------------------------ weighted_sample


def test_weighted_sample_deterministic_and_weighted(spark):
    import hashlib

    from aleph2_contrib_spark.operators.corpus import weighted_sample

    rows = [(i, 1 if i < 80 else 50) for i in range(100)]
    df = spark.createDataFrame(rows, "id int, w int")

    def brute(k, seed="0"):
        def pri(i, w):
            u = int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16) / 2**32
            return (u / w, i)

        return {i for i, _ in sorted(rows, key=lambda r: pri(*r))[:k]}

    got = {r["id"] for r in weighted_sample(df, "id", "w", k=10).collect()}
    assert got == brute(10)
    # stable across partitionings
    got2 = {
        r["id"]
        for r in weighted_sample(df.repartition(17), "id", "w", k=10).collect()
    }
    assert got2 == got
    # the 20 heavy rows (w=50) should dominate a small sample of 100 rows
    heavy = sum(1 for i in got if i >= 80)
    assert heavy >= 7


def test_weighted_sample_drops_nonpositive_and_validates(spark):
    import pytest as _pytest

    from aleph2_contrib_spark.operators.corpus import weighted_sample

    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -4), (4, None)], "id int, w int"
    )
    got = [r["id"] for r in weighted_sample(df, "id", "w", k=10).collect()]
    assert got == [1]
    with _pytest.raises(ValueError, match="k must be"):
        weighted_sample(df, "id", "w", k=0)


def test_weighted_sample_plan_is_take_ordered(spark):
    from aleph2_contrib_spark.operators.corpus import weighted_sample

    df = spark.range(1000).withColumn("w", (F.col("id") % 7) + 1)
    plan = weighted_sample(df, "id", "w", k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# -- canonicalize_url / url_dedup ---------------------------------------------


def test_canonicalize_url_rules(spark):
    from pyspark.sql import functions as F

    from aleph2_contrib_spark.operators.corpus import canonicalize_url

    cases = {
        "HTTP://WWW.Ex.COM:80/a//b/?utm_source=x&b=2&a=1#f": "http://ex.com/a/b?a=1&b=2",
        "https://Host.org:443/": "https://host.org/",
        "https://host.org": "https://host.org/",
        "http://h/p?gclid=1&fbclid=2&ref=abc": "http://h/p",
        "http://h:8080/p": "http://h:8080/p",   # non-default port kept
        "https://h:80/p": "https://h:80/p",     # :80 is only default for http
        "notaurl": None,
        "": None,
    }
    df = spark.createDataFrame([(u,) for u in cases], "u string")
    got = {
        r["u"]: r["c"]
        for r in df.select("u", canonicalize_url(F.col("u")).alias("c")).collect()
    }
    assert got == cases


def test_url_dedup_groups_and_oracle(spark, tmp_path):
    import duckdb

    from aleph2_contrib_spark.operators.corpus import (
        canonicalize_url_oracle_expr,
        url_dedup,
    )

    rows = [
        (1, "http://A.com/x/"),
        (2, "HTTP://a.com/x"),
        (3, "http://a.com//x?utm_source=z"),
        (4, "http://b.com/y?b=1&a=2"),
        (5, "http://b.com/y?a=2&b=1"),
        (6, "garbage"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r["canon_url"]: (r["n_docs"], r["keep_id"])
        for r in url_dedup(df, "url", "doc_id").collect()
    }
    assert got == {
        "http://a.com/x": (3, 1),
        "http://b.com/y?a=2&b=1": (2, 4),
    }
    # SQL twin agrees on the same rows
    p = str(tmp_path / "u.parquet")
    df.coalesce(1).write.parquet(p)
    expr = canonicalize_url_oracle_expr("url")
    want = {
        r[0]: (r[1], r[2])
        for r in duckdb.sql(
            f"SELECT {expr} AS c, count(*), min(doc_id) FROM '{p}/*.parquet' "
            f"WHERE {expr} IS NOT NULL GROUP BY 1"
        ).fetchall()
    }
    assert got == want


# -- score_rank_normalize -----------------------------------------------------


def test_score_rank_normalize_hand_worked(spark):
    from aleph2_contrib_spark.operators.corpus import score_rank_normalize

    rows = [
        (1, "a", 10.0), (2, "a", 30.0), (3, "a", 20.0),   # ranks 1,3,2 of 3
        (4, "b", 99.0),                                    # singleton -> 1e6
        (5, "a", None),                                    # dropped
        (6, "c", 5.0), (7, "c", 5.0),                      # tie -> id order
    ]
    df = spark.createDataFrame(rows, "id long, g string, s double")
    got = {
        r["id"]: r["rank_ppm"]
        for r in score_rank_normalize(df, "g", "s", "id").collect()
    }
    assert got == {1: 0, 3: 500000, 2: 1000000, 4: 1000000, 6: 0, 7: 1000000}


def test_score_rank_normalize_oracle_matches(spark, tmp_path):
    import random

    import duckdb

    from aleph2_contrib_spark.operators.corpus import (
        score_rank_normalize,
        score_rank_normalize_oracle_sql,
    )

    rnd = random.Random(43)
    rows = [(i, rnd.choice(["x", "y"]), rnd.randint(0, 20)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, g string, s long")
    p = str(tmp_path / "t.parquet")
    df.coalesce(1).write.parquet(p)
    got = {tuple(x) for x in score_rank_normalize(df, "g", "s", "id").collect()}
    want = {
        tuple(x)
        for x in duckdb.sql(
            score_rank_normalize_oracle_sql(
                f"SELECT id, g, s FROM '{p}/*.parquet'", "g", "s", "id"
            )
        ).fetchall()
    }
    assert got == want and len(got) == 200


# -- vocab_coverage -----------------------------------------------------------


def test_vocab_coverage_hand_worked(spark):
    from aleph2_contrib_spark.operators.corpus import vocab_coverage

    df = spark.createDataFrame(
        [("b b b a a c",), ("a b, d!",)], "text string"
    )
    # counts: b=4, a=3, c=1, d=1 (total 9); rank ties by token asc
    got = {r["token"]: (r["rank"], r["cnt"], r["cum_cnt"], r["cum_ppm"])
           for r in vocab_coverage(df, "text").collect()}
    assert got == {
        "b": (1, 4, 4, 4 * 1000000 // 9),
        "a": (2, 3, 7, 7 * 1000000 // 9),
        "c": (3, 1, 8, 8 * 1000000 // 9),
        "d": (4, 1, 9, 1000000),
    }


def test_vocab_coverage_oracle_matches(spark, tmp_path):
    import random

    import duckdb

    from aleph2_contrib_spark.operators.corpus import (
        vocab_coverage,
        vocab_coverage_oracle_sql,
    )

    rnd = random.Random(5)
    vocab = [f"w{j}" for j in range(40)]
    rows = [(" ".join(rnd.choice(vocab) for _ in range(25)),) for _ in range(200)]
    df = spark.createDataFrame(rows, "text string")
    p = str(tmp_path / "d.parquet")
    df.coalesce(1).write.parquet(p)
    got = {tuple(x) for x in vocab_coverage(df, "text").collect()}
    want = {
        tuple(x)
        for x in duckdb.sql(
            vocab_coverage_oracle_sql(f"SELECT text FROM '{p}/*.parquet'")
        ).fetchall()
    }
    assert got == want and len(got) == 40


# -- chat_turn_stats ----------------------------------------------------------


def test_chat_turn_stats_hand_worked(spark):
    import json

    from aleph2_contrib_spark.operators.corpus import chat_turn_stats

    def conv(*roles):
        return json.dumps(
            [{"role": r, "content": f"m{i}"} for i, r in enumerate(roles)]
        )

    rows = [
        (1, conv("user", "assistant", "user", "assistant")),  # valid
        (2, conv("user", "user")),                            # doubled user
        (3, conv("assistant", "user")),                       # wrong start
        (4, conv("user",)),                                   # too short
        (5, '[{"role":"user","content":null}]'),              # NULL content
        (6, "not json at all"),                               # dropped
        # valid JSON but a lone OBJECT, not an array: dropped on both
        # engines (from_json would wrap it as [obj]; json_array_length
        # sees a non-array — the explicit '['-prefix contract wins)
        (7, '{"role":"user","content":"hi"}'),
        (8, '  [{"role":"user","content":"a"},'
            '{"role":"assistant","content":"b"}]'),           # leading ws ok
    ]
    df = spark.createDataFrame(rows, "id long, conv string")
    got = {r["id"]: r.asDict() for r in chat_turn_stats(df, "id", "conv").collect()}
    assert set(got) == {1, 2, 3, 4, 5, 8}
    assert got[8]["is_valid"] is True
    assert got[1]["is_valid"] is True and got[1]["n_user"] == 2
    assert got[2]["alternates_ok"] is False
    assert got[3]["alternates_ok"] is False
    assert got[4]["alternates_ok"] is True and got[4]["is_valid"] is False
    assert got[5]["total_chars"] == 0


def test_chat_turn_stats_oracle_matches(spark, tmp_path):
    import json
    import random

    import duckdb

    from aleph2_contrib_spark.operators.corpus import (
        chat_turn_stats,
        chat_turn_stats_oracle_sql,
    )

    rnd = random.Random(61)
    rows = []
    for i in range(120):
        n = rnd.randint(1, 6)
        roles = [
            rnd.choice(["user", "assistant", "system"]) for _ in range(n)
        ]
        rows.append(
            (i, json.dumps([{"role": r, "content": "x" * rnd.randint(0, 5)} for r in roles]))
        )
    # parity on the reject stream too: lone object and malformed JSON
    # must be dropped by BOTH engines
    rows.append((200, '{"role":"user","content":"solo"}'))
    rows.append((201, "{not json"))
    df = spark.createDataFrame(rows, "id long, conv string")
    p = str(tmp_path / "c.parquet")
    df.coalesce(1).write.parquet(p)
    got = {tuple(x) for x in chat_turn_stats(df, "id", "conv").collect()}
    want = {
        tuple(x)
        for x in duckdb.sql(
            chat_turn_stats_oracle_sql(f"SELECT id, conv FROM '{p}/*.parquet'", "id")
        ).fetchall()
    }
    assert got == want and len(got) == 120


# -- preference_pairs ---------------------------------------------------------


def test_preference_pairs_hand_worked(spark):
    from aleph2_contrib_spark.operators.corpus import preference_pairs

    rows = [
        (1, "a", 10, 100), (1, "b", 30, 101), (1, "c", 20, 102),
        (2, "x", 5, 200),                         # single candidate: dropped
        (3, "p", 7, 300), (3, "q", 7, 301),        # all tied: id breaks, margin 0
        (4, "m", None, 400), (4, "n", 3, 401),     # NULL score dropped -> single
    ]
    df = spark.createDataFrame(rows, "p long, c string, s long, i long")
    got = {r["p"]: r.asDict() for r in preference_pairs(df, "p", "c", "s", "i").collect()}
    assert set(got) == {1, 3}
    assert (got[1]["chosen"], got[1]["rejected"], got[1]["margin"]) == ("b", "a", 20)
    assert (got[3]["chosen_id"], got[3]["rejected_id"], got[3]["margin"]) == (301, 300, 0)


def test_preference_pairs_oracle_matches(spark, tmp_path):
    import random

    import duckdb

    from aleph2_contrib_spark.operators.corpus import (
        preference_pairs,
        preference_pairs_oracle_sql,
    )

    rnd = random.Random(71)
    rows = [
        (rnd.randint(1, 15), rnd.choice("abcde"), rnd.randint(0, 9), i)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "p long, c string, s long, i long")
    pq = str(tmp_path / "t.parquet")
    df.coalesce(1).write.parquet(pq)
    got = {tuple(x) for x in preference_pairs(df, "p", "c", "s", "i").collect()}
    want = {
        tuple(x)
        for x in duckdb.sql(
            preference_pairs_oracle_sql(f"SELECT p, c, s, i FROM '{pq}/*.parquet'", "p")
        ).fetchall()
    }
    assert got == want and len(got) > 0


# -- fim_transform -------------------------------------------------------------


def test_fim_transform_hand_worked(spark):
    from aleph2_contrib_spark.operators.corpus import (
        FIM_MIDDLE_TOK,
        FIM_PREFIX_TOK,
        FIM_SUFFIX_TOK,
        fim_transform,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog repeatedly"),
        (2, "short"),   # below min_len: passthrough
        (3, ""),        # empty: passthrough
        (4, None),      # NULL: passthrough
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r for r in fim_transform(df, "id", "text").collect()}
    r = out[1]
    assert r["fim_applied"] is True
    # pieces reassemble to the original text at the emitted geometry
    txt = rows[0][1]
    s, m = r["split_start"], r["middle_len"]
    pre, mid, suf = txt[: s - 1], txt[s - 1 : s - 1 + m], txt[s - 1 + m :]
    assert r["fim_text"] == (
        FIM_PREFIX_TOK + pre + FIM_SUFFIX_TOK + suf + FIM_MIDDLE_TOK + mid
    )
    # middle spans ~30% (default ppm) of the doc
    assert m == len(txt) * 300_000 // 1_000_000
    assert out[2]["fim_text"] == "short" and out[2]["fim_applied"] is False
    assert out[2]["split_start"] is None
    assert out[3]["fim_text"] == "" and out[4]["fim_text"] is None

    import pytest as _pytest

    with _pytest.raises(ValueError, match="middle_frac_ppm"):
        fim_transform(df, "id", "text", middle_frac_ppm=0)
    with _pytest.raises(ValueError, match="min_len"):
        fim_transform(df, "id", "text", min_len=1)


def test_fim_transform_long_document_no_int32_overflow(spark):
    # regression: len(text) * 300000 in IntegerType overflows int32 for any
    # text of 7160+ chars (ANSI throws; non-ANSI silently wraps, collapsing
    # mlen to 1). The multiply must widen to long FIRST.
    import duckdb

    from aleph2_contrib_spark.operators.corpus import (
        fim_transform,
        fim_transform_oracle_sql,
    )

    long_txt = ("lorem ipsum dolor sit amet " * 400)[:10_000]  # 10k chars
    huge_txt = "x" * 50_000
    df = spark.createDataFrame(
        [(1, long_txt), (2, huge_txt)], "id long, text string"
    )
    out = {r["id"]: r for r in fim_transform(df, "id", "text").collect()}
    assert out[1]["middle_len"] == len(long_txt) * 300_000 // 1_000_000 == 3_000
    assert out[2]["middle_len"] == 15_000
    # pieces reassemble at the emitted geometry
    s, m = out[1]["split_start"], out[1]["middle_len"]
    assert long_txt[s - 1 : s - 1 + m] in out[1]["fim_text"]
    # engine/oracle parity on the long documents
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES (1, ?), (2, ?)) v(id, text)",
        [long_txt, huge_txt],
    )
    want = {
        tuple(r)
        for r in con.sql(
            fim_transform_oracle_sql("SELECT id, text FROM t", "id")
        ).fetchall()
    }
    assert {tuple(r) for r in out.values()} == want


def test_fim_transform_deterministic_and_oracle(spark, tmp_path):
    import random

    import duckdb

    from aleph2_contrib_spark.operators.corpus import (
        fim_transform,
        fim_transform_oracle_sql,
    )

    rnd = random.Random(23)
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    rows = [
        (i, " ".join(rnd.choice(words) for _ in range(rnd.randint(1, 40))))
        for i in range(150)
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    p = str(tmp_path / "t.parquet")
    df.coalesce(1).write.parquet(p)
    got = {tuple(r) for r in fim_transform(df, "id", "text").collect()}
    # identical across repeated runs (seeded, partition-independent)
    again = {tuple(r) for r in fim_transform(df.repartition(7), "id", "text").collect()}
    assert got == again
    want = {
        tuple(r)
        for r in duckdb.sql(
            fim_transform_oracle_sql(f"SELECT id, text FROM '{p}/*.parquet'", "id")
        ).fetchall()
    }
    assert got == want and len(got) == 150


# -- distribution_match_sample --------------------------------------------------


def test_distribution_match_proportions_and_max_kept(spark):
    from aleph2_contrib_spark.operators.corpus import distribution_match_sample

    # buckets 0..6 equal-sized; target only 0/1/2 at 5:3:2
    df = spark.createDataFrame(
        [(i, i % 7) for i in range(7000)], "doc_id long, bucket int"
    )
    kept = distribution_match_sample(
        df, "bucket", "doc_id", {0: 500_000, 1: 300_000, 2: 200_000}, seed="dm"
    )
    counts = {r["bucket"]: r["n"] for r in kept.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {0, 1, 2}  # untargeted buckets dropped
    # the binding bucket (largest target weight) is kept ~whole;
    # others downsample toward the 5:3:2 mix
    assert counts[0] > 900  # 1000 rows, rate 1.0 (minus float-floor slack)
    assert abs(counts[0] / counts[1] - 5 / 3) < 0.25
    assert abs(counts[1] / counts[2] - 3 / 2) < 0.3
    # weight-0 target bucket drops everything; absent buckets don't bind
    none_kept = distribution_match_sample(
        df, "bucket", "doc_id", {0: 0, 99: 1_000_000}, seed="dm"
    )
    assert none_kept.count() == 0

    with pytest.raises(ValueError, match="target_ppm"):
        distribution_match_sample(df, "bucket", "doc_id", {})


def test_distribution_match_oracle_and_partition_independence(spark, tmp_path):
    import duckdb

    from aleph2_contrib_spark.operators.corpus import (
        distribution_match_oracle_sql,
        distribution_match_sample,
    )

    df = spark.createDataFrame(
        [(i, (i * i) % 5) for i in range(3000)], "doc_id long, bucket int"
    )
    target = {0: 400_000, 1: 400_000, 4: 200_000}
    p = str(tmp_path / "t.parquet")
    df.coalesce(1).write.parquet(p)

    def agg(frame):
        return {
            tuple(r)
            for r in frame.groupBy("bucket")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_kept"),
                F.sum("doc_id").cast("long").alias("id_sum"),
            )
            .collect()
        }

    got = agg(distribution_match_sample(df, "bucket", "doc_id", target))
    got_repart = agg(
        distribution_match_sample(df.repartition(11), "bucket", "doc_id", target)
    )
    assert got == got_repart
    sql = distribution_match_oracle_sql(
        f"SELECT doc_id, bucket FROM '{p}/*.parquet'", "bucket", "doc_id", target
    )
    want = {tuple(r) for r in duckdb.sql(sql).fetchall()}
    assert got == want and len(got) == 3


def test_boilerplate_affixes_hand(spark):
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.corpus import boilerplate_affixes

    docs = spark.createDataFrame(
        [
            Row(src="a", text="HEADER body one FOOTER"),
            Row(src="a", text="HEADER body two FOOTER"),
            Row(src="a", text="HEADER other text here FOOTER"),
            Row(src="b", text="xyz"),
            Row(src="c", text=None),
            Row(src="c", text="solo doc"),
        ]
    )
    out = {r.src: r for r in boilerplate_affixes(docs, "src", "text").collect()}
    a = out["a"]
    assert a.n_docs == 3
    assert a.prefix == "HEADER "
    assert a.prefix_len == 7
    assert a.suffix_len == len(" FOOTER")
    # single-doc group: whole doc is its own boilerplate (documented)
    assert out["b"].prefix_len == 3 and out["b"].prefix == "xyz"
    # NULL text ignored, group still reported from remaining docs
    assert out["c"].n_docs == 1 and out["c"].prefix == "solo doc"


def test_boilerplate_affixes_edges(spark):
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.corpus import boilerplate_affixes

    docs = spark.createDataFrame(
        [
            Row(src="empty", text=""),
            Row(src="empty", text="nonempty"),
            Row(src="eq", text="same"),
            Row(src="eq", text="same"),
        ]
    )
    out = {r.src: r for r in boilerplate_affixes(docs, "src", "text").collect()}
    assert out["empty"].prefix_len == 0 and out["empty"].suffix_len == 0
    assert out["eq"].prefix_len == 4 and out["eq"].suffix_len == 4


def test_boilerplate_affixes_property_vs_bruteforce(spark):
    """Hypothesis: random string groups — prefix/suffix lengths from the
    min/max order trick must equal brute-force common affixes (this is
    the test that caught reversing the forward extremes instead of
    taking extremes of the reversed strings)."""
    import os

    from hypothesis import given, settings, strategies as st
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.corpus import boilerplate_affixes

    groups = st.lists(
        st.lists(st.text(alphabet="abXY", max_size=6), min_size=1, max_size=5),
        min_size=1,
        max_size=3,
    )

    def brute_lcp(strs):
        p = os.path.commonprefix(strs)
        s = os.path.commonprefix([x[::-1] for x in strs])
        return len(p), len(s)

    @settings(max_examples=15, deadline=None)
    @given(groups)
    def run(gs):
        rows = [
            Row(src=f"g{i}", text=t) for i, g in enumerate(gs) for t in g
        ]
        out = {r.src: r for r in boilerplate_affixes(
            spark.createDataFrame(rows, "src string, text string"),
            "src", "text").collect()}
        for i, g in enumerate(gs):
            pl, sl = brute_lcp(g)
            assert (out[f"g{i}"].prefix_len, out[f"g{i}"].suffix_len) == (pl, sl)

    run()


def test_span_corruption_reconstruction_and_long_doc(spark):
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.corpus import span_corruption

    long_text = "".join(chr(97 + (i % 26)) for i in range(9000))  # int32-overflow guard
    rows = [
        Row(doc_id=1, text="abcdefghijklmnopqrstuvwxyz0123456789"),
        Row(doc_id=2, text="short"),          # < min_len: passthrough
        Row(doc_id=3, text=None),             # NULL: passthrough
        Row(doc_id=4, text=long_text),
    ]
    out = {r.doc_id: r for r in span_corruption(
        spark.createDataFrame(rows), "doc_id", "text").collect()}
    assert out[2].applied is False and out[2].corrupted == "short"
    assert out[3].corrupted is None and out[3].applied is False
    for did in (1, 4):
        r = out[did]
        assert r.applied
        text = rows[did - 1].text
        # reassemble the original from corrupted + targets
        p0, rest = r.corrupted.split("<extra_id_0>")
        p1, p2 = rest.split("<extra_id_1>")
        t = r.targets
        assert t.startswith("<extra_id_0>") and t.endswith("<extra_id_2>")
        mid = t[len("<extra_id_0>"):-len("<extra_id_2>")]
        s0_text, s1_text = mid.split("<extra_id_1>")
        assert p0 + s0_text + p1 + s1_text + p2 == text
        # spans land where the metadata says, with the stated length
        assert s0_text == text[r.s0 - 1 : r.s0 - 1 + r.span_len]
        assert s1_text == text[r.s1 - 1 : r.s1 - 1 + r.span_len]
        assert r.s1 >= r.s0 + r.span_len  # non-overlap


def test_feistel_epoch_positions_bijective_and_decorrelated(spark):
    from pyspark.sql import Row

    from aleph2_contrib_spark.operators.corpus import feistel_epoch_positions

    for n in (37, 500):
        df = spark.createDataFrame([Row(doc_id=i) for i in range(n)])
        out = feistel_epoch_positions(df, "doc_id", n, [1, 2]).collect()
        by_epoch = {}
        for r in out:
            by_epoch.setdefault(r.epoch, {})[r.doc_id] = r.pos
        for e in (1, 2):
            # bijection: every position hit exactly once
            assert sorted(by_epoch[e].values()) == list(range(n)), (n, e)
        # epochs decorrelated: the two permutations differ
        assert by_epoch[1] != by_epoch[2]


def test_feistel_python_matches_duckdb_expression_form():
    import duckdb

    from aleph2_contrib_spark.operators.corpus import feistel_positions_sql

    # the Arrow kernel and the oracle's expression chain are independent
    # implementations of the same cipher — cross-check them directly
    import hashlib

    n, seed, epoch = 123, "feistel", 7
    bits = max(2, (n - 1).bit_length())
    w = (bits + 1) // 2
    mask = (1 << w) - 1

    def walk(x):
        p, first = x, True
        while first or p >= n:
            first = False
            l, r = p >> w, p & mask
            for i in range(4):
                fr = int(hashlib.md5(f"{seed}:{epoch}:{i}:{r}".encode())
                         .hexdigest()[:8], 16) & mask
                l, r = r, l ^ fr
            p = (l << w) | r
        return p

    con = duckdb.connect()
    sql = feistel_positions_sql(
        f"SELECT x AS doc_id, {epoch} AS epoch FROM range(0, {n}) t(x)",
        "doc_id", n, [epoch], seed, "duckdb",
    )
    got = {r[0]: r[2] for r in con.execute(sql).fetchall()}
    assert got == {x: walk(x) for x in range(n)}
