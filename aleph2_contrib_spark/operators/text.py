"""Text-analysis operators for training-data pipelines.

All hot-path functions are pure Catalyst Column expressions (JVM-side,
codegen, no Python) so they run as a narrow pass over 100 TB of documents
with zero shuffle. Ratios are exposed both raw and as ``floor(x·10⁶)``
fixed-point (``*_f6``) so results are bit-stable across engines for
differential testing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from aleph2_contrib_spark.parallel import ensure_parallelism

# Tiny deterministic per-language stopword sets for the n-gram/stopword
# language-ID heuristic. (Real deployments plug in fastText etc. via a
# pandas UDF; the heuristic keeps the plumbing testable and oracle-able.)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "por", "para", "con"),
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization of trimmed text (array<string>)."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    return F.when(F.trim(col) == "", F.lit(0)).otherwise(F.size(tokens(col)))


def bpe_ish_token_count(col: Column) -> Column:
    """Approximate subword token count: words + punctuation runs counted
    separately (a regex stand-in for BPE segmentation; deterministic)."""
    pieces = F.split(F.trim(col), r"(?=[^\w\s])|(?<=[^\w\s])|\s+")
    return F.size(F.filter(pieces, lambda p: p != ""))


def _f6(x: Column) -> Column:
    """Fixed-point f6: floor(x * 1e6) as bigint — bit-stable across engines."""
    return F.floor(x * F.lit(1000000.0)).cast("long")


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality scoring features: length, token stats,
    distinct-token ratio, stopword ratio, mean token length."""
    df = ensure_parallelism(df)
    t = tokens(F.col(text_col))
    n_tok = F.size(t)
    stop = F.array(*[F.lit(s) for s in LANG_STOPWORDS["en"]])
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars"),
        n_tok.alias("n_tokens"),
        _f6(F.size(F.array_distinct(t)) / n_tok).alias("distinct_ratio_f6"),
        _f6(F.size(F.filter(t, lambda x: F.array_contains(stop, x))) / n_tok).alias(
            "stopword_ratio_f6"
        ),
        _f6(
            F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x)) / n_tok
        ).alias("mean_token_len_f6"),
    )


def quality_classifier_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    weight_span: int = 1000,
    bias_fx: int = 0,
    threshold_fx: int = 0,
) -> DataFrame:
    """fastText-style linear quality classifier over hashed unigram+bigram
    features — the "model-scored quality filter" stage of LLM corpus prep
    (CCNet-style filtering), expressed as a pure Catalyst map: tokenize →
    feature-hash → per-bucket weight lookup → exact integer score. One
    narrow codegen pass, no shuffle, no Python — the shape you want when
    scoring 100 TB of documents.

    Hashing is engine-portable: ``bucket(f) = int(md5(f)[0:8], 16) %
    n_buckets`` (md5, not xxhash64, so external systems reproduce the
    features bit-for-bit). The shipped weight table is a DETERMINISTIC
    placeholder — ``w(b) = int(md5('w:'+b)[0:8], 16) % (2·span+1) - span``
    — standing in for trained parameters; production swaps in a real
    model by replacing ``_bucket_weight`` (the operator owns the hashing,
    feature extraction, and exact arithmetic; the weights are data).
    Scoring is integer fixed-point, so the per-document sum is
    order-independent and bit-stable across engines at any scale — no
    float-summation drift.

    Returns ``(id, n_features, score_fx, keep)``; ``score_fx`` already
    includes ``bias_fx``, and ``keep = score_fx >= threshold_fx``.

    Generalizes the reference's per-record scoring/enrichment stage
    (EnrichmentPipelineService batch modules) to a declared, optimizable
    column program instead of opaque row-at-a-time user code.
    """

    df = ensure_parallelism(df)
    def _bucket(f: Column) -> Column:
        return F.conv(F.substring(F.md5(f), 1, 8), 16, 10).cast("long") % F.lit(
            n_buckets
        )

    def _bucket_weight(b: Column) -> Column:
        h = F.md5(F.concat(F.lit("w:"), b.cast("string")))
        return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.lit(
            2 * weight_span + 1
        ) - F.lit(weight_span)

    # Token array materialized behind its own projection so the per-feature
    # lambdas don't each re-run the regexp+split chain (lambda bodies don't
    # get subexpression elimination — same bind-once discipline as
    # rolling_hash_fingerprints).
    tk_expr = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "
    )
    base = df.select(F.col(id_col).alias("id"), tk_expr.alias("__tk"))
    tk = F.col("__tk")
    n = F.size(tk)
    bigrams = F.zip_with(
        F.slice(tk, 1, n - 1),
        F.slice(tk, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    feats = base.select("id", F.concat(tk, bigrams).alias("__fs"))
    fs = F.col("__fs")
    score = F.aggregate(
        fs,
        F.lit(0).cast("long"),
        lambda acc, f: acc + _bucket_weight(_bucket(f)),
    ) + F.lit(bias_fx)
    scored = feats.select(
        F.col("id"),
        F.size(fs).alias("n_features"),
        score.alias("score_fx"),
    )
    return scored.withColumn("keep", F.col("score_fx") >= F.lit(threshold_fx))


def lang_id(col: Column) -> Column:
    """Heuristic language ID: argmax over per-language stopword hit counts,
    ties broken by language code order; 'und' when no hits."""
    t = tokens(F.lower(col))
    scores = []
    for lang, words in sorted(LANG_STOPWORDS.items()):
        arr = F.array(*[F.lit(w) for w in words])
        scores.append(
            F.struct(
                F.size(F.filter(t, lambda x: F.array_contains(arr, x))).alias("score"),
                F.lit(lang).alias("lang"),
            )
        )
    # array_max on struct orders by (score, lang); invert lang for asc tiebreak
    best = F.reverse(F.array_sort(F.array(*scores)))[0]
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def rolling_hash_fingerprints(col: Column, window: int = 8) -> Column:
    """Winnowing-style document fingerprints: xxhash64 of each
    ``window``-token shingle, keep the per-document minimum k (here the
    global min — callers can take bottom-k via array_sort + slice).

    The token array is bound ONCE as a lambda variable of a 1-element
    outer transform: referenced inline, the split+trim chain would be
    re-evaluated for every window position (lambda bodies don't get
    subexpression elimination) — the bind-once pattern keeps this a pure
    Column function while paying the tokenization exactly once per row."""
    def shingle_hashes(t: Column) -> Column:
        n = F.greatest(F.size(t) - F.lit(window - 1), F.lit(1))
        return F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(t, i + 1, window))),
        )

    return F.transform(F.array(tokens(F.lower(col))), shingle_hashes)[0]


def bigram_rarity(
    df: DataFrame,
    id_col: str,
    text_col: str,
    rare_threshold: int = 2,
) -> DataFrame:
    """Corpus-statistical fluency proxy: the fraction of a document's
    word bigrams that are RARE in the corpus (count <= rare_threshold).
    Gibberish, OCR noise, and boilerplate-stitched text score high;
    natural prose reuses the corpus's common transitions and scores low —
    the cheapest useful stand-in for LM-perplexity filtering in a
    training-data pipeline, computable without any model.

    Returns (id, n_bigrams, n_rare, rare_ratio_f6); docs with <2 tokens
    are dropped (no bigrams). rare_ratio_f6 = floor(1e6 * n_rare /
    n_bigrams) — integer fixed-point, engine-exact.

    Plan shape: narrow bigram explode, then a COUNT WINDOW partitioned on
    the bigram (one shuffle — the corpus LM and the per-occurrence lookup
    in the same pass, no self-join, no recomputed explode), then
    groupBy(id). Everything is counts of strings — no floats until the
    final f6."""
    df = ensure_parallelism(df)
    from pyspark.sql import Window

    toks = F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " ")
    # Materialize the token array behind its own projection BEFORE the
    # per-bigram lambdas: referenced inline, CollapseProject would splice
    # the regexp+split chain into every try_element_at call — ~2x tokens
    # redundant regex evaluations per document (the same trap documented
    # at shingle_hashes_from_token_hashes).
    base = df.select(F.col(id_col).alias("id"), toks.alias("__tk")).filter(
        F.size(F.col("__tk")) >= 2
    )
    tk = F.col("__tk")
    bg = base.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - 1),
                lambda i: F.concat_ws(
                    " ", F.try_element_at(tk, i), F.try_element_at(tk, i + 1)
                ),
            )
        ).alias("bigram"),
    )
    counted = bg.withColumn("__c", F.count(F.lit(1)).over(Window.partitionBy("bigram")))
    rare = F.when(F.col("__c") <= rare_threshold, 1).otherwise(0)
    return (
        counted.groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_bigrams"),
            F.sum(rare).cast("int").alias("n_rare"),
            F.floor(F.lit(1000000.0) * F.sum(rare) / F.count(F.lit(1)))
            .cast("long")
            .alias("rare_ratio_f6"),
        )
        .withColumnRenamed("id", id_col)
    )


def relevance_topk(
    df: DataFrame,
    query_terms: "list[str]",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25-shaped relevance ranking over a tokenized text column — the
    scored-query half of the reference's Elasticsearch surface (the repo's
    ES DSL handles filter context; this adds ordering by score, reference
    ElasticsearchUtils full-text query path). Returns the top-``k``
    (id, score_f6) by score desc, id asc.

    Deliberately LOG-FREE: idf is the raw Robertson odds
    (N − df + 0.5)/(df + 0.5) without the ln() BM25 wraps around it.
    Per-term ordering is identical (ln is monotone); the summed score can
    order differently from textbook BM25 when idf magnitudes differ
    wildly — the trade accepted for ENGINE-EXACT scores: +,−,×,÷ on
    doubles are IEEE-correctly-rounded and bit-identical in any engine,
    while ln() differs in final ulps across libms, which would make
    scores (and therefore ranks and fixed-point hashes) engine-dependent.
    Term contributions are summed in the given fixed term order
    (left-assoc fold — float addition isn't associative, so the order is
    part of the contract).

    Plan: ONE narrow pass computes per-doc tf vector + dl; one tiny agg
    derives (N, avgdl, per-term df); a 1-row broadcast joins the stats
    back; TakeOrderedAndProject does the top-k. No shuffle of the corpus,
    no explode — per-term tf is a vectorized array filter, so cost is
    O(docs × terms) at scan speed."""
    df = ensure_parallelism(df)
    terms = [t.lower() for t in query_terms]
    toks = tokens(F.lower(F.col(text_col)))

    def tf_of(term: str):
        # closure factory: a 2-arg lambda would make Spark pass the array
        # INDEX as the second argument (higher-order functions dispatch on
        # lambda arity), silently comparing tokens to positions
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    base = df.select(
        F.col(id_col),
        F.size(toks).cast("double").alias("__dl"),
        *[tf_of(t).cast("double").alias(f"__tf_{i}") for i, t in enumerate(terms)],
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        (F.sum("__dl") / F.count(F.lit(1))).alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("long")).cast("double").alias(f"__df_{i}")
            for i in range(len(terms))
        ],
    )
    x = base.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(terms)):
        tf, dfq = F.col(f"__tf_{i}"), F.col(f"__df_{i}")
        idf = (F.col("__n") - dfq + F.lit(0.5)) / (dfq + F.lit(0.5))
        num = tf * F.lit(k1 + 1.0)
        den = tf + (
            F.lit(k1)
            * ((F.lit(1.0 - b)) + ((F.lit(b) * F.col("__dl")) / F.col("__avgdl")))
        )
        score = score + (idf * (num / den))
    return (
        x.select(F.col(id_col), F.floor(score * F.lit(1000000.0)).cast("long").alias("score_f6"))
        .orderBy(F.col("score_f6").desc(), F.col(id_col).asc())
        .limit(k)
    )


def inverted_postings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_postings: int = 20,
) -> DataFrame:
    """Inverted-index materialization: term → document frequency + a
    bounded, id-ordered posting list. The batch analogue of the
    reference's search-index service (documents written to Elasticsearch
    ARE an inverted index, ElasticsearchIndexService.java) for engines
    with no resident index: the output table, bucketed on term, serves
    term-lookup joins.

    Tokenization matches the rest of this module (lowercase, split on
    non-alphanumerics, empties dropped); per-document duplicate terms
    collapse before the shuffle, so a term contributes one row per doc.

    Returns (term, doc_freq, postings_csv) for terms with
    ``doc_freq >= min_df``; postings_csv holds the first
    ``max_postings`` doc ids ascending.

    Scale: array_distinct runs document-local (narrow), so the single
    shuffle is keyed on term and carries (term, doc_id) pairs —
    vocabulary skew (stopwords appear in every doc) is why the posting
    list is BOUNDED: a row_number window ranks each term's docs by id
    BEFORE aggregation, so collect_list only ever sees ≤ max_postings
    ids per term (collect_list skips the NULLs the rank filter leaves) —
    no executor materializes an unbounded stopword posting array even
    transiently. The window and the groupBy share one exchange on term
    (same key → Catalyst reuses the partitioning). At 100 TB, store the
    full postings instead by writing the ranked rows keyed on
    (term, bucket(rank)) — same plan, sharded lists.
    """
    df = ensure_parallelism(df)
    terms = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
                    lambda t: t != "",
                )
            )
        ).alias("term"),
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    ranked = terms.withColumn("__rn", F.row_number().over(w))
    return (
        ranked.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("doc_freq"),
            F.array_sort(
                F.collect_list(
                    F.when(F.col("__rn") <= F.lit(max_postings), F.col("doc_id"))
                )
            ).alias("__post"),
        )
        .filter(F.col("doc_freq") >= F.lit(min_df))
        .select(
            "term",
            "doc_freq",
            F.array_join(F.transform(F.col("__post"), lambda d: d.cast("string")), ",").alias(
                "postings_csv"
            ),
        )
    )


def char_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 20,
) -> DataFrame:
    """Adjacent-character-pair frequencies — the inner loop of BPE
    tokenizer training (each merge round promotes the most frequent
    pair): corpus-wide counts of every 2-char window inside words, top-N
    by (count desc, pair asc) so the cut is deterministic.

    Words are lowercase alphabetic runs of length ≥ 2; pairs are drawn
    within words only (BPE never merges across word boundaries).

    Scale: pair generation is a narrow pure-codegen pass (split →
    nested transform → flatten → explode); the only shuffle carries
    (pair, partial count) after map-side combine — the pair alphabet is
    ≤ 26², so the aggregate state is tiny no matter the corpus size, and
    the top-N compiles to TakeOrderedAndProject. A full BPE trainer
    re-runs this over re-segmented text each merge round; the per-round
    plan is exactly this one.
    """
    df = ensure_parallelism(df)
    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z]+"), lambda w: F.length(w) >= 2
    )
    pairs = F.flatten(
        F.transform(
            words,
            lambda w: F.transform(
                F.sequence(F.lit(1), F.length(w) - 1), lambda i: w.substr(i, F.lit(2))
            ),
        )
    )
    return (
        df.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair").asc())
        .limit(top_n)
    )


def top_terms_tfidf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """Per-document keyword extraction: top-k terms by TF-IDF — the
    document-representation primitive behind tag suggestion, corpus
    search facets, and classic sparse retrieval features.

    LOG-FREE like relevance_topk: score = tf · N / df_t (the raw
    idf odds without ln — per-document ranking by tf·N/df is order-
    equivalent to tf·ln-idf only when tf is constant, so this is a
    deliberately different, fully-rational scoring whose integral
    fixed-point floor(10⁶·tf·N/df) is bit-stable across engines).
    Returns (id, term, tf, score_f6, rank) with rank 1..k per doc by
    (score desc, term asc) — deterministic.

    Plan shape: narrow tokenize+explode, groupBy(id, term) for tf, a
    COUNT window partitioned on term for df (corpus statistics and
    per-doc rows in the same pass — no self-join), then the per-doc
    top-k window. Shuffle volume is the (id, term) stream — never
    all-pairs, no driver state.
    """
    df = ensure_parallelism(df)
    terms = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), lambda t: t != ""
            )
        ).alias("term"),
    )
    tf = terms.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(F.col(id_col)).distinct().count()
    wdf = Window.partitionBy("term")
    scored = (
        tf.withColumn("df_t", F.count(F.lit(1)).over(wdf))
        .filter(F.col("df_t") >= F.lit(min_df))
        .withColumn(
            "score_f6",
            F.expr(
                f"CAST((CAST(1000000 AS DECIMAL(38,0)) * CAST(tf AS DECIMAL(38,0))"
                f" * CAST({int(n_docs)} AS DECIMAL(38,0)))"
                f" div CAST(df_t AS DECIMAL(38,0)) AS BIGINT)"
            ),
        )
    )
    wk = Window.partitionBy("id").orderBy(F.col("score_f6").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select(F.col("id").alias(id_col), "term", "tf", "score_f6", "rank")
    )


def ngram_lm_surprisal(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bigram-LM surprisal scoring — the model-based perplexity filter of
    CCNet/KenLM-style corpus prep (score each document by how surprising
    its word transitions are under a language model trained on the corpus
    itself), expressed so the score is EXACT INTEGER ARITHMETIC and
    therefore bit-stable across engines.

    Model: add-one-smoothed bigram LM over the corpus.
    ``P(w2|w1) = (c(w1 w2) + 1) / (ctx(w1) + V)`` where ``ctx(w1)`` is
    the number of bigram positions whose left word is ``w1`` and ``V``
    is the corpus vocabulary size. Per-bigram surprisal is quantized to
    whole bits using an identity that needs no transcendentals:

        floor(log2(b / a)) = bit_length(b div a) - 1   (b >= a >= 1)

    computed as ``length(bin(b div a)) - 1`` — pure integer ops, so the
    per-document sum is order-independent and identical in any engine
    (ln()/log2() differ in final ulps across libms, which is why the
    gated output avoids them; see relevance_topk for the same trade).
    ``b = ctx(w1) + V >= c(w1 w2) + 1 = a`` always, so the quotient is
    >= 1 and the identity applies.

    Returns ``(id, n_bigrams, total_bits, mean_bits_f6)`` for documents
    with >= 2 tokens; ``mean_bits_f6 = floor(1e6 · total_bits /
    n_bigrams)`` is the integer-bit cross-entropy estimate (higher =
    more surprising = gibberish/OCR noise/boilerplate stitching, the
    CCNet "tail" bucket).

    Plan shape (scale-first): narrow bigram explode → groupBy(id, w1,
    bigram) with map-side combine (shuffle volume is DISTINCT per-doc
    bigrams, not occurrences — repetitive docs collapse before the
    exchange) → corpus statistics via two SUM windows (partitioned on
    bigram, then on w1) over that reduced table → groupBy(id). The
    vocabulary size is one tiny aggregate broadcast back as a scalar.
    No self-joins, no driver-side model, no floats until the final f6.
    """
    df = ensure_parallelism(df)
    toks = F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " ")
    base = df.select(F.col(id_col).alias("id"), toks.alias("__tk"))
    tk = F.col("__tk")

    # Vocabulary size over ALL token positions (one tiny agg, broadcast).
    vocab = (
        base.select(F.explode(tk).alias("w"))
        .agg(F.count_distinct(F.col("w")).alias("__v"))
    )

    bg = (
        base.filter(F.size(tk) >= 2)
        .select(
            "id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(tk) - 1),
                    lambda i: F.struct(
                        F.try_element_at(tk, i).alias("w1"),
                        F.concat_ws(
                            " ", F.try_element_at(tk, i), F.try_element_at(tk, i + 1)
                        ).alias("bigram"),
                    ),
                )
            ).alias("p"),
        )
        .select("id", F.col("p.w1").alias("w1"), F.col("p.bigram").alias("bigram"))
        .groupBy("id", "w1", "bigram")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    c_bg = F.sum("m").over(Window.partitionBy("bigram"))
    c_ctx = F.sum("m").over(Window.partitionBy("w1"))
    counted = bg.withColumn("__cbg", c_bg).withColumn("__cctx", c_ctx)

    q = F.expr("(__cctx + __v) div (__cbg + 1)")
    bits = (F.length(F.bin(q)) - F.lit(1)).cast("long")
    return (
        counted.crossJoin(F.broadcast(vocab))
        .withColumn("__bits", bits)
        .groupBy("id")
        .agg(
            F.sum("m").cast("int").alias("n_bigrams"),
            F.sum(F.col("m") * F.col("__bits")).cast("long").alias("total_bits"),
            F.expr(
                "CAST((1000000 * sum(m * __bits)) div sum(m) AS BIGINT)"
            ).alias("mean_bits_f6"),
        )
        .withColumnRenamed("id", id_col)
    )


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS scheme): hash every ``k``-token shingle, slide a ``window`` of
    consecutive hashes over the document, keep the minimum of each
    window, and emit the distinct selected hashes. Guarantees every
    shared run of ``window + k - 1`` tokens between two documents shares
    at least one fingerprint, while storing only ~2/(window+1) of the
    shingle hashes — the standard near-dup/plagiarism index primitive.

    Hashes are the engine-portable md5 32-bit prefix (same family as the
    sketch module) rather than xxhash64, so any engine — and the DuckDB
    oracle — reproduces the fingerprint set bit-for-bit.

    Returns distinct ``(id, fp)`` rows (fp BIGINT). Documents with fewer
    than ``k`` tokens hash their full token run as a single shingle.

    Plan shape: everything per-document is a narrow Column program (one
    tokenize, one hash array, one window-min array — the token array and
    hash array are each bound ONCE as lambda variables so the split/md5
    chains aren't re-evaluated per position); the only shuffle is the
    final distinct on (id, fp).
    """
    df = ensure_parallelism(df)
    def mins_of(hs: Column) -> Column:
        n_win = F.greatest(F.size(hs) - F.lit(window - 1), F.lit(1))
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_win),
                lambda j: F.array_min(F.slice(hs, j, window)),
            )
        )

    def hashes_of(t: Column) -> Column:
        n_sh = F.greatest(F.size(t) - F.lit(k - 1), F.lit(1))
        return F.transform(
            F.sequence(F.lit(1), n_sh),
            lambda i: F.conv(
                F.substring(F.md5(F.concat_ws(" ", F.slice(t, i, k))), 1, 8), 16, 10
            ).cast("long"),
        )

    toks = F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " ")
    fps = (
        df.select(F.col(id_col).alias("id"), toks.alias("__tk"))
        .select("id", F.transform(F.array(F.col("__tk")), hashes_of)[0].alias("__hs"))
        .select("id", F.explode(F.transform(F.array(F.col("__hs")), mins_of)[0]).alias("fp"))
    )
    return fps.distinct().withColumnRenamed("id", id_col)


def hashed_embedding(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    as_rows: bool = False,
) -> DataFrame:
    """Feature-hashed bag-of-words document embeddings — the model-free
    bridge from raw text to this repo's vector operators (brute-force /
    LSH / IVF ANN, MMR rerank, embedding-cosine dedup): hash every token
    into one of ``dim`` buckets with a deterministic sign, sum, and
    L2-normalize. The hashing-trick embedding (Weinberger et al. 2009) —
    no trained model, engine-portable md5 features, cosine between two
    documents approximates their token-profile similarity.

    Bucket and sign come from disjoint md5 prefix fields (same family as
    the sketch module): ``bucket = int(md5(tok)[0:8], 16) % dim``,
    ``sign = +1 if int(md5(tok)[8:9], 16) < 8 else -1``.

    Default output is one row per document with a dense
    ``array<double>`` ``embedding`` (unit L2 norm; the all-zero edge
    case — empty text — stays all-zero rather than dividing by zero).
    ``as_rows=True`` instead emits the sparse integer form
    ``(id, bucket, weight)`` BEFORE normalization — exact counts, the
    differential-test surface (SQL engines reproduce it bit-for-bit
    without array plumbing) and the natural input to a downstream
    merge (weights of a sharded corpus sum).

    Plan shape at scale: explode tokens (narrow), groupBy(id, bucket)
    with map-side partial sums — shuffle volume is distinct per-doc
    buckets, capped at ``dim`` rows per document regardless of length —
    then (dense form) one map_from_entries + transform rebuild per doc.
    No Python anywhere.
    """
    df = ensure_parallelism(df)
    toks = F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " ")
    h = F.md5(F.col("tok"))
    sparse = (
        df.select(F.col(id_col).alias("id"), F.explode(toks).alias("tok"))
        .filter(F.col("tok") != "")
        .select(
            "id",
            (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.lit(dim)).alias("bucket"),
            F.when(
                F.conv(F.substring(h, 9, 1), 16, 10).cast("int") < F.lit(8), F.lit(1)
            ).otherwise(F.lit(-1)).alias("s"),
        )
        .groupBy("id", "bucket")
        .agg(F.sum("s").cast("long").alias("weight"))
    )
    if as_rows:
        return sparse.filter(F.col("weight") != 0).withColumnRenamed("id", id_col)
    # left join back onto the id set: token-free documents (empty text)
    # keep a row — element_at on their NULL map yields NULL → coalesce 0,
    # so they come out as the documented all-zero vector
    dense = df.select(F.col(id_col).alias("id")).join(
        sparse.groupBy("id").agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("bucket"), F.col("weight")))
            ).alias("__m")
        ),
        "id",
        "left",
    )
    # bind-once discipline (see rolling_hash_fingerprints): the raw vector
    # and its norm each get their own projection so the map-rebuild and
    # the norm aren't re-evaluated per element inside the lambdas
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda b: F.coalesce(F.element_at(F.col("__m"), b.cast("long")), F.lit(0)).cast(
            "double"
        ),
    )
    staged = dense.select("id", vec.alias("__v")).select(
        "id",
        "__v",
        F.sqrt(F.aggregate(F.col("__v"), F.lit(0.0), lambda a, x: a + x * x)).alias("__n"),
    )
    return staged.select(
        F.col("id").alias(id_col),
        F.transform(
            F.col("__v"),
            lambda x: F.when(F.col("__n") == 0.0, F.lit(0.0)).otherwise(x / F.col("__n")),
        ).alias("embedding"),
    )


def collocations(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 20,
) -> DataFrame:
    """Corpus collocation mining: the word pairs that co-occur adjacently
    far more than chance — multiword-expression discovery ("new york",
    "machine learning") for tokenizer seeding, phrase-aware indexing,
    and corpus audits. Association is the exact rational LIFT

        lift(a b) = c(a b) · N / (c(a) · c(b))

    (c = corpus counts over bigram positions, N = total bigrams).
    Ranking by lift is order-identical to ranking by PMI — log is
    monotone — but the score stays an exact integer fixed-point
    (DECIMAL cross-products, integral div), bit-stable in any engine;
    the same log-free trade as relevance_topk and basket_pair_lift.

    ``min_count`` floors c(a b) (hapax pairs otherwise dominate any
    association measure); returns top-``top_k`` by (lift desc, w1, w2) —
    a deterministic cut — as (w1, w2, pair_cnt, lift_f6).

    Plan shape at scale: one narrow bigram explode feeds BOTH count
    tables (pairs via groupBy(w1, w2); left/right unigram-position
    counts via two slim groupBys of the same pass), two joins keyed on
    single words against the pair table (already ≤ distinct-pair-sized,
    and min_count-pruned before joining), TakeOrderedAndProject for the
    cut. Shuffle volume is distinct pairs + distinct words, never
    occurrences past the first partial agg.
    """
    df = ensure_parallelism(df)
    toks = F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " ")
    base = df.select(F.col(id_col).alias("id"), toks.alias("__tk")).filter(
        F.size(F.col("__tk")) >= 2
    )
    tk = F.col("__tk")
    bg = base.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - 1),
                lambda i: F.struct(
                    F.try_element_at(tk, i).alias("w1"),
                    F.try_element_at(tk, i + 1).alias("w2"),
                ),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    pairs = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= F.lit(int(min_count)))
    )
    left_cnt = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("__ca"))
    right_cnt = bg.groupBy("w2").agg(F.count(F.lit(1)).alias("__cb"))
    n_total = bg.count()
    return (
        pairs.join(left_cnt, "w1")
        .join(right_cnt, "w2")
        .select(
            "w1",
            "w2",
            "pair_cnt",
            F.expr(
                f"CAST((CAST(1000000 AS DECIMAL(38,0)) * CAST(pair_cnt AS DECIMAL(38,0))"
                f" * CAST({int(n_total)} AS DECIMAL(38,0)))"
                f" div (CAST(__ca AS DECIMAL(38,0)) * CAST(__cb AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("lift_f6"),
        )
        .orderBy(F.col("lift_f6").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(top_k)
    )


def readability_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Readability screen with EXACT integer features — the corpus-QA
    cousin of the Gopher length rules: per document, word count
    (``[A-Za-z]+`` runs), sentence count (``[.!?]+`` runs) and syllable
    proxy (``[aeiouy]+`` vowel groups, the standard cheap estimator),
    plus a floor-divided milli-Flesch:

        flesch_m3 = 206835 − (1015·words) div max(sents,1)
                           − (84600·syll) div max(words,1)

    The two ratios are floor divisions, so the score is an integer and
    engine-exact — a deterministic variant of Flesch reading ease (the
    float formula differs by < 2 milli-points, irrelevant for
    thresholding at corpus scale). All regexes sit in the Java∩RE2
    dialect. One narrow codegen pass, no shuffle, no Python.
    """
    df = ensure_parallelism(df)
    words = F.size(F.regexp_extract_all(F.col(text_col), F.lit("[A-Za-z]+"), 0))
    sents = F.size(F.regexp_extract_all(F.col(text_col), F.lit("[.!?]+"), 0))
    syll = F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[aeiouy]+"), 0)
    )
    return df.select(
        F.col(id_col),
        words.cast("long").alias("n_words"),
        sents.cast("long").alias("n_sentences"),
        syll.cast("long").alias("n_syllable_groups"),
    ).withColumn(
        "flesch_m3",
        F.expr(
            "CAST(206835"
            " - (1015 * n_words) div greatest(n_sentences, 1)"
            " - (84600 * n_syllable_groups) div greatest(n_words, 1)"
            " AS BIGINT)"
        ),
    )


def readability_stats_oracle_sql(
    table: str, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB replica of :func:`readability_stats`."""
    words = f"len(regexp_extract_all({text_col}, '[A-Za-z]+'))"
    sents = f"len(regexp_extract_all({text_col}, '[.!?]+'))"
    syll = f"len(regexp_extract_all(lower({text_col}), '[aeiouy]+'))"
    return f"""
SELECT {id_col},
       CAST({words} AS BIGINT) AS n_words,
       CAST({sents} AS BIGINT) AS n_sentences,
       CAST({syll} AS BIGINT) AS n_syllable_groups,
       CAST(206835
            - (1015 * {words}) // greatest({sents}, 1)
            - (84600 * {syll}) // greatest({words}, 1)
            AS BIGINT) AS flesch_m3
FROM {table}
"""


def source_similarity_minhash(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 32,
    seed: str = "ss",
) -> DataFrame:
    """Dataset-overlap matrix: estimated token-set Jaccard between every
    pair of corpus slices (sources, crawls, snapshots) via k-register
    MinHash — the "how much does dataset A overlap dataset B" screen
    run before mixing corpora, at signature cost instead of a
    token-level join.

    Portable and DETERMINISTIC: register i of a slice is
    min(md5("seed:i:token")) over the slice's DISTINCT lowercase word
    tokens, so both engines build bit-identical signatures and the
    estimate matches exactly (it is still an estimate of true Jaccard —
    k controls the variance, ±1/√k). Returns (group_a, group_b,
    n_matches, jaccard_est_ppm = n_matches·1e6 div k) for group_a <
    group_b.

    Plan shape at 100 TB: one distinct over (group, token), ONE groupBy
    per-group computing all k min-registers map-side-partial, then a
    pairwise self-join of the GROUP-sized signature table (groups ≪
    rows; 10 sources = 45 pairs). Token volume never crosses the
    network twice.
    """
    df = ensure_parallelism(df)
    if k < 1 or k > 256:
        raise ValueError(f"k must be in [1, 256], got {k}")
    toks = (
        df.select(
            F.col(group_col).alias("__g"),
            F.explode(
                F.array_distinct(
                    F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
                )
            ).alias("__t"),
        )
        .filter(F.col("__t") != "")
        .distinct()
    )
    regs = toks.groupBy("__g").agg(
        *[
            F.min(
                F.md5(F.concat_ws(":", F.lit(seed), F.lit(str(i)), F.col("__t")))
            ).alias(f"__r{i}")
            for i in range(k)
        ]
    )
    a = regs.select(
        F.col("__g").alias("group_a"), *[F.col(f"__r{i}").alias(f"__a{i}") for i in range(k)]
    )
    b = regs.select(
        F.col("__g").alias("group_b"), *[F.col(f"__r{i}").alias(f"__b{i}") for i in range(k)]
    )
    matches = sum(
        F.when(F.col(f"__a{i}") == F.col(f"__b{i}"), 1).otherwise(0) for i in range(k)
    )
    return (
        a.join(b, F.col("group_a") < F.col("group_b"))
        .select(
            "group_a",
            "group_b",
            matches.cast("long").alias("n_matches"),
        )
        .withColumn(
            "jaccard_est_ppm",
            F.expr(f"CAST((n_matches * 1000000) div {int(k)} AS BIGINT)"),
        )
    )


def source_similarity_minhash_oracle_sql(
    table: str,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 32,
    seed: str = "ss",
) -> str:
    """DuckDB replica of :func:`source_similarity_minhash` — identical
    md5 registers over the same distinct-token sets."""
    from aleph2_contrib_spark.operators import sql_str

    seed = sql_str(seed)
    regs = ", ".join(
        f"min(md5('{seed}:{i}:' || t)) AS r{i}" for i in range(k)
    )
    matches = " + ".join(
        f"CASE WHEN a.r{i} = b.r{i} THEN 1 ELSE 0 END" for i in range(k)
    )
    return f"""
WITH toks AS (
    SELECT DISTINCT {group_col} AS g, t
    FROM (SELECT {group_col},
                 unnest(list_distinct(string_split_regex(lower({text_col}),
                                                         '[^a-z0-9]+'))) AS t
          FROM {table})
    WHERE t <> ''
), regs AS (
    SELECT g, {regs} FROM toks GROUP BY g
)
SELECT a.g AS group_a, b.g AS group_b,
       CAST({matches} AS BIGINT) AS n_matches,
       CAST((({matches}) * 1000000) // {int(k)} AS BIGINT) AS jaccard_est_ppm
FROM regs a JOIN regs b ON a.g < b.g
"""


_CODE_KEYWORDS = (
    "def|class|return|import|function|var|const|if|else|for|while|void|int|public"
)


def code_detect(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    symbol_ppm_min: int = 40_000,
    keyword_per_100w_min: int = 8,
) -> DataFrame:
    """Code-vs-prose router — the corpus triage step that sends source
    code to a code pipeline (different dedup granularity, different
    quality rules) instead of letting prose heuristics junk it. Two
    exact signals per document:

      symbol_ppm        code punctuation ({}[]();=<>#) per char, ppm
      kw_per_100w_x100  code keyword hits per 100 words, ×100 fixed
                        point (keywords: def/class/return/import/…)

    is_code = symbol_ppm >= symbol_ppm_min OR keyword density >=
    keyword_per_100w_min (×100 internally). All counts are
    regexp_count over the shared Java∩RE2 dialect; one narrow pass.
    """
    df = ensure_parallelism(df)
    n_chars = F.length(F.col(text_col))
    n_sym = F.regexp_count(F.col(text_col), F.lit(r"[{}\[\]();=<>#]"))
    n_words = F.regexp_count(F.col(text_col), F.lit("[A-Za-z]+"))
    n_kw = F.regexp_count(
        F.lower(F.col(text_col)), F.lit(rf"\b({_CODE_KEYWORDS})\b")
    )
    base = df.select(
        F.col(id_col),
        n_chars.cast("long").alias("__nc"),
        n_sym.cast("long").alias("n_symbols"),
        n_words.cast("long").alias("__nw"),
        n_kw.cast("long").alias("n_keywords"),
    )
    return base.select(
        id_col,
        "n_symbols",
        "n_keywords",
        F.expr(
            "CAST(CASE WHEN __nc > 0 THEN (n_symbols * 1000000) div __nc "
            "ELSE 0 END AS BIGINT)"
        ).alias("symbol_ppm"),
        F.expr(
            "CAST(CASE WHEN __nw > 0 THEN (n_keywords * 10000) div __nw "
            "ELSE 0 END AS BIGINT)"
        ).alias("kw_per_100w_x100"),
    ).withColumn(
        "is_code",
        (F.col("symbol_ppm") >= F.lit(int(symbol_ppm_min)))
        | (F.col("kw_per_100w_x100") >= F.lit(int(keyword_per_100w_min) * 100)),
    )


def code_detect_oracle_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    symbol_ppm_min: int = 40_000,
    keyword_per_100w_min: int = 8,
) -> str:
    """DuckDB replica of :func:`code_detect`."""
    sym = f"len(regexp_extract_all({text_col}, '[{{}}\\[\\]();=<>#]'))"
    words = f"len(regexp_extract_all({text_col}, '[A-Za-z]+'))"
    kw = f"len(regexp_extract_all(lower({text_col}), '\\b({_CODE_KEYWORDS})\\b'))"
    return f"""
SELECT {id_col},
       CAST({sym} AS BIGINT) AS n_symbols,
       CAST({kw} AS BIGINT) AS n_keywords,
       CAST(CASE WHEN len({text_col}) > 0
            THEN ({sym} * 1000000) // len({text_col}) ELSE 0 END AS BIGINT)
           AS symbol_ppm,
       CAST(CASE WHEN {words} > 0
            THEN ({kw} * 10000) // {words} ELSE 0 END AS BIGINT)
           AS kw_per_100w_x100,
       (CASE WHEN len({text_col}) > 0
             THEN ({sym} * 1000000) // len({text_col}) ELSE 0 END)
           >= {int(symbol_ppm_min)}
       OR (CASE WHEN {words} > 0
                THEN ({kw} * 10000) // {words} ELSE 0 END)
           >= {int(keyword_per_100w_min) * 100} AS is_code
FROM {table}
"""


def ngram_overlap_scores(
    df: DataFrame,
    id_col: str,
    cand_col: str,
    ref_col: str,
    n: int = 2,
) -> DataFrame:
    """Clipped n-gram precision / recall between a candidate and a
    reference text per row — the BLEU-n modified-precision component
    (Papineni et al. 2002) and ROUGE-n recall (Lin 2004), the eval-data
    QA primitive behind "how close is this generated answer to the
    reference" scoring and self-instruct dedup-against-prompt checks.

    clipped = Σ_g min(count_cand(g), count_ref(g)) over distinct
    candidate n-grams; precision = clipped / |cand grams|, recall =
    clipped / |ref grams| — exact integer counts, f6 fixed-point
    ratios (floor), NULL when the respective denominator is 0.

    Plan shape at 100 TB: gram sizes are a narrow projection; the
    clipped-match counts come from ONE posexplode of per-row
    (gram, cand_count, ref_count) histogram entries and an id-keyed
    groupBy with map-side partial agg, joined back onto the sizes. The
    first version computed Σ min via nested higher-order functions —
    zero shuffles but O(distinct·len) INTERPRETED closure evaluations
    per row, measured 28 s over 5k docs where this plan takes ~2 s; the
    id-keyed shuffle is the cheaper currency at every scale since gram
    rows never leave their partition unaggregated beyond the id key.
    Reference parity: the reference has no eval scorer — this is part
    of the LLM-pipeline surface (SURVEY §2 extras) the engine adds.
    """
    df = ensure_parallelism(df)
    from aleph2_contrib_spark.operators.corpus import word_ngrams

    gc = word_ngrams(F.col(cand_col), n)
    gr = word_ngrams(F.col(ref_col), n)
    base = df.select(
        F.col(id_col).alias("__id"),
        F.size(gc).cast("long").alias("n_cand_grams"),
        F.size(gr).cast("long").alias("n_ref_grams"),
        gc.alias("__gc"),
        gr.alias("__gr"),
    )
    # raw grams explode with a side marker → (id, gram) counts per side →
    # Σ min(c_cand, c_ref) per id. Linear in gram count per row — no
    # per-gram array scans at all; grams absent from the candidate never
    # produce a ca > 0 row, so filtering on ca > 0 keeps the sum exact.
    grams = base.select(
        "__id", F.explode("__gc").alias("__g"), F.lit(1).alias("__ca"), F.lit(0).alias("__cr")
    ).unionAll(
        base.select(
            "__id", F.explode("__gr").alias("__g"), F.lit(0).alias("__ca"), F.lit(1).alias("__cr")
        )
    )
    clipped = (
        grams.groupBy("__id", "__g")
        .agg(
            F.sum("__ca").alias("__na"),
            F.sum("__cr").alias("__nr"),
        )
        .filter(F.col("__na") > 0)
        .groupBy("__id")
        .agg(
            F.sum(F.least(F.col("__na"), F.col("__nr")).cast("long")).alias(
                "__clipped"
            )
        )
    )
    out = (
        base.select("__id", "n_cand_grams", "n_ref_grams")
        .join(clipped, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "n_cand_grams",
            "n_ref_grams",
            F.coalesce(F.col("__clipped"), F.lit(0)).cast("long").alias(
                "clipped_matches"
            ),
        )
    )
    return out.select(
        id_col,
        "n_cand_grams",
        "n_ref_grams",
        "clipped_matches",
        F.when(
            F.col("n_cand_grams") > 0,
            F.floor(
                F.col("clipped_matches") * F.lit(1_000_000) / F.col("n_cand_grams")
            ),
        ).cast("long").alias("precision_f6"),
        F.when(
            F.col("n_ref_grams") > 0,
            F.floor(
                F.col("clipped_matches") * F.lit(1_000_000) / F.col("n_ref_grams")
            ),
        ).cast("long").alias("recall_f6"),
    )


def ngram_overlap_scores_oracle_sql(
    rows_sql: str, id_col: str, n: int = 2
) -> str:
    """DuckDB replica of :func:`ngram_overlap_scores`. ``rows_sql``
    yields (id, cand, ref)."""

    def grams(col: str) -> str:
        toks = f"string_split_regex(lower(trim({col})), '\\s+')"
        parts = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
        return (
            f"CASE WHEN trim({col}) != '' AND len({toks}) >= {n} THEN "
            f"(SELECT list_transform(generate_series(1, len(t) - {n - 1}), "
            f"i -> {parts}) FROM (SELECT {toks} AS t)) "
            f"ELSE [] END"
        )

    return f"""
WITH g AS (
    SELECT {id_col} AS id, {grams('cand')} AS gc, {grams('ref')} AS gr
    FROM ({rows_sql})
), counted AS (
    SELECT id, len(gc) AS n_cand_grams, len(gr) AS n_ref_grams,
           CAST(coalesce(list_aggregate(
               list_transform(list_distinct(gc),
                   x -> least(len(list_filter(gc, y -> y = x)),
                              len(list_filter(gr, y -> y = x)))),
               'sum'), 0) AS BIGINT) AS clipped_matches
    FROM g
)
SELECT id AS {id_col},
       CAST(n_cand_grams AS BIGINT) AS n_cand_grams,
       CAST(n_ref_grams AS BIGINT) AS n_ref_grams,
       clipped_matches,
       CASE WHEN n_cand_grams > 0
            THEN (clipped_matches * 1000000) // n_cand_grams END AS precision_f6,
       CASE WHEN n_ref_grams > 0
            THEN (clipped_matches * 1000000) // n_ref_grams END AS recall_f6
FROM counted
"""


def script_mix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    mixed_min_chars: int = 3,
) -> DataFrame:
    """Per-document writing-script profile — the multilingual-curation
    and mojibake/spam signal ("is this document one script, a legitimate
    bilingual mix, or encoding garbage"): exact codepoint counts per
    script class (latin letters, digits, cyrillic, CJK unified
    ideographs, whitespace, other) plus f6 ratios over total codepoints
    and an ``is_mixed_script`` flag (≥ 2 of {latin, cyrillic, cjk} with
    at least ``mixed_min_chars`` codepoints each — the shape real
    mixed-script spam/mojibake takes).

    Counts are regexp_count over unicode ranges — the Java∩RE2∩PCRE
    dialect shared with the oracle — so every number is an exact
    integer. Zero shuffles: one narrow projection."""
    df = ensure_parallelism(df)
    t = F.col(text_col)
    total = F.length(t).cast("long")

    def cnt(pattern: str) -> Column:
        return F.regexp_count(t, F.lit(pattern)).cast("long")

    n_latin = cnt("[A-Za-z]")
    n_digit = cnt("[0-9]")
    n_cyr = cnt("[Ѐ-ӿ]")
    n_cjk = cnt("[一-鿿]")
    n_ws = cnt(r"\s")

    def f6(num: Column) -> Column:
        return F.when(
            total > 0, F.floor(num * F.lit(1_000_000) / total)
        ).cast("long")

    m = F.lit(int(mixed_min_chars))
    n_scripts = (
        (n_latin >= m).cast("int") + (n_cyr >= m).cast("int") + (n_cjk >= m).cast("int")
    )
    return df.select(
        F.col(id_col),
        total.alias("n_chars"),
        n_latin.alias("n_latin"),
        n_digit.alias("n_digit"),
        n_cyr.alias("n_cyrillic"),
        n_cjk.alias("n_cjk"),
        n_ws.alias("n_ws"),
        (total - n_latin - n_digit - n_cyr - n_cjk - n_ws).alias("n_other"),
        f6(n_latin).alias("latin_ratio_f6"),
        f6(n_cyr).alias("cyrillic_ratio_f6"),
        f6(n_cjk).alias("cjk_ratio_f6"),
        F.coalesce(n_scripts >= 2, F.lit(False)).alias("is_mixed_script"),
    )


def script_mix_oracle_sql(
    rows_sql: str, id_col: str, mixed_min_chars: int = 3
) -> str:
    """DuckDB replica of :func:`script_mix`. ``rows_sql`` yields
    (id, text)."""
    def cnt(pattern: str) -> str:
        return f"len(regexp_extract_all(text, '{pattern}'))"

    lat, dig = cnt("[A-Za-z]"), cnt("[0-9]")
    cyr = cnt("[\u0400-\u04ff]")
    cjk = cnt("[\u4e00-\u9fff]")
    ws = cnt("\\s")
    m = int(mixed_min_chars)
    return f"""
WITH c AS (
    SELECT {id_col} AS id, len(text) AS n_chars,
           {lat} AS n_latin, {dig} AS n_digit,
           {cyr} AS n_cyrillic, {cjk} AS n_cjk, {ws} AS n_ws
    FROM ({rows_sql})
)
SELECT id AS {id_col},
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_latin AS BIGINT) AS n_latin,
       CAST(n_digit AS BIGINT) AS n_digit,
       CAST(n_cyrillic AS BIGINT) AS n_cyrillic,
       CAST(n_cjk AS BIGINT) AS n_cjk,
       CAST(n_ws AS BIGINT) AS n_ws,
       CAST(n_chars - n_latin - n_digit - n_cyrillic - n_cjk - n_ws
            AS BIGINT) AS n_other,
       CASE WHEN n_chars > 0
            THEN (n_latin * 1000000) // n_chars END AS latin_ratio_f6,
       CASE WHEN n_chars > 0
            THEN (n_cyrillic * 1000000) // n_chars END AS cyrillic_ratio_f6,
       CASE WHEN n_chars > 0
            THEN (n_cjk * 1000000) // n_chars END AS cjk_ratio_f6,
       coalesce(CAST(n_latin >= {m} AS INT) + CAST(n_cyrillic >= {m} AS INT)
                + CAST(n_cjk >= {m} AS INT) >= 2, FALSE) AS is_mixed_script
FROM c
"""


def vocab_drift_terms(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str,
    top_k: int = 50,
    min_count: int = 5,
) -> DataFrame:
    """Vocabulary drift between two corpus snapshots (crawl N vs crawl
    N+1, source A vs source B) — "which terms exploded or vanished":
    per word, document-independent token counts in each snapshot and the
    add-one-smoothed rate ratio

        rr_f6 = floor( 1e6 · (count_a + 1)·(total_b + V)
                             / ((count_b + 1)·(total_a + V)) )

    (V = joint vocabulary size — Laplace smoothing on the per-snapshot
    unigram rates, so the ratio compares RATES, not raw counts, and is
    finite for words absent from one side). Log-free by the module's
    discipline: rr is a monotone transform of the log-odds score, so
    rankings match, and every emitted number is an exact integer. Emits
    the ``top_k`` most A-skewed and ``top_k`` most B-skewed words with
    ``direction`` ('a' | 'b'), ties broken by word for determinism.

    Plan shape at 100 TB: one explode + ONE groupBy(word) with map-side
    partial agg (shuffle = distinct words), a 2-row totals broadcast,
    and two TakeOrderedAndProject top-ks — zero global sorts."""
    df_a = ensure_parallelism(df_a)
    df_b = ensure_parallelism(df_b)
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")

    def counts(df: DataFrame, name: str) -> DataFrame:
        toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        return (
            df.filter(F.trim(F.col(text_col)) != "")
            .select(F.explode(toks).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word")
            .agg(F.count(F.lit(1)).cast("long").alias(name))
        )
    ca = counts(df_a, "count_a")
    cb = counts(df_b, "count_b")
    joined = ca.join(cb, "word", "full_outer").select(
        "word",
        F.coalesce("count_a", F.lit(0)).alias("count_a"),
        F.coalesce("count_b", F.lit(0)).alias("count_b"),
    ).filter((F.col("count_a") + F.col("count_b")) >= F.lit(int(min_count)))
    totals = joined.agg(
        F.sum("count_a").alias("__ta"),
        F.sum("count_b").alias("__tb"),
        F.count(F.lit(1)).alias("__v"),
    )
    scored = (
        joined.crossJoin(F.broadcast(totals))
        .select(
            "word",
            "count_a",
            "count_b",
            # exact integer floor division via `div` — plain decimal `/`
            # ROUNDS to the result scale before floor() sees it (2.9999995
            # would floor to 3), and a double division loses bits past 2^53
            (
                (F.col("count_a") + 1).cast("decimal(38,0)")
                * (F.col("__tb") + F.col("__v")).cast("decimal(38,0)")
                * F.lit(1_000_000)
            ).alias("__num"),
            (
                (F.col("count_b") + 1).cast("decimal(38,0)")
                * (F.col("__ta") + F.col("__v")).cast("decimal(38,0)")
            ).alias("__den"),
        )
        .select(
            "word",
            "count_a",
            "count_b",
            F.expr("__num div __den").cast("long").alias("rr_f6"),
        )
    )
    top_a = (
        scored.orderBy(F.col("rr_f6").desc(), F.col("word").asc())
        .limit(top_k)
        .withColumn("direction", F.lit("a"))
    )
    top_b = (
        scored.orderBy(F.col("rr_f6").asc(), F.col("word").asc())
        .limit(top_k)
        .withColumn("direction", F.lit("b"))
    )
    return top_a.unionByName(top_b)


def vocab_drift_terms_oracle_sql(
    rows_a: str, rows_b: str, top_k: int = 50, min_count: int = 5
) -> str:
    """DuckDB replica of :func:`vocab_drift_terms`. ``rows_a``/``rows_b``
    each yield (text)."""

    def counts(rows: str, name: str) -> str:
        return f"""
        SELECT word, CAST(count(*) AS BIGINT) AS {name}
        FROM (
            SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
            FROM ({rows}) WHERE trim(text) != ''
        ) WHERE word != '' GROUP BY word"""

    return f"""
WITH ca AS ({counts(rows_a, 'count_a')}), cb AS ({counts(rows_b, 'count_b')}),
j AS (
    SELECT coalesce(ca.word, cb.word) AS word,
           coalesce(count_a, 0) AS count_a, coalesce(count_b, 0) AS count_b
    FROM ca FULL OUTER JOIN cb ON ca.word = cb.word
    WHERE coalesce(count_a, 0) + coalesce(count_b, 0) >= {int(min_count)}
), t AS (
    SELECT sum(count_a) AS ta, sum(count_b) AS tb, count(*) AS v FROM j
), scored AS (
    SELECT word, count_a, count_b,
           CAST(CAST(count_a + 1 AS HUGEINT) * (tb + v) * 1000000
                // (CAST(count_b + 1 AS HUGEINT) * (ta + v)) AS BIGINT)
               AS rr_f6
    FROM j, t
)
SELECT * FROM (
    SELECT word, count_a, count_b, rr_f6, 'a' AS direction
    FROM scored ORDER BY rr_f6 DESC, word ASC LIMIT {int(top_k)}
)
UNION ALL
SELECT * FROM (
    SELECT word, count_a, count_b, rr_f6, 'b' AS direction
    FROM scored ORDER BY rr_f6 ASC, word ASC LIMIT {int(top_k)}
)
"""


def kneser_ney_stats(
    df: DataFrame,
    text_col: str,
    min_count: int = 1,
) -> DataFrame:
    """Corpus-wide Kneser-Ney bigram statistics — the exact integer
    counts an interpolated-KN language model (Kneser & Ney 1995; Chen &
    Goodman 1999's benchmark smoothing) is trained from, per word:

        c_unigram     raw occurrence count
        n_left_types  N1+(·w): distinct left neighbors — KN's
                      continuation count, the famous "San Francisco"
                      correction (frequent but predictable words get
                      LOW continuation mass)
        n_right_types N1+(w·): distinct right continuations — the
                      normalizer of the backoff weight λ(w)

    Everything is a count of strings — no probabilities, no floats; the
    caller assembles P_KN at the edge (discounts are rationals over
    these integers). Σ n_left_types over all words = the corpus's bigram
    type count, the unigram-level denominator. Tokenization matches the
    module's other operators (lowercase, whitespace-normalized); empty
    tokens are dropped, words with c_unigram < min_count are filtered
    AFTER counting (counts stay corpus-true).

    Plan shape at 100 TB: one token explode and one bigram explode, then
    count/distinct aggregations keyed on the word — partial-aggregated
    groupBys, two outer joins of word-keyed tables (skew bounded by stop
    words, the same hot keys every corpus groupBy here carries; AQE skew
    handling applies). No windows, no self-joins, nothing driver-side.
    """
    df = ensure_parallelism(df)
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "
    )
    base = df.select(toks.alias("__tk"))
    tk = F.col("__tk")
    uni = (
        base.select(F.explode(tk).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_unigram"))
    )
    pairs = (
        base.filter(F.size(tk) >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(tk) - 1),
                    lambda i: F.struct(
                        F.try_element_at(tk, i).alias("p"),
                        F.try_element_at(tk, i + 1).alias("w"),
                    ),
                )
            ).alias("bg")
        )
        .select(F.col("bg.p").alias("p"), F.col("bg.w").alias("w"))
        .filter((F.col("p") != "") & (F.col("w") != ""))
        .distinct()
    )
    left = pairs.groupBy("w").agg(F.count(F.lit(1)).alias("n_left_types"))
    right = (
        pairs.groupBy("p")
        .agg(F.count(F.lit(1)).alias("n_right_types"))
        .withColumnRenamed("p", "w")
    )
    return (
        uni.join(left, "w", "left")
        .join(right, "w", "left")
        .select(
            F.col("w").alias("word"),
            F.col("c_unigram").cast("long").alias("c_unigram"),
            F.coalesce("n_left_types", F.lit(0)).cast("long").alias("n_left_types"),
            F.coalesce("n_right_types", F.lit(0)).cast("long").alias("n_right_types"),
        )
        .filter(F.col("c_unigram") >= min_count)
    )


def kneser_ney_stats_oracle_sql(
    table: str, text_col: str, min_count: int = 1
) -> str:
    """DuckDB replica of :func:`kneser_ney_stats`: same tokenization
    (lower, trim, split on whitespace runs, empty tokens dropped), same
    distinct-neighbor counts."""
    return f"""
WITH docs AS (
    SELECT list_filter(
             string_split_regex(lower(trim({text_col})), '\\s+'),
             t -> t <> '') AS tk
    FROM {table}
), uni AS (
    SELECT w, count(*) AS c_unigram
    FROM (SELECT unnest(tk) AS w FROM docs) GROUP BY w
), pairs AS (
    SELECT DISTINCT tk[i] AS p, tk[i + 1] AS w
    FROM docs, unnest(range(1, len(tk))) AS u(i)
    WHERE len(tk) >= 2
), lft AS (
    SELECT w, count(*) AS n_left_types FROM pairs GROUP BY w
), rgt AS (
    SELECT p AS w, count(*) AS n_right_types FROM pairs GROUP BY p
)
SELECT uni.w AS word,
       CAST(uni.c_unigram AS BIGINT) AS c_unigram,
       CAST(coalesce(lft.n_left_types, 0) AS BIGINT) AS n_left_types,
       CAST(coalesce(rgt.n_right_types, 0) AS BIGINT) AS n_right_types
FROM uni
LEFT JOIN lft ON uni.w = lft.w
LEFT JOIN rgt ON uni.w = rgt.w
WHERE uni.c_unigram >= {min_count}
"""


def rouge_l_scores(
    df: DataFrame,
    id_col: str,
    cand_col: str,
    ref_col: str,
) -> DataFrame:
    """ROUGE-L per row (Lin 2004): longest-common-subsequence length
    between candidate and reference token streams, with precision/recall
    as exact f6 fixed-point ratios — the order-sensitive complement to
    :func:`ngram_overlap_scores` (BLEU/ROUGE-n count matches anywhere;
    LCS rewards preserved ordering, the summary-eval standard).

    LCS runs bit-parallel (Allison & Dix 1986 as revisited by Hyyrö:
    per row, a position bitmask per distinct reference token, then one
    ``V = (V + (V & M)) | (V − (V & M))`` carry-propagation step per
    candidate token; LCS = zeros left in V) — O(cand · ref/word-size)
    per row on arbitrary-precision ints, validated against the O(n·m)
    DP on 3000 random cases plus hypothesis in tests. Tokenization
    matches the module's whitespace discipline.

    Plan shape at 100 TB: ZERO shuffles — tokenize JVM-side, ONE
    Arrow-batched pandas pass for the integer LCS, ratios back
    JVM-side. Python is unavoidable here (Catalyst has no LCS and the
    interpreted higher-order DP would be quadratic per row — the exact
    trap ngram_overlap_scores' plan note documents); bit-parallel keeps
    the per-row cost near-linear.
    """
    df = ensure_parallelism(df)
    import pandas as pd

    def tok(c: str) -> Column:
        return F.split(
            F.trim(F.regexp_replace(F.lower(F.col(c)), r"\s+", " ")), " "
        )

    def _lcs_fn(cand, ref):
        out = []
        for a, b in zip(cand, ref):
            if a is None or b is None or len(a) == 0 or len(b) == 0:
                out.append(0)
                continue
            m = len(b)
            pm: dict = {}
            for i, c in enumerate(b):
                pm[c] = pm.get(c, 0) | (1 << i)
            full = (1 << m) - 1
            v = full
            for c in a:
                u = v & pm.get(c, 0)
                v = ((v + u) | (v - u)) & full
            out.append(m - bin(v).count("1"))
        return pd.Series(out, dtype="int64")

    _lcs = F.pandas_udf(_lcs_fn, "long")

    base = df.select(
        F.col(id_col),
        tok(cand_col).alias("__tc"),
        tok(ref_col).alias("__tr"),
    ).select(
        id_col,
        F.size("__tc").cast("long").alias("n_cand_tokens"),
        F.size("__tr").cast("long").alias("n_ref_tokens"),
        _lcs("__tc", "__tr").alias("lcs_len"),
    )
    return base.select(
        id_col,
        "n_cand_tokens",
        "n_ref_tokens",
        "lcs_len",
        F.expr(
            "CAST(CASE WHEN n_cand_tokens > 0 THEN"
            " (lcs_len * 1000000) div n_cand_tokens ELSE NULL END AS BIGINT)"
        ).alias("rouge_l_precision_f6"),
        F.expr(
            "CAST(CASE WHEN n_ref_tokens > 0 THEN"
            " (lcs_len * 1000000) div n_ref_tokens ELSE NULL END AS BIGINT)"
        ).alias("rouge_l_recall_f6"),
    )


_ANOMALY_CHARS = {
    # counted one replace() each — cheap, exact, and regex-free so the
    # two engines cannot diverge on regex dialect
    "repl_chars": "�",   # U+FFFD replacement char: decode damage
    "nbsp_chars": " ",   # NBSP: copy-paste / HTML extraction residue
    "zwsp_chars": "​",   # zero-width space: invisible token splitter
}

# C0 control chars except \t \n \r — one regex class, identical in Java
# regex and RE2 (plain ranges, no dialect-specific syntax)
_CTRL_CLASS = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"


def encoding_anomaly_census(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Encoding-anomaly census per corpus slice — the mojibake screen a
    text pipeline runs on every new source before tokenization:
    replacement characters (U+FFFD) mean an upstream decoder already
    destroyed bytes, stray C0 control characters mean binary bleed,
    NBSP/zero-width characters silently split or glue tokens. Counts
    are exact per group:

        (group, n_docs, n_docs_bad, repl_chars, ctrl_chars,
         nbsp_chars, zwsp_chars, bad_ppm)

    n_docs_bad = docs containing ANY counted anomaly; bad_ppm =
    (n_docs_bad · 1e6) div n_docs, truncating. NULL texts count toward
    n_docs only (nothing to scan — they are a different DQ problem,
    `profile.null_patterns`' territory).

    Per-char counts use length(t) − length(replace(t, ch)) — scalar
    string ops, no regex; the control-char class is the one regex, a
    plain range class with identical semantics in Java regex and RE2.

    Plan shape: one narrow expression pass + ONE groupBy(group) with
    map-side partial agg — no joins, no windows, no Python.
    """
    df = ensure_parallelism(df)
    t = F.col(text_col)
    counts = {
        name: F.when(
            t.isNotNull(), F.length(t) - F.length(F.replace(t, F.lit(ch)))
        ).otherwise(F.lit(0))
        for name, ch in _ANOMALY_CHARS.items()
    }
    counts["ctrl_chars"] = F.when(
        t.isNotNull(),
        F.length(t) - F.length(F.regexp_replace(t, _CTRL_CLASS, "")),
    ).otherwise(F.lit(0))
    per_row = df.select(
        F.col(group_col).alias("grp"),
        *[c.cast("long").alias(n) for n, c in counts.items()],
    )
    any_bad = (
        (F.col("repl_chars") + F.col("ctrl_chars") + F.col("nbsp_chars") + F.col("zwsp_chars"))
        > 0
    )
    agg = per_row.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(any_bad.cast("long")).cast("long").alias("n_docs_bad"),
        *[
            F.sum(n).cast("long").alias(n)
            for n in ("repl_chars", "ctrl_chars", "nbsp_chars", "zwsp_chars")
        ],
    )
    return agg.select(
        F.col("grp").alias(group_col),
        "n_docs",
        "n_docs_bad",
        "repl_chars",
        "ctrl_chars",
        "nbsp_chars",
        "zwsp_chars",
        F.expr("CAST((n_docs_bad * 1000000) div n_docs AS BIGINT)").alias(
            "bad_ppm"
        ),
    )


def encoding_anomaly_census_oracle_sql(
    rows_sql: str, group_out: str = "source"
) -> str:
    """DuckDB replica of :func:`encoding_anomaly_census`. ``rows_sql``
    yields (grp, text). Identical replace()/regexp class, identical
    truncating division."""
    per = []
    for name, ch in _ANOMALY_CHARS.items():
        esc = f"chr({ord(ch)})"
        per.append(
            f"CASE WHEN text IS NOT NULL THEN"
            f" length(text) - length(replace(text, {esc}, ''))"
            f" ELSE 0 END AS {name}"
        )
    per.append(
        "CASE WHEN text IS NOT NULL THEN length(text)"
        f" - length(regexp_replace(text, '{_CTRL_CLASS}', '', 'g'))"
        " ELSE 0 END AS ctrl_chars"
    )
    cols = ",\n           ".join(per)
    return f"""
WITH per_row AS (
    SELECT grp,
           {cols}
    FROM ({rows_sql})
), agg AS (
    SELECT grp,
           count(*) AS n_docs,
           sum(CASE WHEN repl_chars + ctrl_chars + nbsp_chars + zwsp_chars > 0
                    THEN 1 ELSE 0 END) AS n_docs_bad,
           sum(repl_chars) AS repl_chars,
           sum(ctrl_chars) AS ctrl_chars,
           sum(nbsp_chars) AS nbsp_chars,
           sum(zwsp_chars) AS zwsp_chars
    FROM per_row GROUP BY grp
)
SELECT grp AS {group_out},
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_docs_bad AS BIGINT) AS n_docs_bad,
       CAST(repl_chars AS BIGINT) AS repl_chars,
       CAST(ctrl_chars AS BIGINT) AS ctrl_chars,
       CAST(nbsp_chars AS BIGINT) AS nbsp_chars,
       CAST(zwsp_chars AS BIGINT) AS zwsp_chars,
       CAST((n_docs_bad * 1000000) // n_docs AS BIGINT) AS bad_ppm
FROM agg
"""
