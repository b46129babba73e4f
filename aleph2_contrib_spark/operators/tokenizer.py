"""Tokenizer training over a distributed corpus (BPE).

The 100 TB architecture rests on one observation: BPE merge learning
never needs the corpus — it needs the WORD HISTOGRAM, which is tiny
(vocabulary-sized) no matter how large the corpus is. So the corpus-
scale work is exactly one distributed aggregate (word → count, map-side
combined), the iterative merge learning runs driver-side on that
histogram (bounded, fail-fast), and applying the tokenizer is again
corpus-side-cheap: segmentation is computed ONCE PER DISTINCT WORD (an
Arrow-batched pandas UDF over the dictionary, not the corpus) and
broadcast-joined back to the token stream. Python cost is O(|vocab| ·
merges); the 100 TB of text only ever flows through JVM-side Column
programs and one hash join against a broadcast dictionary.

Mirrors the reference's enrichment-module "train a model, apply it to
every record" lifecycle (EnrichmentPipelineService batch modules), but
with the train/apply split made explicit so the heavy side stays
declarative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# End-of-word marker, as in the original BPE-for-NMT formulation
# (Sennrich et al. 2016): lets the tokenizer distinguish word-final
# subwords ("est</w>") from word-internal ones ("est").
EOW = "</w>"

_WORD_MAX_VOCAB_DEFAULT = 1_000_000


def word_histogram(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Distributed word histogram: lowercase, split on non-alphanumerics,
    drop empties, count. One groupBy with map-side partial aggregation —
    the ONLY corpus-scale stage of tokenizer training. Returns
    (word, n) with n >= min_count."""
    words = df.select(
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), lambda t: t != "")
        ).alias("word")
    )
    out = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    if min_count > 1:
        out = out.filter(F.col("n") >= min_count)
    return out


def bpe_learn(
    word_hist: DataFrame,
    num_merges: int,
    min_pair_count: int = 2,
    max_vocab_rows: int = _WORD_MAX_VOCAB_DEFAULT,
) -> list[tuple[str, str]]:
    """Learn BPE merges from a word histogram (driver-side; the input is
    vocabulary-sized by construction, never corpus-sized).

    Classic greedy BPE (Sennrich et al. 2016): every word starts as its
    character sequence plus the ``</w>`` marker; each round merges the
    most frequent adjacent symbol pair. Tie-break is deterministic —
    highest count, then lexicographically smallest pair — so the learned
    vocabulary is reproducible across runs and engines. Stops early when
    no pair reaches ``min_pair_count``.

    The histogram collect is capped at ``max_vocab_rows`` (counted
    first): above the cap this fails fast with a pointer to
    ``word_histogram(min_count=...)`` — raising the count floor is the
    production remedy, and it shrinks the histogram geometrically.

    Implementation keeps an inverted index pair → words containing it,
    so each merge touches only the affected words: O(touched) per round,
    not O(vocab).
    """
    n_rows = word_hist.count()
    if n_rows > max_vocab_rows:
        raise ValueError(
            f"bpe_learn: word histogram has {n_rows} rows > max_vocab_rows="
            f"{max_vocab_rows}. Raise word_histogram(min_count=...) to shrink "
            f"the dictionary (count floors shrink it geometrically), or raise "
            f"max_vocab_rows if the driver has headroom."
        )
    rows = word_hist.collect()

    # word index -> (symbol tuple, count)
    seqs: list[list[str]] = []
    counts: list[int] = []
    for r in rows:
        seqs.append(list(r["word"]) + [EOW])
        counts.append(int(r["n"]))

    # pair -> total count, pair -> set of word indexes containing it
    pair_count: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}

    def _add_word_pairs(wi: int, sign: int) -> None:
        s, c = seqs[wi], counts[wi]
        for a, b in zip(s, s[1:]):
            p = (a, b)
            pair_count[p] = pair_count.get(p, 0) + sign * c
            if sign > 0:
                pair_words.setdefault(p, set()).add(wi)

    for wi in range(len(seqs)):
        _add_word_pairs(wi, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best: tuple[str, str] | None = None
        best_n = min_pair_count - 1
        for p, n in pair_count.items():
            if n > best_n or (n == best_n and best is not None and p < best):
                best, best_n = p, n
        if best is None:
            break
        merges.append(best)
        merged = best[0] + best[1]
        touched = list(pair_words.get(best, ()))
        for wi in touched:
            _add_word_pairs(wi, -1)  # retract old pair counts for this word
            s = seqs[wi]
            out: list[str] = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == best[0] and s[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[wi] = out
            _add_word_pairs(wi, +1)
        # drop zero/negative entries so the argmax scan stays tight
        pair_count = {p: n for p, n in pair_count.items() if n > 0}
        pair_words = {p: ws for p, ws in pair_words.items() if p in pair_count}
    return merges


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word: repeatedly merge the lowest-rank
    adjacent pair (exact BPE inference). Pure function, shared by the
    pandas UDF and the tests."""
    s = list(word) + [EOW]
    while len(s) > 1:
        best_i, best_rank = -1, None
        for i in range(len(s) - 1):
            r = ranks.get((s[i], s[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_i, best_rank = i, r
        if best_rank is None:
            break
        s[best_i : best_i + 2] = [s[best_i] + s[best_i + 1]]
    return s


def bpe_segment_words(
    words_df: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
) -> DataFrame:
    """Segment each DISTINCT word with the learned merges. The input is
    the dictionary (vocabulary-sized), so the Python cost of the pandas
    UDF is O(|vocab|), never O(corpus). Returns (word, pieces)."""
    import pandas as pd

    ranks = {p: i for i, p in enumerate(merges)}

    def _seg(words):
        return pd.Series([segment_word(w, ranks) for w in words])

    seg = F.pandas_udf(_seg, "array<string>")

    return words_df.select(
        F.col(word_col).alias("word"), seg(F.col(word_col)).alias("pieces")
    )


def bpe_tokenize(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize a corpus with a learned BPE vocabulary. The corpus-side
    plan is JVM-only: explode words (narrow), derive the distinct-word
    dictionary, segment THE DICTIONARY with the pandas UDF, then
    broadcast-hash-join pieces back onto the word stream and aggregate
    per document. Returns (id, n_words, n_pieces) — n_pieces is the
    training-token count under this vocabulary, the number every
    token-budget mixing/packing stage downstream consumes.

    The broadcast is the dictionary with its piece arrays; like the
    similarity module's capped broadcasts, corpora whose dictionary
    exceeds broadcast limits should raise word_histogram(min_count=...)
    upstream — unknown words still segment (down to characters) because
    segmentation happens per distinct word, not from a closed table.
    """
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), lambda t: t != "")
        ).alias("word"),
    )
    dictionary = bpe_segment_words(words.select("word").distinct(), merges)
    return (
        words.join(F.broadcast(dictionary), "word")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_words"),
            F.sum(F.size("pieces")).cast("long").alias("n_pieces"),
        )
        .withColumnRenamed("id", id_col)
    )


def bpe_vocab_table(
    spark: SparkSession,
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_count: int = 1,
    min_pair_count: int = 2,
) -> DataFrame:
    """End-to-end train: histogram → learn → merge table
    (rank, left, right, merged). Deterministic for a given corpus."""
    merges = bpe_learn(
        word_histogram(df, text_col, min_count=min_count),
        num_merges,
        min_pair_count=min_pair_count,
    )
    return spark.createDataFrame(
        [(i, a, b, a + b) for i, (a, b) in enumerate(merges)],
        T.StructType(
            [
                T.StructField("rank", T.IntegerType(), False),
                T.StructField("left", T.StringType(), False),
                T.StructField("right", T.StringType(), False),
                T.StructField("merged", T.StringType(), False),
            ]
        ),
    )
