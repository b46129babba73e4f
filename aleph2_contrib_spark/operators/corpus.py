"""Corpus-preparation operators for LLM training-data pipelines.

These go beyond the reference's §2 inventory (which stops at generic
analytics): deterministic sampling/mixing, benchmark-contamination
detection, concat-and-chop sequence packing, within-document repetition
scoring, and rule-based PII redaction — the operations a 100 TB
pretraining-data pipeline runs between raw crawl and tokenizer.

Scale notes (the part that matters at 1000 executors):

- Sampling/mixing/repetition/PII are NARROW passes — pure Catalyst column
  expressions, zero shuffle, full codegen. They compose with any scan.
- Contamination joins on a 64-bit md5-derived n-gram key, so only 8-byte
  keys (not the n-gram strings) cross the shuffle; the benchmark side of
  the join is a distinct-gram set that is broadcast when small (the usual
  case: eval sets are MBs, the corpus is TBs).
- Sequence packing needs a GLOBAL exclusive prefix sum over token counts.
  A naive single-partition window is a scale-killer; this implementation
  uses the classic two-phase scan: range-partition by id, per-partition
  window cumsum, then a driver-side prefix over the (num_partitions)-row
  partition totals broadcast back. Output is identical regardless of
  partition boundaries, so it stays differential-testable.

Determinism: every random choice is an md5 hash of (seed, id) — the same
row always makes the same decision on any engine, which is what makes
train-set reproducibility (and the DuckDB oracles) possible.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# deterministic hash sampling / source mixing
# --------------------------------------------------------------------------

_HASH_SPACE = float(1 << 32)


def md5_unit(col: Column, seed: str = "0") -> Column:
    """Deterministic uniform [0,1) draw from md5(seed:value) — the first 8
    hex digits as a 32-bit integer. Identical in any engine with md5."""
    h = F.md5(F.concat_ws(":", F.lit(seed), col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(_HASH_SPACE)


def hash_sample(df: DataFrame, id_col: str, rate: float, seed: str = "0") -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows keyed by ``id_col``.

    Unlike ``df.sample()`` this is stable across runs, partitionings, and
    engines — the property training-data pipelines need so a re-run of the
    pipeline reproduces the exact train set. Narrow, zero-shuffle."""
    return df.filter(md5_unit(F.col(id_col), seed) < F.lit(float(rate)))


def mix_sources(
    df: DataFrame,
    source_col: str,
    rates: dict[str, float],
    id_col: str,
    seed: str = "0",
    default_rate: float = 0.0,
) -> DataFrame:
    """Weighted data mixing: per-source deterministic sampling rates (the
    "data mixture" step of a pretraining pipeline — e.g. wiki×2 oversample
    is rate 1.0 plus a duplicated pass, web×0.3 is rate 0.3). Sources not
    listed get ``default_rate``. Single narrow pass."""
    rate_col: Column = F.lit(float(default_rate))
    for src, r in sorted(rates.items()):
        rate_col = F.when(F.col(source_col) == src, F.lit(float(r))).otherwise(rate_col)
    return df.filter(md5_unit(F.col(id_col), seed) < rate_col)


# --------------------------------------------------------------------------
# token n-grams (shared by contamination + repetition)
# --------------------------------------------------------------------------


def word_ngrams(col: Column, n: int) -> Column:
    """Word n-grams of lowercased whitespace-tokenized text
    (array<string>; empty array when the text has fewer than n tokens).

    Grams are built with n unrolled O(1) element_at lookups per position —
    NOT slice() per position, which is O(tokens) each and turns the pass
    quadratic in document length (10× wall-clock on long documents). The
    token array is bound once through a single-element transform() lambda:
    referencing the split() expression directly inside the per-gram lambda
    would re-evaluate the tokenization per lookup (subexpression
    elimination does not reach inside higher-order functions)."""
    toks = F.split(F.lower(F.trim(col)), r"\s+")

    def _grams(t: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, i + j + 1) for j in range(n)]
            ),
        )

    return F.when(
        (F.trim(col) != "") & (F.size(toks) >= n),
        F.element_at(F.transform(F.array(toks), _grams), 1),
    ).otherwise(F.array().cast("array<string>"))


def _gram_key64(gram: Column) -> Column:
    """64-bit join key for an n-gram: first 16 md5 hex digits. Collision
    odds ~2^-64 per pair; 8 bytes crosses the shuffle instead of the gram
    string. md5 (not xxhash64) so external engines can reproduce it."""
    return F.conv(F.substring(F.md5(gram), 1, 16), 16, 10).cast("decimal(20,0)")


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    corpus_id: str = "doc_id",
    corpus_text: str = "text",
    bench_text: str = "text",
    n: int = 8,
) -> DataFrame:
    """Train/eval contamination: corpus documents sharing any word n-gram
    with the benchmark set, with overlap counts.

    Returns (doc_id, n_hit_grams, n_doc_grams, hit_ratio_f6) for
    contaminated docs only. The benchmark's distinct-gram set is tiny next
    to the corpus, so Catalyst broadcasts it — the corpus side never
    shuffles. Matching is on a 64-bit md5 gram key (see _gram_key64)."""
    doc_grams = corpus.select(
        F.col(corpus_id).alias("doc_id"),
        F.explode(F.array_distinct(word_ngrams(F.col(corpus_text), n))).alias("gram"),
    ).select("doc_id", _gram_key64(F.col("gram")).alias("gk"))
    bench_grams = (
        benchmark.select(F.explode(F.array_distinct(word_ngrams(F.col(bench_text), n))).alias("gram"))
        .select(_gram_key64(F.col("gram")).alias("gk"))
        .distinct()
    )
    totals = corpus.select(
        F.col(corpus_id).alias("doc_id"),
        F.size(F.array_distinct(word_ngrams(F.col(corpus_text), n))).cast("long").alias("n_doc_grams"),
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gk")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit_grams"))
    )
    return hits.join(totals, "doc_id").select(
        "doc_id",
        "n_hit_grams",
        "n_doc_grams",
        F.floor(F.col("n_hit_grams") / F.col("n_doc_grams") * 1e6).cast("long").alias("hit_ratio_f6"),
    )


def repetition_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """Within-document repetition (quality signal): fraction of n-gram
    occurrences that are duplicates of an earlier occurrence. 0 = no
    repetition, →1 = the document is one phrase looping. Narrow pass.

    The gram array and the two counts are bound behind their own
    projections (the bind-once discipline, see rolling_hash_fingerprints):
    referenced inline, CollapseProject would splice the split+transform
    n-gram chain into every consumer — ~4 redundant evaluations per row,
    measured ~3x the scan cost at 50k docs."""
    grams = word_ngrams(F.col(text_col), n)
    counted = df.select(F.col(id_col).alias("doc_id"), grams.alias("__g")).select(
        "doc_id",
        F.size(F.col("__g")).cast("long").alias("n_grams"),
        F.size(F.array_distinct(F.col("__g"))).cast("long").alias("n_distinct"),
    )
    total, distinct = F.col("n_grams"), F.col("n_distinct")
    return counted.select(
        "doc_id",
        "n_grams",
        "n_distinct",
        F.when(total > 0, F.floor((total - distinct) / total * 1e6).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        .alias("rep_ratio_f6"),
    )


# --------------------------------------------------------------------------
# sequence packing (concat-and-chop)
# --------------------------------------------------------------------------


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col: str,
    max_len: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign documents to fixed-length training sequences by the standard
    concat-and-chop rule: documents are laid end-to-end in ``id_col``
    order and the stream is chopped every ``max_len`` tokens, so a doc may
    span packs (exactly what pretraining dataloaders do).

    Emits (id, tok_len, cum_before, first_pack, last_pack, pack_offset):
    first/last pack index the doc lands in and its offset inside the first
    pack. Rows with non-positive length are dropped.

    Scale: the global exclusive prefix sum uses a two-phase scan —
    range-partition on id, per-partition window cumsum, driver prefix over
    the per-partition totals (num_partitions rows, trivially small),
    broadcast join back. No single-partition window anywhere; output is
    independent of partition boundaries."""
    spark = df.sparkSession
    nparts = num_partitions or spark.sparkContext.defaultParallelism
    d = (
        df.select(F.col(id_col).alias("id"), F.col(len_col).cast("long").alias("tok_len"))
        .filter(F.col("tok_len") > 0)
        .repartitionByRange(nparts, "id")
        .withColumn("__pid", F.spark_partition_id())
    )
    w = Window.partitionBy("__pid").orderBy("id")
    d = d.withColumn("__local_cum", F.sum("tok_len").over(w) - F.col("tok_len"))

    # Eager localCheckpoint BEFORE the totals action: the per-partition
    # offsets below are keyed by __pid, and RangePartitioner boundaries
    # come from sampling that can differ between two independent
    # executions of this plan — without a barrier, the final job could
    # land rows in different partitions than the totals job measured,
    # silently corrupting cum_before. localCheckpoint (MEMORY_AND_DISK
    # blocks, lineage CUT) is stronger than persist: a lost block fails
    # the job instead of silently recomputing with re-sampled
    # boundaries. Blocks are reclaimed when the DataFrame is GC'd.
    d = d.localCheckpoint(eager=True)
    totals = d.groupBy("__pid").agg(F.sum("tok_len").alias("__ptot")).collect()
    running, offsets = 0, {}
    for row in sorted(totals, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = running
        running += row["__ptot"]
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "__pid int, __off long"
    )
    L = F.lit(int(max_len))
    return (
        d.join(F.broadcast(off_df), "__pid")
        .withColumn("cum_before", F.col("__local_cum") + F.col("__off"))
        .select(
            "id",
            "tok_len",
            "cum_before",
            F.floor(F.col("cum_before") / L).cast("long").alias("first_pack"),
            F.floor((F.col("cum_before") + F.col("tok_len") - 1) / L).cast("long").alias("last_pack"),
            (F.col("cum_before") % L).cast("long").alias("pack_offset"),
        )
    )


# --------------------------------------------------------------------------
# deterministic global shuffle / stratified sampling
# --------------------------------------------------------------------------


def global_order_index(
    df: DataFrame,
    order_col,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a 0-based dense global index ``idx`` ordered by ``order_col``
    (a column name/Column, or a list of them for composite orderings —
    the combined key must be unique, e.g. via a trailing id tie-break;
    ``F.col(...).desc()`` works), via the same two-phase scan as
    ``pack_sequences``: range-partition, per-partition row_number, driver
    prefix over per-partition counts, broadcast join back. No
    single-partition window; output independent of partition boundaries."""
    spark = df.sparkSession
    nparts = num_partitions or spark.sparkContext.defaultParallelism
    cols = list(order_col) if isinstance(order_col, (list, tuple)) else [order_col]
    if nparts == 1:
        # Single range ⇒ every cross-partition offset is 0: rank within
        # the one coalesced partition directly — no sampling job, no
        # checkpoint, no driver collect. coalesce(1) reports
        # SinglePartition, so the window adds no exchange. Callers pick
        # nparts == 1 only when the table is known-small (e.g.
        # rfm_segments' adaptive sizing); the window stays keyed on
        # __pid, never "no partition defined".
        d = df.coalesce(1).withColumn("__pid", F.spark_partition_id())
        w1 = Window.partitionBy("__pid").orderBy(*cols)
        return (
            d.withColumn("idx", (F.row_number().over(w1) - 1).cast("long"))
            .drop("__pid")
        )
    d = df.repartitionByRange(nparts, *cols).withColumn("__pid", F.spark_partition_id())
    w = Window.partitionBy("__pid").orderBy(*cols)
    d = d.withColumn("__local_idx", F.row_number().over(w) - 1)
    # Eager localCheckpoint before the counts action — same reasoning as
    # pack_sequences: freeze the sampled range partitioning so the
    # offsets keyed by __pid apply to the identical row placement in the
    # final job (lineage cut: a lost block fails instead of silently
    # recomputing with re-sampled boundaries).
    d = d.localCheckpoint(eager=True)
    counts = d.groupBy("__pid").agg(F.count(F.lit(1)).alias("__pn")).collect()
    running, offsets = 0, {}
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = running
        running += row["__pn"]
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "__pid int, __off long"
    )
    return (
        d.join(F.broadcast(off_df), "__pid")
        .withColumn("idx", (F.col("__local_idx") + F.col("__off")).cast("long"))
        .drop("__pid", "__local_idx", "__off")
    )


def deterministic_shuffle(
    df: DataFrame, id_col: str, seed: str = "0", num_shards: int | None = None
) -> DataFrame:
    """Training-order randomization: a reproducible global permutation
    ordered by md5(seed:id), exposed as ``idx`` (global position) and,
    when ``num_shards`` is given, ``shard`` (round-robin over the
    permutation — every shard is an unbiased sample of the corpus).

    Epoch re-shuffles are just a different seed. Scale: the permutation
    key is a narrow projection; ordering uses the two-phase range scan,
    never a global sort into one partition."""
    keyed = df.withColumn("__shufkey", F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))))
    out = global_order_index(keyed, "__shufkey")
    if num_shards is not None:
        out = out.withColumn("shard", (F.col("idx") % num_shards).cast("int"))
    return out.drop("__shufkey")


def stratified_sample(
    df: DataFrame, stratum_col: str, id_col: str, per_stratum: int, seed: str = "0"
) -> DataFrame:
    """Exactly min(per_stratum, |stratum|) rows per stratum, chosen by
    deterministic md5 order — reproducible across runs and engines (the
    "N examples per language/source" eval-set builder). One shuffle on
    the stratum key; the window is partitioned, never global."""
    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string")))
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= per_stratum)
        .drop("__rn")
    )


# --------------------------------------------------------------------------
# PII redaction
# --------------------------------------------------------------------------

# Patterns restricted to syntax with identical semantics in Java regex and
# RE2 (character classes, bounded repeats, \b word boundaries — no
# lookaround), so redaction is reproducible across engines.
PII_PATTERNS: dict[str, str] = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "SSN": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "PHONE": r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b",
    "IPV4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def pii_redact(
    df: DataFrame, text_col: str = "text", patterns: dict[str, str] | None = None
) -> DataFrame:
    """Replace PII spans with <KIND> placeholders and count hits per kind.

    Patterns apply sequentially in dict insertion order (the order IS part
    of the contract — an earlier pattern consumes spans later ones would
    otherwise match, e.g. digits inside an email domain never double-count
    as IPV4). Each ``n_<kind>`` is counted against the text AS ALREADY
    REDACTED by the preceding patterns, so it equals exactly the number of
    ``<KIND>`` tags emitted — counts and tags can never disagree. Adds
    ``redacted`` plus the per-kind counts. Narrow, zero-shuffle, pure
    codegen."""
    pats = patterns or PII_PATTERNS
    out = df
    red = F.col(text_col)
    for kind, pat in pats.items():
        out = out.withColumn(f"n_{kind.lower()}", F.regexp_count(red, F.lit(pat)))
        red = F.regexp_replace(red, pat, f"<{kind}>")
    return out.withColumn("redacted", red)


# --------------------------------------------------------------------------
# rule-based quality filtering (Gopher / C4 heuristics)
# --------------------------------------------------------------------------

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len_f6: int = 3_000_000,
    max_mean_word_len_f6: int = 10_000_000,
    max_symbol_ratio_f6: int = 100_000,
    max_bullet_line_ratio_f6: int = 900_000,
    max_ellipsis_line_ratio_f6: int = 300_000,
    min_alpha_word_ratio_f6: int = 800_000,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Per-document Gopher-style quality-rule flags (Rae et al. 2021 §A1.1,
    plus the C4 terminal-punctuation spirit) — the standard rule battery a
    pretraining pipeline runs before any model-based filter:

    - word count within [min_words, max_words]
    - mean word length within [3, 10] characters
    - symbol-to-word ratio (``#`` and ellipsis) below 0.1
    - < 90% of lines starting with a bullet character
    - <= 30% of lines ending with an ellipsis
    - >= 80% of words containing at least one alphabetic character
    - >= 2 distinct English stop words present (of an 8-word set)

    Emits the measured features (fixed-point ``*_f6`` — floor(1e6·x),
    bit-stable across engines) alongside one boolean per rule and
    ``pass_gopher`` (AND of all). Documents with zero words or zero lines
    fail the dependent rules outright (ratio columns stay NULL) — the
    paper's behavior, where empty documents are always removed.

    Plan shape: a single narrow projection — pure Column expressions over
    higher-order array functions, zero shuffle, whole-stage codegen; at
    100 TB this runs at scan speed and composes with any downstream
    filter's predicate pushdown. Thresholds are integer f6 so no float
    crosses an engine boundary.
    """
    t = F.split(F.trim(F.col(text_col)), r"\s+")
    n_words = F.when(F.trim(F.col(text_col)) == "", F.lit(0)).otherwise(F.size(t))
    lines = F.split(F.col(text_col), r"\n")
    n_lines = F.size(lines)

    def f6_ratio(num: Column, den: Column) -> Column:
        return F.when(den > 0, F.floor(num / den * F.lit(1000000.0)).cast("long"))

    mean_wl = f6_ratio(F.aggregate(t, F.lit(0), lambda a, x: a + F.length(x)), n_words)
    sym = f6_ratio(F.regexp_count(F.col(text_col), F.lit(r"#|\.\.\.|…")), n_words)
    bullet = f6_ratio(
        F.size(F.filter(lines, lambda x: x.rlike(r"^\s*[-*•]"))), n_lines
    )
    ellip = f6_ratio(
        F.size(F.filter(lines, lambda x: x.rlike(r"(\.\.\.|…)\s*$"))), n_lines
    )
    alpha = f6_ratio(F.size(F.filter(t, lambda x: x.rlike("[A-Za-z]"))), n_words)
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    stops = F.size(
        F.array_intersect(F.array_distinct(F.transform(t, F.lower)), stop_arr)
    )

    def ok(c: Column) -> Column:
        return F.coalesce(c, F.lit(False))

    d = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len_f6"),
        sym.alias("symbol_ratio_f6"),
        bullet.alias("bullet_line_ratio_f6"),
        ellip.alias("ellipsis_line_ratio_f6"),
        alpha.alias("alpha_word_ratio_f6"),
        stops.alias("n_stopword_hits"),
    )
    d = d.select(
        "*",
        (F.col("n_words").between(min_words, max_words)).alias("r_word_count"),
        ok(
            F.col("mean_word_len_f6").between(
                min_mean_word_len_f6, max_mean_word_len_f6
            )
        ).alias("r_mean_word_len"),
        ok(F.col("symbol_ratio_f6") < max_symbol_ratio_f6).alias("r_symbol_ratio"),
        ok(F.col("bullet_line_ratio_f6") < max_bullet_line_ratio_f6).alias(
            "r_bullet_lines"
        ),
        ok(F.col("ellipsis_line_ratio_f6") <= max_ellipsis_line_ratio_f6).alias(
            "r_ellipsis_lines"
        ),
        ok(F.col("alpha_word_ratio_f6") >= min_alpha_word_ratio_f6).alias(
            "r_alpha_words"
        ),
        (F.col("n_stopword_hits") >= min_stopword_hits).alias("r_stopwords"),
    )
    return d.select(
        "*",
        (
            F.col("r_word_count")
            & F.col("r_mean_word_len")
            & F.col("r_symbol_ratio")
            & F.col("r_bullet_lines")
            & F.col("r_ellipsis_lines")
            & F.col("r_alpha_words")
            & F.col("r_stopwords")
        ).alias("pass_gopher"),
    )


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = 3,
    min_lines_kept: int = 1,
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2): keep only
    lines that end in terminal punctuation (``. ! ? "``), have at least
    ``min_words_per_line`` whitespace words, and don't mention
    "javascript"; drop the whole document if it contains "lorem ipsum" or
    a curly brace (template/boilerplate tell), or if fewer than
    ``min_lines_kept`` lines survive.

    Adds ``cleaned`` (surviving lines re-joined), ``n_lines_kept``,
    ``n_lines_dropped``, and ``keep_doc``. Line filtering REWRITES the
    document (unlike gopher_quality, which only flags) — the two compose:
    C4 line cleanup first, Gopher flags on the cleaned text.

    Pure higher-order Column expressions — zero shuffle, codegen'd, runs
    at scan speed on any partitioning."""
    lines = F.split(F.col(text_col), r"\n")
    kept = F.filter(
        lines,
        lambda x: x.rlike(r'[.!?"]\s*$')
        & (F.size(F.split(F.trim(x), r"\s+")) >= min_words_per_line)
        & ~F.lower(x).contains("javascript"),
    )
    n_kept = F.size(kept)
    return df.select(
        "*",
        F.array_join(kept, "\n").alias("cleaned"),
        n_kept.alias("n_lines_kept"),
        (F.size(lines) - n_kept).alias("n_lines_dropped"),
        (
            ~F.lower(F.col(text_col)).contains("lorem ipsum")
            & ~F.col(text_col).contains("{")
            & (n_kept >= min_lines_kept)
        ).alias("keep_doc"),
    )


def chunk_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int,
    stride: int,
) -> DataFrame:
    """Sliding-window token chunking — the context-window preprocessing
    step of an LLM training pipeline (reference scope: corpus prep beyond
    the Aleph2 operator set, per the pipeline-operator mandate; same
    family as ``pack_sequences``, which packs AFTER a chunker like this
    bounds each piece to the model's window).

    Tokens are lowercased whitespace words (the repo's corpus-wide
    tokenization convention). Chunk ``i`` covers token span
    ``[i*stride, i*stride + chunk_size)``; the number of chunks is
    ``max(1, ceil((n_tokens - chunk_size)/stride) + 1)`` so every token is
    covered, the final chunk may be short, and an empty/short doc still
    yields exactly one chunk. ``stride < chunk_size`` gives overlapping
    chunks (the usual boundary-context trade); ``stride == chunk_size``
    tiles exactly.

    Plan shape: one narrow pass — split, per-row sequence, posexplode,
    slice. No shuffle, no UDF; output row count is sum(n_chunks) and the
    operator runs at scan speed on any partitioning, so it holds at
    100 TB by construction.
    """
    if chunk_size <= 0 or stride <= 0:
        raise ValueError("chunk_size and stride must be positive")
    toks = F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " ")
    n = F.size(toks)
    n_chunks = F.greatest(
        F.lit(1),
        (F.ceil((n - F.lit(chunk_size)) / F.lit(stride)) + 1).cast("int"),
    )
    return (
        df.select(
            F.col(id_col),
            toks.alias("__toks"),
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx", "__i"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.slice(
                F.col("__toks"), F.col("chunk_idx") * stride + 1, chunk_size
            ).alias("__chunk"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.size("__chunk").alias("n_chunk_tokens"),
            F.array_join("__chunk", " ").alias("chunk_text"),
        )
    )


def domain_rollup(
    df: DataFrame,
    source_col: str,
    chars_col: str,
    blocklist: list[str],
    min_mean_chars: int,
) -> DataFrame:
    """Per-domain curation rollup — the source-level quality gate a crawl
    pipeline applies before document-level filters (drop spam domains
    wholesale, keep the rest; cf. domain-level filtering in C4/RefinedWeb
    pipelines). Emits one row per source: document count, corpus share
    (floor ppm — exact integer arithmetic, engine-portable), mean doc
    length in fixed-point centichars, and the decision:
    ``drop_blocklist`` > ``drop_low_quality`` (mean chars below the
    threshold) > ``keep``.

    Plan shape: one groupBy(source) aggregate (map-side partial), then a
    1-row total broadcast-joined onto the per-source rows — the scalar
    pattern q15 uses; per-source stats never leave the executors until
    the final tiny result. Blocklist membership is a literal isin —
    no join, no shuffle beyond the single agg.
    """
    agg = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(chars_col).cast("decimal(28,0)")).alias("__sum_chars"),
    )
    total = agg.agg(F.sum("n_docs").alias("__total"))
    return (
        agg.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            F.floor(F.col("n_docs") * 1000000 / F.col("__total"))
            .cast("bigint")
            .alias("share_ppm"),
            F.floor(F.col("__sum_chars") * 100 / F.col("n_docs"))
            .cast("bigint")
            .alias("mean_chars_f2"),
            F.when(F.col("source").isin(list(blocklist)), F.lit("drop_blocklist"))
            .when(
                F.floor(F.col("__sum_chars") * 100 / F.col("n_docs"))
                < F.lit(min_mean_chars) * 100,
                F.lit("drop_low_quality"),
            )
            .otherwise(F.lit("keep"))
            .alias("decision"),
        )
    )


def temperature_mix(
    df: DataFrame,
    source_col: str,
    id_col: str,
    temperature: float = 2.0,
    cap_rate: float = 1.0,
    seed: str = "tmix",
) -> DataFrame:
    """Temperature-based source mixing — the standard pretraining recipe
    for flattening a skewed source distribution: sample source s at a
    rate ∝ n_s^(1/T − 1), so kept counts are ∝ n_s^(1/T) (T=1 keeps the
    natural mix, T→∞ equalizes sources). The largest source gets
    ``cap_rate``; everything else scales down from it.

    Rates are computed from a tiny per-source count collect (sources ≪
    rows), floored to 6 decimals, then applied with the deterministic
    md5-threshold sampler (hash_sample/mix_sources) — the whole pipeline
    is reproducible across runs, partitionings, and engines. T=2 uses
    sqrt (IEEE correctly-rounded in every engine, so the floored rates
    are bit-identical to an independent reimplementation); other T use
    pow, which can differ by 1 ulp across libms — with the 1e-6 floor
    the discrepancy window is ~1e-10 per source.

    One narrow filter pass over the data; no shuffle.
    """
    import math

    counts = {r[0]: r[1] for r in df.groupBy(source_col).count().collect()}
    if not counts:
        return df
    root = (lambda x: math.sqrt(x)) if temperature == 2.0 else (
        lambda x: x ** (1.0 / temperature)
    )
    mx = max(root(float(n)) for n in counts.values())
    rates = {
        s: math.floor(1000000.0 * cap_rate * root(float(n)) / mx) / 1000000.0
        for s, n in counts.items()
    }
    return mix_sources(df, source_col, rates, id_col, seed=seed)


def leakage_safe_split(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_permille: int = 100,
    seed: str = "split",
) -> DataFrame:
    """Train/eval split that can NEVER leak a near-duplicate across the
    boundary: documents sharing a normalized-text fingerprint form a
    group, and the WHOLE group is assigned to one side by a
    deterministic hash of the group representative — so an eval document
    cannot have a training-set duplicate, the contamination mode a plain
    per-document hash split silently permits. (For fuzzier leakage run
    the minhash family first and pass its cluster representative as the
    text: the split mechanics are identical — group, hash the
    representative, assign the group.)

    ``eval_permille`` is the expected eval share in ‰ of GROUPS;
    assignment is ``int(md5(seed:fingerprint)[0:8], 16) % 1000 <
    eval_permille`` — the hash keys on the CONTENT fingerprint, not the
    group's min-id representative, so it is engine-portable,
    reproducible, and stable under re-runs and corpus growth: adding new
    docs (whatever their ids) never flips an existing group, because
    nothing about the assignment depends on which ids are present.
    (``group_rep`` = min id is still returned for lineage/debugging, and
    CAN change when a smaller-id duplicate arrives — only the label is
    id-dependent, never the split.)

    Returns (id, group_rep, split) with split ∈ {'train', 'eval'}.

    Plan shape at scale: one narrow fingerprint pass, one MIN window
    partitioned on the fingerprint (group representative = smallest id —
    corpus statistics and per-doc rows in the same exchange, no
    self-join), then a narrow hash-assign. One shuffle total.
    """
    from pyspark.sql import Window

    from aleph2_contrib_spark.operators.dedup import fingerprint

    fp = fingerprint(F.col(text_col))
    base = df.select(F.col(id_col).alias("id"), fp.alias("__fp"))
    rep = F.min("id").over(Window.partitionBy("__fp"))
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(seed), F.col("__fp"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 1000
    )
    return base.select(
        F.col("id").alias(id_col),
        rep.alias("group_rep"),
        F.when(bucket < F.lit(int(eval_permille)), F.lit("eval"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def quality_budget_filter(
    df: DataFrame,
    score_col: str,
    id_col: str,
    keep_permille: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Budget-driven quality filtering: keep exactly the top
    ``keep_permille`` ‰ of rows by (score desc, id asc) — the "we can
    afford to train on 40% of this crawl" stage, where the cutoff is a
    RANK, not a score threshold, so the kept volume is exact regardless
    of how scores are distributed (a fixed threshold over- or
    under-shoots as the corpus shifts). ``k = (n · keep_permille) div
    1000`` — exact integer arithmetic; ties broken by id so the cut is
    deterministic.

    Returns the kept rows as (id, score, rank) with rank 1..k.

    Plan shape at scale: the global ranking is the same two-phase scan
    as global_order_index/pack_sequences — range-partition on the sort
    key, per-partition row_number, driver prefix over O(partitions)
    counts broadcast back — NEVER a single-partition window. The total
    row count falls out of the same per-partition counts, so the whole
    operator costs one extra tiny collect over partition totals.
    """
    spark = df.sparkSession
    nparts = num_partitions or spark.sparkContext.defaultParallelism
    d = df.repartitionByRange(
        nparts, F.col(score_col).desc(), F.col(id_col).asc()
    ).withColumn("__pid", F.spark_partition_id())
    w = Window.partitionBy("__pid").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    d = d.withColumn("__local_rank", F.row_number().over(w))
    # eager localCheckpoint BEFORE the counts action: freeze the sampled
    # range partitioning so the offsets keyed by __pid apply to the
    # identical row placement in the final job (same reasoning as
    # pack_sequences; lineage cut so a lost block fails rather than
    # silently recomputing with re-sampled boundaries)
    d = d.localCheckpoint(eager=True)
    counts = d.groupBy("__pid").agg(F.count(F.lit(1)).alias("__pn")).collect()
    running, offsets = 0, {}
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = running
        running += row["__pn"]
    k = (running * keep_permille) // 1000
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "__pid int, __off long"
    )
    return (
        d.join(F.broadcast(off_df), "__pid")
        .withColumn("rank", (F.col("__local_rank") + F.col("__off")).cast("long"))
        .filter(F.col("rank") <= F.lit(int(k)))
        .select(F.col(id_col), F.col(score_col), "rank")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: str = "0",
) -> DataFrame:
    """Deterministic weighted sample of ``k`` rows without replacement:
    each row draws u = md5_unit(seed:id) and is ranked by priority
    u / weight — the exponential-race shape (a row with twice the weight
    halves its expected priority), so inclusion odds scale with weight
    while staying REPRODUCIBLE across runs, partitionings, and engines
    (df.sample() and rand() are neither). Quality-weighted corpus
    subsampling is the 100 TB use: re-running the pipeline must rebuild
    the exact same train set.

    Exactness: u is an exact 32-bit integer over 2^32 and the priority is
    one IEEE-754 double division — correctly rounded and bit-identical in
    every engine (unlike pow/ln, which vary by libm; the classic A-ES key
    u^(1/w) is NOT reproducible across engines). Ties (md5 collisions on
    the 8-hex prefix) are broken by id, so the result set is unique.

    Scale: orderBy(priority).limit(k) compiles to TakeOrderedAndProject —
    per-partition top-k then a k-row merge on the driver, no global sort,
    no shuffle of the data. Rows with weight <= 0 or NULL never qualify.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = F.col(weight_col).cast("double")
    pri = md5_unit(F.col(id_col), seed) / w
    return (
        df.filter(w > 0)
        .withColumn("__pri", pri)
        .orderBy(F.col("__pri").asc(), F.col(id_col).asc())
        .limit(k)
        .drop("__pri")
    )


def weighted_sample_oracle_sql(
    rows_sql: str, id_expr: str, weight_expr: str, k: int, seed: str = "0"
) -> str:
    """DuckDB replica of :func:`weighted_sample` — identical md5 priority
    and IEEE division, ORDER BY + LIMIT. ``rows_sql`` yields the candidate
    rows; ``id_expr``/``weight_expr`` are column expressions over it."""
    from aleph2_contrib_spark.operators import sql_str

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    seed = sql_str(seed)
    return f"""
SELECT * EXCLUDE (__pri) FROM (
    SELECT r.*,
           CAST(CAST('0x' || substr(md5('{seed}:' || CAST({id_expr} AS VARCHAR)), 1, 8)
                AS BIGINT) AS DOUBLE) / 4294967296.0
               / CAST({weight_expr} AS DOUBLE) AS __pri
    FROM ({rows_sql}) r
    WHERE CAST({weight_expr} AS DOUBLE) > 0
)
ORDER BY __pri ASC, {id_expr} ASC
LIMIT {int(k)}
"""


_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"
_TRACKING_PREFIXES = ("utm_", "gclid", "fbclid", "ref=")


def canonicalize_url(url: Column, strip_www: bool = True) -> Column:
    """Web-corpus URL canonicalization — the normalization pass CommonCrawl
    -style pipelines run before URL-level dedup, as pure Column
    expressions (no UDF):

      · scheme and host lowercased, leading ``www.`` stripped (optional)
      · default ports dropped (``:80`` for http, ``:443`` for https)
      · fragment dropped
      · path: duplicate slashes collapsed, empty path → ``/``, trailing
        slash trimmed (except the bare root)
      · query: params split, tracking params dropped (``utm_*``,
        ``gclid``, ``fbclid``, ``ref=``), remainder BYTE-SORTED and
        rejoined — param order no longer distinguishes URLs
      · non-URLs (no scheme://authority) → NULL

    Engine-portability: the regex uses only capturing/non-capturing
    groups and character classes (Java regex ∩ RE2), replacements never
    use backreferences (Spark's ``$1`` vs DuckDB's ``\\1`` would
    diverge), and the param sort is the engines' shared binary
    collation. :func:`canonicalize_url_oracle_expr` is the SQL twin.
    """
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, _URL_RE, 1))
    auth = F.lower(F.regexp_extract(u, _URL_RE, 2))
    if strip_www:
        auth = F.when(
            auth.startswith("www."), F.substring(auth, 5, 2_000_000)
        ).otherwise(auth)
    auth = F.when(
        (scheme == "http") & auth.endswith(":80"),
        F.substring(auth, 1, F.length(auth) - 3),
    ).when(
        (scheme == "https") & auth.endswith(":443"),
        F.substring(auth, 1, F.length(auth) - 4),
    ).otherwise(auth)
    path = F.regexp_replace(F.regexp_extract(u, _URL_RE, 3), "/{2,}", "/")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.substring(path, 1, F.length(path) - 1),
    ).otherwise(path)
    q = F.regexp_extract(u, _URL_RE, 4)
    keep = F.filter(
        F.split(q, "&"),
        # fold over the shared tuple so adding a prefix updates engine
        # and oracle together (the SQL twin iterates the same tuple)
        lambda p: reduce(
            lambda acc, t: acc & ~p.startswith(t),
            _TRACKING_PREFIXES,
            p != "",
        ),
    )
    q2 = F.array_join(F.array_sort(keep), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(q2 != "", F.concat(F.lit("?"), q2)).otherwise(F.lit("")),
    )
    return F.when((scheme != "") & (auth != ""), canon)


def url_dedup(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """URL-level dedup over :func:`canonicalize_url`: one row per
    canonical URL with the duplicate count and the kept (minimum) id —
    the first stage of a web-corpus pipeline, ahead of content-level
    MinHash. One narrow projection + ONE groupBy on the canonical
    string; rows with non-URL values are dropped (NULL canonical)."""
    canon = canonicalize_url(F.col(url_col))
    return (
        df.select(canon.alias("canon_url"), F.col(id_col).alias("__id"))
        .filter(F.col("canon_url").isNotNull())
        .groupBy("canon_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("__id").alias("keep_id"),
        )
    )


def canonicalize_url_oracle_expr(url_expr: str, strip_www: bool = True) -> str:
    """DuckDB SQL expression replicating :func:`canonicalize_url` over
    ``url_expr`` — identical regex (RE2 ∩ Java), port/www/path/query
    handling, and binary-collation param sort."""
    re_sql = _URL_RE  # backslashes are literal in DuckDB '...' strings
    u = f"trim({url_expr})"
    scheme = f"lower(regexp_extract({u}, '{re_sql}', 1))"
    auth0 = f"lower(regexp_extract({u}, '{re_sql}', 2))"
    if strip_www:
        auth0 = (
            f"CASE WHEN starts_with({auth0}, 'www.') "
            f"THEN substr({auth0}, 5) ELSE {auth0} END"
        )
    auth = (
        f"CASE WHEN {scheme} = 'http' AND {auth0} LIKE '%:80' "
        f"THEN substr({auth0}, 1, len({auth0}) - 3) "
        f"WHEN {scheme} = 'https' AND {auth0} LIKE '%:443' "
        f"THEN substr({auth0}, 1, len({auth0}) - 4) "
        f"ELSE {auth0} END"
    )
    path0 = f"regexp_replace(regexp_extract({u}, '{re_sql}', 3), '/{{2,}}', '/', 'g')"
    path1 = f"CASE WHEN {path0} = '' THEN '/' ELSE {path0} END"
    path = (
        f"CASE WHEN len({path1}) > 1 AND {path1} LIKE '%/' "
        f"THEN substr({path1}, 1, len({path1}) - 1) ELSE {path1} END"
    )
    q = f"regexp_extract({u}, '{re_sql}', 4)"
    preds = " AND ".join(
        [f"p <> ''"]
        + [f"NOT starts_with(p, '{t}')" for t in _TRACKING_PREFIXES]
    )
    q2 = (
        f"array_to_string(list_sort(list_filter(string_split({q}, '&'), "
        f"p -> {preds})), '&')"
    )
    return (
        f"CASE WHEN {scheme} <> '' AND {auth} <> '' THEN "
        f"{scheme} || '://' || {auth} || {path} || "
        f"(CASE WHEN {q2} <> '' THEN '?' || {q2} ELSE '' END) "
        f"ELSE NULL END"
    )


def score_rank_normalize(
    df: DataFrame, group_col: str, score_col: str, id_col: str
) -> DataFrame:
    """Cross-source score calibration: map each record's quality score to
    its within-group rank position in exact ppm — the rank-based
    normalization that makes INCOMPARABLE per-source scores (different
    classifiers, different scales) mixable under one global threshold,
    the standard prelude to corpus mixing when sources are scored by
    different models.

    rank_ppm = (rank − 1) · 1e6 div (n − 1)  (0 = group's worst,
    1e6 = best; single-record groups map to 1e6), rank ordered by
    (score, id) so ties resolve identically in every engine.

    Plan shape at 100 TB: ONE group-partitioned row_number window + the
    per-group count — no global sort, no unpartitioned window; sources
    are the partition key so skew equals source imbalance (salt or
    sub-split a mega-source upstream).
    """
    w = Window.partitionBy("__g").orderBy(F.col("__s").asc(), F.col("__id").asc())
    wg = Window.partitionBy("__g")
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(group_col).alias("__g"),
        F.col(score_col).alias("__s"),
    ).filter(F.col("__s").isNotNull())
    return (
        base.withColumn("__rnk", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wg))
        .select(
            F.col("__id").alias(id_col),
            F.col("__g").alias(group_col),
            F.col("__s").alias(score_col),
            F.expr(
                "CAST(CASE WHEN __n > 1 THEN ((__rnk - 1) * 1000000) div (__n - 1) "
                "ELSE 1000000 END AS BIGINT)"
            ).alias("rank_ppm"),
        )
    )


def score_rank_normalize_oracle_sql(
    rows_sql: str, group_col: str, score_col: str, id_col: str
) -> str:
    """DuckDB replica of :func:`score_rank_normalize`. ``rows_sql``
    yields (id, group, score) under those output names."""
    return f"""
WITH base AS (
    SELECT {id_col}, {group_col}, {score_col},
           row_number() OVER (PARTITION BY {group_col}
                              ORDER BY {score_col}, {id_col}) AS rnk,
           count(*) OVER (PARTITION BY {group_col}) AS n
    FROM ({rows_sql}) WHERE {score_col} IS NOT NULL
)
SELECT {id_col}, {group_col}, {score_col},
       CAST(CASE WHEN n > 1 THEN ((rnk - 1) * 1000000) // (n - 1)
            ELSE 1000000 END AS BIGINT) AS rank_ppm
FROM base
"""


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """Vocabulary coverage curve — the tokenizer-prep analytic "what
    vocab size covers X% of corpus tokens": per distinct lowercase word
    token, its total occurrence count, frequency rank, inclusive
    cumulative count and exact cumulative share in ppm, ordered by
    (count DESC, token ASC) so the curve is engine-exact.

    Plan shape at 100 TB: ONE map-side-partial groupBy over tokens
    (the only corpus-sized stage), then the repo's two-phase global
    scan over the VOCAB-sized count table (range-partition on the rank
    order, per-partition window, driver prefix over per-partition
    totals, broadcast back — pack_sequences' machinery, including the
    eager localCheckpoint barrier; no single-task sort even at
    100M-token vocabularies). The corpus total falls out of the prefix
    pass for free.
    """
    spark = df.sparkSession
    nparts = num_partitions or spark.sparkContext.defaultParallelism
    counts = (
        df.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
            ).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    d = (
        counts.repartitionByRange(nparts, F.col("cnt").desc(), F.col("token").asc())
        .withColumn("__pid", F.spark_partition_id())
    )
    w = Window.partitionBy("__pid").orderBy(F.col("cnt").desc(), F.col("token").asc())
    d = d.withColumn("__local_cum", F.sum("cnt").over(w)).withColumn(
        "__local_rank", F.row_number().over(w)
    )
    # same barrier as pack_sequences: offsets below are keyed by __pid
    d = d.localCheckpoint(eager=True)
    totals = d.groupBy("__pid").agg(
        F.sum("cnt").alias("__ptot"), F.count(F.lit(1)).alias("__pn")
    ).collect()
    running, running_n, offsets = 0, 0, {}
    for row in sorted(totals, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = (running, running_n)
        running += row["__ptot"]
        running_n += row["__pn"]
    total = int(running)
    off_df = spark.createDataFrame(
        [(int(p), int(o), int(n)) for p, (o, n) in offsets.items()],
        "__pid int, __off long, __noff long",
    )
    return (
        d.join(F.broadcast(off_df), "__pid")
        .select(
            "token",
            "cnt",
            (F.col("__local_rank") + F.col("__noff")).cast("long").alias("rank"),
            (F.col("__local_cum") + F.col("__off")).cast("long").alias("cum_cnt"),
            F.expr(
                f"CAST(((__local_cum + __off) * 1000000) div {total} AS BIGINT)"
            ).alias("cum_ppm"),
        )
    )


def vocab_coverage_oracle_sql(rows_sql: str, text_col: str = "text") -> str:
    """DuckDB replica of :func:`vocab_coverage` — one window cumsum over
    the vocab-sized count table."""
    return f"""
WITH counts AS (
    SELECT token, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(string_split_regex(lower({text_col}), '[^a-z0-9]+')) AS token
          FROM ({rows_sql}))
    WHERE token <> '' GROUP BY token
)
SELECT token, cnt,
       row_number() OVER (ORDER BY cnt DESC, token) AS rank,
       CAST(sum(cnt) OVER (ORDER BY cnt DESC, token
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cnt,
       CAST((sum(cnt) OVER (ORDER BY cnt DESC, token
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000000)
            // (SELECT sum(cnt) FROM counts) AS BIGINT) AS cum_ppm
FROM counts
"""


def chat_turn_stats(
    df: DataFrame, id_col: str, conv_col: str
) -> DataFrame:
    """SFT-conversation QA — the structural validation instruction-tuning
    pipelines run before chat-template rendering: parse a JSON
    conversation column ([{"role":…,"content":…}, …]) and emit per
    conversation the turn counts and the strict-alternation verdict
    (turn i must be 'user' for even i, 'assistant' for odd i — the
    contract most chat templates assume; a doubled role or a
    system-role stray breaks training downstream, silently).

    Returns (id, n_turns, n_user, n_assistant, total_chars,
    alternates_ok, is_valid) with is_valid = alternates_ok AND
    n_turns >= 2. Malformed JSON parses to NULL and the conversation is
    DROPPED (pre-filter with a validity screen if you need the reject
    stream). A valid-JSON row that is not an ARRAY (a lone
    ``{"role":…}`` object — real SFT feeds contain them) is also
    DROPPED, on both engines: Spark's from_json would otherwise wrap a
    lone object as a one-element array while JSON-path engines
    (json_array_length) see a non-array, so the array-only contract is
    enforced with an explicit leading-'[' pre-filter here rather than
    left to parser quirks. NULL contents count 0 chars.

    Plan shape at 100 TB: from_json + posexplode JVM-side, ONE
    groupBy(id) with map-side partial aggregates — turn rows never
    leave the stage unaggregated beyond the id shuffle.
    """
    turns = df.filter(
        # array-only contract: from_json(array schema) silently wraps a
        # lone JSON object as [obj]; require the serialized form to BE
        # an array so both engines agree on what a "turn list" is
        F.ltrim(F.col(conv_col)).startswith("[")
    ).select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.from_json(
                F.col(conv_col), "array<struct<role:string,content:string>>"
            )
        ).alias("__i", "__t"),
    ).select(
        "__id",
        "__i",
        F.col("__t.role").alias("__role"),
        F.coalesce(F.length(F.col("__t.content")), F.lit(0)).alias("__len"),
    )
    expected = F.when(F.col("__i") % 2 == 0, F.lit("user")).otherwise(
        F.lit("assistant")
    )
    return (
        turns.withColumn(
            "__viol",
            F.when(
                F.col("__role").isNull() | (F.col("__role") != expected), F.lit(1)
            ).otherwise(F.lit(0)),
        )
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.sum(
                F.when(F.col("__role") == "user", 1).otherwise(0)
            ).cast("long").alias("n_user"),
            F.sum(
                F.when(F.col("__role") == "assistant", 1).otherwise(0)
            ).cast("long").alias("n_assistant"),
            F.sum("__len").cast("long").alias("total_chars"),
            (F.sum("__viol") == 0).alias("alternates_ok"),
        )
        .withColumn(
            "is_valid", F.col("alternates_ok") & (F.col("n_turns") >= 2)
        )
        .withColumnRenamed("__id", id_col)
    )


def chat_turn_stats_oracle_sql(rows_sql: str, id_col: str) -> str:
    """DuckDB replica of :func:`chat_turn_stats`. ``rows_sql`` yields
    (id, conv) with conv a JSON array string."""
    return f"""
WITH t AS (
    SELECT id, conv,
           unnest(range(0, CAST(json_array_length(conv) AS BIGINT))) AS i
    FROM ({rows_sql})
    WHERE json_valid(conv) AND ltrim(conv) LIKE '[%'
), turns AS (
    SELECT id, i,
           json_extract_string(conv, '$[' || i || '].role') AS role,
           coalesce(len(json_extract_string(conv, '$[' || i || '].content')), 0)
               AS clen
    FROM t
)
SELECT id AS {id_col},
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT) AS n_user,
       CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_assistant,
       CAST(sum(clen) AS BIGINT) AS total_chars,
       sum(CASE WHEN role IS NULL
                  OR role <> (CASE WHEN i % 2 = 0 THEN 'user'
                                   ELSE 'assistant' END)
                THEN 1 ELSE 0 END) = 0 AS alternates_ok,
       (sum(CASE WHEN role IS NULL
                   OR role <> (CASE WHEN i % 2 = 0 THEN 'user'
                                    ELSE 'assistant' END)
                 THEN 1 ELSE 0 END) = 0) AND count(*) >= 2 AS is_valid
FROM turns GROUP BY id
"""


def preference_pairs(
    df: DataFrame,
    prompt_col: str,
    cand_col: str,
    score_col: str,
    id_col: str,
) -> DataFrame:
    """Best-vs-worst preference pairs — the DPO/RLHF data-prep step after
    reward scoring: per prompt, chosen = the (score, id)-argmax
    candidate, rejected = the argmin, with the exact score margin.
    Prompts with fewer than two candidates are dropped (no pair), and
    the (score, id) total order makes ties deterministic — on an
    all-tied prompt the pair is the max-id vs min-id candidate with
    margin 0 (filter margin > 0 downstream if strict preference is
    required).

    Scores must be integer-typed (fix floats upstream: floor(s·1e6))
    so margins are exact. NULL scores are dropped before pairing.

    Plan shape at 100 TB: ONE groupBy(prompt) with two lexicographic
    struct extrema + a count — map-side partial, no window, no
    self-join (golden_record's survivorship machinery, pointed at
    preference data).
    """
    base = df.select(
        F.col(prompt_col).alias("__p"),
        F.col(cand_col).alias("__c"),
        F.col(score_col).cast("long").alias("__s"),
        F.col(id_col).alias("__i"),
    ).filter(F.col("__s").isNotNull())
    st = F.struct(F.col("__s").alias("s"), F.col("__i").alias("i"), F.col("__c").alias("c"))
    return (
        base.groupBy("__p")
        .agg(
            F.max(st).alias("__best"),
            F.min(st).alias("__worst"),
            F.count(F.lit(1)).alias("__n"),
        )
        .filter(F.col("__n") >= 2)
        .select(
            F.col("__p").alias(prompt_col),
            F.col("__best.c").alias("chosen"),
            F.col("__worst.c").alias("rejected"),
            F.col("__best.i").alias("chosen_id"),
            F.col("__worst.i").alias("rejected_id"),
            (F.col("__best.s") - F.col("__worst.s")).cast("long").alias("margin"),
            F.col("__n").cast("long").alias("n_candidates"),
        )
    )


def preference_pairs_oracle_sql(
    rows_sql: str, prompt_col: str
) -> str:
    """DuckDB replica of :func:`preference_pairs`. ``rows_sql`` yields
    (p, c, s, i)."""
    return f"""
WITH base AS (
    SELECT p, c, CAST(s AS BIGINT) AS s, i FROM ({rows_sql})
    WHERE s IS NOT NULL
), agg AS (
    SELECT p,
           max(struct_pack(s := s, i := i, c := c)) AS best,
           min(struct_pack(s := s, i := i, c := c)) AS worst,
           count(*) AS n
    FROM base GROUP BY p
)
SELECT p AS {prompt_col},
       (best).c AS chosen, (worst).c AS rejected,
       (best).i AS chosen_id, (worst).i AS rejected_id,
       CAST((best).s - (worst).s AS BIGINT) AS margin,
       CAST(n AS BIGINT) AS n_candidates
FROM agg WHERE n >= 2
"""


# ---------------------------------------------------------------------------
# fill-in-the-middle (FIM) transformation
# ---------------------------------------------------------------------------

FIM_PREFIX_TOK = "<|fim_prefix|>"
FIM_SUFFIX_TOK = "<|fim_suffix|>"
FIM_MIDDLE_TOK = "<|fim_middle|>"


def fim_transform(
    df: DataFrame,
    id_col: str,
    text_col: str,
    middle_frac_ppm: int = 300_000,
    min_len: int = 20,
    seed: str = "fim",
) -> DataFrame:
    """Fill-in-the-middle transformation (Bavarian et al. 2022, "Efficient
    Training of Language Models to Fill in the Middle") — the document
    rewrite code-model pipelines apply to a fraction of the corpus so the
    model learns infilling: split each document into (prefix, middle,
    suffix) at deterministic points and re-serialize in PSM order

        <|fim_prefix|>P<|fim_suffix|>S<|fim_middle|>M

    so the model predicts the middle given both sides. Split points are
    md5-derived from (seed, id) — reproducible across runs, partitionings
    and engines (the corpus-module discipline; no rand()). The middle
    spans ``middle_frac_ppm`` of the document (ppm — exact integer math,
    ≥ 1 char), its start uniform over the valid range. Documents shorter
    than ``min_len`` chars pass through unchanged (fim_applied = false)
    — matching the paper's practice of transforming only a fraction;
    compose with ``hash_sample`` to pick WHICH documents.

    Returns (id, fim_text, fim_applied, split_start, middle_len) —
    split geometry emitted so QA can re-derive the pieces. One narrow
    projection, zero shuffles, all Catalyst string expressions (ASCII /
    single-codepoint semantics: both engines index substrings by
    codepoint).
    """
    if not (0 < int(middle_frac_ppm) < 1_000_000):
        raise ValueError(f"middle_frac_ppm must be in (0, 1e6), got {middle_frac_ppm}")
    if min_len < 3:
        raise ValueError(f"min_len must be >= 3, got {min_len}")
    t = F.col(text_col)
    L = F.length(t)
    # widen BEFORE multiplying: length * ppm overflows int32 for texts of
    # ~7160+ chars (ANSI mode throws, non-ANSI wraps silently)
    mlen = F.greatest(
        F.lit(1), (L.cast("long") * F.lit(int(middle_frac_ppm))) / F.lit(1_000_000)
    ).cast("long")
    # uniform start in [1, L - mlen + 1]: md5 integer mod the range width
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    rng_width = L.cast("long") - mlen + 1
    start = (h % rng_width) + 1
    prefix = F.substring(t, F.lit(1), (start - 1).cast("int"))
    middle = t.substr(start.cast("int"), mlen.cast("int"))
    suffix = t.substr(
        (start + mlen).cast("int"), (L.cast("long") - start - mlen + 1).cast("int")
    )
    applied = t.isNotNull() & (L >= F.lit(int(min_len)))
    return df.select(
        F.col(id_col),
        F.when(
            applied,
            F.concat(
                F.lit(FIM_PREFIX_TOK),
                prefix,
                F.lit(FIM_SUFFIX_TOK),
                suffix,
                F.lit(FIM_MIDDLE_TOK),
                middle,
            ),
        ).otherwise(t).alias("fim_text"),
        applied.alias("fim_applied"),
        F.when(applied, start).cast("long").alias("split_start"),
        F.when(applied, mlen).cast("long").alias("middle_len"),
    )


def fim_transform_oracle_sql(
    rows_sql: str,
    id_col: str,
    middle_frac_ppm: int = 300_000,
    min_len: int = 20,
    seed: str = "fim",
) -> str:
    """DuckDB replica of :func:`fim_transform`. ``rows_sql`` yields
    (id, text)."""
    return f"""
WITH base AS (
    SELECT id, text, len(text) AS L,
           greatest(1, CAST(len(text) * {int(middle_frac_ppm)} AS BIGINT)
                       // 1000000) AS mlen,
           CAST('0x' || substr(md5('{seed}:' || CAST(id AS VARCHAR)), 1, 8)
                AS UBIGINT) AS h
    FROM ({rows_sql})
), pos AS (
    SELECT *, CAST(h % CAST(L - mlen + 1 AS UBIGINT) AS BIGINT) + 1 AS s,
           (text IS NOT NULL AND L >= {int(min_len)}) AS applied
    FROM base
)
SELECT id AS {id_col},
       CASE WHEN applied THEN
            '{FIM_PREFIX_TOK}' || substr(text, 1, CAST(s - 1 AS INT))
            || '{FIM_SUFFIX_TOK}' || substr(text, CAST(s + mlen AS INT),
                                            CAST(L - s - mlen + 1 AS INT))
            || '{FIM_MIDDLE_TOK}' || substr(text, CAST(s AS INT), CAST(mlen AS INT))
       ELSE text END AS fim_text,
       applied AS fim_applied,
       CASE WHEN applied THEN s END AS split_start,
       CASE WHEN applied THEN mlen END AS middle_len
FROM pos
"""


# ---------------------------------------------------------------------------
# distribution matching (importance resampling to an explicit target)
# ---------------------------------------------------------------------------


def distribution_match_sample(
    df: DataFrame,
    bucket_col: str,
    id_col: str,
    target_ppm: dict,
    seed: str = "dmatch",
) -> DataFrame:
    """Importance resampling to an EXPLICIT target distribution over a
    bucket column — the curation step that reshapes a corpus histogram
    (quality buckets, length terciles, domains) to a prescribed mix
    (CCNet's per-quality-bucket shaping; the acceptance-sampling form of
    DoReMi-style domain reweighting). Where ``temperature_mix`` flattens
    the NATURAL distribution by a power law, this matches a TARGET one.

    Per bucket b with n_b rows and target weight t_b (ppm):
    K = min over target buckets of n_b / t_b (the largest scale at which
    every bucket can still supply its share), acceptance rate_b =
    min(1, K·t_b / n_b) — so kept counts are ≈ K·t_b, exactly
    proportional to the target, keeping the maximum possible total (the
    scarcest bucket is kept whole; everything else downsamples to
    match). Rows whose bucket is absent from ``target_ppm`` (or has
    weight 0) are dropped.

    Determinism/portability: per-bucket counts are a tiny collect
    (buckets ≪ rows, the temperature_mix pattern); rates are floored to
    1e-6 and applied with the md5-threshold sampler, so the kept SET is
    identical across runs, partitionings, and engines — every arithmetic
    step is IEEE-double with a fixed evaluation order that an oracle can
    replay exactly.

    One count groupBy + one narrow filter pass; no other shuffle.
    """
    import math

    if not target_ppm or any(int(v) < 0 for v in target_ppm.values()):
        raise ValueError("target_ppm must be non-empty with weights >= 0")
    counts = {
        r[0]: r[1] for r in df.groupBy(bucket_col).count().collect()
    }
    k = None
    for b, t in target_ppm.items():
        t = int(t)
        if t > 0 and b in counts:
            ratio = counts[b] / (t * 1.0)
            k = ratio if k is None else min(k, ratio)
    if k is None:  # no target bucket present in the data
        return df.filter(F.lit(False))
    rates = {}
    for b, t in target_ppm.items():
        t = int(t)
        if t > 0 and b in counts:
            rates[b] = math.floor(min(1.0, (k * t) / counts[b]) * 1_000_000) / 1_000_000
    u = md5_unit(F.col(id_col), seed)
    rate_expr = F.lit(-1.0)
    for b, r in rates.items():
        rate_expr = F.when(F.col(bucket_col) == F.lit(b), F.lit(r)).otherwise(
            rate_expr
        )
    return df.filter(u < rate_expr)


def distribution_match_oracle_sql(
    rows_sql: str,
    bucket_expr: str,
    id_expr: str,
    target_ppm: dict,
    seed: str = "dmatch",
) -> str:
    """DuckDB replica of :func:`distribution_match_sample` aggregated per
    bucket (n_kept, id_sum) — recomputes K and the floored rates from
    the data with the identical IEEE-double evaluation order, so every
    keep/drop decision matches bit-for-bit. ``rows_sql`` yields rows;
    ``bucket_expr``/``id_expr`` are expressions over them."""
    values = ", ".join(
        f"({b!r}, {int(t)})" if isinstance(b, str) else f"({b}, {int(t)})"
        for b, t in target_ppm.items()
    )
    return f"""
WITH rows_in AS ({rows_sql}),
b AS (
    SELECT {id_expr} AS id, {bucket_expr} AS bucket FROM rows_in
), n AS (
    SELECT bucket, count(*) AS nb FROM b GROUP BY bucket
), t(bucket, tppm) AS (VALUES {values}),
k AS (
    SELECT min(nb / (tppm * 1.0)) AS kk
    FROM n JOIN t USING (bucket) WHERE tppm > 0
), r AS (
    SELECT bucket,
           floor(least(1.0, ((SELECT kk FROM k) * tppm) / nb) * 1000000)
               / 1000000 AS rate
    FROM n JOIN t USING (bucket) WHERE tppm > 0
), kept AS (
    SELECT b.id, b.bucket
    FROM b JOIN r USING (bucket)
    WHERE CAST('0x' || substr(md5('{seed}:' || CAST(b.id AS VARCHAR)), 1, 8)
               AS UBIGINT) / 4294967296.0 < r.rate
)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(id) AS BIGINT) AS id_sum
FROM kept GROUP BY bucket
"""


def boilerplate_affixes(
    df: DataFrame,
    group_col: str,
    text_col: str,
) -> DataFrame:
    """Shared-boilerplate detection per document group (source/domain):
    the longest prefix and suffix common to EVERY document in the group
    — the header/footer a crawler pipeline strips before training
    (C4/RefinedWeb-style cleaning finds these per-site; this is the
    corpus-scale census that tells you which sites need it and how many
    characters they waste).

    The group-wide longest common prefix uses the classic order trick:
    LCP(set) = LCP(lexicographic min, lexicographic max) — any divergence
    between two members appears between the extremes, so only TWO
    strings per group are ever compared. Suffix = the same on reversed
    strings. Output (group, n_docs, prefix_len, suffix_len,
    prefix) — exact integers/strings; single-doc groups report the whole
    document (callers threshold n_docs ≥ 2). NULL texts are ignored.

    Plan shape at 100 TB: ONE partial-aggregated groupBy (min/max/count
    are all combiner-friendly), then an O(length) per-GROUP character
    scan — group count × max length work, independent of document
    count. No explode, no join, no window.
    """

    def lcp_len(a: Column, b: Column) -> Column:
        L = F.least(F.length(a), F.length(b))
        mism = F.filter(
            F.sequence(F.lit(1), L),
            lambda i: F.substring(a, i, F.lit(1)) != F.substring(b, i, F.lit(1)),
        )
        return (
            F.when(L >= 1, F.coalesce(F.try_element_at(mism, F.lit(1)) - 1, L))
            .otherwise(0)
            .cast("long")
        )

    # The order trick must run in the COMPARISON orientation: the suffix
    # leg needs min/max of the REVERSED strings — reversing the forward
    # extremes is wrong (a middle document can diverge nearer the end
    # than either forward extreme does; caught by the hand test).
    agg = (
        df.filter(F.col(text_col).isNotNull())
        .groupBy(F.col(group_col).alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(text_col).alias("__a"),
            F.max(text_col).alias("__b"),
            F.min(F.reverse(text_col)).alias("__ra"),
            F.max(F.reverse(text_col)).alias("__rb"),
        )
    )
    a, b = F.col("__a"), F.col("__b")
    pl = lcp_len(a, b)
    sl = lcp_len(F.col("__ra"), F.col("__rb"))
    return agg.select(
        F.col("grp").alias(group_col),
        F.col("n_docs").cast("long").alias("n_docs"),
        pl.alias("prefix_len"),
        sl.alias("suffix_len"),
        F.substring(a, 1, pl.cast("int")).alias("prefix"),
    )


def boilerplate_affixes_oracle_sql(
    table: str, group_col: str, text_col: str
) -> str:
    """DuckDB replica of :func:`boilerplate_affixes` — same min/max
    order trick, 1-indexed char scan, floor-free integer arithmetic."""

    def lcp(a: str, b: str) -> str:
        return (
            f"CASE WHEN least(len({a}), len({b})) >= 1 THEN"
            f" coalesce(list_min(list_filter(range(1, least(len({a}), len({b})) + 1),"
            f" i -> {a}[i] <> {b}[i])), least(len({a}), len({b})) + 1) - 1"
            f" ELSE 0 END"
        )

    return f"""
WITH agg AS (
    SELECT {group_col} AS grp, count(*) AS n_docs,
           min({text_col}) AS a, max({text_col}) AS b,
           min(reverse({text_col})) AS ra, max(reverse({text_col})) AS rb
    FROM {table} WHERE {text_col} IS NOT NULL
    GROUP BY {group_col}
)
SELECT grp AS {group_col},
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST({lcp('a', 'b')} AS BIGINT) AS prefix_len,
       CAST({lcp('ra', 'rb')} AS BIGINT) AS suffix_len,
       substr(a, 1, CAST({lcp('a', 'b')} AS BIGINT)) AS prefix
FROM agg
"""


T5_SENTINEL = "<extra_id_{i}>"


def span_corruption(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    corrupt_frac_ppm: int = 150_000,
    min_len: int = 20,
    seed: str = "t5",
) -> DataFrame:
    """T5-style span corruption (Raffel et al. 2020, "Exploring the
    limits of transfer learning…", §3.1.4) with TWO spans: mask two
    non-overlapping character spans with sentinel tokens and emit the
    denoising target

        corrupted: P0 <extra_id_0> P1 <extra_id_1> P2
        targets:   <extra_id_0> S0 <extra_id_1> S1 <extra_id_2>

    :func:`fim_transform`'s sibling — FIM trains infilling with ONE
    split for causal models, span corruption trains denoising with k
    masked spans for encoder-decoder models; a corpus pipeline ships
    both transforms off one text column.

    Determinism discipline is FIM's exactly: spans take
    ``corrupt_frac_ppm`` of the document split evenly (span length =
    max(1, (L·ppm) div 1e6 div 2) — exact integer math, truncating),
    each span lands in its own half of the document at an offset drawn
    from md5(seed:id:i) mod the feasible width — no RNG, same spans on
    every engine and run. Documents shorter than ``min_len`` pass
    through (applied = false). Output: (id, corrupted, targets,
    applied, span_len, s0, s1).

    Plan shape: one narrow expression pass, zero shuffles.
    """
    if min_len < 8:
        raise ValueError(f"min_len must be >= 8, got {min_len}")
    t = F.col(text_col)
    L = F.length(t).cast("long")
    slen = F.greatest(
        F.lit(1), (L * F.lit(int(corrupt_frac_ppm))) / F.lit(1_000_000)
    ).cast("long")
    slen = F.greatest(F.lit(1), (slen / F.lit(2)).cast("long"))
    seg = (L / F.lit(2)).cast("long")

    def h(i: int):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(seed), F.col(id_col).cast("string"), F.lit(i)
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")

    width = seg - slen + 1
    s0 = (h(0) % width) + 1
    s1 = seg + (h(1) % width) + 1
    sent = [T5_SENTINEL.format(i=i) for i in range(3)]
    corrupted = F.concat(
        F.substring(t, F.lit(1), (s0 - 1).cast("int")),
        F.lit(sent[0]),
        t.substr((s0 + slen).cast("int"), (s1 - s0 - slen).cast("int")),
        F.lit(sent[1]),
        t.substr((s1 + slen).cast("int"), (L - s1 - slen + 1).cast("int")),
    )
    targets = F.concat(
        F.lit(sent[0]),
        t.substr(s0.cast("int"), slen.cast("int")),
        F.lit(sent[1]),
        t.substr(s1.cast("int"), slen.cast("int")),
        F.lit(sent[2]),
    )
    applied = t.isNotNull() & (L >= F.lit(int(min_len)))
    return df.select(
        F.col(id_col),
        F.when(applied, corrupted).otherwise(t).alias("corrupted"),
        F.when(applied, targets).alias("targets"),
        applied.alias("applied"),
        F.when(applied, slen).cast("long").alias("span_len"),
        F.when(applied, s0).cast("long").alias("s0"),
        F.when(applied, s1).cast("long").alias("s1"),
    )


def span_corruption_oracle_sql(
    rows_sql: str,
    id_col: str,
    corrupt_frac_ppm: int = 150_000,
    min_len: int = 20,
    seed: str = "t5",
) -> str:
    """DuckDB replica of :func:`span_corruption`. ``rows_sql`` yields
    (id, text)."""
    s = [T5_SENTINEL.format(i=i) for i in range(3)]
    return f"""
WITH base AS (
    SELECT id, text, CAST(len(text) AS BIGINT) AS L,
           greatest(CAST(1 AS BIGINT),
               greatest(CAST(1 AS BIGINT),
                   CAST(len(text) AS BIGINT) * {int(corrupt_frac_ppm)} // 1000000)
               // 2) AS slen,
           CAST(len(text) AS BIGINT) // 2 AS seg,
           CAST('0x' || substr(md5('{seed}:' || CAST(id AS VARCHAR) || ':0'), 1, 8)
                AS BIGINT) AS h0,
           CAST('0x' || substr(md5('{seed}:' || CAST(id AS VARCHAR) || ':1'), 1, 8)
                AS BIGINT) AS h1
    FROM ({rows_sql})
), pos AS (
    SELECT *,
           (h0 % (seg - slen + 1)) + 1 AS s0,
           seg + (h1 % (seg - slen + 1)) + 1 AS s1,
           (text IS NOT NULL AND L >= {int(min_len)}) AS applied
    FROM base
)
SELECT id AS {id_col},
       CASE WHEN applied THEN
            substr(text, 1, CAST(s0 - 1 AS INT))
            || '{s[0]}' || substr(text, CAST(s0 + slen AS INT),
                                  CAST(s1 - s0 - slen AS INT))
            || '{s[1]}' || substr(text, CAST(s1 + slen AS INT),
                                  CAST(L - s1 - slen + 1 AS INT))
       ELSE text END AS corrupted,
       CASE WHEN applied THEN
            '{s[0]}' || substr(text, CAST(s0 AS INT), CAST(slen AS INT))
            || '{s[1]}' || substr(text, CAST(s1 AS INT), CAST(slen AS INT))
            || '{s[2]}'
       END AS targets,
       applied,
       CASE WHEN applied THEN slen END AS span_len,
       CASE WHEN applied THEN s0 END AS s0,
       CASE WHEN applied THEN s1 END AS s1
FROM pos
"""

def _feistel_round_expr(x_sql: str, w: int, seed: str, engine: str) -> str:
    """One application of the 4-round balanced Feistel network on the
    2w-bit domain, as a SQL expression over ``x_sql`` in either dialect
    ('spark' | 'duckdb'). The round key hashes the EPOCH COLUMN into
    the md5 input, so one expression serves every epoch row. A single
    generator guarantees both engines evaluate literally the same
    arithmetic; dialects differ only in hex→int parsing and xor
    spelling."""
    mask = (1 << w) - 1

    def h2i(e: str) -> str:
        if engine == "spark":
            return f"CAST(conv(substring(md5({e}), 1, 8), 16, 10) AS BIGINT)"
        return f"CAST('0x' || substr(md5({e}), 1, 8) AS BIGINT)"

    def xor(a: str, b: str) -> str:
        return f"({a} ^ {b})" if engine == "spark" else f"xor({a}, {b})"

    def cat(r: str, i: int) -> str:
        if engine == "spark":
            return (
                f"concat('{seed}:', CAST(epoch AS STRING), ':{i}:',"
                f" CAST({r} AS STRING))"
            )
        return f"'{seed}:' || CAST(epoch AS VARCHAR) || ':{i}:' || CAST({r} AS VARCHAR)"

    l, r = f"(({x_sql}) >> {w})", f"(({x_sql}) & {mask})"
    for i in range(4):
        fr = f"({h2i(cat(r, i))} & {mask})"
        l, r = r, f"({xor(l, fr)})"
    return f"((({l}) << {w}) | ({r}))"


def feistel_positions_sql(
    base_sql: str,
    id_col: str,
    n: int,
    epochs: Sequence[int],
    seed: str,
    engine: str,
    walks: int = 40,
) -> str:
    """Cycle-walking format-preserving permutation of [0, n) (Black &
    Rogaway 2002, "Ciphers with arbitrary finite domains") as a nested
    named-step query — one subquery per walk, so query size is LINEAR
    in ``walks`` (a textual CASE nesting would grow 3^walks). Each
    walk re-applies the Feistel network only to values that landed in
    the gap [n, 2^2w); the walk chain is long enough that the longest
    out-of-domain run at any realistic n terminates (the bijectivity
    test checks every element at several n — a non-bijection means
    ``walks`` was too small, deterministically, never silently).

    ``base_sql`` must yield ({id_col}, epoch) rows. Returns SQL
    producing ({id_col}, epoch, pos).
    """
    if n < 2:
        raise ValueError("n must be >= 2")
    bits = max(2, (n - 1).bit_length())
    w = (bits + 1) // 2
    q = (
        f"SELECT {id_col}, epoch,"
        f" {_feistel_round_expr(id_col, w, seed, engine)} AS pos"
        f" FROM ({base_sql}) t0"
    )
    for k in range(1, walks):
        step = _feistel_round_expr("pos", w, seed, engine)
        q = (
            f"SELECT {id_col}, epoch,"
            f" CASE WHEN pos < {n} THEN pos ELSE {step} END AS pos"
            f" FROM ({q}) t{k}"
        )
    return f"SELECT {id_col}, CAST(epoch AS INT) AS epoch, CAST(pos AS BIGINT) AS pos FROM ({q}) tf"


def feistel_epoch_positions(
    df: DataFrame,
    id_col: str,
    n: int,
    epochs: Sequence[int],
    seed: str = "feistel",
) -> DataFrame:
    """Multi-epoch shuffle schedule WITHOUT a shuffle: for each row id
    (dense in [0, n)) and each training epoch, the row's position in
    that epoch's pseudo-random permutation — computed POSITIONALLY by a
    4-round Feistel network over md5 round keys with cycle-walking
    (format-preserving encryption; Black & Rogaway 2002).

    This is the O(1)-per-row form of epoch shuffling: `shuffle_shards`
    materializes a rank sort per epoch (a full corpus shuffle, per
    epoch); a Feistel position is a pure expression, so a 100 TB
    corpus derives EVERY epoch's order from the stored one — readers
    seek by position, nothing is re-sorted, and the permutation is a
    provable bijection (encryption is invertible; the bijectivity test
    checks every element at several n). Different round keys per epoch
    decorrelate epochs.

    Output: (id, epoch, pos) — one row per (id, epoch), pos ∈ [0, n),
    bijective per epoch. Plan: an epochs-literal explode + a chain of
    walk projections (pure expressions) — zero shuffles, no Python;
    CASE short-circuiting means most rows pay ≤ 2 Feistel
    applications despite the 64-step safety chain.
    """
    if n < 2:
        raise ValueError("n must be >= 2")
    bits = max(2, (n - 1).bit_length())
    w = (bits + 1) // 2
    mask = (1 << w) - 1

    # Arrow-batched kernel, NOT a Catalyst expression chain: a
    # cycle-walk needs up to ~25 conditional Feistel re-applications
    # (measured worst run at n=5k), and 40 chained guarded projections
    # cost 5+ s of analysis/codegen per plan regardless of row count —
    # while Python's hashlib md5 is the SAME function as both engines'
    # md5(), walks short-circuit naturally per row, and the pass stays
    # zero-shuffle / linear. The oracle runs the expression form
    # (feistel_positions_sql), so the two implementations cross-check
    # each other on every gate run.
    import hashlib

    def _walk(x: int, epoch: int) -> int:
        p = x
        first = True
        while first or p >= n:
            first = False
            l, r = p >> w, p & mask
            for i in range(4):
                fr = (
                    int(
                        hashlib.md5(
                            f"{seed}:{epoch}:{i}:{r}".encode()
                        ).hexdigest()[:8],
                        16,
                    )
                    & mask
                )
                l, r = r, l ^ fr
            p = (l << w) | r
        return p

    eps = [int(e) for e in epochs]
    schema = f"{id_col} long, epoch int, pos long"

    def run(batches):
        import pandas as pd

        for b in batches:
            ids = [int(x) for x in b[id_col]]
            out = {
                id_col: [x for x in ids for _ in eps],
                "epoch": [e for _ in ids for e in eps],
                "pos": [_walk(x, e) for x in ids for e in eps],
            }
            yield pd.DataFrame(out)

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema
    )


def feistel_epoch_positions_oracle_sql(
    rows_sql: str,
    id_col: str,
    n: int,
    epochs: Sequence[int],
    seed: str = "feistel",
) -> str:
    """DuckDB replica of :func:`feistel_epoch_positions` — the SAME
    generated walk chain in the duckdb dialect."""
    eps = ", ".join(str(int(e)) for e in epochs)
    base = (
        f"SELECT {id_col}, unnest([{eps}]) AS epoch FROM ({rows_sql}) ids"
    )
    return feistel_positions_sql(base, id_col, n, epochs, seed, "duckdb")
