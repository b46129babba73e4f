"""Cross-source record linkage: blocking + weighted multi-field
similarity scoring — the entity-resolution shape (match customers to a
reference registry, products across catalogs, crawled pages to known
sources) that the dedup family's SELF-join operators don't cover. The
reference exposes per-bucket enrichment joins and the dedup service
(reference: DeduplicationService.java handles same-source duplicates);
linking TWO sources with field-level evidence weights is the classic
Fellegi-Sunter reduction of that surface.

Design for 100 TB:
- Candidate generation is ALWAYS a blocked equi-join — the caller names
  cheap deterministic block keys (first name-token, zip, sorted
  soundex, ...), both sides shuffle once on the key, and only
  within-block pairs are scored. No all-pairs path exists in this
  module; a hot block behaves like any skewed equi-join key (AQE skew
  split applies).
- Scoring is pure Catalyst: token-set Jaccard via
  array_intersect/array_union on pre-distinct token arrays, exact-match
  fields via a when(); all fixed-point integer arithmetic (floor at
  every division) so scores are engine-portable for differential
  testing.
- The weighted total is rational: score_f6 = Σ(w_i · sim_i_f6) div Σw —
  deterministic under any partitioning.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aleph2_contrib_spark.operators.dedup import normalize_text


class LinkField(NamedTuple):
    left_col: str
    right_col: str
    weight: int
    kind: str  # "jaccard" (token-set) | "exact" (normalized equality)


def _tokens(col: Column) -> Column:
    return F.array_distinct(F.split(normalize_text(col), " "))


def linked_pairs(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    block_left: Column | str,
    block_right: Column | str,
    fields: Sequence[LinkField],
    min_score_f6: int = 500_000,
) -> DataFrame:
    """Score candidate links between ``left`` and ``right``.

    Returns (left_id, right_id, score_f6) for every within-block pair
    whose weighted similarity clears ``min_score_f6`` (1e6 fixed point).

    ``block_left`` / ``block_right``: Column (or column name) producing
    the blocking key on each side — pairs in different blocks are never
    considered, the standard ER recall/cost trade the caller controls.

    Field kinds: ``jaccard`` scores the token-set Jaccard of the two
    normalized strings in exact integer fixed point; ``exact`` scores
    1e6 on normalized equality else 0. Weights are positive integers;
    the combined score is the exact rational ``Σ(w·sim) div Σw``.
    """
    if not fields:
        raise ValueError("at least one LinkField required")
    for f in fields:
        if f.kind not in ("jaccard", "exact"):
            raise ValueError(f"unknown field kind {f.kind!r}")
        if f.weight <= 0:
            raise ValueError(f"weights must be positive, got {f.weight}")
    bl = F.col(block_left) if isinstance(block_left, str) else block_left
    br = F.col(block_right) if isinstance(block_right, str) else block_right

    lsel = [F.col(left_id).alias("__lid"), bl.alias("__bk")]
    rsel = [F.col(right_id).alias("__rid"), br.alias("__bk")]
    for i, f in enumerate(fields):
        if f.kind == "jaccard":
            lsel.append(_tokens(F.col(f.left_col)).alias(f"__lf{i}"))
            rsel.append(_tokens(F.col(f.right_col)).alias(f"__rf{i}"))
        else:
            lsel.append(normalize_text(F.col(f.left_col)).alias(f"__lf{i}"))
            rsel.append(normalize_text(F.col(f.right_col)).alias(f"__rf{i}"))
    cand = left.select(*lsel).join(right.select(*rsel), "__bk")

    wsum = sum(f.weight for f in fields)
    total = F.lit(0).cast("long")
    for i, f in enumerate(fields):
        a, b = F.col(f"__lf{i}"), F.col(f"__rf{i}")
        if f.kind == "jaccard":
            # integer `div` keeps the ratio exact (engine-portable); the
            # union of two distinct non-empty token arrays is never 0
            sim = F.when(
                F.size(F.array_union(a, b)) > 0,
                F.expr(
                    f"(1000000 * size(array_intersect(__lf{i}, __rf{i})))"
                    f" div size(array_union(__lf{i}, __rf{i}))"
                ),
            ).otherwise(F.lit(0))
        else:
            sim = F.when(a == b, F.lit(1_000_000)).otherwise(F.lit(0))
        total = total + F.lit(int(f.weight)).cast("long") * sim.cast("long")
    score = F.expr(f"__total div {int(wsum)}")
    return (
        cand.withColumn("__total", total)
        .withColumn("score_f6", score.cast("long"))
        .filter(F.col("score_f6") >= F.lit(int(min_score_f6)))
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            "score_f6",
        )
    )


def linked_pairs_oracle_sql(
    left_sql: str,
    right_sql: str,
    fields: Sequence[LinkField],
    min_score_f6: int = 500_000,
) -> str:
    """DuckDB replica of :func:`linked_pairs`. ``left_sql`` must yield
    (lid, bk, f0, f1, ...) with fields already raw strings in the
    LinkField order; same for ``right_sql`` with rid. Normalization and
    tokenization are replayed in SQL."""
    wsum = sum(f.weight for f in fields)
    sims = []
    for i, f in enumerate(fields):
        ln = f"l.f{i}"
        rn = f"r.f{i}"
        norm_l = f"trim(regexp_replace(lower({ln}), '\\s+', ' ', 'g'))"
        norm_r = f"trim(regexp_replace(lower({rn}), '\\s+', ' ', 'g'))"
        if f.kind == "jaccard":
            toks_l = f"list_distinct(string_split({norm_l}, ' '))"
            toks_r = f"list_distinct(string_split({norm_r}, ' '))"
            sims.append(
                f"CASE WHEN len(list_distinct(list_concat({toks_l}, {toks_r}))) > 0 "
                f"THEN (1000000 * len(list_intersect({toks_l}, {toks_r}))) "
                f"// len(list_distinct(list_concat({toks_l}, {toks_r}))) "
                f"ELSE 0 END"
            )
        else:
            sims.append(
                f"CASE WHEN {norm_l} = {norm_r} THEN 1000000 ELSE 0 END"
            )
    weighted = " + ".join(
        f"{f.weight} * ({s})" for f, s in zip(fields, sims)
    )
    return f"""
WITH l AS MATERIALIZED ({left_sql}), r AS MATERIALIZED ({right_sql}),
scored AS (
    SELECT l.lid, r.rid,
           CAST(({weighted}) // {wsum} AS BIGINT) AS score_f6
    FROM l JOIN r ON l.bk = r.bk
)
SELECT lid, rid, score_f6 FROM scored WHERE score_f6 >= {int(min_score_f6)}
"""


def golden_record(
    df: DataFrame,
    entity_col: str,
    attr_cols: Sequence[str],
    order_cols: Sequence[str],
    id_col: str,
) -> DataFrame:
    """Survivorship: collapse each entity's candidate records into ONE
    golden row — the master-data step after linkage/dedup has assigned
    entity keys. Each attribute survives INDEPENDENTLY: its value comes
    from the candidate row with the highest (non-null-ness, *order_cols,
    id) tuple, so a record missing one field still wins the fields it
    has (standard attribute-level survivorship, not row-level).

    Exactness contract: the winner is an argmax over a lexicographic
    struct — non-null flag first (a NULL never beats a value), then the
    caller's trust ordering (e.g. source priority, then recency), with
    the unique ``id_col`` last so the order is total and the result
    engine-exact. ``order_cols`` must be non-null (coalesce at the call
    site): NULL-vs-value field comparison inside struct MIN/MAX is the
    one place engines disagree, so it is excluded by contract.

    Plan shape at 100 TB: ONE groupBy(entity) with k struct-max
    aggregates — map-side partial merge, no window, no self-join, no
    candidate explosion. Skewed entities (one key with millions of
    candidates) merge associatively like any max.
    """
    aggs = []
    for a in attr_cols:
        s = F.struct(
            F.col(a).isNotNull().cast("int").alias("nn"),
            *[F.col(o).alias(f"o{i}") for i, o in enumerate(order_cols)],
            F.col(id_col).alias("tid"),
            F.col(a).alias("v"),
        )
        aggs.append(F.max(s).getField("v").alias(a))
    return df.groupBy(entity_col).agg(*aggs)


def golden_record_oracle_sql(
    rows_sql: str,
    entity_col: str,
    attr_cols: Sequence[str],
    order_cols: Sequence[str],
    id_col: str,
) -> str:
    """DuckDB replica of :func:`golden_record` — identical lexicographic
    struct-max survivorship (structs compare positionally in both
    engines). ``rows_sql`` yields the candidate rows."""
    sels = []
    for a in attr_cols:
        fields = [f"nn := CAST({a} IS NOT NULL AS INT)"]
        fields += [f"o{i} := {o}" for i, o in enumerate(order_cols)]
        fields += [f"tid := {id_col}", f"v := {a}"]
        sels.append(f"(max(struct_pack({', '.join(fields)}))).v AS {a}")
    return f"""
SELECT {entity_col}, {', '.join(sels)}
FROM ({rows_sql}) GROUP BY {entity_col}
"""
